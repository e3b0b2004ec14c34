package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), as a training-data pipeline needs for embedding-based
  * near-dup removal and retrieval.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(queries × corpus); fine when the query set is small or the corpus
  *    is broadcastable.
  *  - [[lshTopK]]: random-hyperplane LSH (sign bits → bucket key) — the
  *    scale path. Candidates come from an equi-join on the bucket key, so
  *    the shuffle is O(n), and per-query work is only its bucket.
  *
  * All arithmetic is a deterministic left-fold over doubles (strict IEEE
  * order), so results are bit-identical across engines and partitionings —
  * required for the DuckDB oracle hash-compare.
  */
object SimilarityOps {

  /** OR-amplified sign-LSH: `Tables` independent hash tables of
    * `BitsPerTable` hyperplane bits each. A corpus vector is a candidate
    * if it collides with the query in ANY table — more tables raise
    * recall, more bits shrink buckets. 6×4 gives ~0.5+ recall@3 on
    * uniform-random 64-d embeddings while scanning a fraction of the
    * corpus per query. */
  val Tables = 6
  val BitsPerTable = 4

  /** Deterministic hyperplane coefficients: plane p, dimension j →
    * a value in [-1, 1] with 3 decimals. Shared with the SQL oracle as
    * literals. Plane index = table * BitsPerTable + bit. */
  def planeCoefficients(dims: Int): Seq[Seq[Double]] =
    (0 until Tables * BitsPerTable).map { p =>
      (0 until dims).map { j =>
        val k = (p * dims + j).toLong * 2654435761L
        ((k % 2001 + 2001) % 2001 - 1000) / 1000.0
      }
    }

  /** Cast a float embedding to double once, up front. */
  def asDouble(embedding: Column): Column =
    transform(embedding, x => x.cast("double"))

  /** Strict left-fold sum — matches a sequential SQL fold bit-for-bit. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** HOF-fold reference implementations of the codegen'd `graft_dot` /
    * `graft_cosine` expressions — usable without function registration;
    * the expressions are the hot-path equivalents. */
  def dot(a: Column, b: Column): Column = foldSum(zip_with(a, b, _ * _))

  def cosine(a: Column, b: Column): Column = {
    val norms = foldSum(zip_with(a, a, _ * _)) * foldSum(zip_with(b, b, _ * _))
    // zero-norm vector: cosine undefined — null, not NaN (NaN sorts ABOVE
    // every real cosine in Spark and would rank as everyone's top match)
    when(norms === 0.0, lit(null)).otherwise(dot(a, b) / sqrt(norms))
  }

  /** Bucket keys, one per hash table: key bit b set iff
    * dot(v, plane_{t*BitsPerTable+b}) >= 0. Dot products run through the
    * codegen'd [[graft.functions.DotProduct]] expression against literal
    * coefficient arrays — same strict sequential FP order as the SQL
    * oracle's fold. Caller must have run `GraftFunctions.register`. */
  def lshBucketKeys(vecName: String, dims: Int): Column = {
    val planes = planeCoefficients(dims)
    array((0 until Tables).map { t =>
      (0 until BitsPerTable).map { b =>
        // one pre-built array Literal per plane (not an expr()-parsed
        // array(...) of `dims` literal children): 24 planes × 64 dims as
        // parsed trees made cold planning of every LSH query measurably
        // slow — the runtime plan is identical
        val coefs = lit(planes(t * BitsPerTable + b).toArray)
        val d = call_function("graft_dot", col(s"`$vecName`"), coefs)
        when(d >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Output: (query_id, neighbor_id, rank, cos). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr("graft_cosine(qv, cv)"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their
    * nearest-centroid cell once; a query probes only its `nProbe` nearest
    * cells, scanning ~nProbe/nCentroids of the corpus. The codebook here
    * is deterministic (the first `nCentroids` corpus vectors) so results
    * are reproducible and oracle-verifiable — in production the codebook
    * comes from an offline k-means fit and the index mechanics are
    * identical. Assignment is one linear pass (n × nCentroids); no
    * shuffle grows with n². */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      nCentroids: Int, nProbe: Int, k: Int): DataFrame = {
    // codebook = first nCentroids vectors in id order — works for any
    // orderable id domain (not just 0-based ints); the index mechanics
    // are entirely [[ivfTopKWith]]'s
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("centv"))
    ivfTopKWith(queries, corpus, cents, idCol, vecCol, nProbe, k)
  }

  /** Distributed spherical k-means for IVF codebook training — the
    * offline fit that turns [[ivfTopK]]'s deterministic seed codebook into
    * a trained one. Seeded from the first `k` corpus vectors in id order
    * (reproducible), then `iters` Lloyd rounds:
    *
    *  - assignment: crossJoin(broadcast(centroids)) + one `min_by`
    *    partial aggregate per vector — the same linear, sort-free shape
    *    the plan spec pins for [[ivfTopK]];
    *  - update: element-wise mean per cluster through EXPLODED
    *    (cluster, dim, value) rows — codegen hash aggregates, no
    *    interpreted array lambdas — then L2-normalized (spherical
    *    k-means, so each round's mean direction is the optimal centroid
    *    for cosine assignment).
    *
    * Clusters that lose all members drop out (k shrinks) rather than
    * being re-seeded, keeping the fit deterministic. Lineage is truncated
    * each round with `localCheckpoint`. Returns `(cid, centv)` for
    * [[ivfTopKWith]]. No SQL oracle: an iterative FP fixpoint is not
    * reasonably expressible in portable SQL (like the HLL sketch, the
    * contract is asserted in OpsSpec — the spherical objective is
    * monotonically non-decreasing over rounds). */
  def kMeansCodebook(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), asDouble(col(vecCol)).as("centv"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = c.crossJoin(broadcast(cents))
        .withColumn("__cos", expr("graft_cosine(__v, centv)"))
        .groupBy("__id")
        .agg(min_by(struct(col("cid"), col("__v")),
          struct(coalesce(negate(col("__cos")), lit(Double.PositiveInfinity)),
            col("cid"))).as("__a"))
        .select(col("__a.cid").as("cid"), col("__a.__v").as("__v"))
      val byDim = assigned
        .select(col("cid"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
      val norms = byDim.groupBy("cid")
        .agg(sqrt(sum(col("m") * col("m"))).as("n"))
      val next = byDim.join(norms, "cid")
        .select(col("cid"), col("pos"),
          when(col("n") > 0.0, col("m") / col("n")).otherwise(col("m")).as("u"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("pos"), col("u")))).as("pu"))
        .select(col("cid"), expr("transform(pu, p -> p.u)").as("centv"))
        .localCheckpoint() // eager: materialized through the OLD centroids
      // the superseded round's checkpoint blocks are unreachable once the
      // new one is materialized — drop them instead of leaking k×iters
      // cached partitions per fit (an RDD-level unpersist: see
      // [[GraphOps.dropCheckpoint]])
      GraphOps.dropCheckpoint(cents)
      cents = next
    }
    c.unpersist()
    cents
  }

  /** Probe-limited IVF candidate pairs `(query_id, neighbor_id)`: corpus
    * vectors assigned to nearest-centroid cells (one `min_by` linear
    * pass), queries probe their `nProbe` best cells. The shared front half
    * of [[ivfTopKWith]] (exact rerank) and [[ivfPqTopK]] (ADC rerank). */
  def ivfCandidates(
      queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cents = codebook.select(col("cid"), col("centv"))

    val assignment = c.crossJoin(broadcast(cents))
      .withColumn("__cos", expr("graft_cosine(cv, centv)"))
      .groupBy("neighbor_id")
      .agg(min_by(col("cid"),
        struct(coalesce(negate(col("__cos")), lit(Double.PositiveInfinity)),
          col("cid"))).as("cid"))
      .select("neighbor_id", "cid")
    val pw = Window.partitionBy("query_id")
      .orderBy(expr("graft_cosine(qv, centv)").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "cid")
    probes.join(assignment, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
  }

  /** [[ivfTopK]] against an explicit codebook `(cid, centv)` — e.g. one
    * trained by [[kMeansCodebook]]. Same probe-limited plan shape. */
  def ivfTopKWith(
      queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, nProbe: Int, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = ivfCandidates(queries, corpus, codebook, idCol, vecCol, nProbe)
      .join(q, "query_id").join(c, "neighbor_id")
      .withColumn("cos", expr("graft_cosine(qv, cv)"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF-PQ: the billion-vector architecture — coarse IVF cells bound the
    * candidate set (`~nProbe/nCentroids` of the corpus per query), then
    * PQ/ADC scores those candidates in the compressed domain, so search
    * touches neither the full corpus nor any raw corpus vector. Both
    * codebooks here are the deterministic seeds; swap in
    * [[kMeansCodebook]] / [[pqCodebookTrained]] for trained ones.
    * Output: `(query_id, neighbor_id, rank, approx_cos)`. */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, nCentroids: Int, nProbe: Int, ksub: Int,
      k: Int): DataFrame = {
    val coarse = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("centv"))
    val cand = ivfCandidates(queries, corpus, coarse, idCol, vecCol, nProbe)
      .withColumnRenamed("neighbor_id", "vec_id")
    val cb = pqCodebook(corpus, idCol, vecCol, dims, m, ksub)
    val codes = pqEncode(corpus, cb, idCol, vecCol, dims, m)
    pqTopK(queries, codes, cb, idCol, vecCol, dims, m, k, candidates = Some(cand))
  }

  /** Semantic clustering: assign every corpus vector to its nearest
    * codebook centroid by cosine, and annotate each row with its cluster's
    * population — the building block for topic bucketing, semantic dedup
    * (drop all-but-one per tight cluster), and corpus composition reports.
    *
    * Output: `(vec_id, cluster_id, cos, cluster_size)`, one row per corpus
    * vector. Ties and null cosines (zero-norm vectors) break to the lowest
    * centroid id, matching `cos DESC NULLS LAST, cid ASC`.
    *
    * Scale shape: the codebook is broadcast (k centroids, k ≪ n), the
    * assignment is one linear pass fused into a `min_by` partial
    * aggregate — no window sort over n×k rows — and the size annotation
    * is a single hash-partition on `cluster_id`. Nothing is quadratic in
    * the corpus. Pair with [[kMeansCodebook]] for a trained codebook or
    * any deterministic `(cid, centv)` frame for a reproducible one. */
  def clusterAssignments(
      corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("cv"))
    val cents = codebook.select(col("cid"), col("centv"))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("__cos", expr("graft_cosine(cv, centv)"))
      .groupBy("vec_id")
      .agg(min_by(struct(col("cid"), col("__cos").as("cos")),
        struct(coalesce(negate(col("__cos")), lit(Double.PositiveInfinity)),
          col("cid"))).as("__a"))
      .select(col("vec_id"), col("__a.cid").as("cluster_id"),
        col("__a.cos").as("cos"))
    assigned.withColumn("cluster_size",
      count(lit(1)).over(Window.partitionBy("cluster_id")))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): drop near-identical
    * embeddings, comparing pairs ONLY within their assigned cluster —
    * the clustering is what bounds the pairwise blowup (O(Σ cluster²),
    * never O(n²); with balanced clusters that is n²/k). The keep rule is
    * the deterministic "first wins": a member is dropped iff some
    * LOWER-ID member of its cluster is within `threshold` cosine —
    * exactly the keep-one-per-duplicate-set greedy most SemDeDup
    * implementations run, stated without iterative closure so the same
    * semantics are declaratively checkable. Returns every input id with
    * its cluster and a `keep` flag (dropped rows stay visible — corpus
    * curation wants the audit, not a silent shrink). */
  def semanticDedup(corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val assign = clusterAssignments(corpus, codebook, idCol, vecCol)
      .select(col("vec_id"), col("cluster_id"))
    val e = corpus
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__v"))
      .join(assign, "vec_id")
    val lower = e.select(col("vec_id").as("__lid"),
      col("cluster_id").as("__lc"), col("__v").as("__lv"))
    val dropped = e.join(lower,
        col("cluster_id") === col("__lc") && col("__lid") < col("vec_id") &&
          expr("graft_cosine(__v, __lv)") >= threshold,
        "left_semi")
      .select(col("vec_id").as("__d"))
    assign.join(dropped, col("vec_id") === col("__d"), "left")
      .select(col("vec_id"), col("cluster_id"), col("__d").isNull.as("keep"))
  }

  /** Product-quantization sub-codebooks: the embedding space is split into
    * `m` contiguous subspaces of `dims / m` dimensions; each gets its own
    * `ksub`-entry codebook. Deterministic seed (the first `ksub` corpus
    * vectors in id order, sliced per subspace) so PQ results are
    * reproducible and oracle-verifiable — production swaps in per-subspace
    * k-means exactly as [[ivfTopKWith]] does for IVF cells.
    * Output: `(sub, cid, centv, cnorm2)`, `m × ksub` rows. */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, ksub: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    val dsub = dims / m
    corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(idCol).cast("long").as("cid"), asDouble(col(vecCol)).as("fv"))
      .select(col("cid"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("fv"), s * dsub + 1, dsub).as("centv"))): _*)).as("sc"))
      .select(col("sc.sub").as("sub"), col("cid"), col("sc.centv").as("centv"))
      .withColumn("cnorm2", expr("graft_dot(centv, centv)"))
  }

  /** PQ encoding: each vector → `m` small centroid codes. The STORED index
    * is `(vec_id, sub, cid, cnorm2)` — `m` ints per vector instead of
    * `dims` floats (the FAISS-style memory path: a billion 64-d float
    * corpus is 256 GB raw but ~4 GB as 4-subspace codes, and ADC search
    * never touches raw vectors again). Assignment is per-subspace nearest
    * centroid by cosine, fused into one `min_by` partial aggregate per
    * (vector, subspace) — broadcast codebook, no window, nothing
    * quadratic in the corpus. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val dsub = dims / m
    corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("cv"))
      .select(col("vec_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("cv"), s * dsub + 1, dsub).as("subv"))): _*)).as("sc"))
      .select(col("vec_id"), col("sc.sub").as("sub"), col("sc.subv").as("subv"))
      .join(broadcast(codebook), "sub")
      .withColumn("__cos", expr("graft_cosine(subv, centv)"))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("cid"), col("cnorm2")),
        struct(coalesce(negate(col("__cos")), lit(Double.PositiveInfinity)),
          col("cid"))).as("__a"))
      .select(col("vec_id"), col("sub"),
        col("__a.cid").as("cid"), col("__a.cnorm2").as("cnorm2"))
  }

  /** Trained PQ sub-codebooks: one spherical k-means fit PER SUBSPACE
    * (each reusing [[kMeansCodebook]] on the sliced subvectors), replacing
    * [[pqCodebook]]'s deterministic seed exactly as [[ivfTopKWith]] takes
    * a trained coarse codebook. Same `(sub, cid, centv, cnorm2)` shape —
    * drop-in for [[pqEncode]]/[[pqTopK]]. No SQL oracle (iterative FP
    * fixpoint, like k-means itself); OpsSpec pins that training does not
    * degrade compressed-domain recall. */
  def pqCodebookTrained(corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, ksub: Int, iters: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    val dsub = dims / m
    (0 until m).map { s =>
      val sub = corpus.select(col(idCol),
        slice(asDouble(col(vecCol)), s * dsub + 1, dsub).as("__subv"))
      kMeansCodebook(sub, idCol, "__subv", ksub, iters)
        .select(lit(s).as("sub"), col("cid"), col("centv"))
    }.reduce(_ unionByName _)
      .withColumn("cnorm2", expr("graft_dot(centv, centv)"))
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each query
    * builds an `m × ksub` lookup table of subspace dot products against
    * the codebook (broadcast — queries never meet raw corpus vectors),
    * the stored codes join the LUT on `(sub, cid)`, and the approximate
    * cosine is reconstructed as `Σ pdot / (|q| · |x̂|)` where `x̂` is the
    * concatenated-centroid reconstruction.
    *
    * FP parity: the `m`-term reductions are pivoted into per-subspace
    * columns and summed LEFT-ASSOCIATIVELY (`((p0+p1)+p2)+p3`), so the
    * oracle performs the identical IEEE operations — a bare SUM would
    * hang cross-engine equality on aggregation order. Alone, the scan is
    * O(n·m) tiny code rows per query — the compressed analog of
    * [[bruteForceTopK]]; pass `candidates` (`(query_id, vec_id)`, e.g.
    * from IVF probes via [[ivfPqTopK]]) to score only those pairs — the
    * candidate restriction applies BEFORE the LUT join, so non-candidate
    * codes never enter the shuffle.
    * Output: `(query_id, neighbor_id, rank, approx_cos)`. */
  def pqTopK(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int, k: Int,
      candidates: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val dsub = dims / m
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnorm2", expr("graft_dot(qv, qv)"))
    val lut = q
      .select(col("query_id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("qv"), s * dsub + 1, dsub).as("qsubv"))): _*)).as("sc"))
      .select(col("query_id"), col("sc.sub").as("sub"), col("sc.qsubv").as("qsubv"))
      .join(broadcast(codebook), "sub")
      .select(col("query_id"), col("sub"), col("cid"),
        expr("graft_dot(qsubv, centv)").as("pdot"))
    val pivots =
      (0 until m).map(s =>
        sum(when(col("sub") === s, col("pdot"))).as(s"p$s")) ++
      (0 until m).map(s =>
        sum(when(col("sub") === s, col("cnorm2"))).as(s"c$s"))
    val scoredCodes = candidates match {
      case Some(cand) => codes
        .join(cand.select(col("query_id"), col("vec_id")), Seq("vec_id"))
        .join(broadcast(lut), Seq("query_id", "sub", "cid"))
      case None => codes.join(broadcast(lut), Seq("sub", "cid"))
    }
    val parts = scoredCodes
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(pivots.head, pivots.tail: _*)
    val adot = (1 until m).foldLeft(col("p0")) { (acc, s) => acc + col(s"p$s") }
    val rnorm2 = (1 until m).foldLeft(col("c0")) { (acc, s) => acc + col(s"c$s") }
    val scored = parts
      .join(broadcast(q.select(col("query_id"), col("qnorm2"))), "query_id")
      .withColumn("approx_cos",
        when(col("qnorm2") * rnorm2 === 0.0, lit(null))
          .otherwise(adot / sqrt(col("qnorm2") * rnorm2)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("approx_cos"))
  }

  /** Embedding near-duplicate pairs over a whole corpus: candidate pairs
    * collide in at least one LSH table; exact cosine keeps pairs at or
    * above `threshold`. The corpus-scale companion of [[lshTopK]] —
    * shuffle is O(n × tables), never O(n²). */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // `c` feeds the bucket rows AND both sides of the candidate re-join;
    // `rows` (24 graft_dot hyperplane products per vector) feeds both sides
    // of the self-join — persist both or the dot products run 2-3×.
    // Registered with SubstrateCache so the session owns the lifecycle.
    val c = SubstrateCache.persist(
      corpus.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v")))
    val rows = SubstrateCache.persist(
      c.select(col("__id"), posexplode(lshBucketKeys("__v", dims)))
        .select(col("__id"), col("pos").as("tbl"), col("col").as("key")))
    val pairs = rows.alias("a")
      .join(rows.alias("b"),
        col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key")
          && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    pairs
      .join(c.select(col("__id").as("id_a"), col("__v").as("va")), "id_a")
      .join(c.select(col("__id").as("id_b"), col("__v").as("vb")), "id_b")
      .withColumn("cos", expr("graft_cosine(va, vb)"))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** LSH-bucketed cosine top-k: candidates collide with the query in at
    * least one hash table. The candidate set comes from an equi-join on
    * (table, key) — O(n) shuffle — followed by exact cosine only on
    * candidates. Approximate: recall vs [[bruteForceTopK]] is asserted in
    * OpsSpec. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dims: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    def tableRows(df: DataFrame, id: String, vec: String) =
      df.select(col(id), posexplode(lshBucketKeys(vec, dims)))
        .select(col(id), col("pos").as("tbl"), col("col").as("key"))
    val candidates = tableRows(q, "query_id", "qv").alias("a")
      .join(tableRows(c, "neighbor_id", "cv").alias("b"),
        col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key")
          && col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = candidates
      .join(q, "query_id")
      .join(c, "neighbor_id")
      .withColumn("cos", expr("graft_cosine(qv, cv)"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
