package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.ManagedTable

/** Persistent IVF ANN index — the train-once / search-many shape of
  * large-scale similarity search. [[SimilarityOps.ivfTopK]] assigns the
  * whole corpus to cells on EVERY call; at 100 TB that linear pass
  * dominates and must be paid once, not per query. This index stores the
  * fit as two [[ManagedTable]]s under one root:
  *
  * {{{
  *   <root>/centroids   (cid long, centv array<double>)          — tiny
  *   <root>/vectors     (cid, neighbor_id, cv array<double>)
  *                      PARTITIONED BY cid                       — corpus
  * }}}
  *
  * Scale shape:
  *  - '''build''' is the one linear corpus pass (crossJoin against the
  *    broadcast codebook + one `min_by` partial aggregate — no shuffle
  *    grows with n²), written cell-partitioned;
  *  - '''search''' probes each query's `nProbe` best cells and reads ONLY
  *    those cells' files: the probed cell ids (bounded by the centroid
  *    count, never the corpus) prune the vectors table driver-side
  *    against its manifest ([[ManagedTable.readPartitionsIn]]), so a
  *    2-of-1024-cell probe scans ~2/1024 of the index;
  *  - '''appendVectors''' assigns only the new batch and appends into the
  *    affected cells — incremental indexing without retraining (the
  *    centroids stay fixed, as in FAISS's `IndexIVF.add`);
  *  - both tables version like any managed table: time travel, vacuum,
  *    and small-file compaction ([[ManagedTable.compactSmall]]) maintain
  *    the index like any other dataset.
  *
  * Assignment and search use the exact tie-break of
  * [[SimilarityOps.ivfCandidates]] (cosine descending, then cell id), so
  * a search against a freshly built index reproduces
  * [[SimilarityOps.ivfTopKWith]] bit-for-bit. Self-matches
  * (`query_id == neighbor_id`) are excluded, as there.
  */
final class AnnIndex(spark: SparkSession, val rootPath: String) {

  import SimilarityOps.asDouble

  private[ops] val centroidsTable = ManagedTable(spark, s"$rootPath/centroids")
  private[ops] val vectorsTable = ManagedTable(spark, s"$rootPath/vectors")

  def exists: Boolean = centroidsTable.exists && vectorsTable.exists

  /** The trained codebook `(cid, centv)`. */
  def centroids: DataFrame = centroidsTable.read()

  /** Indexed corpus size — metadata-only when per-file row counts are
    * recorded (they are for engine-written commits). */
  def indexedVectors: Option[Long] = vectorsTable.fastCount

  /** Assign `df`'s vectors to their nearest existing cells and append
    * them into the index — incremental add, no retrain. Ids must not
    * collide with already-indexed ones (the index does not dedup).
    * `txn` embeds a streaming-writer transaction in the commit (the
    * exactly-once anchor for [[indexStream]]). */
  def appendVectors(df: DataFrame, idCol: String, vecCol: String,
      txn: Option[graft.tables.Txn] = None): Unit =
    vectorsTable.append(
      // one file per touched cell, not cells × tasks
      AnnIndex.coLocate(AnnIndex.assign(df, centroids, idCol, vecCol), "cid"),
      operation = "ann-append", txn)

  /** Continuous embedding ingestion — keep the index fresh as vectors
    * stream in: each micro-batch assigns against the FIXED trained
    * codebook and appends its vectors to exactly the touched cells
    * (FAISS `IndexIVF.add` economics, no retrain; retrain remains an
    * explicit offline [[AnnIndex.create]]). Exactly-once: the commit
    * embeds the `(appId, batchId)` writer transaction, so a replayed
    * batch appends nothing — the streaming sink's contract on the
    * index table. */
  def indexStream(stream: DataFrame, idCol: String, vecCol: String,
      checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(exists, s"indexStream needs a trained index at $rootPath " +
      "(AnnIndex.create first — streaming never retrains)")
    val appId = "ann-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(rootPath.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(12).map("%02x".format(_)).mkString
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val last = (vectorsTable.getTxn(appId).toSeq ++
          vectorsTable.newestRecordTxn(appId).toSeq).maxOption
        if (!last.exists(_ >= batchId)) {
          appendVectors(batch, idCol, vecCol,
            Some(graft.tables.Txn(appId, batchId)))
          vectorsTable.setTxn(appId, batchId)
        }
        // compaction cadence: each micro-batch drips one file per
        // touched cell — the autoCompact property folds them back on
        // later appends (separate maintenance commit; a crash there
        // loses only the compaction), so probe cost per cell stays
        // bounded however long the stream runs
        DedupIndex.ensureAutoCompact(vectorsTable)
        ()
      }
      .start()
  }

  /** Exact-rerank probe-limited top-k: `(query_id, neighbor_id, rank,
    * cos)`, at most `k` neighbors per query, cosine descending.
    * Candidates come only from each query's `nProbe` nearest cells, and
    * only those cells' files are scanned (manifest partition pruning). */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      nProbe: Int, k: Int): DataFrame = {
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    require(k > 0, s"k must be positive, got $k")
    graft.functions.GraftFunctions.register(spark)
    val cents = centroids
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val pw = Window.partitionBy("query_id")
      .orderBy(expr("graft_cosine(qv, centv)").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))
    // the distinct probed cells bound the scan; their count is capped by
    // the centroid count (a driver-side list the manifest prune needs),
    // never by the corpus or the query count
    val probedCells = probes.select("cid").distinct()
      .collect().map(_.getLong(0).toString).toSet
    val cand = vectorsTable.readPartitionsIn(Map("cid" -> probedCells))
    val scored = probes.join(cand, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr("graft_cosine(qv, cv)"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}

/** Compressed sibling of [[AnnIndex]]: IVF-PQ persisted — the
  * billion-vector architecture ([[SimilarityOps.ivfPqTopK]]) stored as
  * three [[ManagedTable]]s so neither training nor encoding is ever
  * repeated per query, and search never touches a raw corpus vector:
  *
  * {{{
  *   <root>/centroids  (cid, centv)                      — coarse cells
  *   <root>/pq         (sub, cid, centv, cnorm2)         — sub-codebooks
  *   <root>/codes      (cell, vec_id, sub, code, cnorm2)
  *                     PARTITIONED BY cell               — the corpus,
  *                     compressed to m sub-codes per vector
  * }}}
  *
  * Search = probe `nProbe` cells per query (broadcast coarse codebook),
  * read ONLY those cells' code files (manifest partition pruning), score
  * candidates in the compressed domain via the per-query ADC lookup
  * table ([[SimilarityOps.pqTopK]]). The codes table stores one row per
  * (vector, subspace) — parquet dictionary/RLE encoding keeps the
  * exploded layout compact, and it lets the ADC join run unmodified;
  * the raw-vector table of [[AnnIndex]] is not needed at all. */
final class PqAnnIndex(spark: SparkSession, val rootPath: String) {

  import SimilarityOps.asDouble

  private[ops] val centroidsTable = ManagedTable(spark, s"$rootPath/centroids")
  private[ops] val pqTable = ManagedTable(spark, s"$rootPath/pq")
  private[ops] val codesTable = ManagedTable(spark, s"$rootPath/codes")

  def exists: Boolean =
    centroidsTable.exists && pqTable.exists && codesTable.exists

  private def requireCreated(): Unit =
    if (!exists) throw new IllegalStateException(
      s"No IVF-PQ index at $rootPath — create the index " +
        "(PqAnnIndex.create) before search/appendVectors")

  /** Indexed corpus size — metadata-only when per-file row counts are
    * recorded. The codes table holds `m` rows per vector; deriving `m`
    * from the stored sub-codebooks would cost a read, so callers pass
    * the `m` they created the index with. */
  def indexedVectors(m: Int): Option[Long] = {
    require(m > 0, s"m must be positive, got $m")
    codesTable.fastCount.map(_ / m)
  }

  /** Geometry from the stored codebook: m subspaces of dsub dims each.
    * An empty codebook (missing table, or search before create) yields
    * null aggregates — fail with a descriptive error, not an NPE. */
  private def geometry(cb: DataFrame): (Int, Int) = {
    val r = cb.agg(max(col("sub")), max(size(col("centv")))).head()
    if (r.isNullAt(0) || r.isNullAt(1))
      throw new IllegalStateException(
        s"PQ codebook at $rootPath/pq is empty — create the index " +
          "(PqAnnIndex.create) before search/appendVectors")
    (r.getInt(0) + 1, r.getInt(1))
  }

  /** Assign + encode a new batch against the STORED codebooks and append
    * it into the affected cells — incremental compressed indexing
    * without retrain, [[AnnIndex.appendVectors]]'s compressed sibling. */
  def appendVectors(df: DataFrame, idCol: String, vecCol: String): Unit = {
    requireCreated()
    val cb = pqTable.read()
    val (m, dsub) = geometry(cb)
    // the encode's assignment substrate is scoped to THIS write: released
    // right after the append's action, never left registered session-wide
    val (codes, h) = SubstrateCache.scoped {
      PqAnnIndex.encode(df, idCol, vecCol, centroidsTable.read(), cb,
        m * dsub, m)
    }
    // one file per touched cell, not cells × tasks (see create)
    try codesTable.append(AnnIndex.coLocate(codes, "cell"), "pq-append")
    finally h.release()
  }

  /** Approximate top-k `(query_id, neighbor_id, rank, approx_cos)` —
    * probe-limited candidates scored by ADC, bit-for-bit the result of
    * [[SimilarityOps.ivfPqTopK]] with the same codebooks. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      nProbe: Int, k: Int): DataFrame = {
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    require(k > 0, s"k must be positive, got $k")
    requireCreated()
    graft.functions.GraftFunctions.register(spark)
    val cb = pqTable.read()
    val (m, dsub) = geometry(cb)
    val cents = centroidsTable.read()
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val pw = Window.partitionBy("query_id")
      .orderBy(expr("graft_cosine(qv, centv)").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"))
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0).toString).toSet
    val pruned = codesTable.readPartitionsIn(Map("cell" -> probedCells))
    // per-query candidate set: vectors of the query's OWN probed cells
    // (the partition prune alone is the union over all queries)
    val cand = probes
      .join(pruned.select(col("cell"), col("vec_id")).distinct(), "cell")
      .select("query_id", "vec_id")
    val codes = pruned.select(col("vec_id"), col("sub"),
      col("code").as("cid"), col("cnorm2"))
    SimilarityOps.pqTopK(queries, codes, cb, idCol, vecCol,
      dims = m * dsub, m = m, k = k, candidates = Some(cand))
  }
}

object PqAnnIndex {

  def apply(spark: SparkSession, rootPath: String): PqAnnIndex =
    new PqAnnIndex(spark, rootPath)

  /** Build (or rebuild) a compressed index: persist the coarse codebook,
    * the PQ sub-codebooks, and the corpus encoded to sub-codes and
    * partitioned by coarse cell. `coarse` is any `(cid, centv)` frame
    * ([[AnnIndex.seedCodebook]] / [[SimilarityOps.kMeansCodebook]]);
    * `pq` is any `(sub, cid, centv, cnorm2)` frame
    * ([[SimilarityOps.pqCodebook]] / [[SimilarityOps.pqCodebookTrained]]). */
  def create(spark: SparkSession, corpus: DataFrame,
      idCol: String, vecCol: String, coarse: DataFrame, pq: DataFrame,
      dims: Int, m: Int, rootPath: String): PqAnnIndex = {
    val idx = new PqAnnIndex(spark, rootPath)
    val cents = coarse.select(col("cid").cast("long").as("cid"), col("centv"))
    idx.centroidsTable.overwriteAll(cents.coalesce(1), Nil, "pq-create")
    idx.pqTable.overwriteAll(pq.coalesce(1), Nil, "pq-create")
    val (codes, h) = SubstrateCache.scoped {
      encode(corpus, idCol, vecCol, cents, pq, dims, m)
    }
    // co-locate each cell's codes: without this every upstream task
    // writes a sliver into every cell dir (cells × tasks files), and
    // search pays hundreds of file-opens per probe; one shuffle at
    // build time buys one file per cell forever after
    try idx.codesTable.overwriteAll(AnnIndex.coLocate(codes, "cell"),
      Seq("cell"), "pq-create")
    finally h.release()
    idx
  }

  /** Batch → cell-tagged sub-codes `(cell, vec_id, sub, code, cnorm2)`.
    * One coarse-assignment pass feeds both the encode and the cell tag
    * (persisted — it backs both sides of the join; callers scope the
    * registration to their write and release it after the action). */
  private[ops] def encode(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, pq: DataFrame, dims: Int, m: Int): DataFrame = {
    val assigned = SubstrateCache.persist(
      AnnIndex.assign(df, cents, idCol, vecCol))
    SimilarityOps.pqEncode(assigned, pq, "neighbor_id", "cv", dims, m)
      .withColumnRenamed("vec_id", "__pq_vec")
      .join(assigned.select(col("cid").as("cell"),
        col("neighbor_id").as("__pq_vec")), "__pq_vec")
      .select(col("cell"), col("__pq_vec").as("vec_id"), col("sub"),
        col("cid").as("code"), col("cnorm2"))
  }
}

object AnnIndex {

  import SimilarityOps.asDouble

  def apply(spark: SparkSession, rootPath: String): AnnIndex =
    new AnnIndex(spark, rootPath)

  /** Hash-co-locate rows of one `key` value into one task ahead of a
    * partitioned write (one file per key, not keys × tasks slivers) —
    * with the partition count PINNED to ~cores. The no-N
    * `repartition(col)` form lets AQE coalesce a small shuffle into one
    * task and serialize the whole upstream compute + write (r11:
    * q_td_knn_pqindex 3.4× regression); an explicit N is exempt from
    * AQE coalescing, keeps every core busy, and each key still lands
    * wholly in one task. */
  private[ops] def coLocate(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Build (or rebuild) an index at `rootPath`: persist `codebook` as the
    * centroids table and the assigned corpus as the cell-partitioned
    * vectors table. `codebook` is any `(cid, centv)` frame —
    * [[SimilarityOps.kMeansCodebook]] for a trained fit,
    * [[seedCodebook]] for the deterministic seed. */
  def create(spark: SparkSession, corpus: DataFrame,
      idCol: String, vecCol: String, codebook: DataFrame,
      rootPath: String): AnnIndex = {
    val idx = new AnnIndex(spark, rootPath)
    val cents = codebook.select(col("cid").cast("long").as("cid"), col("centv"))
    idx.centroidsTable.overwriteAll(cents.coalesce(1), Nil, "ann-create")
    // co-locate per cell (see PqAnnIndex.create): one file per cell,
    // not cells × upstream-tasks slivers
    idx.vectorsTable.overwriteAll(
      coLocate(assign(corpus, cents, idCol, vecCol), "cid"),
      Seq("cid"), "ann-create")
    idx
  }

  /** Deterministic codebook: the first `nCentroids` corpus vectors in id
    * order ([[SimilarityOps.ivfTopK]]'s seed — reproducible and
    * oracle-verifiable). */
  def seedCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).cast("long").as("cid"),
        asDouble(col(vecCol)).as("centv"))

  /** Nearest-cell assignment `(cid, neighbor_id, cv)` — one linear pass:
    * crossJoin(broadcast(centroids)) + `min_by` partial aggregate, the
    * tie-break of [[SimilarityOps.ivfCandidates]]. */
  private[ops] def assign(df: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val c = df.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    c.crossJoin(broadcast(codebook.select(col("cid"), col("centv"))))
      .withColumn("__cos", expr("graft_cosine(cv, centv)"))
      .groupBy("neighbor_id")
      .agg(min_by(struct(col("cid"), col("cv")),
        struct(coalesce(negate(col("__cos")), lit(Double.PositiveInfinity)),
          col("cid"))).as("__a"))
      .select(col("__a.cid").as("cid"), col("neighbor_id"),
        col("__a.cv").as("cv"))
  }
}
