package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text / dedup operators for large-scale training-data pipelines.
  *
  * Everything here is pure Catalyst column algebra — no UDFs — so the hot
  * path stays inside whole-stage codegen and scales linearly with
  * executors. Pairwise work (near-dup detection) is always blocked by an
  * LSH bucket key so the join is an equi-join on the bucket, never a cross
  * join: at 100 TB the shuffle is O(docs × bands), not O(docs²).
  *
  * All hash primitives are engine-portable (sha256-derived), so results
  * can be verified bit-for-bit against a SQL oracle.
  *
  * Caching note: the pairwise SELF-JOIN operators persist their per-doc
  * substrate (shingle sets, signatures) because both join sides reference
  * it; every such persist is registered with [[SubstrateCache]], and
  * long-lived sessions release them with `SubstrateCache.release(spark)`
  * at batch boundaries (the bench harness does). Everything else here —
  * including [[tfIdfTopTerms]] and the [[crossCorpusNearDupPairs]]
  * convenience form — persists nothing.
  */
object TextOps {

  /** Modulus for the polynomial fingerprint fold. */
  val FingerprintPrime = 1000000007L

  /** MinHash universal-hash modulus: first prime > 2^32. */
  val MinHashPrime = 4294967311L

  /** MinHash h_i(x) = (a_i * x + b_i) mod p. a_i < 2^31 so a*x stays in
    * signed-64 range for x < 2^32. */
  val MinHashA: Seq[Long] = Seq(
    1610612741L, 805306457L, 402653189L, 201326611L,
    100663319L, 50331653L, 25165843L, 12582917L,
    1073741827L, 536870923L, 268435459L, 134217757L,
    67108879L, 33554467L, 16777259L, 8388617L)
  val MinHashB: Seq[Long] = Seq(
    1566083941L, 988446091L, 1023456789L, 731245879L,
    354654323L, 1200956321L, 876543211L, 456789123L,
    91138289L, 1843267211L, 667894213L, 210987341L,
    1934567801L, 87654329L, 1345678917L, 543216789L)
  def minHashK: Int = MinHashA.size

  /** LSH banding: 4 bands × 4 rows over the 16-signature. Collision
    * probability per band is J⁴ — selective enough that unrelated docs
    * (J ≈ 0.05) almost never become candidates, while true near-dups
    * (J ≥ 0.8) collide in some band with p ≈ 0.93. */
  val Bands = 4
  val RowsPerBand = 4

  /** SimHash signature width (bits). */
  val SimHashBits = 16

  /** Uniform 32-bit hash of a string via sha256 prefix — portable across
    * engines (DuckDB: `CAST('0x'||substr(sha256(s),1,8) AS BIGINT)`). */
  def portableHash(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 8), 16, 10).cast("long")

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Word-bigram shingles: `w1_w2` strings. Empty for docs of <2 tokens
    * (guarded — Spark's `sequence(1,0)` would descend). */
  def bigramShingles(words: Column): Column =
    when(size(words) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(words) - 1),
        i => concat(element_at(words, i), lit("_"), element_at(words, i + 1))))

  /** Modulus keeping combined shingle hashes in 32-bit range. */
  val ShingleMod = 4294967296L

  /** Numeric bigram-shingle hashes from per-word hashes: hash each word
    * once, then combine adjacent pairs arithmetically — no per-shingle
    * string building or re-hashing. `wordHashes` must be a bound column. */
  def bigramShingleHashes(wordHashes: Column): Column =
    when(size(wordHashes) < 2, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), size(wordHashes) - 1),
        i => pmod(element_at(wordHashes, i) * 1000003L
          + element_at(wordHashes, i + 1), lit(ShingleMod))))

  /** Hashes of an array of strings (multiset, order preserved). */
  def hashAll(strings: Column): Column = transform(strings, portableHash(_))

  /** MinHash signature over a column of hashes: array of k minima. */
  def minHashSignature(hashes: Column): Column =
    array(MinHashA.zip(MinHashB).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(lit(a) * h + lit(b), lit(MinHashPrime))))
    }: _*)

  /** LSH band keys from a signature: `Bands` strings, each concatenating
    * `RowsPerBand` signature slots. Docs sharing any band key are
    * near-dup candidates. */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { j =>
      concat_ws(":",
        (0 until RowsPerBand).map(r => element_at(sig, j * RowsPerBand + r + 1)): _*)
    }: _*)

  /** SimHash over a column of hashes (one per distinct token): for each bit
    * j, sum ±1 over tokens; bit set iff the sum is positive. */
  def simHash(hashes: Column): Column =
    (0 until SimHashBits).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when((shiftright(h, j) % 2) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Polynomial fingerprint over token hashes (order-sensitive):
    * fold acc → (acc * 131 + h) mod p. */
  def fingerprint(hashes: Column): Column =
    aggregate(hashes, lit(0L),
      (acc, h) => pmod(acc * 131L + h, lit(FingerprintPrime)))

  // ------------------------------------------------------------ dedup API

  /** Exact dedup groups: one row per distinct content hash with the
    * canonical (minimum) id and the duplicate count.
    * At scale this is a single hash-aggregate with map-side combine. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** MinHash+LSH near-duplicate candidate pairs with exact shingle-set
    * Jaccard counts. Returns (id_a, id_b, inter, uni) for every pair of
    * docs sharing at least one LSH band.
    *
    * Plan shape: per-doc signature (narrow) → explode bands (×4) →
    * self-equi-join on (band, key) → distinct pairs → re-join the two
    * shingle sets → intersect counts. The only shuffles are the band join
    * and the two id joins — all equi, all AQE-coalesced. */
  /** Per-doc distinct shingle-hash sets — computed through EXPLODED rows,
    * not per-row array lambdas: higher-order functions evaluate
    * interpreted (CodegenFallback) and Catalyst's CollapseProject fuses
    * staged projections back into nested lambdas, making sha-per-shingle
    * O(tokens²) per row. Exploding instead keeps every step — tokenize,
    * sha256 per word, adjacent-pair combine via `lead`, per-doc set — in
    * whole-stage codegen, with linear work and two doc-id shuffles. This
    * is also the shape that scales: (doc, shingle) rows hash-partition
    * evenly across executors regardless of document length skew. */
  /** Exploded (doc id, shingle hash) rows — the shared substrate for both
    * the shingle-set aggregate and the MinHash signature aggregate. */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("__id"),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "__w")))
    val wh = tok.select(col("__id"), col("__pos"), portableHash(col("__w")).as("__h"))
    val w = Window.partitionBy("__id").orderBy("__pos")
    wh.withColumn("__h2", lead("__h", 1).over(w))
      .filter(col("__h2").isNotNull)
      .select(col("__id"),
        pmod(col("__h") * 1000003L + col("__h2"), lit(ShingleMod)).as("__s"))
  }

  private def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    shingleRows(df, idCol, textCol)
      .groupBy("__id").agg(collect_set(col("__s")).as("__hs"))

  /** Per-doc MinHash substrate: distinct shingle set + all k signature
    * slots in ONE hash-aggregate — min over the exploded rows equals min
    * over the distinct set, and `min(pmod(...))` stays in whole-stage
    * codegen — no interpreted array lambdas anywhere on the hot path, so
    * a cache eviction re-derives the signatures at full codegen speed.
    * Persisted: band joins + set re-joins reuse it several times; the
    * cached form is (id, long[], 16 longs) — a few MB per million docs. */
  private def docSignatures(df: DataFrame, idCol: String, textCol: String,
      cache: Boolean = true): DataFrame = {
    val sigAggs = MinHashA.zip(MinHashB).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("__s") * a + b, lit(MinHashPrime))).as(s"__m$i")
    }
    val out = shingleRows(df, idCol, textCol)
      .groupBy("__id")
      .agg(collect_set(col("__s")).as("__hs"), sigAggs: _*)
    if (cache) SubstrateCache.persist(out)
    else out
  }

  /** Per-doc MinHash index frame — shingle set + signature slots, the
    * narrow projection [[crossCorpusNearDupPairsWith]] consumes. Compute
    * it ONCE for a large corpus and write it to a table; incremental dedup
    * then pays only for each incoming batch (the corpus is never
    * re-tokenized per call). Columns: `__id`, `__hs`, `__m0..__m15`.
    * NOT persisted here — the write-once indexing flow never re-reads it;
    * persist (or store and re-read) it yourself when joining repeatedly. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    docSignatures(df, idCol, textCol, cache = false)

  /** Band rows as (id, band index, struct of raw slots): the struct
    * equi-join blocks identically to the oracle's concat'd key (fixed
    * integer slots ⇒ concat is injective) without building strings. */
  private def bandRows(docs: DataFrame): DataFrame = {
    val bandStructs = array((0 until Bands).map { j =>
      struct((0 until RowsPerBand).map(r =>
        col(s"__m${j * RowsPerBand + r}").as(s"k$r")): _*)
    }: _*)
    docs.select(col("__id"), posexplode(bandStructs).as(Seq("__pos", "__key")))
  }

  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = docSignatures(df, idCol, textCol)
    val bands = bandRows(docs)

    val pairs = bands.alias("a")
      .join(bands.alias("b"),
        col("a.__pos") === col("b.__pos") && col("a.__key") === col("b.__key")
          && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()

    val sets = docs.select(col("__id"), col("__hs"))
    pairs
      .join(sets.withColumnRenamed("__id", "id_a").withColumnRenamed("__hs", "hs_a"), "id_a")
      .join(sets.withColumnRenamed("__id", "id_b").withColumnRenamed("__hs", "hs_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).as("inter"),
        (size(col("hs_a")) + size(col("hs_b"))
          - size(array_intersect(col("hs_a"), col("hs_b")))).as("uni"))
  }

  /** Cross-corpus near-duplicate pairs: MinHash band candidates BETWEEN an
    * incoming batch and an existing corpus — the incremental-dedup shape.
    * A new crawl is checked against an already-deduplicated corpus without
    * ever re-pairing the corpus against itself: the corpus side contributes
    * only its (band, key) rows and shingle sets, so the join cost is
    * O(batch bands) probes into a corpus-side hash relation, not
    * O(corpus²).
    *
    * Returns `(in_id, corpus_id, inter, uni)` for every incoming doc that
    * shares at least one LSH band with a corpus doc, with exact
    * shingle-set Jaccard counts for thresholding. Drop incoming docs with
    * any pair at/above the threshold to keep the corpus near-dup-free.
    *
    * At 100 TB the corpus-side signatures are computed once and stored
    * (they are a narrow (id, 16 longs, set) projection); each incoming
    * batch then shuffles only itself plus the matched band buckets.
    *
    * Cache contract: like [[minHashSignatures]], this convenience form
    * persists NOTHING — each side's signatures are recomputed by the band
    * join and the set join (two passes per side). Callers that run it
    * repeatedly, or on a large corpus, should precompute
    * [[minHashSignatures]] themselves (persisted or stored as a table)
    * and call [[crossCorpusNearDupPairsWith]] — the steady-state shape —
    * so the session owns every cache's lifecycle. */
  def crossCorpusNearDupPairs(
      incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame =
    crossCorpusNearDupPairsWith(
      docSignatures(incoming, idCol, textCol, cache = false),
      docSignatures(corpus, idCol, textCol, cache = false))

  /** [[crossCorpusNearDupPairs]] over precomputed [[minHashSignatures]]
    * frames — the steady-state shape: the corpus index is computed once
    * and stored; each batch call signs only the batch. */
  def crossCorpusNearDupPairsWith(
      inDocs: DataFrame, corpDocs: DataFrame): DataFrame = {
    val pairs = bandRows(inDocs).alias("a")
      .join(bandRows(corpDocs).alias("b"),
        col("a.__pos") === col("b.__pos") && col("a.__key") === col("b.__key"))
      .select(col("a.__id").as("in_id"), col("b.__id").as("corpus_id"))
      .distinct()
    pairs
      .join(inDocs.select(col("__id").as("in_id"), col("__hs").as("hs_a")), "in_id")
      .join(corpDocs.select(col("__id").as("corpus_id"), col("__hs").as("hs_b")),
        "corpus_id")
      .select(col("in_id"), col("corpus_id"),
        size(array_intersect(col("hs_a"), col("hs_b"))).as("inter"),
        (size(col("hs_a")) + size(col("hs_b"))
          - size(array_intersect(col("hs_a"), col("hs_b")))).as("uni"))
  }

  /** Benchmark-contamination scores — the decontamination primitive for
    * training corpora: for every corpus doc, the fraction of its DISTINCT
    * bigram shingles that appear anywhere in `benchmark` (n-gram overlap
    * against a held-out evaluation set). Docs with no shingles (< 2
    * tokens) score 0.0.
    *
    * Output: (doc_id, n_shingles, n_contaminated, contamination).
    *
    * Plan shape at 100 TB: two exploded shingle streams, a distinct
    * each, one equi-join on the shingle key, one count aggregate — every
    * shuffle is a hash-partition on doc id or shingle key, nothing
    * pairwise, so work is linear in corpus tokens regardless of benchmark
    * or corpus size. Shingle keys are two independent 32-bit folds
    * (64-bit effective) — see the in-body comment. */
  def contaminationScores(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // TWO independent 32-bit folds (64-bit effective — the
    // [[noveltyScores]]/[[dedupSubstrings]] key): decontamination
    // REMOVES data, and with a single 32-bit fold a benchmark set with
    // 10M+ distinct shingles would spuriously flag ~|bench|/2^32 of
    // every clean document's shingles at corpus scale — erasing good
    // documents at a measurable rate. Per-word hash bound BEFORE the
    // gram fold (the sourceOverlapMatrix projection-boundary trap).
    def gramRows(df: DataFrame): DataFrame =
      df.select(col(s"`$idCol`").as("__id"),
          hashAll(tokens(col(s"`$textCol`"))).as("__hw"))
        .select(col("__id"), explode(zip_with(
            ngramHashes(col("__hw"), 2),
            ngramHashes(col("__hw"), 2, ShingleMult2),
            (x, y) => struct(x.as("g1"), y.as("g2")))).as("__gs"))
        .select(col("__id"), col("__gs.g1").as("__g1"),
          col("__gs.g2").as("__g2"))
        .distinct()
    val corpusShingles = gramRows(corpus)
    val benchShingles = gramRows(benchmark)
      .select(col("__g1"), col("__g2")).distinct()
      .withColumn("__hit", lit(1))
    val scored = corpusShingles
      .join(benchShingles, Seq("__g1", "__g2"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_contaminated"))
      .withColumnRenamed("__id", "doc_id")
    corpus.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("n_contaminated").cast("double")
          / col("n_shingles").cast("double"), lit(0.0)).as("contamination"))
  }

  /** Repetition metrics — the Gopher-style quality signal for boilerplate
    * and spam: how much of a document is repeated content. Per doc:
    * total bigram occurrences, distinct bigrams, and the repeated
    * fraction `1 - distinct/total` (0.0 for docs with < 2 tokens — nothing
    * to repeat). One exploded stream and one count/count-distinct
    * aggregate; linear in corpus tokens.
    *
    * Output: (doc_id, n_bigrams, n_distinct, repetition). */
  def repetitionMetrics(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = shingleRows(df, idCol, textCol)
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"),
        count_distinct(col("__s")).as("n_distinct"))
      .withColumnRenamed("__id", "doc_id")
    df.select(col(idCol).as("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(lit(1.0) - col("n_distinct").cast("double")
          / col("n_bigrams").cast("double"), lit(0.0)).as("repetition"))
  }

  /** Deterministic sequence packing: assign docs to token-budget bins for
    * training-batch construction. Docs are sharded by id hash (`shards` ≈
    * parallel writers), ordered deterministically within the shard
    * (hash, id), and cut into bins by EXCLUSIVE-prefix token sums:
    * `bin = prefix_tokens_before DIV maxTokens`. No bin starts past the
    * budget; a bin may overflow by less than one document — the standard
    * streaming approximation (exact greedy packing is inherently
    * sequential state and cannot distribute). One window shuffle on the
    * shard key; Spark's rank-limit machinery does not apply but the
    * running sum is a single pass per shard partition.
    *
    * Output: (doc_id, shard, n_tokens, bin). */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Long, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxTokens > 0, "maxTokens must be positive")
    require(shards > 0, "shards must be positive")
    // null guards: a null text packs as 0 tokens and a null id hashes to
    // bucket 0 — every doc gets a (shard, bin), never a null assignment
    val base = df.select(col(idCol).as("doc_id"),
        coalesce(size(tokens(col(textCol))).cast("long"), lit(0L)).as("n_tokens"),
        coalesce(portableHash(col(idCol).cast("string")), lit(0L)).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"(__cum - n_tokens) DIV $maxTokens").as("bin"))
  }

  /** Materialize PACKED training sequences — the step after
    * [[packSequences]]' budget math: concatenate each (shard, bin)'s
    * documents into one id array in packing order, `eosId` appended
    * after every document (the GPT-style separator convention). `idsCol`
    * is any `array<int>` id column — [[bpeEncode]]'s output in a real
    * pipeline; the oracle query drives it with hashed words so DuckDB
    * can restate the packing end to end.
    *
    * Bin assignment is EXACTLY [[packSequences]]' (exclusive-prefix
    * token sums over (shard; hash, id) order, n_tokens = id count), so
    * the two surfaces agree document-for-document; the emitted array
    * additionally carries one separator per document (`n_tokens` counts
    * them).
    *
    * Output: (shard, bin, n_docs, n_tokens, ids).
    *
    * Scale shape: the same single window shuffle as [[packSequences]],
    * then ONE hash aggregate on (shard, bin). The aggregation buffer is
    * bounded by the BIN BUDGET — maxTokens plus one document's overflow
    * — never by corpus or shard size; in-bin order is pinned by sorting
    * the buffered (hash, id, ids) structs, so the result is identical
    * under any aggregation arrival order. */
  def packMaterialize(df: DataFrame, idCol: String, idsCol: String,
      maxTokens: Long, shards: Int, eosId: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxTokens > 0, "maxTokens must be positive")
    require(shards > 0, "shards must be positive")
    val base = df.select(col(s"`$idCol`").as("doc_id"),
        coalesce(col(s"`$idsCol`"), array().cast("array<int>")).as("__ids"),
        coalesce(portableHash(col(s"`$idCol`").cast("string")), lit(0L))
          .as("__h"))
      .withColumn("n_tokens", size(col("__ids")).cast("long"))
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(__cum - n_tokens) DIV $maxTokens"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col("__h"), col("doc_id"),
          col("__ids")))).as("__parts"))
      .select(col("shard"), col("bin"), col("n_docs"),
        flatten(transform(col("__parts"),
          p => concat(p("__ids"), array(lit(eosId))))).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"),
        col("ids"))
  }

  /** Per-doc SimHash signatures (16-bit) over distinct tokens. Docs with
    * equal signatures are near-dup candidates; grouping by signature is a
    * single aggregate. */
  def simHashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      simHash(hashAll(array_distinct(tokens(col(textCol))))).as("simhash"))

  /** Exact n-gram Jaccard for pairs blocked on an equality key (e.g. same
    * source, same length bucket) — the composable "blocked pairwise"
    * primitive. */
  def blockedJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: Column): DataFrame = {
    // persisted for the same reason as minHashNearDupPairs: the
    // self-join would recompute the interpreted sha256 lambdas per side.
    // Registered with SubstrateCache so the session can release it.
    val docs = SubstrateCache.persist(
      shingleSets(df, idCol, textCol)
        .join(df.select(col(idCol).as("__id"), blockCol.as("__blk")), "__id"))
    docs.alias("a").join(docs.alias("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        size(array_intersect(col("a.__hs"), col("b.__hs"))).as("inter"),
        (size(col("a.__hs")) + size(col("b.__hs"))
          - size(array_intersect(col("a.__hs"), col("b.__hs")))).as("uni"))
  }

  // ---------------------------------------------------- text analysis API

  /** Stopword lists for the n-gram language-ID heuristic. */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "mit", "von"),
    "es" -> Seq("el", "los", "y", "un", "una", "es", "por", "como"),
    "fr" -> Seq("le", "les", "et", "une", "est", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "人"))

  private def stopCount(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(stops)))

  /** Language-ID: argmax of per-language stopword counts, fixed tiebreak
    * order (list order above). */
  def langScores(words: Column): Seq[(String, Column)] =
    StopwordsByLang.map { case (lang, stops) => lang -> stopCount(words, stops) }

  def langGuess(words: Column): Column = {
    val scores = langScores(words)
    val guess = scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (greatest(bestScore, score),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }
    guess._2
  }

  /** Quality metrics: token counts, distinct ratio, punctuation density,
    * stopword ratio, and a composite score. */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String,
      nCharsCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    val nTok = size(ws)
    val nDis = size(array_distinct(ws))
    val punct = size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9\\s]"), lit(0)))
    val stops = stopCount(ws, StopwordsByLang.head._2)
    df.select(
      col(idCol).as("doc_id"),
      nTok.as("n_tokens"),
      nDis.as("n_distinct"),
      punct.as("n_punct"),
      stops.as("n_stopwords"),
      round(nDis.cast("double") / nTok
        * (lit(1.0) - punct.cast("double") / col(nCharsCol)), 4).as("quality"))
  }

  /** The Gopher rules' required-stopword probe set (Rae et al. 2021,
    * §A1.1): a document passing the other rules but containing fewer
    * than 2 of these is still flagged (catches keyword-stuffing pages
    * that never form sentences). */
  val GopherRequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality RULES (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", §A1.1) — the
    * standard rule-based pre-filter most web-scale curation pipelines
    * apply before any model-based scoring. Per document: the rule
    * metrics, one boolean per rule, and the conjunction as `keep`.
    * Implemented rules (the document-shape subset; line-layout rules
    * need line structure this corpus lacks):
    *
    *  - word count within [minWords, maxWords]          (`ok_word_count`)
    *  - mean word length within [3, 10] characters      (`ok_mean_word_len`)
    *  - `#` occurrences ≤ 10% of words                  (`ok_hash_ratio`)
    *  - ellipsis (`...`/`…`) occurrences ≤ 10% of words (`ok_ellipsis_ratio`)
    *  - ≥ 80% of words contain an alphabetic character  (`ok_alpha_words`)
    *  - ≥ 2 distinct required stopwords present         (`ok_stopwords`)
    *
    * The symbol rules count occurrences ANYWHERE in the text (`foo#bar`
    * counts, a trailing `word...` counts; `...` occurrences are
    * non-overlapping left-to-right, Python `str.count`'s convention) and
    * bound each symbol type separately — the paper's "symbol-to-word
    * ratio greater than 0.1 for either the hash symbol or the ellipsis".
    *
    * Every FLAG compares exact integers (cross-multiplied ratios), so
    * keep decisions are bit-identical across engines; the reported
    * `mean_word_len` double is one IEEE division on identical operands.
    *
    * Scale shape: pure per-row column algebra over the tokenized text —
    * whole-stage codegen, no shuffle at all (the filter most worth
    * running FIRST at 100 TB, before anything that pays a shuffle). */
  def gopherQualityRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(s"`$textCol`")
    val ws = tokens(t)
    val nWords = size(ws)
    val sumLen = aggregate(transform(ws, w => length(w)),
      lit(0L), (acc, x) => acc + x)
    // occurrence counts via replace-and-measure (literal, non-overlapping
    // left-to-right — Python str.count's convention): exact integers, no
    // regex engine on the hot path
    val nHash = length(t) - length(replace(t, lit("#")))
    val nEllipsis =
      (length(t) - length(replace(t, lit("...")))) / 3 +
        (length(t) - length(replace(t, lit("…"))))
    val nAlpha = size(filter(ws, w => w.rlike("[a-zA-Z]")))
    val nReqStops = size(array_intersect(
      array_distinct(transform(ws, lower(_))),
      array(GopherRequiredStopwords.map(lit): _*)))
    val okCount = nWords >= minWords && nWords <= maxWords
    // 3 ≤ sumLen/n ≤ 10 as exact integer cross-multiplication
    val okMeanLen = sumLen >= nWords.cast("long") * 3L &&
      sumLen <= nWords.cast("long") * 10L
    val okHash = nHash.cast("long") * 10L <= nWords.cast("long")
    val okEllipsis = nEllipsis.cast("long") * 10L <= nWords.cast("long")
    val okAlpha = nAlpha.cast("long") * 5L >= nWords.cast("long") * 4L
    val okStops = nReqStops >= 2
    df.select(
      col(s"`$idCol`").as("doc_id"),
      nWords.cast("long").as("n_words"),
      (sumLen.cast("double") / nWords).as("mean_word_len"),
      nHash.cast("long").as("n_hash"),
      nEllipsis.cast("long").as("n_ellipsis"),
      nAlpha.cast("long").as("n_alpha_words"),
      nReqStops.cast("long").as("n_req_stopwords"),
      okCount.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okHash.as("ok_hash_ratio"),
      okEllipsis.as("ok_ellipsis_ratio"),
      okAlpha.as("ok_alpha_words"),
      okStops.as("ok_stopwords"),
      (okCount && okMeanLen && okHash && okEllipsis && okAlpha && okStops)
        .as("keep"))
  }

  /** Line-start bullet markers for [[gopherLineRules]] (the common
    * repro set: unicode bullets plus the ASCII dash/star). */
  val GopherBulletPrefixes: Seq[String] =
    Seq("•", "‣", "▶", "◦", "▪", "▫", "-", "*")

  /** Gopher LINE-layout rules (Rae et al. 2021 §A1.1's line-based half —
    * the rules [[gopherQualityRules]]' document-shape subset leaves to
    * line structure). Lines are the '\n'-split segments with surrounding
    * spaces trimmed, empty segments dropped. Per document:
    *
    *  - duplicate-line fraction ≤ 30% of lines       (`ok_dup_lines`)
    *  - duplicate-line CHARS ≤ 20% of line chars     (`ok_dup_chars`)
    *  - bullet-started lines ≤ 90% of lines          (`ok_bullet_lines`)
    *  - ellipsis-ended (`...`/`…`) lines ≤ 30%       (`ok_ellipsis_lines`)
    *
    * "Duplicate" counts every occurrence beyond a line's first — computed
    * by sorting the line array and summing adjacent equalities, O(L log L)
    * per document instead of the O(L²) per-line containment probe (equal
    * values are adjacent under any total order, so the count is
    * sort-order-independent and engine-portable). A document with no
    * non-empty lines passes every rule (0 ≤ 0 bounds — no line evidence
    * is not a violation). Flags are exact integer cross-multiplications.
    *
    * Scale shape: per-row array algebra, zero shuffle — same contract as
    * [[gopherQualityRules]]: run both BEFORE anything that pays an
    * exchange at 100 TB. */
  def gopherLineRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = filter(
      transform(split(col(s"`$textCol`"), "\n"), l => trim(l)), l => l =!= "")
    val n = size(lines)
    val sorted = array_sort(lines)
    val adjLen = greatest(n - 1, lit(0))
    // adjacent-equality over the sorted array: element i duplicates its
    // predecessor ⇒ one occurrence beyond the first
    val dupPairs = zip_with(
      slice(sorted, lit(1), adjLen), slice(sorted, lit(2), adjLen),
      (a, b) => when(a === b, length(b)).otherwise(0))
    val nDupLines = aggregate(dupPairs,
      lit(0L), (acc, x) => acc + when(x > 0, 1L).otherwise(0L))
    val dupChars = aggregate(dupPairs, lit(0L), (acc, x) => acc + x)
    val lineChars = aggregate(transform(lines, l => length(l)),
      lit(0L), (acc, x) => acc + x)
    val isBullet = (l: Column) => GopherBulletPrefixes
      .map(p => l.startsWith(p)).reduce(_ || _)
    val nBullet = size(filter(lines, isBullet))
    val nEllipsis = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…")))
    val okDupLines = nDupLines * 10L <= n.cast("long") * 3L
    val okDupChars = dupChars * 5L <= lineChars
    val okBullet = nBullet.cast("long") * 10L <= n.cast("long") * 9L
    val okEllipsis = nEllipsis.cast("long") * 10L <= n.cast("long") * 3L
    df.select(
      col(s"`$idCol`").as("doc_id"),
      n.cast("long").as("n_lines"),
      nDupLines.as("n_dup_lines"),
      dupChars.as("dup_line_chars"),
      lineChars.as("line_chars"),
      nBullet.cast("long").as("n_bullet_lines"),
      nEllipsis.cast("long").as("n_ellipsis_lines"),
      okDupLines.as("ok_dup_lines"),
      okDupChars.as("ok_dup_chars"),
      okBullet.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      (okDupLines && okDupChars && okBullet && okEllipsis).as("keep"))
  }

  /** Gopher §A1.2 thresholds, in exact percent: top-n-gram character
    * fraction caps for n = 2..4, duplicate-n-gram character-coverage
    * caps for n = 5..10 (Rae et al. 2021, Table A1). */
  val GopherTopNgramMaxPct: Seq[(Int, Int)] =
    Seq(2 -> 20, 3 -> 18, 4 -> 16)
  val GopherDupNgramMaxPct: Seq[(Int, Int)] =
    Seq(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  /** Gopher REPETITION rules (Rae et al. 2021 §A1.2's word-n-gram half —
    * the line/paragraph duplicate fractions live in [[gopherLineRules]]
    * and [[dedupParagraphs]]' domain): per document,
    *
    *  - '''top-n-gram char fraction''' (n = 2,3,4): characters covered
    *    by the most repeated n-gram — `max over grams of count ×
    *    charlen`, where charlen is the gram's summed word lengths
    *    (separator-free, same convention as the `word_chars`
    *    denominator). The max-product form makes the tie-break
    *    deterministic and engine-portable where "the most common gram"
    *    alone is not (equal counts: the larger coverage wins).
    *  - '''duplicate-n-gram char coverage''' (n = 5..10): characters of
    *    word positions covered by at least one n-gram occurring ≥2
    *    times in the document — a position union, so overlapping
    *    duplicates never double-count.
    *
    * Flags are exact integer cross-multiplications against Table A1's
    * caps ([[GopherTopNgramMaxPct]], [[GopherDupNgramMaxPct]]); `keep`
    * is the conjunction. Documents shorter than n words carry 0 for
    * that n (no gram evidence is not a violation). Gram keys are the
    * scoring-grade 32-bit fold ([[repeatedSpanCounts]]' reasoning — a
    * rare collision perturbs a count, destroys nothing).
    *
    * Scale shape: one exploded gram stream per n (arrays built IN-ROW
    * before the explode, so no per-row array duplication), counted by
    * hash aggregates on (doc, n, gram); the duplicate coverage is a
    * position-union distinct + one join against the per-word lengths —
    * every shuffle hash-partitions on the doc id (+ gram), nothing
    * corpus-pairwise. */
  def gopherRepetitionRules(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = SubstrateCache.persist(
      df.select(col(s"`$idCol`").as("__id"), tokens(col(s"`$textCol`")).as("__ws")))
    val base = toks.select(col("__id"),
      hashAll(col("__ws")).as("__hw"),
      transform(col("__ws"), w => length(w).cast("long")).as("__ls"))
    // (id, n, pos, gram, charlen) occurrences — charlen computed in-row
    // via a slice sum so the exploded rows never carry the parent arrays
    def gramRows(n: Int): DataFrame = base.select(col("__id"),
        posexplode(zip_with(
          ngramHashes(col("__hw"), n),
          when(size(col("__ls")) < n, array().cast("array<long>"))
            .otherwise(transform(
              sequence(lit(1), size(col("__ls")) - (n - 1)),
              i => aggregate(slice(col("__ls"), i, lit(n)), lit(0L), _ + _))),
          (g, c) => struct(g.as("g"), c.as("c")))).as(Seq("__p0", "__gc")))
      .select(col("__id"), lit(n).as("__n"), (col("__p0") + 1).as("__pos"),
        col("__gc.g").as("__g"), col("__gc.c").as("__c"))
    val topNs = GopherTopNgramMaxPct.map(_._1)
    val dupNs = GopherDupNgramMaxPct.map(_._1)
    val topGrams = topNs.map(gramRows).reduce(_ unionByName _)
    val dupGrams = dupNs.map(gramRows).reduce(_ unionByName _)
    // top-n: per (doc, n, gram) count × charlen, max per (doc, n)
    val top = topGrams.groupBy("__id", "__n", "__g")
      .agg(count(lit(1)).as("__cnt"), max("__c").as("__cl"))
      .groupBy("__id", "__n")
      .agg(max(col("__cnt") * col("__cl")).as("__top"))
      .groupBy("__id").pivot("__n", topNs).agg(first("__top"))
      .select(col("__id") +: topNs.map(n =>
        col(n.toString).as(s"top${n}_chars")): _*)
    // dup-n: union of word positions covered by any ≥2-count gram
    val w = org.apache.spark.sql.expressions.Window.partitionBy(
      "__id", "__n", "__g")
    val lens = toks.select(col("__id"),
        posexplode(col("__ws")).as(Seq("__p0", "__w")))
      .select(col("__id"), (col("__p0") + 1).as("__wp"),
        length(col("__w")).cast("long").as("__wl"))
    val dup = dupGrams
      .withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__cnt") >= 2)
      .select(col("__id"), col("__n"),
        explode(sequence(col("__pos"), col("__pos") + col("__n") - 1))
          .as("__wp"))
      .distinct()
      .join(lens, Seq("__id", "__wp"))
      .groupBy("__id", "__n").agg(sum("__wl").as("__dup"))
      .groupBy("__id").pivot("__n", dupNs).agg(first("__dup"))
      .select(col("__id") +: dupNs.map(n =>
        col(n.toString).as(s"dup${n}_chars")): _*)
    val stats = toks.select(col("__id"),
      size(col("__ws")).cast("long").as("n_words"),
      aggregate(transform(col("__ws"), w => length(w).cast("long")),
        lit(0L), _ + _).as("word_chars"))
    val joined = stats
      .join(top, Seq("__id"), "left")
      .join(dup, Seq("__id"), "left")
    val topCols = GopherTopNgramMaxPct.map { case (n, pct) =>
      (coalesce(col(s"top${n}_chars"), lit(0L)),
        s"top${n}_chars", s"ok_top$n", pct)
    }
    val dupCols = GopherDupNgramMaxPct.map { case (n, pct) =>
      (coalesce(col(s"dup${n}_chars"), lit(0L)),
        s"dup${n}_chars", s"ok_dup$n", pct)
    }
    val all = topCols ++ dupCols
    val flags = all.map { case (c, _, okName, pct) =>
      (c * 100L <= col("word_chars") * pct, okName)
    }
    joined.select(
      (col("__id").as("doc_id") +: col("n_words") +: col("word_chars") +:
        (all.map { case (c, name, _, _) => c.as(name) } ++
          flags.map { case (p, okName) => p.as(okName) } :+
          flags.map(_._1).reduce(_ && _).as("keep"))): _*)
  }

  /** Page-level kill phrases and line-level kill words for
    * [[c4QualityRules]] (Raffel et al. 2020 §2.2's published lists). */
  val C4PolicyPhrases: Seq[String] =
    Seq("terms of use", "privacy policy", "cookie policy", "uses cookies")

  /** C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
    * the line-and-page heuristics that produced C4 from Common Crawl,
    * the other canonical curation gate next to [[gopherQualityRules]].
    * Lines are '\n'-split, trimmed, non-empty. A line is KEPT when it
    *
    *  - has at least `minWordsPerLine` (default 5) words,
    *  - ends in terminal punctuation (`.` `!` `?` `"`), and
    *  - mentions neither "javascript" nor a policy phrase
    *    ([[C4PolicyPhrases]]), case-insensitively.
    *
    * Page-level flags: "lorem ipsum" anywhere, a `{` anywhere (the
    * paper's code-page proxy), and the ≥3-sentence requirement —
    * sentences approximated as terminal-punctuation marks in the kept
    * lines (the paper uses an English sentence splitter; the mark count
    * is the engine-portable declarative stand-in). `keep` =
    * no-lorem ∧ no-brace ∧ ≥3 sentences.
    *
    * Returns (doc_id, n_lines, n_kept_lines, n_sentences,
    * has_lorem_ipsum, has_curly_brace, kept_text, keep).
    *
    * Scale shape: per-row array algebra, zero shuffle — run alongside
    * the Gopher gates before anything that pays an exchange. */
  def c4QualityRules(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 5): DataFrame = {
    val t = col(s"`$textCol`")
    val lines = filter(
      transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    val keptArr = filter(lines, l => {
      val ll = lower(l)
      val killed = (C4PolicyPhrases.map(p => ll.contains(p)) :+
        ll.contains("javascript")).reduce(_ || _)
      size(split(l, "\\s+")) >= minWordsPerLine &&
        (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
          l.endsWith("\"")) && !killed
    })
    val keptText = array_join(keptArr, "\n")
    val nSentences = length(keptText) -
      length(translate(keptText, ".!?", ""))
    val hasLorem = lower(t).contains("lorem ipsum")
    val hasBrace = t.contains("{")
    df.select(
      col(s"`$idCol`").as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(keptArr).cast("long").as("n_kept_lines"),
      nSentences.cast("long").as("n_sentences"),
      hasLorem.as("has_lorem_ipsum"),
      hasBrace.as("has_curly_brace"),
      keptText.as("kept_text"),
      (!hasLorem && !hasBrace && nSentences >= 3).as("keep"))
  }

  /** Corpus-order n-gram NOVELTY — per document, the share of its
    * word-n-gram occurrences that are the corpus-wide FIRST occurrence
    * of that n-gram (under the same `id × OrdScale + pos` total order
    * and 64-bit two-fold gram keys as [[dedupSubstrings]]). Documents
    * dominated by already-seen n-grams add little new signal; pruning or
    * down-weighting by novelty is the aggregate-score counterpart of
    * span excision (Lee et al. 2022 measure the duplication; this
    * reports its complement per document as a selection signal).
    *
    * Returns (doc_id, n_grams, n_novel, novelty) — `novelty` is NULL for
    * documents shorter than n words (no gram evidence ≠ novel).
    *
    * Scale shape: identical to [[dedupSubstrings]]'s gram pass — one
    * explode to (doc, pos, gram) rows, one hash aggregate for the
    * corpus-first winners, one equi join back, one per-doc aggregate;
    * O(total tokens), all shuffles hash-partitioned on the gram key or
    * the doc id. */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      n: Int = SubstringGramK): DataFrame = {
    require(n >= 2, s"n-gram length must be >= 2, got $n")
    val toks = SubstrateCache.persist(
      df.select(col(s"`$idCol`").as("__id"), tokens(col(s"`$textCol`")).as("__ws")))
    val grams = toks
      .select(col("__id"), hashAll(col("__ws")).as("__hw"))
      .select(col("__id"), posexplode(zip_with(
          ngramHashes(col("__hw"), n),
          ngramHashes(col("__hw"), n, ShingleMult2),
          (x, y) => struct(x.as("g1"), y.as("g2")))).as(Seq("__p0", "__gs")))
      .select(col("__id"), col("__gs.g1").as("__g"), col("__gs.g2").as("__g2"),
        (col("__id") * OrdScale + col("__p0") + 1).as("__ord"))
    val winners = grams.groupBy("__g", "__g2").agg(min("__ord").as("__win"))
    val perDoc = grams.join(winners, Seq("__g", "__g2"))
      .groupBy("__id")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__ord") === col("__win"), 1L).otherwise(0L)).as("__nov"))
    toks.select(col("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as("doc_id"),
        coalesce(col("__n"), lit(0L)).as("n_grams"),
        coalesce(col("__nov"), lit(0L)).as("n_novel"),
        (col("__nov").cast("double") / col("__n")).as("novelty"))
  }

  /** Cross-source n-gram OVERLAP matrix — the leakage/mirror audit run
    * before choosing mixture weights: for every pair of sources sharing
    * at least one distinct word-n-gram, the two distinct-gram counts,
    * the common count, Jaccard, and containment (common over the
    * smaller side — the signal that flags one source as a subset/mirror
    * of another even when Jaccard is diluted by the larger side).
    * Two crawls of the same site, a dataset re-released inside a
    * compilation, or benchmark text syndicated across sources all
    * surface here before they skew a mixture plan.
    *
    * Returns (source_a, source_b, grams_a, grams_b, n_common, jaccard,
    * containment), source_a < source_b, only pairs with n_common > 0.
    *
    * Scale shape: one explode to DISTINCT (source, gram) rows — the
    * aggregate bounds everything downstream by distinct grams, not
    * corpus size; the pair join is an equi self-join on the gram hash
    * (a gram in s sources emits s·(s−1)/2 pairs — bounded by the SOURCE
    * count squared, not documents); per-pair and per-source counts are
    * map-side-combined hash aggregates. Ratios are single IEEE
    * divisions of exact longs. Gram keys are TWO independent 32-bit
    * folds (64-bit effective, [[dedupSubstrings]]/[[noveltyScores]]'
    * key): distinct grams per source approach 2^32 at 100 TB, where a
    * single 32-bit fold would inflate every pair's n_common by
    * ~|A|·|B|/2^32 spurious matches — hundreds of millions of fake
    * common grams, materially skewing the very jaccard/containment
    * signals this leakage audit exists to produce. */
  def sourceOverlapMatrix(df: DataFrame, textCol: String, groupCol: String,
      n: Int = 3): DataFrame = {
    // bind the per-word hash array BEFORE the gram fold: inlined, the
    // fold's element_at lambda re-evaluates the whole sha-256 array per
    // gram position — O(words²) hashing per document (measured 40 s vs
    // 0.7 s at sf0.1). The projection boundary pins it to once per doc
    // (CollapseProject keeps multi-referenced non-cheap expressions).
    val grams = SubstrateCache.persist(
      df.select(col(s"`$groupCol`").as("__src"),
          hashAll(tokens(col(s"`$textCol`"))).as("__hw"))
        .select(col("__src"), posexplode(zip_with(
            ngramHashes(col("__hw"), n),
            ngramHashes(col("__hw"), n, ShingleMult2),
            (x, y) => struct(x.as("g1"), y.as("g2")))).as(Seq("__p0", "__gs")))
        .select(col("__src"), col("__gs.g1").as("__g"), col("__gs.g2").as("__g2"))
        .distinct())
    val counts = grams.groupBy("__src").agg(count(lit(1)).as("__n"))
    val common = grams.alias("a")
      .join(grams.alias("b"),
        col("a.__g") === col("b.__g") && col("a.__g2") === col("b.__g2") &&
          col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(counts).withColumnRenamed("__src", "source_a")
        .withColumnRenamed("__n", "grams_a"), Seq("source_a"))
      .join(broadcast(counts).withColumnRenamed("__src", "source_b")
        .withColumnRenamed("__n", "grams_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("grams_a"), col("grams_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("grams_a") + col("grams_b") - col("n_common"))).as("jaccard"),
        (col("n_common").cast("double") /
          least(col("grams_a"), col("grams_b"))).as("containment"))
  }

  /** Lexical-diversity scores per document: type-token ratio, hapax ratio
    * (types occurring exactly once — low hapax flags template/boilerplate
    * text), and Simpson concentration Σ(cnt/n)² (the probability two
    * random tokens coincide — high values flag degenerate repetition).
    *
    * All three are quotients of exact integer aggregates, so each score
    * is ONE IEEE division (or one multiply + divide) on identical
    * operands in any engine — bit-identical with the SQL oracle by
    * construction; an entropy formulation would hang cross-engine parity
    * on libm's log rounding for no extra ranking power.
    *
    * Plan shape: explode → (doc, term) hash aggregate (partial map-side
    * combine absorbs each doc's repeats) → per-doc aggregate. Shuffles
    * hash on (doc, term) then doc — no windows, no skew hazard (a
    * mega-document's terms spread over the first shuffle's reducers). */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    tf.groupBy("doc_id").agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(col("cnt") * col("cnt")).as("sumsq"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("hapax"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("hapax").cast("double") / col("n_distinct").cast("double"))
          .as("hapax_ratio"),
        (col("sumsq").cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
          .as("simpson"))
  }

  /** Top-k most frequent word n-grams (bigrams) per corpus group — the
    * discovery tool for boilerplate phrases, contamination templates, and
    * per-source tics worth scrubbing before training.
    *
    * Plan shape: EXPLODED rows + `lead` per document, NOT the
    * `bigramShingles` array HOF — higher-order functions evaluate
    * interpreted and CollapseProject fuses the tokenizer into each
    * element lambda, re-splitting the text per token (O(tokens²) per doc;
    * measured 7× slower end-to-end at sf0.1 — same trap `shingleRows`
    * documents). Everything here stays in whole-stage codegen: tokenize
    * once, adjacent-pair via `lead` over (doc, pos), one (group, ngram)
    * hash aggregate, then the rank-limit window — which Spark rewrites
    * into a partial WindowGroupLimit per input split, so a dominant group
    * never funnels its full n-gram census through one reducer. */
  def frequentNgrams(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy(col("__did")).orderBy("__pos")
    val wRank = Window.partitionBy(col(s"`$groupCol`"))
      .orderBy(col("cnt").desc, col("ngram"))
    df.select(col(s"`$groupCol`"), col(s"`$idCol`").as("__did"),
        posexplode(tokens(col(s"`$textCol`"))).as(Seq("__pos", "__w")))
      .withColumn("__nw", lead("__w", 1).over(wDoc))
      .filter(col("__nw").isNotNull)
      .select(col(s"`$groupCol`"),
        concat(col("__w"), lit("_"), col("__nw")).as("ngram"))
      .groupBy(col(s"`$groupCol`"), col("ngram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens
    * (letter runs | digit runs | single other non-space). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_tokens"))

  /** Vocab-accurate BPE token counting
    * ([[graft.functions.BpeTokenizer]]): GPT-2 byte-level BPE driven by
    * a merges table in the published `merges.txt` format (one `a b`
    * line per rank). Pass a real vocab's merges for production counts;
    * tests pin tiny hand-checkable sets. Runs as a native codegen
    * expression — per-word memoized, no UDF. Requires the graft
    * function registry ([[graft.functions.GraftFunctions.register]] or
    * the session extensions). */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame =
    df.select(
      col(s"`$idCol`").as("doc_id"),
      call_function("graft_bpe_count", col(s"`$textCol`"),
        lit(merges.mkString("\n"))).as("bpe_tokens"))

  /** BPE token IDS per document — the tokenize-and-MATERIALIZE step a
    * training-data pipeline runs once the [[bpeTokenCounts]] budget math
    * is settled (the array this returns is what sequence packing
    * actually ships to a trainer). Ids are the merges-only vocabulary:
    * byte-level base symbols 0–255, merge line i = id 256+i (see
    * [[graft.functions.BpeEncode]]). Same codegen expression contract
    * as the counter — no UDF, per-word memoized, and
    * `size(bpe_ids) == bpe_tokens` by construction (property-tested). */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame =
    df.select(
      col(s"`$idCol`").as("doc_id"),
      call_function("graft_bpe_encode", col(s"`$textCol`"),
        lit(merges.mkString("\n"))).as("bpe_ids"))

  /** BPE VOCABULARY INDUCTION — learn a byte-level merge table from the
    * corpus itself (Sennrich et al. 2016, "Neural Machine Translation of
    * Rare Words with Subword Units", with GPT-2's byte-level start
    * alphabet and pre-tokenizer), closing the tokenizer loop: the learned
    * merge lines feed [[bpeTokenCounts]]'s codegen'd `graft_bpe_count`
    * expression directly, so a corpus can be tokenized by a vocabulary
    * trained on it with no external artifacts.
    *
    * Merge selection is DETERMINISTIC: highest weighted pair frequency,
    * ties broken by lexicographically smallest `"a b"` line — the same
    * corpus always learns the same vocabulary, on any cluster. Induction
    * stops early when the best pair occurs fewer than 2 times.
    *
    * Scale shape — this is how production tokenizer trainers are built:
    * the ONLY corpus-scale pass is ONE map-side-combined pre-token
    * histogram aggregate (the same regex segmentation the encoder uses,
    * codegen'd `regexp_extract_all`); merge learning then runs on the
    * bounded histogram (`maxWords` most frequent pre-tokens, ties broken
    * by token text — an EXPLICIT cap, stated here because the tail it
    * drops are near-singleton words that cannot win a merge anyway).
    * The collect is vocab-scale like [[graft.ops.AnnIndex]]'s centroid
    * collects — bounded by `maxWords`, never by corpus size. */
  def bpeInduce(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): Seq[String] = {
    import graft.functions.BpeTokenizer
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val hist = df
      .select(explode(regexp_extract_all(col(s"`$textCol`"),
        lit(BpeTokenizer.PreTokenPattern), lit(0))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxWords)
      .collect()
    bpeLearnMerges(
      hist.map(r =>
        (BpeTokenizer.initialSymbols(r.getString(0)), r.getLong(1))),
      numMerges)
  }

  /** Driver-side merge learner over a bounded word histogram — pair
    * counts are maintained INCREMENTALLY: a merge of `a b` touches only
    * the words that contain the pair (reachable through an inverted
    * pair→words index), subtracting each touched word's old adjacent
    * pairs and re-adding its rewritten ones. A full rescan per round —
    * O(maxWords · wordLen) × numMerges — is what every real tokenizer
    * trainer avoids; a 32k-merge vocab build over a 100k-word histogram
    * would pay ~10¹¹ symbol visits there vs ~10⁷ touched-word visits
    * here. Best-pair selection is O(log pairs) via a tree ordered by
    * (count desc, pair-line asc), so merge choice and tie-breaks are
    * bit-identical to the naive rescan ([[bpeLearnMergesNaive]], kept as
    * the test oracle). */
  private[ops] def bpeLearnMerges(words0: Array[(Array[String], Long)],
      numMerges: Int): Seq[String] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = words0.map(_._1)
    val weights: Array[Long] = words0.map(_._2)
    val counts = mutable.HashMap.empty[String, Long]
    val index = mutable.HashMap.empty[String, mutable.Set[Int]]
    // (−count, pair) tree: head = highest count, lexicographically
    // smallest "a b" line on ties — the naive fold's exact ordering
    val ord = new java.util.Comparator[(Long, String)] {
      def compare(x: (Long, String), y: (Long, String)): Int = {
        val c = java.lang.Long.compare(y._1, x._1)
        if (c != 0) c else x._2.compareTo(y._2)
      }
    }
    val sorted = new java.util.TreeSet[(Long, String)](ord)
    def bump(k: String, delta: Long): Unit = {
      val old = counts.getOrElse(k, 0L)
      if (old != 0L) sorted.remove((old, k))
      val nw = old + delta
      if (nw == 0L) counts.remove(k)
      else { counts.update(k, nw); sorted.add((nw, k)) }
    }
    def eachPair(syms: Array[String])(f: String => Unit): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        f(syms(i) + " " + syms(i + 1)); i += 1
      }
    }
    words.indices.foreach { wi =>
      eachPair(words(wi)) { k =>
        bump(k, weights(wi))
        index.getOrElseUpdate(k, mutable.Set.empty) += wi
      }
    }
    val merges = Seq.newBuilder[String]
    var round = 0
    var done = sorted.isEmpty
    while (round < numMerges && !done) {
      val (bestCount, bestPair) = sorted.first()
      if (bestCount < 2) done = true
      else {
        merges += bestPair
        val Array(a, b) = bestPair.split(" ", 2)
        val fused = a + b
        val touched = index.getOrElse(bestPair, mutable.Set.empty).toArray
        java.util.Arrays.sort(touched) // determinism is by-construction
        touched.foreach { wi =>
          val syms = words(wi)
          val w = weights(wi)
          // retire the word's old contributions entirely, then re-add the
          // rewritten word's — simpler than span-local deltas and exactly
          // as incremental (cost is THIS word's length, not the histogram)
          eachPair(syms) { k =>
            bump(k, -w); index.get(k).foreach(_ -= wi)
          }
          // greedy left-to-right, non-overlapping — the encoder's rule
          val out = new mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += fused; j += 2
            } else { out += syms(j); j += 1 }
          }
          words(wi) = out.toArray
          eachPair(words(wi)) { k =>
            bump(k, w)
            index.getOrElseUpdate(k, mutable.Set.empty) += wi
          }
        }
        done = sorted.isEmpty
      }
      round += 1
    }
    merges.result()
  }

  /** The straightforward rescan-every-round learner — quadratic, kept
    * ONLY as the equivalence oracle for [[bpeLearnMerges]]'s incremental
    * counts (specs assert bit-identical merge lists). */
  private[ops] def bpeLearnMergesNaive(words0: Array[(Array[String], Long)],
      numMerges: Int): Seq[String] = {
    var words = words0
    val merges = Seq.newBuilder[String]
    var round = 0
    var done = words.isEmpty
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, w) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = syms(i) + " " + syms(i + 1)
          counts.update(k, counts.getOrElse(k, 0L) + w)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (bestPair, bestCount) = counts.foldLeft(("", Long.MinValue)) {
          case (acc @ (bp, bc), (p, c)) =>
            if (c > bc || (c == bc && p < bp)) (p, c) else acc
        }
        if (bestCount < 2) done = true
        else {
          merges += bestPair
          val Array(a, b) = bestPair.split(" ", 2)
          val fused = a + b
          words = words.map { case (syms, w) =>
            if (syms.length < 2) (syms, w)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += fused; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.toArray, w)
            }
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Fixed-size token-window chunking with overlap — the context-window /
    * RAG prep step: chunk `k` covers tokens `[k*stride, min(k*stride +
    * chunkTokens, t))` with `stride = chunkTokens - overlapTokens`; a
    * trailing window that would add no tokens beyond the previous chunk's
    * overlap is not emitted (`n = max(1, ceil((t - overlap) / stride))`,
    * in integer arithmetic). Output: `doc_id, chunk_idx, start_tok,
    * end_tok, n_tokens, chunk_text`.
    *
    * Exploded rows keep every step in whole-stage codegen; per-doc work
    * is O(tokens × chunks-per-token-overlap), and chunks hash-partition
    * evenly regardless of document-length skew. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunk: need 0 <= overlap < size, got size=$chunkTokens overlap=$overlapTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(s"`$idCol`").as("doc_id"), tokens(col(s"`$textCol`")).as("__tk"))
      .withColumn("__t", size(col("__tk")).cast("long"))
      .withColumn("__n", greatest(lit(1L),
        ((col("__t") - overlapTokens + (stride - 1)) / stride).cast("long")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("__n") - 1)))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("end_tok", least(col("start_tok") + chunkTokens, col("__t")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok")).as("n_tokens"),
        array_join(slice(col("__tk"), (col("start_tok") + 1).cast("int"),
          (col("end_tok") - col("start_tok")).cast("int")), " ").as("chunk_text"))
  }

  /** Order-sensitive document fingerprint over the token stream. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      fingerprint(hashAll(tokens(col(textCol)))).as("fingerprint"))

  /** Redaction patterns applied in order (training-data PII scrubbing):
    * emails, URLs, long digit runs. */
  val RedactionRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "[0-9]{6,}" -> "<NUM>")

  /** Scrub PII-ish spans from a text column — codegen'd regexp_replace
    * chain, no UDF. */
  def redact(text: Column): Column =
    RedactionRules.foldLeft(text) { case (c, (pattern, repl)) =>
      regexp_replace(c, pattern, repl)
    }

  /** Deterministic stratified sample: up to `perStratum` rows per stratum,
    * chosen by hash order (stable across runs/partitionings — no RNG
    * state). `idCol` must be unique within a stratum (it is the
    * tie-breaker of the total order).
    *
    * Skew note: this does NOT serialize a mega-stratum into one sort task.
    * The `row_number <= k` filter is pushed down by Spark's rank-limit
    * rewrite into a PARTIAL `WindowGroupLimit` that runs per input split
    * before the shuffle, so at most `perStratum` rows per stratum per
    * split reach the reducer — the whole-stratum data never lands on one
    * task (asserted against the physical plan in OpsSpec). */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String, perStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(s"`$stratumCol`"))
      .orderBy(portableHash(col(s"`$idCol`").cast("string")), col(s"`$idCol`"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Keep the top `frac` share of rows per group, ranked by
    * (`scoreCol` desc, `idCol`) — quality-threshold pruning as curation
    * pipelines apply it ("drop the worst 20% of each source"), with a
    * deterministic id tie-break so the cut is reproducible across runs
    * and engines.
    *
    * The per-group keep-count is `ceil(frac × group_size)`, computed as a
    * count window over the SAME partitioning as the rank window, so both
    * resolve against one exchange. Unlike a constant-k rank limit, a
    * fractional cut is inherently a full ranked pass per group (the
    * boundary depends on the group's size); a pathologically dominant
    * group sorts on one reducer — cap group sizes upstream or fall back
    * to [[stratifiedSample]]'s constant-k shape when that bites. */
  def topFractionByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, frac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(s"`$groupCol`"))
      .orderBy(col(s"`$scoreCol`").desc, col(s"`$idCol`"))
    val wg = Window.partitionBy(col(s"`$groupCol`"))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wg))
      .filter(col("__rn") <= ceil(col("__n") * lit(frac)))
      .drop("__rn", "__n")
  }

  /** Top-k characteristic terms per document by TF-IDF-style relevance.
    *
    * The idf factor is RATIONAL — `N / df` instead of `log(N / df)` — so
    * every score is a product/quotient of exact integer counts: the same
    * IEEE operations on the same operands in any engine, bit-identical
    * with the SQL oracle by construction (a transcendental log would hang
    * cross-engine parity on libm rounding). Ranking is monotone in the
    * choice of idf shape, so the top-k sets match classic tf-idf wherever
    * ties don't straddle the cutoff.
    *
    * Plan shape: explode → one (doc, term) count aggregate feeding BOTH
    * doc lengths and document frequencies as WINDOW sums over the same
    * frame (the raw text is never re-tokenized, and nothing is persisted —
    * a window reuses the stream where a self-join would need a cached
    * substrate, so a long-lived session accumulates no library-owned
    * cache); corpus size joins in as a broadcast scalar; top-k via
    * rank-limit window. All shuffles hash on doc or term, and the
    * doc-length window's exchange is reused by the final rank window
    * (same partitioning key). */
  def tfIdfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("tok", sum("cnt").over(Window.partitionBy("doc_id")))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("cnt").cast("double") / col("tok").cast("double")) *
          (col("n").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "score", "rank")
  }

  /** Deterministic train/val/test assignment from a stable id hash —
    * reproducible across runs, clusters, and engines (no RNG state).
    * Buckets: [0,trainPct) → train, [trainPct,trainPct+valPct) → val,
    * rest → test. */
  def splitAssignment(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = pmod(portableHash(id.cast("string")), lit(100))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Vocabulary coverage / OOV counting per document: how many of a
    * doc's token OCCURRENCES appear in a reference vocabulary. The
    * tokenizer-fit check every corpus/tokenizer swap starts with — a
    * corpus whose OOV share jumps under a candidate vocab needs a new
    * vocab, not new data. Returns (doc_id, n_tokens, in_vocab); the OOV
    * rate is `1 - in_vocab/n_tokens`, left to the caller so the output
    * stays integer-exact.
    *
    * Scale shape: explode to (doc, token) rows, BROADCAST hash join
    * against the (distinct) vocabulary — real vocabularies are ≤ a few
    * million rows, comfortably broadcastable — then one map-side-combined
    * aggregate back on the doc id. No shuffle of the token stream other
    * than the doc-id aggregate. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, vocabCol: String): DataFrame = {
    val v = vocab.select(col(s"`$vocabCol`").as("__tok")).distinct()
      .withColumn("__in", lit(1))
    df.select(col(s"`$idCol`").as("doc_id"),
        explode(tokens(col(s"`$textCol`"))).as("__tok"))
      .join(broadcast(v), Seq("__tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), count(col("__in")).as("in_vocab"))
  }

  /** Per-group percentile rank of a score — cross-source score
    * NORMALIZATION. Raw quality scores are not comparable across sources
    * (a mediocre wiki page outscores a good forum post on absolute
    * heuristics); ranking within the source and cutting on the
    * percentile is how curation pipelines apply one threshold to many
    * sources. `percent_rank = (rank-1)/(group_size-1)` — a quotient of
    * exact integers, so ranks are bit-identical across engines; ties
    * break on `idCol` so the rank (and any cut on it) is deterministic.
    *
    * Skew caveat (same as [[topFractionByGroup]]): a per-row rank is
    * inherently a full ranked pass per group, so a dominant source sorts
    * on one reducer. For a CUT at a known percentile over huge groups,
    * prefer [[mixturePlan]]-style aggregates or approximate quantile
    * thresholds; use this where per-row ranks are genuinely needed. */
  def percentileRankByGroup(df: DataFrame, groupCol: String,
      scoreCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(s"`$groupCol`"))
      .orderBy(col(s"`$scoreCol`"), col(s"`$idCol`"))
    df.withColumn("pct_rank", percent_rank().over(w))
  }

  /** Deterministic global training-order shuffle: sort by the portable
    * id hash. An engine-independent pseudo-random permutation with no
    * RNG state — the same corpus always yields the same example order
    * (reproducible training runs), yet the order is uncorrelated with
    * source, time, or any content attribute. At scale this is Spark's
    * range-partitioned distributed sort; `orderBy(rand())` would give a
    * different order every run and defeat resumable data loading. */
  def trainingOrder(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shuffle_key",
        pmod(portableHash(col(s"`$idCol`").cast("string")), lit(1000000000L)))
      .orderBy(col("shuffle_key"), col(s"`$idCol`"))

  /** Per-source corpus report card: docs, tokens, chars, distinct
    * languages, and mean tokens/doc in ONE hash-aggregate pass (map-side
    * combined; the only shuffle is on the source key). The profiling
    * query every corpus pipeline runs before and after each curation
    * step — one scan, not five. Counts are exact integers; the mean is
    * one integer quotient (IEEE-identical cross-engine). */
  def corpusReport(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String): DataFrame =
    df.select(col(s"`$sourceCol`").as("source"), col(s"`$langCol`").as("lang"),
        size(tokens(col(s"`$textCol`"))).cast("long").as("toks"),
        length(col(s"`$textCol`")).cast("long").as("chars"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        sum("chars").as("n_chars"),
        count_distinct(col("lang")).as("n_langs"),
        (sum("toks") / count(lit(1))).as("mean_tokens"))

  /** Rolling word n-gram hashes (generalizes [[bigramShingleHashes]],
    * identical to it for n=2): position i carries the polynomial fold of
    * word hashes i..i+n-1, `acc → (acc*1000003 + h) mod 2³²`. Each fold
    * step's product stays under 2⁵² — no signed-64 overflow. Empty for
    * docs shorter than n words. */
  def ngramHashes(wordHashes: Column, n: Int,
      mult: Long = 1000003L): Column = {
    require(n >= 2, s"n-gram length must be >= 2, got $n")
    require(mult < (1L << 20), // acc < 2³², so the fold product stays < 2⁵²
      s"fold multiplier must stay under 2^20 to avoid signed-64 overflow")
    when(size(wordHashes) < n, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), size(wordHashes) - (n - 1)),
        i => (1 until n).foldLeft(element_at(wordHashes, i)) { (acc, j) =>
          pmod(acc * mult + element_at(wordHashes, i + j), lit(ShingleMod))
        }))
  }

  /** Second, independent fold multiplier: paired with the default fold it
    * widens a gram key to 64 bits (two 32-bit folds, grouped together)
    * for paths where a collision DESTROYS data rather than merely scoring
    * it — [[dedupSubstrings]] erases text on key equality, and at
    * billions of grams birthday collisions in a single 32-bit space are
    * certain. Both multipliers stay under 2²⁰ so each fold step's product
    * stays under 2⁵². */
  val ShingleMult2 = 999983L

  /** Span-level repeated n-gram counts — the substring-granular dedup
    * signal that document-level dedup misses (repeated boilerplate /
    * licence blocks / navigation text inside otherwise-distinct pages;
    * cf. Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better"). For each document: how many of its word-n-gram
    * positions carry an n-gram that also occurs in at least `minDocs`
    * DISTINCT documents (itself included). `repeated_spans / total_spans`
    * is the doc's boilerplate fraction; downstream filters cut on it or
    * feed the flagged spans to span-excision.
    *
    * Returns (id, total_spans, repeated_spans), one row per input doc
    * (docs shorter than n words: 0/0).
    *
    * Scale shape: ONE explode to (id, gram_h) rows — O(total tokens),
    * never O(docs²); cross-document comparison happens entirely through a
    * hash aggregate on gram_h. That substrate feeds both the
    * repeated-gram aggregate and the join back, so it is persisted via
    * [[SubstrateCache]] (scoped-handle or session release applies — see
    * the class doc). Both shuffles hash-partition on gram_h; the final
    * per-doc aggregate and the id join hash on id. */
  def repeatedSpanCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    val g = SubstrateCache.persist(
      df.select(col(s"`$idCol`").as("id"),
        explode(ngramHashes(hashAll(tokens(col(s"`$textCol`"))), n)).as("gram_h")))
    val rep = g.groupBy("gram_h")
      .agg(count_distinct(col("id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("gram_h"), lit(1).as("__rep"))
    val per = g.join(rep, Seq("gram_h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("total_spans"),
        sum(coalesce(col("__rep"), lit(0))).cast("long").as("repeated_spans"))
    df.select(col(s"`$idCol`").as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("total_spans"), lit(0L)).as("total_spans"),
        coalesce(col("repeated_spans"), lit(0L)).as("repeated_spans"))
  }

  /** Source-mixture sampling plan — domain reweighting for a token-budget
    * training run (the "20% web, 40% code, 40% books" knob every corpus
    * assembly has). Given integer mixture `weights` and a total
    * `budgetTokens`:
    *
    *  - `avail_docs` / `avail_tokens`: what each source holds;
    *  - `target_tokens = budgetTokens × w / Σw` (sources absent from
    *    `weights` get weight 0);
    *  - `rate = min(1, target_tokens / avail_tokens)` — an undersized
    *    source is taken whole, it cannot be oversampled;
    *  - `sampled_docs` / `sampled_tokens`: what the DETERMINISTIC
    *    hash-bucket filter `H(id) mod 10⁶ < floor(rate × 10⁶)` actually
    *    selects — reproducible across runs, partitionings, and engines
    *    (no RNG state), and stable under corpus growth (a doc's keep
    *    decision never flips because other docs arrived).
    *
    * All arithmetic is integer-exact until the two final divisions, which
    * are the same IEEE operations on the same operands in any engine —
    * bit-identical with a SQL oracle by construction.
    *
    * Plan shape: sources number in the dozens while docs number in the
    * billions, so NOTHING may funnel whole rows through per-source
    * partitions — a window over the source key would buffer each
    * source's entire row set on one task (the mega-stratum hazard
    * [[topFractionByGroup]] documents). Instead: two hash AGGREGATES on
    * the source key (both map-side combined — every task pre-collapses
    * to ≤ #sources partial rows before the shuffle) with the tiny
    * availability/rate table broadcast back between them. The narrow
    * (source, id, toks) substrate feeds both aggregates, so it is
    * persisted via [[SubstrateCache]] rather than re-tokenizing the
    * corpus twice. */
  def mixturePlan(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, weights: Seq[(String, Long)],
      budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty, "mixture weights must be non-empty")
    val sumW = weights.map(_._2).sum
    val wdf = df.sparkSession.createDataFrame(weights).toDF("source", "__w")
    val toks = SubstrateCache.persist(
      df.select(col(s"`$sourceCol`").as("source"), col(s"`$idCol`").as("id"),
        size(tokens(col(s"`$textCol`"))).cast("long").as("toks")))
    val rates = toks.groupBy("source")
      .agg(count(lit(1)).as("avail_docs"), sum("toks").as("avail_tokens"))
      .join(broadcast(wdf), Seq("source"), "left")
      .withColumn("target_tokens",
        coalesce(col("__w"), lit(0L)) * lit(budgetTokens) / lit(sumW))
      .withColumn("rate",
        least(lit(1.0), col("target_tokens") / col("avail_tokens")))
      .drop("__w")
    val keep = pmod(portableHash(col("id").cast("string")), lit(1000000L)) <
      floor(col("rate") * lit(1000000.0))
    toks.join(broadcast(rates), Seq("source"))
      .groupBy("source")
      .agg(first("avail_docs").as("avail_docs"),
        first("avail_tokens").as("avail_tokens"),
        first("target_tokens").as("target_tokens"),
        first("rate").as("rate"),
        count(when(keep, 1)).as("sampled_docs"),
        coalesce(sum(when(keep, col("toks"))), lit(0L)).as("sampled_tokens"))
  }

  /** Cross-corpus PARAGRAPH dedup with document reassembly (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better" —
    * the substring-granular pass modern web-corpus pipelines run after
    * document-level dedup): split every document on `sep`, keep only the
    * corpus-wide FIRST occurrence of each exact paragraph (ordered by
    * (document id, paragraph position)), and stitch each document back
    * together from its surviving paragraphs — a document reduced to
    * nothing comes back as the empty string, not a dropped row.
    *
    * Scale shape: paragraphs join on their sha-256, never the raw text
    * (one shuffle keyed by a 64-hex string instead of arbitrary-length
    * paragraphs); the winner per hash is a plain min-struct aggregate
    * (map-side partial); reassembly is one groupBy over surviving
    * paragraphs with an in-row sort. Everything is exploded relations +
    * codegen'd column algebra — no UDFs, no windows over the corpus. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("__pos", "__para")))
      .withColumn("__h", sha2(col("__para"), 256))
    val winners = paras.groupBy("__h")
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
    val kept = paras.join(winners, Seq("__h"))
      .filter(struct(col("__id"), col("__pos")) === col("__w"))
    val stitched = kept.groupBy("__id").agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__para")))),
          x => x.getField("__para")),
        sep).as("__text"))
    df.select(col(idCol))
      .join(stitched, col(idCol) === col("__id"), "left")
      .select(col(idCol), coalesce(col("__text"), lit("")).as(textCol))
  }

  /** Max words per document the occurrence order key can index — the
    * (doc, position) total order is `id * OrdScale + pos`, so ids up to
    * ~9·10¹² and documents up to a million words fit a signed 64-bit key
    * with no collision. */
  val OrdScale = 1000000L

  /** Words per re-stitch segment in [[dedupSubstrings]] — bounds any
    * single aggregation buffer regardless of document size. */
  val StitchSegmentWords = 4096

  /** Default word-gram length for [[dedupSubstrings]] — long enough that
    * chance k-gram collisions across unrelated documents are rare, short
    * enough to catch the clipped/near-dup spans the synthetic corpus
    * plants. */
  val SubstringGramK = 6

  /** Cross-document EXACT SUBSTRING dedup at word-`k`-gram granularity —
    * the span-excision pass of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better": remove every repeated substring
    * occurrence except the corpus-wide first), approximated on word
    * grams instead of a suffix array: a suffix array finds maximal
    * repeats of length ≥ k; marking every duplicated k-gram occurrence
    * and erasing the words it covers excises the same spans (a repeat of
    * length L ≥ k is covered by its L−k+1 duplicated k-grams), at the
    * cost of hashing k-grams instead of building the global suffix
    * structure no cluster wants to materialize.
    *
    * Semantics, per document: tokenize to words; every word-k-gram
    * occurrence whose hash also occurs EARLIER in the corpus total order
    * (`id × OrdScale + position`) is a duplicate; the union of the word
    * spans `[pos, pos+k−1]` of all duplicate occurrences is erased; the
    * survivors re-join with single spaces. The corpus-wide first
    * occurrence of every span survives, so no content is lost globally —
    * exactly the keep-first contract of [[dedupParagraphs]] one
    * granularity finer.
    *
    * Returns (id, n_words, n_dup_grams, n_removed, kept_text) — one row
    * per input document; docs shorter than k words pass through intact.
    *
    * Scale shape: one explode to (doc, pos, gram-hash) rows — O(total
    * tokens), never O(docs²); the cross-document comparison is a single
    * hash aggregate on the gram hash (map-side combined min); duplicate
    * spans explode k rows each and collapse with a distinct keyed by
    * (doc, position). Every shuffle is an equi hash partition on the
    * gram hash or the doc id; the reassembly is the same in-row
    * sort-and-join as [[dedupParagraphs]]. The tokenized substrate feeds
    * the gram pass, the erase join, and the per-doc stats, so it is
    * persisted via [[SubstrateCache]] instead of tokenizing three
    * times. */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
      k: Int = SubstringGramK): DataFrame = {
    require(k >= 2, s"substring gram length must be >= 2, got $k")
    val toks = SubstrateCache.persist(
      df.select(col(s"`$idCol`").as("__id"), tokens(col(s"`$textCol`")).as("__ws")))
    val words = toks
      .select(col("__id"), posexplode(col("__ws")).as(Seq("__p0", "__w")))
      .select(col("__id"), (col("__p0") + 1).as("__pos"), col("__w"))
    // (doc, pos, gram) occurrences; ord is the corpus total order. The
    // gram key is TWO independent 32-bit folds grouped together (64 bits
    // effective): this path ERASES text on key equality, so the 32-bit
    // space that is fine for scoring ([[repeatedSpanCounts]]) or for
    // later-verified candidates (MinHash) would turn birthday collisions
    // into corpus-wide lossy excision at billions of grams.
    val grams = toks
      .select(col("__id"), col("__ws"), hashAll(col("__ws")).as("__hw"))
      .select(col("__id"), posexplode(zip_with(
          ngramHashes(col("__hw"), k),
          ngramHashes(col("__hw"), k, ShingleMult2),
          (x, y) => struct(x.as("g1"), y.as("g2")))).as(Seq("__p0", "__gs")))
      .select(col("__id"), (col("__p0") + 1).as("__pos"),
        col("__gs.g1").as("__g"), col("__gs.g2").as("__g2"),
        (col("__id") * OrdScale + col("__p0") + 1).as("__ord"))
    val winners = grams.groupBy("__g", "__g2").agg(min("__ord").as("__win"))
    val dups = grams.join(winners, Seq("__g", "__g2"))
      .filter(col("__ord") =!= col("__win"))
      .select("__id", "__pos")
    // union of erased word positions: explode each dup span, collapse
    val removed = dups
      .select(col("__id"),
        explode(sequence(col("__pos"), col("__pos") + (k - 1))).as("__rp"))
      .distinct()
    val kept = words.join(removed,
      words("__id") === removed("__id") && col("__pos") === col("__rp"),
      "left_anti")
    // SEGMENTED re-stitch: one aggregation buffer never holds more than
    // [[StitchSegmentWords]] kept words — a multi-GB document's word
    // structs would otherwise concentrate (with per-element struct
    // overhead and a million-element in-buffer sort) in a single task's
    // buffer. Segments partition the position space in order, so sorting
    // within each segment and then sorting the segments reproduces the
    // full positional sort exactly; the final row is still document-sized
    // (inherent to returning the kept text as one value), but its peak
    // build cost is segment-bounded and the big sort is gone.
    val seg = floor((col("__pos") - 1) / StitchSegmentWords).as("__seg")
    val segs = kept.groupBy(col("__id"), seg).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__w")))),
          x => x.getField("__w")),
        " ").as("__st"))
    val stitched = segs.groupBy("__id").agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("__seg"), col("__st")))),
          x => x.getField("__st")),
        " ").as("__text"))
    val dupCounts = dups.groupBy("__id").agg(count(lit(1)).as("__nd"))
    val remCounts = removed.groupBy("__id").agg(count(lit(1)).as("__nr"))
    toks.select(col("__id"), size(col("__ws")).cast("long").as("n_words"))
      .join(dupCounts, Seq("__id"), "left")
      .join(remCounts, Seq("__id"), "left")
      .join(stitched, Seq("__id"), "left")
      .select(col("__id").as("doc_id"), col("n_words"),
        coalesce(col("__nd"), lit(0L)).as("n_dup_grams"),
        coalesce(col("__nr"), lit(0L)).as("n_removed"),
        coalesce(col("__text"), lit("")).as("kept_text"))
  }

  /** Feature-hash buckets for [[dsirWeights]]'s bag-of-n-grams model. */
  val DsirBuckets = 1024

  /** DSIR importance weights — data selection via hashed n-gram
    * importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): fit unigram+bigram
    * bucket distributions over a TARGET domain corpus and over the RAW
    * corpus, then score every raw document by its log likelihood ratio
    * `Σ_b c_b · ln(p̂_target(b) / p̂_raw(b))` (add-1 smoothed). High
    * scores read "looks like the target domain"; resampling the raw
    * corpus by these weights steers a web-scale mixture toward a
    * curated domain without training a classifier.
    *
    * Determinism contract: the ONLY transcendental is `ln`, evaluated
    * once per feature bucket (≤ [[DsirBuckets]] rows, never per
    * document) and immediately quantized to integer micro-nats
    * (`round(10⁶·ln(…))`); every per-document reduction is then exact
    * 64-bit integer arithmetic — order-free, hash-identical across
    * engines and partitionings. A per-document double sum would hang
    * parity on float fold order; a boundary flip here needs a bucket's
    * ln to land within one ulp of a half-micro-nat.
    *
    * Returns (doc_id, n_feats, logw_micro, rank) for every raw document,
    * rank 1 = most target-like (ties break on doc_id).
    *
    * Scale shape: explode to (doc, bucket) feature rows — O(total
    * tokens); two map-side-combined hash aggregates produce the
    * ≤ [[DsirBuckets]]-row bucket tables whose totals are 1-row
    * aggregates OF THOSE TABLES (the token stream is scanned once per
    * corpus, not once per statistic); the weight table broadcasts back
    * onto the per-doc bucket counts. The global rank is a single
    * window over one narrow row per raw document — a single-partition
    * sort at corpus scale, so at 100 TB use [[dsirScores]] (identical
    * scores, NO window: filter on a micro-nat threshold instead). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = DsirBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("logw_micro").desc, col("doc_id"))
    dsirScores(raw, target, idCol, textCol, buckets)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Rank-free [[dsirWeights]] — the 100-TB surface: same (doc_id,
    * n_feats, logw_micro) scores, NO global window anywhere in the plan
    * (every shuffle is an equi hash partition; selection is a filter).
    * `minLogwMicro` keeps documents scoring at or above the threshold —
    * the importance-resampling cut expressed as a fully-parallel
    * predicate. None returns every raw document scored. */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = DsirBuckets,
      minLogwMicro: Option[Long] = None): DataFrame = {
    def featRows(df: DataFrame): DataFrame =
      hashedFeatureBuckets(df, idCol, textCol, buckets)
    val docb = featRows(raw).groupBy("__id", "__b")
      .agg(count(lit(1)).as("__c"))
    val rawb = docb.groupBy("__b").agg(sum("__c").as("__r"))
    val tgtb = featRows(target).groupBy("__b").agg(count(lit(1)).as("__t"))
    val totals = rawb.agg(sum("__r").as("__rr"))
      .crossJoin(tgtb.agg(sum("__t").as("__tt")))
    // micro-nat weight per bucket: the one place doubles appear
    val wt = rawb.join(tgtb, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        round(lit(1e6) * log(
          ((coalesce(col("__t"), lit(0L)) + lit(1.0)) /
            (col("__tt") + lit(buckets.toLong))) /
            ((col("__r") + lit(1.0)) / (col("__rr") + lit(buckets.toLong)))))
          .cast("long").as("__lw"))
    val scored = docb.join(broadcast(wt), Seq("__b"))
      .groupBy("__id")
      .agg(sum("__c").as("n_feats"),
        sum(col("__c") * col("__lw")).as("logw_micro"))
      .select(col("__id").as("doc_id"),
        col("n_feats").cast("long").as("n_feats"),
        col("logw_micro").cast("long").as("logw_micro"))
    minLogwMicro.fold(scored)(t => scored.filter(col("logw_micro") >= t))
  }

  /** DSIR importance RESAMPLING draw — the selection step of Xie et al.
    * 2023 (the paper SAMPLES by weight rather than taking top-k, to keep
    * diversity the hard cut destroys): a weighted sample WITHOUT
    * replacement of `k` raw documents with probability ∝ exp(logw/τ),
    * via the Gumbel top-k identity (adding independent Gumbel noise to
    * each log-weight and taking the k largest IS such a sample).
    *
    * Determinism: the per-document uniform comes from the sha-256
    * [[portableHash]] of the doc id (the same device [[mixturePlan]]'s
    * rate sampling uses), so the draw is reproducible across runs,
    * engines, and partitionings; the perturbed key quantizes to integer
    * micro-nats before ranking (one `ln` chain per doc on identical
    * operands — a cross-engine flip needs a libm disagreement within one
    * ulp of a half-micro-nat). Ties break on doc_id.
    *
    * Returns (doc_id, logw_micro, key_micro), the k selected docs.
    *
    * Scale shape: [[dsirScores]]' window-free plan plus ONE distributed
    * top-k (Spark's TakeOrderedAndProject: each partition keeps its k
    * best, the driver merges k-sized heaps — no global sort, no single
    * partition). */
  def dsirSample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = DsirBuckets,
      temperature: Double = 1.0): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val scored = dsirScores(raw, target, idCol, textCol, buckets)
    // u in (0,1): the +0.5 keeps both log arguments strictly inside
    // their domains for every hash value
    val u = (pmod(portableHash(col("doc_id").cast("string")), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1e6)
    val gumbel = -log(-log(u))
    val key = round((col("logw_micro").cast("double") / lit(1e6)
      / lit(temperature) + gumbel) * lit(1e6)).cast("long")
    scored.withColumn("key_micro", key)
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("logw_micro"), col("key_micro"))
  }

  /** (doc, position, word-hash) rows for one corpus — the shared
    * tokenize-and-hash substrate under [[dsirScores]],
    * [[classifierScores]], and [[lmPerplexityScores]]. Exploded rows,
    * not per-row array lambdas — the same reasoning as [[shingleRows]]:
    * sha-per-word stays in whole-stage codegen and linear (an
    * array-lambda pipeline re-evaluates the inner hash transform per
    * element_at), and (doc, position) rows hash-partition evenly
    * regardless of document-length skew. Persisted via [[SubstrateCache]]
    * (both the unigram and the bigram branch read it). */
  private[ops] def hashedWordRows(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    SubstrateCache.persist(
      df.select(col(s"`$idCol`").as("__id"),
          posexplode(tokens(col(s"`$textCol`"))).as(Seq("__pos", "__w")))
        .select(col("__id"), col("__pos"), portableHash(col("__w")).as("__h")))

  /** (doc, feature-bucket) rows: unigram and adjacent-bigram hashes
    * folded into `buckets` buckets — the hashed bag-of-n-grams feature
    * space shared by the DSIR model and [[classifierScores]]. The only
    * window is the per-DOC adjacency lead (hash-partitioned on the doc
    * id — never global). */
  private[ops] def hashedFeatureBuckets(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wh = hashedWordRows(df, idCol, textCol)
    val uni = wh.select(col("__id"), col("__h"))
    val win = Window.partitionBy("__id").orderBy("__pos")
    val bi = wh.withColumn("__h2", lead("__h", 1).over(win))
      .filter(col("__h2").isNotNull)
      .select(col("__id"),
        pmod(col("__h") * 1000003L + col("__h2"), lit(ShingleMod)).as("__h"))
    uni.union(bi).select(col("__id"),
      pmod(col("__h"), lit(buckets.toLong)).as("__b"))
  }

  /** Hashed bag-of-n-grams linear classifier INFERENCE — the fastText
    * shape (Joulin et al. 2017, "Bag of Tricks for Efficient Text
    * Classification") that model-based quality filtering runs at corpus
    * scale (FineWeb-Edu, DCLM: a small trained classifier scores every
    * document; the corpus keeps the high scorers). Training happens
    * offline on a labeled sample — THIS is the apply step, the part that
    * must scale: `score = sigmoid(bias + mean bucket weight over the
    * document's unigram+bigram features)`, features hashed into
    * `buckets` buckets exactly as [[dsirScores]]' model
    * ([[hashedFeatureBuckets]]).
    *
    * `weights`: (bucket LONG, w_micro LONG) — per-bucket weight in
    * micro-units (w = w_micro / 1e6); buckets absent from the table
    * weigh 0. Bounded by `buckets` rows by construction, so it
    * broadcasts — the one small side in the plan.
    *
    * Determinism: per-document sums are exact 64-bit integers
    * (feature count, Σ w_micro); doubles appear once per document in a
    * fixed chain — `round(1e6·σ(bias + (Σw/1e6)/n))` — on identical
    * operands in every engine and partitioning (the [[dsirSample]]
    * device). A cross-engine flip needs exp to disagree within one ulp
    * of a half-micro-unit.
    *
    * Returns (doc_id, n_feats, prob_micro) for EVERY document —
    * documents yielding no feature rows (null text; an empty string
    * still tokenizes to one "" unigram) score `σ(bias)`: a gate must
    * see every document, and silently dropping the featureless ones
    * would un-audit exactly the rows most likely to be filtered.
    *
    * Scale shape: one token scan, (doc, bucket) rows hash-aggregate
    * map-side, weight table broadcasts, final per-doc aggregate — no
    * global window, no corpus-scale join, no driver collect. */
  def classifierScores(docs: DataFrame, weights: DataFrame, idCol: String,
      textCol: String, buckets: Int = DsirBuckets,
      biasMicro: Long = 0L): DataFrame = {
    // broadcast-join the weights straight onto the token-level feature
    // rows, then ONE hash aggregate on the doc id (map-side combined) —
    // no intermediate (doc, bucket) shuffle
    val featSums = hashedFeatureBuckets(docs, idCol, textCol, buckets)
      .join(broadcast(
        weights.select(col("bucket").as("__b"), col("w_micro").as("__w"))),
        Seq("__b"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__w"), lit(0L))).as("__s"))
    val logit = lit(biasMicro).cast("double") / lit(1e6) +
      (col("__s").cast("double") / lit(1e6)) / col("__n")
    val prob = round(lit(1e6) / (lit(1.0) + exp(-logit))).cast("long")
    val emptyProb = math.round(1e6 / (1.0 + math.exp(-(biasMicro / 1e6))))
    docs.select(col(s"`$idCol`").as("doc_id"))
      .join(featSums.withColumnRenamed("__id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__n"), lit(0L)).cast("long").as("n_feats"),
        coalesce(prob, lit(emptyProb)).cast("long").as("prob_micro"))
  }

  /** CCNet-style language-model perplexity scoring (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" §4.3): score every raw document by its cross-entropy under a
    * language model trained on a clean REFERENCE corpus; low perplexity
    * reads "looks like the reference", and the corpus is then kept/cut
    * by score (CCNet's head/middle/tail). Engine-portable stand-in for
    * the paper's 5-gram KenLM (documented in COVERAGE.md): an add-one
    * smoothed word-BIGRAM model over sha-hashed words —
    * `P(w₂|w₁) = (c(w₁,w₂) + 1) / (ctx(w₁) + V)` where `c` counts
    * reference bigrams, `ctx(w₁)` counts w₁ as a left context, and `V`
    * is the reference's distinct-word count (a proper conditional: sums
    * to 1 over the hashed vocabulary; unseen contexts degrade to the
    * uniform 1/V).
    *
    * Determinism: each scored bigram's log-probability is quantized to
    * integer micro-nats ONCE per distinct (doc, w₁, w₂) group — the
    * [[dsirScores]] device — and per-document totals are exact integer
    * sums. Returns (doc_id, n_pairs, logp_micro) for EVERY raw document
    * (n_pairs = 0, logp_micro = 0 for docs under 2 tokens — a
    * perplexity gate must see every document); cross-entropy in nats is
    * `-logp_micro / 1e6 / n_pairs`, perplexity its exp.
    *
    * Scale shape: token-level rows hash-partition on (doc, w₁, w₂); the
    * model joins are EQUI shuffles against the corpus-scale bigram and
    * context count tables (never broadcast — a reference LM over a
    * trillion-token Wikipedia-scale corpus does not fit a driver); the
    * vocabulary size is the single scalar broadcast. The bigram join
    * key is the exact (h₁, h₂) pair — never a 64-bit fold — so model
    * counts cannot contaminate across hash collisions. The only windows
    * are per-DOC adjacency leads. */
  def lmPerplexityScores(raw: DataFrame, reference: DataFrame,
      idCol: String, textCol: String): DataFrame =
    lmPerplexityScoresCarry(raw, reference, idCol, textCol, Nil)

  /** [[lmPerplexityScores]] with passenger columns carried from `raw`
    * through the final doc-list join — [[perplexityPrune]] threads its
    * group column here instead of paying a second corpus scan + join. */
  private def lmPerplexityScoresCarry(raw: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, carry: Seq[String]): DataFrame = {
    val refPairs = SubstrateCache.persist(lmPairRows(reference, idCol, textCol))
    val cb = refPairs.groupBy("__h1", "__h2").agg(count(lit(1)).as("__cb"))
    val ctx = refPairs.groupBy("__h1").agg(count(lit(1)).as("__cu"))
    val vocab = hashedWordRows(reference, idCol, textCol)
      .agg(countDistinct(col("__h")).as("__v"))
    lmScoreAgainstModel(raw, idCol, textCol, carry, cb, ctx, vocab)
  }

  /** (doc, h1, h2) adjacent-bigram rows — the LM substrate shared by
    * in-session model fits and [[LmIndex]]'s persisted model. */
  private[ops] def lmPairRows(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wh = hashedWordRows(df, idCol, textCol)
    val win = Window.partitionBy("__id").orderBy("__pos")
    wh.withColumn("__h2", lead("__h", 1).over(win))
      .filter(col("__h2").isNotNull)
      .select(col("__id"), col("__h").as("__h1"), col("__h2"))
  }

  /** Score `raw` against an already-fitted bigram model: `cb(__h1, __h2,
    * __cb)` bigram counts, `ctx(__h1, __cu)` context counts, `vocab` a
    * 1-row `(__v)` vocabulary size. The quantization contract of
    * [[lmPerplexityScores]] — a model persisted and reloaded
    * ([[LmIndex]]) reproduces the in-session scores bit-for-bit because
    * the counts it stores are exact integers. */
  private[ops] def lmScoreAgainstModel(raw: DataFrame, idCol: String,
      textCol: String, carry: Seq[String], cb: DataFrame, ctx: DataFrame,
      vocab: DataFrame): DataFrame = {
    val docp = lmPairRows(raw, idCol, textCol).groupBy("__id", "__h1", "__h2")
      .agg(count(lit(1)).as("__c"))
    // micro-nat log-prob per distinct scored bigram: the one place
    // doubles appear, once per (doc, h1, h2) group
    val lp = docp
      .join(cb, Seq("__h1", "__h2"), "left")
      .join(ctx, Seq("__h1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("__id"), col("__c"),
        round(lit(1e6) * log(
          (coalesce(col("__cb"), lit(0L)) + lit(1.0)) /
            (coalesce(col("__cu"), lit(0L)) + col("__v"))))
          .cast("long").as("__lp"))
    val scored = lp.groupBy("__id")
      .agg(sum("__c").as("__n"), sum(col("__c") * col("__lp")).as("__s"))
    raw.select(col(s"`$idCol`").as("doc_id") +:
        carry.map(c => col(s"`$c`")): _*)
      .join(scored.withColumnRenamed("__id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id") +: carry.map(c => col(s"`$c`")) :+
        coalesce(col("__n"), lit(0L)).cast("long").as("n_pairs") :+
        coalesce(col("__s"), lit(0L)).cast("long").as("logp_micro"): _*)
  }

  /** Temperature-based source weights for [[mixturePlan]] — the
    * multinomial α-sampling of multilingual/multi-corpus mixture design
    * (Raffel et al. 2020 §3.4.3's temperature-scaled rates; the same
    * device weights the published GPT-3/Llama corpus mixes): sampling
    * rate ∝ n_i^α, with α < 1 up-weighting small sources so a dominant
    * crawl cannot drown curated corpora.
    *
    * Returns (source, avail_tokens, w_micro) with
    * `w_micro = round(1e6 · (n_i / n_max)^α)` — MAX-normalized, so each
    * source's weight is ONE pow chain over an exact integer ratio,
    * micro-quantized once per source (≤ sources rows, the dsir device);
    * never a cross-source double SUM whose fold order could flip a
    * bit. Feed the (source, w_micro) pairs to [[mixturePlan]] as its
    * weights (relative scale is all it reads).
    *
    * Scale shape: one token scan, one per-source hash aggregate, a
    * 1-row max broadcast — nothing pairwise, nothing driver-side. */
  def temperatureWeights(df: DataFrame, sourceCol: String, textCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0, s"temperature exponent must be >= 0, got $alpha")
    val t = df.groupBy(col(s"`$sourceCol`").as("source"))
      .agg(sum(size(tokens(col(s"`$textCol`"))).cast("long"))
        .as("avail_tokens"))
    val mx = t.agg(max("avail_tokens").as("__mx"))
    t.crossJoin(broadcast(mx))
      .select(col("source"), col("avail_tokens"),
        round(lit(1e6) * pow(
          col("avail_tokens").cast("double") / col("__mx"), lit(alpha)))
          .cast("long").as("w_micro"))
  }

  /** CCNet's SELECTION step (Wenzek et al. 2020 §4.3 keep the
    * low-perplexity head of each bucket): retain the best-fitting
    * `frac` of each group (language, source) under the reference LM.
    * Ranks by `fit_micro = round(logp_micro / n_pairs)` — mean
    * micro-nat log-prob per bigram; higher = less surprising = lower
    * perplexity. Documents without a single bigram cannot be scored
    * and are EXCLUDED (the unscorable remainder is the caller's policy
    * decision, not silently kept or dropped inside a ranking).
    *
    * Returns (doc_id, groupCol, n_pairs, fit_micro) for the kept docs.
    *
    * Scale note: the per-group fraction is a row_number window
    * partitioned on the group — with a handful of corpus-scale language
    * groups that is a near-global sort (the [[dsirWeights]] caveat). At
    * 100 TB filter [[lmPerplexityScores]] on a fit threshold instead
    * (the [[dsirScores]] device: fully parallel predicate, same
    * scores). */
  def perplexityPrune(raw: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, groupCol: String, frac: Double): DataFrame = {
    val scored = lmPerplexityScoresCarry(raw, reference, idCol, textCol,
        Seq(groupCol))
      .filter(col("n_pairs") >= 1L)
      .withColumn("fit_micro",
        round(col("logp_micro").cast("double") / col("n_pairs")).cast("long"))
    topFractionByGroup(scored, groupCol, "fit_micro", "doc_id", frac)
      .select(col("doc_id"), col(s"`$groupCol`"), col("n_pairs"),
        col("fit_micro"))
  }
}
