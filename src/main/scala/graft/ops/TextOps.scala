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
    100663319L, 50331653L, 25165843L, 12582917L)
  val MinHashB: Seq[Long] = Seq(
    1566083941L, 988446091L, 1023456789L, 731245879L,
    354654323L, 1200956321L, 876543211L, 456789123L)
  def minHashK: Int = MinHashA.size

  /** LSH banding: 4 bands × 2 rows over the 8-signature. */
  val Bands = 4
  val RowsPerBand = 2

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
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(
      col(idCol).as("__id"),
      array_distinct(bigramShingles(tokens(col(textCol)))).as("__sh"))
      .withColumn("__hs", hashAll(col("__sh")))
      .filter(size(col("__sh")) > 0)

    val bands = docs
      .select(col("__id"), posexplode(bandKeys(minHashSignature(col("__hs")))))
      .select(col("__id"), concat_ws("#", col("pos"), col("col")).as("__band"))

    val pairs = bands.alias("a")
      .join(bands.alias("b"),
        col("a.__band") === col("b.__band") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()

    val sets = docs.select(col("__id"), col("__sh"))
    pairs
      .join(sets.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))
          - size(array_intersect(col("sh_a"), col("sh_b")))).as("uni"))
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
    val docs = df.select(
      col(idCol).as("__id"),
      blockCol.as("__blk"),
      array_distinct(bigramShingles(tokens(col(textCol)))).as("__sh"))
      .filter(size(col("__sh")) > 0)
    docs.alias("a").join(docs.alias("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        size(array_intersect(col("a.__sh"), col("b.__sh"))).as("inter"),
        (size(col("a.__sh")) + size(col("b.__sh"))
          - size(array_intersect(col("a.__sh"), col("b.__sh")))).as("uni"))
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

  /** Token counting: whitespace tokens and BPE-ish regex tokens
    * (letter runs | digit runs | single other non-space). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_tokens"))

  /** Order-sensitive document fingerprint over the token stream. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      fingerprint(hashAll(tokens(col(textCol)))).as("fingerprint"))
}
