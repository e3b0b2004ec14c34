package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.{ManagedTable, MergeInto}

/** Persistent bigram-LM index — the train-once / score-many shape of
  * CCNet-style perplexity filtering ([[TextOps.lmPerplexityScores]]):
  * the reference corpus is a trillion-token clean corpus at production
  * scale, and recounting it on every scoring call is the cost a model
  * artifact exists to avoid. The fitted model persists as three
  * [[ManagedTable]]s under one root:
  *
  * {{{
  *   <root>/bigrams    (h1, h2, cb)   — reference bigram counts
  *   <root>/contexts   (h1, cu)      — left-context counts
  *   <root>/vocab      (h)           — distinct word hashes (V = count)
  * }}}
  *
  * Because the model is exact integer counts and [[TextOps]] quantizes
  * each scored bigram's log once from those counts, a `score` against a
  * freshly built index reproduces the in-session
  * `lmPerplexityScores(raw, reference, …)` BIT-FOR-BIT — pinned by the
  * oracle query, which runs the index path against the direct path's
  * SQL restatement.
  *
  * Incremental fit: counts are ADDITIVE, so [[addCorpus]] folds a new
  * reference slice in with two count-MERGEs (matched rows add, new rows
  * insert) and one anti-join vocab append — the old reference is never
  * rescanned. V stays exact because the vocab table holds the distinct
  * hash SET, not a sketch.
  *
  * Scale shape: scoring joins the batch's (doc, h1, h2) rows against
  * the model tables as EQUI shuffles (the model never broadcasts — see
  * [[TextOps.lmPerplexityScores]]); the vocabulary size is metadata-only
  * (`fastCount`) when engine-written row counts exist. The tables
  * version like any managed table: time travel pins a model snapshot,
  * vacuum and compaction maintain it.
  */
final class LmIndex(spark: SparkSession, val rootPath: String) {

  private[ops] val bigramsTable = ManagedTable(spark, s"$rootPath/bigrams")
  private[ops] val contextsTable = ManagedTable(spark, s"$rootPath/contexts")
  private[ops] val vocabTable = ManagedTable(spark, s"$rootPath/vocab")

  def exists: Boolean =
    bigramsTable.exists && contextsTable.exists && vocabTable.exists

  /** Vocabulary size V — metadata-only when per-file row counts are
    * recorded (they are for engine-written commits). */
  def vocabSize: Long =
    vocabTable.fastCount.getOrElse(vocabTable.read().count())

  /** Build-time fingerprint: the row count of the exact frame passed to
    * [[LmIndex.create]] — callers revalidate a staged index with one
    * cheap source `count()` instead of a tokenize pass. */
  def sourceCount: Option[Long] =
    bigramsTable.manifest.flatMap(_.properties.get(LmIndex.SourceCountProp))
      .map(_.toLong)

  /** Cross-entropy scores for `docs` under the persisted model — the
    * same (doc_id, n_pairs, logp_micro) contract as
    * [[TextOps.lmPerplexityScores]]. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cb = bigramsTable.read().select(col("h1").as("__h1"),
      col("h2").as("__h2"), col("cb").as("__cb"))
    val ctx = contextsTable.read().select(col("h1").as("__h1"),
      col("cu").as("__cu"))
    val vocab = spark.range(1).select(lit(vocabSize).as("__v"))
    TextOps.lmScoreAgainstModel(docs, idCol, textCol, Nil, cb, ctx, vocab)
  }

  /** Fold an additional reference slice into the model — incremental
    * fit, old reference never rescanned. Counts MERGE (add on match,
    * insert on miss); new vocabulary hashes append via anti-join. */
  def addCorpus(reference: DataFrame, idCol: String, textCol: String): Unit = {
    val pairs = SubstrateCache.persist(
      TextOps.lmPairRows(reference, idCol, textCol))
    val cbDelta = pairs.groupBy(col("__h1").as("h1"), col("__h2").as("h2"))
      .agg(count(lit(1)).as("cb"))
    MergeInto(bigramsTable, cbDelta,
      "target.h1 = source.h1 AND target.h2 = source.h2")
      .whenMatchedUpdate(Map("cb" -> "target.cb + source.cb"))
      .whenNotMatchedInsertAll()
      .execute()
    val ctxDelta = pairs.groupBy(col("__h1").as("h1"))
      .agg(count(lit(1)).as("cu"))
    MergeInto(contextsTable, ctxDelta, "target.h1 = source.h1")
      .whenMatchedUpdate(Map("cu" -> "target.cu + source.cu"))
      .whenNotMatchedInsertAll()
      .execute()
    val newWords = TextOps.hashedWordRows(reference, idCol, textCol)
      .select(col("__h").as("h")).distinct()
      .join(vocabTable.read(), Seq("h"), "left_anti")
    vocabTable.append(newWords, "lmindex-add")
  }
}

object LmIndex {

  /** Table property holding [[create]]'s source row count. */
  val SourceCountProp = "graft.lmindex.sourceCount"

  def apply(spark: SparkSession, rootPath: String): LmIndex =
    new LmIndex(spark, rootPath)

  /** Fit the model at `rootPath` from `reference` — one pair scan, three
    * table writes. The source row count is recorded as a table property
    * for cheap reuse revalidation. */
  def create(spark: SparkSession, reference: DataFrame,
      idCol: String, textCol: String, rootPath: String): LmIndex = {
    val idx = new LmIndex(spark, rootPath)
    val pairs = SubstrateCache.persist(
      TextOps.lmPairRows(reference, idCol, textCol))
    val n = reference.count()
    idx.bigramsTable.overwriteAll(
      pairs.groupBy(col("__h1").as("h1"), col("__h2").as("h2"))
        .agg(count(lit(1)).as("cb")),
      operation = "lmindex-create")
    idx.contextsTable.overwriteAll(
      pairs.groupBy(col("__h1").as("h1")).agg(count(lit(1)).as("cu")),
      operation = "lmindex-create")
    idx.vocabTable.overwriteAll(
      TextOps.hashedWordRows(reference, idCol, textCol)
        .select(col("__h").as("h")).distinct(),
      operation = "lmindex-create")
    idx.bigramsTable.setTableProperties(Map(SourceCountProp -> n.toString))
    idx
  }
}
