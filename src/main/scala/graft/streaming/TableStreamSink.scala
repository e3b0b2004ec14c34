package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.tables.{ManagedTable, MergeInto, Txn}

/** Structured Streaming SINK into a [[ManagedTable]] — any streaming
  * query can land in a managed table with exactly-once writes, without
  * going through the ingest pipeline ([[StreamingIngest]] remains the
  * path for metadata-driven bronze→silver processing).
  *
  * Three write modes, selected by the `mode` option (or inferred from
  * the query's output mode):
  *
  *  - `append` (default; OutputMode.Append): each micro-batch appends.
  *  - `upsert` (OutputMode.Append or Update): each micro-batch is
  *    MERGEd on `mergeKey` — last-write-wins per key, with optional
  *    CDC-style deletes via a boolean `deleteColumn` and deterministic
  *    within-batch collapse via `sequenceColumn`. This is Delta's
  *    `foreachBatch` + `merge` idiom as a first-class sink: the merge
  *    commit embeds the writer txn ([[graft.tables.MergeBuilder
  *    .withTxn]]) so a replayed batch re-merges nothing.
  *  - `complete` (OutputMode.Complete): each micro-batch atomically
  *    replaces the whole table — the natural landing for a streaming
  *    aggregation kept small (a per-key rollup, a top-k).
  *
  * Exactly-once is writer-identity-scoped (Delta's txnAppId/txnVersion
  * pattern): each query derives a stable `appId` from its
  * `checkpointLocation` (or an explicit `txnAppId` option), and every
  * micro-batch commit embeds `(appId, batchId)` INSIDE the manifest
  * record ([[graft.tables.Txn]]) — atomic with the data, so a crash can
  * never separate "rows landed" from "batch marked committed". After
  * each commit a vacuum-exempt marker file ([[ManagedTable.setTxn]]) is
  * refreshed for O(1) recovery; [[ManagedTable.vacuum]] rolls embedded
  * txns forward into the marker before pruning records, so
  * `max(marker, newest embedded txn)` never misses a committed batch.
  *
  * Identity scoping is what makes replay detection sound: a NEW query
  * (fresh checkpoint) writing into an existing table restarts batchIds
  * at 0, and its batches must NOT be suppressed by another writer's
  * history — each appId's batch sequence is tracked independently.
  * Queries without any checkpointLocation option get a fresh random
  * identity per run (they cannot replay — there is no checkpoint to
  * restart from).
  *
  * Small-file maintenance: a long-lived streaming append produces one
  * commit (and ≥1 file) per trigger — the classic small-file problem
  * that degrades every downstream scan at scale. `autoCompact=true`
  * folds maintenance into the write path: every
  * `autoCompact.interval` batches (default 10) the sink bin-packs
  * files under `autoCompact.smallBytes` (default 32 MiB) via
  * [[ManagedTable.compactSmall]]. The compaction is a separate commit
  * AFTER the batch's txn commit, so a crash between the two loses only
  * maintenance (re-done on a later trigger), never data, and replay
  * detection is unaffected (the txn walk skips no-txn records).
  *
  * Usage:
  * {{{
  *   df.writeStream
  *     .format(classOf[TableSinkProvider].getName)
  *     .option("path", tableRoot)
  *     .option("checkpointLocation", ckpt)
  *     .option("mode", "upsert").option("mergeKey", "id")   // optional
  *     .start()
  * }}}
  */
class TableSinkProvider extends StreamSinkProvider {
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val mode = TableStreamSink.resolveMode(parameters, outputMode)
    new TableStreamSink(sqlContext,
      parameters.getOrElse("path", throw new IllegalArgumentException(
        "graft table stream sink requires option 'path'")),
      partitionColumns, parameters, mode)
  }
}

class TableStreamSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String],
    parameters: Map[String, String] = Map.empty,
    mode: TableStreamSink.Mode = TableStreamSink.AppendMode) extends Sink {

  import TableStreamSink._

  private val BatchTag = "streamBatch="

  /** Stable writer identity (see class doc). */
  private[streaming] val appId: String = TableStreamSink.appIdFrom(parameters)

  private[streaming] lazy val table = ManagedTable(sqlContext.sparkSession, path)

  private val mergeKeys: Seq[String] = parameters.get("mergeKey")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  private val deleteColumn = parameters.get("deleteColumn")
  private val sequenceColumn = parameters.get("sequenceColumn")

  private val mergeSchema =
    parameters.get("mergeSchema").exists(_.equalsIgnoreCase("true"))
  private val autoCompact =
    parameters.get("autoCompact").exists(_.equalsIgnoreCase("true"))
  private val autoCompactSmallBytes: Long =
    parameters.getOrElse("autoCompact.smallBytes", (32L << 20).toString).toLong
  private val autoCompactInterval: Long =
    parameters.getOrElse("autoCompact.interval", "10").toLong

  require(mode != UpsertMode || mergeKeys.nonEmpty,
    "graft table stream sink: mode=upsert requires option 'mergeKey'")

  /** Last batch id known committed by THIS writer identity. Recovered
    * once per sink instance (one query (re)start) from the marker file
    * plus the newest record-embedded txn, then maintained in memory —
    * the steady-state replay probe costs zero manifest-record reads per
    * micro-batch. */
  private var lastCommitted: Option[Long] = None
  private var recovered = false

  private def recoverLastCommitted(t: ManagedTable): Option[Long] =
    if (!t.exists) None
    else {
      // the marker (vacuum-exempt, O(1) read) may trail the truth by one
      // crash window; the record-embedded txn is atomic with the data but
      // prunable — vacuum rolls it into the marker first, so the max of
      // the two is always the newest committed batch
      val marker = t.getTxn(appId)
      val embedded = t.newestRecordTxn(appId)
      (marker.toSeq ++ embedded.toSeq).maxOption
    }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val t = table
    if (!recovered) { lastCommitted = recoverLastCommitted(t); recovered = true }
    if (lastCommitted.exists(_ >= batchId)) return // replay
    // re-root the micro-batch plan as a batch frame (writing the
    // sink-provided frame directly would re-plan streaming relations)
    val batch = GraftStreamingShim.asBatch(data)
    val tag = s"$BatchTag$batchId"
    val txn = Some(Txn(appId, batchId))
    mode match {
      case AppendMode =>
        // create-or-append with the exists check INSIDE the write lock:
        // two queries' first batches racing into a fresh table must
        // serialize into create-then-append, not two overwrites (the
        // second would silently erase the first writer's batch)
        t.appendOrCreate(batch, partitionColumns, tag, txn)
      case CompleteMode =>
        t.overwriteAll(batch, partitionColumns, tag, txn)
      case UpsertMode =>
        upsertBatch(t, batch, batchId, tag)
    }
    t.setTxn(appId, batchId) // fast-path marker for the next recovery
    lastCommitted = Some(batchId)
    if (autoCompact && batchId > 0 && batchId % autoCompactInterval == 0)
      t.compactSmall(autoCompactSmallBytes)
  }

  /** One micro-batch as a MERGE: collapse to one row per key (newest by
    * `sequenceColumn` when given, arbitrary otherwise — document your
    * ordering column for CDC streams), then update/insert/delete. The
    * create path (first batch into a fresh table) drops delete-flagged
    * rows and the flag column itself — a delete for a key that never
    * existed is a no-op, and the flag is transport metadata, not data. */
  private def upsertBatch(t: ManagedTable, batch: DataFrame,
      batchId: Long, tag: String): Unit = {
    val keyCols = mergeKeys.map(k => col(s"`$k`"))
    val deduped = sequenceColumn match {
      case Some(seq) =>
        val w = Window.partitionBy(keyCols: _*).orderBy(col(s"`$seq`").desc)
        batch.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
      case None => batch.dropDuplicates(mergeKeys)
    }
    def isDelete(d: String): String = s"coalesce(source.`$d`, false)"
    t.withWriteLock {
      if (!t.exists) {
        val initial = deleteColumn.fold(deduped)(d =>
          deduped.filter(!coalesce(col(s"`$d`"), lit(false))).drop(d))
        t.overwriteAll(initial, partitionColumns, tag, Some(Txn(appId, batchId)))
      } else {
        val base =
          (if (mergeKeys.size == 1) MergeInto.byKey(t, deduped, mergeKeys.head)
           else MergeInto(t, deduped,
             mergeKeys.map(k => s"target.`$k` = source.`$k`").mkString(" AND ")))
            // deduped IS unique per merge key by construction above
            .assumeUniqueSourceKeys()
        val clauses = deleteColumn match {
          case Some(d) => base
            .whenMatchedDelete(Some(isDelete(d)))
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll(Some(s"NOT ${isDelete(d)}"))
          case None => base.whenMatchedUpdateAll().whenNotMatchedInsertAll()
        }
        // the CDC flag is a merge input, never a table column (the create
        // path drops it too) — exclude it from evolution; the sequence
        // column is data (the create path keeps it) and may be adopted
        val evolved =
          if (mergeSchema) clauses.withSchemaEvolution(deleteColumn.toSeq)
          else clauses
        evolved.assumeUniqueSourceKeys() // dedup above proved it
          .withTxn(appId, batchId, s"merge $tag")
          .execute()
      }
    }
  }

  override def toString: String = s"GraftTableSink[$path,$mode]"
}

object TableStreamSink {

  sealed trait Mode
  case object AppendMode extends Mode { override def toString = "append" }
  case object UpsertMode extends Mode { override def toString = "upsert" }
  case object CompleteMode extends Mode { override def toString = "complete" }

  /** `mode` option wins; otherwise the query's output mode implies one
    * (Update ⇒ upsert, Complete ⇒ complete, Append ⇒ append). Validates
    * the combination — e.g. a Complete-mode query cannot append. */
  private[streaming] def resolveMode(parameters: Map[String, String],
      outputMode: OutputMode): Mode = {
    val m = parameters.get("mode").map(_.toLowerCase) match {
      case Some("append")   => AppendMode
      case Some("upsert")   => UpsertMode
      case Some("complete") => CompleteMode
      case Some(other) => throw new IllegalArgumentException(
        s"graft table stream sink: unknown mode '$other' " +
          "(append | upsert | complete)")
      case None =>
        if (outputMode == OutputMode.Update()) UpsertMode
        else if (outputMode == OutputMode.Complete()) CompleteMode
        else AppendMode
    }
    val ok = m match {
      case AppendMode   => outputMode == OutputMode.Append
      case UpsertMode   => outputMode == OutputMode.Append ||
                           outputMode == OutputMode.Update
      case CompleteMode => outputMode == OutputMode.Complete
    }
    require(ok, s"graft table stream sink: mode=$m is incompatible with " +
      s"output mode $outputMode")
    m
  }

  /** Writer identity: explicit `txnAppId` option first, else the query's
    * `checkpointLocation` (same checkpoint ⇒ same query ⇒ same batchId
    * sequence), else a fresh random identity (no checkpoint ⇒ no
    * replay). SHA-256-hex so any checkpoint path / user string becomes a
    * filesystem-safe marker filename. */
  private[streaming] def appIdFrom(parameters: Map[String, String]): String =
    parameters.get("txnAppId").orElse(parameters.get("checkpointLocation"))
      .map(sha256Hex)
      .getOrElse(java.util.UUID.randomUUID().toString.replace("-", ""))

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
