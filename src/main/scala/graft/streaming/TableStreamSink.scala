package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.tables.{ManagedTable, Txn}

/** Structured Streaming SINK into a [[ManagedTable]] — any streaming
  * query can land in a managed table with exactly-once appends, without
  * going through the ingest pipeline ([[StreamingIngest]] remains the
  * path for metadata-driven bronze→silver processing).
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
  * Append-mode only: updates belong to `foreachBatch` + `MergeInto`.
  *
  * Usage:
  * {{{
  *   df.writeStream
  *     .format(classOf[TableSinkProvider].getName)
  *     .option("path", tableRoot)
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  */
class TableSinkProvider extends StreamSinkProvider {
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append,
      s"graft table sink supports Append output mode only, got $outputMode")
    new TableStreamSink(sqlContext,
      parameters.getOrElse("path", throw new IllegalArgumentException(
        "graft table stream sink requires option 'path'")),
      partitionColumns, parameters)
  }
}

class TableStreamSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String],
    parameters: Map[String, String] = Map.empty) extends Sink {

  private val BatchTag = "streamBatch="

  /** Stable writer identity (see class doc). */
  private[streaming] val appId: String = TableStreamSink.appIdFrom(parameters)

  private[streaming] lazy val table = ManagedTable(sqlContext.sparkSession, path)

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
    // create-or-append with the exists check INSIDE the write lock: two
    // queries' first batches racing into a fresh table must serialize
    // into create-then-append, not two overwrites (the second would
    // silently erase the first writer's batch)
    t.appendOrCreate(batch, partitionColumns, s"$BatchTag$batchId",
      Some(Txn(appId, batchId)))
    t.setTxn(appId, batchId) // fast-path marker for the next recovery
    lastCommitted = Some(batchId)
  }

  override def toString: String = s"GraftTableSink[$path]"
}

object TableStreamSink {

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
