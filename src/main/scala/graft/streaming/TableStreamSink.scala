package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.tables.ManagedTable

/** Structured Streaming SINK into a [[ManagedTable]] — any streaming
  * query can land in a managed table with exactly-once appends, without
  * going through the ingest pipeline ([[StreamingIngest]] remains the
  * path for metadata-driven bronze→silver processing).
  *
  * Exactly-once rides the commit protocol itself: every micro-batch
  * append tags its manifest commit `streamBatch=<id>`, and a replayed
  * batch (checkpoint recovery re-delivers the last uncommitted-to-sink
  * batch) is detected by scanning commit history for the newest such tag
  * — no side channel that could desync from the table, because the
  * marker IS the committed version. Append-mode only: updates belong to
  * `foreachBatch` + `MergeInto`.
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
      partitionColumns)
  }
}

class TableStreamSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String]) extends Sink {

  private val BatchTag = "streamBatch="

  private def table = ManagedTable(sqlContext.sparkSession, path)

  /** Newest committed stream batch id, from commit history. Usually the
    * head commit; maintenance commits (compact/zorder/vacuum-era) in
    * between are walked past. */
  private def lastCommitted(t: ManagedTable): Option[Long] =
    t.history().iterator.map(_.operation)
      .collectFirst { case op if op.startsWith(BatchTag) =>
        op.stripPrefix(BatchTag).toLong
      }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val t = table
    if (t.exists && lastCommitted(t).exists(_ >= batchId)) return // replay
    // re-root the micro-batch plan as a batch frame (writing the
    // sink-provided frame directly would re-plan streaming relations)
    val batch = GraftStreamingShim.asBatch(data)
    if (t.exists) t.append(batch, s"$BatchTag$batchId")
    else t.overwriteAll(batch, partitionColumns, s"$BatchTag$batchId")
  }

  override def toString: String = s"GraftTableSink[$path]"
}
