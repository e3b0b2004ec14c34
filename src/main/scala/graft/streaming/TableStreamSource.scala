package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.tables.ManagedTable

/** Structured Streaming SOURCE over a [[ManagedTable]] — the managed
  * table becomes a live feed, completing the lakehouse streaming story
  * (the engine already streams INTO tables via `StreamingIngest`; this
  * streams OUT of them). Delta's streaming-source equivalent on the
  * manifest layer:
  *
  *  - offsets are table VERSIONS (`LongOffset`), so progress tracking
  *    rides the commit protocol: a micro-batch is "the files versions
  *    (start, end] added", resolved from manifest diffs — O(changed
  *    files), never a directory listing, and exactly-once because
  *    version commits are atomic pointer swaps;
  *  - the first batch is the full snapshot at the stream's start
  *    version (Delta's initial-snapshot semantics);
  *  - REWRITTEN files re-emit their rows (Delta `ignoreChanges`
  *    semantics): downstream consumers of a merge-maintained table must
  *    dedupe by key — or consume [[graft.tables.ManagedTable.rowChanges]]
  *    via polling for classified row-level changes. Appends re-emit
  *    nothing;
  *  - the column set is pinned at stream start (schema evolution
  *    mid-stream nulls missing columns rather than reshaping the plan).
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format(classOf[TableStreamProvider].getName)
  *     .option("path", tableRoot)
  *     .load()
  * }}}
  */
class TableStreamProvider extends StreamSourceProvider {

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft table stream source requires option 'path'"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = ManagedTable(sqlContext.sparkSession, path(parameters))
    ("graft-table", schema.getOrElse(t.manifest
      .map(_.schema)
      .getOrElse(throw new IllegalArgumentException(
        s"graft table stream source: no table at ${path(parameters)}"))))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new TableStreamSource(sqlContext, path(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2)
}

class TableStreamSource(
    sqlContext: SQLContext,
    path: String,
    declaredSchema: StructType) extends Source {

  private val table = ManagedTable(sqlContext.sparkSession, path)

  override def schema: StructType = declaredSchema

  override def getOffset: Option[Offset] =
    table.currentVersion.map(LongOffset(_))

  private def version(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other         => other.json.toLong // SerializedOffset from a checkpoint
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = version(end)
    val batch = start match {
      // first batch: the full snapshot at the stream's start version
      case None => table.readVersion(endV)
      case Some(s) =>
        table.changes(version(s), endV)
          .filter(col("_change_type") === "added")
          .drop("_change_type")
    }
    // pin the declared column set (schema drift mid-stream nulls gaps);
    // MicroBatchExecution requires isStreaming=true on a v1 batch
    GraftStreamingShim.asStreaming(
      batch.select(declaredSchema.fieldNames.map(n => col(s"`$n`")).toSeq: _*))
  }

  override def commit(end: Offset): Unit = () // versions need no cleanup

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$path]"
}
