package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.streaming.{TableSinkProvider, TableStreamProvider}
import graft.tables.ManagedTable

/** `format("graft")` — the one data-source string for every managed-table
  * surface, batch and streaming (Delta's single-format UX):
  *
  * {{{
  *   df.write.format("graft").option("partitionBy", "day").save(path)
  *   spark.read.format("graft").load(path)                     // current
  *   spark.read.format("graft").option("versionAsOf", 3).load(path)
  *   spark.readStream.format("graft").load(path)               // CDC source
  *   agg.writeStream.format("graft").option("mode", "upsert")…  // sink
  * }}}
  *
  * Batch reads are manifest-driven: pushed filters prune FILES via the
  * per-column min/max statistics before the parquet scan is planned
  * (conservative — a bound that cannot be translated safely skips
  * nothing), and every filter is declared unhandled so Spark re-applies
  * it row-level; pruning is purely an I/O optimization and can never
  * change results. Batch writes map `SaveMode` onto the commit protocol
  * (Overwrite → new snapshot, Append → create-or-append under the write
  * lock). Streaming delegates to [[graft.streaming.TableStreamProvider]]
  * / [[graft.streaming.TableSinkProvider]], so one format string covers
  * admission-controlled reads and exactly-once writes.
  *
  * Registered through `META-INF/services` ([[DataSourceRegister]]), so
  * the short name works without `classOf[…].getName`. */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider
    with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft data source requires a path (load(path) or option 'path')"))

  // ------------------------------------------------------------- batch read
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    if (parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true")))
      return changeFeedRelation(sqlContext, parameters)
    val version = parameters.get("versionAsOf").map(_.toLong)
    val ts = parameters.get("timestampAsOf").map(GraftDataSource.parseTimestamp)
    require(version.isEmpty || ts.isEmpty,
      "graft: versionAsOf and timestampAsOf are mutually exclusive")
    val resolved = version.orElse(ts.map(t =>
      ManagedTable(sqlContext.sparkSession, path(parameters)).versionAt(t)))
    GraftRelation(sqlContext, path(parameters), resolved)
  }

  /** Batch CDC read (Delta's batch `readChangeFeed`): the classified
    * row-level changes of versions [`startingVersion`, `endingVersion`]
    * (defaults: 0 → head), same schema and classification as the
    * streaming change feed — one API for backfill and live tail. */
  private def changeFeedRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val p = path(parameters)
    val t = ManagedTable(sqlContext.sparkSession, p)
    val head = t.currentVersion.getOrElse(
      throw new IllegalArgumentException(s"no graft table at $p"))
    val startV = parameters.get("startingVersion")
      .filterNot(_.equalsIgnoreCase("latest")).map(_.toLong).getOrElse(0L)
    val endV = parameters.get("endingVersion").map(_.toLong).getOrElse(head)
    require(startV >= 0 && startV <= endV && endV <= head,
      s"graft readChangeFeed: need 0 <= startingVersion <= endingVersion " +
        s"<= $head, got [$startV, $endV]")
    val src = new graft.streaming.ChangeFeedStreamSource(sqlContext, p,
      t.readManifest(endV).schema, parameters)
    val df = src.feedFrame(startV - 1, endV)
    val sc = sqlContext
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = sc
      override val schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }

  // ------------------------------------------------------------ batch write
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val p = path(parameters)
    val t = ManagedTable(sqlContext.sparkSession, p)
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    mode match {
      case SaveMode.Overwrite     => t.overwriteAll(data, partitionBy)
      case SaveMode.Append        => t.appendOrCreate(data, partitionBy)
      case SaveMode.ErrorIfExists =>
        if (t.exists) throw new IllegalStateException(
          s"graft table already exists: $p (SaveMode.ErrorIfExists)")
        t.overwriteAll(data, partitionBy)
      case SaveMode.Ignore        =>
        if (!t.exists) t.overwriteAll(data, partitionBy)
    }
    GraftRelation(sqlContext, p, None)
  }

  // -------------------------------------------------------------- streaming
  private val streamSource = new TableStreamProvider
  private val streamSink = new TableSinkProvider

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    streamSource.sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    streamSource.createSource(sqlContext, metadataPath, schema, providerName,
      parameters)

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink =
    streamSink.createSink(sqlContext, parameters, partitionColumns, outputMode)
}

/** Batch relation over a managed-table snapshot (current or
  * `versionAsOf`). Filter pushdown is used ONLY for manifest-stats file
  * pruning; `unhandledFilters` returns everything, so Spark plans the
  * row-level filter on top and correctness never depends on the stats. */
final case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    versionAsOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  private val table = ManagedTable(sqlContext.sparkSession, path)

  override val schema: StructType = versionAsOf match {
    case Some(v) => table.readManifest(v).schema
    case None => table.manifest.map(_.schema).getOrElse(
      throw new IllegalArgumentException(s"no graft table at $path"))
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val frame = versionAsOf match {
      case Some(v) => table.readVersion(v) // time travel: no stats pruning
      case None    => prunedCurrent(filters)
    }
    val projected =
      if (requiredColumns.isEmpty) frame
      else frame.select(requiredColumns.map(c => col(s"`$c`")).toSeq: _*)
    projected.rdd
  }

  /** Conjunctive min/max file skipping from the pushed simple bounds —
    * inclusive bounds for strict comparisons (conservative: never drops
    * a file that could hold a matching row). */
  private def prunedCurrent(filters: Array[Filter]): DataFrame = {
    val bounds: Seq[(String, Option[Any], Option[Any])] = filters.toSeq.collect {
      case EqualTo(a, v)            => (a, Some(v), Some(v))
      case GreaterThan(a, v)        => (a, Some(v), None)
      case GreaterThanOrEqual(a, v) => (a, Some(v), None)
      case LessThan(a, v)           => (a, None, Some(v))
      case LessThanOrEqual(a, v)    => (a, None, Some(v))
    }
    if (bounds.isEmpty) table.read()
    else {
      val m = table.manifest.get
      val survivors = bounds
        .map { case (c, lo, hi) => table.filesInRange(c, lo, hi).map(_.path).toSet }
        .reduce(_ intersect _)
      table.readManifestFiles(m, m.files.filter(f => survivors.contains(f.path)))
    }
  }
}

object GraftDataSource {
  /** `timestampAsOf` parse: epoch millis (all digits), else
    * `yyyy-MM-dd[ HH:mm:ss[.f]]` interpreted in the JVM's local
    * timezone (java.sql semantics — pass epoch millis for an
    * unambiguous instant). */
  private[sources] def parseTimestamp(s: String): Long = {
    val t = s.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
    else {
      val norm = t.replace('T', ' ')
      val full = if (norm.contains(' ')) norm else s"$norm 00:00:00"
      java.sql.Timestamp.valueOf(full).getTime
    }
  }
}
