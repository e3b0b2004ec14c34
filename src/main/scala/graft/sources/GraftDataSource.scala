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
    if (parameters.get("readRowIds").exists(_.equalsIgnoreCase("true")))
      return rowMetaRelation(sqlContext, parameters)
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
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graft readChangeFeed: startingVersion and startingTimestamp are " +
        "mutually exclusive")
    require(!(parameters.contains("endingVersion") &&
        parameters.contains("endingTimestamp")),
      "graft readChangeFeed: endingVersion and endingTimestamp are " +
        "mutually exclusive")
    import graft.streaming.ChangeFeedStreamSource.parseTs
    val startV = parameters.get("startingVersion")
      .filterNot(_.equalsIgnoreCase("latest")).map(_.toLong)
      .orElse(parameters.get("startingTimestamp").map { s =>
        // first retained commit at or after the instant (the streaming
        // source's semantics); an instant past the head fails the range
        // check below, like Delta's batch CDF
        val ts = parseTs(s)
        t.history().filter(_.timestampMs >= ts).map(_.version)
          .minOption.getOrElse(head + 1L)
      })
      .getOrElse(0L)
    val endV = parameters.get("endingVersion").map(_.toLong)
      .orElse(parameters.get("endingTimestamp")
        .map(s => t.versionAt(parseTs(s)))) // newest at or before
      .getOrElse(head)
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
      override def needConversion: Boolean = false // internal rows pass through
      override def buildScan(): RDD[Row] =
        df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }
  }

  /** `option("readRowIds", "true")`: the current snapshot plus row
    * tracking's `_row_id` and `_row_commit_version` columns (Delta
    * exposes the same through `_metadata`). Requires
    * [[ManagedTable.enableRowTracking]]; current version only. */
  private def rowMetaRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    require(!parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"),
      "graft readRowIds reads the CURRENT version only")
    val p = path(parameters)
    val t = ManagedTable(sqlContext.sparkSession, p)
    // schema is stable (table schema + two longs); the FRAME is built per
    // scan so each query sees the then-current snapshot
    val relSchema = StructType(t.readWithRowMeta().schema.fields)
    val sc = sqlContext
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = sc
      override val schema: StructType = relSchema
      override def needConversion: Boolean = false // internal rows pass through
      override def buildScan(): RDD[Row] =
        t.readWithRowMeta().queryExecution.toRdd.asInstanceOf[RDD[Row]]
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
    // `.option("partitionBy", "a,b")` or the native
    // `DataFrameWriter.partitionBy(...)`, which Spark forwards to V1
    // sources as a JSON-encoded option under PARTITIONING_COLUMNS_KEY —
    // dropping it silently would discard the clause that matters most
    // at scale
    import org.apache.spark.sql.execution.datasources.DataSourceUtils
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
        .map(DataSourceUtils.decodePartitioningColumns))
      .getOrElse(Nil)
    mode match {
      case SaveMode.Overwrite     => parameters.get("replaceWhere") match {
        // Delta's writer option: predicate-scoped overwrite instead of
        // whole-table replacement
        case Some(cond) => t.overwriteWhere(data, cond)
        // dynamic partition overwrite: replace ONLY the partitions
        // present in the data — silently widening this to a full
        // overwrite would drop every untouched partition. The writer
        // option wins; absent it, the SESSION conf
        // `spark.sql.sources.partitionOverwriteMode=dynamic` applies to
        // partitioned targets (Spark's file sources and Delta both honor
        // it — ignoring it here was silent data loss). The session-conf
        // form falls back to a full overwrite on unpartitioned tables
        // (dynamic is meaningless there); the EXPLICIT option still
        // demands a partitioned target.
        case None if parameters.get("partitionOverwriteMode")
            .exists(_.equalsIgnoreCase("dynamic")) =>
          val pby =
            if (partitionBy.nonEmpty) partitionBy
            else t.manifest.map(_.partitionColumns).getOrElse(Nil)
          require(pby.nonEmpty, "partitionOverwriteMode=dynamic needs a " +
            s"partitioned table (none declared at $p)")
          t.overwriteDynamic(data, pby)
        case None if parameters.get("partitionOverwriteMode").isEmpty &&
            sqlContext.sparkSession.sessionState.conf.partitionOverwriteMode ==
              org.apache.spark.sql.internal.SQLConf.PartitionOverwriteMode.DYNAMIC &&
            (partitionBy.nonEmpty ||
              t.manifest.exists(_.partitionColumns.nonEmpty)) =>
          val pby =
            if (partitionBy.nonEmpty) partitionBy
            else t.manifest.map(_.partitionColumns).getOrElse(Nil)
          t.overwriteDynamic(data, pby)
        case None       => t.overwriteAll(data, partitionBy)
      }
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
  * `versionAsOf`). Filter pushdown is used ONLY for manifest-side file
  * pruning — partition values, per-file min/max stats, Bloom sidecars —
  * and `unhandledFilters` returns everything, so Spark plans the
  * row-level filter on top and correctness never depends on pruning.
  * [[InsertableRelation]] carries SQL `INSERT INTO` / `INSERT OVERWRITE`
  * over catalog-registered tables into the transactional append /
  * overwrite commits. */
final case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    versionAsOf: Option[Long]) extends BaseRelation with PrunedFilteredScan
    with InsertableRelation {

  private val table = ManagedTable(sqlContext.sparkSession, path)

  /** Always nullable-normalized: a later commit (merge null-fill, schema
    * drift) can relax any column, and a catalog-registered table compares
    * the stored schema against this one on every resolution — a
    * version-dependent nullability bit would spuriously fail that check. */
  override val schema: StructType = {
    val m = versionAsOf match {
      case Some(v) => table.readManifest(v).schema
      case None => table.manifest.map(_.schema).getOrElse(
        throw new IllegalArgumentException(s"no graft table at $path"))
    }
    GraftRelation.nullable(m)
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  /** Accurate relation size from manifest-recorded bytes (Delta reports
    * AddFile sizes the same way) — what lets Catalyst AUTO-BROADCAST a
    * small graft table in a join: the BaseRelation default is
    * `spark.sql.defaultSizeInBytes` (≈ Long.Max, "never broadcast"), so
    * without this every dimension-table join through `spark.table`
    * shuffles both sides. Falls back to the default when any entry
    * lacks a recorded size — a partial sum would under-report and
    * broadcast something huge. */
  override def sizeInBytes: Long = {
    val m = versionAsOf match {
      case Some(v) => scala.util.Try(table.readManifest(v)).toOption
      case None    => table.manifest
    }
    m.flatMap { mm =>
      val bs = mm.files.flatMap(_.bytes)
      if (bs.size == mm.files.size) Some(bs.sum) else None
    }.getOrElse(super.sizeInBytes)
  }

  /** SQL `INSERT INTO` (append commit) / `INSERT OVERWRITE` (atomic
    * overwrite commit, partitioning preserved). Time-travel relations
    * are read-only snapshots. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(versionAsOf.isEmpty,
      s"cannot INSERT into a time-travel snapshot of $path")
    val t = table
    // by-position semantics (Spark's INSERT contract): the analyzer has
    // already aligned and cast `data` to this relation's schema
    if (overwrite)
      t.overwriteAll(data, t.manifest.map(_.partitionColumns).getOrElse(Nil))
    else t.append(data)
  }

  /** The scan hands Spark the projected frame's INTERNAL row RDD
    * (`needConversion = false`): the default `df.rdd` path would
    * deserialize every row to external `Row` objects only for Spark to
    * convert them straight back — at 100 TB through `spark.table` that
    * double conversion is pure per-row overhead. */
  override def needConversion: Boolean = false

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val frame = versionAsOf match {
      case Some(v) => table.readVersion(v) // time travel: no stats pruning
      case None    => prunedCurrent(filters)
    }
    val projected =
      if (requiredColumns.isEmpty) frame
      else frame.select(requiredColumns.map(c => col(s"`$c`")).toSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** Conjunctive manifest-side file skipping from the pushed filters,
    * all against ONE snapshot (a commit landing mid-prune cannot mix
    * versions). Three pruning sources, each conservative — a file is
    * dropped only when it provably holds no matching row:
    *
    *  - partition columns: the filter decides per partition tuple
    *    driver-side (the 100 TB first line of defense — `day = X`
    *    through `format("graft")` never lists the other days' files);
    *  - data columns, point/IN: min/max stats + Bloom sidecars
    *    ([[ManagedTable.filesMightContainOf]]);
    *  - data columns, ranges: min/max stats, inclusive bounds for
    *    strict comparisons ([[ManagedTable.filesInRangeOf]]). */
  private def prunedCurrent(filters: Array[Filter]): DataFrame = {
    val m = table.manifest.getOrElse(
      throw new IllegalArgumentException(s"no graft table at $path"))
    val files = prunedFiles(m, filters)
    table.readManifestFiles(m, files)
  }

  /** The file subset of `m` surviving manifest-side skipping under
    * `filters` (package-visible so specs can assert pruning directly). */
  private[graft] def prunedFiles(
      m: graft.tables.Manifest, filters: Array[Filter]): Seq[graft.tables.TableFile] = {
    val partCols = m.partitionColumns.toSet
    def colOf(a: String) = col(s"`$a`")
    // lit() rejects exotic external types — then that filter prunes nothing
    def tryLit(v: Any): Option[org.apache.spark.sql.Column] =
      scala.util.Try(org.apache.spark.sql.functions.lit(v)).toOption
    def partSurvivors(c: org.apache.spark.sql.Column): Set[String] =
      table.filesWherePartitions(m, c).map(_.path).toSet
    // generated-column partition inference: base column (lowercased) →
    // (generated partition column, monotone evaluator) — see
    // [[graft.tables.GeneratedColumns]]
    val inferred: Map[String, Seq[(String, Any => Option[Any])]] =
      m.generated.toSeq.flatMap { case (g, e) =>
        if (!partCols(g)) Nil
        else graft.tables.GeneratedColumns
          .monotonicEval(sqlContext.sparkSession, e, m.schema)
          .map { case (b, f) => b.toLowerCase -> (g, f) }.toSeq
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def derived(a: String,
        per: ((String, Any => Option[Any])) => Option[Set[String]]): Seq[Set[String]] =
      inferred.getOrElse(a.toLowerCase, Nil).flatMap(per(_))
    val derivedSets: Seq[Set[String]] = filters.toSeq.flatMap {
      case EqualTo(a, v) => derived(a, { case (g, f) =>
        f(v).flatMap(gv => tryLit(gv).map(l => partSurvivors(colOf(g) === l))) })
      case In(a, vs) if vs.nonEmpty && !vs.contains(null) =>
        derived(a, { case (g, f) =>
          val gvs = vs.toSeq.map(f)
          if (gvs.exists(_.isEmpty)) None
          else {
            val ls = gvs.flatten.flatMap(tryLit)
            if (ls.size == gvs.size) Some(partSurvivors(colOf(g).isin(ls: _*)))
            else None
          } })
      case GreaterThan(a, v) => derived(a, { case (g, f) =>
        f(v).flatMap(gv => tryLit(gv).map(l => partSurvivors(colOf(g) >= l))) })
      case GreaterThanOrEqual(a, v) => derived(a, { case (g, f) =>
        f(v).flatMap(gv => tryLit(gv).map(l => partSurvivors(colOf(g) >= l))) })
      case LessThan(a, v) => derived(a, { case (g, f) =>
        f(v).flatMap(gv => tryLit(gv).map(l => partSurvivors(colOf(g) <= l))) })
      case LessThanOrEqual(a, v) => derived(a, { case (g, f) =>
        f(v).flatMap(gv => tryLit(gv).map(l => partSurvivors(colOf(g) <= l))) })
      case _ => Nil
    }
    val sets: Seq[Set[String]] = derivedSets ++ filters.toSeq.flatMap {
      // ---- partition columns: decided from manifest partition values
      case EqualTo(a, v) if partCols(a) =>
        tryLit(v).map(l => partSurvivors(colOf(a) === l))
      case In(a, vs) if partCols(a) && vs.nonEmpty && !vs.contains(null) =>
        val ls = vs.toSeq.flatMap(tryLit)
        if (ls.size == vs.length) Some(partSurvivors(colOf(a).isin(ls: _*)))
        else None
      case GreaterThan(a, v) if partCols(a) =>
        tryLit(v).map(l => partSurvivors(colOf(a) > l))
      case GreaterThanOrEqual(a, v) if partCols(a) =>
        tryLit(v).map(l => partSurvivors(colOf(a) >= l))
      case LessThan(a, v) if partCols(a) =>
        tryLit(v).map(l => partSurvivors(colOf(a) < l))
      case LessThanOrEqual(a, v) if partCols(a) =>
        tryLit(v).map(l => partSurvivors(colOf(a) <= l))
      // ---- data columns: stats (+ bloom for point/IN probes)
      case EqualTo(a, v) =>
        Some(table.filesMightContainOf(m, a, Seq(v)).map(_.path).toSet)
      case In(a, vs) if vs.exists(_ != null) =>
        // null never satisfies IN, so pruning by the non-null probes is exact
        Some(table.filesMightContainOf(m, a, vs.toSeq.filter(_ != null))
          .map(_.path).toSet)
      case GreaterThan(a, v) =>
        Some(table.filesInRangeOf(m, a, Some(v), None).map(_.path).toSet)
      case GreaterThanOrEqual(a, v) =>
        Some(table.filesInRangeOf(m, a, Some(v), None).map(_.path).toSet)
      case LessThan(a, v) =>
        Some(table.filesInRangeOf(m, a, None, Some(v)).map(_.path).toSet)
      case LessThanOrEqual(a, v) =>
        Some(table.filesInRangeOf(m, a, None, Some(v)).map(_.path).toSet)
      // ---- null-count skipping (footer-exact, conservative on unknown;
      // DV masks can only remove rows, never add nulls, so dropping a
      // zero-null / all-null file stays sound under masking)
      case IsNull(a) =>
        val key = m.physicalName(a)
        Some(m.files.filterNot(_.nullCounts.get(key).contains(0L))
          .map(_.path).toSet)
      case IsNotNull(a) =>
        val key = m.physicalName(a)
        Some(m.files.filterNot(f => f.rows.isDefined &&
            f.nullCounts.get(key).contains(f.rows.get))
          .map(_.path).toSet)
      case _ => None
    }
    if (sets.isEmpty) m.files
    else {
      val survivors = sets.reduce(_ intersect _)
      m.files.filter(f => survivors.contains(f.path))
    }
  }
}

object GraftRelation {
  /** Recursively drop NOT NULL from a schema (structs, arrays, maps). */
  private[graft] def nullable(st: StructType): StructType =
    StructType(st.fields.map(f => f.copy(dataType = nullableType(f.dataType),
      nullable = true)))

  private def nullableType(dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => nullable(s)
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = nullableType(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = nullableType(m.valueType), valueContainsNull = true)
    case other => other
  }
}

object GraftDataSource {
  /** `timestampAsOf` parse: epoch millis (all digits), else
    * `yyyy-MM-dd[ HH:mm:ss[.f]]` interpreted in the JVM's local
    * timezone (java.sql semantics — pass epoch millis for an
    * unambiguous instant). */
  private[graft] def parseTimestamp(s: String): Long = {
    val t = s.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
    else {
      val norm = t.replace('T', ' ')
      val full = if (norm.contains(' ')) norm else s"$norm 00:00:00"
      java.sql.Timestamp.valueOf(full).getTime
    }
  }
}
