package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType, TimestampType}

import graft.metadata.MetadataException
import graft.tables.ManagedTable

/** Maintenance SQL over managed tables — the statements Delta adds to
  * Spark's grammar, intercepted by a delegating parser (the established
  * extension pattern for sub-grammars) and routed into the existing
  * maintenance API. Spark's own parser has none of these, so nothing is
  * shadowed; unmatched text falls through to the delegate verbatim.
  *
  * {{{
  *   VACUUM db.t [RETAIN 3 VERSIONS] [DRY RUN]
  *   OPTIMIZE db.t [ZORDER BY (c1, c2)]
  *   DESCRIBE HISTORY db.t
  *   RESTORE [TABLE] db.t [TO] VERSION AS OF 4
  *   CREATE MATERIALIZED VIEW v AS SELECT k, COUNT(*), SUM(x) FROM t GROUP BY k
  *   REFRESH MATERIALIZED VIEW v
  * }}}
  *
  * Targets are session-catalog graft tables (`db.t` / `t`) or direct
  * paths via the Delta-style escape ``graft.`/path/to/table` ``. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import MaintenanceSql._

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenancePlan(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object MaintenanceSql {

  private val Vacuum =
    """(?is)\s*VACUUM\s+(\S+|graft\.`[^`]+`)(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val VacuumHours =
    """(?is)\s*VACUUM\s+(\S+|graft\.`[^`]+`)\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+(\S+|graft\.`[^`]+`)(?:\s+(FULL))?(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r
  private val ClusterByCols =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+CLUSTER\s+BY\s*\(([^)]+)\)\s*;?\s*""".r
  private val ClusterByNone =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+CLUSTER\s+BY\s+NONE\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(\S+|graft\.`[^`]+`)\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?(\S+|graft\.`[^`]+`)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTs =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?(\S+|graft\.`[^`]+`)\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val CreateBloom =
    """(?is)\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?(\S+|graft\.`[^`]+`)\s+FOR\s+COLUMNS\s*\(([^)]+)\)\s*;?\s*""".r
  private val DropBloom =
    """(?is)\s*DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?(\S+|graft\.`[^`]+`)(?:\s+FOR\s+COLUMNS\s*\(([^)]+)\))?\s*;?\s*""".r
  private val Analyze =
    """(?is)\s*ANALYZE\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+(ALL\s+COLUMNS|COLUMNS\s+[\w\s,`]+?))?\s*;?\s*""".r
  private val Convert =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+parquet\.`([^`]+)`\s*;?\s*""".r
  private val Copy =
    """(?is)\s*COPY\s+INTO\s+(\S+|graft\.`[^`]+`)\s+FROM\s+'([^']+)'(?:\s+FILEFORMAT\s*=\s*(\w+))?\s*;?\s*""".r
  private val ShowParts =
    """(?is)\s*SHOW\s+PARTITIONS\s+(\S+|graft\.`[^`]+`)\s*;?\s*""".r
  private val Fsck =
    """(?is)\s*FSCK\s+REPAIR\s+TABLE\s+(\S+|graft\.`[^`]+`)(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+(\S+|graft\.`[^`]+`)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CREATE\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+(?:(SHALLOW|DEEP)\s+)?CLONE\s+(\S+|graft\.`[^`]+`)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val CloneTs =
    """(?is)\s*CREATE\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+(?:(SHALLOW|DEEP)\s+)?CLONE\s+(\S+|graft\.`[^`]+`)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val AddGenerated =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ADD\s+COLUMN\s+(\w+)\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*;?\s*""".r
  private val AddIdentity =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ADD\s+COLUMN\s+(\w+)\s+GENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY(?:\s*\(\s*START\s+WITH\s+(-?\d+)(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?\s*;?\s*""".r
  private val SyncIdentity =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+(?:CHANGE|ALTER)\s+COLUMN\s+(\w+)\s+SYNC\s+IDENTITY\s*;?\s*""".r
  private val SetNotNull =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+NOT\s+NULL\s*;?\s*""".r
  private val DropNotNull =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ALTER\s+COLUMN\s+(\w+)\s+DROP\s+NOT\s+NULL\s*;?\s*""".r
  private val DropGenerated =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+DROP\s+GENERATED\s+COLUMN\s+(\w+)\s*;?\s*""".r
  private val AddColumnDefault =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ADD\s+COLUMN\s+(\w+)\s+([A-Za-z0-9_]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s+DEFAULT\s+(.+?)\s*;?\s*""".r
  private val SetColumnDefault =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*""".r
  private val DropColumnDefault =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ALTER\s+COLUMN\s+(\w+)\s+DROP\s+DEFAULT\s*;?\s*""".r
  private val AlterColumnType =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([A-Za-z0-9_]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*;?\s*""".r
  private val Reorg =
    """(?is)\s*REORG\s+TABLE\s+(\S+|graft\.`[^`]+`)(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val EnableRowTracking =
    """(?is)\s*ALTER\s+TABLE\s+(\S+|graft\.`[^`]+`)\s+ENABLE\s+ROW\s+TRACKING\s*;?\s*""".r
  private val Generate =
    """(?is)\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+(\S+|graft\.`[^`]+`)\s*;?\s*""".r
  private val CreateMatview =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\S+|graft\.`[^`]+`)\s+AS\s+SELECT\s+(.+?)\s+FROM\s+(\S+|graft\.`[^`]+`)\s+GROUP\s+BY\s+(.+?)\s*;?\s*""".r
  private val RefreshMatview =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\S+|graft\.`[^`]+`)\s*;?\s*""".r

  private[plans] def maintenancePlan(sql: String): Option[LogicalPlan] =
    sql match {
      case VacuumHours(ident, hours, dry) =>
        Some(GraftVacuumCommand(ident, 0, dry != null,
          retainMs = (hours.toDouble * 3600 * 1000).toLong))
      case Vacuum(ident, retain, dry) =>
        Some(GraftVacuumCommand(ident,
          Option(retain).map(_.toInt).getOrElse(0), dry != null))
      case Optimize(ident, full, where, zorder) =>
        Some(GraftOptimizeCommand(ident, Option(zorder)
          .map(_.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq).getOrElse(Nil),
          Option(where).map(_.trim).filter(_.nonEmpty), full != null))
      case ClusterByNone(ident) => Some(GraftClusterByCommand(ident, Nil))
      case ClusterByCols(ident, cols) =>
        Some(GraftClusterByCommand(ident, splitCols(cols)))
      case History(ident) => Some(GraftHistoryCommand(ident))
      case Restore(ident, v) => Some(GraftRestoreCommand(ident, Right(v.toLong)))
      case RestoreTs(ident, ts) => Some(GraftRestoreCommand(ident, Left(ts)))
      case CreateBloom(ident, cols) =>
        Some(GraftBloomIndexCommand(ident, splitCols(cols), create = true))
      case DropBloom(ident, cols) =>
        Some(GraftBloomIndexCommand(ident,
          Option(cols).map(splitCols).getOrElse(Nil), create = false))
      case Detail(ident) => Some(GraftDetailCommand(ident))
      case Clone(dest, kind, srcT, v) =>
        // bare CLONE = deep, Delta's default; SHALLOW is the opt-in
        Some(GraftCloneCommand(dest, srcT, Option(v).map(_.toLong),
          shallow = Option(kind).exists(_.equalsIgnoreCase("shallow"))))
      case CloneTs(dest, kind, srcT, ts) =>
        Some(GraftCloneCommand(dest, srcT, None,
          shallow = Option(kind).exists(_.equalsIgnoreCase("shallow")),
          timestamp = Some(ts)))
      case AddConstraint(ident, cname, expr) =>
        Some(GraftAddConstraintCommand(ident, cname, expr.trim))
      case DropConstraint(ident, cname) =>
        Some(GraftDropConstraintCommand(ident, cname))
      case AddIdentity(ident, cname, kind, start, step) =>
        Some(GraftAddIdentityCommand(ident, cname,
          Option(start).map(_.toLong).getOrElse(1L),
          Option(step).map(_.toLong).getOrElse(1L),
          always = kind.equalsIgnoreCase("always")))
      case SyncIdentity(ident, cname) =>
        Some(GraftSyncIdentityCommand(ident, cname))
      // NOT NULL rides the CHECK-constraint machinery: add validates the
      // existing data with a limit-1 probe and every write path already
      // enforces constraints — no new enforcement code, and the rule is
      // visible/auditable as a named constraint
      case SetNotNull(ident, cname) =>
        Some(GraftAddConstraintCommand(ident, s"${cname}_not_null",
          s"`$cname` IS NOT NULL"))
      case DropNotNull(ident, cname) =>
        Some(GraftDropConstraintCommand(ident, s"${cname}_not_null"))
      case AddGenerated(ident, cname, expr) =>
        Some(GraftAddGeneratedCommand(ident, cname, expr.trim))
      case DropGenerated(ident, cname) =>
        Some(GraftDropGeneratedCommand(ident, cname))
      // ANALYZE TABLE is live Spark grammar for ordinary tables, so this
      // intercepts ONLY confirmed graft targets — anything else falls
      // through to Spark's own catalog-stats path untouched
      case Analyze(ident, forCols) if isGraftIdent(ident) =>
        Some(GraftAnalyzeCommand(ident, Option(forCols).map(fc =>
          if (fc.trim.toUpperCase.startsWith("ALL")) Nil
          else splitCols(fc.trim.replaceFirst("(?i)^COLUMNS\\s+", "")))))
      // SHOW PARTITIONS is live grammar for catalog tables — intercept
      // only confirmed graft targets, like ANALYZE
      case ShowParts(ident) if isGraftIdent(ident) =>
        Some(GraftShowPartitionsCommand(ident))
      case CreateMatview(dest, selectList, src, groupBy) =>
        Some(GraftCreateMatviewCommand(dest, selectList.trim, src,
          splitCols(groupBy)))
      case RefreshMatview(ident) => Some(GraftRefreshMatviewCommand(ident))
      case AddColumnDefault(ident, c, typ, dflt) =>
        Some(GraftAddColumnDefaultCommand(ident, c, typ, dflt))
      case SetColumnDefault(ident, c, dflt) =>
        Some(GraftColumnDefaultCommand(ident, c, Some(dflt)))
      case DropColumnDefault(ident, c) =>
        Some(GraftColumnDefaultCommand(ident, c, None))
      case AlterColumnType(ident, c, typ) =>
        Some(GraftAlterColumnTypeCommand(ident, c, typ))
      case Reorg(ident, where) => Some(GraftReorgCommand(ident,
        Option(where).map(_.trim).filter(_.nonEmpty)))
      case EnableRowTracking(ident) => Some(GraftEnableRowTrackingCommand(ident))
      case Generate(ident) => Some(GraftGenerateCommand(ident))
      case Fsck(ident, dry) => Some(GraftFsckCommand(ident, dry != null))
      case Convert(path) => Some(GraftConvertCommand(path))
      case Copy(ident, src, fmt) =>
        Some(GraftCopyIntoCommand(ident, src,
          Option(fmt).map(_.toLowerCase).getOrElse("parquet")))
      case _ => None
    }

  /** Parse-time guard for statements that shadow live Spark grammar:
    * true only when the active session can resolve `ident` to a graft
    * table right now. */
  private def isGraftIdent(ident: String): Boolean =
    SparkSession.getActiveSession.exists { s =>
      try { resolveGraft(s, ident); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }

  private def splitCols(s: String): Seq[String] =
    s.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).toSeq

  /** Resolve a statement target to its managed table: the Delta-style
    * path escape ``graft.`/path` `` directly, anything else through the
    * session catalog (must exist with provider `graft`). */
  private def resolveGraft(session: SparkSession, ident: String): ManagedTable = {
    val PathForm = """(?is)graft\.`([^`]+)`""".r
    ident match {
      case PathForm(p) => ManagedTable(session, p)
      case name =>
        resolveParts(session,
          name.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq)
    }
  }

  /** Same resolution for an already-split identifier (the analyzer's
    * `UnresolvedTable.multipartIdentifier`); `Seq("graft", "/path")` is
    * the path escape. */
  private[plans] def resolveParts(session: SparkSession,
      parts: Seq[String]): ManagedTable = {
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graft") &&
        (parts(1).contains("/") || parts(1).contains("\\")))
      return ManagedTable(session, parts(1))
    val ident = parts.mkString(".")
    val rest = if (parts.length == 3 &&
      parts.head.equalsIgnoreCase("spark_catalog")) parts.tail else parts
    val id = rest match {
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(t) => TableIdentifier(t)
      case _ => throw new MetadataException(
        s"graft maintenance SQL: cannot resolve table '$ident'")
    }
    val cat = session.sessionState.catalog
    if (!cat.tableExists(id)) throw new MetadataException(
      s"graft maintenance SQL: table '$ident' not found")
    val ct = cat.getTableMetadata(id)
    if (!ct.provider.exists(_.equalsIgnoreCase("graft")))
      throw new MetadataException(
        s"graft maintenance SQL: '$ident' is not a graft table " +
          s"(provider ${ct.provider.getOrElse("none")})")
    val mt = ManagedTable(session, ct.location.toString)
    // commits through this instance keep the catalog's stored schema and
    // cached relation in sync (DDL changes both)
    mt.catalogName = Some(rest.mkString("."))
    mt
  }

  /** Whether an analysis-time identifier names a graft table (without
    * throwing — non-graft targets must fall through to Spark). */
  private[plans] def isGraftTarget(session: SparkSession,
      parts: Seq[String]): Boolean =
    try { resolveParts(session, parts); true }
    catch { case _: MetadataException => false }

  private def attrs(fields: (String, org.apache.spark.sql.types.DataType)*):
      Seq[Attribute] =
    fields.map { case (n, t) => AttributeReference(n, t, nullable = false)() }

  /** `VACUUM` — horizon-publishing retention sweep via
    * [[ManagedTable.vacuum]]; `RETAIN n VERSIONS` pins a version count,
    * `RETAIN n HOURS` a time window (Delta's form — everything committed
    * inside it stays time-travelable); `DRY RUN` enumerates the blast
    * radius ([[ManagedTable.vacuumDryRun]]) without deleting, one path
    * per row like Delta. */
  final case class GraftVacuumCommand(
      ident: String, retainVersions: Int, dryRun: Boolean,
      retainMs: Long = 0L)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      if (dryRun) {
        val plan = t.vacuumDryRun(retainVersions, retainMs)
        (plan.dataDirs ++ plan.dvSidecars).map(Row(_))
      } else {
        t.vacuum(retainVersions, retainMs)
        Seq(Row(t.rootPath))
      }
    }
  }

  /** `OPTIMIZE [WHERE partitionPred] [ZORDER BY (...)]` — compaction or
    * Z-order re-cluster, partition-scoped when `WHERE` is given (Delta's
    * `OPTIMIZE … WHERE`: only matching partitions rewrite, everything
    * else carries verbatim). Metrics come from the maintenance commit's
    * own manifest record (zeros when the table was already optimal and
    * nothing committed). */
  final case class GraftOptimizeCommand(ident: String, zorderBy: Seq[String],
      where: Option[String] = None, full: Boolean = false)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType,
      "files_added" -> LongType, "files_removed" -> LongType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      val before = t.currentVersion
      if (zorderBy.nonEmpty) t.zorder(zorderBy, where = where.getOrElse(""))
      // a CLUSTER BY table's plain OPTIMIZE is the incremental
      // clustering pass (Delta liquid's contract); FULL re-clusters
      else if (t.clusterBy.nonEmpty)
        t.cluster(where.getOrElse(""), full = full)
      else where match {
        case Some(w) =>
          // scoped bin-pack toward the optimize target size; files already
          // at target carry verbatim
          val target = session.conf
            .get("spark.graft.optimize.targetBytes", (128L << 20).toString)
            .toLong
          t.compactSmall(smallBytes = target, targetBytes = target, where = w)
        case None => t.compact()
      }
      val m = t.manifest
      val committed = m.exists(mm => before.forall(_ < mm.version))
      val metrics = if (committed) m.map(_.metrics).getOrElse(Map.empty)
        else Map.empty[String, Long]
      Seq(Row(t.rootPath,
        metrics.getOrElse("filesAdded", 0L),
        metrics.getOrElse("filesRemoved", 0L)))
    }
  }

  /** `DESCRIBE HISTORY` — retained commits newest-first
    * ([[ManagedTable.history]]), Delta's audit surface. */
  final case class GraftHistoryCommand(ident: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType,
      "timestamp" -> TimestampType, "operation" -> StringType,
      "checkpoint" -> BooleanType)
    override def run(session: SparkSession): Seq[Row] =
      resolveGraft(session, ident).history().map(h =>
        Row(h.version, new java.sql.Timestamp(h.timestampMs), h.operation,
          h.checkpoint))
  }

  /** `ALTER TABLE … RENAME COLUMN a TO b` — metadata-only commit via
    * column mapping ([[ManagedTable.renameColumn]]); no file rewritten. */
  final case class GraftRenameColumnCommand(
      parts: Seq[String], column: String, newName: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveParts(session, parts).renameColumn(column, newName)
      Nil
    }
  }

  /** `ALTER TABLE … DROP COLUMN[S]` — metadata-only
    * ([[ManagedTable.dropColumn]]); `IF EXISTS` tolerates absence. */
  final case class GraftDropColumnsCommand(
      parts: Seq[String], columns: Seq[String], ifExists: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveParts(session, parts)
      columns.foreach { c =>
        val present = t.manifest.exists(
          _.schema.fieldNames.exists(_.equalsIgnoreCase(c)))
        if (present) t.dropColumn(c)
        else if (!ifExists) throw new MetadataException(
          s"DROP COLUMN $c: no such column on ${t.rootPath}")
      }
      Nil
    }
  }

  /** `ALTER TABLE … ADD COLUMN[S]` — appended nullable, existing files
    * read them as null ([[ManagedTable.addColumn]]). */
  final case class GraftAddColumnsCommand(
      parts: Seq[String],
      columns: Seq[(String, org.apache.spark.sql.types.DataType)])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveParts(session, parts)
      columns.foreach { case (n, dt) => t.addColumn(n, dt) }
      Nil
    }
  }

  /** `DESCRIBE DETAIL` — the one-struct table summary
    * ([[ManagedTable.detail]]): current version, file count, exact
    * metadata-only row count when every file carries one, bytes,
    * partitioning, latest operation. */
  final case class GraftDetailCommand(ident: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = true)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("partition_columns", StringType, nullable = false)(),
      AttributeReference("clustering_columns", StringType, nullable = false)(),
      AttributeReference("operation", StringType, nullable = false)(),
      AttributeReference("timestamp", TimestampType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val d = resolveGraft(session, ident).detail()
      Seq(Row(d.version, d.numFiles, d.rows.map(Long.box).orNull, d.sizeBytes,
        d.partitionColumns.mkString(","), d.clusteringColumns.mkString(","),
        d.operation, new java.sql.Timestamp(d.timestampMs)))
    }
  }

  /** `CREATE TABLE dest SHALLOW CLONE src [VERSION AS OF n]` — zero
    * bytes copied ([[ManagedTable.shallowCloneTo]]); a catalog dest name
    * lands in the warehouse layout and registers like any
    * TableLocation. */
  final case class GraftCloneCommand(
      dest: String, src: String, version: Option[Long],
      shallow: Boolean = true, timestamp: Option[String] = None)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("path", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val PathForm = """(?is)graft\.`([^`]+)`""".r
      val s = resolveGraft(session, src)
      // TIMESTAMP AS OF resolves against the SOURCE's commit history,
      // exactly as a time-travel read would
      val v = timestamp.fold(version)(ts =>
        Some(s.versionAt(graft.streaming.ChangeFeedStreamSource.parseTs(ts))))
      def clone(p: String) =
        if (shallow) s.shallowCloneTo(p, v) else s.deepCloneTo(p, v)
      val cloned = dest match {
        case PathForm(p) => clone(p)
        case name =>
          val plain = name.split('.').map(_.stripPrefix("`").stripSuffix("`"))
            .mkString(".")
          val loc = graft.metadata.TableLocation(plain)
          val target = ManagedTable.forLocation(session, loc)
          val cl = clone(target.rootPath)
          ManagedTable.forLocation(session, loc) // exists now → registers
          cl
      }
      Seq(Row(cloned.rootPath))
    }
  }

  /** `CREATE MATERIALIZED VIEW v AS SELECT keys…, COUNT(*) [AS cnt]
    * [, SUM(c) [AS sum_c]…] FROM src GROUP BY keys…` — an
    * incrementally-maintained aggregate ([[graft.tables.MaterializedAgg]]):
    * built once here, advanced by `REFRESH MATERIALIZED VIEW` reading
    * only the source rows that changed. The accepted SELECT shape is
    * exactly the maintainable one (group keys + COUNT(*) + SUMs); column
    * names in the view are canonical (`cnt`, `sum_<col>`) — an alias, if
    * given, must match. The source's row identity comes from its
    * `graft.cdc.keys` table property. */
  final case class GraftCreateMatviewCommand(
      dest: String, selectList: String, src: String, groupKeys: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("path", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val s = resolveGraft(session, src)
      val sourceKeys = s.properties.get("graft.cdc.keys")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new MetadataException(
          s"CREATE MATERIALIZED VIEW over ${s.rootPath}: the source needs " +
            "a declared row identity — ALTER TABLE … SET TBLPROPERTIES " +
            "('graft.cdc.keys' = 'id')"))
      val CountItem = """(?is)COUNT\s*\(\s*\*\s*\)(?:\s+AS\s+(\w+))?""".r
      val SumItem = """(?is)SUM\s*\(\s*`?([\w]+)`?\s*\)(?:\s+AS\s+(\w+))?""".r
      val MinItem = """(?is)MIN\s*\(\s*`?([\w]+)`?\s*\)(?:\s+AS\s+(\w+))?""".r
      val MaxItem = """(?is)MAX\s*\(\s*`?([\w]+)`?\s*\)(?:\s+AS\s+(\w+))?""".r
      var sawCount = false
      var plain = Vector.empty[String]
      var sums = Vector.empty[String]
      var mins = Vector.empty[String]
      var maxs = Vector.empty[String]
      def checkAlias(alias: String, want: String, what: String): Unit =
        if (alias != null && alias != want) throw new MetadataException(
          s"materialized view $what column is named $want, not $alias")
      selectList.split(",(?![^()]*\\))").map(_.trim).filter(_.nonEmpty)
        .foreach {
          case CountItem(alias) =>
            checkAlias(alias, "cnt", "count")
            sawCount = true
          case SumItem(c, alias) =>
            checkAlias(alias, s"sum_$c", s"sum($c)"); sums :+= c
          case MinItem(c, alias) =>
            checkAlias(alias, s"min_$c", s"min($c)"); mins :+= c
          case MaxItem(c, alias) =>
            checkAlias(alias, s"max_$c", s"max($c)"); maxs :+= c
          case item =>
            plain :+= item.stripPrefix("`").stripSuffix("`")
        }
      if (!sawCount) throw new MetadataException(
        "materialized views always maintain COUNT(*) — include it " +
          "(deletes must know when a group empties)")
      if (plain.sorted != groupKeys.sorted) throw new MetadataException(
        s"materialized view SELECT must project exactly the GROUP BY keys " +
          s"(got ${plain.mkString(", ")}; grouped by ${groupKeys.mkString(", ")})")
      val PathForm = """(?is)graft\.`([^`]+)`""".r
      def build(p: String) = {
        val mv = new graft.tables.MaterializedAgg(session, s,
          ManagedTable(session, p), sourceKeys, groupKeys, sums, mins, maxs)
        mv.refresh()
        mv
      }
      val mv = dest match {
        case PathForm(p) => build(p)
        case name =>
          val plainName = name.split('.')
            .map(_.stripPrefix("`").stripSuffix("`")).mkString(".")
          val loc = graft.metadata.TableLocation(plainName)
          val target = ManagedTable.forLocation(session, loc)
          val m = build(target.rootPath)
          ManagedTable.forLocation(session, loc) // exists now → registers
          m
      }
      Seq(Row(mv.view.rootPath))
    }
  }

  /** `REFRESH MATERIALIZED VIEW v` — advance the view to the source's
    * current version from its self-description, folding in only the
    * changed rows. Returns the source version now reflected. */
  final case class GraftRefreshMatviewCommand(ident: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("synced_source_version", LongType,
        nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val v = resolveGraft(session, ident)
      Seq(Row(graft.tables.MaterializedAgg.forView(session, v).refresh()))
    }
  }

  /** `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)` — manifest-
    * versioned CHECK constraint, enforced on every subsequent write
    * ([[ManagedTable.addConstraint]]: existing rows are validated with
    * one limit-1 probe first). Spark's grammar reserves this syntax for
    * V2 catalogs, so the sub-grammar parser owns it for graft targets. */
  final case class GraftAddConstraintCommand(
      ident: String, name: String, expression: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).addConstraint(name, expression)
      Nil
    }
  }

  /** `ALTER TABLE … DROP CONSTRAINT name`. */
  final case class GraftDropConstraintCommand(ident: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).dropConstraint(name)
      Nil
    }
  }

  /** `ALTER TABLE … ADD COLUMN c GENERATED ALWAYS AS (expr)` — declare a
    * generated-column rule ([[ManagedTable.addGeneratedColumn]]: existing
    * columns are validated, absent columns adopt on an empty table, typed
    * from the expression). Not Spark grammar, so the sub-grammar parser
    * owns it. */
  final case class GraftAddGeneratedCommand(
      ident: String, name: String, expression: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).addGeneratedColumn(name, expression)
      Nil
    }
  }

  /** `ALTER TABLE … DROP GENERATED COLUMN c` — drop the RULE only; the
    * column stays as an ordinary column. */
  final case class GraftDropGeneratedCommand(ident: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).dropGeneratedColumn(name)
      Nil
    }
  }

  /** `ALTER TABLE … ADD COLUMN c GENERATED ALWAYS AS IDENTITY [(START
    * WITH s [INCREMENT BY k])]` — engine-assigned unique BIGINT values
    * ([[ManagedTable.addIdentityColumn]]: watermark travels in the
    * manifest atomically with the rows it covers). */
  final case class GraftAddIdentityCommand(
      ident: String, name: String, start: Long, step: Long,
      always: Boolean = true)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).addIdentityColumn(name, start, step, always)
      Nil
    }
  }

  /** `ALTER TABLE t CHANGE COLUMN c SYNC IDENTITY` — advance the identity
    * watermark past explicit BY DEFAULT values (Delta's statement). */
  final case class GraftSyncIdentityCommand(ident: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).syncIdentity(name)
      Nil
    }
  }

  /** `ALTER TABLE … SET TBLPROPERTIES (k = v, …)` — manifest-versioned
    * per-table configuration ([[ManagedTable.setTableProperties]]);
    * `graft.*` keys override the matching `spark.graft.*` session conf
    * for this table. */
  final case class GraftSetPropertiesCommand(
      parts: Seq[String], props: Map[String, String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveParts(session, parts).setTableProperties(props)
      Nil
    }
  }

  /** `ALTER TABLE … UNSET TBLPROPERTIES (k, …)`. */
  final case class GraftUnsetPropertiesCommand(
      parts: Seq[String], keys: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      resolveParts(session, parts).unsetTableProperties(keys)
      Nil
    }
  }

  /** `SHOW TBLPROPERTIES t [(key)]` — read from the MANIFEST (the
    * catalog's stored properties are registration metadata, not the
    * table's versioned configuration). */
  final case class GraftShowPropertiesCommand(
      parts: Seq[String], propertyKey: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      attrs("key" -> StringType, "value" -> StringType)
    override def run(session: SparkSession): Seq[Row] = {
      val ps = resolveParts(session, parts).properties
      propertyKey match {
        case Some(k) => Seq(Row(k,
          ps.getOrElse(k, s"Table default.${parts.last} does not have property: $k")))
        case None => ps.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
      }
    }
  }

  /** `ANALYZE TABLE t COMPUTE STATISTICS` — backfill per-file min/max
    * stats and row counts into the MANIFEST
    * ([[ManagedTable.collectStatistics]]: distributed footer reads,
    * no-op when complete). For a graft table the manifest, not the
    * catalog entry, is what scans prune with and `fastCount` answers
    * from. */
  final case class GraftAnalyzeCommand(ident: String,
      forColumns: Option[Seq[String]] = None)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      t.collectStatistics()
      // FOR [ALL] COLUMNS additionally builds/tops-up the per-file NDV
      // sketches (incremental — new files only) and, for a
      // catalog-registered table, publishes CBO statistics
      forColumns.foreach { cols =>
        t.analyzeNdv(cols)
        t.publishCatalogStats(session)
      }
      Seq(Row(t.rootPath))
    }
  }

  /** `CONVERT TO GRAFT parquet.`/path`` — adopt an existing parquet
    * directory in place ([[ManagedTable.convertInPlace]]): footer stats
    * + hive partition dirs become manifest version 0, zero data moved. */
  final case class GraftConvertCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("files_adopted" -> LongType)
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(ManagedTable(session, path).convertInPlace().toLong))
  }

  /** `FSCK REPAIR TABLE t [DRY RUN]` — drop manifest references to data
    * files deleted out-of-band ([[ManagedTable.repairTable]]); one row
    * per dangling path, like Delta. */
  final case class GraftFsckCommand(ident: String, dryRun: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("removed_path" -> StringType)
    override def run(session: SparkSession): Seq[Row] =
      resolveGraft(session, ident).repairTable(dryRun).map(Row(_))
  }

  /** `ALTER TABLE t ADD COLUMN c type DEFAULT expr` — one metadata-only
    * commit; pre-existing rows read the default at scan time. */
  final case class GraftAddColumnDefaultCommand(ident: String, col: String,
      typ: String, default: String) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val dt = session.sessionState.sqlParser.parseDataType(typ)
      resolveGraft(session, ident).addColumnWithDefault(col, dt, default)
      Nil
    }
  }

  /** `ALTER TABLE t ALTER COLUMN c SET DEFAULT expr` / `DROP DEFAULT`. */
  final case class GraftColumnDefaultCommand(ident: String, col: String,
      default: Option[String]) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      default match {
        case Some(d) => t.setColumnDefault(col, d)
        case None    => t.dropColumnDefault(col)
      }
      Nil
    }
  }

  /** `REORG TABLE t [WHERE partitionPred] APPLY (PURGE)` — Delta's
    * deletion-vector materialization: rewrite every DV-carrying file in
    * scope to its live rows and drop the masks
    * ([[ManagedTable.purgeDeletionVectors]]). Returns the purged file
    * count. */
  final case class GraftReorgCommand(ident: String, where: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("path" -> StringType,
      "files_purged" -> LongType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      val before = t.manifest.map(_.files.count(_.dv.isDefined)).getOrElse(0)
      t.purgeDeletionVectors(where.getOrElse(""))
      val after = t.manifest.map(_.files.count(_.dv.isDefined)).getOrElse(0)
      Seq(Row(t.rootPath, (before - after).toLong))
    }
  }

  /** `ALTER TABLE t CLUSTER BY (c1, c2)` / `CLUSTER BY NONE` — declare
    * (or drop) liquid-style clustering columns; plain `OPTIMIZE` then
    * runs the incremental clustering pass. */
  final case class GraftClusterByCommand(ident: String, cols: Seq[String])
      extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      if (cols.isEmpty) t.clearClusterBy() else t.setClusterBy(cols)
      Nil
    }
  }

  /** `ALTER TABLE t ALTER COLUMN c TYPE wider-type` — metadata-only
    * lossless type widening (Delta's type-widening feature). */
  final case class GraftAlterColumnTypeCommand(ident: String, col: String,
      typ: String) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val dt = session.sessionState.sqlParser.parseDataType(typ)
      resolveGraft(session, ident).alterColumnType(col, dt)
      Nil
    }
  }

  /** `ALTER TABLE t ENABLE ROW TRACKING` (Delta's
    * `delta.enableRowTracking` TBLPROPERTY, as a first-class statement
    * because the property is engine-maintained here). */
  final case class GraftEnableRowTrackingCommand(ident: String)
      extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      resolveGraft(session, ident).enableRowTracking()
      Nil
    }
  }

  /** `GENERATE symlink_format_manifest FOR TABLE t` (Delta's GENERATE). */
  final case class GraftGenerateCommand(ident: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("manifest_path" -> StringType)
    override def run(session: SparkSession): Seq[Row] =
      resolveGraft(session, ident).generateSymlinkManifest().map(Row(_))
  }

  /** `TRUNCATE TABLE t` routed away from Spark's directory-clearing V1
    * path into [[ManagedTable.truncate]]: one metadata-only commit drops
    * every file; the transaction log, history, and time travel survive. */
  final case class GraftTruncateCommand(parts: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("num_removed_rows" -> LongType)
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(resolveParts(session, parts).truncate()))
  }

  /** `SHOW PARTITIONS t` — the distinct partition tuples, straight from
    * the manifest (metadata-only, Spark's `k=v/k2=v2` row format; no
    * directory listing, no scan). */
  final case class GraftShowPartitionsCommand(ident: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("partition" -> StringType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      val m = t.manifest.getOrElse(return Nil)
      if (m.partitionColumns.isEmpty)
        throw new MetadataException(
          s"SHOW PARTITIONS: table '${t.rootPath}' is not partitioned")
      m.files.map(_.partitionValues).distinct
        .map(pv => m.partitionColumns.map(c =>
          s"$c=${pv.getOrElse(c, null)}").mkString("/"))
        .sorted.map(Row(_))
    }
  }

  /** `COPY INTO t FROM '/src' [FILEFORMAT = PARQUET]` — idempotent
    * incremental bulk load ([[graft.tables.CopyInto]]): only files not
    * loaded by a previous COPY INTO from the same directory load, exactly
    * once. Returns the rows this invocation appended. */
  final case class GraftCopyIntoCommand(ident: String, sourceDir: String,
      format: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("num_inserted_rows" -> LongType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      Seq(Row(graft.tables.CopyInto(session, t.rootPath, sourceDir, format)))
    }
  }

  /** `RESTORE … VERSION AS OF n | TIMESTAMP AS OF 'ts'` — roll back as a
    * new commit, no data copy ([[ManagedTable.restore]]; a timestamp
    * resolves to the newest version at or before the instant). */
  final case class GraftRestoreCommand(
      ident: String, target: Either[String, Long])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("restored_version" -> LongType)
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      val version = target match {
        case Right(v) => v
        case Left(ts) =>
          t.versionAt(graft.streaming.ChangeFeedStreamSource.parseTs(ts))
      }
      t.restore(version)
      Seq(Row(version))
    }
  }

  /** `CREATE BLOOMFILTER INDEX ON t FOR COLUMNS (c, …)` /
    * `DROP BLOOMFILTER INDEX ON t [FOR COLUMNS (…)]` — Delta's
    * BLOOMFILTER index surface over the per-file Bloom sidecars
    * ([[ManagedTable.addBloomIndex]]: built distributed, backfilled for
    * existing files, consulted by point/IN scans and the keyed MERGE
    * touch-detect probe). DROP without columns drops every index. */
  final case class GraftBloomIndexCommand(
      ident: String, columns: Seq[String], create: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      val t = resolveGraft(session, ident)
      if (create) columns.foreach(c => t.addBloomIndex(c))
      else {
        val cols = if (columns.nonEmpty) columns
          else t.bloomIndexes.keys.toSeq
        cols.foreach(t.dropBloomIndex)
      }
      Nil
    }
  }

  /** `table_changes('db.t' | '/path', fromVersion, toVersion [, 'k1,k2'])`
    * — Delta CDF's SQL table-valued function over the row-level change
    * feed ([[ManagedTable.rowChanges]] with preimage pairs). The key
    * columns identify rows across the interval (the merge PK); the
    * 3-argument form reads them from the `graft.cdc.keys` table property
    * instead, so pipelines can declare the key once
    * (`ALTER TABLE t SET TBLPROPERTIES ('graft.cdc.keys' = 'id')`). The
    * feed is the interval diff of the two manifest snapshots — no stored
    * change files, cost O(changed-file rows). */
  private[graft] def tableChangesPlan(args: Seq[Expression]): LogicalPlan = {
    val session = SparkSession.active
    def str(e: Expression, what: String): String = e match {
      case lit if lit.foldable =>
        Option(lit.eval(null)).map(_.toString).getOrElse(
          throw new MetadataException(s"table_changes: $what is null"))
      case other => throw new MetadataException(
        s"table_changes: $what must be a literal, got ${other.sql}")
    }
    def lng(e: Expression, what: String): Long = str(e, what).toLong
    if (args.length < 3 || args.length > 4)
      throw new MetadataException(
        "table_changes(table, fromVersion, toVersion [, keyCols]) takes " +
          s"3 or 4 arguments, got ${args.length}")
    val ident = str(args.head, "table")
    val t =
      if (ident.contains("/") || ident.contains("\\"))
        ManagedTable(session, ident)
      else resolveParts(session, ident.split('.').toSeq)
    val keys: Seq[String] =
      if (args.length == 4) splitCols(str(args(3), "keyCols"))
      else t.properties.get("graft.cdc.keys")
        .map(splitCols).filter(_.nonEmpty).getOrElse(
          throw new MetadataException(
            s"table_changes('$ident', from, to): no key columns — pass " +
              "them as the 4th argument or set the 'graft.cdc.keys' " +
              "table property"))
    t.rowChanges(lng(args(1), "fromVersion"), lng(args(2), "toVersion"),
      keys, includePreimages = true).queryExecution.logical
  }
}
