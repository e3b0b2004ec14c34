package graft.watermark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.metadata.WatermarkDef
import graft.tables.ManagedTable

/** Batch-incremental bookmark persistence: an append-only log in the system
  * area, latest-by-timestamp wins (reference:
  * src/main/scala/datalake/core/WatermarkData.scala:14-96). "Watermark" here
  * is the reference's meaning — max ingested value per (entity, column) —
  * not Spark's event-time watermark.
  *
  * Values are stored stringly with their JVM source type; `None$` is the
  * reset sentinel (reference: WatermarkData.scala:35-40,59,83).
  */
final class WatermarkStore(spark: SparkSession, systemPath: String) {

  import WatermarkStore._

  private val table = ManagedTable(spark, s"$systemPath/watermark")

  /** Persist observed watermark values. `None` values (empty slice /
    * all-null column) are SKIPPED, not written: an empty increment must
    * not destroy the stored bookmark (reference filters nulls the same
    * way — getWatermarkValues). Reset is only explicit via [[reset]].
    * `sourceTypes` records the observed JVM type per column (reference:
    * WatermarkData.scala:35-40 stores `value.getClass.getName`); values
    * themselves travel stringly. */
  def write(
      entityId: Int,
      values: Seq[(WatermarkDef, Option[String])],
      timestamp: String,
      sourceTypes: Map[String, String] = Map.empty): Unit =
    writeRows(values.collect { case (wm, Some(v)) =>
      (entityId, wm.columnName, timestamp,
        sourceTypes.getOrElse(wm.columnName, "java.lang.String"), v)
    })

  /** Explicit reset: stores the `None$` sentinel so [[lastValue]] returns
    * None until the next real value. */
  def reset(entityId: Int, columnName: String, timestamp: String): Unit =
    writeRows(Seq((entityId, columnName, timestamp, ResetSentinel, ResetSentinel)))

  private def writeRows(
      rows: Seq[(Int, String, String, String, String)]): Unit = {
    if (rows.isEmpty) return
    val data = rows.map { case (id, col, ts, typ, v) =>
      Row(id, col, java.time.LocalDateTime.parse(ts.replace(' ', 'T')), typ, v)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), Schema)
    table.appendOrCreate(df)
    // the bookmark log is append-only (one tiny file per run); without
    // periodic folding a long-lived deployment accumulates unbounded
    // files + manifest entries on its hottest system table. Amortized:
    // every CompactEvery appends, fold the log back to one file.
    if (table.manifest.exists(_.files.size >= WatermarkStore.CompactEvery))
      table.compact(minFiles = 2, targetFiles = 1)
  }

  /** Latest stored value for (entity, column); None if never written or
    * reset (reference: WatermarkData.scala:26-47). */
  def lastValue(entityId: Int, columnName: String): Option[String] = {
    if (!table.exists) return None
    val rows = table.read()
      .filter(col("entity_id") === entityId && col("column_name") === columnName)
      .orderBy(col("timestamp").desc)
      .select("value")
      .head(1)
    rows.headOption.map(_.getString(0)).filter(_ != ResetSentinel)
  }

  /** Evaluate a watermark expression against the stored value.
    *
    * The reference compiles these with a runtime Scala ToolBox
    * (reference: Expressions.scala:66-94, Watermark.scala:78-94); we
    * substitute the documented bindings and evaluate the result as a Spark
    * SQL scalar — a deliberate dialect change (SQL, not Scala) since
    * scala-compiler is not a safe cluster dependency. Bindings: last_value,
    * watermark (alias), b19_epoch_day / reflex_now (days since 1900-01-01).
    *
    * MIGRATION SHIM: reference metadata carries *Scala* expressions
    * (documented patterns — `LocalDate.parse('${last_value}')
    * .minusDays(7).toString()` and friends, docs/processing/
    * WATERMARKS.md:86-115). [[WatermarkScalaDialect.translate]] rewrites
    * those shapes into equivalent Spark SQL before evaluation, so
    * reference metadata runs unchanged. An expression that fails SQL
    * evaluation and LOOKS like untranslatable Scala logs one loud
    * warning per (column, expression) with a migration hint — without
    * it the watermark silently evals to None on EVERY run and the
    * incremental merge quietly degrades to a full-window rescan.
    * Failure → None, watermark skipped (reference: Watermark.scala:44-53).
    */
  def evaluateExpression(wm: WatermarkDef, lastValue: String): Option[String] = {
    val epochDay1900 = java.time.LocalDate.now()
      .toEpochDay - java.time.LocalDate.of(1900, 1, 1).toEpochDay
    // values are data-derived: escape backslashes (escape chars under the
    // default SQL parser mode) then quotes, so e.g. "C:\data\" or
    // "O'Brien" can't break (or inject into) the generated SQL
    val escaped = lastValue.replace("\\", "\\\\").replace("'", "''")
    val sqlExpr = WatermarkScalaDialect.translate(wm.expression)
      .getOrElse(wm.expression)
    val substituted = sqlExpr
      .replace("${last_value}", escaped)
      .replace("${watermark}", escaped)
      .replace("${b19_epoch_day}", epochDay1900.toString)
      .replace("${reflex_now}", epochDay1900.toString)
    try {
      val r = spark.sql(s"SELECT CAST(($substituted) AS STRING)").head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    } catch {
      case _: Exception =>
        WatermarkScalaDialect.warnIfScalaIsm(wm.columnName, wm.expression)
        None
    }
  }
}

/** Translates the reference's DOCUMENTED Scala watermark-expression
  * patterns (docs/processing/WATERMARKS.md:60-115; evaluated there via a
  * runtime ToolBox, Expressions.scala:66-94) into equivalent Spark SQL:
  *
  *  - `LocalDate.parse(X)[.plusDays(n)|.minusDays(n)|.plusWeeks|
  *    .minusWeeks|.plusMonths|.minusMonths|.plusYears|.minusYears]*
  *    .toString()` → date arithmetic over `CAST(X AS DATE)`
  *  - `LocalDateTime.parse(X[, defaultFormat])[.plusDays(n)|…|
  *    .minusHours(n)…]*.format(F)` / `.toString()` → interval arithmetic
  *    over `TO_TIMESTAMP(X[, fmt])` + `DATE_FORMAT`
  *  - `F` ∈ `DateTimeFormatter.ISO_LOCAL_DATE`, `ISO_LOCAL_DATE_TIME`,
  *    `defaultFormat` (the reference's `yyyy-MM-dd HH:mm:ss.S`),
  *    `DateTimeFormatter.ofPattern("…")` (pattern passed through —
  *    Java and Spark datetime patterns agree on y/M/d/H/m/s/S)
  *
  * Anything outside these shapes returns None (callers then evaluate
  * the expression as SQL, unchanged behavior). */
private[graft] object WatermarkScalaDialect {

  private val DefaultFormat = "yyyy-MM-dd HH:mm:ss.S"

  private val DateChain =
    ("""(?s)^\s*LocalDate\.parse\(\s*([^(),]*?)\s*\)""" +
      """((?:\.(?:plus|minus)(?:Days|Weeks|Months|Years)\(\s*\d+\s*\))*)""" +
      """\.toString\(\)\s*$""").r
  private val TimeChain =
    ("""(?s)^\s*LocalDateTime\.parse\(\s*([^(),]*?)\s*""" +
      """(?:,\s*defaultFormat\s*)?\)""" +
      """((?:\.(?:plus|minus)(?:Days|Weeks|Hours|Minutes|Seconds)\(\s*\d+\s*\))*)""" +
      """(?:\.format\(\s*(.*)\s*\)|\.toString\(\))\s*$""").r
  private val HasDefaultFormat = """LocalDateTime\.parse\([^)]*,\s*defaultFormat""".r
  private val Op = """\.(plus|minus)(Days|Weeks|Months|Years|Hours|Minutes|Seconds)\(\s*(\d+)\s*\)""".r

  def translate(expr: String): Option[String] = expr match {
    case DateChain(arg, ops) =>
      val base = s"CAST($arg AS DATE)"
      val folded = Op.findAllMatchIn(ops).foldLeft(base) { (acc, m) =>
        val sign = if (m.group(1) == "plus") 1 else -1
        val n = m.group(3).toInt
        m.group(2) match {
          case "Days"   => s"DATE_ADD($acc, ${sign * n})"
          case "Weeks"  => s"DATE_ADD($acc, ${sign * n * 7})"
          case "Months" => s"ADD_MONTHS($acc, ${sign * n})"
          case "Years"  => s"ADD_MONTHS($acc, ${sign * n * 12})"
        }
      }
      Some(s"CAST($folded AS STRING)")
    case TimeChain(arg, ops, fmt) =>
      val base =
        if (HasDefaultFormat.findFirstIn(expr).isDefined)
          s"TO_TIMESTAMP($arg, '$DefaultFormat')"
        else s"TO_TIMESTAMP($arg)"
      val folded = Op.findAllMatchIn(ops).foldLeft(base) { (acc, m) =>
        val op = if (m.group(1) == "plus") "+" else "-"
        val unit = m.group(2).toUpperCase // DAYS/WEEKS/HOURS/MINUTES/SECONDS
        s"($acc $op INTERVAL ${m.group(3)} $unit)"
      }
      val pattern = Option(fmt).map(_.trim) match {
        case None | Some("") =>
          // LocalDateTime.toString(): ISO local date-time
          Some("yyyy-MM-dd'T'HH:mm:ss")
        case Some("DateTimeFormatter.ISO_LOCAL_DATE") => Some("yyyy-MM-dd")
        case Some("DateTimeFormatter.ISO_LOCAL_DATE_TIME") =>
          Some("yyyy-MM-dd'T'HH:mm:ss")
        case Some("defaultFormat") => Some(DefaultFormat)
        case Some(p) =>
          val OfPattern = """DateTimeFormatter\.ofPattern\(\s*"([^"]*)"\s*\)""".r
          p match {
            case OfPattern(pat) => Some(pat)
            case _              => None // unknown formatter: not translatable
          }
      }
      pattern.map(p =>
        s"DATE_FORMAT($folded, '${p.replace("'", "''")}')")
    case _ => None
  }

  /** Does the (raw) expression look like the reference's Scala dialect?
    * Used only to decide whether a failed evaluation deserves a loud
    * migration warning. */
  private[graft] def looksLikeScala(expr: String): Boolean =
    Seq("LocalDate", "LocalDateTime", "DateTimeFormatter", ".toString()",
      ".format(", "defaultFormat").exists(expr.contains)

  private val warnedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  private[watermark] def warnIfScalaIsm(column: String, expr: String): Unit =
    if (looksLikeScala(expr) && warnedOnce.add((column, expr)))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"watermark expression for column '$column' failed SQL " +
          s"evaluation and looks like the reference's SCALA dialect: " +
          s"'$expr'. This engine evaluates watermark expressions as " +
          "Spark SQL (documented LocalDate/LocalDateTime patterns are " +
          "auto-translated; this one was not translatable). Until the " +
          "expression is migrated to SQL the watermark evaluates to " +
          "None on EVERY run and each incremental merge rescans the " +
          "full window — rewrite it, e.g. " +
          "date_sub(CAST('${last_value}' AS DATE), 7).")
}

object WatermarkStore {
  val ResetSentinel = "None$"

  /** Auto-compact the append-only bookmark log once it reaches this many
    * files (each processing run appends one). */
  val CompactEvery = 16

  /** JVM class name a column's max value would carry, from its Spark type —
    * the `source_type` the reference persists (WatermarkData.scala:35-40),
    * derived statically so no extra aggregation job runs. */
  def jvmTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType       => "java.lang.String"
      case IntegerType      => "java.lang.Integer"
      case LongType         => "java.lang.Long"
      case ShortType        => "java.lang.Short"
      case ByteType         => "java.lang.Byte"
      case DoubleType       => "java.lang.Double"
      case FloatType        => "java.lang.Float"
      case BooleanType      => "java.lang.Boolean"
      case DateType         => "java.sql.Date"
      case TimestampType    => "java.sql.Timestamp"
      case TimestampNTZType => "java.time.LocalDateTime"
      case _: DecimalType   => "java.math.BigDecimal"
      case _                => "java.lang.String"
    }
  }
  val Schema: StructType = StructType(Seq(
    StructField("entity_id", IntegerType),
    StructField("column_name", StringType),
    StructField("timestamp", TimestampNTZType),
    StructField("source_type", StringType),
    StructField("value", StringType)))
}
