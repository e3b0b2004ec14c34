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
    * Failure → None, watermark skipped (reference: Watermark.scala:44-53).
    */
  def evaluateExpression(wm: WatermarkDef, lastValue: String): Option[String] = {
    val epochDay1900 = java.time.LocalDate.now()
      .toEpochDay - java.time.LocalDate.of(1900, 1, 1).toEpochDay
    // values are data-derived: escape backslashes (escape chars under the
    // default SQL parser mode) then quotes, so e.g. "C:\data\" or
    // "O'Brien" can't break (or inject into) the generated SQL
    val escaped = lastValue.replace("\\", "\\\\").replace("'", "''")
    val substituted = wm.expression
      .replace("${last_value}", escaped)
      .replace("${watermark}", escaped)
      .replace("${b19_epoch_day}", epochDay1900.toString)
      .replace("${reflex_now}", epochDay1900.toString)
    try {
      val r = spark.sql(s"SELECT CAST(($substituted) AS STRING)").head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    } catch {
      case _: Exception => None
    }
  }
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
