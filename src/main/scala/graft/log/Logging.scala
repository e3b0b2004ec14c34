package graft.log

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}
import java.util.UUID
import scala.collection.mutable

import graft.pipeline.ProcessingSummary

/** Structured run logging (reference: src/main/scala/datalake/log/ —
  * DatalakeLogManager.scala:13-38, ParquetAppender.scala:54-140,
  * TableAppender.scala:104-155).
  *
  * Log rows are buffered on the driver and flushed as batched Parquet
  * appends so logging never blocks the processing job mid-flight: a flush
  * is one small Spark job, triggered at a row threshold or explicitly at
  * run end (the reference flushes from an async Log4j appender thread; we
  * keep the same buffer/threshold contract with a plain thread-safe
  * buffer — no Log4j plugin machinery needed for capability parity).
  */
object LogSchema {
  val fields: StructType = StructType(Seq(
    StructField("timestamp", TimestampNTZType),
    StructField("level", StringType),
    StructField("logger", StringType),
    StructField("message", StringType),
    StructField("run_id", StringType),
    StructField("entity_id", IntegerType),
    StructField("payload_json", StringType)))

  /** One log batch as a single-partition DataFrame — shared by both sinks
    * so the record-to-row mapping cannot diverge. */
  def toDataFrame(spark: SparkSession, batch: Vector[LogRecord]): DataFrame = {
    val rows = batch.map(r => Row(
      r.timestamp, r.level, r.logger, r.message, r.runId, r.entityId, r.payloadJson))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), fields)
  }
}

final case class LogRecord(
    timestamp: LocalDateTime,
    level: String,
    logger: String,
    message: String,
    runId: String,
    entityId: Int,
    payloadJson: String)

/** Buffered sink contract shared by the Parquet and catalog-table sinks:
  * rows accumulate on the driver and flush as one small Spark job at the
  * row threshold or explicitly at run end (reference buffer semantics:
  * ParquetAppender.scala:54-62,126-140). */
trait LogSink {
  protected def flushThreshold: Int
  protected def write(batch: Vector[LogRecord]): Unit

  private val buffer = mutable.ArrayBuffer.empty[LogRecord]
  // flush jobs serialize per sink: two concurrent append jobs into the
  // same output path share one FileOutputCommitter _temporary staging dir,
  // so a parallel flush could destroy the other's in-flight task files
  private val writeLock = new Object

  final def append(r: LogRecord): Unit = {
    val toFlush = buffer.synchronized {
      buffer += r
      if (buffer.size >= flushThreshold) {
        val batch = buffer.toVector; buffer.clear(); Some(batch)
      } else None
    }
    toFlush.foreach(b => writeLock.synchronized(write(b)))
  }

  final def flush(): Unit = {
    val toFlush = buffer.synchronized {
      if (buffer.isEmpty) None
      else { val batch = buffer.toVector; buffer.clear(); Some(batch) }
    }
    toFlush.foreach(b => writeLock.synchronized(write(b)))
  }

  final def pending: Int = buffer.synchronized(buffer.size)
}

/** Buffered Parquet log sink (reference: ParquetAppender.scala:84-117). */
final class ParquetLogSink(
    spark: SparkSession,
    path: String,
    protected val flushThreshold: Int = 10) extends LogSink {

  protected def write(batch: Vector[LogRecord]): Unit =
    LogSchema.toDataFrame(spark, batch).write.mode("append").parquet(path)

  def read(): DataFrame = spark.read.schema(LogSchema.fields).parquet(path)
}

/** Buffered CATALOG-TABLE log sink (reference: TableAppender.scala:104-155):
  * creates the database/table on first flush (`CREATE TABLE IF NOT EXISTS …
  * payload VARIANT`), stores the JSON payload as a Spark 4 `VARIANT`, and
  * appends via `insertInto` with an explicit reorder to the TABLE's column
  * order — `insertInto` binds by position, so a pre-existing table with a
  * different column arrangement must not silently shear values. */
final class TableLogSink(
    spark: SparkSession,
    val tableName: String,
    protected val flushThreshold: Int = 10) extends LogSink {

  import org.apache.spark.sql.functions.{col, parse_json}

  protected def write(batch: Vector[LogRecord]): Unit = {
    val df = LogSchema.toDataFrame(spark, batch)
      .withColumn("payload", parse_json(col("payload_json")))
      .drop("payload_json")
    df.select(tableColumns.map(df.col): _*).write.insertInto(tableName)
  }

  // once-only (lazy init is synchronized): the table layout is immutable
  // after creation, so DDL and column-order resolution run exactly once —
  // not a catalog lookup per flush — and concurrent first flushes cannot
  // race CREATE TABLE into LOCATION_ALREADY_EXISTS
  private lazy val tableColumns: Seq[String] = {
    val parts = tableName.split('.')
    // db part for db.table; catalog.db.table keeps its catalog qualifier
    // (reference handles both, TableAppender.ensureTableExists)
    val db = parts.length match {
      case 3 => Some(s"${parts(0)}.${parts(1)}")
      case 2 => Some(parts(0))
      case _ => None
    }
    db.foreach(d => spark.sql(s"CREATE DATABASE IF NOT EXISTS $d"))
    spark.sql(s"""CREATE TABLE IF NOT EXISTS $tableName (
      `timestamp` TIMESTAMP_NTZ, level STRING, logger STRING, message STRING,
      run_id STRING, entity_id INT, payload VARIANT) USING PARQUET""")
    spark.table(tableName).columns.toSeq
  }

  def read(): DataFrame = spark.table(tableName)
}

/** VARIANT-payload log table (reference: TableAppender.scala:128-155,
  * payload assembly ParquetAppender.scala:103-109): the JSON payload is
  * stored as a Spark 4 `VARIANT` column built with `parse_json`, giving
  * typed field access (`variant_get`) without a fixed payload schema. */
final class VariantLogSink(spark: SparkSession, path: String) {

  def append(df: DataFrame): Unit =
    df.withColumn("payload", parse_json(col("payload_json")))
      .drop("payload_json")
      .write.mode("append").parquet(path)

  def read(): DataFrame = spark.read.parquet(path)
}

/** Per-run logging context: run_id + summary serialization
  * (reference: DatalakeLogManager.scala:13-38). */
final class RunLogger(
    sink: LogSink,
    val runId: String = UUID.randomUUID().toString) {

  private def now(): LocalDateTime = LocalDateTime.now(ZoneOffset.UTC)

  def info(logger: String, message: String, entityId: Int = -1,
      payloadJson: String = "{}"): Unit =
    sink.append(LogRecord(now(), "INFO", logger, message, runId, entityId, payloadJson))

  def error(logger: String, message: String, entityId: Int = -1,
      payloadJson: String = "{}"): Unit =
    sink.append(LogRecord(now(), "ERROR", logger, message, runId, entityId, payloadJson))

  /** Structured ProcessingSummary log row — the reference's audit record. */
  def summary(s: ProcessingSummary): Unit = {
    val json =
      s"""{"strategy":"${s.strategy}","records_in_slice":${s.recordsInSlice},""" +
        s""""inserted":${s.inserted},"updated":${s.updated},"deleted":${s.deleted},""" +
        s""""unchanged":${s.unchanged},"touched":${s.touched},""" +
        s""""duration_ms":${s.durationMs}}"""
    sink.append(LogRecord(now(), "INFO", "graft.processing", "processing summary",
      runId, s.entityId, json))
  }

  def close(): Unit = sink.flush()
}

object RunLogger {
  val TimestampFormat: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
}
