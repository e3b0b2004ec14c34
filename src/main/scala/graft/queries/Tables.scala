package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst handles column pruning + predicate
  * pushdown into the scan — at 100 TB these become partitioned/bucketed
  * reads with the same call shape.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by Verify/Bench).
    * Convert to a microsecond timestamp — the same truncation DuckDB applies
    * on read, so oracle comparisons line up. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = apply(spark, sfDir, "events")
    if (df.schema("ts").dataType == LongType)
      // cast to NTZ (session is UTC): matches the naive TIMESTAMP DuckDB
      // produces, and the NTZ type Spark infers for the other tables.
      // DIV, not `/`: epoch nanos exceed 2^53, so double division can be
      // off by one micro vs DuckDB's exact integer truncation on read
      df.withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
