package org.apache.spark.sql

/** The one `private[sql]` doorway a V1 streaming source needs: a
  * micro-batch DataFrame must carry `isStreaming = true` or
  * `MicroBatchExecution` rejects it, and the only constructor that sets
  * the flag (`classic.SparkSession.internalCreateDataFrame`) is
  * package-private to `sql`. Placing this single-method shim inside
  * `org.apache.spark.sql` is the established pattern for V1 connectors
  * (the alternative — re-implementing parquet decoding behind the DSv2
  * reader interfaces — would duplicate Spark's own scan for no
  * behavioral gain). Nothing else in this repository lives outside the
  * `graft` namespace. */
object GraftStreamingShim {

  /** Re-root `df`'s physical plan as a streaming DataFrame (lazy: the
    * underlying RDD is the query's own, nothing is materialized here). */
  def asStreaming(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch` frame: re-root the
    * incremental execution's physical plan as an ordinary batch
    * DataFrame. Writing the sink-provided frame directly would plan a
    * fresh query over streaming relations; this reuses the micro-batch's
    * own RDD. */
  def asBatch(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = false)
  }
}
