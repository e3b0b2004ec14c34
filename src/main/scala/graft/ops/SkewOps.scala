package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single tasks.
  *
  * Spark's AQE skew-join split handles sort-merge joins at runtime; salting
  * is the explicit, planner-independent tool for the remaining cases
  * (e.g. broadcast-ineligible dimension joins against a heavy-hitter fact
  * key, or deterministic plans where AQE is disabled). The result is
  * row-identical to the plain join — only the partitioning changes.
  */
object SkewOps {

  /** Equi-join `facts ⋈ dims` on `key`, salted `salts` ways: the fact side
    * scatters each row to one of `salts` sub-keys; the dim side replicates
    * each row to all of them. A key holding 40% of the fact table becomes
    * `salts` tasks instead of one straggler. Inner joins only (replication
    * would duplicate outer-side misses). */
  def saltedJoin(
      facts: DataFrame, dims: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // the salt must be DETERMINISTIC per row: monotonically_increasing_id
    // (or rand) changes on recomputation after a fetch failure, routing
    // rows to reducers that already finished — silent loss/duplication
    // (the SPARK-23207 failure class). Hash of the full row is stable.
    val saltedFacts = facts.withColumn("__salt",
      pmod(hash(facts.columns.map(c => col(s"`$c`")): _*), lit(salts)))
    val saltedDims = dims
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFacts
      .join(saltedDims,
        saltedFacts(s"`$key`") === saltedDims(s"`$key`")
          && saltedFacts("__salt") === saltedDims("__salt"))
      .drop(saltedDims(s"`$key`"))
      .drop(saltedFacts("__salt"))
      .drop(saltedDims("__salt"))
  }

  /** Two-phase aggregation for high-cardinality-combine cases: a partial
    * aggregate on (key, salt) shrinks the shuffle before the final
    * aggregate on key. For algebraic aggregates Spark's hash aggregate
    * already does map-side partials — use this when the combine state is
    * heavy (e.g. collect_set of many values per hot key). */
  def saltedDistinctCount(
      df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.select(key.as("__k"), value.as("__v"))
      .withColumn("__salt", pmod(hash(col("__v")), lit(salts)))
      .groupBy("__k", "__salt")
      .agg(size(collect_set(col("__v"))).as("__partial"))
      .groupBy(col("__k").as("key"))
      .agg(sum("__partial").as("distinct_count"))
}
