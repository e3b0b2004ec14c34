package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: points × intervals with `lo <= p <= hi`, without
  * an equi key.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin — O(P×I)
  * work that dies at scale. Binning fixes it: each interval is exploded to
  * the bins it overlaps (≈ length/binWidth rows, usually a handful), each
  * point maps to exactly one bin, and the join becomes a plain hash
  * equi-join on the bin id followed by the exact range filter. Work is
  * O(P + I·bins + matches); bin width trades replication against bucket
  * selectivity and should approximate the typical interval length.
  */
object RangeJoin {

  /** `points ⋈ intervals ON lo <= point <= hi` (inclusive both ends).
    * Output: all point columns + all interval columns. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not contain a __bin column")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must have disjoint column names; shared: " +
        s"${shared.toSeq.sorted.mkString(", ")}")
    val p = points.withColumn("__bin", floor(col(s"`$pointCol`") / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(s"`$loCol`") / binWidth).cast("long"),
        floor(col(s"`$hiCol`") / binWidth).cast("long"))))
    p.join(i, "__bin")
      .filter(col(s"`$pointCol`") >= col(s"`$loCol`")
        && col(s"`$pointCol`") <= col(s"`$hiCol`"))
      .drop("__bin")
  }
}
