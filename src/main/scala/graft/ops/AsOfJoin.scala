package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row with
  * `right.time <= left.time` within the same key. Spark has no native
  * operator for this (DuckDB/kdb do); the naive formulation is a range
  * join that explodes into O(L×R) per key.
  *
  * Implementation is the scalable union-window pattern:
  * {{{
  *   tag left/right → union → window per key ordered by (time, side)
  *   → last(right-row STRUCT, ignoreNulls) carries the most recent right
  *   row forward as one unit → keep left rows
  * }}}
  * ONE shuffle on the key (the window), no join explosion. The right row
  * travels as a struct so its columns can never mix across rows even when
  * individual right values are null. Right rows sort BEFORE left rows at
  * equal time, so equality means "right visible to left" (inclusive
  * as-of, matching `ASOF JOIN ... ON l.t >= r.t`).
  *
  * `right` must be unique per (key, time) — pre-aggregate if not; ties
  * would otherwise be carrier-order-dependent.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String]): DataFrame = {

    // input guards, mirroring RangeJoin.pointInInterval: reserved working
    // names or an output-name collision would silently produce duplicate
    // columns / wrong carries
    val reserved = Set("__key", "__time", "__side", "__r", "__asof")
    val usedReserved =
      (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(usedReserved.isEmpty,
      s"inputs must not contain reserved column(s): ${usedReserved.sorted.mkString(", ")}")
    val collisions = rightValueCols.map(c => s"asof_$c").filter(left.columns.contains)
    require(collisions.isEmpty,
      s"left already contains output column(s): ${collisions.sorted.mkString(", ")}")

    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValueCols.map { c =>
        val f = right.schema(c)
        org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = true)
      })

    val l = left
      .select(Seq(col(s"`$keyCol`").as("__key"),
        col(s"`$leftTimeCol`").as("__time"),
        lit(1).as("__side"), // left sorts after right at equal time
        lit(null).cast(rStructType).as("__r"))
        ++ leftCols.map(c => col(s"`$c`")): _*)

    val r = right
      .select(Seq(col(s"`$keyCol`").as("__key"),
        col(s"`$rightTimeCol`").as("__time"),
        lit(0).as("__side"),
        struct(rightValueCols.map(c => col(s"`$c`")): _*).as("__r"))
        ++ leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy("__key")
      .orderBy(col("__time"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // SQL join semantics for nulls: a null key or time never matches.
    // Null-keyed/timed RIGHT rows are dropped (they could match nothing);
    // null-keyed/timed LEFT rows bypass the window and keep null as-of
    // values (a windowed null key would otherwise "join" other null keys,
    // and a null right time would sort NULLS FIRST into every carry).
    val validL = l.filter(col("__key").isNotNull && col("__time").isNotNull)
    val validR = r.filter(col("__key").isNotNull && col("__time").isNotNull)
    val matched = validL.unionByName(validR)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"`$c`"))
        ++ rightValueCols.map(c => col(s"__asof.`$c`").as(s"asof_$c")): _*)
    val unmatched = l
      .filter(col("__key").isNull || col("__time").isNull)
      .select(leftCols.map(c => col(s"`$c`"))
        ++ rightValueCols.map(c => col(s"__r.`$c`").as(s"asof_$c")): _*)
    matched.unionByName(unmatched)
  }

  /** As-of join with a TOLERANCE bound (pandas `merge_asof` semantics,
    * which neither Spark nor DuckDB's ASOF has natively): the carried
    * right row must satisfy `right.time >= left.time - tolerance`, else
    * every as-of column is NULL — a stale quote/reference older than the
    * tolerance must not leak forward indefinitely. `tolerance` is a SQL
    * interval string ("30 minutes"). Same single-shuffle union-window
    * plan as [[asOf]]: the bound is a post-window null-out (the right
    * time travels in the carried struct), never a range-join condition. */
  def asOfWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      tolerance: String): DataFrame = {
    val carryT = !rightValueCols.contains(rightTimeCol)
    val withT = if (carryT) rightValueCols :+ rightTimeCol else rightValueCols
    val joined = asOf(left, right, keyCol, leftTimeCol, rightTimeCol, withT)
    val inRange = col(s"`asof_$rightTimeCol`") >=
      col(s"`$leftTimeCol`") - expr(s"INTERVAL $tolerance")
    // one select over the UN-modified frame: every null-out reads the
    // original carried time, including the carried time's own column
    val passthrough = joined.columns
      .filterNot(withT.map("asof_" + _).contains)
    val out = joined.select(
      passthrough.map(c => col(s"`$c`"))
        ++ withT.map(c => when(inRange, col(s"`asof_$c`")).as(s"asof_$c")): _*)
    if (carryT) out.drop(s"asof_$rightTimeCol") else out
  }
}
