package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve computation for multi-dimensional clustering.
  *
  * Linear clustering (`cluster_by` / `sortWithinPartitions`) makes file
  * min/max stats selective on ONE leading column; a query filtering on any
  * other column still scans every file. Z-ordering interleaves the bits of
  * several columns' quantile-bucket ids, so files cover a tight
  * hyper-rectangle in ALL clustered dimensions and [[ManagedTable.filesInRange]]
  * skips files for range predicates on any of them.
  *
  * Shape: one `approxQuantile` pass computes per-column bucket boundaries
  * (distributed sketch, driver gets 255 doubles per column); bucket
  * assignment + bit interleave are pure column algebra over broadcast
  * literal arrays — no shuffle beyond the final range partition, nothing
  * driver-side that grows with the data.
  */
object ZOrder {

  /** Buckets per dimension (8 bits). More bits sharpen locality but only
    * up to file granularity — 256 buckets is plenty for file-level stats. */
  val BitsPerColumn = 8

  /** Quantile-bucket boundaries (255 interior cut points) per column, from
    * one distributed sketch pass. Quantile buckets (not min/max scaling)
    * keep the curve balanced under skew: each bucket holds ~1/256 of the
    * rows regardless of the value distribution. */
  def boundaries(df: DataFrame, columns: Seq[String]): Map[String, Array[Double]] = {
    val probs = (1 until (1 << BitsPerColumn)).map(_.toDouble / (1 << BitsPerColumn))
    val projected = df.select(columns.zipWithIndex.map { case (c, i) =>
      numericView(df, c).as(s"__zq_$i")
    }: _*)
    val qs = projected.stat.approxQuantile(
      columns.indices.map(i => s"__zq_$i").toArray, probs.toArray, 0.001)
    columns.zip(qs.map(_.toArray)).toMap
  }

  /** A column's values in a totally-ordered double domain, for sketching
    * and bucketing. Types without a meaningful range order are rejected:
    * z-ordering them would silently produce useless clustering. */
  private[tables] def numericView(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    val field = df.schema.fields.find(_.name == c).getOrElse(
      throw new graft.metadata.MetadataException(s"zorder column '$c' not in schema"))
    field.dataType match {
      case _: NumericType => col(s"`$c`").cast("double")
      case DateType => datediff(col(s"`$c`"), lit("1970-01-01")).cast("double")
      // epoch MICROS, not seconds: sub-second-spaced data (event streams,
      // audit timestamps) must spread across buckets, and doubles hold
      // micros exactly well past year 2200 (2^53 µs ≈ 285 years)
      case TimestampType =>
        unix_micros(col(s"`$c`")).cast("double")
      case TimestampNTZType => // NTZ has no direct micros function; route via LTZ
        unix_micros(col(s"`$c`").cast(TimestampType)).cast("double")
      case other => throw new graft.metadata.MetadataException(
        s"zorder column '$c' has unordered type ${other.simpleString}; " +
          "z-order supports numeric, date, and timestamp columns")
    }
  }

  /** The Morton code: per-column bucket id from the precomputed boundaries
    * (count of cut points below the value — nulls land in bucket 0), then
    * bit i of column j interleaved to position `i * nCols + j`. */
  def zValue(df: DataFrame, bounds: Map[String, Array[Double]]): Column = {
    val cols = bounds.keys.toSeq.sorted
    val n = cols.size
    // n * BitsPerColumn bits must fit below the long sign bit: position 63
    // is Long.MIN_VALUE (sort-inverting) and 64+ wraps (shift mod 64),
    // silently corrupting the curve
    if (n < 1 || n * BitsPerColumn > 63)
      throw new graft.metadata.MetadataException(
        s"zorder supports 1..${63 / BitsPerColumn} columns, got $n")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val buckets = cols.map { c =>
      // bucket id = count of sorted boundaries strictly below v, via the
      // codegen'd binary-search expression (8 probes/row; an interpreted
      // 256-element lambda filter made the rewrite CPU-bound, and a
      // when-chain binary search duplicates its accumulator subtree
      // exponentially). Nulls coalesce to bucket 0.
      coalesce(
        call_function("graft_lower_bound", numericView(df, c),
          typedLit(bounds(c))),
        lit(0L))
    }
    (0 until BitsPerColumn).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        (shiftright(b, i) % 2) * lit(1L << (i * n + j))
      }
    }.reduce(_ + _)
  }
}
