package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column canonicalization for per-file NDV (distinct-count) sketches.
  *
  * Sketches are Apache DataSketches HLL built through Spark's own
  * `hll_sketch_agg` / `hll_union_agg` (bundled with Spark 4) — mergeable
  * across files, so a table-level NDV is a union over per-file sketches:
  * metadata-sized work however large the table. The agg accepts
  * int/long/string/binary only, so every other sketchable type is mapped
  * onto one of those, 1-1 on distinct values:
  *
  *  - integral widths ride as int/long (the widening-safe domain — a
  *    sketch built before an [[ManagedTable.alterColumnType]] widening
  *    keeps counting the same values after it);
  *  - boolean → long;
  *  - date/timestamp/float/double/decimal → canonical string rendering
  *    (deterministic in Spark; distinct values stay distinct — the one
  *    documented collapse is `-0.0` vs `0.0`, immaterial for stats).
  *
  * NULLs are skipped by the agg itself: NDV counts distinct non-null
  * values, matching `count(DISTINCT c)` semantics. */
private[tables] object NdvStats {

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
        DateType | TimestampType | TimestampNTZType | StringType |
        BinaryType | FloatType | DoubleType => true
    case _: DecimalType                    => true
    case _                                 => false
  }

  def canonical(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType => c.cast(IntegerType)
    case LongType | BooleanType             => c.cast(LongType)
    case StringType | BinaryType            => c
    case _                                  => c.cast(StringType)
  }

  /** `hll_sketch_agg` over the canonical domain. */
  def sketchAgg(c: Column, dt: DataType): Column =
    hll_sketch_agg(canonical(c, dt))
}
