package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Partition-filter INFERENCE for generated columns (Delta's generated-
  * column partition pruning): when a table's partition column `g` is
  * declared `GENERATED ALWAYS AS f(b)` for a recognized MONOTONE
  * single-column `f`, a pushed filter on the base column `b` implies a
  * filter on `g` —
  *
  *   b = v        ⇒  g = f(v)
  *   b ∈ {v…}     ⇒  g ∈ {f(v)…}
  *   b >(=) v     ⇒  g >= f(v)      (f monotone non-decreasing)
  *   b <(=) v     ⇒  g <= f(v)
  *
  * so `WHERE ts >= '2024-03-01'` prunes `day` partitions without the
  * query ever naming `day`. At 100 TB this is the difference between a
  * timestamp-range query scanning every partition and scanning only the
  * days it can touch.
  *
  * Recognized shapes (all floor-like, hence monotone non-decreasing):
  * `CAST(ts AS DATE)` / `to_date(ts)`, `date_trunc(fmt, ts)`,
  * `trunc(date, fmt)`, `year(ts|date)`, `substring(s, 1, n)` (prefix),
  * and `x div k` for a positive integer literal `k`. Everything else
  * infers nothing — inference is an optimization, never an arbiter, and
  * a shape we cannot prove monotone must not prune.
  */
object GeneratedColumns {

  /** When `ruleExpr` over `schema` is a recognized monotone single-column
    * shape, returns the base column name and an evaluator mapping an
    * EXTERNAL base value (as it appears in a pushed `sources.Filter`) to
    * the EXTERNAL generated value — `None` from the evaluator means "could
    * not evaluate, prune nothing". */
  def monotonicEval(spark: SparkSession, ruleExpr: String,
      schema: StructType): Option[(String, Any => Option[Any])] =
    try {
      val analyzed = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .select(expr(ruleExpr).as("__g")).queryExecution.analyzed
      val aliased = analyzed.expressions.collectFirst {
        case a: Alias => a.child
      }.getOrElse(return None)
      // to_date & friends are RuntimeReplaceable wrappers around Cast
      val e = aliased.transformUp {
        case r: RuntimeReplaceable => r.replacement
      }
      monotoneShape(e).map { case (attr, shaped) =>
        attr.name -> { (v: Any) =>
          try {
            val lit = Literal.create(v, attr.dataType)
            val bound = shaped.transformUp {
              case ar: AttributeReference if ar.exprId == attr.exprId => lit
            }
            Option(CatalystTypeConverters.convertToScala(
              bound.eval(null), shaped.dataType))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The attribute a recognized monotone shape is over, or None. Returns
    * the (possibly cast-wrapped) expression to evaluate alongside it. */
  private def monotoneShape(
      e: Expression): Option[(AttributeReference, Expression)] = e match {
    // CAST(ts AS DATE) — floor to day (also what to_date(ts) resolves to)
    case c: Cast if c.dataType == DateType =>
      attrThroughCasts(c.child).filter(a => timeLike(a.dataType)).map(_ -> e)
    // date_trunc(fmt, ts) — floor to the unit, any unit
    case t @ TruncTimestamp(f, tsE, _) if f.foldable =>
      attrThroughCasts(tsE).filter(a => timeLike(a.dataType)).map(_ -> t)
    // trunc(date, fmt)
    case t @ TruncDate(d, f) if f.foldable =>
      attrThroughCasts(d).map(_ -> t)
    // year(ts|date) — the analyzer wraps a timestamp child in CAST(… AS DATE)
    case y @ Year(d) => attrThroughCasts(d).map(_ -> y)
    // substring(s, 1, n) — prefix, monotone in lexicographic order
    case s @ Substring(a: AttributeReference, pos, len)
        if a.dataType == StringType && pos.foldable && len.foldable &&
          pos.eval(null) == 1 => Some(a -> s)
    // x div k, k a positive foldable divisor — truncating division by a
    // positive divisor is monotone non-decreasing (the analyzer casts both
    // sides to bigint)
    case d @ IntegralDivide(l, r, _) if r.foldable && positive(r) =>
      attrThroughCasts(l).map(_ -> d)
    case _ => None
  }

  /** Unwrap analyzer-inserted casts that are themselves monotone —
    * numeric widening and timestamp↔date — down to the attribute. */
  private def attrThroughCasts(e: Expression): Option[AttributeReference] =
    e match {
      case a: AttributeReference => Some(a)
      case c: Cast if monotoneCast(c.child.dataType, c.dataType) =>
        attrThroughCasts(c.child)
      case _ => None
    }

  /** WIDENING numeric coercions (what the analyzer inserts) and
    * timestamp↔date are monotone; a narrowing cast can overflow-wrap and
    * must not qualify. */
  private val integralOrder: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType)

  private def monotoneCast(from: DataType, to: DataType): Boolean = {
    val fi = integralOrder.indexOf(from)
    val ti = integralOrder.indexOf(to)
    if (timeLike(from) && timeLike(to)) true
    else if (fi >= 0 && ti >= 0) fi <= ti
    else if (fi >= 0) to == FloatType || to == DoubleType ||
      to.isInstanceOf[DecimalType]
    else from == FloatType && to == DoubleType
  }

  private def timeLike(t: DataType): Boolean = t match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  private def positive(l: Expression): Boolean =
    try l.eval(null) match {
      case n: java.lang.Number => n.longValue > 0
      case d: Decimal          => d.toLong > 0
      case _                   => false
    } catch { case scala.util.control.NonFatal(_) => false }
}
