package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the pipeline and the query surface.
  *
  * Semantics mirror the reference's system-column contract
  * (reference: src/main/scala/datalake/processing/Processing.scala:168-205 and
  * src/main/scala/datalake/core/implicits.scala:13-26) but are re-expressed as
  * plain Catalyst column expressions so they stay inside whole-stage codegen.
  */
object ColumnOps {

  /** Characters stripped from column names during normalization.
    * (reference: src/main/scala/datalake/core/implicits.scala:19) */
  private val NormalizePattern = "[ +\\-.,;{}()\\n\\t=]+"

  def normalizeName(name: String): String = name.replaceAll(NormalizePattern, "")

  /** Drop `sys_*` columns and regex-normalize remaining names.
    * (reference: src/main/scala/datalake/core/implicits.scala:13-26) */
  def normalize(df: DataFrame): DataFrame = {
    val kept = df.columns.filterNot(_.toLowerCase.startsWith("sys_"))
    // single select instead of a fold of withColumnRenamed: one projection node
    df.select(kept.map(c => col(s"`$c`").as(normalizeName(c))): _*)
  }

  /** SHA-256 change-detection hash over the given columns cast to string,
    * concatenated with an empty separator. `concat_ws` skips nulls — that
    * null-vs-empty-string collision is part of the reference contract
    * (reference: src/main/scala/datalake/processing/Processing.scala:168-182). */
  def sourceHash(cols: Seq[String]): Column =
    sha2(concat_ws("", cols.map(c => col(s"`$c`").cast("string")): _*), 256)

  /** SHA-256 business-key hash, `_`-joined
    * (reference: src/main/scala/datalake/processing/Processing.scala:185-205). */
  def primaryKeyHash(businessKeyCols: Seq[String]): Column =
    sha2(concat_ws("_", businessKeyCols.map(c => col(s"`$c`").cast("string")): _*), 256)

  /** Exact decimal-based sum, surfaced as double: associative (unlike a double
    * sum) so the result is partitioning-independent — required both for the
    * DuckDB oracle hash-compare and for run-to-run determinism on a cluster. */
  def exactSum(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")
}
