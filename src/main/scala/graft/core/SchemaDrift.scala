package graft.core

import org.apache.spark.sql.types.StructType

/** Name-based schema-drift detection between a slice and its silver target
  * (reference: src/main/scala/datalake/core/implicits.scala:28-59).
  *
  * Drift is informational: new source columns are tolerated (the merge
  * writes the target schema), missing source columns are fatal at merge
  * time (the table layer raises, naming the columns). This mirrors the
  * reference's warn-on-new / fail-on-missing contract.
  */
object SchemaDrift {

  sealed trait Kind { def label: String }
  case object NewColumn extends Kind { val label = "New" }
  case object MissingColumn extends Kind { val label = "Missing" }

  final case class Drift(column: String, kind: Kind)

  /** Columns present on one side only (case-insensitive name compare). */
  def compare(source: StructType, target: StructType): Seq[Drift] = {
    val src = source.fields.map(_.name).toSeq
    val tgt = target.fields.map(_.name).toSeq
    val srcLower = src.map(_.toLowerCase).toSet
    val tgtLower = tgt.map(_.toLowerCase).toSet
    src.filterNot(c => tgtLower.contains(c.toLowerCase)).map(Drift(_, NewColumn)) ++
      tgt.filterNot(c => srcLower.contains(c.toLowerCase)).map(Drift(_, MissingColumn))
  }

  def warnings(source: StructType, target: StructType): Seq[String] =
    compare(source, target).map(d => s"Schema drift: ${d.kind.label} column '${d.column}'")
}
