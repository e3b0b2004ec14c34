package graft.pipeline

/** Names of the engine-generated system columns, with the
  * environment-configurable prefix (reference: Environment.scala:81-82;
  * column semantics per SURVEY §1.3). */
final case class SystemColumns(prefix: String) {
  val sourceHash: String = s"${prefix}SourceHash"
  val deleted: String = s"${prefix}deleted"
  val lastSeen: String = s"${prefix}lastSeen"
  val validFrom: String = s"${prefix}ValidFrom"
  val validTo: String = s"${prefix}ValidTo"
  val isCurrent: String = s"${prefix}IsCurrent"
  val sourceFilename: String = s"${prefix}source_filename"

  def all: Set[String] = Set(
    sourceHash, deleted, lastSeen, validFrom, validTo, isCurrent, sourceFilename)

  def isSystem(name: String, pkColumn: String): Boolean =
    all.contains(name) || name == pkColumn
}

object SystemColumns {
  /** SCD2 open-version sentinel (reference: Processing.scala:218). */
  val ValidToSentinel = "2999-12-31 00:00:00"
}
