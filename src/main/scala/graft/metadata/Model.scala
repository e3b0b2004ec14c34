package graft.metadata

import org.apache.spark.sql.types._
import org.json4s._

/** Metadata model: the JSON-driven description of entities flowing
  * bronze→silver. Semantics follow the reference's model (reference:
  * src/main/scala/datalake/metadata/ — Entity.scala:28-43,
  * EntityColumn.scala:15-21, Connection.scala:21-41,
  * Environment.scala:15-105, Watermark.scala:16-74) re-expressed as plain
  * Scala case classes; all of this is driver-side and never touches
  * executors.
  */

sealed trait ProcessType { def name: String }
object ProcessType {
  case object Full extends ProcessType { val name = "full" }
  case object Merge extends ProcessType { val name = "merge" }
  case object Historic extends ProcessType { val name = "historic" }

  /** Legacy "delta" maps to Merge (reference: Entity.scala:113-122). */
  def parse(s: String): ProcessType = s.toLowerCase match {
    case "full"              => Full
    case "merge" | "delta"   => Merge
    case "historic"          => Historic
    case other => throw new ProcessStrategyNotSupportedException(
      s"Process type '$other' not supported (full|merge|delta|historic)")
  }
}

/** Column metadata. Field roles select pipeline behavior:
  * businesskey → PK hash input; partition → output partition column;
  * calculated → value comes from `expression`
  * (reference: EntityColumn.scala:15-21). */
final case class EntityColumn(
    name: String,
    newName: Option[String] = None,
    dataTypeName: Option[String] = None,
    fieldRoles: Seq[String] = Nil,
    expression: Option[String] = None) {

  def hasRole(role: String): Boolean = fieldRoles.exists(_.equalsIgnoreCase(role))
  def isBusinessKey: Boolean = hasRole("businesskey")
  def isPartition: Boolean = hasRole("partition")
  def isCalculated: Boolean = expression.exists(_.nonEmpty)

  /** Resolved column name after any rename. */
  def finalName: String = newName.filter(_.nonEmpty).getOrElse(name)

  /** Metadata type string → Spark DataType
    * (reference: EntityColumn.scala:49-77). */
  def dataType: Option[DataType] = dataTypeName.map(EntityColumn.parseDataType)
}

object EntityColumn {
  private val DecimalPattern = """(?i)decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  def parseDataType(s: String): DataType = s.trim.toLowerCase match {
    case "string"             => StringType
    case "integer" | "int"    => IntegerType
    case "long" | "bigint"    => LongType
    case "date"               => DateType
    case "timestamp"          => TimestampType
    case "float"              => FloatType
    case "double"             => DoubleType
    case "boolean"            => BooleanType
    case DecimalPattern(p, sc) => DecimalType(p.toInt, sc.toInt)
    case "decimal"            => DecimalType(38, 18) // missing precision default
    case _                    => StringType          // unknown → string (+ caller may warn)
  }
}

/** Incremental bookmark on one (entity, column): the pipeline records
  * max(column) per run; `expression` rewrites the stored value into the next
  * window's lower bound (reference: Watermark.scala:16-74). */
final case class WatermarkDef(
    columnName: String,
    operation: String = ">=",
    expression: String = "'${last_value}'")

/** Arbitrary metadata-supplied selectExpr projection step
  * (reference: EntityTransformation.scala:21-31). */
final case class EntityTransformation(expressions: Seq[String])

final case class Connection(
    name: String,
    enabled: Boolean = true,
    settings: JObject = JObject())

final case class Environment(
    name: String = "local",
    timezone: String = "UTC",
    rootFolder: String = "",
    rawPath: String = "${root_folder}/raw/${connection}/${entity}",
    bronzePath: String = "${root_folder}/bronze/${connection}/${entity}",
    silverPath: String = "${root_folder}/silver/${connection}/${destination}",
    systemFieldPrefix: String = "",
    secureContainerSuffix: String = "",
    settings: JObject = JObject()) {
  def systemPath: String = s"$rootFolder/system"
}

/** Where a silver table lives: a filesystem path or a catalog table
  * (reference: OutputMethod.scala:10-18). */
sealed trait OutputLocation
final case class PathLocation(path: String) extends OutputLocation
final case class TableLocation(table: String) extends OutputLocation

/** Predicate over entity columns by field role and/or calculated-ness
  * (reference: EntityColumnFilter.scala:3-8, applied at Entity.scala:107).
  * `fieldRoles` matches columns carrying ANY of the given roles. */
final case class EntityColumnFilter(
    fieldRoles: Option[Seq[String]] = None,
    hasExpression: Option[Boolean] = None) {
  def matches(c: EntityColumn): Boolean =
    fieldRoles.forall(rs => rs.exists(c.hasRole)) &&
      hasExpression.forall(_ == c.isCalculated)
}

object EntityColumnFilter {
  def apply(hasExpression: Boolean): EntityColumnFilter =
    EntityColumnFilter(fieldRoles = None, hasExpression = Some(hasExpression))
  def apply(fieldRoles: String*): EntityColumnFilter =
    EntityColumnFilter(fieldRoles = Some(fieldRoles), hasExpression = None)
}

final case class Entity(
    id: Int,
    name: String,
    enabled: Boolean = true,
    connection: String = "",
    group: String = "",
    destinationOverride: Option[String] = None,
    secure: Option[Boolean] = None,
    processType: ProcessType = ProcessType.Full,
    watermark: Seq[WatermarkDef] = Nil,
    columns: Seq[EntityColumn] = Nil,
    settings: JObject = JObject(),
    transformations: Seq[EntityTransformation] = Nil) {

  def destination: String = destinationOverride.filter(_.nonEmpty).getOrElse(name)
  def businessKeyColumns: Seq[String] = columns.filter(_.isBusinessKey).map(_.finalName)
  def partitionColumns: Seq[String] = columns.filter(_.isPartition).map(_.finalName)
  /** Normalized like every other column: the pipeline's final normalize
    * step renames all DataFrame columns, so an un-normalized destination
    * (e.g. "dbo.customers") would make the on-disk PK column silently
    * diverge from this name — breaking the duplicate-key guard and the
    * merge's key resolution. */
  def primaryKeyColumnName: String =
    s"PK_${graft.core.ColumnOps.normalizeName(destination)}"

  /** Secure entities live under suffixed bronze/silver containers
    * (reference: Entity.scala:84-85,197-206). */
  def isSecure: Boolean = secure.getOrElse(false)

  /** Columns matching `filter` (reference: Entity.scala:107). */
  def selectColumns(filter: EntityColumnFilter): Seq[EntityColumn] =
    columns.filter(filter.matches)

  def settingString(key: String): Option[String] = settings \ key match {
    case JString(s)  => Some(s)
    case JBool(b)    => Some(b.toString)
    case JInt(i)     => Some(i.toString)
    case JDouble(d)  => Some(d.toString)
    case _           => None
  }
  def settingBool(key: String, default: Boolean = false): Boolean =
    settings \ key match {
      case JBool(b)   => b
      case JString(s) => s.equalsIgnoreCase("true")
      case _          => default
    }
}

class MetadataException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)
class MetadataNotInitializedException(msg: String) extends MetadataException(msg)
class EntityNotFoundException(msg: String) extends MetadataException(msg)
class ConnectionNotFoundException(msg: String) extends MetadataException(msg)
class ProcessStrategyNotSupportedException(msg: String) extends MetadataException(msg)
class DuplicateBusinesskeyException(msg: String) extends MetadataException(msg)
class CalculatedColumnException(msg: String, cause: Throwable)
  extends MetadataException(msg, cause)
