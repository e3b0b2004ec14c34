package graft.outputs

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.metadata.{Entity, Metadata, PathLocation, TableLocation}

/** Orchestrator item generator (reference:
  * src/main/scala/datalake/outputs/datafactory.scala:29-52): serialize the
  * enabled entities selected by group / connection / id(s) into the JSON
  * item list an external orchestrator (e.g. a ForEach activity) iterates.
  * Driver-side only.
  */
object DataFactory {

  sealed trait Selector
  final case class ByGroup(group: String) extends Selector
  final case class ByConnection(connection: String) extends Selector
  final case class ByConnectionGroup(connection: String, group: String) extends Selector
  final case class ById(id: Int) extends Selector
  final case class ByIds(ids: Seq[Int]) extends Selector

  def getConfigItems(selector: Selector)(implicit metadata: Metadata): String = {
    val selected = selector match {
      case ByGroup(g)      => metadata.getEntitiesByGroup(g)
      case ByConnection(c) => metadata.getEntitiesByConnection(c)
      case ByConnectionGroup(c, g) =>
        metadata.getEntitiesByConnection(c).filter(_.group.equalsIgnoreCase(g))
      case ById(id)        => Seq(metadata.getEntity(id))
      case ByIds(ids)      => ids.map(metadata.getEntity)
    }
    val items = selected.filter(metadata.isEnabled).map(serialize(_, metadata))
    JsonMethods.compact(JsonMethods.render(JArray(items.toList)))
  }

  /** Emit resolved locations, mirroring the reference's EntitySerializer
    * (reference: Entity.scala:328-375). */
  private def serialize(e: Entity, metadata: Metadata): JObject = {
    val silver = metadata.silverLocation(e) match {
      case PathLocation(p)  => JObject("type" -> JString("path"), "value" -> JString(p))
      case TableLocation(t) => JObject("type" -> JString("table"), "value" -> JString(t))
    }
    JObject(
      "id" -> JInt(e.id),
      "name" -> JString(e.name),
      "destination" -> JString(e.destination),
      "connection" -> JString(e.connection),
      "group" -> JString(e.group),
      "processtype" -> JString(e.processType.name),
      "watermark" -> JArray(e.watermark.map(w => JString(w.columnName)).toList),
      "bronze_path" -> JString(metadata.bronzePath(e)),
      "silver" -> silver)
  }
}
