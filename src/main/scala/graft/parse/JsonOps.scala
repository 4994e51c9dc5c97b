package graft.parse

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import graft.model.Event
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** JSON parse/encode into the schemaless Event — semantics of the Logstash
  * `json` (204 uses) and `json_encode` filters (SURVEY.md §2.3):
  *  - `json { source, target }` parses a JSON string field into nested fields
  *    (ref: config/processors/event_hub_audit_azure.event_hub_signin.conf:16-19)
  *  - without `target`, fields merge into the event root
  *  - `json_encode { source, target }` re-serializes a subtree to a string
  *    (ref: same file:26-29, regenerating `message` after the records[] split)
  *
  * Jackson ships with Spark (/opt/spark/jars/jackson-databind); one
  * ObjectMapper per JVM.
  */
object JsonOps {
  private val mapper = new ObjectMapper()

  private def toEventValue(n: JsonNode): Any = n.getNodeType match {
    case JsonNodeType.OBJECT =>
      val m = new Event.FMap()
      n.properties().asScala.foreach(e => m.put(e.getKey, toEventValue(e.getValue)))
      m
    case JsonNodeType.ARRAY =>
      val a = mutable.ArrayBuffer.empty[Any]
      n.elements().asScala.foreach(e => a += toEventValue(e))
      a
    case JsonNodeType.STRING => n.asText()
    case JsonNodeType.NUMBER =>
      if (n.isIntegralNumber && n.canConvertToLong) n.asLong() else n.asDouble()
    case JsonNodeType.BOOLEAN => n.asBoolean()
    case _ => null
  }

  /** Parse; on malformed JSON appends `_jsonparsefailure` (plugin semantics). */
  def parse(ev: Event, source: String, target: String = ""): Boolean = {
    ev.getString(source) match {
      case None => false
      case Some(s) =>
        try {
          val node = mapper.readTree(s)
          if (node == null || (!node.isObject && !node.isArray)) { ev.addTag("_jsonparsefailure"); return false }
          val v = toEventValue(node)
          if (target.nonEmpty) ev.set(target, v)
          else v match {
            case m: Event.FMap =>
              m.forEach((k, x) => ev.root.put(k, x))
            case _ => ev.addTag("_jsonparsefailure"); return false
          }
          true
        } catch { case _: Exception => ev.addTag("_jsonparsefailure"); false }
    }
  }

  def encodeValue(v: Any): String = {
    val node = toJson(v)
    mapper.writeValueAsString(node)
  }

  private def toJson(v: Any): JsonNode = v match {
    case m: Event.FMap =>
      val o = mapper.createObjectNode()
      m.forEach((k, x) => o.set[JsonNode](k, toJson(x)))
      o
    case a: mutable.ArrayBuffer[Any @unchecked] =>
      val arr = mapper.createArrayNode()
      a.foreach(x => arr.add(toJson(x)))
      arr
    case s: String => mapper.getNodeFactory.textNode(s)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case null => mapper.getNodeFactory.nullNode()
    case other => mapper.getNodeFactory.textNode(other.toString)
  }

  /** json_encode: serialize subtree at `source` into string field `target`. */
  def encode(ev: Event, source: String, target: String): Boolean = {
    ev.get(source) match {
      case None => false
      case Some(v) => ev.set(target, encodeValue(v)); true
    }
  }
}
