package graft.parse

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}
import graft.model.Event
import scala.collection.mutable

/** XML → nested fields — semantics of the Logstash `xml` filter's single
  * reference use (`force_array => false`,
  * ref: config/processors/syslog_audit_trellix.epo.conf:18-22):
  * child elements become nested maps, repeated siblings promote to arrays,
  * attributes become string fields, text-only elements become strings.
  * JDK DOM parser, external entities disabled (no network, no XXE).
  */
object Xml {
  private val factory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f
  }

  /** JAXP gives no thread-safety guarantee for DocumentBuilderFactory, and
    * the parse kernel runs this under mapPartitions with up to 32 threads —
    * one builder per thread, `reset()` per parse (also removes the
    * per-event newDocumentBuilder allocation from the hot path). */
  private val builders = ThreadLocal.withInitial[javax.xml.parsers.DocumentBuilder](
    () => factory.synchronized(factory.newDocumentBuilder()))

  private def elementToValue(el: Element): Any = {
    val children = el.getChildNodes
    val childMap = new Event.FMap()
    val text = new java.lang.StringBuilder
    var i = 0
    while (i < children.getLength) {
      children.item(i) match {
        case e: Element =>
          val v = elementToValue(e)
          childMap.get(e.getTagName) match {
            case a: mutable.ArrayBuffer[Any @unchecked] => a += v
            case null => childMap.put(e.getTagName, v)
            case prev => childMap.put(e.getTagName, mutable.ArrayBuffer[Any](prev, v))
          }
        case n if n.getNodeType == Node.TEXT_NODE || n.getNodeType == Node.CDATA_SECTION_NODE =>
          text.append(n.getNodeValue)
        case _ => ()
      }
      i += 1
    }
    val attrs = el.getAttributes
    i = 0
    while (i < attrs.getLength) {
      val a = attrs.item(i)
      childMap.put(a.getNodeName, a.getNodeValue)
      i += 1
    }
    val t = text.toString.trim
    if (childMap.isEmpty) t
    else {
      if (t.nonEmpty) childMap.put("#text", t)
      childMap
    }
  }

  /** Parse XML string field into `target`; malformed → `_xmlparsefailure`. */
  def apply(ev: Event, sourceField: String, target: String): Boolean = {
    ev.getString(sourceField) match {
      case None => false
      case Some(s) =>
        try {
          val b = builders.get()
          b.reset()
          val doc = b.parse(new org.xml.sax.InputSource(new java.io.StringReader(s)))
          ev.set(target, elementToValue(doc.getDocumentElement))
          true
        } catch { case _: Exception => ev.addTag("_xmlparsefailure"); false }
    }
  }
}
