package graft.parse

import java.util.regex.Pattern
import graft.model.Event
import scala.collection.mutable

/** The `mutate` sub-operations (2,219 uses across the reference; SURVEY.md
  * §2.3 mutate row) as library functions over the Event, plus the `%{[a][b]}`
  * sprintf interpolator used by add_field
  * (ref: config/enrichments/90_lookup_iana_protocol.conf:23-25). */
object Mutate {
  private val sprintfRe = Pattern.compile("%\\{([^}]+)\\}")
  private val gsubCache = new java.util.concurrent.ConcurrentHashMap[String, Pattern]()

  /** sprintf interpolation: replace %{[a][b]} with the field's string value;
    * unresolvable refs keep the literal `%{...}` (Logstash behavior). */
  def sprintf(ev: Event, template: String): String = {
    if (template.indexOf("%{") < 0) return template
    val m = sprintfRe.matcher(template)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(template, last, m.start())
      // normalize the double-bracket form %{[[a][b]]} → [a][b] (same rule as
      // the dissect compiler; ref: syslog_security_guardium.db.conf:222-223)
      val raw = m.group(1)
      val ref =
        if (raw.startsWith("[[") && raw.endsWith("]]")) raw.substring(1, raw.length - 1)
        else raw
      ev.getString(ref).orElse(ev.getString(s"[$ref]")) match {
        case Some(v) => sb.append(v)
        case None => sb.append(m.group(0))
      }
      last = m.end()
    }
    sb.append(template, last, template.length)
    sb.toString
  }

  def addField(ev: Event, path: String, template: String): Unit = {
    val v = sprintf(ev, template)
    // add_field on an existing field promotes to array (Logstash semantics)
    if (ev.get(path).isDefined) ev.mergeInto(path, v) else ev.set(path, v)
  }

  /** Recursive key-downcasing of every top-level field except `ignore` —
    * the guardduty ruby normalizer (ref: api_security_aws.guardduty
    * .conf:19-56): keys lowercase at every depth, values untouched. */
  def deepDowncaseKeys(ev: Event, ignore: Set[String]): Unit = {
    def processValue(v: Any): Any = v match {
      case m: Event.FMap =>
        val out = new Event.FMap()
        m.forEach((k, x) => out.put(k.toLowerCase, processValue(x)))
        out
      case a: mutable.ArrayBuffer[Any @unchecked] =>
        val out = mutable.ArrayBuffer.empty[Any]
        a.foreach(x => out += processValue(x))
        out
      case other => other
    }
    val keys = new java.util.ArrayList[String](ev.root.keySet())
    keys.forEach { k =>
      if (!ignore.contains(k)) {
        val v = ev.root.remove(k)
        ev.root.put(k.toLowerCase, processValue(v))
      }
    }
  }

  def gsub(ev: Event, path: String, regex: String, replacement: String): Unit = {
    var p = gsubCache.get(regex)
    if (p == null) { p = Pattern.compile(regex); gsubCache.putIfAbsent(regex, p) }
    ev.get(path).foreach {
      case s: String => ev.set(path, p.matcher(s).replaceAll(replacement))
      case a: mutable.ArrayBuffer[Any @unchecked] =>
        var i = 0
        while (i < a.length) {
          a(i) match { case s: String => a(i) = p.matcher(s).replaceAll(replacement); case _ => () }
          i += 1
        }
      case _ => ()
    }
  }

  def strip(ev: Event, path: String): Unit = ev.get(path).foreach {
    case s: String => ev.set(path, s.trim)
    case a: mutable.ArrayBuffer[Any @unchecked] => // Logstash strips each element
      var i = 0
      while (i < a.length) {
        a(i) match { case s: String => a(i) = s.trim; case _ => () }
        i += 1
      }
    case _ => ()
  }

  /** Allocation-free when the value is already lowercase (the common case
    * after the first normalization pass). */
  private[graft] def lcFast(s: String): String = {
    var i = 0
    while (i < s.length && !Character.isUpperCase(s.charAt(i))) i += 1
    if (i == s.length) s else s.toLowerCase
  }

  def lowercase(ev: Event, path: String): Unit = ev.get(path).foreach {
    case s: String => { val l = lcFast(s); if (l ne s) ev.set(path, l) }
    case a: mutable.ArrayBuffer[Any @unchecked] =>
      var i = 0
      while (i < a.length) { a(i) match { case s: String => a(i) = lcFast(s); case _ => () }; i += 1 }
    case _ => ()
  }

  def uppercase(ev: Event, path: String): Unit = ev.get(path).foreach {
    case s: String => ev.set(path, s.toUpperCase)
    case _ => ()
  }

  /** mutate.split: string → array on separator
    * (ref: config/enrichments/12_related_user.conf idiom). */
  def splitField(ev: Event, path: String, sep: String): Unit = ev.get(path).foreach {
    case s: String =>
      val parts = mutable.ArrayBuffer.empty[Any]
      s.split(Pattern.quote(sep), -1).foreach(parts += _)
      ev.set(path, parts)
    case _ => ()
  }

  /** mutate.join: array → string. */
  def join(ev: Event, path: String, sep: String): Unit = ev.get(path).foreach {
    case a: mutable.ArrayBuffer[Any @unchecked] =>
      ev.set(path, a.map {
        case s: String => s
        case l: Long => l.toString
        case d: Double => Event.numToString(d)
        case x => String.valueOf(x)
      }.mkString(sep))
    case _ => ()
  }

  /** mutate.update: set only if the field already exists (20 uses). */
  def update(ev: Event, path: String, template: String): Unit =
    if (ev.get(path).isDefined) ev.set(path, sprintf(ev, template))

  /** mutate.replace: set unconditionally, sprintf-interpolated (18 uses). */
  def replace(ev: Event, path: String, template: String): Unit =
    ev.set(path, sprintf(ev, template))

  /** mutate.merge: `merge => { dest => added }` — the KEY is the
    * destination. Scalars/arrays concatenate (Array(dest) + Array(added));
    * a missing added field is a no-op; a missing dest becomes the added
    * values (Ruby Array(nil) == []).
    * (ref: api_security_azure.o365_dlp.conf:30-31 — where dest is the
    *  envelope BCC/CC field that a later remove_field deletes wholesale.) */
  def merge(ev: Event, destPath: String, addedPath: String): Unit =
    ev.get(addedPath).foreach { added =>
      def arr(v: Any): scala.collection.mutable.ArrayBuffer[Any] = v match {
        case a: scala.collection.mutable.ArrayBuffer[Any @unchecked] => a.clone()
        case x => scala.collection.mutable.ArrayBuffer[Any](x)
      }
      val out = ev.get(destPath) match {
        case Some(d) => arr(d) ++ arr(added)
        case None => arr(added)
      }
      ev.set(destPath, out)
    }

  /** mutate.convert: "integer" | "float" | "string" | "boolean". */
  def convert(ev: Event, path: String, typ: String): Unit = ev.get(path).foreach { v =>
    val out: Any = (typ, v) match {
      case ("integer", s: String) => s.trim.toLongOption.orElse(s.trim.toDoubleOption.map(_.toLong)).getOrElse(v)
      case ("integer", d: Double) => d.toLong
      case ("float", s: String) => s.trim.toDoubleOption.getOrElse(v)
      case ("float", l: Long) => l.toDouble
      case ("string", l: Long) => l.toString
      case ("string", d: Double) => Event.numToString(d)
      case ("string", b: Boolean) => b.toString
      case ("boolean", s: String) => if (s == "true") true else if (s == "false") false else v
      case _ => v
    }
    ev.set(path, out)
  }

  /** ruby `uniq` idiom: dedup an array field in place, preserving first-seen
    * order (ref: config/enrichments/12_related_user.conf:35-37). */
  def dedupArray(ev: Event, path: String): Unit = ev.get(path).foreach {
    case a: mutable.ArrayBuffer[Any @unchecked] =>
      val seen = mutable.LinkedHashSet.empty[Any]
      a.foreach(seen += _)
      a.clear(); a ++= seen
    case _ => ()
  }
}
