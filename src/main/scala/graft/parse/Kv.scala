package graft.parse

import graft.model.Event
import scala.collection.mutable

/** Key-value tokenizer — semantics of the Logstash `kv` filter as used by the
  * ported processors (SURVEY.md §2.3 kv row):
  *  - `field_split` single-char pair separator, `value_split` single-char k/v
  *    separator (ref: config/processors/syslog_security_palo.alto.fw.conf:116-122
  *    field_split ";" value_split "=")
  *  - `target` prefix path (captures land under it)
  *  - `trim_key` set of chars stripped from both ends of keys
  *    (ref: same file `trim_key => "$ "`)
  *  - duplicate keys promote scalar→array (scalar⇄array duality); with
  *    `allow_duplicate_values => false` equal values are deduped
  *    (ref: config/enrichments/93_mitre.conf:31-37)
  */
object Kv {
  def apply(ev: Event, sourceField: String, fieldSplit: Char, valueSplit: Char,
            target: String = "", trimKey: String = "", trimValue: String = "",
            allowDuplicateValues: Boolean = true,
            transformKeyLowercase: Boolean = false): Boolean = {
    val in = ev.getString(sourceField)
    if (in.isEmpty) return false
    val s = in.get
    val targetParts = if (target.isEmpty) Vector.empty[String] else Event.parsePath(target)
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf(fieldSplit, start)
      if (end < 0) end = n
      if (end > start) {
        val vs = s.indexOf(valueSplit, start)
        if (vs >= 0 && vs < end) {
          val key0 = trim(s.substring(start, vs), trimKey)
          // `transform_key => "lowercase"` (ref: syslog_securityonion_
          // securityonion.zeek.conf:236-244 x509 distinguished-name kv)
          val key = if (transformKeyLowercase) key0.toLowerCase else key0
          val value = trim(s.substring(vs + 1, end), trimValue)
          if (key.nonEmpty) {
            val path = targetParts :+ key
            ev.getParts(path) match {
              case None => ev.setParts(path, value)
              case Some(a: mutable.ArrayBuffer[Any @unchecked]) =>
                if (allowDuplicateValues || !a.contains(value)) a += value
              case Some(existing) =>
                if (allowDuplicateValues || existing != value)
                  ev.setParts(path, mutable.ArrayBuffer[Any](existing, value))
            }
          }
        }
      }
      start = end + 1
    }
    true
  }

  private val patternCache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def compiled(p: String): java.util.regex.Pattern = {
    val c = patternCache.get(p)
    if (c != null) c
    else { val x = java.util.regex.Pattern.compile(p); patternCache.putIfAbsent(p, x); x }
  }

  /** `field_split_pattern` form: pairs split by a REGEX (multi-char), value
    * split at the FIRST `valueSplit`, `remove_char_key` is a character class
    * stripped from keys (ref: syslog_security_cisco.ise.conf:69-76
    * `field_split_pattern => ", "  remove_char_key => "\\s"`). `trimValue`
    * strips the given chars + spaces from value ends — the analogue of the
    * plugin scanner's `\s*` tolerance around the value split, needed for
    * `Key: value` shapes (ref: syslog_security_forescout.counteract.nac
    * .conf:57-62 `field_split => " ,"`). */
  def withPattern(ev: Event, sourceField: String, fieldSplitPattern: String,
                  valueSplit: Char, target: String = "",
                  removeCharKey: String = "", trimValue: String = null,
                  transformKeyLowercase: Boolean = false): Boolean = {
    val in = ev.getString(sourceField)
    if (in.isEmpty) return false
    val targetParts = if (target.isEmpty) Vector.empty[String] else Event.parsePath(target)
    val keyClean = if (removeCharKey.isEmpty) null else compiled(s"[$removeCharKey]")
    val pairs = compiled(fieldSplitPattern).split(in.get, -1)
    var i = 0
    while (i < pairs.length) {
      val pair = pairs(i)
      val vs = pair.indexOf(valueSplit)
      if (vs > 0) {
        var key = pair.substring(0, vs)
        if (keyClean != null) key = keyClean.matcher(key).replaceAll("")
        if (transformKeyLowercase) key = key.toLowerCase
        val value0 = pair.substring(vs + 1)
        val value = if (trimValue == null) value0 else trim(value0, trimValue)
        if (key.nonEmpty) {
          val path = targetParts :+ key
          ev.getParts(path) match {
            case None => ev.setParts(path, value)
            case Some(a: mutable.ArrayBuffer[Any @unchecked]) => a += value
            case Some(existing) =>
              ev.setParts(path, mutable.ArrayBuffer[Any](existing, value))
          }
        }
      }
      i += 1
    }
    true
  }

  private def trim(s: String, chars: String): String = {
    if (chars.isEmpty) return s.trim
    var a = 0; var b = s.length
    while (a < b && (chars.indexOf(s.charAt(a)) >= 0 || s.charAt(a) == ' ')) a += 1
    while (b > a && (chars.indexOf(s.charAt(b - 1)) >= 0 || s.charAt(b - 1) == ' ')) b -= 1
    s.substring(a, b)
  }
}
