package graft.parse

import graft.model.Event
import scala.collection.mutable

/** Dissect engine: positional delimiter tokenization — one left-to-right scan
  * over the input, NO regex (the reference uses dissect 450× precisely because
  * it is much cheaper than grok; SURVEY.md §2.3).
  *
  * Supported token forms (all used by the ported processors):
  *  - `%{field}` / `%{[a][b]}` / `%{[[a][b]]}` capture into (nested) path
  *    (ref: config/processors/api_network_aws.vpcflow.conf:17-22 uses the
  *     double-bracket form; syslog_security_palo.alto.fw.conf:65-70 single)
  *  - `%{?skip}` / `%{}` discard
  *    (ref: syslog_security_palo.alto.fw.conf:39-45 `%{?data}`)
  *  - `%{+field}` append to previously captured field joined by the separator
  *
  * Failure (a separator not found) appends `tag_on_failure`
  * (ref: api_network_aws.vpcflow.conf:19 `_dissectfailure_1`).
  */
final case class CompiledDissect(tokens: Array[Dissect.Token]) {
  import Dissect._

  // per-thread scratch for staged captures (tokens.length bound) — avoids a
  // LinkedHashMap allocation per event in the hottest parse operator
  @transient private lazy val scratch: ThreadLocal[(Array[Seq[String]], Array[String])] =
    ThreadLocal.withInitial(() => (new Array[Seq[String]](tokens.length), new Array[String](tokens.length)))

  def extract(ev: Event, input: String): Boolean = {
    // staged writes: only commit to the event if the whole mapping matches.
    // `%{+f}` appends to any earlier capture of f (plain or +), joined by
    // the token's compile-time append separator.
    val (paths, values) = scratch.get()
    var n = 0
    def stage(path: Seq[String], v: String, append: Boolean, sep: String): Unit = {
      var j = 0
      while (j < n) {
        if (paths(j) == path) { // content equality: "date" and "[date]" parse to equal paths
          values(j) = if (append) values(j) + sep + v else v
          return
        }
        j += 1
      }
      paths(n) = path; values(n) = v; n += 1
    }
    var pos = 0
    var i = 0
    while (i < tokens.length) {
      tokens(i) match {
        case Lit(s) =>
          if (!input.startsWith(s, pos)) return false
          pos += s.length
        case Cap(path, skip, append, sep) =>
          // capture runs until the next literal (or end of input)
          val next = if (i + 1 < tokens.length) tokens(i + 1).asInstanceOf[Lit] else null
          val end =
            if (next == null) input.length
            else {
              val idx = input.indexOf(next.s, pos)
              if (idx < 0) return false
              idx
            }
          val v = input.substring(pos, end)
          pos = end
          if (!skip) stage(path, v, append, sep)
      }
      i += 1
    }
    var j = 0
    while (j < n) { ev.setParts(paths(j), values(j)); j += 1 }
    true
  }
}

object Dissect {
  sealed trait Token
  final case class Lit(s: String) extends Token
  /** `appendSep` — Logstash dissect joins `%{+f}` values with the literal
    * delimiter PRECEDING the append token (or the configured
    * append_separator), not a hardcoded space. Recorded at compile time. */
  final case class Cap(path: Seq[String], skip: Boolean, append: Boolean,
                       appendSep: String = " ") extends Token

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, CompiledDissect]()

  /** `appendSeparator`: explicit override of the `%{+f}` join string
    * (Logstash `append_separator` option); null → the delimiter preceding
    * each append token (Logstash default behavior). */
  def compile(mapping: String, appendSeparator: String = null): CompiledDissect = {
    val key = if (appendSeparator == null) mapping else s"$appendSeparator $mapping"
    val c = cache.get(key)
    if (c != null) return c
    val toks = mutable.ArrayBuffer.empty[Token]
    var i = 0
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) { toks += Lit(lit.toString); lit.clear() }
    while (i < mapping.length) {
      if (mapping.startsWith("%{", i)) {
        val j = findClose(mapping, i + 2)
        flushLit()
        var body = mapping.substring(i + 2, j)
        var skip = false; var append = false
        if (body.startsWith("?")) { skip = true; body = body.substring(1) }
        else if (body.startsWith("+")) { append = true; body = body.substring(1) }
        if (body.isEmpty) skip = true
        // normalize double-bracket form [[a][b]] → [a][b]
        if (body.startsWith("[[") && body.endsWith("]]")) body = body.substring(1, body.length - 1)
        val sep =
          if (!append) " "
          else if (appendSeparator != null) appendSeparator
          else toks.lastOption match { // delimiter preceding the append token
            case Some(Lit(s)) => s
            case _ => " "
          }
        toks += Cap(Event.parsePath(body), skip, append, sep)
        i = j + 1
      } else { lit.append(mapping.charAt(i)); i += 1 }
    }
    flushLit()
    // merge: two adjacent captures with no literal between them is invalid in
    // dissect; we keep compile-time strictness to surface porting bugs early.
    var k = 0
    while (k < toks.length - 1) {
      if (toks(k).isInstanceOf[Cap] && toks(k + 1).isInstanceOf[Cap])
        throw new IllegalArgumentException(s"dissect: adjacent captures without separator in: $mapping")
      k += 1
    }
    val built = CompiledDissect(toks.toArray)
    cache.putIfAbsent(key, built)
    built
  }

  private def findClose(s: String, from: Int): Int = {
    // token body may itself contain ']' of nested path brackets; the token
    // terminator is the first '}' (dissect forbids '}' inside field names)
    val j = s.indexOf('}', from)
    if (j < 0) throw new IllegalArgumentException(s"dissect: unterminated token in: $s")
    j
  }

  def apply(ev: Event, sourceField: String, mapping: String,
            tagOnFailure: Seq[String] = Seq("_dissectfailure")): Boolean = {
    val in = ev.getString(sourceField)
    if (in.isEmpty || !compile(mapping).extract(ev, in.get)) {
      tagOnFailure.foreach(ev.addTag); false
    } else true
  }
}
