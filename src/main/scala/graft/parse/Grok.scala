package graft.parse

import java.util.regex.{Matcher, Pattern}
import graft.model.Event
import scala.collection.mutable

/** Grok compiler: Logstash grok dialect → pre-compiled `java.util.regex.Pattern`
  * plus a capture plan writing named groups into nested event paths.
  *
  * Reference semantics reproduced (SURVEY.md §2.3 grok row):
  *  - `%{NAME}` / `%{NAME:field}` pattern-library references
  *    (ref: config/processors/syslog_audit_linux_rsyslog.conf:48-54)
  *  - Logstash named-group dialect `(?<[a][b]>...)` targeting nested paths
  *    (ref: config/enrichments/10_user_agent_enrichment.conf:11,
  *     config/processors/syslog_security_palo.alto.fw.conf:15)
  *  - pattern LIST, first match wins
  *  - `tag_on_failure` (ref: syslog_security_palo.alto.fw.conf:14)
  *  - `timeout_millis => 500` runaway-regex guard (ref: same file:16) —
  *    implemented as a deadline-checking CharSequence (deterministic inputs
  *    never hit it; it bounds adversarial backtracking).
  *
  * Patterns are compiled ONCE per JVM (executor) via a registry; only pattern
  * STRINGS cross the serialization boundary (SURVEY.md §2.3: broadcast the
  * strings, compile in mapPartitions).
  */
final case class CompiledGrok(pattern: Pattern, groupToPath: Array[(Int, Seq[String])]) {
  // Matcher is reused per thread (reset per input) — a fresh Matcher per
  // event is measurable allocation pressure at 32 kernel threads.
  @transient private lazy val localMatcher: ThreadLocal[Matcher] =
    ThreadLocal.withInitial(() => pattern.matcher(""))

  /** Apply to `input`; on match write captures into `ev`, return true.
    * Captures are read by compile-time GROUP INDEX — `Matcher.group(String)`
    * is a per-capture map lookup on the hot path (same class of cost as the
    * dissect path-Vector staging fixed in round 2). */
  def extract(ev: Event, input: String, timeoutMillis: Long = 500L): Boolean = {
    val cs: CharSequence =
      if (timeoutMillis <= 0) input else new Grok.DeadlineCharSequence(input, timeoutMillis)
    val m = localMatcher.get()
    m.reset(cs)
    try {
      if (!m.find()) return false
    } catch { case _: Grok.GrokTimeoutException => return false }
    var i = 0
    while (i < groupToPath.length) {
      val (g, path) = groupToPath(i)
      val v = m.group(g)
      // empty captures are dropped: logstash-filter-grok's
      // `keep_empty_captures` defaults to false, so a GREEDYDATA that
      // matches "" (e.g. around a line-anchored literal in multiline
      // input — riverbed.netim_weekly.conf:42-45) never sets its field
      if (v != null && !v.isEmpty) ev.setParts(path, v)
      i += 1
    }
    true
  }
}

object Grok {
  final class GrokTimeoutException extends RuntimeException("grok timeout")

  /** CharSequence that checks a wall deadline every 4096 reads — the Spark-side
    * replacement for Logstash's `timeout_millis` watchdog thread. */
  final class DeadlineCharSequence(s: String, timeoutMillis: Long) extends CharSequence {
    private val deadline = System.nanoTime() + timeoutMillis * 1000000L
    private var ticks = 0
    override def length(): Int = s.length
    override def charAt(i: Int): Char = {
      ticks += 1
      if ((ticks & 0xfff) == 0 && System.nanoTime() > deadline) throw new GrokTimeoutException
      s.charAt(i)
    }
    override def subSequence(a: Int, b: Int): CharSequence = s.subSequence(a, b)
    override def toString: String = s
  }

  /** Built-in pattern library — the subset of Logstash core patterns used by the
    * ported processors (public grok pattern definitions). */
  val Library: Map[String, String] = Map(
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "(?:[+-]?(?:[0-9]+))",
    "NUMBER" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?))",
    "BASE10NUM" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?))",
    "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
    "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "MONTH" -> "\\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\\b",
    "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME" -> "(?!<[0-9])(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))(?![0-9])",
    "SYSLOGTIMESTAMP" -> "%{MONTH} +%{MONTHDAY} %{TIME}",
    "IPV4" -> "(?<![0-9])(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))(?![0-9])",
    "IP" -> "(?<![0-9])(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))(?![0-9])",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(\\.?|\\b)",
    "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
    "SYSLOGHOST" -> "%{IPORHOST}",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "[a-zA-Z0-9._-]+",
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "CISCOMAC" -> "(?:(?:[A-Fa-f0-9]{4}\\.){2}[A-Fa-f0-9]{4})",
    "WINDOWSMAC" -> "(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})",
    "COMMONMAC" -> "(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    "MAC" -> "(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})"
  )

  private val refRe = Pattern.compile("%\\{(\\w+)(?::([^}]+))?\\}")
  // Logstash dialect named group: (?<[a][b]>  or  (?<name>  — rewrite to safe java names
  // dialect group names: [a][b], the double-bracket [[a][b]] form
  // (ref: syslog_security_skyhigh.security.mgr.conf:34), or plain words
  private val namedRe = Pattern.compile("\\(\\?<(\\[\\[[^>]+\\]\\]|(?:\\[[^\\]]+\\])+|[A-Za-z_][\\w@.\\[\\]_-]*)>")

  private val compileCache = new java.util.concurrent.ConcurrentHashMap[String, CompiledGrok]()

  /** Compile a Logstash grok pattern string. Cached per JVM. */
  def compile(grokPattern: String): CompiledGrok = {
    val c = compileCache.get(grokPattern)
    if (c != null) return c
    val built = doCompile(grokPattern)
    compileCache.putIfAbsent(grokPattern, built)
    built
  }

  private def doCompile(grokPattern: String): CompiledGrok = {
    val groups = mutable.ArrayBuffer.empty[(String, Seq[String])]
    var gid = 0
    def freshGroup(target: String): String = {
      val g = s"g$gid"; gid += 1
      // normalize the double-bracket selector form [[a][b]] → [a][b]
      // (ref: syslog_security_cisco.ise.conf:26 %{NUMBER:[[tmp][msg_id]]})
      val t = if (target.startsWith("[[") && target.endsWith("]]"))
        target.substring(1, target.length - 1) else target
      groups += ((g, Event.parsePath(t)))
      g
    }
    // 1) expand %{NAME} / %{NAME:field} references (recursively, library may nest)
    def expand(p: String, depth: Int): String = {
      if (depth > 10) return p
      val m = refRe.matcher(p)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        sb.append(p, last, m.start())
        val name = m.group(1); val field = m.group(2)
        val body = Library.getOrElse(name, throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
        val expanded = expand(body, depth + 1)
        if (field == null) sb.append("(?:").append(expanded).append(")")
        else sb.append("(?<").append(freshGroup(field)).append(">").append(expanded).append(")")
        last = m.end()
      }
      sb.append(p, last, p.length)
      sb.toString
    }
    val afterRefs = expand(grokPattern, 0)
    // 2) rewrite dialect named groups (?<[a][b]>…) / (?<name>…) to (?<gN>…)
    val m2 = namedRe.matcher(afterRefs)
    val sb2 = new java.lang.StringBuilder
    var last2 = 0
    while (m2.find()) {
      sb2.append(afterRefs, last2, m2.start())
      val raw = m2.group(1)
      if (raw.startsWith("g") && raw.matches("g\\d+")) {
        sb2.append("(?<").append(raw).append(">") // already ours (from step 1)
      } else {
        sb2.append("(?<").append(freshGroup(raw)).append(">")
      }
      last2 = m2.end()
    }
    sb2.append(afterRefs, last2, afterRefs.length)
    val finalPattern = sb2.toString
    // 3) resolve each named group's CAPTURE INDEX by walking the final
    // regex once: '(' not followed by '?' is capturing; '(?<name>' (not a
    // lookbehind '(?<=' / '(?<!') is capturing too. Escapes and character
    // classes are skipped. This lets extract() use group(int).
    val nameToIndex = mutable.Map.empty[String, Int]
    var ci = 0; var pos = 0; var inClass = false
    while (pos < finalPattern.length) {
      finalPattern.charAt(pos) match {
        case '\\' => pos += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (pos + 1 >= finalPattern.length || finalPattern.charAt(pos + 1) != '?') ci += 1
          else if (pos + 2 < finalPattern.length && finalPattern.charAt(pos + 2) == '<' &&
            pos + 3 < finalPattern.length &&
            finalPattern.charAt(pos + 3) != '=' && finalPattern.charAt(pos + 3) != '!') {
            ci += 1
            val end = finalPattern.indexOf('>', pos + 3)
            nameToIndex(finalPattern.substring(pos + 3, end)) = ci
            pos = end
          }
        case _ => ()
      }
      pos += 1
    }
    val indexed = groups.iterator.map { case (g, path) => (nameToIndex(g), path) }.toArray
    // UNIX_LINES: Oniguruma (Logstash's regex engine) treats ONLY \n as a
    // line terminator — `.` crosses a bare \r. Java's default terminator set
    // also includes \r/\r\n, which would truncate `(?<actual_msg>.*$)`-style
    // captures at the first CR. Multi-line payloads framed over TCP syslog
    // keep the \r of each CRLF (the frame splits on \n), so CR-separated
    // bodies are the NORM for kv-over-"\r\n" processors
    // (ref: syslog_security_symantec.dlp.conf:27-33).
    // MULTILINE: Ruby's ^/$ are ALWAYS line anchors, so the shared header
    // grok captures the FIRST LINE of a \n-folded payload into actual_msg
    // and parsing continues (proven by the dropbear "\n\t" folds that
    // syslog_audit_ubiquiti.wireless_bridge.conf:22-25 then re-joins).
    // Java anchors are whole-input by default, which would instead fail the
    // header grok on any embedded \n. Patterns without ^/$ are unaffected.
    CompiledGrok(Pattern.compile(finalPattern, Pattern.UNIX_LINES | Pattern.MULTILINE), indexed)
  }

  /** First-match-wins over a pattern list; failure appends tag(s).
    * (ref: list-of-patterns at config/processors/syslog_audit_linux_rsyslog.conf:48-54) */
  def apply(ev: Event, sourceField: String, patterns: Seq[String],
            tagOnFailure: Seq[String] = Seq("_grokparsefailure"),
            timeoutMillis: Long = 500L): Boolean = {
    def matchOne(s: String): Boolean = {
      var i = 0
      while (i < patterns.length) {
        if (compile(patterns(i)).extract(ev, s, timeoutMillis)) return true
        i += 1
      }
      false
    }
    // Logstash grok on an ARRAY field matches each element; the filter
    // succeeds if ANY element matched (ref: s3_log_aws.lb.conf:65-72, where
    // the port-list grok runs on a mutate-split array).
    val ok = ev.get(sourceField) match {
      case Some(a: scala.collection.mutable.ArrayBuffer[Any @unchecked]) =>
        var any = false
        a.foreach { case s: String => if (matchOne(s)) any = true; case _ => () }
        any
      case _ => ev.getString(sourceField).exists(matchOne)
    }
    if (!ok) tagOnFailure.foreach(ev.addTag)
    ok
  }
}
