package graft.model

import scala.collection.mutable

/** Transient, mutable, schemaless nested event — the in-flight representation
  * used ONLY inside the fused parse/enrich `mapPartitions` stage (never a
  * Spark type; between stages data is a fixed wide Dataset row).
  *
  * Models the reference's Logstash Event semantics:
  *  - nested field paths `[a][b][c]` read/written dynamically
  *    (ref: config/processors/event_hub_audit_azure.event_hub_signin.conf:32-46)
  *  - scalar⇄array duality: a field may hold a scalar or an array, probed
  *    via `[x][0]` (ref: config/enrichments/02_ecs_data_type.conf:131)
  *  - `tags` array used as control-flow state
  *    (ref: config/enrichments/91_geoip.conf:4)
  *
  * Values are: String | Long | Double | Boolean | null |
  * mutable.ArrayBuffer[Any] | Event.FMap (java.util.LinkedHashMap).
  * The map type is java.util's — its `get` returns value-or-null with ZERO
  * allocation, where scala's returns a fresh `Some` per probe. The kernel
  * probes paths hundreds of times per event (21 enrichment steps + a
  * 93-field flatten), so Option-per-probe was several KB of garbage per
  * turn — measured as the main DRAM-bandwidth driver behind the N-vs-4N
  * scaling obligation. LinkedHashMap keeps deterministic insertion order
  * for replayable output.
  */
final class Event {
  val root: Event.FMap = new Event.FMap()
  val tags: mutable.LinkedHashSet[String] = mutable.LinkedHashSet.empty

  def addTag(t: String): Unit = tags += t
  def removeTag(t: String): Unit = tags -= t
  def hasTag(t: String): Boolean = tags.contains(t)

  /** Full deep clone (fields + tags) — the `split {}` FILTER semantics,
    * where every fan-out event is an independent copy of the parent
    * (ref: vuln_tenable_sc.conf:139-141 `split { field => ... }`). */
  def cloneEvent(): Event = {
    val e = new Event
    root.forEach((k, v) => e.root.put(k, Event.deepCopy(v)))
    tags.foreach(e.tags += _)
    e
  }

  /** "[a][b][c]" or bare "a" → Seq("a","b","c"). Cached per-JVM upstream. */
  def get(path: String): Option[Any] = getParts(Event.parsePath(path))

  def getParts(parts: Seq[String]): Option[Any] = Option(partsOrNull(parts))

  /** Allocation-free core lookup: the raw value or null when absent (a
    * stored JSON null is reported the same way — every consumer treats the
    * two identically). */
  def valueOrNull(path: String): Any = partsOrNull(Event.parsePath(path))

  def partsOrNull(parts: Seq[String]): Any = {
    var cur: Any = root
    var i = 0
    while (i < parts.length) {
      cur match {
        case m: Event.FMap =>
          cur = m.get(parts(i))
          if (cur == null) return null
        case a: mutable.ArrayBuffer[Any @unchecked] =>
          // array-index probe, e.g. [client][ip][0] (ref: 02_ecs_data_type.conf:131)
          val idx = Event.asIndex(parts(i))
          if (idx < 0 || idx >= a.length) return null
          cur = a(idx)
        case _ => return null
      }
      i += 1
    }
    cur
  }

  /** Allocation-free variant of `getString` (null when absent/non-scalar). */
  def stringOrNull(path: String): String = stringAtParts(Event.parsePath(path))

  /** Same over a pre-parsed path — for probe tables evaluated per event
    * (skips the path-cache map get on the hot path). */
  def stringAtParts(parts: Seq[String]): String = partsOrNull(parts) match {
    case s: String => s
    case l: Long => l.toString
    case d: Double => Event.numToString(d)
    case b: Boolean => b.toString
    case _ => null
  }

  def getString(path: String): Option[String] = Option(stringOrNull(path))

  def has(path: String): Boolean = {
    // Logstash truthiness: absent, null and false are falsy; "" is truthy-present
    valueOrNull(path) match {
      case null | false => false
      case _ => true
    }
  }

  def set(path: String, value: Any): Unit = setParts(Event.parsePath(path), value)

  def setParts(parts: Seq[String], value: Any): Unit = {
    var cur = root
    var i = 0
    while (i < parts.length - 1) {
      val k = parts(i)
      cur.get(k) match {
        case m: Event.FMap => cur = m
        case _ =>
          val m = new Event.FMap()
          cur.put(k, m)
          cur = m
      }
      i += 1
    }
    cur.put(parts.last, value)
  }

  def remove(path: String): Option[Any] = {
    val parts = Event.parsePath(path)
    if (parts.isEmpty) return None
    if (parts.length == 1) return Option(root.remove(parts.head))
    partsOrNull(parts.dropRight(1)) match {
      case m: Event.FMap => Option(m.remove(parts.last))
      case _ => None
    }
  }

  /** mutate.rename semantics: move value (if present) to new path. */
  def rename(from: String, to: String): Unit =
    remove(from).foreach(v => set(to, v))

  def copyField(from: String, to: String): Unit =
    get(from).foreach(v => set(to, Event.deepCopy(v)))

  /** Append to a field, promoting scalar→array (mutate.merge idiom,
    * ref: config/enrichments/12_related_user.conf:17-26). */
  def mergeInto(path: String, value: Any): Unit =
    mergeIntoParts(Event.parsePath(path), value)

  def mergeIntoParts(parts: Seq[String], value: Any): Unit = {
    partsOrNull(parts) match {
      case null => setParts(parts, value)
      case a: mutable.ArrayBuffer[Any @unchecked] =>
        value match {
          case vs: mutable.ArrayBuffer[Any @unchecked] => a ++= vs
          case v => a += v
        }
      case existing =>
        val a = mutable.ArrayBuffer[Any](existing)
        value match {
          case vs: mutable.ArrayBuffer[Any @unchecked] => a ++= vs
          case v => a += v
        }
        setParts(parts, a)
    }
  }

  /** Walk every leaf (for remove-empty / truncate,
    * ref: config/enrichments/94_remove_empty_n_truncate.conf:65-77).
    * The callback receives only the TOP-LEVEL key — that is all the
    * reference's exclusion lists discriminate on. It returns the (possibly
    * replaced) value, or `Event.Drop` to remove the leaf — a sentinel, not
    * an Option, so the per-leaf hot path allocates nothing. Emptied
    * containers are swept. */
  def walk(f: (String, Any) => Any): Unit = {
    def rec(m: Event.FMap, topKey: String): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val top = if (topKey == null) e.getKey else topKey
        e.getValue match {
          case child: Event.FMap =>
            rec(child, top)
            if (child.isEmpty) it.remove()
          case a: mutable.ArrayBuffer[Any @unchecked] =>
            var i = 0
            while (i < a.length) {
              f(top, a(i)) match {
                case Event.Drop => a.remove(i)
                case nv => a(i) = nv; i += 1
              }
            }
            if (a.isEmpty) it.remove()
          case leaf =>
            f(top, leaf) match {
              case Event.Drop => it.remove()
              case nv => if (nv.asInstanceOf[AnyRef] ne leaf.asInstanceOf[AnyRef]) e.setValue(nv)
            }
        }
      }
    }
    rec(root, null)
  }
}

object Event {
  /** The nested-map type of in-flight events (see class doc for why
    * java.util and not scala.collection.mutable). */
  type FMap = java.util.LinkedHashMap[String, Any]

  /** Sentinel returned by a walk callback to remove the leaf. */
  case object Drop

  /** Set of nested paths as a trie over path segments — lets enrichment
    * walks test membership while descending the event tree with ZERO
    * per-leaf allocation (a bracket-string key per leaf per walk was
    * measurable DRAM traffic at kernel thread counts). */
  final class PathTrie {
    val children = new java.util.HashMap[String, PathTrie]()
    var terminal = false
    def add(path: String): Unit = {
      var n = this
      parsePath(path).foreach { seg =>
        var c = n.children.get(seg)
        if (c == null) { c = new PathTrie; n.children.put(seg, c) }
        n = c
      }
      n.terminal = true
    }
    def child(seg: String): PathTrie = children.get(seg)
  }

  private val pathCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  def parsePath(path: String): Seq[String] = {
    val cached = pathCache.get(path)
    if (cached != null) return cached
    val parts: Seq[String] =
      if (path.isEmpty) Vector.empty
      else if (path.charAt(0) != '[') Vector(path)
      else {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < path.length) {
          if (path.charAt(i) == '[') {
            val j = path.indexOf(']', i)
            if (j < 0) { out += path.substring(i + 1); i = path.length }
            else { out += path.substring(i + 1, j); i = j + 1 }
          } else i += 1
        }
        out.result()
      }
    pathCache.putIfAbsent(path, parts)
    parts
  }

  def asIndex(s: String): Int = {
    var i = 0; var n = 0
    if (s.isEmpty) return -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1
      n = n * 10 + (c - '0'); i += 1
    }
    n
  }

  /** Render numbers the way the pipeline's string ops expect (no ".0" noise
    * for integral doubles — matches sprintf of numeric fields). */
  def numToString(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  def deepCopy(v: Any): Any = v match {
    case m: FMap =>
      val c = new FMap()
      m.forEach((k, x) => c.put(k, deepCopy(x)))
      c
    case a: mutable.ArrayBuffer[Any @unchecked] => a.map(deepCopy)
    case other => other
  }
}
