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
  * mutable.ArrayBuffer[Any] | mutable.LinkedHashMap[String, Any].
  * LinkedHashMap keeps deterministic insertion order for replayable output.
  */
final class Event {
  val root: mutable.LinkedHashMap[String, Any] = mutable.LinkedHashMap.empty
  val tags: mutable.LinkedHashSet[String] = mutable.LinkedHashSet.empty

  def addTag(t: String): Unit = tags += t
  def removeTag(t: String): Unit = tags -= t
  def hasTag(t: String): Boolean = tags.contains(t)

  /** "[a][b][c]" or bare "a" → Seq("a","b","c"). Cached per-thread upstream. */
  def get(path: String): Option[Any] = getParts(Event.parsePath(path))

  def getParts(parts: Seq[String]): Option[Any] = {
    var cur: Any = root
    var i = 0
    while (i < parts.length) {
      cur match {
        case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
          m.get(parts(i)) match {
            case Some(v) => cur = v
            case None    => return None
          }
        case a: mutable.ArrayBuffer[Any @unchecked] =>
          // array-index probe, e.g. [client][ip][0] (ref: 02_ecs_data_type.conf:131)
          val idx = Event.asIndex(parts(i))
          if (idx < 0 || idx >= a.length) return None
          cur = a(idx)
        case _ => return None
      }
      i += 1
    }
    Some(cur)
  }

  def getString(path: String): Option[String] = get(path).collect {
    case s: String => s
    case l: Long   => l.toString
    case d: Double => Event.numToString(d)
    case b: Boolean => b.toString
  }

  def has(path: String): Boolean = {
    // Logstash truthiness: absent, null and false are falsy; "" is truthy-present
    get(path) match {
      case None | Some(null) | Some(false) => false
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
        case Some(m: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) => cur = m
        case _ =>
          val m = mutable.LinkedHashMap.empty[String, Any]
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
    if (parts.length == 1) return root.remove(parts.head)
    getParts(parts.dropRight(1)) match {
      case Some(m: mutable.LinkedHashMap[String @unchecked, Any @unchecked]) =>
        m.remove(parts.last)
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
  def mergeInto(path: String, value: Any): Unit = {
    get(path) match {
      case None => set(path, value)
      case Some(a: mutable.ArrayBuffer[Any @unchecked]) =>
        value match {
          case vs: mutable.ArrayBuffer[Any @unchecked] => a ++= vs
          case v => a += v
        }
      case Some(existing) =>
        val a = mutable.ArrayBuffer[Any](existing)
        value match {
          case vs: mutable.ArrayBuffer[Any @unchecked] => a ++= vs
          case v => a += v
        }
        set(path, a)
    }
  }

  /** Walk every leaf (for remove-empty / truncate,
    * ref: config/enrichments/94_remove_empty_n_truncate.conf:65-77).
    * The callback receives only the TOP-LEVEL key — that is all the
    * reference's exclusion lists discriminate on — which keeps the walk
    * allocation-free on the per-leaf path (this runs for every field of
    * every event). */
  def walk(f: (String, Any) => Option[Any]): Unit = {
    // mapValuesInPlace + filterInPlace iterate without snapshot allocations —
    // this runs for every field of every event, so zero-garbage matters.
    def rec(m: mutable.LinkedHashMap[String, Any], topKey: String): Unit = {
      m.mapValuesInPlace { (k, v) =>
        val top = if (topKey == null) k else topKey
        v match {
          case child: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
            rec(child, top); child
          case a: mutable.ArrayBuffer[Any @unchecked] =>
            var i = 0
            while (i < a.length) {
              f(top, a(i)) match {
                case Some(nv) => a(i) = nv; i += 1
                case None => a.remove(i)
              }
            }
            a
          case leaf =>
            f(top, leaf) match {
              case Some(nv) => nv
              case None => Event.Tombstone
            }
        }
      }
      m.filterInPlace { (_, v) =>
        v match {
          case Event.Tombstone => false
          case child: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => child.nonEmpty
          case a: mutable.ArrayBuffer[Any @unchecked] => a.nonEmpty
          case _ => true
        }
      }
    }
    rec(root, null)
  }
}

object Event {
  /** Sentinel marking a leaf removed during walk (swept by filterInPlace). */
  private[model] case object Tombstone

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
    case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
      val c = mutable.LinkedHashMap.empty[String, Any]
      m.foreach { case (k, x) => c.put(k, deepCopy(x)) }
      c
    case a: mutable.ArrayBuffer[Any @unchecked] => a.map(deepCopy)
    case other => other
  }
}
