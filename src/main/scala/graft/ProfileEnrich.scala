package graft

import org.apache.spark.sql.SparkSession
import graft.enrich.{Dicts, Enrich}
import graft.model.{Event, Turn}
import graft.pipeline.Engine
import graft.rules.{Dropped, Parsed, ParseCtx}

/** Dev profiler (round-5 verdict item 1a): per-step wall time of the
  * enrichment chain over the real generated corpus, single-threaded so the
  * numbers are cache-local and host-noise-robust. Not part of the driver
  * contract — run with
  * `sbt "runMain graft.ProfileEnrich"` (env SPARK_GRAFT_SF_DIR to pick sf).
  */
object ProfileEnrich {

  /** Parse preamble shared by the profiler passes: exactly what
    * `Engine.processTurn` does before the enrichment chain. */
  private def parseTurn(t: Turn, dicts: Dicts): (graft.rules.TechnologyConfig, graft.rules.ParseOutcome, Enrich.Ctx) = {
    val (cfg, program) = Engine.techOf(t.tool)
    val tsMillis = t.ts.getTime
    val tsYear = java.time.Instant.ofEpochMilli(tsMillis)
      .atZone(java.time.ZoneOffset.UTC).getYear
    val ctx = ParseCtx(tsMillis, tsYear)
    graft.rules.RuleDicts.set(dicts)
    val ev = new Event
    ev.set("message", if (t.text == null) "" else t.text)
    if (cfg.jsonCodec) graft.parse.JsonOps.parse(ev, "message", "")
    ev.valueOrNull("host") match {
      case null => ()
      case _: Event.FMap => ()
      case hostScalar => ev.set("[agent][name]", Event.deepCopy(hostScalar))
    }
    (cfg, program(ev, ctx), Enrich.Ctx(tsMillis, tsYear))
  }

  /** One warm + one measured pass: parse each turn, stamp the reference's
    * disable tags, then run every enrichment step under a per-step timer.
    * Returns ("enrich_parse" -> sec) followed by each chain step in
    * descending cost. Bench emits this next to the sf1 leg as the
    * component-level enrich attribution (round-5 verdict item 8). */
  def stepSeconds(turns: Array[Turn], dicts: Dicts): Vector[(String, Double)] = {
    val steps = Enrich.chain
    val stepNanos = new Array[Long](steps.length)
    var parseNanos = 0L
    def pass(measure: Boolean): Unit = {
      var ti = 0
      while (ti < turns.length) {
        val t = turns(ti)
        val p0 = System.nanoTime()
        val (cfg, outcome, ectx) = parseTurn(t, dicts)
        if (measure) parseNanos += System.nanoTime() - p0
        outcome match {
          case Dropped => ()
          case Parsed(events) =>
            events.foreach { e =>
              cfg.disabledEnrichments.foreach(n => e.addTag(s"disable_${n}_enrichment"))
              if (measure) {
                var si = 0
                while (si < steps.length) {
                  val n0 = System.nanoTime()
                  steps(si)._2(e, dicts, ectx)
                  stepNanos(si) += System.nanoTime() - n0
                  si += 1
                }
              } else steps.foreach(_._2(e, dicts, ectx))
            }
        }
        ti += 1
      }
    }
    pass(measure = false)
    pass(measure = true)
    ("enrich_parse" -> parseNanos / 1e9) +:
      steps.indices.sortBy(i => -stepNanos(i))
        .map(i => steps(i)._1 -> stepNanos(i) / 1e9).toVector
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-profile-enrich")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns: Array[Turn] = gen.Transcripts.input(spark, sfDir)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn](org.apache.spark.sql.Encoders.product[Turn])
      .collect()
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    println(s"turns: ${turns.length} from $sfDir")

    val dicts = Dicts.build()
    val steps = Enrich.chain
    val stepNanos = new Array[Long](steps.length)
    var parseNanos = 0L
    var flattenNanos = 0L
    var stampNanos = 0L

    def onePass(measure: Boolean): Long = {
      java.util.Arrays.fill(stepNanos, 0L)
      parseNanos = 0L; flattenNanos = 0L; stampNanos = 0L
      val t0 = System.nanoTime()
      var ti = 0
      while (ti < turns.length) {
        val t = turns(ti)
        val (cfg, program) = Engine.techOf(t.tool)
        val tsMillis = t.ts.getTime
        val tsYear = java.time.Instant.ofEpochMilli(tsMillis)
          .atZone(java.time.ZoneOffset.UTC).getYear
        val ctx = ParseCtx(tsMillis, tsYear)
        graft.rules.RuleDicts.set(dicts)
        val p0 = System.nanoTime()
        val ev = new Event
        ev.set("message", if (t.text == null) "" else t.text)
        if (cfg.jsonCodec) graft.parse.JsonOps.parse(ev, "message", "")
        ev.valueOrNull("host") match {
          case null => ()
          case _: Event.FMap => ()
          case hostScalar => ev.set("[agent][name]", Event.deepCopy(hostScalar))
        }
        val outcome = program(ev, ctx)
        val p1 = System.nanoTime()
        parseNanos += p1 - p0
        outcome match {
          case Dropped => ()
          case Parsed(events) =>
            val ectx = Enrich.Ctx(tsMillis, tsYear)
            events.foreach { e =>
              if (measure) {
                val s0 = System.nanoTime()
                cfg.disabledEnrichments.foreach(n => e.addTag(s"disable_${n}_enrichment"))
                stampNanos += System.nanoTime() - s0
                var si = 0
                while (si < steps.length) {
                  val n0 = System.nanoTime()
                  steps(si)._2(e, dicts, ectx)
                  stepNanos(si) += System.nanoTime() - n0
                  si += 1
                }
              } else Enrich(e, cfg, dicts, ectx)
              val f0 = System.nanoTime()
              // mimic the wide flatten cost for context (typed path)
              val pt = e.getString("message")
              if (pt == null) println("?")
              flattenNanos += System.nanoTime() - f0
            }
        }
        ti += 1
      }
      System.nanoTime() - t0
    }

    onePass(measure = false) // warm JIT
    onePass(measure = false)
    val fast = onePass(measure = false) // production apply (mask fast path)
    println(f"FAST-APPLY ${fast / 1e9}%.3f s  (${turns.length / (fast / 1e9)}%.0f turns/s single-thread)")
    val total = onePass(measure = true)
    val enrichTotal = stepNanos.sum
    println(f"TOTAL ${total / 1e9}%.3f s  (${turns.length / (total / 1e9)}%.0f turns/s single-thread)")
    println(f"  parse      ${parseNanos / 1e9}%8.3f s  ${100.0 * parseNanos / total}%5.1f%%")
    println(f"  stamp      ${stampNanos / 1e9}%8.3f s  ${100.0 * stampNanos / total}%5.1f%%")
    println(f"  enrich     ${enrichTotal / 1e9}%8.3f s  ${100.0 * enrichTotal / total}%5.1f%%")
    steps.indices.sortBy(i => -stepNanos(i)).foreach { i =>
      println(f"    ${steps(i)._1}%-26s ${stepNanos(i) / 1e9}%8.3f s  ${100.0 * stepNanos(i) / total}%5.1f%%  (${100.0 * stepNanos(i) / math.max(1L, enrichTotal)}%5.1f%% of enrich)")
    }
  }
}
