package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: kernel-only thread-scaling + allocation-rate probe.
  * Quantifies bytes allocated per turn inside the fused parse→enrich kernel
  * (the DRAM-bandwidth driver behind the N-vs-4N scaling obligation) and
  * the kernel's thread-scaling curve with a long-enough run per level to be
  * JIT/startup-insensitive. Not part of the pipeline; run via
  * `sbt "runMain graft.tools.KernelProbe [sfDir] [turnCount]"`. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val take = args.lift(1).map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = graft.gen.Transcripts.input(spark, sfDir)
      .limit(take)
      .as[graft.model.Turn](org.apache.spark.sql.Encoders.product[graft.model.Turn])
      .collect()
    spark.stop()
    val dicts = graft.enrich.Dicts.build()
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]

    def run1(reps: Int, mode: String): Unit = {
      // single-thread: time + allocated bytes per turn, per pipeline slice
      (1 to reps).foreach { r =>
        val a0 = mx.getThreadAllocatedBytes(Thread.currentThread().getId)
        val t0 = System.nanoTime()
        var i = 0; var acc = 0L
        while (i < turns.length) {
          val t = turns(i)
          mode match {
            case "full" => acc += graft.pipeline.Engine.processTurn(t, dicts).size
            case "noflatten" =>
              val (cfg, program) = graft.pipeline.Engine.techOf(t.tool)
              val res = graft.pipeline.Engine.parseAndEnrich(cfg, program, t.text, t.ts.getTime, dicts)
              acc += (if (res == null) 0 else res.size)
            case "parseonly" =>
              val (cfg, program) = graft.pipeline.Engine.techOf(t.tool)
              val ev = new graft.model.Event
              ev.set("message", if (t.text == null) "" else t.text)
              program(ev, graft.rules.ParseCtx(t.ts.getTime, 2026)) match {
                case graft.rules.Parsed(es) => acc += es.size
                case _ => ()
              }
          }
          i += 1
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val ab = mx.getThreadAllocatedBytes(Thread.currentThread().getId) - a0
        println(f"rep=$r $mode%10s: ${turns.length / dt}%.0f turns/s, ${ab.toDouble / turns.length}%.0f bytes-alloc/turn (out=$acc)")
      }
    }
    def runN(threads: Int): Double = {
      val per = turns.length / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = t * per; val end = i + per; var acc = 0L
          // loop 4x to make each leg seconds-long
          var r = 0
          while (r < 4) { i = t * per
            while (i < end) { acc += graft.pipeline.Engine.processTurn(turns(i), dicts).size; i += 1 }
            r += 1 }
          if (acc < 0) println("?")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      4L * per * threads / dt
    }
    if (args.lift(2).contains("spin")) { // long N-thread run for stack sampling
      val n = args.lift(3).map(_.toInt).getOrElse(32)
      (1 to 40).foreach { r => val t = runN(n); println(f"spin$r threads=$n: $t%.0f turns/s") }
      return
    }
    run1(3, "full")
    run1(3, "noflatten")
    run1(3, "parseonly")
    if (args.lift(2).contains("scale"))
      Seq(1, 2, 4, 8, 16, 32).foreach { n =>
        val tput = runN(n)
        println(f"threads=$n%2d: $tput%.0f turns/s")
      }
  }
}
