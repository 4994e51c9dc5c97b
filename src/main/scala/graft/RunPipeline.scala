package graft

import org.apache.spark.sql.SparkSession
import graft.gen.Transcripts
import graft.pipeline.Sink

/** Production entry point (spark-submit-able): run the full
  * parse→enrich→route pipeline over a transcript table and write routed
  * per-sink output with snapshot manifests, lineage and metrics.
  *
  * Usage: RunPipeline <inputDirOrSfDir> <outDir> [snapshotId] [numChunks]
  *   - if <input> contains turns.parquet or *.parquet with the input_hint
  *     schema, it is read directly; if it is a testdata sf dir, the
  *     transcript table is synthesized from its events.parquet.
  *
  * Re-invoking with the same snapshotId resumes: completed chunks are
  * skipped via the ledger (north rule: checkpoint-resumable).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <input> <outDir> [snapshotId] [numChunks]")
    val input = args(0)
    val outDir = args(1)
    val snapshotId = if (args.length > 2) args(2) else "snapshot-0"
    val numChunks = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turns =
      if (new java.io.File(s"$input/events.parquet").exists()) Transcripts.input(spark, input)
      else spark.read.parquet(input)

    val metrics = Sink.writeSnapshot(spark, turns, outDir, snapshotId, numChunks)
    val skipped = numChunks - metrics.size
    println(s"[pipeline] snapshot=$snapshotId chunks_written=${metrics.size} chunks_resumed_skipped=$skipped")
    metrics.sortBy(_.chunk).foreach { m =>
      println(s"[pipeline] chunk=${m.chunk} in=${m.inputRows} out=${m.outputEvents} " +
        s"parsed=${m.parsed} failed=${m.failed} dropped=${m.dropped} routed=${m.routedPerSink}")
    }
    spark.stop()
  }
}
