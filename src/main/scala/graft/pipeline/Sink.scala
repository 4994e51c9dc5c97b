package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Routed sink writer with snapshot manifests, per-partition lineage +
  * metrics, and checkpoint-resume (north rule: "resumable from checkpoint
  * with per-partition lineage and parse/drop/route metrics persisted
  * alongside each snapshot").
  *
  * Layout under `rootDir` (partitioned-Parquet realization of the Iceberg
  * table contract — no Iceberg runtime ships in /opt/spark/jars, SURVEY.md
  * §7.1; the manifest layer below is the part Iceberg would otherwise
  * provide, kept so a real catalog can be swapped in):
  *
  *   sink=<sink>/chunk=<c>/...parquet        routed rows per output pipeline
  *   _manifests/<snapshotId>/chunk-<c>.json  lineage + metrics per chunk
  *   _manifests/<snapshotId>/_ledger/<c>     commit marker (atomic rename)
  *
  * Chunk = deterministic hash bucket of conv_id (`pmod(hash(conv_id), n)`),
  * i.e. the same explicit partitioning the rest of the engine keys on. A
  * chunk is the unit of both failure recovery and lineage: its manifest
  * records input rows, parsed/failed/dropped, and per-sink routed counts.
  * Re-running a snapshot skips chunks whose ledger marker exists — the
  * write of marker AFTER data + manifest makes the protocol idempotent
  * (at-least-once write, exactly-once visibility).
  *
  * The multi-sink pass is sequential and non-cloned, mirroring the
  * reference's memory deliberation (ref: build_scripts/README.md:54-56):
  * the enriched chunk is persisted once and each sink filters it.
  */
object Sink {

  final case class ChunkMetrics(
    chunk: Int,
    inputRows: Long,
    outputEvents: Long,
    parsed: Long,
    failed: Long,
    dropped: Long,
    routedPerSink: Map[String, Long])

  def ledgerDir(rootDir: String, snapshotId: String): Path =
    Paths.get(rootDir, "_manifests", snapshotId, "_ledger")

  def completedChunks(rootDir: String, snapshotId: String): Set[Int] = {
    val d = ledgerDir(rootDir, snapshotId)
    if (!Files.isDirectory(d)) Set.empty
    else {
      val it = Files.list(d)
      try it.iterator().asScala.map(_.getFileName.toString)
        .flatMap(_.toIntOption).toSet
      finally it.close()
    }
  }
  private implicit class JIter[T](val it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Write one snapshot of the routed pipeline output. Returns metrics for
    * the chunks processed in THIS invocation (resumed chunks are skipped). */
  def writeSnapshot(spark: SparkSession, input: DataFrame, rootDir: String,
                    snapshotId: String, numChunks: Int = 8): Seq[ChunkMetrics] = {
    Files.createDirectories(ledgerDir(rootDir, snapshotId))
    val done = completedChunks(rootDir, snapshotId)
    val withChunk = input.withColumn("_chunk",
      pmod(hash(col("conv_id")), lit(numChunks)))
    val out = Vector.newBuilder[ChunkMetrics]
    (0 until numChunks).foreach { c =>
      if (!done.contains(c)) {
        out += writeChunk(spark, withChunk.filter(col("_chunk") === c).drop("_chunk"),
          rootDir, snapshotId, c)
      }
    }
    out.result()
  }

  private def writeChunk(spark: SparkSession, chunkInput: DataFrame,
                         rootDir: String, snapshotId: String, c: Int): ChunkMetrics = {
    val inputRows = chunkInput.count()
    val parsedDf = Pipeline.parseDf(spark, chunkInput).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val outputEvents = parsedDf.count()
      val failed = parsedDf.filter(!col("parse_ok")).count()
      val droppedRows = inputRows - parsedDf.filter(col("sub_idx") === 0).count()
      // sequential non-cloned multi-sink pass (ref: README.md:54-56)
      val sinks = parsedDf.select(explode(col("route_outputs")).as("s"))
        .distinct().collect().map(_.getString(0)).sorted
      val routed = sinks.map { s =>
        val rows = parsedDf.filter(array_contains(col("route_outputs"), s))
        rows.write.mode(SaveMode.Overwrite)
          .parquet(s"$rootDir/sink=$s/chunk=$c")
        s -> rows.count()
      }.toMap
      val m = ChunkMetrics(c, inputRows, outputEvents,
        parsed = outputEvents - failed, failed = failed,
        dropped = droppedRows, routedPerSink = routed)
      writeManifest(rootDir, snapshotId, m)
      commitLedger(rootDir, snapshotId, c)
      m
    } finally parsedDf.unpersist()
  }

  private def writeManifest(rootDir: String, snapshotId: String, m: ChunkMetrics): Unit = {
    val routed = m.routedPerSink.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val json =
      s"""{
         |  "snapshot": "$snapshotId",
         |  "chunk": ${m.chunk},
         |  "input_rows": ${m.inputRows},
         |  "output_events": ${m.outputEvents},
         |  "parsed": ${m.parsed},
         |  "failed": ${m.failed},
         |  "dropped": ${m.dropped},
         |  "routed_per_sink": $routed
         |}""".stripMargin
    val dir = Paths.get(rootDir, "_manifests", snapshotId)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".chunk-${m.chunk}.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve(s"chunk-${m.chunk}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def commitLedger(rootDir: String, snapshotId: String, c: Int): Unit = {
    val dir = ledgerDir(rootDir, snapshotId)
    val tmp = dir.resolve(s".$c.tmp")
    Files.writeString(tmp, "ok")
    Files.move(tmp, dir.resolve(c.toString),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read back one sink's routed rows across all chunks. */
  def readSink(spark: SparkSession, rootDir: String, sink: String): DataFrame =
    spark.read.parquet(s"$rootDir/sink=$sink")
}
