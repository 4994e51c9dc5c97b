package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layer abstraction (SURVEY.md §7.1): the engine's contract with its
  * storage is "Iceberg-shaped" — snapshot writes with manifests + resumable
  * commits, snapshot-scoped reads — but no Iceberg runtime ships in
  * /opt/spark/jars, so the default implementation is partitioned Parquet
  * with our own manifest/ledger layer (`Sink`). A real Iceberg catalog
  * implements the same trait and drops in without touching the pipeline.
  */
trait TranscriptCatalog {
  /** Write a routed snapshot; returns per-chunk metrics for chunks written
    * in this invocation (already-committed chunks are skipped → resume). */
  def writeSnapshot(spark: SparkSession, turns: DataFrame,
                    snapshotId: String, numChunks: Int): Seq[Sink.ChunkMetrics]

  /** Read one routed sink of a committed snapshot. */
  def readSink(spark: SparkSession, snapshotId: String, sink: String): DataFrame

  /** Chunks already committed for a snapshot (the resume ledger). */
  def committed(snapshotId: String): Set[Int]
}

/** Partitioned-Parquet + manifest implementation (the sandbox default). */
final class ParquetCatalog(rootDir: String) extends TranscriptCatalog {
  override def writeSnapshot(spark: SparkSession, turns: DataFrame,
                             snapshotId: String, numChunks: Int): Seq[Sink.ChunkMetrics] =
    Sink.writeSnapshot(spark, turns, rootDir, snapshotId, numChunks)

  override def readSink(spark: SparkSession, snapshotId: String, sink: String): DataFrame =
    Sink.readSink(spark, rootDir, snapshotId, sink)

  override def committed(snapshotId: String): Set[Int] =
    Sink.completedChunks(rootDir, snapshotId)
}
