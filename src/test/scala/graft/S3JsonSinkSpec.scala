package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.gen.Transcripts
import graft.pipeline.{Pipeline, Sink}

/** The s3 json_lines+gzip sink (ref: config/outputs/s3_output.conf:8-22)
  * must carry exactly the rows the parquet family routes to "s3", as
  * independently-readable .json.gz rotation parts under index/date
  * prefixes. */
class S3JsonSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-s3json")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("gzip json-lines sink row-for-row equals the parquet s3 routing") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft_s3json").toString
    val parsed = Pipeline.parseDf(spark, Transcripts.input(spark, sf))
      .persist()
    Sink.writeS3JsonLines(spark, parsed, dir)
    // every data file is an independently-readable gzip rotation part
    val files = new java.io.File(dir).listFiles()
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val dataFiles = files.toSeq.flatMap(walk).filter(_.getName.endsWith(".json.gz"))
    assert(dataFiles.nonEmpty, "no gzip json parts written")
    // read back and compare to the parquet family's s3 routing on the key
    // identity + payload columns (JSON round-trips strings/longs exactly)
    val keyCols = Seq("conv_id", "turn_idx", "sub_idx", "technology",
      "event_hash", "event_created_ms", "route_index")
    val back = Sink.readS3JsonLines(spark, dir).select(keyCols.map(col): _*)
    val expected = parsed.filter(array_contains(col("route_outputs"), "s3"))
      .select(keyCols.map(col): _*)
    assert(back.count() == expected.count(), "row count differs")
    assert(back.exceptAll(expected).count() == 0 &&
      expected.exceptAll(back).count() == 0, "rows differ")
    // the prefix layout is index/date folders (rotation parts below them)
    assert(dataFiles.head.getPath.matches(".*/index=[^/]+/y=\\d+/m=\\d+/d=\\d+/.*"),
      dataFiles.head.getPath)
    parsed.unpersist()
  }

  test("maxRecordsPerFile rotates files like size_and_time rotation") {
    val dir = Files.createTempDirectory("graft_s3rot").toString
    val parsed = Pipeline.parseDf(spark, Transcripts.input(spark, sf))
    Sink.writeS3JsonLines(spark, parsed, dir, maxRecordsPerFile = 50)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val parts = walk(new java.io.File(dir)).filter(_.getName.endsWith(".json.gz"))
    val total = Sink.readS3JsonLines(spark, dir).count()
    assert(parts.size >= (total / 50).toInt, s"expected rotation: $total rows in ${parts.size} parts")
  }
}
