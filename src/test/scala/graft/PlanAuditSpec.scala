package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.gen.Transcripts
import graft.pipeline.Pipeline

/** Physical-plan audits: the shapes the 100-TB design depends on must hold
  * in the executed plan, not just in intent (SURVEY §4 / VERDICT plan
  * audits). The kernel's RDD bridge hides the pre-kernel stage from the
  * outer plan, so the input prep is audited via Pipeline.parseInput (the
  * exact DataFrame every kernel entry point consumes). */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planaudit")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private lazy val inputPath: String = {
    val path = java.nio.file.Files.createTempDirectory("graft_planaudit").toString
    Transcripts.input(spark, sf)
      .withColumn("extra_wide_column", lit("x")) // must NOT be read back
      .write.mode("overwrite").parquet(path)
    path
  }

  test("pre-kernel stage: exactly ONE exchange, hash-partitioned on conv_id") {
    spark.sparkContext.setLogLevel("ERROR")
    val in = Pipeline.parseInput(spark, spark.read.parquet(inputPath))
    in.count()
    val plan = in.queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected the single conv_id repartition, got $exchanges:\n${plan.take(1200)}")
    assert(plan.contains("hashpartitioning(conv_id"), plan.take(1200))
  }

  test("pre-kernel scan prunes to the 6 input columns (ReadSchema)") {
    val in = Pipeline.parseInput(spark, spark.read.parquet(inputPath))
    in.count()
    val plan = in.queryExecution.executedPlan.toString
    val read = "ReadSchema: [^\\n]+".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("conv_id") && read.contains("text"), read)
    assert(!read.contains("extra_wide_column"), s"column pruning failed: $read")
  }

  test("sink counts add exactly ONE aggregation exchange over the kernel") {
    val df = Pipeline.sinkCounts(Pipeline.parseDf(spark, spark.read.parquet(inputPath)))
    df.collect()
    // AQE's toString renders the initial plan below the final one — audit
    // only the final plan section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1, s"one agg shuffle expected over the kernel scan, got $exchanges:\n${plan.take(1200)}")
    assert(plan.contains("partial_count"), plan.take(1200)) // map-side combine before the shuffle
  }
}
