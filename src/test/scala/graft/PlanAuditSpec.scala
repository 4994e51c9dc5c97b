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

  // ---- ml family (round-5 verdict item 5) --------------------------------

  /** Round-5's d02 regression class: constructing the pairs DataFrame ran an
    * eager split-count job and the plan recomputed the minhash lineage three
    * times. Pin both properties: construction runs ZERO Spark jobs, and the
    * executed plan scans documents.parquet exactly once (the self-join's
    * second side must be a ReusedExchange). */
  test("parsed() RDD-level cache returns exactly the rows of the direct kernel path") {
    spark.sparkContext.setLogLevel("ERROR")
    // round-6: SparkEntry.parsed persists the kernel output as UnsafeRows at
    // the RDD layer instead of a columnar InMemoryRelation — same rows, same
    // schema, order-insensitive
    val direct = Pipeline.parseDf(spark, Transcripts.input(spark, sf)).toDF()
    val cached = SparkEntry.parsed(spark, sf)
    assert(cached.schema == direct.schema)
    val d = direct.collect().map(_.toString).sorted
    val c = cached.collect().map(_.toString).sorted
    assert(c.length == d.length)
    assert(c.sameElements(d))
  }

  test("d02: constructing minhashPairs runs no Spark job") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.ml.TextOps.minhashPairs(docs) // construction only — no action
      // sentinel action: flushes the async listener queue (the RDD count is
      // exactly ONE job — a SQL count under AQE would be two) —
      // construction itself must contribute zero jobs
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.nanoTime() + 5000000000L
      while (jobs < 1 && System.nanoTime() < deadline) Thread.sleep(10)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 1, s"plan construction launched ${jobs - 1} Spark job(s)")
  }

  test("d02: executed plan scans documents.parquet ONCE and reuses the self-join exchange") {
    val df = graft.ml.TextOps.minhashPairs(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE documents scan in the final plan, got $scans:\n${plan.take(2000)}")
    assert(plan.contains("ReusedExchange"), s"self-join side not reused:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin"), s"self-join must stay off the broadcast path:\n${plan.take(2000)}")
  }

  test("d10: IVF assignment kernel is zero-shuffle over the embeddings scan") {
    val df = graft.ml.Similarity.ivfAssignWithEmbedding(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // pinned() may add ONE round-robin repartition for parallelism; no
    // KEYED exchange is allowed (the argmax is row-local by design)
    assert(!plan.contains("hashpartitioning"),
      s"assignment must not shuffle by key:\n${plan.take(1200)}")
  }
}
