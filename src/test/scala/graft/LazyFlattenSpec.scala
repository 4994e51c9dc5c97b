package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.gen.Transcripts
import graft.pipeline.{Pipeline, RowKernel}

/** The lazy flatten (masked kernel, Pipeline.parseDfSelect) must be
  * column-for-column identical to the full flatten followed by a Catalyst
  * projection — on a narrow column set, a wide one including arrays and
  * booleans, and the degenerate full mask. */
class LazyFlattenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lazyflatten")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def assertSameCols(cols: Seq[String], what: String): Unit = {
    val input = Transcripts.input(spark, sf)
    val lazyDf = Pipeline.parseDfSelect(spark, input, cols)
    val fullDf = Pipeline.parseDf(spark, input).select(cols.map(col): _*)
    assert(lazyDf.schema == fullDf.schema, s"$what schema differs")
    assert(lazyDf.exceptAll(fullDf).count() == 0 && fullDf.exceptAll(lazyDf).count() == 0,
      s"$what rows differ between masked and full flatten")
  }

  test("masked kernel == full kernel + projection (aggregate column set)") {
    spark.sparkContext.setLogLevel("ERROR")
    assertSameCols(Seq("route_outputs", "technology", "role", "tool", "ts"), "agg-cols")
  }

  test("masked kernel == full kernel + projection (mixed wide set)") {
    assertSameCols(Seq("conv_id", "turn_idx", "sub_idx", "parse_ok", "parse_rule",
      "event_module", "event_dataset", "source_ip", "source_ip_private",
      "destination_port", "event_created_ms", "related_ip", "tags",
      "user_agent_original", "event_hash"), "mixed-cols")
  }

  test("full mask == unmasked kernel (degenerate case)") {
    val all = RowKernel.schema.fieldNames.toSeq
    assertSameCols(all, "full-mask")
  }

  test("sinkCounts over the lazy flatten equals the full-path counts") {
    val input = Transcripts.input(spark, sf)
    val full = Pipeline.sinkCounts(Pipeline.parseDf(spark, input))
    val lzy = Pipeline.sinkCounts(Pipeline.parseDfSelect(spark, input,
      Seq("route_outputs", "technology", "role", "tool", "ts")))
    assert(lzy.exceptAll(full).count() == 0 && full.exceptAll(lzy).count() == 0)
  }
}
