package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ml.TextOps

/** d02 hot-bucket defusal (round-4 verdict carry-over: "the d02 LSH band
  * self-join has no hot-bucket cap analogous to d11's boundedBucketPairs").
  * A mass-duplicated document corpus — the web-scale boilerplate case —
  * puts identical MinHash signatures in one (band,sig) bucket; the
  * secondary-hash split must bound the pair count instead of going
  * quadratic. And at the production cap the real sf0.001 corpus must be
  * untouched (splits = 0), which is what keeps the d02/d04 oracles exact.
  */
class LshSkewSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lshskew")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("mass-duplicated corpus: band-join pair count is bounded by the split") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 600
    // n identical documents (identical signature in every band) + 2 distinct
    val docs = ((0 until n).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog")) ++
      Seq((9000L, "completely different text about spark catalyst optimizer internals"),
        (9001L, "completely different text about spark catalyst optimizer behavior")))
      .toDF("doc_id", "text")
    val (pairs, nSplit) = TextOps.minhashPairsBounded(docs, maxBucket = 50)
    assert(nSplit() > 0, "the oversized band buckets must be flagged as split")
    val cnt = pairs.count()
    val unbounded = n.toLong * (n - 1) / 2 // 179,700
    // ~12 sub-buckets of ~50 per band → ~15k distinct pairs; slack for
    // hash imbalance
    assert(cnt < unbounded / 4, s"pair count $cnt not bounded (unbounded = $unbounded)")
    assert(cnt > 0, "split buckets must still produce within-sub-bucket pairs")
  }

  test("production cap leaves the real sf0.001 corpus unsplit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val (_, nSplit) = TextOps.minhashPairsBounded(docs, TextOps.MaxBandBucket)
    assert(nSplit() == 0, "d02/d04 oracle exactness relies on zero splits at the default cap")
  }
}
