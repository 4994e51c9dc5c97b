package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ml.Similarity

/** Hot-bucket defusal (round-2 verdict #2): a deliberately skewed codebook —
  * every vector landing in ONE IVF bucket — must not produce the O(n²)
  * all-pairs join; the secondary-hash split bounds the pair count. And at
  * the production cap the real sf0.001 data must be untouched (splits = 0),
  * which is what keeps the d11 oracle exact. */
class SimilaritySkewSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-simskew")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("skewed codebook: pair count is bounded by the split, not O(n²)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 1000
    // all n vectors assigned to the same centroid — worst-case skew
    val assigned = (0 until n).map { i =>
      (i.toLong, Array(i.toFloat, 1.0f, 2.0f), 0L)
    }.toDF("vec_id", "embedding", "cent_id")
    val (pairs, nSplit) = Similarity.boundedBucketPairs(assigned, maxBucket = 100)
    assert(nSplit() == 1, "the single oversized bucket must be flagged as split")
    val cnt = pairs.count()
    val unbounded = n.toLong * (n - 1) / 2 // 499,500
    // 10 sub-buckets of ~100 → ~49.5k pairs; allow hash-imbalance slack
    assert(cnt < unbounded / 4, s"pair count $cnt not bounded (unbounded = $unbounded)")
    assert(cnt > 0, "split buckets must still produce within-sub-bucket pairs")
  }

  test("production cap leaves the real sf0.001 assignment unsplit") {
    val a = Similarity.assignment(spark, "/root/testdata/sf0.001")
    val (_, nSplit) = Similarity.boundedBucketPairs(a, maxBucket = 65536)
    assert(nSplit() == 0, "d11 oracle exactness relies on zero splits at the default cap")
  }
}
