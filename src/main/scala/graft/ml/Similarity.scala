package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  *  - `bruteTopK`: exact cosine top-k for a query subset. The dot product is
  *    a Catalyst higher-order expression (`zip_with` + `aggregate`) — no
  *    UDF, stays inside codegen; ranking is a per-query window. Queries are
  *    broadcast (small side), so the crossJoin is a BroadcastNestedLoopJoin:
  *    the 100 TB-scale plan is "stream the big table once past the
  *    broadcast queries", which is the right brute-force layout.
  *  - `ivfTopK`: the scale path — coarse quantization: deterministic
  *    centroid subset, assign every vector to its nearest centroid (one
  *    broadcast pass), then probe only the query's nearest `nprobe`
  *    centroid buckets. Same output schema; approximate.
  */
object Similarity {

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** cosine(a, b) over double — explicit formula so the oracle can mirror it. */
  private def cosine(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
       / (SQRT(aggregate($a, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
        * SQRT(aggregate($b, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""")

  /** Exact brute-force top-k neighbors for query vectors (vec_id % 50 = 0),
    * self excluded; rank ties broken by neighbor id. sim reported in basis
    * points (floor(sim*10000+0.5)) for exact comparison. */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = embeddings(spark, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine("qe", "embedding").as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        floor(col("sim") * 10000.0 + 0.5).cast("int").as("sim_bp"))
  }

  /** IVF-style approximate top-k: centroids = vec_id % 97 = 0 (deterministic
    * coarse codebook); every vector assigned to nearest centroid; queries
    * probe their `nprobe` nearest centroid buckets only. */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 3, nprobe: Int = 8): DataFrame = {
    val e = embeddings(spark, dir)
    val cent = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    // assign every vector to its nearest centroid (broadcast pass #1)
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine("ce", "embedding").as("csim"))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    // queries probe their nprobe nearest buckets (broadcast pass #2)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("qsim").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qe"), col("cent_id"), cosine("ce", "qe").as("qsim"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("qe"), col("cent_id"))
    // score only vectors in probed buckets (shuffle keyed by centroid bucket)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    probes.join(assigned, "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine("qe", "embedding").as("sim"))
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").as("rnk"), col("neighbor_id"),
        floor(col("sim") * 10000.0 + 0.5).cast("int").as("sim_bp"))
  }

  /** Multimodal plumbing: treat content as an opaque binary column with a
    * STUBBED decode (the container has no image/audio codecs — SURVEY
    * brief). The Spark-side mechanics are real: binary column, typed
    * mapPartitions kernel, deterministic fake feature extraction. */
  def multimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    d.as[(Long, Array[Byte])].mapPartitions(_.map { case (id, bytes) =>
      // STUB decode: a real build would hand `bytes` to a codec here; we
      // derive deterministic fake media metadata from the payload instead.
      val n = bytes.length.toLong
      (id, n, 64L + n % 512L, 64L + (n * 7L) % 512L, 1L + n % 7L)
    }).toDF("doc_id", "n_bytes", "width", "height", "n_frames")
  }
}
