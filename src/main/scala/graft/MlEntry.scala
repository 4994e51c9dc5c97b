package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ml.{Similarity, TextOps}

/** Training-data-pipeline + relational operator queries (documents /
  * embeddings / TPC-H-ish tables), each with a DuckDB oracle where the
  * semantics are SQL-expressible. Float-valued outputs are emitted as
  * integer basis points (per-row floor before any sum) so cross-engine
  * comparison is exact. */
object MlEntry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: content-hash groups
    "d01_exact_dedup" -> ((s, dir) => TextOps.exactDedup(TextOps.docs(s, dir))),

    // MinHash + LSH near-dup candidate pairs
    "d02_minhash_pairs" -> ((s, dir) => TextOps.minhashPairs(TextOps.docs(s, dir))),

    // SimHash 64-bit fingerprints
    "d03_simhash" -> ((s, dir) => TextOps.simhash(s, TextOps.docs(s, dir))),

    // word-set Jaccard over subsampled same-source pairs
    "d04_jaccard" -> ((s, dir) => TextOps.jaccardPairs(TextOps.docs(s, dir))),

    // exact brute-force cosine top-k (zip_with/aggregate dot product)
    "d05_cosine_topk" -> ((s, dir) => Similarity.bruteTopK(s, dir)),

    // language-ID heuristic (marker stopword votes)
    "d06_langid" -> ((s, dir) => TextOps.langId(TextOps.docs(s, dir))),

    // quality scoring (token/stopword/word-length stats)
    "d07_quality" -> ((s, dir) => TextOps.quality(TextOps.docs(s, dir))),

    // token counting (whitespace + BPE-ish regex + subword estimate)
    "d08_tokens" -> ((s, dir) => TextOps.tokenCounts(TextOps.docs(s, dir))),

    // winnowing fingerprints (rolling 8-gram md5, window 4)
    "d09_fingerprint" -> ((s, dir) => TextOps.fingerprints(s, TextOps.docs(s, dir))),

    // IVF-bucketed approximate top-k — the 100 TB scale path for d05.
    // Deterministic (row-local assignment + fixed nprobe) → exact oracle.
    "d10_ann_ivf" -> ((s, dir) => Similarity.ivfTopK(s, dir)),

    // the IVF bucketing contract itself (row-local argmax, zero shuffle)
    "d10_ivf_assign" -> ((s, dir) => Similarity.ivfAssign(s, dir)),

    // multimodal plumbing: opaque binary payload + stubbed decode kernel
    "m01_multimodal" -> ((s, dir) => Similarity.multimodal(s, dir)),

    // embedding-cosine near-dup: IVF-bucket blocking + exact scoring
    // (bounded by bucket size — no all-pairs, no growing broadcast)
    "d11_embed_neardup" -> ((s, dir) => Similarity.embedNearDup(s, dir)),

    // sort/rank: top-3 events by value per type (stable tiebreak)
    "r05_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id").asc)
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("value_cents"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    // relational: TPC-H Q1-flavor aggregation (cents-exact money math)
    "r01_lineitem_agg" -> ((s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("l_quantity") + 0.5)).cast("long").as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("sum_price_cents"))),

    // relational: broadcast dimension join + aggregation
    "r02_join_agg" -> ((s, dir) => s.read.parquet(s"$dir/orders.parquet")
      .join(broadcast(s.read.parquet(s"$dir/customer.parquet")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("sum_cents"))),

    // relational: window functions over the events stream
    "r03_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          row_number().over(w).as("rn"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .drop("event_type")
    }),

    // relational: gap-based sessionization (lag + running sum)
    "r04_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L || lag(col("us"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("session_idx", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("cnt"), min(col("event_id")).as("first_ev"),
          max(col("event_id")).as("last_ev"))
    })
  )

  /** Shared DuckDB CTE: MinHash-LSH candidate pairs (cap-free — the shingle
    * index range derives from each doc's own token count via a correlated
    * list comprehension; the round-1 `range(1, 4096)` join silently capped
    * long docs). */
  private val lshCandCte: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
         i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2])) AS s
       FROM toks WHERE len(w) >= 3),
mh AS (SELECT doc_id, h.i2 AS hi, MIN(md5(CAST(h.i2 AS STRING) || ':' || s)) AS m
       FROM sh CROSS JOIN generate_series(0, 11) AS h(i2) GROUP BY 1, 2),
bands AS (SELECT doc_id, hi // 3 AS band, md5(string_agg(m, '' ORDER BY hi)) AS sig
          FROM mh GROUP BY 1, 2),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)"""

  /** Shared DuckDB CTE: embeddings as doubles, the deterministic centroid
    * codebook, and the nearest-centroid assignment (cosine ties → lower
    * cent_id) — mirrors Similarity.ivfAssignWithEmbedding exactly. */
  private val ivfAsgCte: String =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
c AS (SELECT vec_id AS cent_id, emb AS ce FROM e WHERE (vec_id % 97) = 0),
asg AS (SELECT vec_id, cent_id, emb FROM (
          SELECT e.vec_id, c.cent_id, e.emb,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(c.ce, e.emb)
                     / (sqrt(list_dot_product(c.ce, c.ce)) * sqrt(list_dot_product(e.emb, e.emb))) DESC,
                   c.cent_id) AS rn
          FROM e CROSS JOIN c) WHERE rn = 1)"""

  def oracleSql: Map[String, String] = Map(
    "d01_exact_dedup" ->
      "SELECT md5(text) AS hash, COUNT(*) AS cnt, MIN(doc_id) AS keep_id FROM documents GROUP BY 1",

    "d02_minhash_pairs" ->
      s"""WITH $lshCandCte
SELECT doc_a, doc_b FROM cand""",

    "d03_simhash" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
h AS (SELECT doc_id, md5(word) AS m FROM w WHERE word <> ''),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY 1),
bits AS (SELECT h.doc_id, g.j,
    CASE WHEN SUM(((strpos('0123456789abcdef', substr(h.m, 16 - (g.j // 4), 1)) - 1) >> (g.j % 4)) & 1) * 2 > MAX(c.n)
         THEN 1 ELSE 0 END AS b
  FROM h JOIN cnt c ON c.doc_id = h.doc_id CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY 1, 2),
nib AS (SELECT doc_id, j // 4 AS k, SUM(b << (j % 4)) AS v FROM bits GROUP BY 1, 2)
SELECT doc_id, string_agg(substr('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY k DESC) AS simhash_hex
FROM nib GROUP BY 1""",

    "d04_jaccard" ->
      s"""WITH $lshCandCte,
w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
n AS (SELECT doc_id, COUNT(*) AS nw FROM w GROUP BY 1),
i AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS iw
      FROM cand c JOIN w wa ON wa.doc_id = c.doc_a JOIN w wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
      GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b,
  CAST(FLOOR(COALESCE(i.iw, 0) * 10000.0 / (na.nw + nb.nw - COALESCE(i.iw, 0)) + 0.5) AS INT) AS jac_bp
FROM cand c LEFT JOIN i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN n na ON na.doc_id = c.doc_a JOIN n nb ON nb.doc_id = c.doc_b""",

    "d05_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE (vec_id % 50) = 0),
s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        list_dot_product(q.qe, e.emb)
        / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.emb, e.emb))) AS sim
      FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
r AS (SELECT query_id, neighbor_id, sim,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
SELECT query_id, rnk, neighbor_id, CAST(FLOOR(sim * 10000.0 + 0.5) AS INT) AS sim_bp
FROM r WHERE rnk <= 3""",

    "d06_langid" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
s AS (SELECT doc_id,
  CAST(SUM(CASE WHEN word IN ('the','a','of','and','in','to') THEN 1 ELSE 0 END) AS INT) AS s_en,
  CAST(SUM(CASE WHEN word IN ('le','la','et','les','des','une') THEN 1 ELSE 0 END) AS INT) AS s_fr,
  CAST(SUM(CASE WHEN word IN ('el','los','y','una','que','por') THEN 1 ELSE 0 END) AS INT) AS s_es,
  CAST(SUM(CASE WHEN word IN ('der','die','und','das','ein','nicht') THEN 1 ELSE 0 END) AS INT) AS s_de,
  CAST(SUM(CASE WHEN word IN ('的','是','了','在','我','有') THEN 1 ELSE 0 END) AS INT) AS s_zh
  FROM w GROUP BY 1)
SELECT doc_id,
  CASE WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) = 0 THEN 'und'
       WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
       WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
       WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
       WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
       ELSE 'zh' END AS lang_detected,
  s_en, s_fr, s_es, s_de, s_zh
FROM s""",

    "d07_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w, LENGTH(text) AS nc FROM documents),
a AS (SELECT doc_id, CAST(nc AS INT) AS n_chars_c, CAST(len(w) AS INT) AS n_tokens,
  CAST(len(list_filter(w, x -> x IN ('the','a','of','and','in','to'))) AS INT) AS n_stop,
  CAST(list_sum(list_transform(w, x -> LENGTH(x))) AS BIGINT) AS sum_wlen FROM t)
SELECT doc_id, n_chars_c, n_tokens,
  CAST(FLOOR(sum_wlen * 10000.0 / n_tokens + 0.5) AS INT) AS avg_wlen_bp,
  CAST(FLOOR(n_stop * 10000.0 / n_tokens + 0.5) AS INT) AS stop_bp,
  CASE WHEN n_tokens >= 10 AND n_stop > 0 THEN 1 ELSE 0 END AS quality_ok
FROM a""",

    "d08_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_tokens,
  CAST(FLOOR((LENGTH(text) + 3) / 4) AS INT) AS subword_est
FROM documents""",

    "d09_fingerprint" ->
      """WITH g0 AS (SELECT doc_id, unnest(list_transform(range(1, LENGTH(text) - 6),
             i -> {'i': i, 'h': md5(substr(text, CAST(i AS INT), 8))})) AS x
           FROM documents WHERE LENGTH(text) >= 11),
g AS (SELECT doc_id, x.i AS i, x.h AS h FROM g0),
w AS (SELECT doc_id, i,
        MIN(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
        COUNT(*) OVER (PARTITION BY doc_id) AS n FROM g)
SELECT doc_id, CAST(COUNT(DISTINCT mh) AS BIGINT) AS n_fp, MIN(mh) AS min_fp
FROM w WHERE i <= n - 3 GROUP BY 1""",

    "m01_multimodal" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
  CAST(64 + strlen(text) % 512 AS BIGINT) AS width,
  CAST(64 + (strlen(text) * 7) % 512 AS BIGINT) AS height,
  CAST(1 + strlen(text) % 7 AS BIGINT) AS n_frames
FROM documents""",

    "d10_ivf_assign" ->
      s"""WITH $ivfAsgCte
SELECT vec_id, cent_id FROM asg""",

    "d10_ann_ivf" ->
      s"""WITH $ivfAsgCte,
q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE (vec_id % 50) = 0),
probe AS (SELECT query_id, cent_id, qe FROM (
            SELECT q.query_id, c.cent_id, q.qe,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                     list_dot_product(c.ce, q.qe)
                       / (sqrt(list_dot_product(c.ce, c.ce)) * sqrt(list_dot_product(q.qe, q.qe))) DESC,
                     c.cent_id) AS rn
            FROM q CROSS JOIN c) WHERE rn <= 16),
s AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             list_dot_product(p.qe, a.emb)
               / (sqrt(list_dot_product(p.qe, p.qe)) * sqrt(list_dot_product(a.emb, a.emb))) AS sim
      FROM probe p JOIN asg a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id),
r AS (SELECT query_id, neighbor_id, sim,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
SELECT query_id, rnk, neighbor_id, CAST(FLOOR(sim * 10000.0 + 0.5) AS INT) AS sim_bp
FROM r WHERE rnk <= 3""",

    "d11_embed_neardup" ->
      s"""WITH $ivfAsgCte
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  CAST(FLOOR(list_dot_product(a.emb, b.emb)
    / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) * 10000.0 + 0.5) AS INT) AS sim_bp,
  CASE WHEN CAST(FLOOR(list_dot_product(a.emb, b.emb)
    / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) * 10000.0 + 0.5) AS INT) >= 9000
       THEN 1 ELSE 0 END AS is_dup
FROM asg a JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id""",

    "r05_rank" ->
      """WITH r AS (SELECT event_type, event_id,
        CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
      FROM events)
SELECT event_type, event_id, value_cents, rn FROM r WHERE rn <= 3""",

    "r01_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
  CAST(SUM(FLOOR(l_quantity + 0.5)) AS BIGINT) AS sum_qty,
  CAST(SUM(FLOOR(l_extendedprice * 100 + 0.5)) AS BIGINT) AS sum_price_cents
FROM lineitem GROUP BY 1, 2""",

    "r02_join_agg" ->
      """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt,
  CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2""",

    "r03_window" ->
      """SELECT event_id, user_id,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
  LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
FROM events""",

    "r04_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
y AS (SELECT user_id, event_id, us,
        CASE WHEN us - LAG(us, 1) OVER (PARTITION BY user_id ORDER BY event_id) > 1800 * 1000000
               OR LAG(us, 1) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
             THEN 1 ELSE 0 END AS new_s
      FROM x),
z AS (SELECT user_id, event_id,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM y)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS cnt,
  MIN(event_id) AS first_ev, MAX(event_id) AS last_ev
FROM z GROUP BY 1, 2"""
  )
}
