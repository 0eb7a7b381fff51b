package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOf, CorpusClean, DataDiff, Dedup, Events, GraphOps, Multimodal, RangeJoin, Similarity, TextAnalysis, TrainPrep}


/** Shared fixtures of the extension-layer registries: the planted-dup
  * corpora (documents ∪ perturbed copies, built identically on both
  * engines), the co-purchase edge list, and the DuckDB SQL fragments
  * (MinHash bands, shingles, quantized-cosine) every tier's oracles
  * compose. Mixed into [[ExtQueries]] and the per-tier registry objects
  * (round-7 split — one definition, six consumers, zero duplication).
  */
private[graft] trait ExtHelpers {

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  /** The ONE exact↔NN-descent routing point for every
    * knnGraphAuto-routed REGISTRY key: passed to the four Scala
    * call-sites AND interpolated into their four two-branch
    * gate-following oracles, so engine and oracle cannot drift at the
    * routing boundary. 1000 puts the sf gate corpora (500 vectors) on
    * the exact branch and the organic ×10 corpus on NN-descent — a
    * GATE-PLACEMENT choice for the correctness suites, deliberately
    * distinct from the measured performance crossover
    * ([[graft.ext.Similarity.measuredKnnCrossover]] = 1500) that
    * library callers get by default.
    */
  protected final val knnGateN: Long = 1000L

  /** Interval-containment oracle, shared by the manual binning key
    * (`range_join_binned`) and the optimizer-rule twin
    * (`range_join_rule_auto`) — one independent re-derivation both
    * physical strategies must match.
    */
  protected val rangeJoinOracle =
    """WITH e AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us
         FROM events),
       l AS (
         SELECT *, CASE
           WHEN lag(ts_us) OVER w IS NULL THEN 1
           WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
           ELSE 0 END AS is_new
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       s AS (
         SELECT *, CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM l),
       sess AS (
         SELECT user_id, session_id,
           CAST(min(ts_us) AS BIGINT) AS start_us,
           CAST(max(ts_us) AS BIGINT) AS end_us
         FROM s GROUP BY user_id, session_id),
       clicks AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us
         FROM events WHERE event_type = 'click')
       SELECT c.event_id, c.user_id, c.ts_us,
              ss.session_id, ss.start_us, ss.end_us
       FROM clicks c JOIN sess ss
         ON c.user_id = ss.user_id
        AND c.ts_us BETWEEN ss.start_us AND ss.end_us
       ORDER BY event_id, session_id"""

  /** As-of oracle, shared by the composition key (`asof_join`) and the
    * native-operator twin (`asof_join_native`): the window formulation
    * IS the independent re-derivation both implementations must match.
    */
  protected val asofJoinOracle =
    """WITH e AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                CAST(round(value * 100) AS BIGINT) AS value_cents
         FROM events),
       u AS (
         SELECT user_id, ts_us, 0 AS side,
                CAST(NULL AS BIGINT) AS l_event_id, CAST(NULL AS BIGINT) AS l_value_cents,
                event_id AS r_event_id, ts_us AS r_ts_us, value_cents AS r_value_cents
         FROM e WHERE event_type = 'view'
         UNION ALL
         SELECT user_id, ts_us, 1, event_id, value_cents,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         FROM e WHERE event_type = 'click'),
       m AS (
         SELECT *,
           last_value(r_event_id IGNORE NULLS) OVER w AS a_event_id,
           last_value(r_ts_us IGNORE NULLS) OVER w AS a_ts_us,
           last_value(r_value_cents IGNORE NULLS) OVER w AS a_value_cents
         FROM u WINDOW w AS (
           PARTITION BY user_id ORDER BY ts_us, side ROWS UNBOUNDED PRECEDING))
       SELECT l_event_id AS event_id, user_id, ts_us, l_value_cents AS value_cents,
              a_event_id AS asof_event_id, a_ts_us AS asof_ts_us,
              a_value_cents AS asof_value_cents
       FROM m WHERE side = 1 ORDER BY event_id"""

  /** Part co-purchase edges (ea < eb, co-ordered in >= 2 orders): pair
    * generation via in-order set expansion, NOT a self-join — one
    * shuffle keyed by order collects each order's part set, id-ordered
    * pairs explode in place. Per-order expansion is quadratic in ORDER
    * SIZE (bounded ~40), never in table size. Shared by the pagerank /
    * degree-histogram keys (same graph as graph_triangle_count).
    */
  protected def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
             transform(slice(pks, i + 2, size(pks) - i - 1), y -> struct(x AS ea, y AS eb))))"""))
        .as("e"))
      .select(col("e.ea"), col("e.eb"))
      .groupBy(col("ea"), col("eb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select(col("ea"), col("eb"))

  /** documents ∪ exact copies at doc_id+1e6. */
  protected def corpusWithCopies(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** documents ∪ near-copies (last two words dropped) at doc_id+1e6. */
  protected def corpusWithNearCopies(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    d.unionByName(d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
  }

  // SQL fragments shared by the oracles.
  protected val corpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL SELECT doc_id + 1000000, text FROM documents"""
  protected val nearCorpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 1000000,
              array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)"""
  protected val shinglesSql = // over a relation with (doc_id, text)
    """SELECT doc_id,
              [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)"""
  protected def mhSql(seed: Int) =
    s"list_min([substr(md5('${seed / 6}|' || x), ${(seed % 6) * 5 + 1}, 5) FOR x IN sh])"
  protected def bandSql(firstSeed: Int) =
    (firstSeed until firstSeed + 3).map(mhSql).mkString(" || ")
  /** The MinHash re-banding POLICY re-derivation (round 9), shared by
    * every oracle whose pipeline routes through
    * [[graft.ext.Dedup.minhashLshAuto]]: the 12-row signature family
    * over `rel`'s (doc_id, text), the (4 bands × 3 rows) candidate
    * budget measured in SQL exactly as the engine measures it, and
    * `acand` generating candidates at the CHOSEN banding shape only
    * (the UNION ALL arms are mutually exclusive on `decq.chosen`).
    * Pipeline oracles verify `acand` with [[jaccardSql]]; the
    * fixed-shape baseline key (`dedup_minhash_lsh`) keeps its own cand.
    */
  protected def minhashAutoCtes(rel: String): String =
    s"""shq AS (SELECT doc_id,
              [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $rel)),
       mhq AS (SELECT doc_id, sh,
              ${(0 until 12).map(i => s"${mhSql(i)} AS m$i").mkString(", ")}
              FROM shq),
       bq43 AS (SELECT sig, count(*) AS c FROM (
                  SELECT CAST(t.b AS VARCHAR) ||
                         CASE t.b WHEN 0 THEN m0 || m1 || m2
                                  WHEN 1 THEN m3 || m4 || m5
                                  WHEN 2 THEN m6 || m7 || m8
                                  ELSE m9 || m10 || m11 END AS sig
                  FROM mhq, range(4) t(b))
                WHERE sig IS NOT NULL
                GROUP BY sig),
       decq AS (SELECT CASE WHEN (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM bq43)
                                 > 8 * (SELECT count(*) FROM mhq WHERE m0 IS NOT NULL)
                            THEN CAST(6 AS INT) ELSE CAST(3 AS INT) END AS chosen),
       acand AS (
         SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
         FROM mhq a JOIN mhq b
           ON a.doc_id < b.doc_id
          AND (a.m0 || a.m1 || a.m2 = b.m0 || b.m1 || b.m2
            OR a.m3 || a.m4 || a.m5 = b.m3 || b.m4 || b.m5
            OR a.m6 || a.m7 || a.m8 = b.m6 || b.m7 || b.m8
            OR a.m9 || a.m10 || a.m11 = b.m9 || b.m10 || b.m11)
         WHERE (SELECT chosen FROM decq) = 3
         UNION ALL
         SELECT a.doc_id, b.doc_id, a.sh, b.sh
         FROM mhq a JOIN mhq b
           ON a.doc_id < b.doc_id
          AND (a.m0 || a.m1 || a.m2 || a.m3 || a.m4 || a.m5
               = b.m0 || b.m1 || b.m2 || b.m3 || b.m4 || b.m5
            OR a.m6 || a.m7 || a.m8 || a.m9 || a.m10 || a.m11
               = b.m6 || b.m7 || b.m8 || b.m9 || b.m10 || b.m11)
         WHERE (SELECT chosen FROM decq) = 6)"""

  /** The cleaning-pipeline CTE chain (quality gate → exact dedup →
    * policy-routed near-dup prune), shared by the corpus_clean_pipeline
    * and train_assembly_pipeline oracles. Expects a `corpus` CTE with
    * (doc_id, text); ends with `kept` (doc_id, text, quality_score).
    */
  protected def cleanCtes: String =
    s"""q AS (
           SELECT doc_id, text,
             least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
               + least(CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','in','to','is'))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) * 5.0, 1.0) * 0.4
               + (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE) * 10.0, 1.0)) * 0.2 AS quality_score
           FROM corpus),
         gated AS (SELECT * FROM q WHERE quality_score >= 0.3),
         ek AS (
           SELECT doc_id, text, quality_score FROM (
             SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
             FROM gated)
           WHERE doc_id = keep_id),
         ${minhashAutoCtes("ek")},
         losers AS (
           SELECT DISTINCT b_id AS doc_id FROM (
             SELECT a_id, b_id, $jaccardSql AS jaccard FROM acand)
           WHERE jaccard >= 0.5),
         kept AS MATERIALIZED (
           SELECT e.doc_id, e.text, e.quality_score
           FROM ek e LEFT JOIN losers l ON e.doc_id = l.doc_id
           WHERE l.doc_id IS NULL)"""

  /** Stages 2–4 of the capstone oracle — survivor-trained bigram LM,
    * exact n/3 and 2n/3 order statistics (MIN_LONG when the rank does
    * not exist), the portable-hash shard fold, in-shard positions —
    * over survivor relation `rel` (doc_id, text, quality_score).
    * Emits the CTE tail INCLUDING the final SELECT; shared by the
    * plain capstone oracle and the DSIR-selected variant so the
    * finishing re-derivation cannot drift between them.
    */
  protected def finishSql(rel: String): String =
    s"""wk AS (SELECT doc_id, string_split(text, ' ') AS w FROM $rel),
       bgk AS (SELECT doc_id,
                      unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS b
               FROM wk WHERE len(w) >= 2),
       kc12 AS (SELECT b, count(*) AS c12 FROM bgk GROUP BY b),
       kc1 AS (SELECT split_part(b, ' ', 1) AS w1, count(*) AS c1
               FROM bgk GROUP BY 1),
       lm AS (SELECT doc_id,
                     CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_p_ppm
              FROM (SELECT g.doc_id, kc12.c12 * 1000000 // kc1.c1 AS p_ppm
                    FROM bgk g
                    JOIN kc12 ON kc12.b = g.b
                    JOIN kc1 ON kc1.w1 = split_part(g.b, ' ', 1))
              GROUP BY doc_id),
       scored AS (SELECT k.doc_id, k.quality_score,
                         coalesce(lm.mean_p_ppm, CAST(0 AS BIGINT)) AS mean_p_ppm
                  FROM $rel k LEFT JOIN lm ON lm.doc_id = k.doc_id),
       ranked AS (SELECT mean_p_ppm,
                         row_number() OVER (ORDER BY mean_p_ppm, doc_id) AS rn
                  FROM scored),
       th AS (SELECT
                coalesce(max(CASE WHEN rn = (SELECT count(*) // 3 FROM scored)
                                  THEN mean_p_ppm END),
                         -9223372036854775807 - 1) AS t1,
                coalesce(max(CASE WHEN rn = (SELECT 2 * count(*) // 3 FROM scored)
                                  THEN mean_p_ppm END),
                         -9223372036854775807 - 1) AS t2
              FROM ranked),
       hs AS (SELECT doc_id,
                     list_reduce(
                       [CAST(ascii(ch) AS BIGINT) FOR ch IN
                         regexp_extract_all(md5('shard|' || CAST(doc_id AS VARCHAR)), '.')],
                       (a, b) -> (a * 31 + b) % 1000000007) AS sort_key
              FROM scored)
       SELECT s.doc_id, s.quality_score, s.mean_p_ppm,
              CAST(CASE WHEN s.mean_p_ppm <= th.t1 THEN 1
                        WHEN s.mean_p_ppm <= th.t2 THEN 2
                        ELSE 3 END AS INT) AS fluency_band,
              hs.sort_key % 8 AS shard,
              CAST(row_number() OVER (PARTITION BY hs.sort_key % 8
                ORDER BY hs.sort_key, s.doc_id) AS BIGINT) AS position
       FROM scored s JOIN hs ON hs.doc_id = s.doc_id, th
       ORDER BY s.doc_id"""

  protected val jaccardSql = // over (ash, bsh)
    """CAST(len(list_distinct(ash)) + len(list_distinct(bsh))
            - len(list_distinct(list_concat(ash, bsh))) AS DOUBLE)
       / CAST(len(list_distinct(list_concat(ash, bsh))) AS DOUBLE)"""
  protected val quantSql =
    "SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q FROM embeddings"
  protected def qcosSql(a: String, b: String) =
    s"""CAST(list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE)
        / (sqrt(CAST(list_sum([$a[i] * $a[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE))
           * sqrt(CAST(list_sum([$b[i] * $b[i] FOR i IN range(1, len($b) + 1)]) AS DOUBLE)))"""

  /** One NN-descent refinement CTE pair: candidates from `g` (current ∪
    * reverse ∪ neighbors-of-neighbors). Assumes a CTE `q` (vec_id, q).
    */
  protected def nndCandSql(g: String): String =
    s"""WITH u AS (SELECT src, dst FROM $g UNION SELECT dst, src FROM $g)
        SELECT src, dst FROM u
        UNION SELECT x.src, y.dst FROM u x JOIN u y
              ON y.src = x.dst AND y.dst <> x.src"""

  protected def nndTopKSql(cand: String, k: Int): String =
    s"""SELECT src, dst, cosine, rank FROM (
          SELECT src, dst, cosine,
                 CAST(row_number() OVER (PARTITION BY src
                   ORDER BY cosine DESC, dst) AS INT) AS rank
          FROM (SELECT c.src, c.dst, ${qcosSql("a.q", "b.q")} AS cosine
                FROM ($cand) c
                JOIN q a ON a.vec_id = c.src
                JOIN q b ON b.vec_id = c.dst))
        WHERE rank <= $k"""

  /** The full 2-round NN-descent CTE chain at top-`k` — i0/c0/g0/g1/g2
    * (id-successor init symmetrized, two candidate-expansion + exact
    * cosine top-k rounds), mirroring [[graft.ext.Similarity.nnDescent]]
    * with rounds = 2. Emits the CTE definitions only (no leading WITH,
    * no trailing comma); the final graph is `g2` (src, dst, cosine,
    * rank).
    */
  protected def nndChainSql(k: Int): String =
    s"""i0 AS (SELECT a.vec_id AS src, b.vec_id AS dst
              FROM q a
              JOIN range($k) t(o) ON TRUE
              JOIN q b ON b.vec_id = a.vec_id + CAST(t.o + 1 AS BIGINT)),
       c0 AS (SELECT src, dst FROM i0 UNION SELECT dst, src FROM i0),
       g0 AS (${nndTopKSql("SELECT src, dst FROM c0", k)}),
       g1 AS (${nndTopKSql(nndCandSql("g0"), k)}),
       g2 AS (${nndTopKSql(nndCandSql("g1"), k)})"""

  // ---------------------------------------------------------------------
}
