package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis, TrainPrep}

/** Round-12 registry keys.
  *
  * 1. `embedding_dim_covariance` — the feature-decorrelation audit:
  *    top-32 most-covarying dimension pairs via the native mergeable
  *    Gram accumulator ([[graft.functions.GramMatrix]] — ONE corpus
  *    scan, one buffer shuffled, driver-local BigInt finish). The
  *    oracle pays the compositional price on purpose: explode to
  *    (vec, i, j) rows and hash-aggregate — n·d²/2 intermediate rows
  *    re-deriving the same exact integers.
  * 2. `dedup_cross_doc_spans` — span-level exact dedup (Lee et al.
  *    2021): w-token spans keyed by the portable hash; a key in ≥2
  *    distinct docs is duplicated text; per-doc duplicated-span ppm +
  *    contamination flag. Runs on the planted-near-copy corpus so the
  *    flag column is organically non-constant.
  * 3. `multimodal_gif_decode` — the LZW entropy coding at the image
  *    decode seam (BMP=raw, PNG=DEFLATE, JPEG=DCT; GIF completes the
  *    set): explicit-palette GIF encode is lossless on the ≤128-color
  *    seeded rasters, so the key pins to the SAME pixel-stats oracle
  *    as BMP/PNG — the pixel contract is format-independent.
  */
object Queries12 extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "embedding_dim_covariance" -> ((s, dir) =>
      Similarity.dimCovariance(t(s, dir, "embeddings"), topK = 32)
        .orderBy("rank")),

    // the diagonal view of the same Gram buffer: per-dim exact
    // variance numerators, dead-dimension audit
    "embedding_dim_variance" -> ((s, dir) =>
      Similarity.dimVariance(t(s, dir, "embeddings"))
        .orderBy("rank")),

    "dedup_cross_doc_spans" -> ((s, dir) =>
      Dedup.crossDocSpans(corpusWithNearCopies(s, dir), w = 5)
        .orderBy("doc_id")),

    "multimodal_gif_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeImageBatch(
          Multimodal.gifFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // curriculum assembly: rarity-dominant integer difficulty,
    // histogram-order-statistic quartile phases (the capstone tercile
    // convention), per-phase deterministic ordering
    "curriculum_phases" -> ((s, dir) =>
      TrainPrep.curriculumPhases(t(s, dir, "documents"), phases = 4)
        .orderBy("doc_id")),

    // BPE merge-rule training (Sennrich et al. 2016): 4 rounds of
    // count-pairs -> merge-argmax over the word-frequency table —
    // every round re-derived in DuckDB including the greedy
    // left-to-right merge fold
    "bpe_train_merges" -> ((s, dir) =>
      TextAnalysis.bpeTrainMerges(t(s, dir, "documents"), rounds = 4)
        .orderBy("round")),

    // the trained tokenizer's vocabulary view: top symbols by weighted
    // occurrence AFTER the 4 learned merges are applied corpus-wide
    "bpe_vocab_topk" -> ((s, dir) =>
      TextAnalysis.bpeVocabTopK(t(s, dir, "documents"), rounds = 4, k = 16)
        .orderBy("rank")),
  )

  /** One BPE round as CTE text: pair counts over `prev`, the argmax
    * merge, and the fold-applied next symbol table. The fold is the
    * same greedy left-to-right pass the engine runs (append `mb`
    * separator-less when the accumulator's last space-bounded symbol
    * is exactly `ma`). The symbol table chains through a LEFT JOIN ON
    * TRUE: on a pair-EXHAUSTED corpus m$i is empty, the merge columns
    * come back NULL, and every word passes through unchanged — the
    * engine's early stop (the merge-row UNION is naturally empty for
    * the exhausted rounds on both sides).
    */
  private def bpeRound(i: Int, prev: String): String =
    s"""p$i AS (
         SELECT pair, CAST(sum(freq) AS BIGINT) AS c
         FROM (SELECT freq,
                      unnest([ss[j] || ' ' || ss[j + 1] FOR j IN range(1, len(ss))]) AS pair
               FROM (SELECT freq, string_split(s, ' ') AS ss FROM $prev))
         GROUP BY pair),
       m$i AS (
         SELECT ma, mb, c FROM (
           SELECT string_split(pair, ' ')[1] AS ma,
                  string_split(pair, ' ')[2] AS mb, c
           FROM p$i)
         ORDER BY c DESC, ma, mb LIMIT 1),
       s$i AS (
         SELECT t.freq,
                CASE WHEN m.ma IS NULL THEN t.s
                     ELSE list_reduce(string_split(t.s, ' '),
                       (acc, x) -> CASE WHEN x = m.mb AND
                                            (acc = m.ma OR ends_with(acc, ' ' || m.ma))
                                        THEN acc || x
                                        ELSE acc || ' ' || x END) END AS s
         FROM $prev t LEFT JOIN m$i m ON TRUE)"""

  val oracles: Map[String, String] = Map(

    // word-frequency table once, then 4 unrolled rounds of
    // count/argmax/fold — the tie rule (c DESC, ma, mb) matches the
    // engine's (n_pairs DESC, a, b)
    "bpe_train_merges" ->
      s"""WITH w0 AS (
           SELECT w, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE len(w) > 0 GROUP BY w),
         s0 AS (
           SELECT freq, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
           FROM w0),
         ${bpeRound(1, "s0")},
         ${bpeRound(2, "s1")},
         ${bpeRound(3, "s2")},
         ${bpeRound(4, "s3")}
         SELECT * FROM (
           SELECT 1 AS round, ma AS sym_a, mb AS sym_b,
                  ma || mb AS merged, c AS pair_count FROM m1
           UNION ALL SELECT 2, ma, mb, ma || mb, c FROM m2
           UNION ALL SELECT 3, ma, mb, ma || mb, c FROM m3
           UNION ALL SELECT 4, ma, mb, ma || mb, c FROM m4)
         ORDER BY round""",

    // same unrolled training chain, finished over s4 (the post-merge
    // symbol table) instead of the merge rows
    "bpe_vocab_topk" ->
      s"""WITH w0 AS (
           SELECT w, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE len(w) > 0 GROUP BY w),
         s0 AS (
           SELECT freq, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
           FROM w0),
         ${bpeRound(1, "s0")},
         ${bpeRound(2, "s1")},
         ${bpeRound(3, "s2")},
         ${bpeRound(4, "s3")}
         SELECT rank, symbol, n_occ FROM (
           SELECT symbol, CAST(sum(freq) AS BIGINT) AS n_occ,
                  CAST(row_number() OVER (
                    ORDER BY sum(freq) DESC, symbol) AS INT) AS rank
           FROM (SELECT freq, unnest(string_split(s, ' ')) AS symbol FROM s4)
           GROUP BY symbol)
         WHERE rank <= 16 ORDER BY rank""",

    // quadratic-in-d compositional re-derivation of the one-pass Gram
    // fold: explode dims, self-join within vec_id, aggregate — same
    // exact integers, independently arrived at. HUGEINT intermediates
    // (the finish multiplies three BIGINT-scale sums).
    "embedding_dim_covariance" ->
      """WITH q AS (
           SELECT vec_id,
                  [CAST(round(CAST(v AS DOUBLE) * 1e3) AS BIGINT) FOR v IN embedding] AS q
           FROM embeddings),
         x AS (
           SELECT vec_id,
                  CAST(s['d'] AS INT) AS d,
                  CAST(s['v'] AS BIGINT) AS v
           FROM (SELECT vec_id,
                        unnest([struct_pack(d := i, v := q[i + 1])
                                FOR i IN range(0, len(q))]) AS s
                 FROM q)),
         p AS (
           SELECT a.d AS dim_i, b.d AS dim_j,
                  CAST(sum(a.v * b.v) AS HUGEINT) AS sxy
           FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.d < b.d
           GROUP BY 1, 2),
         s AS (SELECT d, CAST(sum(v) AS HUGEINT) AS sx FROM x GROUP BY d),
         n AS (SELECT CAST(count(*) AS HUGEINT) AS n_rows FROM embeddings),
         c AS (
           SELECT p.dim_i, p.dim_j,
                  CAST(n.n_rows * p.sxy - si.sx * sj.sx AS BIGINT) AS cov_num,
                  CAST(n.n_rows AS BIGINT) AS n_rows
           FROM p
           JOIN s si ON si.d = p.dim_i
           JOIN s sj ON sj.d = p.dim_j
           CROSS JOIN n),
         r AS (
           SELECT *, CAST(row_number() OVER (
                    ORDER BY abs(cov_num) DESC, dim_i, dim_j) AS INT) AS rank
           FROM c)
         SELECT rank, dim_i, dim_j, cov_num, n_rows
         FROM r WHERE rank <= 32 ORDER BY rank""",

    // linear per-dim re-derivation (no self-join needed for the
    // diagonal); HUGEINT intermediates for the n·Σx²−(Σx)² finish
    "embedding_dim_variance" ->
      """WITH q AS (
           SELECT vec_id,
                  [CAST(round(CAST(v AS DOUBLE) * 1e3) AS BIGINT) FOR v IN embedding] AS q
           FROM embeddings),
         x AS (
           SELECT CAST(s['d'] AS INT) AS d, CAST(s['v'] AS BIGINT) AS v
           FROM (SELECT unnest([struct_pack(d := i, v := q[i + 1])
                               FOR i IN range(0, len(q))]) AS s
                 FROM q)),
         a AS (
           SELECT d, CAST(sum(v) AS HUGEINT) AS sx,
                  CAST(sum(v * v) AS HUGEINT) AS sxx,
                  CAST(count(*) AS HUGEINT) AS n
           FROM x GROUP BY d),
         c AS (
           SELECT d AS dim, CAST(n * sxx - sx * sx AS BIGINT) AS var_num,
                  CAST(n AS BIGINT) AS n_rows
           FROM a)
         SELECT CAST(row_number() OVER (ORDER BY var_num DESC, dim) AS INT) AS rank,
                dim, var_num, n_rows
         FROM c ORDER BY rank""",

    // spans re-keyed by the portable-hash twin (md5-hex fold); the
    // duplicated-key set and per-doc ratios re-derived relationally
    "dedup_cross_doc_spans" ->
      s"""WITH corpus AS ($nearCorpusSql),
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         g AS (
           SELECT DISTINCT doc_id,
                  list_reduce(
                    [CAST(ascii(ch) AS BIGINT) FOR ch IN
                      regexp_extract_all(md5(gram), '.')],
                    (a, b) -> (a * 31 + b) % 1000000007) AS h
           FROM (SELECT doc_id,
                        unnest([array_to_string(w[i + 1:i + 5], ' ')
                                FOR i IN range(0, greatest(len(w) - 4, 0))]) AS gram
                 FROM w)),
         d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
         pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
                FROM g GROUP BY doc_id),
         dd AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
                FROM g JOIN d USING (h) GROUP BY g.doc_id)
         SELECT c.doc_id,
                coalesce(pd.n_spans, 0) AS n_spans,
                coalesce(dd.n_dup_spans, 0) AS n_dup_spans,
                CASE WHEN coalesce(pd.n_spans, 0) > 0
                     THEN CAST(coalesce(dd.n_dup_spans, 0) * 1000000
                               // pd.n_spans AS BIGINT)
                     ELSE 0 END AS dup_ppm,
                CASE WHEN coalesce(pd.n_spans, 0) > 0
                     THEN CAST(coalesce(dd.n_dup_spans, 0) * 1000000
                               // pd.n_spans AS BIGINT)
                     ELSE 0 END >= 300000 AS is_contaminated
         FROM corpus c
         LEFT JOIN pd ON pd.doc_id = c.doc_id
         LEFT JOIN dd ON dd.doc_id = c.doc_id
         ORDER BY c.doc_id""",

    // GIF is lossless under the explicit exact palette -> identical
    // pixel-stats oracle as the BMP/PNG tiers
    "multimodal_gif_decode" -> ExtQueriesMedia.oracles("multimodal_bmp_decode"),

    // quartile thresholds re-derived as RANKED order statistics
    // (rn = k·n//4) — the independent formulation of the engine's
    // histogram-cum-sum gate; absent ranks (k·n//4 = 0) leave the
    // threshold NULL and the band predicate vacuous, mirroring the
    // engine's MIN_LONG guard
    "curriculum_phases" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_occ
                  FROM tok GROUP BY tok),
         r AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(sum(CASE WHEN n_occ < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
           FROM tok JOIN freq USING (tok) GROUP BY doc_id),
         s AS (
           SELECT d.doc_id,
                  coalesce(r.n_tokens, 0) AS n_tokens,
                  CASE WHEN coalesce(r.n_tokens, 0) > 0
                       THEN CAST(coalesce(r.n_rare, 0) * 1000000 // r.n_tokens AS BIGINT)
                       ELSE 0 END AS rare_ppm
           FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id),
         sc AS (
           SELECT doc_id, n_tokens, rare_ppm,
                  CAST(rare_ppm * 4096 + least(n_tokens, 4095) AS BIGINT) AS difficulty
           FROM s),
         rk AS (
           SELECT sc.*, row_number() OVER (ORDER BY difficulty, doc_id) AS rn,
                  CAST(count(*) OVER () AS BIGINT) AS n
           FROM sc),
         t AS (
           SELECT max(CASE WHEN rn = 1 * n // 4 THEN difficulty END) AS t1,
                  max(CASE WHEN rn = 2 * n // 4 THEN difficulty END) AS t2,
                  max(CASE WHEN rn = 3 * n // 4 THEN difficulty END) AS t3
           FROM rk),
         p AS (
           SELECT rk.doc_id, rk.n_tokens, rk.rare_ppm, rk.difficulty,
                  CASE WHEN t.t1 IS NOT NULL AND rk.difficulty <= t.t1 THEN 1
                       WHEN t.t2 IS NOT NULL AND rk.difficulty <= t.t2 THEN 2
                       WHEN t.t3 IS NOT NULL AND rk.difficulty <= t.t3 THEN 3
                       ELSE 4 END AS phase
           FROM rk, t)
         SELECT doc_id, n_tokens, rare_ppm, difficulty, phase,
                CAST(row_number() OVER (PARTITION BY phase
                  ORDER BY difficulty, doc_id) AS BIGINT) AS position
         FROM p ORDER BY doc_id""",
  )
}
