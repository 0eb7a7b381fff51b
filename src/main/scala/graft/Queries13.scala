package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis, TrainPrep}

/** Round-13 registry keys.
  *
  * 1. `dedup_span_excise` — the INTERVENTION round-12's
  *    `dedup_cross_doc_spans` audit exists for (Lee et al. 2021
  *    "ExactSubstr" dedup): duplicated w-token spans are REMOVED from
  *    every document except the corpus-wide first occurrence; emits
  *    cleaned text + removal accounting per document. Runs on the
  *    planted-near-copy corpus, where the copies lose essentially all
  *    their text and the originals keep theirs.
  */
object Queries13 extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_span_excise" -> ((s, dir) =>
      Dedup.spanExcise(corpusWithNearCopies(s, dir), w = 5)
        .orderBy("doc_id")),

    // curriculum -> packing composition: phases band easy->hard, the
    // concat-then-chunk packer runs WITHIN each (phase, bucket) in
    // curriculum order — a pack never mixes phases
    "curriculum_pack" -> ((s, dir) =>
      TrainPrep.curriculumPack(t(s, dir, "documents"),
          phases = 4, tokenBudget = 2048, buckets = 8)
        .orderBy("doc_id")),

    // the manifest view a phase-sharded training run records
    "curriculum_pack_manifest" -> ((s, dir) =>
      TrainPrep.curriculumPackManifest(t(s, dir, "documents"),
          phases = 4, tokenBudget = 2048, buckets = 8)
        .orderBy("phase", "bucket", "pack_id")),

    // BPE training at depth: 16 batched passes x up to 8 mutually
    // symbol-disjoint merges per pass (the scalable-trainer schedule —
    // driver round-trips per MERGE drop 8x); every pass's ranked
    // prefix, conflict-free selection, and batch fold re-derived in
    // DuckDB
    "bpe_train_merges_deep" -> ((s, dir) =>
      TextAnalysis.bpeTrainMergesBatched(t(s, dir, "documents"),
          passes = 16, kBatch = 8, window = 32)
        .orderBy("merge_idx")),

    // the Gram-buffer consumer: top-2 principal directions by
    // integer-grid power iteration + Hotelling deflation, driver-side
    // d x d model state from the ONE-pass native aggregate
    "embedding_pca_components" -> ((s, dir) =>
      Similarity.pcaComponents(t(s, dir, "embeddings"), k = 2, iters = 12)
        .orderBy("component", "dim")),

    // map-side whitening projection: exact centered projection
    // numerators per vector onto the learned directions - one
    // codegen'd scan, zero shuffles
    "embedding_pca_project" -> ((s, dir) =>
      Similarity.pcaProject(t(s, dir, "embeddings"), k = 2, iters = 12)
        .orderBy("vec_id")),

    // the numerators divided to unit component variance on the 1e6
    // grid: sigma = isqrt(lambda) is exact on both engines because
    // sum_rows(pc_num^2) = n * (v'Cv) identically - the eigen loop's
    // own Rayleigh numerator is the whitening divisor, no second pass
    "embedding_pca_whiten" -> ((s, dir) =>
      Similarity.pcaWhitenProject(t(s, dir, "embeddings"), k = 2, iters = 12)
        .orderBy("vec_id")),

    // the A/B that makes the PCA tier actionable: top-5 recall of the
    // PCA-16 projection vs exact full-width cosine, the knn_rp_recall
    // twin at equal dims (measured: ~16x RP-16's recall at sf0.01)
    "knn_pca_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pcaRecall(e, e.filter(col("vec_id") < 16), dims = 16)
        .orderBy("q_id")
    }),
  )

  /** One integer-grid power-iteration round as CTE text: exact matvec
    * over the covariance relation, infinity-norm rescale to the 1e6
    * grid (negatives divided as -((-x)//m) — truncation direction
    * engine-independent), zero matvec keeps the previous vector.
    */
  private def pcaIter(tag: String, i: Int, prevV: String, cm: String): String =
    s"""u$tag$i AS MATERIALIZED (
         SELECT c.i AS d, CAST(sum(c.c * p.vv) AS HUGEINT) AS uu
         FROM $cm c JOIN $prevV p ON p.d = c.j GROUP BY c.i),
       mx$tag$i AS (SELECT max(abs(uu)) AS m FROM u$tag$i),
       v$tag$i AS MATERIALIZED (
         SELECT u.d, CASE WHEN mx.m = 0 THEN p.vv
                          WHEN u.uu >= 0 THEN (u.uu * 1000000) // mx.m
                          ELSE -((-u.uu * 1000000) // mx.m) END AS vv
         FROM u$tag$i u JOIN $prevV p ON p.d = u.d CROSS JOIN mx$tag$i mx)"""

  /** One full PCA component chain: `iters` power-iteration rounds over
    * covariance relation `cm`, the first-nonzero-positive sign fix
    * (-> `w$tag`), and — when `deflateTo` is set — the two-step
    * integer Hotelling deflation producing the next covariance
    * relation.
    */
  private def pcaComponent(
      tag: String, cm: String, iters: Int, deflateTo: Option[String]): String = {
    val chain = (1 to iters).map(i =>
      pcaIter(tag, i, if (i == 1) s"v${tag}0" else s"v$tag${i - 1}", cm))
    val last = s"v$tag$iters"
    val defl = deflateTo.map { nxt =>
      s""",
       dn$tag AS (SELECT CAST(sum(vv * vv) AS HUGEINT) AS den FROM w$tag),
       lm$tag AS (
         SELECT CAST(sum(wa.vv * c.c * wb.vv) AS HUGEINT) AS lam
         FROM $cm c JOIN w$tag wa ON wa.d = c.i JOIN w$tag wb ON wb.d = c.j),
       ad$tag AS (
         SELECT w.d, CASE WHEN l.lam * w.vv >= 0 THEN (l.lam * w.vv) // dd.den
                          ELSE -((-(l.lam * w.vv)) // dd.den) END AS av
         FROM w$tag w CROSS JOIN lm$tag l CROSS JOIN dn$tag dd),
       $nxt AS MATERIALIZED (
         SELECT c.i, c.j,
                c.c - (CASE WHEN a.av * w.vv >= 0 THEN (a.av * w.vv) // dd.den
                            ELSE -((-(a.av * w.vv)) // dd.den) END) AS c
         FROM $cm c JOIN ad$tag a ON a.d = c.i JOIN w$tag w ON w.d = c.j
         CROSS JOIN dn$tag dd)"""
    }.getOrElse("")
    s"""v${tag}0 AS (SELECT d, CAST(1000000 AS HUGEINT) AS vv FROM dims),
       ${chain.mkString(",\n       ")},
       fz$tag AS (SELECT min(d) AS fd FROM $last WHERE vv <> 0),
       w$tag AS MATERIALIZED (
         SELECT v.d, v.vv * (CASE WHEN coalesce(
                  (SELECT t.vv FROM $last t JOIN fz$tag f ON t.d = f.fd), 1) < 0
                THEN -1 ELSE 1 END) AS vv
         FROM $last v)$defl"""
  }

  /** Shared base of the two PCA oracles: quantized/exploded corpus,
    * per-dim sums, n, and the full symmetric covariance numerator
    * matrix as relation cf1(i, j, c), then both component chains.
    */
  private def pcaChainsSql(iters: Int): String = pcaChainsSqlK(iters, 2)

  /** The generalized `comps`-component form: the shared base CTEs plus
    * one [[pcaComponent]] chain per component, each deflating into the
    * next component's covariance relation (the engine's exact loop,
    * unrolled `comps` times).
    */
  private[graft] def pcaChainsSqlK(iters: Int, comps: Int): String =
    s"""q AS (
         SELECT vec_id,
                [CAST(round(CAST(v AS DOUBLE) * 1e3) AS BIGINT) FOR v IN embedding] AS q
         FROM embeddings),
       x AS MATERIALIZED (
         SELECT vec_id, CAST(s['d'] AS INT) AS d, CAST(s['v'] AS BIGINT) AS v
         FROM (SELECT vec_id,
                      unnest([struct_pack(d := i, v := q[i + 1])
                              FOR i IN range(0, len(q))]) AS s
               FROM q)),
       s AS (SELECT d, CAST(sum(v) AS HUGEINT) AS sx FROM x GROUP BY d),
       nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
       dims AS (SELECT DISTINCT d FROM x),
       pp AS MATERIALIZED (
         SELECT a.d AS i, b.d AS j,
                CAST(sum(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS sxy
         FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.d, b.d),
       cf1 AS MATERIALIZED (
         SELECT p.i, p.j, CAST(nn.n * p.sxy - si.sx * sj.sx AS HUGEINT) AS c
         FROM pp p JOIN s si ON si.d = p.i JOIN s sj ON sj.d = p.j
         CROSS JOIN nn),
       ${(1 to comps).map(c => pcaComponent(pcaTag(c), s"cf$c", iters,
           if (c < comps) Some(s"cf${c + 1}") else None)).mkString(",\n       ")}"""

  /** Component tags: "1"/"2" keep the names the two-component oracles
    * reference (w1, w2, lm1); components ≥ 3 get an "x" separator so
    * generated CTE names never collide across (tag, iteration) digit
    * boundaries (v1 iter 10 vs v11 iter 0 both read "v110" otherwise).
    */
  private[graft] def pcaTag(c: Int): String = if (c <= 2) s"$c" else s"${c}x"

  /** The exact-isqrt → whitening-divisor chain as CTE text: two Newton
    * steps off the float sqrt seed (the seed is within ~1e3 of the
    * true root at HUGEINT magnitudes; one Newton step lands within 1,
    * the second pins it), then the max candidate c in ±2 with c² ≤ λ —
    * exact integer sqrt without trusting float rounding — and the
    * divisor `max(σ // 1e6, 1)` (the engine's
    * `BigInteger.sqrt` twin). λ ≤ 0 degenerates to sden = 1, the
    * engine's branch.
    */
  private def sdenSql(tag: String, lamRel: String): String =
    s"""q0$tag AS (
         SELECT greatest(lam, 0) AS l,
                CAST(greatest(floor(sqrt(CAST(greatest(lam, 0) AS DOUBLE))), 1)
                  AS HUGEINT) AS s0
         FROM $lamRel),
       q1$tag AS (SELECT l, (s0 + l // s0) // 2 AS s1 FROM q0$tag),
       q2$tag AS (SELECT l, CASE WHEN s1 > 0 THEN (s1 + l // s1) // 2
                                 ELSE CAST(0 AS HUGEINT) END AS s2 FROM q1$tag),
       sd$tag AS (
         SELECT greatest(list_max([c FOR c IN [s2 - 2, s2 - 1, s2, s2 + 1, s2 + 2]
                  IF c >= 0 AND c * c <= l]) // 1000000, 1) AS sden
         FROM q2$tag)"""

  /** One batched BPE pass as CTE text: pair counts over `prev`, the
    * ranked top-`window` prefix, the strict conflict-free selection
    * (NO symbol shared with ANY higher-ranked prefix pair — a windowed
    * NOT EXISTS, deliberately relational), and the one-fold batch
    * application with the selected rules captured as a struct list
    * (empty list on an exhausted corpus ⇒ words pass through, the
    * engine's early stop).
    */
  private[graft] def bpeBatchPass(i: Int, prev: String, window: Int, kBatch: Int): String =
    s"""p$i AS MATERIALIZED (
         SELECT string_split(pair, ' ')[1] AS a,
                string_split(pair, ' ')[2] AS b,
                CAST(sum(freq) AS BIGINT) AS c
         FROM (SELECT freq,
                      unnest([ss[j] || ' ' || ss[j + 1] FOR j IN range(1, len(ss))]) AS pair
               FROM (SELECT freq, string_split(s, ' ') AS ss FROM $prev))
         GROUP BY pair),
       r$i AS MATERIALIZED (
         SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
         FROM p$i QUALIFY rk <= $window),
       b$i AS MATERIALIZED (
         SELECT a AS ma, b AS mb, c, row_number() OVER (ORDER BY rk) AS sel_rank
         FROM r$i p
         WHERE NOT EXISTS (SELECT 1 FROM r$i q WHERE q.rk < p.rk
                AND (q.a IN (p.a, p.b) OR q.b IN (p.a, p.b)))
         QUALIFY sel_rank <= $kBatch),
       m$i AS MATERIALIZED (
         SELECT coalesce(list(struct_pack(ma := ma, mb := mb) ORDER BY sel_rank),
                CAST([] AS STRUCT(ma VARCHAR, mb VARCHAR)[])) AS ms FROM b$i),
       s$i AS MATERIALIZED (
         SELECT t.freq,
                list_reduce(string_split(t.s, ' '), (acc, x) ->
                  CASE WHEN len([m FOR m IN ms IF m['mb'] = x AND
                         (acc = m['ma'] OR ends_with(acc, ' ' || m['ma']))]) > 0
                       THEN acc || x ELSE acc || ' ' || x END) AS s
         FROM $prev t CROSS JOIN m$i)"""

  /** The curriculum difficulty/threshold/phase chain as CTE text —
    * re-derived here (ranked order statistics, the independent
    * formulation of the engine's histogram-cum-sum gate) and shared by
    * the two packing oracles; ends with relation `p`(doc_id, n_tokens,
    * rare_ppm, difficulty, phase).
    */
  private val curriculumCtes =
    """tok AS (
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
         FROM rk, t)"""

  /** The packing tail over `p` — (phase, bucket)-partitioned running
    * token sum in curriculum order, pack = budget chunk of the
    * concatenated stream (the sequence_packing convention).
    */
  private val packCtes =
    """pk AS (
         SELECT doc_id, phase, doc_id % 8 AS bucket, n_tokens, difficulty
         FROM p),
       c AS (
         SELECT doc_id, phase, bucket, n_tokens,
                CAST(sum(n_tokens) OVER (PARTITION BY phase, bucket
                  ORDER BY difficulty, doc_id) AS BIGINT) AS cum_tokens
         FROM pk),
       packed AS (
         SELECT doc_id, phase, bucket, n_tokens, cum_tokens,
                CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS pack_id
         FROM c)"""

  val oracles: Map[String, String] = Map(

    // occurrence-grain re-derivation: spans re-keyed by the
    // portable-hash twin, first-occurrence rank + cross-doc test as
    // window functions, covered positions exploded and removed, text
    // rebuilt with an ordered list aggregation
    "dedup_span_excise" ->
      s"""WITH corpus AS ($nearCorpusSql),
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         occ AS (
           SELECT doc_id, CAST(s['pos'] AS INT) AS pos,
                  list_reduce(
                    [CAST(ascii(ch) AS BIGINT) FOR ch IN
                      regexp_extract_all(md5(s['g']), '.')],
                    (a, b) -> (a * 31 + b) % 1000000007) AS h
           FROM (SELECT doc_id,
                        unnest([struct_pack(
                            pos := i,
                            g := array_to_string(w[i + 1:i + 5], ' '))
                          FOR i IN range(0, greatest(len(w) - 4, 0))]) AS s
                 FROM w)),
         ex AS (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk,
                    min(doc_id) OVER (PARTITION BY h)
                      <> max(doc_id) OVER (PARTITION BY h) AS cross_doc
             FROM occ)
           WHERE cross_doc AND rk >= 2),
         cov AS (
           SELECT DISTINCT doc_id, pos + u AS pos
           FROM ex CROSS JOIN (SELECT unnest(range(0, 5)) AS u)),
         tok AS (
           SELECT doc_id, CAST(s['pos'] AS INT) AS pos, s['tok'] AS tok
           FROM (SELECT doc_id,
                        unnest([struct_pack(pos := i, tok := w[i + 1])
                                FOR i IN range(0, len(w))]) AS s
                 FROM w)),
         keep AS (
           SELECT t.doc_id, t.pos, t.tok FROM tok t
           WHERE NOT EXISTS (SELECT 1 FROM cov c
                             WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
         rb AS (
           SELECT doc_id,
                  array_to_string(list(tok ORDER BY pos), ' ') AS text_clean,
                  CAST(count(*) AS BIGINT) AS n_kept
           FROM keep GROUP BY doc_id),
         nx AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_excised
                FROM ex GROUP BY doc_id),
         base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                         CAST(length(array_to_string(w, ' ')) AS BIGINT) AS ln
                  FROM w)
         SELECT b.doc_id,
                coalesce(rb.text_clean, '') AS text_clean,
                b.n_tokens,
                CAST(b.n_tokens - coalesce(rb.n_kept, 0) AS BIGINT)
                  AS n_tokens_removed,
                coalesce(nx.n_spans_excised, 0) AS n_spans_excised,
                CAST(b.ln - length(coalesce(rb.text_clean, '')) AS BIGINT)
                  AS chars_removed
         FROM base b
         LEFT JOIN rb ON rb.doc_id = b.doc_id
         LEFT JOIN nx ON nx.doc_id = b.doc_id
         ORDER BY b.doc_id""",

    "curriculum_pack" ->
      s"""WITH $curriculumCtes,
         $packCtes
         SELECT doc_id, phase, bucket, n_tokens, cum_tokens, pack_id
         FROM packed ORDER BY doc_id""",

    "curriculum_pack_manifest" ->
      s"""WITH $curriculumCtes,
         $packCtes
         SELECT phase, bucket, pack_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
                CAST(sum(doc_id) AS BIGINT) AS id_checksum,
                CAST(sum(n_tokens) * 1000000 // 2048 AS BIGINT) AS fill_ppm
         FROM packed
         GROUP BY phase, bucket, pack_id
         ORDER BY phase, bucket, pack_id""",

    // the word-frequency collapse once, then 16 unrolled batched
    // passes; the merge table re-assembled in (pass, rank) order
    "bpe_train_merges_deep" -> {
      val passes = (1 to 16).map(i => bpeBatchPass(i, s"s${i - 1}", 32, 8))
      val union = (1 to 16).map(i =>
        s"SELECT $i AS pass, sel_rank, ma, mb, c FROM b$i")
        .mkString("\n           UNION ALL ")
      s"""WITH w0 AS (
           SELECT w, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE len(w) > 0 GROUP BY w),
         s0 AS (
           SELECT freq, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
           FROM w0),
         ${passes.mkString(",\n         ")}
         SELECT CAST(row_number() OVER (ORDER BY pass, sel_rank) AS INT) AS merge_idx,
                pass, ma AS sym_a, mb AS sym_b, ma || mb AS merged,
                c AS pair_count
         FROM ($union)
         ORDER BY merge_idx"""
    },

    // the same pinned procedure (12 infinity-norm power rounds per
    // component, two-step integer deflation) unrolled in SQL — the
    // independent arrival at the identical integer weights
    "embedding_pca_components" ->
      s"""WITH ${pcaChainsSql(12)}
         SELECT component, dim, weight FROM (
           SELECT 1 AS component, d AS dim, CAST(vv AS BIGINT) AS weight FROM w1
           UNION ALL
           SELECT 2, d, CAST(vv AS BIGINT) FROM w2)
         ORDER BY component, dim""",

    "embedding_pca_project" ->
      s"""WITH ${pcaChainsSql(12)},
         c1s AS (SELECT CAST(sum(s.sx * w.vv) AS HUGEINT) AS cc
                 FROM s JOIN w1 w ON w.d = s.d),
         c2s AS (SELECT CAST(sum(s.sx * w.vv) AS HUGEINT) AS cc
                 FROM s JOIN w2 w ON w.d = s.d),
         pr AS (
           SELECT x.vec_id,
                  CAST(sum(CAST(x.v AS HUGEINT) * a.vv) AS HUGEINT) AS d1,
                  CAST(sum(CAST(x.v AS HUGEINT) * b.vv) AS HUGEINT) AS d2
           FROM x JOIN w1 a ON a.d = x.d JOIN w2 b ON b.d = x.d
           GROUP BY x.vec_id)
         SELECT p.vec_id,
                CAST(nn.n * p.d1 - c1s.cc AS BIGINT) AS pc1_num,
                CAST(nn.n * p.d2 - c2s.cc AS BIGINT) AS pc2_num,
                CAST(nn.n AS BIGINT) AS n_rows
         FROM pr p CROSS JOIN nn CROSS JOIN c1s CROSS JOIN c2s
         ORDER BY p.vec_id""",

    // the projection oracle + per-component whitening divisors:
    // component 1's lambda is chain 1's own deflation numerator (lm1);
    // component 2's is the same Rayleigh form over the deflated
    // matrix; both roots taken by the exact-isqrt chain, each row then
    // divided with the truncation-direction-pinned negative route
    "embedding_pca_whiten" ->
      s"""WITH ${pcaChainsSql(12)},
         lm2w AS (
           SELECT CAST(sum(wa.vv * c.c * wb.vv) AS HUGEINT) AS lam
           FROM cf2 c JOIN w2 wa ON wa.d = c.i JOIN w2 wb ON wb.d = c.j),
         ${sdenSql("1", "lm1")},
         ${sdenSql("2", "lm2w")},
         c1s AS (SELECT CAST(sum(s.sx * w.vv) AS HUGEINT) AS cc
                 FROM s JOIN w1 w ON w.d = s.d),
         c2s AS (SELECT CAST(sum(s.sx * w.vv) AS HUGEINT) AS cc
                 FROM s JOIN w2 w ON w.d = s.d),
         pr AS (
           SELECT x.vec_id,
                  CAST(sum(CAST(x.v AS HUGEINT) * a.vv) AS HUGEINT) AS d1,
                  CAST(sum(CAST(x.v AS HUGEINT) * b.vv) AS HUGEINT) AS d2
           FROM x JOIN w1 a ON a.d = x.d JOIN w2 b ON b.d = x.d
           GROUP BY x.vec_id)
         SELECT p.vec_id,
                CAST(CASE WHEN nn.n * p.d1 - c1s.cc >= 0
                     THEN (nn.n * p.d1 - c1s.cc) // sd1.sden
                     ELSE -((-(nn.n * p.d1 - c1s.cc)) // sd1.sden) END
                  AS BIGINT) AS pc1_white,
                CAST(CASE WHEN nn.n * p.d2 - c2s.cc >= 0
                     THEN (nn.n * p.d2 - c2s.cc) // sd2.sden
                     ELSE -((-(nn.n * p.d2 - c2s.cc)) // sd2.sden) END
                  AS BIGINT) AS pc2_white,
                CAST(nn.n AS BIGINT) AS n_rows
         FROM pr p CROSS JOIN nn CROSS JOIN c1s CROSS JOIN c2s
         CROSS JOIN sd1 CROSS JOIN sd2
         ORDER BY p.vec_id""",

    // the 16-component chain (the engine's loop unrolled 16 times),
    // projections as DOUBLE arrays, cosine by per-element products +
    // left fold (list_reduce ≡ Spark's 0-init aggregate: 0+x = x), the
    // exact side identical to knn_rp_recall's ground truth
    "knn_pca_recall" -> {
      val dims = 16
      val icos =
        """CAST(list_sum([%A[i] * %B[i] FOR i IN range(1, len(%A) + 1)]) AS DOUBLE)
            / (sqrt(CAST(list_sum([%A[i] * %A[i] FOR i IN range(1, len(%A) + 1)]) AS DOUBLE))
               * sqrt(CAST(list_sum([%B[i] * %B[i] FOR i IN range(1, len(%B) + 1)]) AS DOUBLE)))"""
      def ic(a: String, b: String) = icos.replace("%A", a).replace("%B", b)
      val dnorm = "sqrt(list_reduce([x * x FOR x IN %P], (acc, v) -> acc + v))"
      def dn(p: String) = dnorm.replace("%P", p)
      def dd(a: String, b: String) =
        s"list_reduce([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)], (acc, v) -> acc + v)"
      val prCtes = (1 to dims).map(c =>
        s"""pr$c AS MATERIALIZED (
           SELECT x.vec_id, CAST(sum(CAST(x.v AS HUGEINT) * w.vv) AS HUGEINT) AS dd
           FROM x JOIN w${pcaTag(c)} w ON w.d = x.d GROUP BY x.vec_id)""").mkString(",\n         ")
      val csCtes = (1 to dims).map(c =>
        s"""cs$c AS (SELECT CAST(sum(s.sx * w.vv) AS HUGEINT) AS cc
           FROM s JOIN w${pcaTag(c)} w ON w.d = s.d)""").mkString(",\n         ")
      val projList = (1 to dims).map(c =>
        s"CAST(nn.n * pr$c.dd - cs$c.cc AS DOUBLE)").mkString(", ")
      val prJoins = (2 to dims).map(c =>
        s"JOIN pr$c ON pr$c.vec_id = pr1.vec_id").mkString(" ")
      val csJoins = (1 to dims).map(c => s"CROSS JOIN cs$c").mkString(" ")
      s"""WITH ${pcaChainsSqlK(12, dims)},
         $prCtes,
         $csCtes,
         pj AS MATERIALIZED (
           SELECT pr1.vec_id, [$projList] AS p
           FROM pr1 $prJoins CROSS JOIN nn $csJoins),
         qe AS (SELECT vec_id,
                       [CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT) FOR v IN embedding] AS q
                FROM embeddings),
         fsc AS (SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                        ${ic("qs.q", "c.q")} AS cosine
                 FROM qe c JOIN (SELECT * FROM qe WHERE vec_id < 16) qs
                   ON qs.vec_id <> c.vec_id),
         fr AS (SELECT q_id, n_id FROM
                (SELECT q_id, n_id,
                        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
                 FROM fsc) WHERE rnk <= 5),
         tsc AS (SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                        CASE WHEN ${dn("c.p")} = 0 OR ${dn("qs.p")} = 0 THEN -2
                             ELSE ${dd("c.p", "qs.p")}
                                  / (${dn("c.p")} * ${dn("qs.p")}) END AS cosine
                 FROM pj c JOIN (SELECT * FROM pj WHERE vec_id < 16) qs
                   ON qs.vec_id <> c.vec_id),
         tr AS (SELECT q_id, n_id FROM
                (SELECT q_id, n_id,
                        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
                 FROM tsc) WHERE rnk <= 5),
         ov AS (SELECT fr.q_id, count(*) AS n_overlap
                FROM fr JOIN tr ON tr.q_id = fr.q_id AND tr.n_id = fr.n_id
                GROUP BY 1),
         kf AS (SELECT q_id, count(*) AS k_full FROM fr GROUP BY 1)
         SELECT kf.q_id, kf.k_full,
                CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
                CAST(coalesce(ov.n_overlap, 0) * 1000000 // kf.k_full AS BIGINT) AS recall_ppm
         FROM kf LEFT JOIN ov USING (q_id) ORDER BY q_id"""
    },
  )
}
