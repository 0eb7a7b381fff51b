package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{CorpusClean, Dedup, Multimodal, Similarity, TextAnalysis}

/** Round-15 registry keys — the round-13 verdict's hardening list:
  *
  * 1. `dedup_span_excise_wide` — [[graft.ext.Dedup.spanExcise]] under
  *    the PRODUCTION 128-bit span-key width (md5 binary). The oracle
  *    keys spans by the raw gram TEXT itself — at 128 bits key
  *    equality is indistinguishable from span equality, so matching
  *    the text-keyed oracle is exactly the collision-freeness claim.
  * 2. `dedup_span_key_collisions` — what the default 30-bit key
  *    domain costs on this corpus: distinct spans vs distinct keys
  *    under both widths, collision counts exact in both engines
  *    (identical hash both sides).
  * 3. `multimodal_gif_phash_parity` — the per-image invariant behind
  *    the GIF cluster key's lossless-twin oracle, now KEYED: every
  *    image's GIF-decoded dHash must equal its PNG-decoded dHash AND
  *    the seeded-field SQL re-derivation — a uniform GIF-decode shift
  *    that would cancel inside cluster STRUCTURE cannot cancel here.
  */
object Queries15 extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_span_excise_wide" -> ((s, dir) =>
      Dedup.spanExcise(corpusWithNearCopies(s, dir), w = 5, wideKeys = true)
        .orderBy("doc_id")),

    "dedup_span_key_collisions" -> ((s, dir) =>
      Dedup.spanKeyCollisionAudit(t(s, dir, "documents"), w = 5)),

    // SentencePiece-style BPE: chunk-grain training over the raw
    // character stream with space a mergeable symbol — the unit that
    // reaches production merge depth (word-grain training exhausts at
    // ~90 merges on this corpus's 31-word vocabulary). Pinned to a
    // fixed 500-doc slice so the key's cost is sf-invariant (the
    // ≥1k-merge depth itself is a measured batch job, BASELINE §R14,
    // replay-audited in the spec — a 150-pass run is not a per-round
    // gate); 12 batched passes re-derived in full by the oracle
    "bpe_train_merges_chunked" -> ((s, dir) =>
      TextAnalysis.bpeTrainMergesChunked(
          t(s, dir, "documents").filter(col("doc_id") < 500),
          passes = 12, kBatch = 32, window = 128, chunkChars = 32,
          checkpointEvery = 4)
        .orderBy("merge_idx")),

    // the tokenizer-equity audit on the chunk-grain vocab: per-lang
    // fertility/compression under the production-depth unit
    "bpe_fertility_chunked" -> ((s, dir) =>
      TextAnalysis.bpeFertilityChunked(
          t(s, dir, "documents").filter(col("doc_id") < 500))
        .orderBy("lang")),

    // the round-13 PqWhitenProbe measurement productionized: PQ-ADC
    // top-k in the FULL-dimension PCA-rotated basis at the same code
    // budget as knn_pq_adc's raw-axis config — the measured +13% rel
    // recall arm, exact integer rotation via the pinned div route
    "knn_pq_rotated" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqSearchAdcRotated(e, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    // the rotate-then-quantize program completed for the index that
    // ships at scale: coarse cells + residual PQ + 2-probe ADC, all in
    // the rotated basis — the ivfPqTopK dataflow over rotatedQ
    "knn_ivfpq_rotated" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopKRotated(e, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    // the complete production stack: rotated-index ADC shortlist,
    // exact refinement over the ORIGINAL vectors (rotation is a lossy
    // index artifact; rerank distances come from the raw space)
    "knn_ivfpq_rerank_rotated" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqRerankRotated(e, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    // the capstone with the SELECTION stage composed in — clean →
    // dedup → DSIR-select (model trained on the survivors vs the
    // curated doc_id%20 slice, histogram-order-statistic threshold,
    // top quarter kept) → survivor-trained LM bands → shards; the
    // oracle re-derives the DSIR threshold INSIDE the composed chain
    "train_assembly_dsir_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val corpus = d
        .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
        .unionByName(d.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      val target = t(s, dir, "documents")
        .filter(col("doc_id") % 20 === 0).select(col("doc_id"), col("text"))
      CorpusClean.assembleSelected(corpus, target).orderBy("doc_id")
    }),

    "multimodal_gif_phash_parity" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val docs = t(s, dir, "documents")
      val gifH = Multimodal.gifWithPerturbedTwins(docs)
        .mapPartitions(_.map(r =>
          (r.doc_id, Multimodal.dhashFromImage(r.doc_id, r.payload))))
        .toDF("id", "dhash_gif")
      val pngH = Multimodal.pngWithPerturbedTwins(docs)
        .mapPartitions(_.map(r =>
          (r.doc_id, Multimodal.dhashFromImage(r.doc_id, r.payload))))
        .toDF("id", "dhash_png")
      gifH.join(pngH, Seq("id"))
        .withColumn("parity", col("dhash_gif") === col("dhash_png"))
        .orderBy("id")
    }),
  )

  /** The span-excision re-derivation of Queries13's
    * `dedup_span_excise` oracle with the span KEY swapped to the raw
    * gram text — the 128-bit width's independent check (md5 equality
    * ≡ text equality absent collisions, and 2⁻⁶⁴-scale collision odds
    * are not reachable by any corpus).
    */
  private val spanExciseWideSql =
    s"""WITH corpus AS ($nearCorpusSql),
       w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
       occ AS (
         SELECT doc_id, CAST(s['pos'] AS INT) AS pos, s['g'] AS h
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
       ORDER BY b.doc_id"""

  /** COMPACT twin of Queries13's eigen-chain builder, for the
    * 64-component rotation oracle: the identical pinned integer
    * procedure (`iters` infinity-norm power rounds — 8 in every
    * shipped rotated-chain oracle, matching the operators' default —
    * first-nonzero sign fix,
    * two-step integer Hotelling deflation), but each power round folds
    * its u/mx intermediates into ONE chained CTE via a nested WITH and
    * each deflation folds dn/lm/ad likewise. DuckDB's binder caps the
    * CTE dependency PATH at ~1000 nodes (measured: 998-9 for a bare
    * chain; nested inner CTEs do NOT accumulate on the outer path), so
    * the standard builder's ~43-node per-component path × 64
    * components binds 2.7× over the cap while this builder's ~14-node
    * path fits with margin. Same integers, different plumbing — the
    * gate's hash compare is the proof.
    */
  private def pcaCompactChainsSql(iters: Int, comps: Int): String = {
    def tag(c: Int) = Queries13.pcaTag(c)
    // one chained node per power round: matvec + window-max rescale
    // (the inf-norm gate as max() OVER () instead of a second CTE)
    def iterC(t: String, i: Int, prevV: String, cm: String): String =
      s"""v$t$i AS MATERIALIZED (
         SELECT t.d, CASE WHEN t.mx = 0 THEN p2.vv
                          WHEN t.uu >= 0 THEN (t.uu * 1000000) // t.mx
                          ELSE -((-t.uu * 1000000) // t.mx) END AS vv
         FROM (SELECT d, uu, max(abs(uu)) OVER () AS mx FROM (
                 SELECT c.i AS d, CAST(sum(c.c * p.vv) AS HUGEINT) AS uu
                 FROM $cm c JOIN $prevV p ON p.d = c.j GROUP BY c.i)) t
         JOIN $prevV p2 ON p2.d = t.d)"""
    // NO sign-fix node: ADC output is sign-invariant per component
    // (see pqSearchAdcRotated's scaladoc) and the integer Hotelling
    // deflation is itself sign-invariant (v enters quadratically:
    // lam, den, and a_i·v_j all flip twice), so the unsigned last
    // vector deflates to the IDENTICAL next covariance matrix
    def componentC(t: String, cm: String, deflateTo: Option[String]): String = {
      val v0 = "(SELECT d, CAST(1000000 AS HUGEINT) AS vv FROM dims)"
      val chain = (1 to iters).map(i =>
        iterC(t, i, if (i == 1) v0 else s"v$t${i - 1}", cm))
      val last = s"v$t$iters"
      val defl = deflateTo.map { nxt =>
        s""",
         $nxt AS MATERIALIZED (
           SELECT c.i, c.j,
                  c.c - (CASE WHEN a.av * w.vv >= 0 THEN (a.av * w.vv) // a.den
                              ELSE -((-(a.av * w.vv)) // a.den) END) AS c
           FROM $cm c
           JOIN (SELECT w.d,
                        CASE WHEN q.lam * w.vv >= 0 THEN (q.lam * w.vv) // q.den
                             ELSE -((-(q.lam * w.vv)) // q.den) END AS av,
                        q.den
                 FROM $last w CROSS JOIN
                      (SELECT (SELECT CAST(sum(wa.vv * x.c * wb.vv) AS HUGEINT)
                               FROM $cm x JOIN $last wa ON wa.d = x.i
                                           JOIN $last wb ON wb.d = x.j) AS lam,
                              (SELECT CAST(sum(vv * vv) AS HUGEINT) FROM $last) AS den) q) a
             ON a.d = c.i
           JOIN $last w ON w.d = c.j)"""
      }.getOrElse("")
      s"""${chain.mkString(",\n         ")}$defl"""
    }
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
       ${(1 to comps).map(c => componentC(tag(c), s"cf$c",
           if (c < comps) Some(s"cf${c + 1}") else None)).mkString(",\n       ")}"""
  }

  /** The rotated-PQ oracle: the engine's pinned 64-component
    * integer-grid eigen chain (the compact builder above), exact
    * centered projection numerators per vector, the 1e-3-grid
    * division with the negative route pinned, then the knn_pq_adc
    * ADC re-derivation over the rotated integer vectors at m=8/k=8.
    */
  /** The rotated integer-vector relation `pw`(vec_id, q) as CTE text:
    * the compact 64-component chain, per-vector projection numerators,
    * and the pinned 1e-3-grid division — shared by the flat rotated-PQ
    * oracle and the rotated IVF-PQ oracle.
    */
  private[graft] def rotatedPwSql(iters: Int, dims: Int): String = {
    def vlast(c: Int) = s"v${Queries13.pcaTag(c)}$iters"
    val prCtes = (1 to dims).map(c =>
      s"""pr${c} AS MATERIALIZED (
         SELECT x.vec_id, CAST(sum(CAST(x.v AS HUGEINT) * w.vv) AS HUGEINT) AS dd
         FROM x JOIN ${vlast(c)} w ON w.d = x.d GROUP BY x.vec_id)""").mkString(",\n       ")
    val csCtes = (1 to dims).map(c =>
      s"""cs$c AS (SELECT CAST(sum(s.sx * w.vv) AS HUGEINT) AS cc
         FROM s JOIN ${vlast(c)} w ON w.d = s.d)""").mkString(",\n       ")
    val rotList = (1 to dims).map(c =>
      s"""CAST(CASE WHEN nn.n * pr$c.dd - cs$c.cc >= 0
              THEN (nn.n * pr$c.dd - cs$c.cc) // (nn.n * 1000)
              ELSE -((-(nn.n * pr$c.dd - cs$c.cc)) // (nn.n * 1000)) END
            AS BIGINT)""").mkString(", ")
    val prJoins = (2 to dims).map(c =>
      s"JOIN pr$c ON pr$c.vec_id = pr1.vec_id").mkString(" ")
    val csJoins = (1 to dims).map(c => s"CROSS JOIN cs$c").mkString(" ")
    s"""${pcaCompactChainsSql(iters, dims)},
       $prCtes,
       $csCtes,
       pw AS MATERIALIZED (
         SELECT pr1.vec_id, [$rotList] AS q
         FROM pr1 $prJoins CROSS JOIN nn $csJoins)"""
  }

  private def pqRotatedSql: String = {
    s"""WITH ${rotatedPwSql(8, 64)},
       psub AS (SELECT vec_id, CAST(t.s AS INT) AS s,
                       q[t.s * 8 + 1 : t.s * 8 + 8] AS v
                FROM pw, range(8) t(s)),
       pcb AS (SELECT CAST(vec_id AS INT) AS cid, s, v AS c FROM psub WHERE vec_id < 8),
       pd AS (SELECT a.vec_id, a.s, b.cid,
                     CAST(list_sum(list_transform(range(1, 9),
                       i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
              FROM psub a JOIN pcb b ON b.s = a.s),
       pbest AS (SELECT vec_id, s, cid, d2,
                        row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
                 FROM pd),
       pcodes AS (SELECT vec_id AS n_id, s, cid FROM pbest WHERE rn = 1),
       padc AS (SELECT pd.vec_id AS q_id, pcodes.n_id, CAST(sum(pd.d2) AS BIGINT) AS adc_d2
                FROM pcodes JOIN pd ON pd.s = pcodes.s AND pd.cid = pcodes.cid
                WHERE pd.vec_id < 10 AND pd.vec_id != pcodes.n_id
                GROUP BY 1, 2),
       prnk AS (SELECT q_id, n_id, adc_d2,
                       CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY adc_d2, n_id) AS INT) AS rank
                FROM padc)
       SELECT q_id, n_id, adc_d2, rank FROM prnk WHERE rank <= 5
       ORDER BY q_id, rank"""
  }

  /** The chunk-grain deep-BPE oracle: the 500-doc slice collapsed to
    * 32-char chunk frequencies over the space-marked stream, then 12
    * unrolled batched passes through Queries13's pass builder (the
    * bpe_train_merges_deep machinery at the new unit).
    */
  private val bpeChunkedSql = {
    val (passes, window, kBatch) = (12, 128, 32)
    val passCtes = (1 to passes).map(i =>
      Queries13.bpeBatchPass(i, s"s${i - 1}", window, kBatch))
    val union = (1 to passes).map(i =>
      s"SELECT $i AS pass, sel_rank, ma, mb, c FROM b$i")
      .mkString("\n           UNION ALL ")
    s"""WITH c0 AS (
         SELECT replace(text, ' ', '▁') AS t
         FROM documents WHERE doc_id < 500),
       w0 AS (
         SELECT w, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest([substr(t, i * 32 + 1, 32)
                 FOR i IN range(0, CAST(ceil(length(t) / 32.0) AS BIGINT))]) AS w
               FROM c0)
         WHERE len(w) > 0 GROUP BY w),
       s0 AS (
         SELECT freq, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
         FROM w0),
       ${passCtes.mkString(",\n       ")}
       SELECT CAST(row_number() OVER (ORDER BY pass, sel_rank) AS INT) AS merge_idx,
              pass, ma AS sym_a, mb AS sym_b, ma || mb AS merged,
              c AS pair_count
       FROM ($union)
       ORDER BY merge_idx"""
  }

  /** One batched chunk-BPE pass CARRYING the chunk `w` — the
    * Queries13 [[Queries13.bpeBatchPass]] machinery with the
    * word→symbols mapping kept alive (the Queries14 `bpeRoundW`
    * convention), because the fertility encode IS that mapping's
    * final state.
    */
  private[graft] def bpeBatchPassW(i: Int, prev: String, window: Int, kBatch: Int): String =
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
         SELECT t.w, t.freq,
                list_reduce(string_split(t.s, ' '), (acc, x) ->
                  CASE WHEN len([m FOR m IN ms IF m['mb'] = x AND
                         (acc = m['ma'] OR ends_with(acc, ' ' || m['ma']))]) > 0
                       THEN acc || x ELSE acc || ' ' || x END) AS s
         FROM $prev t CROSS JOIN m$i)"""

  /** The chunk-fertility oracle: the 12 w-carrying passes, then the
    * language-grain aggregation of the final chunk→token-count model.
    */
  private val bpeFertilityChunkedSql = {
    val (passes, window, kBatch) = (12, 128, 32)
    val passCtes = (1 to passes).map(i =>
      bpeBatchPassW(i, s"s${i - 1}", window, kBatch))
    s"""WITH c0 AS (
         SELECT lang, replace(text, ' ', '▁') AS t
         FROM documents WHERE doc_id < 500),
       w0 AS (
         SELECT w, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest([substr(t, i * 32 + 1, 32)
                 FOR i IN range(0, CAST(ceil(length(t) / 32.0) AS BIGINT))]) AS w
               FROM c0)
         WHERE len(w) > 0 GROUP BY w),
       s0 AS (
         SELECT w, freq,
                array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
         FROM w0),
       ${passCtes.mkString(",\n       ")},
       enc AS (
         SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tok,
                CAST(length(w) AS BIGINT) AS n_chr
         FROM s$passes),
       dch AS (
         SELECT lang, unnest([substr(t, i * 32 + 1, 32)
                 FOR i IN range(0, CAST(ceil(length(t) / 32.0) AS BIGINT))]) AS w
         FROM c0)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens,
              CAST(sum(n_chr) AS BIGINT) AS n_chars,
              CAST(sum(n_tok) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS fertility_ppm,
              CAST(sum(n_tok) * 1000000
                // greatest(sum(n_chr), 1) AS BIGINT) AS compression_ppm
       FROM (SELECT lang, w FROM dch WHERE len(w) > 0) t
       JOIN enc USING (w)
       GROUP BY lang ORDER BY lang"""
  }

  /** The rotated IVF-PQ oracle: the shared rotated relation `pw`,
    * then the knn_ivfpq re-derivation (coarse assign, residuals,
    * residual codebook, codes, 2-probe distance tables, ADC) over the
    * rotated integer vectors — cells=8, m=4 (16-wide subvectors of
    * the 64-dim rotated space), k=8, queries vec_id < 10.
    */
  private[graft] def ivfPqRotatedSql: String =
    s"""WITH ${rotatedPwSql(8, 64)},
       ${ivfPqRotatedAdcCtes},
       ir AS (SELECT q_id, n_id, adc_d2,
                     CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS INT) AS rank
              FROM iadc)
       SELECT q_id, n_id, adc_d2, rank FROM ir WHERE rank <= 5
       ORDER BY q_id, rank"""

  /** Rotated shortlist + RAW-space exact rerank — the refinement
    * stage reads the original 1e-6-grid vectors; the rotated basis is
    * an index artifact only.
    */
  private[graft] def ivfPqRerankRotatedSql: String =
    s"""WITH ${rotatedPwSql(8, 64)},
       ${ivfPqRotatedAdcCtes},
       isl AS (SELECT q_id, n_id FROM
               (SELECT q_id, n_id,
                       row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS rnk
                FROM iadc) WHERE rnk <= 20),
       qe AS (SELECT vec_id,
                     [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
              FROM embeddings),
       iex AS (SELECT isl.q_id, isl.n_id,
                      CAST(list_sum(list_transform(range(1, 65),
                        i -> (qq.q[i] - cc.q[i]) * (qq.q[i] - cc.q[i]))) AS BIGINT) AS exact_d2
               FROM isl JOIN qe qq ON qq.vec_id = isl.q_id
                        JOIN qe cc ON cc.vec_id = isl.n_id),
       irr AS (SELECT q_id, n_id, exact_d2,
                      CAST(row_number() OVER (PARTITION BY q_id ORDER BY exact_d2, n_id) AS INT) AS rank
               FROM iex)
       SELECT q_id, n_id, exact_d2, rank FROM irr WHERE rank <= 5
       ORDER BY q_id, rank"""

  /** The rotated IVF-PQ ADC chain (coarse assign over `pw`, residual
    * codebook/codes, 2-probe distance tables) ending at relation
    * `iadc`(q_id, n_id, adc_d2) — shared by the top-k and rerank
    * oracles.
    */
  private[graft] val ivfPqRotatedAdcCtes: String =
    s"""icent AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS cq FROM pw WHERE vec_id < 8),
       iad AS (SELECT a.vec_id, a.q, c.cell_id, c.cq,
                      list_sum(list_transform(range(1, 65),
                        i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS d2c
               FROM pw a, icent c),
       iasg AS (SELECT vec_id, q, cell_id, cq FROM
                (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2c, cell_id) AS rn
                 FROM iad) WHERE rn = 1),
       ires AS (SELECT vec_id, cell_id,
                       list_transform(range(1, 65), i -> q[i] - cq[i]) AS r
                FROM iasg),
       isub AS (SELECT vec_id, cell_id, CAST(t.s AS INT) AS s,
                       r[t.s * 16 + 1 : t.s * 16 + 16] AS v
                FROM ires, range(4) t(s)),
       icb AS (SELECT CAST(vec_id AS INT) AS cid, s, v AS c FROM isub WHERE vec_id < 8),
       id2 AS (SELECT a.vec_id, a.cell_id, a.s, b.cid,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
               FROM isub a JOIN icb b ON b.s = a.s),
       icodes AS (SELECT vec_id AS n_id, cell_id, s, cid FROM
                  (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
                   FROM id2) WHERE rn = 1),
       iprobed AS (SELECT vec_id AS q_id, cell_id, cq, q FROM
                   (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2c, cell_id) AS rn
                    FROM iad WHERE vec_id < 10) WHERE rn <= 2),
       iqres AS (SELECT q_id, cell_id,
                        list_transform(range(1, 65), i -> q[i] - cq[i]) AS qr
                 FROM iprobed),
       iqsub AS (SELECT q_id, cell_id, CAST(t.s AS INT) AS s,
                        qr[t.s * 16 + 1 : t.s * 16 + 16] AS v
                 FROM iqres, range(4) t(s)),
       idtab AS (SELECT a.q_id, a.cell_id, a.s, b.cid,
                        CAST(list_sum(list_transform(range(1, 17),
                          i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
                 FROM iqsub a JOIN icb b ON b.s = a.s),
       iadc AS (SELECT idtab.q_id, icodes.n_id, CAST(sum(idtab.d2) AS BIGINT) AS adc_d2
                FROM icodes JOIN idtab ON idtab.cell_id = icodes.cell_id
                                      AND idtab.s = icodes.s AND idtab.cid = icodes.cid
                WHERE idtab.q_id != icodes.n_id GROUP BY 1, 2)"""

  val oracles: Map[String, String] = Map(

    "knn_pq_rotated" -> pqRotatedSql,

    "knn_ivfpq_rotated" -> ivfPqRotatedSql,

    "knn_ivfpq_rerank_rotated" -> ivfPqRerankRotatedSql,

    "bpe_train_merges_chunked" -> bpeChunkedSql,

    "bpe_fertility_chunked" -> bpeFertilityChunkedSql,

    "dedup_span_excise_wide" -> spanExciseWideSql,

    // identical hashes both sides ⇒ identical collision counts; the
    // narrow key is the portable-hash twin, the wide key md5 itself
    "dedup_span_key_collisions" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
         g AS (SELECT DISTINCT unnest([array_to_string(w[i + 1:i + 5], ' ')
                 FOR i IN range(0, greatest(len(w) - 4, 0))]) AS g
               FROM w),
         k AS (SELECT g,
                      list_reduce(
                        [CAST(ascii(ch) AS BIGINT) FOR ch IN
                          regexp_extract_all(md5(g), '.')],
                        (a, b) -> (a * 31 + b) % 1000000007) AS hn,
                      md5(g) AS hw
               FROM g)
         SELECT CAST(count(*) AS BIGINT) AS n_spans,
                CAST(count(DISTINCT hn) AS BIGINT) AS n_keys_narrow,
                CAST(count(DISTINCT hw) AS BIGINT) AS n_keys_wide,
                CAST(count(*) - count(DISTINCT hn) AS BIGINT) AS collisions_narrow,
                CAST(count(*) - count(DISTINCT hw) AS BIGINT) AS collisions_wide,
                CAST(CASE WHEN count(*) > 0
                     THEN (count(*) - count(DISTINCT hn)) * 1000000 // count(*)
                     ELSE 0 END AS BIGINT) AS collision_ppm_narrow
         FROM k""",

    // the composed chain: shared cleaning CTEs over the seeded corpus,
    // the DSIR model/threshold re-derived over the SURVIVORS (raw =
    // kept, target = the curated documents slice), the (n-k)-th weight
    // order statistic as the keep gate, then the shared finishing tail
    // over the selected survivors only
    "train_assembly_dsir_pipeline" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           UNION ALL
           SELECT doc_id + 2000000, text FROM documents),
         $cleanCtes,
         dtok AS MATERIALIZED (
           SELECT doc_id,
                  list_reduce(
                    [CAST(ascii(ch) AS BIGINT) FOR ch IN
                      regexp_extract_all(md5('dsir|' || w), '.')],
                    (a, b) -> (a * 31 + b) % 1000000007) % 256 AS bucket
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM kept)
           WHERE len(w) > 0),
         dttok AS (
           SELECT list_reduce(
                    [CAST(ascii(ch) AS BIGINT) FOR ch IN
                      regexp_extract_all(md5('dsir|' || w), '.')],
                    (a, b) -> (a * 31 + b) % 1000000007) % 256 AS bucket
           FROM (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE doc_id % 20 = 0)
           WHERE len(w) > 0),
         drawb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_raw
                   FROM dtok GROUP BY bucket),
         dtgtb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_tgt
                   FROM dttok GROUP BY bucket),
         dtot AS (SELECT (SELECT sum(c_raw) FROM drawb) AS n_raw,
                         (SELECT coalesce(sum(c_tgt), 0) FROM dtgtb) AS n_tgt),
         dmodel AS (
           SELECT r.bucket,
                  CAST(floor(((ln(coalesce(t.c_tgt, 0) + 1) + ln(dtot.n_raw + 256))
                    - (ln(r.c_raw + 1) + ln(dtot.n_tgt + 256))) * 1e6) AS BIGINT) AS lr
           FROM drawb r LEFT JOIN dtgtb t USING (bucket) CROSS JOIN dtot),
         dper AS (
           SELECT doc_id, CAST(sum(lr) AS BIGINT) AS logw_micro
           FROM dtok JOIN dmodel USING (bucket) GROUP BY doc_id),
         ddw AS (
           SELECT k.doc_id, coalesce(dper.logw_micro, 0) AS logw_micro
           FROM kept k LEFT JOIN dper USING (doc_id)),
         drk AS MATERIALIZED (SELECT ddw.*,
                        row_number() OVER (ORDER BY logw_micro, doc_id) AS rn,
                        CAST(count(*) OVER () AS BIGINT) AS n
                 FROM ddw),
         dth AS (SELECT max(n) AS n,
                        max(n - n * 250000 // 1000000) AS r,
                        max(CASE WHEN rn = n - n * 250000 // 1000000
                                 THEN logw_micro END) AS t0
                 FROM drk),
         sel3 AS (
           SELECT k.doc_id, k.text, k.quality_score
           FROM kept k JOIN drk ON drk.doc_id = k.doc_id CROSS JOIN dth
           WHERE CASE WHEN dth.r < 1 THEN TRUE
                      ELSE drk.logw_micro > dth.t0 END),
         ${finishSql("sel3")}""",

    // the seeded-field dHash re-derivation (the BMP/PNG chain's own
    // hsh CTE) pinned per image against BOTH decoders — three-way
    // equality, keyed by image id
    "multimodal_gif_phash_parity" ->
      s"""WITH ${Queries5.phashCtes}
         SELECT id, hash AS dhash_gif, hash AS dhash_png, TRUE AS parity
         FROM hsh ORDER BY id""",
  )
}
