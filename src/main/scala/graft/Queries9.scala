package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Checkpoints, Dedup, Scale, Similarity}

/** Round-9 registry: the two follow-ons the round-8 verdict ranked
  * highest among new operators —
  *
  *  - `agg_skew_adaptive_*` — [[Scale.adaptiveJoin]]'s measured gate
  *    applied to AGGREGATION (AQE splits skewed join partitions but
  *    never skewed aggregations): histogram first, then plain hash
  *    aggregate or the two-phase salted aggregate, decision evidence
  *    on the output. Both branches oracle-pinned on the same
  *    genuinely-skewed (`documents.lang`) vs genuinely-uniform
  *    (`events.event_type`) keys as the join policy.
  *  - `knn_ivf_two_level` — the IMI-shaped two-level coarse
  *    assignment ([[Similarity.ivfTwoLevelCompare]]): ∜n-ish
  *    super-centroids bound the per-vector centroid scan, the output
  *    measures top-k agreement against flat assignment, and the DuckDB
  *    oracle re-derives BOTH pipelines exactly.
  */
object Queries9 extends ExtHelpers {

  // t(spark, dir, name) comes from ExtHelpers

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the agg policy's SALTED branch: documents.lang (en holds ~2× its
    // even share — the English-dominated-corpus skew) through the
    // measured gate; totals are strategy-invariant, so the oracle pins
    // both the data and the decision.
    "agg_skew_adaptive_salted" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"), col("n_chars"))
      Scale.adaptiveAgg(d, "lang", "n_chars").orderBy("lang")
    }),

    // the PLAIN branch: uniform event_type (~1.01× max share) must NOT
    // pay the extra salt shuffle.
    "agg_skew_adaptive_plain" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      Scale.adaptiveAgg(e, "event_type", "cents").orderBy("event_type")
    }),

    // two-level vs flat coarse assignment through the identical
    // probe/search tail; per-(q_id, rank) agreement measured, never
    // assumed
    "knn_ivf_two_level" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTwoLevelCompare(e, e.filter(col("vec_id") < 8),
          k = 3, cells = 16, probes = 3, supers = 4)
        .orderBy("q_id", "rank")
    }),

    // the BUILD policy: n measured → flat below the crossover,
    // two-level at/above it. buildThreshold=1000 puts the sf gate
    // corpora (≤500 vectors) on flat and the organic ×10 corpus (~8k)
    // on two-level, so the scaled gate executes the two-level SQL
    // re-derivation for real.
    "knn_ivf_build_auto" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopKAuto(e, e.filter(col("vec_id") < 8),
          k = 3, probes = 3, buildThreshold = 1000L)
        .orderBy("q_id", "rank")
    }),

    // the re-banding DECISION for the MinHash tier as data — the
    // simhash/phash monitor pair completed on the shingle index: both
    // banding shapes of the SAME fixed 12-hash family ((4 bands × 3
    // rows) and (2 × 6)) side by side plus the verdict minhashLshAuto
    // acts on (budget at (4,3) super-linear in corpus size → regroup
    // to (2,6)). Both shape derivations, all bucket stats, and the
    // CASE re-derived independently by the DuckDB oracle.
    "dedup_minhash_rebanding" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val s43 = Checkpoints.truncate(Dedup.minhashBandStats(d, 3, 4, 3))
      val s26 = Dedup.minhashBandStats(d, 3, 2, 6)
      val dec = s43
        .agg(sum(col("pair_budget")).as("b43"), max(col("n_docs")).as("nd"))
        .select(when(col("b43") > col("nd") * 8, 6).otherwise(3)
          .as("chosen_rows"))
      s43.withColumn("rows_per_band", lit(3))
        .unionByName(s26.withColumn("rows_per_band", lit(6)))
        .crossJoin(broadcast(dec))
        .select(col("rows_per_band"), col("band_id"), col("n_docs"),
          col("n_buckets"), col("max_bucket"), col("pair_budget"),
          col("chosen_rows"))
        .orderBy("rows_per_band", "band_id")
    }),

    // the ACTED policy: verified near-dup pairs at the measured-chosen
    // banding shape, decision evidence on every row. On the sf gates
    // the (4,3) budget is linear (near-copies collide in ~4n buckets,
    // 8n allowed) so the healthy branch runs; the saturated (2,6)
    // branch is spec-pinned on a low-entropy corpus and exercised by
    // the organic ×10 gate if its fixed vocabulary saturates the index.
    "dedup_minhash_lsh_auto" -> ((s, dir) =>
      Dedup.minhashLshAuto(corpusWithNearCopies(s, dir))
        .orderBy("a_id", "b_id")),

    // NN-descent: the scale path to the kNN graph (the exact builder
    // knn_graph_blocked is quadratic BY CONTRACT) — id-window init,
    // two neighbor-of-neighbor refinement rounds, top-k by exact
    // quantized cosine. Fully deterministic (pinned init + ties), so
    // the oracle re-derives every round; convergence is measured in
    // the spec against the exact graph, never assumed.
    "knn_nn_descent" -> ((s, dir) =>
      Similarity.nnDescent(t(s, dir, "embeddings"), k = 4, rounds = 2)
        .orderBy("q_id", "rank")),

    // the kNN-graph BUILD policy: n measured → exact blocked tile join
    // below the crossover, NN-descent at/above it (knnClassify and
    // knnDistOutliers route through the same gate). exactThreshold=1000
    // puts the sf gate corpora (500 vectors) on the exact branch and
    // the organic ×10 corpus on NN-descent, so the scaled gate executes
    // the descent SQL re-derivation for real, not as dead code.
    "knn_graph_build_auto" -> ((s, dir) =>
      Similarity.knnGraphAuto(t(s, dir, "embeddings"), k = 4,
          exactThreshold = knnGateN)
        .orderBy("q_id", "rank")),

    // CCNet-style LM fluency filtering without a transcendental:
    // corpus-trained bigram MLE, per-doc mean conditional probability
    // in exact ppm (rank-equivalent to negated perplexity; log/exp
    // would break cross-engine bit-exactness, floor division doesn't)
    "text_bigram_lm_score" -> ((s, dir) =>
      graft.ext.TextAnalysis.bigramLmScore(t(s, dir, "documents"))
        .orderBy("doc_id")),

    // label-propagation communities over the co-purchase graph —
    // synchronous, 3 fixed rounds, (count DESC, label ASC) ties:
    // deterministic, so every round is DuckDB-re-derived
    "graph_lpa_communities" -> ((s, dir) =>
      graft.ext.GraphOps.labelPropagation(coPurchaseEdges(s, dir), rounds = 3)
        .orderBy("node")),

    // the capstone composition: quality gate → exact dedup →
    // policy-routed near-dup prune → survivor-trained bigram-LM
    // fluency bands (order-statistic thresholds, a 1-row driver gate —
    // never a global-window sort) → deterministic hash shards with
    // in-shard positions. Same seeded corpus as corpus_clean_pipeline;
    // every stage re-derived by the oracle.
    "train_assembly_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val corpus = d
        .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
        .unionByName(d.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      graft.ext.CorpusClean.assemble(corpus).orderBy("doc_id")
    }),
  )

  // NN-descent oracle CTE helpers now live in ExtHelpers (shared with
  // the policy-routed consumer oracles in ExtQueriesAnn); keep the
  // round-9 local names as thin aliases at k = 4
  private def nndCand(g: String): String = nndCandSql(g)
  private def nndTopK(cand: String): String = nndTopKSql(cand, 4)

  val oracles: Map[String, String] = Map(

    "agg_skew_adaptive_salted" ->
      """WITH m AS (SELECT CAST(max(c) * count(*) * 1000000 // sum(c) AS BIGINT) AS skew_x_ppm
                    FROM (SELECT count(*) AS c FROM documents GROUP BY lang))
         SELECT d.lang,
                CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
                count(*) AS n_rows,
                CASE WHEN m.skew_x_ppm > 1500000 THEN 'salted' ELSE 'plain' END AS agg_strategy,
                m.skew_x_ppm
         FROM documents d, m
         GROUP BY d.lang, m.skew_x_ppm ORDER BY d.lang""",

    "agg_skew_adaptive_plain" ->
      """WITH m AS (SELECT CAST(max(c) * count(*) * 1000000 // sum(c) AS BIGINT) AS skew_x_ppm
                    FROM (SELECT count(*) AS c FROM events GROUP BY event_type))
         SELECT e.event_type,
                CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents,
                count(*) AS n_rows,
                CASE WHEN m.skew_x_ppm > 1500000 THEN 'salted' ELSE 'plain' END AS agg_strategy,
                m.skew_x_ppm
         FROM events e, m
         GROUP BY e.event_type, m.skew_x_ppm ORDER BY e.event_type""",

    // both assignments re-derived: super per centroid, super per
    // vector, child-only argmax (two-level) next to the all-centroid
    // argmax (flat), the SAME probe list, both top-k lists FULL-joined
    // on (q_id, rank)
    "knn_ivf_two_level" ->
      s"""WITH q AS ($quantSql),
         cent AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS c_q FROM q WHERE vec_id < 16),
         sup AS (SELECT cell_id AS sup_id, c_q AS s_q FROM cent WHERE cell_id < 4),
         centsup AS (
           SELECT cell_id, sup_id FROM (
             SELECT c.cell_id, s.sup_id,
                    row_number() OVER (PARTITION BY c.cell_id
                      ORDER BY ${qcosSql("c.c_q", "s.s_q")} DESC, s.sup_id) AS rn
             FROM cent c CROSS JOIN sup s)
           WHERE rn = 1),
         vsup AS (
           SELECT n_id, n_q, sup_id FROM (
             SELECT n.vec_id AS n_id, n.q AS n_q, s.sup_id,
                    row_number() OVER (PARTITION BY n.vec_id
                      ORDER BY ${qcosSql("n.q", "s.s_q")} DESC, s.sup_id) AS rn
             FROM q n CROSS JOIN sup s)
           WHERE rn = 1),
         two AS (
           SELECT n_id, n_q, cell_id FROM (
             SELECT v.n_id, v.n_q, c.cell_id,
                    row_number() OVER (PARTITION BY v.n_id
                      ORDER BY ${qcosSql("v.n_q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM vsup v JOIN centsup cs ON cs.sup_id = v.sup_id
                         JOIN cent c ON c.cell_id = cs.cell_id)
           WHERE rn = 1),
         flat AS (
           SELECT n_id, n_q, cell_id FROM (
             SELECT n.vec_id AS n_id, n.q AS n_q, c.cell_id,
                    row_number() OVER (PARTITION BY n.vec_id
                      ORDER BY ${qcosSql("n.q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM q n CROSS JOIN cent c)
           WHERE rn = 1),
         probed AS (
           SELECT q_id, q_q, cell_id FROM (
             SELECT qs.vec_id AS q_id, qs.q AS q_q, c.cell_id,
                    row_number() OVER (PARTITION BY qs.vec_id
                      ORDER BY ${qcosSql("qs.q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM (SELECT * FROM q WHERE vec_id < 8) qs CROSS JOIN cent c)
           WHERE rn <= 3),
         tk2 AS (
           SELECT q_id, n_id, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM (SELECT p.q_id, a.n_id, ${qcosSql("p.q_q", "a.n_q")} AS cosine
                 FROM two a JOIN probed p ON a.cell_id = p.cell_id AND p.q_id <> a.n_id)),
         tkf AS (
           SELECT q_id, n_id, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM (SELECT p.q_id, a.n_id, ${qcosSql("p.q_q", "a.n_q")} AS cosine
                 FROM flat a JOIN probed p ON a.cell_id = p.cell_id AND p.q_id <> a.n_id))
         SELECT coalesce(a.q_id, b.q_id) AS q_id,
                coalesce(a.rank, b.rank) AS rank,
                a.n_id, a.cosine,
                b.n_id AS n_id_flat, b.cosine AS cosine_flat,
                coalesce(a.n_id = b.n_id, FALSE) AS agree
         FROM (SELECT * FROM tk2 WHERE rank <= 3) a
         FULL JOIN (SELECT * FROM tkf WHERE rank <= 3) b
           ON a.q_id = b.q_id AND a.rank = b.rank
         ORDER BY q_id, rank""",

    // both BUILD branches re-derived behind the same measured gate the
    // engine uses (n, √n cells, ∜n supers all from count(*)); the
    // UNION ALL arms are mutually exclusive on par.two_level, so
    // whichever branch the corpus size selects actually runs
    "knn_ivf_build_auto" ->
      s"""WITH q AS ($quantSql),
         par AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        greatest(8, CAST(floor(sqrt(count(*))) AS INT)) AS cells,
                        least(greatest(2, CAST(floor(sqrt(floor(sqrt(count(*))))) AS INT)),
                              greatest(8, CAST(floor(sqrt(count(*))) AS INT))) AS supers,
                        count(*) >= 1000 AS two_level
                 FROM embeddings),
         cent AS (SELECT CAST(vec_id AS INT) AS cell_id, c.q AS c_q
                  FROM q c, par WHERE c.vec_id < par.cells),
         sup AS (SELECT cell_id AS sup_id, c_q AS s_q
                 FROM cent, par WHERE cell_id < par.supers),
         centsup AS (
           SELECT cell_id, sup_id FROM (
             SELECT c.cell_id, s.sup_id,
                    row_number() OVER (PARTITION BY c.cell_id
                      ORDER BY ${qcosSql("c.c_q", "s.s_q")} DESC, s.sup_id) AS rn
             FROM cent c CROSS JOIN sup s)
           WHERE rn = 1),
         vsup AS (
           SELECT n_id, n_q, sup_id FROM (
             SELECT n.vec_id AS n_id, n.q AS n_q, s.sup_id,
                    row_number() OVER (PARTITION BY n.vec_id
                      ORDER BY ${qcosSql("n.q", "s.s_q")} DESC, s.sup_id) AS rn
             FROM q n CROSS JOIN sup s)
           WHERE rn = 1),
         twoa AS (
           SELECT n_id, n_q, cell_id FROM (
             SELECT v.n_id, v.n_q, c.cell_id,
                    row_number() OVER (PARTITION BY v.n_id
                      ORDER BY ${qcosSql("v.n_q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM vsup v JOIN centsup cs ON cs.sup_id = v.sup_id
                         JOIN cent c ON c.cell_id = cs.cell_id)
           WHERE rn = 1),
         flata AS (
           SELECT n_id, n_q, cell_id FROM (
             SELECT n.vec_id AS n_id, n.q AS n_q, c.cell_id,
                    row_number() OVER (PARTITION BY n.vec_id
                      ORDER BY ${qcosSql("n.q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM q n CROSS JOIN cent c)
           WHERE rn = 1),
         assigned AS (
           SELECT t.n_id, t.n_q, t.cell_id FROM twoa t, par WHERE par.two_level
           UNION ALL
           SELECT f.n_id, f.n_q, f.cell_id FROM flata f, par WHERE NOT par.two_level),
         probed AS (
           SELECT q_id, q_q, cell_id FROM (
             SELECT qs.vec_id AS q_id, qs.q AS q_q, c.cell_id,
                    row_number() OVER (PARTITION BY qs.vec_id
                      ORDER BY ${qcosSql("qs.q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM (SELECT * FROM q WHERE vec_id < 8) qs CROSS JOIN cent c)
           WHERE rn <= 3),
         tk AS (
           SELECT q_id, n_id, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM (SELECT p.q_id, a.n_id, ${qcosSql("p.q_q", "a.n_q")} AS cosine
                 FROM assigned a JOIN probed p ON a.cell_id = p.cell_id AND p.q_id <> a.n_id))
         SELECT tk.q_id, tk.n_id, tk.cosine, tk.rank,
                CASE WHEN par.two_level THEN 'two_level' ELSE 'flat' END AS build_mode,
                par.n AS n_corpus, par.cells, par.supers
         FROM tk, par WHERE tk.rank <= 3 ORDER BY tk.q_id, tk.rank""",

    // both banding shapes of the 12-row md5 minhash family re-derived
    // column by column (m0..m11 are the engine's exact minhash rows),
    // bucket stats per band at each shape, and the regroup CASE
    "dedup_minhash_rebanding" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         shs AS ($shinglesSql),
         mh AS (SELECT doc_id,
                ${(0 until 12).map(i => s"${mhSql(i)} AS m$i").mkString(",\n                ")}
                FROM shs),
         s43 AS (SELECT doc_id, CAST(t.b AS INT) AS band_id,
                        CASE t.b WHEN 0 THEN m0 || m1 || m2
                                 WHEN 1 THEN m3 || m4 || m5
                                 WHEN 2 THEN m6 || m7 || m8
                                 ELSE m9 || m10 || m11 END AS sig
                 FROM mh, range(4) t(b)),
         s26 AS (SELECT doc_id, CAST(t.b AS INT) AS band_id,
                        CASE t.b WHEN 0 THEN m0 || m1 || m2 || m3 || m4 || m5
                                 ELSE m6 || m7 || m8 || m9 || m10 || m11 END AS sig
                 FROM mh, range(2) t(b)),
         st43 AS (SELECT CAST(3 AS INT) AS rows_per_band, band_id,
                         CAST(sum(c) AS BIGINT) AS n_docs,
                         CAST(count(*) AS BIGINT) AS n_buckets,
                         CAST(max(c) AS BIGINT) AS max_bucket,
                         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pair_budget
                  FROM (SELECT band_id, sig, count(*) AS c FROM s43
                        WHERE sig IS NOT NULL GROUP BY 1, 2)
                  GROUP BY band_id),
         st26 AS (SELECT CAST(6 AS INT) AS rows_per_band, band_id,
                         CAST(sum(c) AS BIGINT) AS n_docs,
                         CAST(count(*) AS BIGINT) AS n_buckets,
                         CAST(max(c) AS BIGINT) AS max_bucket,
                         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pair_budget
                  FROM (SELECT band_id, sig, count(*) AS c FROM s26
                        WHERE sig IS NOT NULL GROUP BY 1, 2)
                  GROUP BY band_id),
         dec AS (SELECT CASE WHEN (SELECT sum(pair_budget) FROM st43)
                                  > 8 * (SELECT max(n_docs) FROM st43)
                             THEN CAST(6 AS INT) ELSE CAST(3 AS INT) END AS chosen_rows)
         SELECT u.rows_per_band, u.band_id, u.n_docs, u.n_buckets,
                u.max_bucket, u.pair_budget, dec.chosen_rows
         FROM (SELECT * FROM st43 UNION ALL SELECT * FROM st26) u, dec
         ORDER BY rows_per_band, band_id""",

    // the acted policy: the decision re-measured in SQL, then
    // candidates generated at the CHOSEN shape only (the UNION ALL
    // arms are mutually exclusive on dec.chosen), verified with exact
    // shingle-set Jaccard
    "dedup_minhash_lsh_auto" ->
      s"""WITH corpus AS ($nearCorpusSql),
         shs AS ($shinglesSql),
         mh AS (SELECT doc_id, sh,
                ${(0 until 12).map(i => s"${mhSql(i)} AS m$i").mkString(",\n                ")}
                FROM shs),
         b43 AS (SELECT sig, count(*) AS c FROM (
                   SELECT CAST(t.b AS INT) AS band_id,
                          CAST(t.b AS VARCHAR) ||
                          CASE t.b WHEN 0 THEN m0 || m1 || m2
                                   WHEN 1 THEN m3 || m4 || m5
                                   WHEN 2 THEN m6 || m7 || m8
                                   ELSE m9 || m10 || m11 END AS sig
                   FROM mh, range(4) t(b))
                 WHERE sig IS NOT NULL
                 GROUP BY sig),
         dec AS (SELECT CASE WHEN (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM b43)
                                  > 8 * (SELECT count(*) FROM mh WHERE m0 IS NOT NULL)
                             THEN CAST(6 AS INT) ELSE CAST(3 AS INT) END AS chosen,
                        (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM b43) AS budget43,
                        (SELECT CAST(count(*) AS BIGINT) FROM mh WHERE m0 IS NOT NULL) AS nd),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.m0 || a.m1 || a.m2 = b.m0 || b.m1 || b.m2
              OR a.m3 || a.m4 || a.m5 = b.m3 || b.m4 || b.m5
              OR a.m6 || a.m7 || a.m8 = b.m6 || b.m7 || b.m8
              OR a.m9 || a.m10 || a.m11 = b.m9 || b.m10 || b.m11)
           WHERE (SELECT chosen FROM dec) = 3
           UNION ALL
           SELECT a.doc_id, b.doc_id, a.sh, b.sh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.m0 || a.m1 || a.m2 || a.m3 || a.m4 || a.m5
                 = b.m0 || b.m1 || b.m2 || b.m3 || b.m4 || b.m5
              OR a.m6 || a.m7 || a.m8 || a.m9 || a.m10 || a.m11
                 = b.m6 || b.m7 || b.m8 || b.m9 || b.m10 || b.m11)
           WHERE (SELECT chosen FROM dec) = 6),
         scored AS (SELECT a_id, b_id, $jaccardSql AS jaccard FROM cand)
         SELECT s.a_id, s.b_id, s.jaccard, dec.chosen AS rows_per_band,
                dec.budget43 AS pair_budget_43, dec.nd AS n_docs
         FROM scored s, dec WHERE s.jaccard >= 0.5 ORDER BY a_id, b_id""",

    // every NN-descent round re-derived: id-window init (symmetrized),
    // two candidate-expansion + exact-cosine top-k rounds, identical
    // (cosine DESC, id) tie rule
    "knn_nn_descent" ->
      s"""WITH q AS ($quantSql),
         i0 AS (SELECT a.vec_id AS src, b.vec_id AS dst
                FROM q a
                JOIN range(4) t(o) ON TRUE
                JOIN q b ON b.vec_id = a.vec_id + CAST(t.o + 1 AS BIGINT)),
         c0 AS (SELECT src, dst FROM i0 UNION SELECT dst, src FROM i0),
         g0 AS (${nndTopK("SELECT src, dst FROM c0")}),
         g1 AS (${nndTopK(nndCand("g0"))}),
         g2 AS (${nndTopK(nndCand("g1"))})
         SELECT src AS q_id, rank, dst AS n_id, cosine
         FROM g2 ORDER BY q_id, rank""",

    // both BUILD branches re-derived behind the same measured gate the
    // engine uses. The exact arm's input is emptied by the gate BEFORE
    // the quadratic self-join (exq is 0 rows when the corpus descends),
    // so at organic scale only the descent chain does work — the arms
    // are mutually exclusive on par.is_exact AND cost-exclusive.
    "knn_graph_build_auto" ->
      s"""WITH q AS ($quantSql),
         par AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        count(*) < $knnGateN AS is_exact
                 FROM embeddings),
         exq AS (SELECT q.vec_id, q.q FROM q, par WHERE par.is_exact),
         ex AS (
           SELECT q_id, rank, n_id, cosine FROM (
             SELECT q_id, n_id, cosine,
                    CAST(row_number() OVER (PARTITION BY q_id
                      ORDER BY cosine DESC, n_id) AS INT) AS rank
             FROM (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                          ${qcosSql("a.q", "b.q")} AS cosine
                   FROM exq a JOIN exq b ON a.vec_id <> b.vec_id))
           WHERE rank <= 4),
         i0 AS (SELECT a.vec_id AS src, b.vec_id AS dst
                FROM q a
                JOIN range(4) t(o) ON TRUE
                JOIN q b ON b.vec_id = a.vec_id + CAST(t.o + 1 AS BIGINT)),
         c0 AS (SELECT src, dst FROM i0 UNION SELECT dst, src FROM i0),
         g0 AS (${nndTopK("SELECT src, dst FROM c0")}),
         g1 AS (${nndTopK(nndCand("g0"))}),
         g2 AS (${nndTopK(nndCand("g1"))}),
         res AS (
           SELECT e.q_id, e.rank, e.n_id, e.cosine FROM ex e, par WHERE par.is_exact
           UNION ALL
           SELECT g2.src, g2.rank, g2.dst, g2.cosine
           FROM g2, par WHERE NOT par.is_exact)
         SELECT res.q_id, res.rank, res.n_id, res.cosine,
                CASE WHEN par.is_exact THEN 'exact_blocked'
                     ELSE 'nn_descent' END AS graph_mode,
                par.n AS n_corpus
         FROM res, par ORDER BY q_id, rank""",

    // bigram MLE re-derived positionally: every consecutive pair
    // counts each occurrence, c1 = non-final-position counts (tokens
    // carry no spaces, so the space-joined bigram string is a faithful
    // (w1,w2) key)
    "text_bigram_lm_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         bg AS (SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS b
                FROM w WHERE len(w) >= 2),
         c12 AS (SELECT b, count(*) AS c12 FROM bg GROUP BY b),
         c1 AS (SELECT split_part(b, ' ', 1) AS w1, count(*) AS c1
                FROM bg GROUP BY 1),
         sc AS (SELECT g.doc_id, c12.c12 * 1000000 // c1.c1 AS p_ppm
                FROM bg g
                JOIN c12 ON c12.b = g.b
                JOIN c1 ON c1.w1 = split_part(g.b, ' ', 1))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(sum(p_ppm) AS BIGINT) AS sum_p_ppm,
                CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_p_ppm
         FROM sc GROUP BY doc_id ORDER BY doc_id""",

    // three synchronous LPA rounds unrolled, mode-with-min-tie pinned
    // by the (c DESC, label) row_number, over the same co-purchase
    // edge derivation the pagerank oracle uses
    "graph_lpa_communities" ->
      """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         edges AS (
           SELECT a.pk AS ea, b.pk AS eb
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT ea AS src, eb AS dst FROM edges
                 UNION ALL SELECT eb, ea FROM edges),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         n1 AS (SELECT sym.src, l0.label, count(*) AS c
                FROM sym JOIN l0 ON l0.node = sym.dst GROUP BY 1, 2),
         l1 AS (SELECT src AS node, label FROM (
                  SELECT src, label,
                         row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
                  FROM n1) WHERE rn = 1),
         n2 AS (SELECT sym.src, l1.label, count(*) AS c
                FROM sym JOIN l1 ON l1.node = sym.dst GROUP BY 1, 2),
         l2 AS (SELECT src AS node, label FROM (
                  SELECT src, label,
                         row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
                  FROM n2) WHERE rn = 1),
         n3 AS (SELECT sym.src, l2.label, count(*) AS c
                FROM sym JOIN l2 ON l2.node = sym.dst GROUP BY 1, 2),
         l3 AS (SELECT src AS node, label FROM (
                  SELECT src, label,
                         row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
                  FROM n3) WHERE rn = 1),
         sz AS (SELECT label, CAST(count(*) AS BIGINT) AS community_size
                FROM l3 GROUP BY 1)
         SELECT l3.node, l3.label AS community, sz.community_size
         FROM l3 JOIN sz ON sz.label = l3.label ORDER BY node""",

    // the full assembly re-derived: shared cleaning CTEs, then the
    // shared finishing tail (survivor-trained bigram LM, exact n/3 and
    // 2n/3 order statistics with MIN_LONG absent-rank fallback, the
    // portable-hash shard fold, in-shard positions) over `kept`
    "train_assembly_pipeline" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           UNION ALL
           SELECT doc_id + 2000000, text FROM documents),
         $cleanCtes,
         ${finishSql("kept")}""",
  )
}
