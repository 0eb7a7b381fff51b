package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity, TokenizerModel, Unigram}

/** Round-16 registry keys (file-number convention: `QueriesN` carries
  * the keys landed in round N−1) — the round-15 verdict's tokenizer
  * production gaps:
  *
  * 1. `unigram_encode_fallback` — open-world unigram encode
  *    ([[Unigram.unigramEncodeFallback]]): model trained on the
  *    'q'-FREE docs < 500 (~23% of the slice), the full slice
  *    encoded under it. The split is CONTENT-defined because the
  *    synthetic corpus is pure ASCII a-y in every language — a
  *    doc_id or lang split covers every character and the fallback
  *    would never fire; withholding the docs that contain the rarest
  *    letter makes 'q' genuinely unseen at train time, so the branch
  *    is exercised for real (n_oov > 0 asserted in spec). An unseen
  *    character
  *    becomes its own piece at the pinned fallback score (one e-fold
  *    below the rarest trained piece on the 1e6 grid) and the audit
  *    gains the OOV columns. Closes the silent-chunk-drop hole the
  *    round-15 advisor flagged (the old inner join null-dropped
  *    chunks with unseen characters).
  * 2. `unigram_encode_persisted` — [[TokenizerModel]]: train ONCE,
  *    persist (piece, count, score) + meta, reload, encode through
  *    the shared [[Unigram.encodeUnder]]. Shares `unigram_encode`'s
  *    oracle VERBATIM — the persisted serve path must be
  *    bit-identical to the inline train-then-encode chain, which is
  *    exactly the write→reload round-trip claim (the
  *    `knn_ivfpq_persisted` argument).
  * 3. `bpe_encode_persisted` — the BPE twin: merges + chunk vocab
  *    persisted, reloaded, encoded through the shared
  *    [[graft.ext.TextAnalysis.bpeEncodeUnder]]. Shares
  *    `bpe_encode_fallback`'s oracle VERBATIM, same argument.
  *
  * Every key deliberately pays the full train + write + reload +
  * encode round trip — the honest cost of the persistence claim.
  */
object Queries17 extends ExtHelpers {

  /** Scratch model directory per (process, source dir) — the
    * [[Queries16]] ixDir discipline (pid discriminator against
    * concurrent gate processes; no cleanup by design, /tmp-bounded).
    */
  private def modelDir(dir: String, tag: String): String =
    s"/tmp/graft_tok_model/${tag}_p${ProcessHandle.current().pid()}_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "unigram_encode_fallback" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
      Unigram.unigramEncodeFallback(d.filter(!col("text").contains("q")), d)
        .orderBy("lang")
    }),

    "unigram_encode_persisted" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
      val md = modelDir(dir, "unigram")
      TokenizerModel.writeUnigram(d, md)
      TokenizerModel.unigramEncodePersisted(s, md, d, openWorld = false)
        .orderBy("lang")
    }),

    "bpe_encode_persisted" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
      val md = modelDir(dir, "bpe")
      TokenizerModel.writeBpe(d.filter(col("doc_id") < 250), md)
      TokenizerModel.bpeEncodePersisted(s, md, d)
        .orderBy("lang")
    }),

    // the 100 TB trainer shape for the unigram model (the sampled-BPE
    // twin): model trained on the deterministic portableHash doc
    // sample, oracle re-derives the identical sample via the md5-fold
    // twin and the identical seed/EM chain
    "unigram_train_sampled" -> ((s, dir) =>
      Unigram.unigramTrainSampled(
          t(s, dir, "documents").filter(col("doc_id") < 500))
        .orderBy("piece")),

    // Lloyd-TRAINED quantizers for the rotated IVF-PQ chain (the
    // round-15 verdict's build-quality gap): 2 pinned integer k-means
    // rounds for the coarse cells AND the residual codebook, from the
    // same vec_id seeds the seeded build uses — the oracle re-derives
    // every Lloyd round relationally (argmin assignment, trunc-mean
    // update, empty-cluster keep)
    "knn_ivfpq_kmeans" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopKRotatedKmeans(e, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    // the production index: Lloyd-TRAINED quantizers AND persistence
    // composed — write(lloydIters=2) then serve from the reloaded
    // frames; shares the inline kmeans chain's oracle VERBATIM (the
    // knn_ivfpq_persisted round-trip argument, now for the trained
    // build)
    "knn_ivfpq_kmeans_persisted" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val ix = modelDir(dir, "annkmeans")
      AnnIndex.write(e, ix, lloydIters = 2)
      AnnIndex.searchTopK(s, ix, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    // incremental append under the FROZEN persisted model: build the
    // index, append every corpus vector again under shifted ids (the
    // "new arrivals" batch — same embeddings, so their rotation,
    // cells, and codes must be bit-identical to the originals'), then
    // serve; the oracle is the inline chain's codes UNION their
    // shifted twins
    "knn_ivfpq_append_serve" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val ix = modelDir(dir, "annappend")
      AnnIndex.write(e, ix)
      AnnIndex.append(s, ix,
        e.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
      AnnIndex.searchTopK(s, ix, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),
  )

  /** The open-world unigram encode oracle: the Queries16 train chain
    * on the 'q'-free slice, then the SAME unrolled Viterbi DP
    * over the doc_id < 500 encode chunks with the fallback candidate
    * rows (unseen single characters at min(model score) − 1e6 — no
    * model piece can end at an unseen character's position, so the
    * fallback row is the DP's only candidate there), plus the
    * pieces-backtrack to count fallback pieces per chunk for the OOV
    * columns.
    */
  private val unigramEncodeFallbackSql = {
    val m = s"m${2}" // UG_ROUNDS = 2 (Queries16's pinned depth)
    s"""WITH ${Queries16.ugTrainCtes("doc_id < 500 AND text NOT LIKE '%q%'")},
       ec0 AS (SELECT lang, replace(text, ' ', '▁') AS t
         FROM documents WHERE doc_id < 500),
       ech AS MATERIALIZED (
         SELECT w, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest([substr(t, i * 12 + 1, 12)
                 FOR i IN range(0, CAST(ceil(length(t) / 12.0) AS BIGINT))]) AS w
               FROM ec0)
         WHERE len(w) > 0 GROUP BY w),
       ${Queries16.ugDpCtes("e", m, chTab = "ech", fallback = true)},
       ${Queries16.ugBacktrackCtes("e", chTab = "ech").mkString(",\n       ")},
       oovw AS (
         SELECT p.w,
                CAST(sum(CASE WHEN length(p.piece) = 1 AND p.piece NOT IN
                       (SELECT piece FROM $m) THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         FROM piecese p GROUP BY p.w),
       encb AS (
         SELECT b.w, b.np AS n_tok, b.s AS lp_micro, o.n_oov
         FROM bbe b
         JOIN (SELECT w, CAST(length(w) AS INT) AS n FROM ech) q
           ON q.w = b.w AND b.i = q.n
         JOIN oovw o ON o.w = b.w),
       dch AS (
         SELECT lang, w FROM (
           SELECT lang, unnest([substr(t, i * 12 + 1, 12)
                   FOR i IN range(0, CAST(ceil(length(t) / 12.0) AS BIGINT))]) AS w
           FROM ec0)
         WHERE len(w) > 0)
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens,
              CAST(sum(length(w)) AS BIGINT) AS n_chars,
              CAST(sum(lp_micro) AS BIGINT) AS lp_micro_total,
              CAST(sum(CASE WHEN n_oov > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_oov_chunks,
              CAST(sum(n_oov) AS BIGINT) AS n_oov_chars,
              CAST(sum(n_tok) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS fertility_ppm,
              CAST(sum(n_tok) * 1000000
                // greatest(sum(length(w)), 1) AS BIGINT) AS compression_ppm,
              CAST(sum(CASE WHEN n_oov > 0 THEN 1 ELSE 0 END) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS oov_chunk_ppm
       FROM dch JOIN encb USING (w)
       GROUP BY lang ORDER BY lang"""
  }

  // ── Lloyd-trained IVF-PQ oracle machinery ─────────────────────────
  //
  // cells = 8, k = 8, m = 4 (16-wide subvectors of the 64-dim rotated
  // space), 2 Lloyd rounds, probes = 2, queries vec_id < 10 — the
  // Queries15 rotated-chain constants with the seeded quantizers
  // replaced by relationally-unrolled k-means: per round, assignment
  // is the argmin (exact integer L2, id) row_number pick, the update
  // is the per-dimension truncate-toward-zero integer mean (the `//`
  // route for negatives — DuckDB floors, so negate-divide-negate), and
  // an emptied cluster keeps its previous centroid via the LEFT JOIN
  // coalesce.

  private def kmeansCoarseRound(r: Int): String =
    s"""kad$r AS (SELECT a.vec_id, a.q, c.cell_id,
                      CAST(list_sum(list_transform(range(1, 65),
                        i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS BIGINT) AS d2c
               FROM pw a, kc${r - 1} c),
       ka$r AS (SELECT vec_id, q, cell_id FROM
                (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d2c, cell_id) AS rn FROM kad$r) WHERE rn = 1),
       ks$r AS (SELECT cell_id, CAST(t.i AS INT) AS dim,
                       CAST(sum(q[t.i]) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM ka$r, range(1, 65) t(i) GROUP BY 1, 2),
       kc$r AS MATERIALIZED (
         SELECT p.cell_id, coalesce(u.cq, p.cq) AS cq
         FROM kc${r - 1} p LEFT JOIN
           (SELECT cell_id, list(CASE WHEN s >= 0 THEN s // n
              ELSE -((-s) // n) END ORDER BY dim) AS cq
            FROM ks$r GROUP BY cell_id) u USING (cell_id))"""

  private def kmeansCbRound(r: Int): String =
    s"""kbd$r AS (SELECT a.vec_id, a.s, a.v, b.cid,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
               FROM ksub a JOIN kb${r - 1} b ON b.s = a.s),
       kba$r AS (SELECT vec_id, s, v, cid FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                    ORDER BY d2, cid) AS rn FROM kbd$r) WHERE rn = 1),
       kbs$r AS (SELECT s, cid, CAST(t.i AS INT) AS dim,
                        CAST(sum(v[t.i]) AS BIGINT) AS sv,
                        CAST(count(*) AS BIGINT) AS n
                 FROM kba$r, range(1, 17) t(i) GROUP BY 1, 2, 3),
       kb$r AS MATERIALIZED (
         SELECT p.s, p.cid, coalesce(u.c, p.c) AS c
         FROM kb${r - 1} p LEFT JOIN
           (SELECT s, cid, list(CASE WHEN sv >= 0 THEN sv // n
              ELSE -((-sv) // n) END ORDER BY dim) AS c
            FROM kbs$r GROUP BY s, cid) u USING (s, cid))"""

  private val KM_ROUNDS = 2

  private val ivfPqKmeansSql = {
    val fm = s"kc$KM_ROUNDS"
    val fb = s"kb$KM_ROUNDS"
    s"""WITH ${Queries15.rotatedPwSql(8, 64)},
       kc0 AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS cq
               FROM pw WHERE vec_id < 8),
       ${(1 to KM_ROUNDS).map(kmeansCoarseRound).mkString(",\n       ")},
       kfad AS (SELECT a.vec_id, a.q, c.cell_id, c.cq,
                       CAST(list_sum(list_transform(range(1, 65),
                         i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS BIGINT) AS d2c
                FROM pw a, $fm c),
       kasg AS (SELECT vec_id, q, cell_id, cq FROM
                (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d2c, cell_id) AS rn FROM kfad) WHERE rn = 1),
       kres AS (SELECT vec_id, cell_id,
                       list_transform(range(1, 65), i -> q[i] - cq[i]) AS r
                FROM kasg),
       ksub AS (SELECT vec_id, cell_id, CAST(t.s AS INT) AS s,
                       r[t.s * 16 + 1 : t.s * 16 + 16] AS v
                FROM kres, range(4) t(s)),
       kb0 AS (SELECT CAST(vec_id AS INT) AS cid, s, v AS c
               FROM ksub WHERE vec_id < 8),
       ${(1 to KM_ROUNDS).map(kmeansCbRound).mkString(",\n       ")},
       kcd AS (SELECT a.vec_id, a.cell_id, a.s, b.cid,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
               FROM ksub a JOIN $fb b ON b.s = a.s),
       kcodes AS (SELECT vec_id AS n_id, cell_id, s, cid FROM
                  (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                     ORDER BY d2, cid) AS rn FROM kcd) WHERE rn = 1),
       kprobed AS (SELECT vec_id AS q_id, cell_id, cq, q FROM
                   (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d2c, cell_id) AS rn
                    FROM kfad WHERE vec_id < 10) WHERE rn <= 2),
       kqres AS (SELECT q_id, cell_id,
                        list_transform(range(1, 65), i -> q[i] - cq[i]) AS qr
                 FROM kprobed),
       kqsub AS (SELECT q_id, cell_id, CAST(t.s AS INT) AS s,
                        qr[t.s * 16 + 1 : t.s * 16 + 16] AS v
                 FROM kqres, range(4) t(s)),
       kdtab AS (SELECT a.q_id, a.cell_id, a.s, b.cid,
                        CAST(list_sum(list_transform(range(1, 17),
                          i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
                 FROM kqsub a JOIN $fb b ON b.s = a.s),
       kadc AS (SELECT kdtab.q_id, kcodes.n_id,
                       CAST(sum(kdtab.d2) AS BIGINT) AS adc_d2
                FROM kcodes JOIN kdtab ON kdtab.cell_id = kcodes.cell_id
                                      AND kdtab.s = kcodes.s
                                      AND kdtab.cid = kcodes.cid
                WHERE kdtab.q_id != kcodes.n_id GROUP BY 1, 2),
       kr AS (SELECT q_id, n_id, adc_d2,
                     CAST(row_number() OVER (PARTITION BY q_id
                       ORDER BY adc_d2, n_id) AS INT) AS rank
              FROM kadc)
       SELECT q_id, n_id, adc_d2, rank FROM kr WHERE rank <= 5
       ORDER BY q_id, rank"""
  }

  /** The append-serve oracle: the inline rotated chain's codes UNION
    * their id-shifted twins (an appended copy of a corpus vector
    * rotates, assigns, and encodes bit-identically under the frozen
    * model — that equality IS the frozen-model claim), ADC-scored by
    * the same probe tables.
    */
  private val ivfPqAppendServeSql =
    s"""WITH ${Queries15.rotatedPwSql(8, 64)},
       ${Queries15.ivfPqRotatedAdcCtes},
       acodes AS (SELECT n_id, cell_id, s, cid FROM icodes
                  UNION ALL
                  SELECT n_id + 1000000 AS n_id, cell_id, s, cid FROM icodes),
       aadc AS (SELECT idtab.q_id, acodes.n_id,
                       CAST(sum(idtab.d2) AS BIGINT) AS adc_d2
                FROM acodes JOIN idtab ON idtab.cell_id = acodes.cell_id
                                      AND idtab.s = acodes.s
                                      AND idtab.cid = acodes.cid
                WHERE idtab.q_id != acodes.n_id GROUP BY 1, 2),
       ar AS (SELECT q_id, n_id, adc_d2,
                     CAST(row_number() OVER (PARTITION BY q_id
                       ORDER BY adc_d2, n_id) AS INT) AS rank
              FROM aadc)
       SELECT q_id, n_id, adc_d2, rank FROM ar WHERE rank <= 5
       ORDER BY q_id, rank"""

  private val unigramTrainSampledSql =
    s"""WITH ${Queries16.ugTrainCtes(
        "doc_id < 500 AND " + Queries16.sampledPredSql("ugsample", 50))}
       SELECT piece, CAST(length(piece) AS BIGINT) AS n_chars,
              c AS count, s AS score
       FROM m2 ORDER BY piece"""

  val oracles: Map[String, String] = Map(
    "unigram_encode_fallback" -> unigramEncodeFallbackSql,
    "unigram_train_sampled" -> unigramTrainSampledSql,

    "knn_ivfpq_kmeans" -> ivfPqKmeansSql,
    "knn_ivfpq_kmeans_persisted" -> ivfPqKmeansSql,
    "knn_ivfpq_append_serve" -> ivfPqAppendServeSql,

    // bit-identity with the inline train-then-encode chain IS the
    // persistence claim: same oracle text, zero re-derivation drift
    "unigram_encode_persisted" -> Queries16.unigramEncodeSql,
    "bpe_encode_persisted" -> Queries16.bpeEncodeFallbackSql,
  )
}
