package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, Scale, Similarity}

/** Round-8 registry: the remaining measure→decide→act policies. Round
  * 7 proved the pattern on simhash (re-banding) and ANN (SNR gate);
  * this round closes the three knobs the round-7 verdict flagged as
  * still static or unconsumed:
  *
  *  - `multimodal_phash_rebanding` — the image-tier monitor finally
  *    ACTS (round 6 measured 17× organic band saturation; the policy
  *    re-bands the 64-bit dHash to 32-bit buckets before expansion).
  *  - `knn_ivf_cells_auto` — IVF cell count sized ≈√n from the
  *    measured corpus, so the flat fallback scans probes/√n of the
  *    corpus (falling with n) instead of a constant 25%.
  *  - `join_skew_adaptive_*` — the skew report's histogram drives a
  *    plain-vs-salted join decision; both branches oracle-pinned
  *    (`documents.lang`, the real English-dominated-corpus skew, vs
  *    the uniform TPC-H orders⋈customer key).
  *  - `multimodal_ulaw_fingerprint_robustness` — audio dedup survives
  *    the lossy codec (the μ-law analog of JPEG-phash robustness),
  *    with a per-doc-varying control the oracle re-derives.
  */
object Queries8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the image re-banding DECISION as data: both band-width monitors
    // side by side plus the verdict phashNearDupAuto acts on (16-bit
    // budget super-linear in image count → 32-bit buckets). Hashes,
    // bucket stats and the CASE all re-derived by the DuckDB oracle
    // from the seeded-pixel formula.
    "multimodal_phash_rebanding" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val hashes = Multimodal.phashHashes(
        Multimodal.bmpWithPerturbedTwins(t(s, dir, "documents")))
      // eagerly checkpointed (reference-tracked blocks), NOT persist():
      // a library caller would otherwise leak the cached frame for the
      // session's lifetime — the same hygiene fix ivfPqAdaptive got
      // (Similarity.scala `Checkpoints.truncate`).
      val s16 = graft.ext.Checkpoints.truncate(
        Multimodal.phashBandStats(hashes, 4))
      val s32 = Multimodal.phashBandStats(hashes, 2)
      val dec = s16
        .agg(sum(col("pair_budget")).as("b16"), max(col("n_imgs")).as("ni"))
        .select(when(col("b16") > col("ni") * 8, 32).otherwise(16)
          .as("chosen_bits"))
      s16.withColumn("band_bits", lit(16))
        .unionByName(s32.withColumn("band_bits", lit(32)))
        .crossJoin(broadcast(dec))
        .select(col("band_bits"), col("band_idx"), col("n_imgs"),
          col("n_buckets"), col("max_bucket"), col("pair_budget"),
          col("chosen_bits"))
        .orderBy("band_bits", "band_idx")
    }),

    // audio-fingerprint robustness under the lossy codec: a
    // position-weighted frame fingerprint of the exact PCM vs its
    // μ-law round trip, with the frame-REVERSED fingerprint as the
    // mismatched-pair control (per-doc-varying — the stub-proof shape).
    "multimodal_ulaw_fingerprint_robustness" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.ulawFingerprintQc(t(s, dir, "documents"))
        .toDF()
        .orderBy("doc_id")
    }),

    // IVF with corpus-sized cells: count → cells = max(8, ⌊√n⌋) →
    // the SAME adaptive pipeline (SNR gate and all), so the flat
    // fallback's scan fraction is probes/√n instead of probes/8.
    "knn_ivf_cells_auto" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cells = Similarity.adaptiveCells(e.count())
      Similarity.ivfPqAdaptive(e, e.filter(col("vec_id") < 10), cells = cells)
        .withColumn("cells", lit(cells))
        .orderBy("q_id", "rank")
    }),

    // the skew policy's SALTED branch: documents.lang (en holds 1.9–2.2× its
    // even share across SFs — the canonical English-dominated-corpus skew)
    // joins a per-lang dim through the measured-histogram gate; the
    // aggregate result is join-strategy-invariant, so the oracle pins
    // both the data and the decision.
    "join_skew_adaptive_salted" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val dim = d.groupBy(col("lang"))
        .agg(count(lit(1)).as("lang_docs"))
      Scale.adaptiveJoin(d, dim, "lang")
        .groupBy(col("lang"), col("join_strategy"), col("skew_x_ppm"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          max(col("lang_docs")).as("lang_docs"))
        .orderBy("lang")
    }),

    // the PLAIN branch: events⋈type-dim on the uniform event_type
    // (5 types at ~even share — max ≈ 1.01× — at every SF by
    // construction; note the "obvious" uniform candidates aren't:
    // measured o_custkey is 2.5× skewed by sparsity) — the healthy
    // input must NOT pay the salt explosion.
    "join_skew_adaptive_plain" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), col("value"))
      val dim = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_events"))
      Scale.adaptiveJoin(e, dim, "event_type")
        .groupBy(col("event_type"), col("join_strategy"), col("skew_x_ppm"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("cents"),
          max(col("type_events")).as("type_events"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(

    "multimodal_phash_rebanding" ->
      s"""WITH ${Queries5.phashCtes},
         b16 AS (SELECT band_idx, band, count(*) AS c FROM bands GROUP BY 1, 2),
         st16 AS (SELECT CAST(16 AS INT) AS band_bits, band_idx,
                         CAST(sum(c) AS BIGINT) AS n_imgs,
                         CAST(count(*) AS BIGINT) AS n_buckets,
                         CAST(max(c) AS BIGINT) AS max_bucket,
                         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pair_budget
                  FROM b16 GROUP BY band_idx),
         bands32 AS (SELECT id, CAST(t.b AS INT) AS band_idx,
                            (hash >> CAST(t.b * 32 AS INT)) & 4294967295 AS band
                     FROM hsh, range(2) t(b)),
         b32 AS (SELECT band_idx, band, count(*) AS c FROM bands32 GROUP BY 1, 2),
         st32 AS (SELECT CAST(32 AS INT) AS band_bits, band_idx,
                         CAST(sum(c) AS BIGINT) AS n_imgs,
                         CAST(count(*) AS BIGINT) AS n_buckets,
                         CAST(max(c) AS BIGINT) AS max_bucket,
                         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pair_budget
                  FROM b32 GROUP BY band_idx),
         u AS (SELECT * FROM st16 UNION ALL SELECT * FROM st32),
         dec AS (SELECT CASE WHEN (SELECT sum(pair_budget) FROM st16)
                                  > 8 * (SELECT max(n_imgs) FROM st16)
                             THEN CAST(32 AS INT) ELSE CAST(16 AS INT) END AS chosen_bits)
         SELECT u.band_bits, u.band_idx, u.n_imgs, u.n_buckets, u.max_bucket,
                u.pair_budget, dec.chosen_bits
         FROM u, dec ORDER BY band_bits, band_idx""",

    // signal + companding formulas identical to multimodal_ulaw_roundtrip;
    // fingerprints are position-weighted per-64-sample frame sums
    // (Σ (i%64+1)·pcm — phase-sensitive; see ulawFingerprintQc), the
    // control is the frame-reversed exact fingerprint.
    "multimodal_ulaw_fingerprint_robustness" ->
      """WITH d AS (SELECT doc_id, 256 + doc_id % 512 AS n FROM documents),
         s AS (SELECT doc_id, n, t.i AS i,
                      CAST((doc_id * 2654435761 + t.i * 40503) % 65536 - 32768 AS BIGINT) AS pcm
               FROM d, range(768) t(i) WHERE t.i < n),
         e AS (SELECT *,
                 CASE WHEN pcm < 0 THEN 1 ELSE 0 END AS neg,
                 least(abs(pcm), 32635) + 132 AS mag
               FROM s),
         x AS (SELECT *,
                 CASE WHEN mag >= 16384 THEN 7 WHEN mag >= 8192 THEN 6
                      WHEN mag >= 4096 THEN 5 WHEN mag >= 2048 THEN 4
                      WHEN mag >= 1024 THEN 3 WHEN mag >= 512 THEN 2
                      WHEN mag >= 256 THEN 1 ELSE 0 END AS expo
               FROM e),
         m AS (SELECT *, (mag // (1 << (expo + 3))) % 16 AS mant FROM x),
         dec AS (SELECT doc_id, n, i, pcm,
                        (CASE WHEN neg = 1 THEN -1 ELSE 1 END) *
                        ((mant * 8 + 132) * (1 << expo) - 132) AS rec
                 FROM m),
         fp AS (SELECT doc_id, n, i // 64 AS k,
                       CAST(sum((i % 64 + 1) * pcm) AS BIGINT) AS fo,
                       CAST(sum((i % 64 + 1) * rec) AS BIGINT) AS fd
                FROM dec GROUP BY 1, 2, 3),
         nf AS (SELECT doc_id, CAST((min(n) + 63) // 64 AS INT) AS n_frames
                FROM fp GROUP BY doc_id),
         pairs AS (SELECT a.doc_id, a.k, a.fd, a.fo, b.fo AS fo_rev
                   FROM fp a
                   JOIN nf ON nf.doc_id = a.doc_id
                   JOIN fp b ON b.doc_id = a.doc_id
                            AND b.k = nf.n_frames - 1 - a.k)
         SELECT p.doc_id,
                CAST(min(d.n) AS BIGINT) AS n_samples,
                CAST(min(nf.n_frames) AS INT) AS n_frames,
                CAST(sum((p.k + 1) * p.fd) AS BIGINT) AS fp_checksum,
                CAST(sum(abs(p.fd - p.fo)) AS BIGINT) AS self_l1,
                CAST(sum(abs(p.fd - p.fo_rev)) AS BIGINT) AS control_l1,
                sum(abs(p.fd - p.fo)) < sum(abs(p.fd - p.fo_rev)) AS robust
         FROM pairs p JOIN nf ON nf.doc_id = p.doc_id
                      JOIN d ON d.doc_id = p.doc_id
         GROUP BY p.doc_id ORDER BY p.doc_id""",

    // the shared adaptive pipeline with cells = max(8, ⌊√count⌋),
    // re-derived by the oracle from its own count(*)
    "knn_ivf_cells_auto" ->
      s"""SELECT o.*,
               CAST((SELECT greatest(8, CAST(floor(sqrt(count(*))) AS INT))
                     FROM embeddings) AS INT) AS cells
         FROM (${Queries7.adaptiveOracle(
        """SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
         FROM embeddings""",
        "SELECT greatest(8, CAST(floor(sqrt(count(*))) AS INT)) FROM embeddings")}) o
         ORDER BY o.q_id, o.rank""",

    "join_skew_adaptive_salted" ->
      """WITH m AS (SELECT CAST(max(c) * count(*) * 1000000 // sum(c) AS BIGINT) AS skew_x_ppm
                    FROM (SELECT count(*) AS c FROM documents GROUP BY lang)),
         dim AS (SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs
                 FROM documents GROUP BY lang)
         SELECT d.lang,
                CASE WHEN m.skew_x_ppm > 1500000 THEN 'salted' ELSE 'plain' END AS join_strategy,
                m.skew_x_ppm,
                count(*) AS n_docs,
                CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
                CAST(max(dim.lang_docs) AS BIGINT) AS lang_docs
         FROM documents d JOIN dim ON dim.lang = d.lang, m
         GROUP BY d.lang, m.skew_x_ppm ORDER BY d.lang""",

    "join_skew_adaptive_plain" ->
      """WITH m AS (SELECT CAST(max(c) * count(*) * 1000000 // sum(c) AS BIGINT) AS skew_x_ppm
                    FROM (SELECT count(*) AS c FROM events GROUP BY event_type)),
         dim AS (SELECT event_type, CAST(count(*) AS BIGINT) AS type_events
                 FROM events GROUP BY event_type)
         SELECT e.event_type,
                CASE WHEN m.skew_x_ppm > 1500000 THEN 'salted' ELSE 'plain' END AS join_strategy,
                m.skew_x_ppm,
                count(*) AS n_events,
                CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents,
                CAST(max(dim.type_events) AS BIGINT) AS type_events
         FROM events e JOIN dim ON dim.event_type = e.event_type, m
         GROUP BY e.event_type, m.skew_x_ppm ORDER BY e.event_type""",
  )
}
