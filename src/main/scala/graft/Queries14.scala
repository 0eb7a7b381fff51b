package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, TextAnalysis, TrainPrep}

/** Round-14 registry keys — the data-selection / budgeting tier of the
  * training pipeline:
  *
  * 1. `dsir_importance_weights` — DSIR (Xie et al. 2023): per-document
  *    log importance weights of hashed-unigram features, target vs raw
  *    distribution, Laplace-smoothed, integerized at the BUCKET grain
  *    (the B-row model) so the doc-grain sum is exact Long addition.
  *    Target slice = `doc_id % 20 = 0` — the same curated slice the
  *    `decontamination` key treats as its eval suite.
  * 2. `dataset_token_budget_plan` — the pre-materialization planning
  *    table: sqrt-temperature mixture over source token counts, drawn
  *    tokens per source under a fixed budget, and the epoch multiplier
  *    that makes over-epoching visible.
  * 3. `bpe_encode_corpus` — the learned tokenizer applied corpus-wide
  *    at VOCAB grain (each distinct word encoded once, the word→count
  *    model broadcast back): per-doc token counts, fertility and
  *    compression ppm — the numbers a run budget is sized with.
  */
object Queries14 extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dsir_importance_weights" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TrainPrep.dsirWeights(d, d.filter(col("doc_id") % 20 === 0), buckets = 256)
        .orderBy("doc_id")
    }),

    // the resampling step the weights exist for: keep the top quarter
    // by importance weight, threshold from the weight-histogram order
    // statistic (ties at the threshold excluded, deterministic)
    "dsir_select" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TrainPrep.dsirSelect(d, d.filter(col("doc_id") % 20 === 0),
          buckets = 256, keepPpm = 250000L)
        .orderBy("doc_id")
    }),

    "dataset_token_budget_plan" -> ((s, dir) =>
      TrainPrep.tokenBudgetPlan(t(s, dir, "documents"), budget = 50000L)
        .orderBy("source")),

    "bpe_encode_corpus" -> ((s, dir) =>
      TextAnalysis.bpeEncodeCorpus(t(s, dir, "documents"), rounds = 4)
        .orderBy("doc_id")),

    // the tokenizer-equity audit: fertility of the corpus-trained
    // merges per LANGUAGE - where a mixed-corpus vocab's
    // over-segmentation of under-represented languages shows up
    "bpe_fertility_by_lang" -> ((s, dir) =>
      TextAnalysis.bpeFertilityByLang(t(s, dir, "documents"), rounds = 4)
        .orderBy("lang")),

    // WITHIN-doc repetition removal (Gopher A1.3) on a corpus seeded
    // with in-document repeats (every 3rd doc re-appends its own first
    // 8 words); cross-doc duplication deliberately untouched here
    "dedup_repetition_excise" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w8 = array_join(slice(split(col("text"), " "), 1, 8), " ")
      val seeded = d.withColumn("text",
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" "), w8))
          .otherwise(col("text")))
      Dedup.repetitionExcise(seeded, w = 5).orderBy("doc_id")
    }),

    // GIF completes the phash-cluster format matrix (BMP and PNG ship
    // the same composition): explicit-palette GIF is LOSSLESS, so the
    // decoded dhash — and therefore the whole banded-pair +
    // star-contraction pipeline and its oracle — is the BMP one
    "multimodal_gif_phash_clusters" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val pairs = Multimodal.phashNearDupDecodedAuto(
          Multimodal.gifWithPerturbedTwins(docs))
        .select(col("id_a").as("a_id"), col("id_b").as("b_id"))
      val ids = docs.select(col("doc_id"))
        .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id")))
      Dedup.dupClustersStar(ids, pairs).orderBy("doc_id")
    }),
  )

  /** One BPE training round as CTE text, CARRYING the source word —
    * the [[Queries12]] `bpeRound` twin (same pair counts, argmax tie
    * rule, and greedy left-to-right fold; that one re-derives the
    * MERGE TABLE and deliberately drops `w`, this one keeps the
    * word→symbols mapping alive because encoding is exactly that
    * mapping's final state).
    */
  private def bpeRoundW(i: Int, prev: String): String =
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
         SELECT t.w, t.freq,
                CASE WHEN m.ma IS NULL THEN t.s
                     ELSE list_reduce(string_split(t.s, ' '),
                       (acc, x) -> CASE WHEN x = m.mb AND
                                            (acc = m.ma OR ends_with(acc, ' ' || m.ma))
                                        THEN acc || x
                                        ELSE acc || ' ' || x END) END AS s
         FROM $prev t LEFT JOIN m$i m ON TRUE)"""

  /** The DSIR per-doc weight chain as CTE text — shared by the weight
    * and selection oracles; ends with relation `dw`(doc_id, n_tokens,
    * logw_micro), one row per document.
    */
  private val dsirCtes =
    """tok AS (
         SELECT doc_id,
                list_reduce(
                  [CAST(ascii(ch) AS BIGINT) FOR ch IN
                    regexp_extract_all(md5('dsir|' || w), '.')],
                  (a, b) -> (a * 31 + b) % 1000000007) % 256 AS bucket
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE len(w) > 0),
       tgtb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_tgt
                FROM tok WHERE doc_id % 20 = 0 GROUP BY bucket),
       rawb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_raw
                FROM tok GROUP BY bucket),
       tot AS (SELECT (SELECT sum(c_raw) FROM rawb) AS n_raw,
                      (SELECT coalesce(sum(c_tgt), 0) FROM tgtb) AS n_tgt),
       model AS (
         SELECT r.bucket,
                CAST(floor(((ln(coalesce(t.c_tgt, 0) + 1) + ln(tot.n_raw + 256))
                  - (ln(r.c_raw + 1) + ln(tot.n_tgt + 256))) * 1e6) AS BIGINT) AS lr
         FROM rawb r LEFT JOIN tgtb t USING (bucket) CROSS JOIN tot),
       per AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(lr) AS BIGINT) AS logw_micro
         FROM tok JOIN model USING (bucket) GROUP BY doc_id),
       dw AS (
         SELECT d.doc_id,
                coalesce(per.n_tokens, 0) AS n_tokens,
                coalesce(per.logw_micro, 0) AS logw_micro
         FROM documents d LEFT JOIN per USING (doc_id))"""

  /** The 4-round word-carrying training chain ending in the encode
    * model `enc`(w, n_tok, n_chr) — shared by the doc-grain and
    * language-grain encode oracles.
    */
  private val bpeEncCtes = {
    val rounds = (1 to 4).map(i => bpeRoundW(i, s"s${i - 1}"))
    s"""w0 AS (
           SELECT w, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE len(w) > 0 GROUP BY w),
         s0 AS (
           SELECT w, freq,
                  array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
           FROM w0),
         ${rounds.mkString(",\n         ")},
         enc AS (
           SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tok,
                  CAST(length(w) AS BIGINT) AS n_chr
           FROM s4)"""
  }

  val oracles: Map[String, String] = Map(

    // token -> bucket via the portable-hash twin; both distributions
    // as B-row aggregates; the bucket log-ratio floored to the 1e6
    // grid BEFORE the per-doc sum (exact integer addition after)
    "dsir_importance_weights" ->
      s"""WITH $dsirCtes
         SELECT doc_id, n_tokens, logw_micro
         FROM dw ORDER BY doc_id""",

    // the (n-k)-th weight order statistic as the keep threshold,
    // strictly-above semantics (threshold ties excluded), the vacuous
    // no-order-statistic branch keeping everything
    "dsir_select" ->
      s"""WITH $dsirCtes,
         rk AS (SELECT dw.*,
                       row_number() OVER (ORDER BY logw_micro, doc_id) AS rn,
                       CAST(count(*) OVER () AS BIGINT) AS n
                FROM dw),
         th AS (SELECT max(n) AS n,
                       max(n - n * 250000 // 1000000) AS r,
                       max(CASE WHEN rn = n - n * 250000 // 1000000
                                THEN logw_micro END) AS t0
                FROM rk)
         SELECT rk.doc_id, rk.n_tokens, rk.logw_micro,
                CASE WHEN th.r < 1 THEN TRUE
                     ELSE rk.logw_micro > th.t0 END AS kept
         FROM rk CROSS JOIN th
         ORDER BY rk.doc_id""",

    "dataset_token_budget_plan" ->
      """WITH per AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len([w FOR w IN string_split(text, ' ') IF len(w) > 0]))
                    AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         sq AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s
                FROM per),
         tt AS (SELECT sum(s) AS st FROM sq),
         wp AS (SELECT sq.*, CAST(s * 1000000 // tt.st AS BIGINT) AS weight_ppm
                FROM sq CROSS JOIN tt),
         pl AS (SELECT *, CAST(50000 * weight_ppm // 1000000 AS BIGINT) AS planned_tokens
                FROM wp)
         SELECT source, n_docs, n_tokens, weight_ppm, planned_tokens,
                CAST(CASE WHEN n_tokens > 0
                     THEN planned_tokens * 1000000 // n_tokens
                     ELSE 0 END AS BIGINT) AS epochs_ppm,
                (CASE WHEN n_tokens > 0
                      THEN planned_tokens * 1000000 // n_tokens
                      ELSE 0 END) > 1000000 AS oversampled
         FROM pl ORDER BY source""",

    // the 4 training rounds re-derived with the word carried through,
    // then the doc-grain join of the final word->token-count model
    "bpe_encode_corpus" ->
      s"""WITH $bpeEncCtes,
         dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         per AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                  CAST(sum(n_chr) AS BIGINT) AS n_chars
           FROM (SELECT doc_id, w FROM dt WHERE len(w) > 0) t
           JOIN enc USING (w) GROUP BY doc_id)
         SELECT d.doc_id,
                coalesce(per.n_words, 0) AS n_words,
                coalesce(per.n_tokens, 0) AS n_tokens,
                coalesce(per.n_chars, 0) AS n_chars,
                CAST(coalesce(per.n_tokens, 0) * 1000000
                  // greatest(coalesce(per.n_words, 0), 1) AS BIGINT) AS fertility_ppm,
                CAST(coalesce(per.n_tokens, 0) * 1000000
                  // greatest(coalesce(per.n_chars, 0), 1) AS BIGINT) AS compression_ppm
         FROM documents d LEFT JOIN per USING (doc_id)
         ORDER BY d.doc_id""",

    // the same trained model, language-grain aggregation (inner join:
    // a language exists in the output iff it has tokens)
    "bpe_fertility_by_lang" ->
      s"""WITH $bpeEncCtes,
         dt AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                CAST(sum(n_chr) AS BIGINT) AS n_chars,
                CAST(sum(n_tok) * 1000000
                  // greatest(count(*), 1) AS BIGINT) AS fertility_ppm,
                CAST(sum(n_tok) * 1000000
                  // greatest(sum(n_chr), 1) AS BIGINT) AS compression_ppm
         FROM (SELECT lang, w FROM dt WHERE len(w) > 0) t
         JOIN enc USING (w)
         GROUP BY lang ORDER BY lang""",

    // the within-doc first-occurrence window (PARTITION BY doc_id, h)
    // over the seeded corpus, then the span_excise reassembly
    "dedup_repetition_excise" ->
      """WITH corpus AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0
                       THEN text || ' ' ||
                            array_to_string(string_split(text, ' ')[1:8], ' ')
                       ELSE text END AS text
           FROM documents),
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
                    row_number() OVER (PARTITION BY doc_id, h ORDER BY pos) AS rk
             FROM occ)
           WHERE rk >= 2),
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

    // lossless format ⇒ identical decoded hashes ⇒ the BMP phash
    // cluster oracle IS the GIF oracle (the Queries6 PNG convention)
    "multimodal_gif_phash_clusters" -> Queries5.oracles("multimodal_phash_clusters"),
  )
}
