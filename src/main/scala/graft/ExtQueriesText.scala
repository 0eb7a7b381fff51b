package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOf, CorpusClean, DataDiff, Dedup, Events, GraphOps, Multimodal, RangeJoin, Similarity, TextAnalysis, TrainPrep}


/** Text-analysis tier: quality gates, language ID, fingerprints, TF-IDF/inverted-index and tokenization keys (split from ExtQueries, round 7 — no behavior change).
  * Shared corpus/SQL helpers live in [[ExtHelpers]]; every key keeps its
  * DuckDB oracle twin next to it in this file's `oracles` map.
  */
object ExtQueriesText extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(


    // C4-style cross-document boilerplate screen over the planted
    // near-copy corpus (shared 8-grams = the duplicated content)
    "text_boilerplate_ngrams" -> ((s, dir) =>
      TextAnalysis.boilerplateNgrams(corpusWithNearCopies(s, dir))
        .orderBy("doc_id")),


    // corpus repetitiveness: coverage of all 8-gram occurrences by the
    // top-k frequent grams, at three probe sizes
    "text_ngram_coverage" -> ((s, dir) =>
      TextAnalysis.ngramCoverageCurve(corpusWithNearCopies(s, dir))
        .orderBy("top_k")),


    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents")).orderBy("doc_id")),


    // model-based quality filtering plumbing: hashed-feature linear
    // scorer (deterministic weights stand in for the learned table)
    "text_quality_classifier" -> ((s, dir) =>
      TextAnalysis.qualityClassifier(t(s, dir, "documents")).orderBy("doc_id")),


    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalize(t(s, dir, "documents")).orderBy("doc_id")),


    // frequency-ranked vocab (+<unk>=0) and per-doc ordered id arrays
    "tokens_to_ids" -> ((s, dir) =>
      TrainPrep.tokensToIds(t(s, dir, "documents")).orderBy("doc_id")),


    // 32-word windows, stride 16 — the pretrain/RAG chunker
    "text_chunk_windows" -> ((s, dir) =>
      TrainPrep.chunkWindows(t(s, dir, "documents")).orderBy("doc_id", "chunk_id")),


    "text_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents")).orderBy("doc_id")),


    "text_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents")).orderBy("doc_id")),


    // classifier QC view: declared-vs-predicted language confusion
    // matrix with per-declared-language row shares in exact ppm —
    // where the n-gram heuristic (or any swapped-in model) misfires
    "text_lang_confusion" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"))
        .groupBy(col("labeled_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share_ppm", expr(
          "n_docs * 1000000 div (sum(n_docs) over (partition by labeled_lang))"))
        .orderBy("labeled_lang", "predicted_lang")),


    "text_language_id" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents")).orderBy("doc_id")),


    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(t(s, dir, "documents")).orderBy("doc_id")),


    "text_rolling_fingerprint" -> ((s, dir) =>
      TextAnalysis.rollingFingerprint(t(s, dir, "documents")).orderBy("doc_id")),


    "text_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 40), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-000"), col("doc_id")).as("raw"))
        .select(col("doc_id"), TextAnalysis.redactPii(col("raw")).as("clean"))
        .orderBy("doc_id")),


    "ngram_topk" -> ((s, dir) =>
      TextAnalysis.topBigrams(t(s, dir, "documents"), 20)),


    // eval-split novelty: which 8-grams of the held-out docs never occur
    // in the training split, per language — the leakage/overlap dual of
    // `decontamination` (that key flags train docs; this one grades the
    // eval set). Grams join on their md5 so only 32-char digests
    // shuffle, never the 8-word strings.
    "ngram_novelty_by_lang" -> ((s, dir) => {
      import graft.ext.TextPrimitives._
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(shingles(tokens(col("text")), 8)).as("g"))
        .select(col("doc_id"), col("lang"), md5(col("g")).as("gh"))
      val evalG = grams.filter(col("doc_id") % 20 === 0)
        .select(col("lang"), col("gh")).distinct()
      val trainG = grams.filter(col("doc_id") % 20 =!= 0)
        .select(col("gh")).distinct().withColumn("seen", lit(1L))
      evalG.join(trainG, Seq("gh"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_eval_grams"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_eval_grams"))
        .orderBy("lang")
    }),


    // source×lang contingency with the exact independence ratio in ppm
    // (observed * total * 1e6 div (rowTotal * colTotal)) — the mixture-
    // design screen for "does this source over-represent a language".
    // Marginals broadcast; only the cell aggregation shuffles.
    "source_lang_contingency" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val cell = d.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      val bySource = d.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
      val byLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      val total = d.agg(count(lit(1)).as("n_total"))
      cell
        .join(broadcast(bySource), Seq("source"))
        .join(broadcast(byLang), Seq("lang"))
        .crossJoin(broadcast(total))
        .select(col("source"), col("lang"), col("n"), col("n_source"),
          col("n_lang"),
          expr("n * n_total * 1000000 div (n_source * n_lang)").as("ratio_ppm"))
        .orderBy("source", "lang")
    }),


    // postings rendered as a comma string: the oracle hash-compare does
    // not support array cells
    "text_inverted_index" -> ((s, dir) =>
      TextAnalysis.invertedIndex(t(s, dir, "documents"))
        .select(col("term"), concat_ws(",", col("postings")).as("postings"), col("df"))
        .orderBy("term")),


    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(t(s, dir, "documents"))
        .orderBy("doc_id", "rnk")),
  )

  val oracles: Map[String, String] = Map(


    "text_boilerplate_ngrams" ->
      s"""WITH corpus AS ($nearCorpusSql),
         t AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         g AS (SELECT DISTINCT doc_id, gram FROM (
                 SELECT doc_id,
                        unnest([array_to_string(w[i+1:i+8], ' ')
                                FOR i IN range(0, greatest(len(w)-7, 0))]) AS gram
                 FROM t)),
         common AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         per AS (
           SELECT g.doc_id,
                  CAST(count(*) AS BIGINT) AS n_grams,
                  CAST(sum(CASE WHEN c.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate
           FROM g LEFT JOIN common c USING (gram)
           GROUP BY g.doc_id)
         SELECT corpus.doc_id,
                coalesce(per.n_grams, 0) AS n_grams,
                coalesce(per.n_boilerplate, 0) AS n_boilerplate,
                coalesce(per.n_boilerplate * 1000000 // per.n_grams, 0) AS boiler_ppm
         FROM corpus LEFT JOIN per ON corpus.doc_id = per.doc_id
         ORDER BY corpus.doc_id""",


    "text_ngram_coverage" ->
      s"""WITH corpus AS ($nearCorpusSql),
         t AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         g AS (SELECT unnest([array_to_string(w[i+1:i+8], ' ')
                              FOR i IN range(0, greatest(len(w)-7, 0))]) AS gram
               FROM t),
         c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY gram),
         r AS (SELECT n,
                      row_number() OVER (ORDER BY n DESC, gram) AS rank,
                      CAST(sum(n) OVER (ORDER BY n DESC, gram
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM c),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
         p AS (SELECT unnest([10, 100, 1000]) AS top_k)
         SELECT p.top_k,
                CAST(max(r.cum) AS BIGINT) AS covered,
                CAST(min(tot.total) AS BIGINT) AS total_occurrences,
                CAST(max(r.cum) * 1000000 // min(tot.total) AS BIGINT) AS covered_ppm
         FROM p JOIN r ON r.rank <= p.top_k CROSS JOIN tot
         GROUP BY p.top_k ORDER BY p.top_k""",


    "text_gopher_rules" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS lc
           FROM documents),
         m AS (
           SELECT doc_id,
                  len(toks) AS n,
                  lc - len(toks) + 1 AS cs,
                  len(list_filter(toks,
                    t -> t IN ('the','a','of','and','in','to','is'))) AS nstop,
                  len(list_distinct(toks)) AS ndist,
                  coalesce(list_max([len(t) FOR t IN toks]), 0) AS maxlen
           FROM d)
         SELECT doc_id,
                CAST(n AS BIGINT) AS n_tokens,
                (n >= 50 AND n <= 100000) AS r_word_count,
                (cs >= n * 3 AND cs <= n * 10) AS r_mean_word_len,
                (nstop * 50 >= n) AS r_stopword_frac,
                (ndist * 2 >= n) AS r_distinct_frac,
                (maxlen <= 20) AS r_max_word_len,
                (n >= 50 AND n <= 100000 AND cs >= n * 3 AND cs <= n * 10
                 AND nstop * 50 >= n AND ndist * 2 >= n AND maxlen <= 20) AS passes_all
         FROM m ORDER BY doc_id""",


    "text_quality_classifier" ->
      """WITH s AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(coalesce(list_sum([
                    list_reduce(
                      [CAST(ascii(ch) AS BIGINT) FOR ch IN
                        regexp_extract_all(md5('qw|' || tok), '.')],
                      (a, b) -> (a * 31 + b) % 1000000007) % 2001 - 1000
                    FOR tok IN string_split(text, ' ')]), 0) AS BIGINT) AS score_sum
           FROM documents)
         SELECT doc_id, n_tokens, score_sum, score_sum >= 0 AS keep
         FROM s ORDER BY doc_id""",


    "text_normalize" ->
      """WITH n AS (
           SELECT doc_id,
                  trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
           FROM documents)
         SELECT doc_id, norm_text, md5(norm_text) AS norm_hash
         FROM n ORDER BY doc_id""",


    "tokens_to_ids" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest([struct_pack(p := i - 1, t := w[i])
                          FOR i IN range(1, len(w) + 1)]) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         tp AS (SELECT doc_id, CAST(s['p'] AS INT) AS pos, s['t'] AS tok FROM toks),
         freq AS (
           SELECT tok, count(*) AS n FROM tp WHERE len(tok) > 0 GROUP BY 1),
         vocab AS (
           SELECT tok, tok_id FROM (
             SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS tok_id
             FROM freq) WHERE tok_id <= 1000)
         SELECT tp.doc_id,
                array_to_string(list(coalesce(v.tok_id, 0) ORDER BY tp.pos), ',')
                  AS token_ids_csv,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN v.tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
         FROM tp LEFT JOIN vocab v ON tp.tok = v.tok
         GROUP BY tp.doc_id ORDER BY tp.doc_id""",


    "text_chunk_windows" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         n AS (SELECT doc_id, w,
                 CASE WHEN len(w) <= 32 THEN 1
                      ELSE 1 + (len(w) - 32 + 15) // 16 END AS nc
               FROM d),
         x AS (SELECT doc_id,
                 unnest([struct_pack(cid := i,
                          txt := array_to_string(w[i*16 + 1 : i*16 + 32], ' '))
                         FOR i IN range(0, CAST(nc AS INT))]) AS s
               FROM n)
         SELECT doc_id,
                CAST(s['cid'] AS INT) AS chunk_id,
                s['txt'] AS chunk_text,
                CAST(len(string_split(s['txt'], ' ')) AS INT) AS n_words
         FROM x ORDER BY doc_id, chunk_id""",


    "text_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
         CAST(length(text) AS INT) AS n_chars
         FROM documents ORDER BY doc_id""",


    "text_quality_score" ->
      """WITH c AS (
           SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','in','to','is'))) AS n_stopwords,
             len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
             length(text) AS n_chars
           FROM documents)
         SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_stopwords AS INT) AS n_stopwords,
           CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
           CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
           CAST(n_chars - n_tokens + 1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
           least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + least(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
             + (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10.0, 1.0)) * 0.2
             AS quality_score
         FROM c ORDER BY doc_id""",


    "text_lang_confusion" ->
      """WITH s AS (
           SELECT lang AS labeled_lang,
             (length(text) - length(replace(text, 'th', '')))
               + (length(text) - length(replace(text, 'he', ''))) AS score_en,
             (length(text) - length(replace(text, 'ch', '')))
               + (length(text) - length(replace(text, 'ei', ''))) AS score_de,
             (length(text) - length(replace(text, 'os', '')))
               + (length(text) - length(replace(text, 'ar', ''))) AS score_es,
             (length(text) - length(replace(text, 'zh', '')))
               + (length(text) - length(replace(text, 'ng', ''))) AS score_zh
           FROM documents),
         p AS (
           SELECT labeled_lang,
             CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                  WHEN score_de >= score_es AND score_de >= score_zh THEN 'de'
                  WHEN score_es >= score_zh THEN 'es'
                  ELSE 'zh' END AS predicted_lang
           FROM s),
         m AS (SELECT labeled_lang, predicted_lang,
                      CAST(count(*) AS BIGINT) AS n_docs
               FROM p GROUP BY 1, 2)
         SELECT labeled_lang, predicted_lang, n_docs,
                CAST(n_docs * 1000000 //
                  (sum(n_docs) OVER (PARTITION BY labeled_lang)) AS BIGINT) AS share_ppm
         FROM m ORDER BY labeled_lang, predicted_lang""",


    "text_language_id" ->
      """WITH s AS (
           SELECT doc_id, lang AS labeled_lang,
             (length(text) - length(replace(text, 'th', '')))
               + (length(text) - length(replace(text, 'he', ''))) AS score_en,
             (length(text) - length(replace(text, 'ch', '')))
               + (length(text) - length(replace(text, 'ei', ''))) AS score_de,
             (length(text) - length(replace(text, 'os', '')))
               + (length(text) - length(replace(text, 'ar', ''))) AS score_es,
             (length(text) - length(replace(text, 'zh', '')))
               + (length(text) - length(replace(text, 'ng', ''))) AS score_zh
           FROM documents)
         SELECT doc_id, labeled_lang,
           CAST(score_en AS BIGINT) AS score_en, CAST(score_de AS BIGINT) AS score_de,
           CAST(score_es AS BIGINT) AS score_es, CAST(score_zh AS BIGINT) AS score_zh,
           CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                WHEN score_de >= score_es AND score_de >= score_zh THEN 'de'
                WHEN score_es >= score_zh THEN 'es'
                ELSE 'zh' END AS predicted_lang
         FROM s ORDER BY doc_id""",


    "text_fingerprint" ->
      """WITH sh AS (
           SELECT doc_id, text,
             [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
           FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents))
         SELECT doc_id, md5(text) AS content_md5,
                coalesce(list_min([md5(x) FOR x IN sh]), '') AS min_shingle_hash
         FROM sh ORDER BY doc_id""",


    "text_rolling_fingerprint" ->
      """WITH c AS (
           SELECT doc_id, [CAST(ascii(ch) AS BIGINT) FOR ch IN regexp_extract_all(text, '.')] AS codes
           FROM documents)
         SELECT doc_id,
           CASE WHEN len(codes) >= 8 THEN
             list_min([list_reduce(codes[i+1:i+8],
               (a, b) -> (a * 257 + b) % 2147483647)
               FOR i IN range(0, greatest(len(codes) - 7, 0))])
           ELSE -1 END AS rolling_fingerprint
         FROM c ORDER BY doc_id""",


    "text_pii_redact" ->
      """SELECT doc_id,
         regexp_replace(regexp_replace(
           substr(text, 1, 40) || ' contact user' || doc_id || '@example.com or +1-555-000' || doc_id,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\+?[0-9][0-9()\- ]{5,}[0-9]', '<PHONE>', 'g') AS clean
         FROM documents ORDER BY doc_id""",


    "ngram_topk" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
         b AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
               FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t)
         SELECT bigram, count(*) AS n_occ FROM b
         GROUP BY bigram ORDER BY n_occ DESC, bigram LIMIT 20""",


    "ngram_novelty_by_lang" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         g AS (
           SELECT doc_id, lang,
                  unnest([md5(array_to_string(w[i+1:i+8], ' '))
                          FOR i IN range(0, greatest(len(w) - 7, 0))]) AS gh
           FROM t),
         e AS (SELECT DISTINCT lang, gh FROM g WHERE doc_id % 20 = 0),
         tr AS (SELECT DISTINCT gh FROM g WHERE doc_id % 20 <> 0)
         SELECT lang, count(*) AS n_eval_grams,
                CAST(sum(CASE WHEN tr.gh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                CAST(sum(CASE WHEN tr.gh IS NULL THEN 1 ELSE 0 END) * 1000000
                     // count(*) AS BIGINT) AS novelty_ppm
         FROM e LEFT JOIN tr ON e.gh = tr.gh
         GROUP BY lang ORDER BY lang""",


    "source_lang_contingency" ->
      """WITH cell AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
         bys AS (SELECT source, count(*) AS n_source FROM documents GROUP BY 1),
         byl AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
         tot AS (SELECT count(*) AS n_total FROM documents)
         SELECT cell.source, cell.lang, CAST(n AS BIGINT) AS n,
                CAST(n_source AS BIGINT) AS n_source,
                CAST(n_lang AS BIGINT) AS n_lang,
                CAST(n * n_total * 1000000 // (n_source * n_lang) AS BIGINT)
                  AS ratio_ppm
         FROM cell JOIN bys USING (source) JOIN byl USING (lang) CROSS JOIN tot
         ORDER BY source, lang""",


    "text_inverted_index" ->
      """SELECT term, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings,
                count(DISTINCT doc_id) AS df
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
         GROUP BY term ORDER BY term""",


    "text_tfidf_topk" ->
      """WITH tf AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
           GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1e6) AS BIGINT)
               AS score_e6
           FROM tf JOIN df USING (term) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, term, tf, df, score_e6,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_e6 DESC, term) AS rnk
           FROM scored)
         SELECT doc_id, rnk, term, tf, df, score_e6 FROM ranked
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",
  )
}
