package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOf, CorpusClean, DataDiff, Dedup, Events, GraphOps, Multimodal, RangeJoin, Similarity, TextAnalysis, TrainPrep}

/** Extension-layer query registry: the training-data pipeline operators
  * (dedup, similarity search, text analysis, multimodal, event
  * analytics) wired to the driver contract, each with a DuckDB oracle
  * that re-derives the same result independently (same md5-based
  * hashing, same integer fixed-point math — see
  * [[graft.ext.TextPrimitives]] for why results are bit-identical).
  *
  * Near-dup corpora: the testdata has no duplicate documents, so the
  * dedup queries build a corpus of documents ∪ perturbed copies
  * (doc_id + 1,000,000; exact copy for exact dedup, last-2-words-dropped
  * for near-dup) — constructed identically on both engines, so the
  * operators are exercised against KNOWN planted duplicates.
  */
object ExtQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  /** Interval-containment oracle, shared by the manual binning key
    * (`range_join_binned`) and the optimizer-rule twin
    * (`range_join_rule_auto`) — one independent re-derivation both
    * physical strategies must match.
    */
  private val rangeJoinOracle =
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
  private val asofJoinOracle =
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
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
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
  private def corpusWithCopies(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** documents ∪ near-copies (last two words dropped) at doc_id+1e6. */
  private def corpusWithNearCopies(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    d.unionByName(d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
  }

  // SQL fragments shared by the oracles.
  private val corpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL SELECT doc_id + 1000000, text FROM documents"""
  private val nearCorpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 1000000,
              array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)"""
  private val shinglesSql = // over a relation with (doc_id, text)
    """SELECT doc_id,
              [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)"""
  private def mhSql(seed: Int) =
    s"list_min([substr(md5('${seed / 6}|' || x), ${(seed % 6) * 5 + 1}, 5) FOR x IN sh])"
  private def bandSql(firstSeed: Int) =
    (firstSeed until firstSeed + 3).map(mhSql).mkString(" || ")
  private val jaccardSql = // over (ash, bsh)
    """CAST(len(list_distinct(ash)) + len(list_distinct(bsh))
            - len(list_distinct(list_concat(ash, bsh))) AS DOUBLE)
       / CAST(len(list_distinct(list_concat(ash, bsh))) AS DOUBLE)"""
  private val quantSql =
    "SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q FROM embeddings"
  private def qcosSql(a: String, b: String) =
    s"""CAST(list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE)
        / (sqrt(CAST(list_sum([$a[i] * $a[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE))
           * sqrt(CAST(list_sum([$b[i] * $b[i] FOR i IN range(1, len($b) + 1)]) AS DOUBLE)))"""

  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(corpusWithCopies(s, dir)).orderBy("keep_id")),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(corpusWithNearCopies(s, dir)).orderBy("a_id", "b_id")),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashBuckets(corpusWithNearCopies(s, dir)).orderBy("doc_id")),

    // subset corpus: a 16-bit signature space saturates around √65536
    // docs, after which candidate volume grows quadratically — the
    // operator's contract is "width must scale with corpus size"
    // (production: 64-bit), and the testdata pins the 16-bit oracle
    // pairs -> transitive clusters -> canonical keep-list: the step a
    // dedup pipeline needs after ANY pairwise detector. The registry
    // runs the O(log n)-round star-contraction CC (the 100 TB path);
    // the O(diameter) label-propagation twin [[Dedup.dupClusters]] is
    // equality-pinned against it in ExtSpec.
    "dedup_clusters" -> ((s, dir) => {
      val corpus = corpusWithNearCopies(s, dir)
      Dedup.dupClustersStar(corpus, Dedup.minhashLsh(corpus)).orderBy("doc_id")
    }),

    // the pipeline's final emit step after clustering: keep the member
    // with the most tokens per duplicate cluster (ties -> lowest id)
    "dedup_cluster_representatives" -> ((s, dir) => {
      val corpus = corpusWithNearCopies(s, dir)
      Dedup.clusterRepresentatives(corpus,
          Dedup.dupClustersStar(corpus, Dedup.minhashLsh(corpus)))
        .orderBy("doc_id")
    }),

    "dedup_simhash_hamming" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val corpus = d.unionByName(d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
      Dedup.simhashNearPairs(corpus).orderBy("a_id", "b_id")
    }),

    "dedup_simhash64" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val corpus = d.unionByName(d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
      Dedup.simhashNearPairs64(corpus).orderBy("a_id", "b_id")
    }),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), k = 3, blockCols = Seq("lang", "source"))
        .orderBy("a_id", "b_id")),

    // the integer-domain (production) LSH promoted to a first-class
    // oracle key: same verified-pair contract as dedup_minhash_lsh but
    // everything that shuffles is a LONG (xxhash64 double-hash minhash
    // family), never an md5 hex string. Band family r=1 × b=24 puts the
    // per-pair detection-miss probability at the 0.5 threshold below
    // (1-0.5)^24 ≈ 6e-8, so the exact-Jaccard-verified output equals
    // the all-pairs ground truth the oracle computes — precision is
    // exact by construction, recall is the band knob. Production
    // configs (r≥3, fewer candidates) are covered by the recall-floor
    // spec against the md5 twin.
    "dedup_minhash_lsh_fast" -> ((s, dir) =>
      Dedup.minhashLshFast(t(s, dir, "documents"), k = 3, bands = 24,
          rowsPerBand = 1, threshold = 0.5)
        .orderBy("a_id", "b_id")),

    "dedup_embedding_cosine" -> ((s, dir) =>
      Dedup.embeddingNearDupsBlocked(t(s, dir, "embeddings"), threshold = 0.4)
        .orderBy("a_id", "b_id")),

    "knn_bruteforce_cosine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), k = 5)
        .orderBy("q_id", "rank")
    }),

    "knn_lsh_bucketed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), k = 3, bits = 8)
        .orderBy("q_id", "rank")
    }),

    "knn_lsh_multiprobe" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), k = 3, bits = 8, probes = 3)
        .orderBy("q_id", "rank")
    }),

    "knn_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), k = 3, cells = 16, probes = 3)
        .orderBy("q_id", "rank")
    }),

    // exact kNN GRAPH (top-k for every vector) via the blocked tile
    // equi-join — the build step for graph dedup / clustering
    "knn_graph_blocked" -> ((s, dir) =>
      Similarity.knnGraphBlocked(t(s, dir, "embeddings"), k = 3)
        .orderBy("q_id", "rank")),

    // SemDeDup: cluster-then-prune semantic dedup — pairwise cosine
    // only WITHIN a coarse cell (the clustering is the blocking), keep
    // the lowest id of each near-dup pair
    "semdedup_prune" -> ((s, dir) =>
      Similarity.semDedup(t(s, dir, "embeddings"), cells = 16, threshold = 0.4)
        .orderBy("vec_id")),

    // int8 index-compression QC: symmetric per-vector quantization and
    // its reconstruction error, all in exact integer arithmetic
    "embedding_int8_quant" -> ((s, dir) =>
      Similarity.int8QuantQc(t(s, dir, "embeddings")).orderBy("vec_id")),

    // spherical k-means, 2 deterministic Lloyd rounds: integer SUM
    // centroids (cosine is scale-invariant — no mean division), shifted
    // to bound self-dots; the oracle unrolls both rounds
    "kmeans_spherical" -> ((s, dir) =>
      Similarity.sphericalKMeans(t(s, dir, "embeddings"), k = 8, iterations = 2)
        .orderBy("cell_id")),

    // deterministic global shuffle + shard assignment: training order
    // as a pure function of (seed, id) — re-runs emit identical shards
    "dataset_shard_shuffle" -> ((s, dir) =>
      TrainPrep.shardShuffle(t(s, dir, "documents")).orderBy("doc_id")),

    // context-window packing waste: per-pack fill ppm histogram
    "packing_efficiency" -> ((s, dir) =>
      TrainPrep.packingEfficiency(t(s, dir, "documents")).orderBy("bin")),

    // recency-decayed engagement: exact integer half-life-per-day decay
    "events_decayed_engagement" -> ((s, dir) =>
      Events.decayedEngagement(t(s, dir, "events")).orderBy("user_id")),

    // A/B experiment readout: both arms' exact integer metrics per
    // event type, one conditional-sum aggregate (no self-join)
    "events_experiment_readout" -> ((s, dir) =>
      Events.experimentReadout(t(s, dir, "events")).orderBy("event_type")),

    // growth accounting: daily actives split new vs returning
    "events_new_vs_returning" -> ((s, dir) =>
      Events.newVsReturning(t(s, dir, "events")).orderBy("day")),

    // traffic hygiene: burst inter-arrival fraction per user. The
    // thresholds are config — here tuned to this corpus's hour-scale
    // cadence (gap < 1 h = burst, flag at 12%) so BOTH flag branches
    // carry rows; a real deployment sets sub-second gaps for bots
    "events_bot_score" -> ((s, dir) =>
      Events.botScore(t(s, dir, "events"),
          fastGapMs = 3600000L, flagPpm = 120000L)
        .orderBy("user_id")),

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

    // incremental ingest dedup: near-copies (+1e6, last two words
    // dropped) are "today's batch", matched against the original corpus
    // only — never corpus×corpus
    "dedup_incremental_lsh" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val newBatch = d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text"))
      Dedup.minhashLshIncremental(d, newBatch).orderBy("old_id", "new_id")
    }),

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

    "dataset_card_stats" -> ((s, dir) =>
      TextAnalysis.datasetCard(t(s, dir, "documents")).orderBy("lang", "source")),

    // α=0.5 temperature mixing weights per language (√n in exact ppm)
    "mixture_weights" -> ((s, dir) =>
      TrainPrep.mixtureWeights(t(s, dir, "documents")).orderBy("lang")),

    // 32-word windows, stride 16 — the pretrain/RAG chunker
    "text_chunk_windows" -> ((s, dir) =>
      TrainPrep.chunkWindows(t(s, dir, "documents")).orderBy("doc_id", "chunk_id")),

    // near-dup incidence per language: which slices carry the
    // duplication (drives slice-targeted dedup budgets). Docs counted
    // once however many pairs they appear in; rate in exact ppm.
    "near_dup_rate_by_slice" -> ((s, dir) => {
      val meta = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val corpus = corpusWithNearCopies(s, dir)
      val pairs = Dedup.minhashLsh(corpus)
      val dupDocs = pairs.select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
        .distinct()
        // near-copies carry +1e6 ids; attribute them to the original doc
        .select(pmod(col("doc_id"), lit(1000000L)).as("doc_id"))
        .distinct()
      meta.join(dupDocs.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_near_dup"))
        .withColumn("dup_ppm", expr("n_near_dup * 1000000 div n_docs"))
        .orderBy("lang")
    }),

    // 3-iteration integer PageRank over the part co-purchase graph
    // (same support>=2 edges as graph_triangle_count)
    "graph_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(coPurchaseEdges(s, dir), iterations = 3).orderBy("node")),

    // degree distribution of the same co-purchase graph: the skew probe
    // you run BEFORE any per-node graph algorithm (a hub with degree
    // 10^6 is what breaks the naive triangle/CC join). Two tiny
    // aggregations over the edge list; the histogram is |distinct
    // degrees| rows however large the graph.
    "graph_degree_hist" -> ((s, dir) =>
      coPurchaseEdges(s, dir)
        .select(explode(array(col("ea"), col("eb"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")),

    // embedding coverage QC: which docs lack a vector (per lang, ppm)
    // and how many vectors are orphaned — the join-health check before
    // any embedding-dependent stage
    "embedding_coverage" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val e = t(s, dir, "embeddings").select(col("vec_id"))
      val covered = d.join(e.withColumnRenamed("vec_id", "doc_id")
        .withColumn("has_vec", lit(1L)), Seq("doc_id"), "left")
      val perLang = covered.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("has_vec"), lit(0L))).as("n_with_vec"))
        .withColumn("coverage_ppm", expr("n_with_vec * 1000000 div n_docs"))
      val orphans = e.join(d.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_vecs"))
      perLang.crossJoin(orphans).orderBy("lang")
    }),

    // per-label vector QC: exact integer self-dot extrema/sums — norm
    // drift and zero-vector detection without any float accumulation
    "embedding_norm_stats" -> ((s, dir) => {
      import graft.ext.TextPrimitives._
      val e = t(s, dir, "embeddings")
      graft.functions.GraftFunctions.register(s)
      e.select(col("label"),
          graft.functions.GraftFunctions.qdotNative(
            quantized(col("embedding")), quantized(col("embedding"))).as("d2"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"),
          sum(col("d2")).as("sum_d2"))
        .orderBy("label")
    }),

    // duplicate-cluster-size distribution from the exact-dedup groups:
    // how much of the corpus is singletons vs 2x vs k-fold copies.
    // Seeded with VARYING multiplicity (all docs once, every 2nd doc
    // again, every 4th doc again) so the histogram has real shape.
    "dup_size_histogram" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d
        .unionByName(d.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      Dedup.exact(corpus)
        .groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("n_copies")).as("n_docs"))
        .orderBy("n_copies")
    }),

    // per-(label, dim) exact centroid sums — the cluster-health probe
    "embedding_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(t(s, dir, "embeddings")).orderBy("label", "dim")),

    // majority-vote 5-NN labeling over the exact graph
    "knn_classify_majority" -> ((s, dir) =>
      Similarity.knnClassify(t(s, dir, "embeddings"), k = 5).orderBy("vec_id")),

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

    "fuzzy_levenshtein_join" -> ((s, dir) =>
      TextAnalysis.fuzzyNamePairs(t(s, dir, "part"), "p_name", 3)),

    "multimodal_features" -> ((s, dir) =>
      Multimodal.featuresFromDocuments(t(s, dir, "documents"))(s).orderBy("doc_id")),

    // REAL format decode at the batching seam: spec-compliant RIFF/WAVE
    // PCM payloads are assembled per doc and pushed through a genuine
    // chunk-walking WAV parser inside the batched mapPartitions stage.
    // The oracle recomputes every decoded statistic from the seeded
    // sample formula — a wrong header field or byte order anywhere in
    // the codec would shift peak/sum-of-squares and fail the hash.
    "multimodal_wav_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeWavBatch(
          Multimodal.wavFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // 16-bin luminance histogram over REAL decoded pixels (exposure /
    // contrast screen of a vision-curation pass)
    "multimodal_bmp_histogram" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.bmpLumaHistogram(
          Multimodal.bmpFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id", "bin")
    }),

    // frame-level audio energy from REAL decoded PCM: per-doc total,
    // peak frame and its index (the loudest-segment curation shape)
    "multimodal_wav_frame_energy" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.wavFrameEnergy(
          Multimodal.wavFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // REAL image decode at the batching seam: genuine 24-bit BI_RGB BMP
    // files assembled per doc (bottom-up rows, 4-byte row padding) and
    // parsed back by a real header-walking decoder. The positional
    // checksum weights every pixel by its logical index and channel, so
    // a forgotten bottom-up flip, a mis-stepped row pad, or a B/R swap
    // diverges the hash even when plain channel sums would not.
    "multimodal_bmp_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeBmpBatch(
          Multimodal.bmpFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // REAL resize: decode → nearest-neighbor ×1/2 downsample → re-encode
    // → decode; the oracle recomputes the thumbnail's stats from the
    // source pixel formula at the sampled positions, so a wrong sampling
    // kernel, row order, or re-encode padding diverges the hash
    "multimodal_bmp_resize" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.resizeBmpBatch(
          Multimodal.bmpFromDocuments(t(s, dir, "documents")), factor = 2)
        .toDF()
        .orderBy("doc_id")
    }),

    // the 1-record -> N-frames flatMap expansion (video frame sampling /
    // audio chunking shape); output projects each frame to (len, md5) so
    // payload bytes never reach the result
    "multimodal_frame_sample" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.sampleFrames(
          Multimodal.fromDocuments(t(s, dir, "documents")), n = 4)
        .toDF()
        .select(col("doc_id"), col("frame_index"),
          length(col("frame_payload")).cast("long").as("n_bytes"),
          md5(col("frame_payload")).as("frame_md5"))
        .orderBy("doc_id", "frame_index")
    }),

    "events_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events")).orderBy("user_id", "session_id")),

    // interval-containment join, binned to an equi-join: each click ->
    // the session interval containing it (1 h bins over integer µs)
    "range_join_binned" -> ((s, dir) => {
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val sessions = Events.sessionize(t(s, dir, "events"))
        .select(col("user_id"), col("session_id"), col("start_us"),
          (col("start_us") + col("duration_us")).as("end_us"))
      RangeJoin.binnedIntervalJoin(clicks, sessions, Seq("user_id"),
          "ts_us", "start_us", "end_us", binWidth = 3600000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("session_id"), col("start_us"), col("end_us"))
        .orderBy("event_id", "session_id")
    }),

    // the SAME interval join written NAIVELY (plain BETWEEN theta
    // join) and rewritten to the binned hash join by RangeJoinRule,
    // registered at runtime through experimental.extraOptimizations —
    // the optimizer does mechanically what range_join_binned does by
    // hand, against the same oracle. localCheckpoint materializes
    // inside the conf window so the rewrite is active exactly for this
    // plan and the conf never leaks into other keys.
    "range_join_rule_auto" -> ((s, dir) => {
      org.apache.spark.sql.graft.Bridge.addOptimization(s, graft.plans.RangeJoinRule(s))
      s.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
      try {
        val clicks = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
        val sessions = Events.sessionize(t(s, dir, "events"))
          .select(col("user_id").as("s_user_id"), col("session_id"), col("start_us"),
            (col("start_us") + col("duration_us")).as("end_us"))
        clicks.join(sessions,
            clicks("user_id") === sessions("s_user_id") &&
              clicks("ts_us") >= sessions("start_us") &&
              clicks("ts_us") <= sessions("end_us"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("session_id"), col("start_us"), col("end_us"))
          .orderBy("event_id", "session_id")
          .localCheckpoint(true)
      } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    }),

    // DateType variant of the optimizer rewrite: a PURE-range (no equi
    // key) point-in-window join over dates. Windows are overlapping
    // month windows ([month_start - 10 days, last_day]) derived from
    // the data, so boundary orders match two windows and bin coverage
    // across the overlap is exercised. binWidth is in DAYS for DateType
    // points (the rule's monotone to-long maps a date to its epoch day).
    "range_join_rule_date" -> ((s, dir) => {
      org.apache.spark.sql.graft.Bridge.addOptimization(s, graft.plans.RangeJoinRule(s))
      s.conf.set("spark.graft.rangeJoin.binWidth", "7")
      try {
        val o = t(s, dir, "orders").select(
          to_date(col("o_orderdate")).as("d"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val windows = o.select(trunc(col("d"), "MM").as("m")).distinct()
          .select(col("m"), date_sub(col("m"), 10).as("w_start"),
            last_day(col("m")).as("w_end"))
        o.join(windows, o("d") >= windows("w_start") && o("d") <= windows("w_end"))
          .groupBy(col("m"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
          // string month key: DATE-typed outputs hash differently across
          // the oracle bridge (date32 vs datetime64), same as elsewhere
          .select(date_format(col("m"), "yyyy-MM-dd").as("month"),
            col("n_orders"), col("sum_cents"))
          .orderBy("month")
          .localCheckpoint(true)
      } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    }),

    // TimestampType + LEFT OUTER variant: clicks (the preserved POINT
    // side — the only outer shape the rule may rewrite, since the
    // interval side explodes into bins) left-joined to long-session
    // windows on genuine timestamp columns; clicks outside every
    // >=5-event session survive null-padded. binWidth is in
    // MICROSECONDS for timestamp points.
    "range_join_rule_ts_left" -> ((s, dir) => {
      org.apache.spark.sql.graft.Bridge.addOptimization(s, graft.plans.RangeJoinRule(s))
      s.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
      try {
        val clicks = t(s, dir, "events")
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            timestamp_micros(expr("ts div 1000")).as("click_ts"))
        val sessions = Events.sessionize(t(s, dir, "events"))
          .filter(col("n_events") >= 5)
          .select(col("user_id").as("s_user_id"), col("session_id"),
            timestamp_micros(col("start_us")).as("start_ts"),
            timestamp_micros(col("start_us") + col("duration_us")).as("end_ts"),
            col("start_us"))
        clicks.join(sessions,
            clicks("user_id") === sessions("s_user_id") &&
              clicks("click_ts") >= sessions("start_ts") &&
              clicks("click_ts") <= sessions("end_ts"),
            "left_outer")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("click_ts")).as("ts_us"),
            col("session_id"), col("start_us"))
          .orderBy(col("event_id"), col("session_id"))
          .localCheckpoint(true)
      } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
    }),

    "events_window_agg" -> ((s, dir) =>
      Events.windowAgg(t(s, dir, "events")).orderBy("window_start_us", "event_type")),

    "events_hourly_baseline" -> ((s, dir) =>
      Events.hourlyBaseline(t(s, dir, "events")).orderBy("event_type", "hod")),

    "events_hourly_anomalies" -> ((s, dir) =>
      Events.hourlyAnomalies(t(s, dir, "events"))
        .orderBy("event_type", "day", "hod")),

    // per-user load Gini per event type, in EXACT rational arithmetic
    // (numerator/denominator longs + a ppm quotient) — the partition-
    // balance metric that decides whether a key needs salting. The
    // classic rank-weighted formula runs over the VALUE HISTOGRAM
    // (distinct count -> frequency), not the raw per-user rows: a run
    // of f tied users at count c occupying ranks [start..end]
    // contributes c*((start+end)-(n+1))*f with start+end = 2*cum-f+1,
    // so the rank window scans |distinct counts| rows, never |users| —
    // the same histogram trick as robust_mad_outliers. At 100 TB the
    // only full-data shuffle is the (event_type, user_id) count.
    "events_user_gini" -> ((s, dir) => {
      val cnt = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val hist = cnt.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("f"))
      val byC = Window.partitionBy(col("event_type")).orderBy(col("c"))
      val all = Window.partitionBy(col("event_type"))
      hist
        .withColumn("cum", sum(col("f")).over(byC))
        .withColumn("n", sum(col("f")).over(all))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_users"),
          sum(col("c") * col("f")).as("total_events"),
          sum(col("c") * col("f") * (col("cum") * 2 - col("f") - col("n")))
            .as("gini_num"))
        .withColumn("gini_den", expr("n_users * total_events"))
        .withColumn("gini_ppm", expr("gini_num * 1000000 div gini_den"))
        .orderBy("event_type")
    }),

    // deterministic capped sampling: at most 10 docs per source, chosen
    // by an md5 priority so the sample is stable under any partitioning
    // and any re-run — the "cap boilerplate domains" step of corpus
    // curation. One shuffle keyed by source; the per-source window
    // never sees more rows than the source has docs.
    "sample_cap_per_source" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("pri",
          md5(concat(lit("smp|"), col("doc_id").cast("string"))))
      d.withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))))
        .filter(col("rn") <= 10)
        .select(col("source"), col("rn"), col("doc_id"))
        .orderBy("source", "rn")
    }),

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

    // LSH recall calibration against the planted near-dup pairs: for
    // each (original, near-copy) pair, how many of the 4 bands agree.
    // bands_agree=0 rows are pairs candidate generation MISSES — the
    // measured recall knob behind the bands×rows choice (more bands =
    // more recall, more shuffle). Null-safe equality so shingle-less
    // docs (both signatures NULL) count as colliding, matching the
    // bucket join which groups NULL signatures together.
    "lsh_band_calibration" -> ((s, dir) => {
      import graft.ext.TextPrimitives._
      // ONE shingling pass over the corpus (md5 dominates this key's
      // cost), then ONE shuffle keyed by the pair id: each (original,
      // near-copy) pair reunites in a 2-row group whose sides are
      // pulled apart with max(when(side, band)) — a self-join here
      // would shingle the corpus twice for the same histogram.
      val bandCols = (0 until 4).map(b =>
        bandFromHashes(col("shh"), b * 3, 3).as(s"b$b"))
      val bands = corpusWithNearCopies(s, dir)
        .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
        .withColumn("shh", shingleHashes(col("sh")))
        .select(col("doc_id") +: bandCols: _*)
        .select(pmod(col("doc_id"), lit(1000000L)).as("pair_id"),
          (col("doc_id") < 1000000L).as("is_orig"),
          col("b0"), col("b1"), col("b2"), col("b3"))
      val sides = (0 until 4).flatMap(b => Seq(
        max(when(col("is_orig"), col(s"b$b"))).as(s"o$b"),
        max(when(!col("is_orig"), col(s"b$b"))).as(s"c$b")))
      bands.groupBy(col("pair_id"))
        .agg(sides.head, sides.tail: _*)
        .select((0 until 4).map(b =>
            (col(s"o$b") <=> col(s"c$b")).cast("long")).reduce(_ + _)
          .as("bands_agree"))
        .groupBy(col("bands_agree"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("bands_agree")
    }),

    // quantity-WEIGHTED median price per return flag: the histogram-
    // median pattern with sum-of-weights in place of counts (a 10-unit
    // line influences the median 10x a 1-unit line). Prices are
    // near-unique, so the histogram barely reduces the fact — the
    // cumulative therefore runs through Scale.chunkedCumSum (the
    // distributed prefix sum), never a per-flag single-task window.
    "weighted_median_price" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem").select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      val hist = fact.groupBy(col("l_returnflag"), col("price_c"))
        .agg(sum(col("qty")).as("w"))
      graft.ext.Scale.chunkedCumSum(hist, Seq("l_returnflag"), "price_c", "w", "cum")
        .withColumnRenamed("cum_total", "n")
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("total_qty"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("price_c")))
            .as("wmedian_price_c"),
          sum(col("price_c") * col("w")).as("wsum"))
        .withColumn("wmean_price_c", expr("wsum div total_qty"))
        .drop("wsum")
        .orderBy("l_returnflag")
    }),

    // first-touch attribution THROUGH the native as-of operator: each
    // purchase takes the latest preceding click of the same user
    // (AsOfJoinExec — one merge pass), then a 1 h attribution window
    // decides attributed vs organic; exact revenue split and gap mass.
    // The second production consumer of the custom operator.
    "events_attribution_native" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      AsOf.asofJoinNative(purchases, clicks, Seq("user_id"), "ts_us")
        .withColumn("attributed",
          col("asof_click_id").isNotNull &&
            col("ts_us") - col("asof_ts_us") <= 3600000000L)
        .groupBy(col("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"),
          sum(when(col("attributed"),
            col("ts_us") - col("asof_ts_us")).otherwise(0L)).as("gap_us_sum"))
        .orderBy("attributed")
    }),

    // price realization: transacted unit price vs the catalog retail
    // price per part type, exact ppm by integer cross-multiplication —
    // the two-table "are we selling at list" reconciliation. The part
    // dimension broadcasts onto the fact; unit price stays exact by
    // comparing price*catalog_qty products instead of dividing.
    "price_realization_by_type" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ext_c"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("retail_c"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("ext_c")).as("sum_ext_c"),
          sum(col("retail_c") * col("qty")).as("sum_list_c"))
        .withColumn("realization_ppm",
          expr("sum_ext_c * 1000000 div sum_list_c"))
        .orderBy("p_type")
    }),

    // weekly event-type mix vs the overall mix, exact ppm, with a
    // >25%-relative-shift flag — the composition-drift monitor that
    // catches a logging change or a traffic-mix break. Two tiny
    // aggregates; the overall mix broadcasts.
    "events_type_mix_drift" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        expr("(ts div 1000) div 604800000000").as("week"))
      val cell = e.groupBy(col("week"), col("event_type")).agg(count(lit(1)).as("n"))
      val byWeek = cell.groupBy(col("week")).agg(sum(col("n")).as("n_week"))
      val overall = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
        .crossJoin(e.agg(count(lit(1)).as("n_total")))
      cell
        .join(broadcast(byWeek), Seq("week"))
        .join(broadcast(overall), Seq("event_type"))
        .select(col("week"), col("event_type"), col("n"),
          expr("n * 1000000 div n_week").as("week_share_ppm"),
          expr("n_type * 1000000 div n_total").as("overall_share_ppm"))
        .withColumn("is_shifted",
          expr("abs(week_share_ppm - overall_share_ppm) * 100 > overall_share_ppm * 25"))
        .orderBy("week", "event_type")
    }),

    // Herfindahl–Hirschman concentration of order volume across
    // customers, per order status — HHI = Σ share² as exact ppm via
    // integer cross-multiplication (sum(n²)·1e6 div total²); the
    // third concentration lens next to the Gini and CR-k keys.
    "customer_hhi_by_status" -> ((s, dir) => {
      val cnt = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      cnt.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("n")).as("n_orders"),
          sum(col("n") * col("n")).as("_sq"))
        .withColumn("hhi_ppm", expr("_sq * 1000000 div (n_orders * n_orders)"))
        .drop("_sq")
        .orderBy("o_orderstatus")
    }),

    // DAU/WAU: daily active customers plus the 7-day rolling distinct,
    // computed TWO ways — exactly (each active day covers the next 7
    // window days via a sequence explode: linear, no theta join) and
    // by merging the per-day HLL sketches in a RANGE window frame
    // (graft_hll_merge_estimate OVER (ORDER BY day RANGE 6 PRECEDING)
    // — a rolling distinct whose window state is one 4 KB sketch).
    // The oracle pins the exact counts and the envelope boolean.
    // The day-ordered window runs over the DAILY aggregate (bounded by
    // calendar days), same rationale as revenue_concentration_topk.
    "events_dau_wau_sketch" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val epoch = lit("1992-01-01").cast("date")
      val du = t(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")), epoch).cast("long").as("day"),
          col("o_custkey"))
        .distinct()
      val daily = du.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"),
          call_function("graft_hll_sketch", col("o_custkey")).as("sk"))
      val wauExact = du
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("o_custkey"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau_exact"))
      val wFrame = Window.orderBy(col("day")).rangeBetween(-6, 0)
      daily
        .withColumn("wau_est",
          call_function("graft_hll_merge_estimate", col("sk")).over(wFrame))
        .join(wauExact, Seq("day"))
        .select(col("day"), col("dau"), col("wau_exact"),
          // collision noise at tiny cardinalities is ABSOLUTE (a few
          // registers), so the envelope has an absolute floor; the
          // relative part is max-error-calibrated, not 1σ: p=12 raw rsd
          // is 1.63%, and over THOUSANDS of rolling windows a 5% (3σ)
          // bound is statistically guaranteed to trip near the
          // linear-counting→raw crossover (measured: 2/2405 days at
          // ×10 data; 2/2700 trials in HllEnvelopeSpec, worst 5.7%).
          // max(8%, 8) ≈ 5σ keeps even 10⁵ windows clean.
          (abs(col("wau_est") - col("wau_exact")) <=
            greatest(col("wau_exact") * 0.08, lit(8.0))).as("wau_hll_ok"))
        .orderBy("day")
    }),

    // order-book backlog over time: +1 the day a line is ordered, -1
    // the day it ships; the running sum is the open-lines count per
    // day — the event-sourcing sweep, with the cumulative through the
    // distributed prefix sum (timeline is one global series, so the
    // plain window would be a single task).
    "open_lines_backlog" -> ((s, dir) => {
      val epoch = lit("1992-01-01").cast("date")
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
      val deltas = l.select(datediff(to_date(col("o_orderdate")), epoch)
          .cast("long").as("day"), lit(1L).as("delta"))
        .unionByName(l.select(datediff(to_date(col("l_shipdate")), epoch)
          .cast("long").as("day"), lit(-1L).as("delta")))
      val daily = deltas.groupBy(col("day")).agg(sum(col("delta")).as("net"))
        .withColumn("_g", lit(0))
      graft.ext.Scale.chunkedCumSum(daily, Seq("_g"), "day", "net", "open_lines")
        .select(col("day"), col("net"), col("open_lines"))
        .orderBy("day")
    }),

    // order→ship latency distribution per return flag: exact p50/p90
    // over the day-gap histogram (gaps are small integers, so the
    // histogram is genuinely tiny — the favorable case for the
    // histogram-percentile pattern)
    "order_ship_latency_stats" -> ((s, dir) => {
      val f = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("gap"))
      val hist = f.groupBy(col("l_returnflag"), col("gap")).agg(count(lit(1)).as("c"))
      val byGap = Window.partitionBy(col("l_returnflag")).orderBy(col("gap"))
      val all = Window.partitionBy(col("l_returnflag"))
      hist
        .withColumn("cum", sum(col("c")).over(byGap))
        .withColumn("n", sum(col("c")).over(all))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n_lines"),
          min(col("gap")).as("min_days"), max(col("gap")).as("max_days"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("gap"))).as("p50_days"),
          min(when(expr("cum * 10 >= n * 9"), col("gap"))).as("p90_days"),
          sum(col("gap") * col("c")).as("_gsum"))
        .withColumn("mean_days_floor", expr("_gsum div n_lines"))
        .drop("_gsum")
        .orderBy("l_returnflag")
    }),

    // longitudinal decile mobility: each customer's revenue decile in
    // the first half of the timeline vs the second, as a 10x10
    // transition count matrix — per-half decile boundaries come from
    // the value histogram with the CHUNKED prefix sum (revenues are
    // near-unique, the same degeneracy weighted_median dodges), and
    // the boundary frame broadcasts onto the per-customer revenue rows.
    "customer_decile_transitions" -> ((s, dir) => {
      val half = when(to_date(col("o_orderdate")) < lit("1995-06-01").cast("date"),
        "H1").otherwise("H2")
      val rev = t(s, dir, "orders")
        .select(col("o_custkey"), half.as("half"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("p"))
        .groupBy(col("o_custkey"), col("half")).agg(sum(col("p")).as("rev"))
      val hist = rev.groupBy(col("half"), col("rev")).agg(count(lit(1)).as("c"))
      val cum = graft.ext.Scale.chunkedCumSum(hist, Seq("half"), "rev", "c", "cum")
        .withColumnRenamed("cum_total", "n")
      val ds = (1 to 9).map(k =>
        min(when(col("cum") >= expr(s"(n * $k + 9) div 10"), col("rev")))
          .as(s"d$k"))
      val bounds = cum.groupBy(col("half")).agg(ds.head, ds.tail: _*)
      val binned = rev.join(broadcast(bounds), Seq("half"))
        .select(col("o_custkey"), col("half"),
          (lit(1) + (1 to 9).map(k =>
            (col("rev") > col(s"d$k")).cast("int")).reduce(_ + _)).as("bin"))
      binned.filter(col("half") === "H1")
        .select(col("o_custkey"), col("bin").as("bin_h1"))
        .join(binned.filter(col("half") === "H2")
          .select(col("o_custkey"), col("bin").as("bin_h2")), Seq("o_custkey"))
        .groupBy(col("bin_h1"), col("bin_h2"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("bin_h1", "bin_h2")
    }),

    // revenue concentration curve (CR-k): what share of total revenue
    // the top-k parts carry, exact ppm at k ∈ {1,5,10,50,100} — the
    // skew measurement that decides broadcast thresholds and hot-key
    // treatment. The rank window runs over the per-part AGGREGATE
    // (|parts| rows, already reduced), never the fact table; at 100 TB
    // that frame is still millions of rows at most, and the window
    // could shard by revenue band if it ever mattered.
    "revenue_concentration_topk" -> ((s, dir) => {
      val parts = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
      val byRev = Window.orderBy(col("rev").desc, col("l_partkey"))
      val ranked = parts
        .withColumn("rn", row_number().over(byRev))
        .withColumn("cum", sum(col("rev")).over(
          byRev.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val total = parts.agg(sum(col("rev")).as("total_rev"))
      ranked.filter(col("rn").isin(1, 5, 10, 50, 100))
        .crossJoin(broadcast(total))
        .select(col("rn").as("k"), col("cum").as("topk_rev"), col("total_rev"),
          expr("cum * 1000000 div total_rev").as("share_ppm"))
        .orderBy("k")
    }),

    // time-windowed ingest dedup: rows with identical content keys
    // (user, type, cents) inside the same hour collapse to the
    // earliest — the batch twin of streaming dropDuplicates-with-
    // watermark (graft.streaming Sessionize.dedupStream). Planted
    // copies at event_id+1e6 guarantee every content key collides.
    // One shuffle keyed by the content hash; nothing but ids and the
    // content key ever moves.
    "dedup_time_windowed" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("t_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val corpus = base.unionByName(
        base.withColumn("event_id", col("event_id") + 1000000L))
      val kept = corpus
        .withColumn("hour", expr("t_us div 3600000000"))
        .groupBy(col("user_id"), col("event_type"), col("cents"), col("hour"))
        .agg(count(lit(1)).as("n_rows"), min(col("event_id")).as("keep_id"))
      kept.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_rows")).as("n_total"),
          expr("(CAST(sum(n_rows) AS BIGINT) - count(1)) * 1000000 div sum(n_rows)")
            .as("dropped_ppm"))
        .orderBy("event_type")
    }),

    // Z-order layout audit: interleave (partkey, suppkey) with the
    // native graft_zorder expression, cut the z-range into 32
    // equal-width chunks, and report each chunk's bounding box in BOTH
    // dimensions — the data-skipping quality a z-ordered file layout
    // buys (every chunk spans a bounded box, so a 2-D query box
    // touches O(area) chunks; a single-column sort bounds one
    // dimension and leaves the other full-range). All integer math;
    // the only shuffle is the chunk aggregation.
    "zorder_layout_stats" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .withColumn("z", expr("graft_zorder(pk, sk)"))
      val ext = li.agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      li.crossJoin(broadcast(ext))
        .withColumn("chunk",
          expr("(z - zmin) * 32 div (zmax - zmin + 1) + 1"))
        .groupBy(col("chunk"))
        .agg(count(lit(1)).as("n"),
          min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
          min(col("sk")).as("min_sk"), max(col("sk")).as("max_sk"))
        .orderBy("chunk")
    }),

    // changelog compaction (Debezium-style CDC apply): a deterministic
    // change stream (updates on keys %7, deletes on keys %5, inserts at
    // key+1e7 on keys %11) applied to the orders snapshot by
    // last-writer-wins. ONE window keyed by the primary key resolves
    // multi-change keys (%35 = update then delete -> deleted); the
    // whole apply is a union + row_number, no per-op iteration. This is
    // how a 100 TB table absorbs a day of CDC in one pass.
    "changelog_compaction" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"),
        lit(0L).as("seq"), lit("B").as("op"))
      val upd = base.filter(col("key") % 7 === 0)
        .select(col("key"), col("cust"), (col("price_c") + 1000L).as("price_c"),
          lit(1L).as("seq"), lit("U").as("op"))
      val del = base.filter(col("key") % 5 === 0)
        .select(col("key"), col("cust"), col("price_c"),
          lit(2L).as("seq"), lit("D").as("op"))
      val ins = base.filter(col("key") % 11 === 0)
        .select((col("key") + 10000000L).as("key"), col("cust"),
          (col("price_c") + 5L).as("price_c"), lit(1L).as("seq"), lit("I").as("op"))
      val log = base.unionByName(upd).unionByName(del).unionByName(ins)
      log
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("key")).orderBy(col("seq").desc, col("op"))))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("key"), col("cust"), col("price_c"), col("op").as("last_op"))
        .orderBy("key")
    }),

    // per-source multimodal payload budget: the partition-planning
    // numbers (total/max/median bytes, 128 MiB split count) a payload-
    // aware reader needs BEFORE scheduling decode work — computed from
    // metadata-width columns only, the binary payload itself never
    // shuffles (same pruning contract as multimodal_features).
    "multimodal_payload_budget" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      val hist = d.groupBy(col("source"), col("n_bytes")).agg(count(lit(1)).as("c"))
      val byBytes = Window.partitionBy(col("source")).orderBy(col("n_bytes"))
      val all = Window.partitionBy(col("source"))
      hist
        .withColumn("cum", sum(col("c")).over(byBytes))
        .withColumn("n", sum(col("c")).over(all))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_items"),
          sum(col("n_bytes") * col("c")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("n_bytes")))
            .as("median_bytes"))
        .withColumn("n_splits_128mb",
          expr("(total_bytes + 134217727) div 134217728"))
        .orderBy("source")
    }),

    // pairwise audience overlap between event types, exact Jaccard in
    // ppm: per-user type sets are bounded (5 types), so pairs explode
    // in place after ONE shuffle keyed by user — the coPurchaseEdges
    // pattern; a distinct-frame self-join would shuffle twice.
    "events_audience_overlap" -> ((s, dir) => {
      val tu = t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
      val pairs = tu.groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        .select(explode(expr(
          """flatten(transform(ts, (x, i) ->
               transform(slice(ts, i + 2, size(ts) - i - 1), y -> struct(x AS ta, y AS tb))))"""))
          .as("p"))
        .select(col("p.ta"), col("p.tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_common"))
      val totals = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      pairs
        .join(broadcast(totals.select(col("event_type").as("ta"), col("n").as("n_a"))), Seq("ta"))
        .join(broadcast(totals.select(col("event_type").as("tb"), col("n").as("n_b"))), Seq("tb"))
        .select(col("ta"), col("tb"), col("n_common"), col("n_a"), col("n_b"),
          expr("n_common * 1000000 div (n_a + n_b - n_common)").as("jaccard_ppm"))
        .orderBy("ta", "tb")
    }),

    // paragraph-surrogate exact dedup: non-overlapping 32-word chunks
    // over the corpus with planted exact copies, chunk-hash multiplicity
    // histogram — the C4/RefinedWeb "drop repeated paragraphs" primitive
    // at chunk granularity. Only md5 digests are ever grouped; chunk
    // text stays in the map side.
    "dedup_paragraph_exact" -> ((s, dir) =>
      TrainPrep.chunkWindows(corpusWithCopies(s, dir), w = 32, s = 32)
        .select(md5(col("chunk_text")).as("ch"))
        .groupBy(col("ch")).agg(count(lit(1)).as("n_copies"))
        .groupBy(col("n_copies")).agg(count(lit(1)).as("n_chunks"))
        .orderBy("n_copies")),

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

    // per-(type, day) exact median inter-arrival gap via the histogram-
    // median pattern. The lag window partitions by (type, day) — never
    // by type alone, which would funnel a whole event type through one
    // task at cluster scale; the day boundary gap is dropped, the
    // standard partition-and-stitch tradeoff.
    "events_interarrival_median" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"), col("event_id"),
        expr("ts div 1000").as("t_us"),
        expr("(ts div 1000) div 86400000000").as("day"))
      val byTime = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("t_us"), col("event_id"))
      val gaps = e
        .withColumn("gap", col("t_us") - lag(col("t_us"), 1).over(byTime))
        .filter(col("gap").isNotNull)
      val hist = gaps.groupBy(col("event_type"), col("day"), col("gap"))
        .agg(count(lit(1)).as("c"))
      val byGap = Window.partitionBy(col("event_type"), col("day")).orderBy(col("gap"))
      val all = Window.partitionBy(col("event_type"), col("day"))
      hist
        .withColumn("cum", sum(col("c")).over(byGap))
        .withColumn("n", sum(col("c")).over(all))
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("n")).as("n_gaps"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("gap")))
            .as("median_gap_us"),
          max(col("gap")).as("max_gap_us"))
        .orderBy("event_type", "day")
    }),

    // row-level data diff of `orders` against a deterministically
    // perturbed copy: ~1% rows dropped (removed), ~1% totalprice
    // bumped (changed), ~1% re-keyed copies (added)
    "events_funnel" -> ((s, dir) =>
      Events.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))
        .orderBy("user_id")),

    // conversion-window funnel: each step must land within 1 h of the
    // previous one — the bounded-attribution form production funnels use
    "events_funnel_windowed" -> ((s, dir) =>
      Events.funnelWindowed(t(s, dir, "events"),
          Seq("view", "click", "purchase"), maxGapUs = 3600000000L)
        .orderBy("user_id")),

    "events_top_paths" -> ((s, dir) =>
      Events.topPaths(t(s, dir, "events"))),

    // JSON path extraction over a REAL data column (events.props is a
    // JSON string per event), aggregated in exact integers
    "events_props_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // postings rendered as a comma string: the oracle hash-compare does
    // not support array cells
    "text_inverted_index" -> ((s, dir) =>
      TextAnalysis.invertedIndex(t(s, dir, "documents"))
        .select(col("term"), concat_ws(",", col("postings")).as("postings"), col("df"))
        .orderBy("term")),

    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(t(s, dir, "documents"))
        .orderBy("doc_id", "rnk")),

    "events_retention" -> ((s, dir) =>
      Events.retention(t(s, dir, "events"))
        // DATE columns don't round-trip the hash compare; format as ISO
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_n"), col("n_users"))
        .orderBy("cohort", "day_n")),

    "data_row_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val target = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(o.filter(col("o_orderkey") % 103 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 50000000L))
      DataDiff.rowDiff(o, target, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
        .select(col("o_orderkey"), col("diff_status"),
          array_join(col("changed_cols"), ",").as("changed_cols"))
        .orderBy("o_orderkey")
    }),

    // as-of join: for each click, the latest view of the same user at
    // or before the click's timestamp
    "asof_join_nearest" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      AsOf.asofNearest(clicks, views, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_cents"),
          col("nearest_event_id"), col("nearest_ts_us"), col("nearest_value_cents"))
        .orderBy("event_id")
    }),

    "asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      AsOf.asofJoin(clicks, views, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_cents"),
          col("asof_event_id"), col("asof_ts_us"), col("asof_value_cents"))
        .orderBy("event_id")
    }),

    // the SAME as-of semantics through the custom Catalyst operator
    // (AsOfJoinPlan -> AsOfJoinExec): one sort-merge pass, one buffered
    // row of state per partition — oracle-pinned identical to asof_join
    "asof_join_native" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), round(col("value") * 100).cast("long").as("value_cents"))
      val clicks = e.filter(col("event_type") === "click").drop("event_type")
      val views = e.filter(col("event_type") === "view").drop("event_type")
      AsOf.asofJoinNative(clicks, views, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_cents"),
          col("asof_event_id"), col("asof_ts_us"), col("asof_value_cents"))
        .orderBy("event_id")
    }),

    // hierarchical + full grouping-sets aggregates (coalesce the group
    // columns to 'ALL' so super-aggregate rows avoid engine-specific
    // null ordering)
    "rollup_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    "cube_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    "intersect_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
        .intersect(
          o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // approximate sketches — mergeable, single-shuffle, constant
    // memory: the 100 TB answer to COUNT(DISTINCT) and quantiles.
    // Sketch INTERNALS differ per engine, so the oracle contract is a
    // tolerance check: emit the exact answer (oracle-comparable) plus a
    // boolean asserting the sketch landed within its error bound — the
    // DuckDB side asserts TRUE. A sketch drifting out of tolerance now
    // FAILS the hash gate instead of hiding behind a rows-only check.
    // exact + sketch from the DISTINCT-PAIR aggregate, one per key
    // column: a single agg holding 2 countDistinct + 2 HLLs Expands
    // the fact 4× (24M rows through the aggregate at sf0.1 — measured
    // 5.2 s noop vs 1.3 s this way). HLL over the distinct pairs is
    // the same sketch (HLL of a set == HLL of its multiset), so each
    // branch shuffles map-side-reduced pairs once and the tiny per-flag
    // results broadcast-join back together.
    // sketches through a multi-level aggregate: distinct parts per
    // (flag, status), per flag, and grand-total in ONE pass via cube +
    // the native HLL — the Expand operator feeds every grouping level
    // the same rows, and the sketch envelope is asserted per level
    // against the exact two-phase count.
    "hll_grouping_sets" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val li = t(s, dir, "lineitem").filter(col("l_partkey").isNotNull)
      val est = li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(call_function("graft_hll_distinct", col("l_partkey")).as("_est"))
      val exact = li
        .select(col("l_returnflag"), col("l_linestatus"), col("l_partkey")).distinct()
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      est.join(exact, est("l_returnflag") <=> exact("l_returnflag") &&
          est("l_linestatus") <=> exact("l_linestatus"))
        .select(coalesce(est("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(est("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("exact_parts"),
          // 8% = ~5σ for the p=12 estimator (HllEnvelopeSpec) — a 5%
          // bound is 3σ and trips on tail groups when data regenerates
          (abs(col("_est") - col("exact_parts")) <= col("exact_parts") * 0.08)
            .as("hll_ok"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // the two-level sketch workflow: per-(flag, linestatus) sketches
    // (as a persisted daily sketch table would hold), rolled up to
    // per-flag estimates by merging REGISTERS — no raw data re-read.
    // Registers are a pure function of the input set and merge by max,
    // so the rolled-up estimate is BIT-IDENTICAL to estimating the
    // coarse group directly (asserted in-query; DuckDB pins TRUE).
    "hll_sketch_rollup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val li = t(s, dir, "lineitem").filter(col("l_partkey").isNotNull)
      val fine = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(call_function("graft_hll_sketch", col("l_partkey")).as("sk"))
      val rolled = fine.groupBy(col("l_returnflag"))
        .agg(call_function("graft_hll_merge_estimate", col("sk")).as("est_rolled"))
      val direct = li.groupBy(col("l_returnflag"))
        .agg(call_function("graft_hll_distinct", col("l_partkey")).as("est_direct"))
      val exact = li.groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
      exact
        .join(broadcast(rolled), Seq("l_returnflag"))
        .join(broadcast(direct), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (col("est_rolled") === col("est_direct")).as("rollup_eq_direct"),
          (abs(col("est_rolled") - col("exact_parts")) <= col("exact_parts") * 0.08)
            .as("rollup_within_tol"))
        .orderBy("l_returnflag")
    }),

    // the NATIVE mergeable-sketch twin of approx_distinct_hll: our own
    // TypedImperativeAggregate (functions/HllDistinct) instead of the
    // built-in — per-partition register arrays merged by element-wise
    // max, so the same sketch could persist per day and merge across
    // windows without raw data. Estimate is partition-order invariant
    // (spec-pinned); the oracle asserts the calibrated envelope (8% =
    // ~5σ for p=12, HllEnvelopeSpec) around exact.
    "approx_distinct_hll_native" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val li = t(s, dir, "lineitem").filter(col("l_partkey").isNotNull)
      li.groupBy(col("l_returnflag"), col("l_partkey")).agg(count(lit(1)).as("_c"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"),
          call_function("graft_hll_distinct", col("l_partkey")).as("_hll"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("_hll") - col("exact_parts")) <= col("exact_parts") * 0.08)
            .as("hll_native_ok"))
        .orderBy("l_returnflag")
    }),

    "approx_distinct_hll" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // null keys excluded BEFORE the pair aggregate: count(DISTINCT x)
      // ignores nulls, but counting distinct (flag, key) PAIRS would
      // count a null key as one value — latent here (TPC-H keys are
      // non-null), wrong on data that isn't
      def branch(key: String, ex: String, ok: String) =
        li.filter(col(key).isNotNull)
          .groupBy(col("l_returnflag"), col(key)).agg(count(lit(1)).as("_c"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as(ex),
            approx_count_distinct(col(key), rsd = 0.01).as("_hll"))
          .select(col("l_returnflag"), col(ex),
            (abs(col("_hll") - col(ex)) <= col(ex) * 0.05).as(ok))
      branch("l_partkey", "exact_parts", "hll_parts_ok")
        .join(branch("l_suppkey", "exact_supps", "hll_supps_ok"), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          col("hll_parts_ok"), col("hll_supps_ok"))
        .orderBy("l_returnflag")
    }),

    // sketch (mergeable percentile_approx) validated against the EXACT
    // quantiles in HISTOGRAM form — the same shape as
    // feature_binning_deciles / robust_mad_outliers, NOT the built-in
    // exact `percentile()` aggregate: that one buffers a whole group on
    // one reducer (~4 groups ⇒ one task per 25 TB group at 100×). Here
    // the fact collapses to a (flag, cents, count) histogram in one
    // shuffle, the prefix sum is chunk-distributed, and the quantile
    // read-off is weighted arithmetic over |distinct values| rows.
    // Exact quantile convention: lower quantile, min v with
    // cum ≥ ceil(p·n) — neighbors in a 6M-row price distribution are
    // far closer than the 1% tolerance band, so the booleans are
    // insensitive to the interpolation convention the old verifier used.
    "approx_quantiles_kll" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("price_c"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("qs"),
          count(lit(1)).as("n_rows"))
      val h = li.groupBy(col("l_returnflag"), col("price_c"))
        .agg(count(lit(1)).as("c"))
      val cum = graft.ext.Scale.chunkedCumSum(
        h, Seq("l_returnflag"), "price_c", "c", "cum")
        .withColumnRenamed("cum_total", "n")
      val exact = cum.groupBy(col("l_returnflag")).agg(
        min(when(col("cum") >= expr("(n + 1) div 2"), col("price_c"))).as("ex50"),
        min(when(col("cum") >= expr("(n * 19 + 19) div 20"), col("price_c"))).as("ex95"),
        min(when(col("cum") >= expr("(n * 99 + 99) div 100"), col("price_c"))).as("ex99"))
      approx.join(broadcast(exact), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("qs")(0) - col("ex50")) <= col("ex50") * 0.01).as("p50_ok"),
          (abs(col("qs")(1) - col("ex95")) <= col("ex95") * 0.01).as("p95_ok"),
          (abs(col("qs")(2) - col("ex99")) <= col("ex99") * 0.01).as("p99_ok"))
        .orderBy("l_returnflag")
    }),

    // train-prep: deterministic split, sequence packing, benchmark
    // decontamination (eval set = every 20th document, so the planted
    // contamination is exactly the docs that appear in both sets)
    "dataset_hash_split" -> ((s, dir) =>
      TrainPrep.hashSplit(t(s, dir, "documents")).orderBy("doc_id")),

    "sequence_packing" -> ((s, dir) =>
      TrainPrep.packSequences(t(s, dir, "documents")).orderBy("doc_id")),

    "decontamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TrainPrep.decontaminate(d, d.filter(col("doc_id") % 20 === 0)).orderBy("doc_id")
    }),

    // the full cleaning pipeline over a corpus seeded with exact copies
    // (+2e6, removed by exact dedup) and near copies (+1e6, removed by
    // LSH near-dup pruning), with a quality gate up front
    "corpus_clean_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = split(col("text"), " ")
      val corpus = d
        .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
        .unionByName(d.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      CorpusClean.clean(corpus)
        .select(col("doc_id"), col("quality_score"))
        .orderBy("doc_id")
    }),
  )

  private val oraclesBase: Map[String, String] = Map(
    // sketch keys: the oracle pins the EXACT answers and asserts the
    // tolerance booleans are all TRUE (the Spark side computes them
    // against its own sketch estimates)
    "approx_distinct_hll" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_suppkey) AS exact_supps,
           TRUE AS hll_parts_ok, TRUE AS hll_supps_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "approx_distinct_hll_native" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_native_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "customer_decile_transitions" ->
      """WITH rev AS (
           SELECT o_custkey,
                  CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-06-01'
                       THEN 'H1' ELSE 'H2' END AS half,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
           FROM orders GROUP BY 1, 2),
         h AS (SELECT half, rev, count(*) AS c FROM rev GROUP BY 1, 2),
         k AS (
           SELECT half, rev, c,
                  sum(c) OVER (PARTITION BY half ORDER BY rev) AS cum,
                  sum(c) OVER (PARTITION BY half) AS n
           FROM h),
         b AS (
           SELECT half,
                  min(CASE WHEN cum >= (n * 1 + 9) // 10 THEN rev END) AS d1,
                  min(CASE WHEN cum >= (n * 2 + 9) // 10 THEN rev END) AS d2,
                  min(CASE WHEN cum >= (n * 3 + 9) // 10 THEN rev END) AS d3,
                  min(CASE WHEN cum >= (n * 4 + 9) // 10 THEN rev END) AS d4,
                  min(CASE WHEN cum >= (n * 5 + 9) // 10 THEN rev END) AS d5,
                  min(CASE WHEN cum >= (n * 6 + 9) // 10 THEN rev END) AS d6,
                  min(CASE WHEN cum >= (n * 7 + 9) // 10 THEN rev END) AS d7,
                  min(CASE WHEN cum >= (n * 8 + 9) // 10 THEN rev END) AS d8,
                  min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN rev END) AS d9
           FROM k GROUP BY 1),
         binned AS (
           SELECT r.o_custkey, r.half,
                  1 + CAST(rev > d1 AS INT) + CAST(rev > d2 AS INT)
                    + CAST(rev > d3 AS INT) + CAST(rev > d4 AS INT)
                    + CAST(rev > d5 AS INT) + CAST(rev > d6 AS INT)
                    + CAST(rev > d7 AS INT) + CAST(rev > d8 AS INT)
                    + CAST(rev > d9 AS INT) AS bin
           FROM rev r JOIN b ON r.half = b.half)
         SELECT h1.bin AS bin_h1, h2.bin AS bin_h2, count(*) AS n_customers
         FROM (SELECT o_custkey, bin FROM binned WHERE half = 'H1') h1
         JOIN (SELECT o_custkey, bin FROM binned WHERE half = 'H2') h2
           ON h1.o_custkey = h2.o_custkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "hll_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                TRUE AS hll_ok
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY 1, 2""",

    "hll_sketch_rollup" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS rollup_eq_direct,
           TRUE AS rollup_within_tol
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "approx_quantiles_kll" ->
      """SELECT l_returnflag, count(*) AS n_rows,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "dedup_exact" ->
      s"""WITH corpus AS ($corpusSql)
         SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
                CAST(count(*) AS BIGINT) AS n_copies
         FROM corpus GROUP BY md5(text) ORDER BY keep_id""",

    "dedup_minhash_lsh" ->
      s"""WITH corpus AS ($nearCorpusSql),
         sh AS ($shinglesSql),
         mh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM sh),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3)),
         scored AS (SELECT a_id, b_id, $jaccardSql AS jaccard FROM cand)
         SELECT a_id, b_id, jaccard FROM scored
         WHERE jaccard >= 0.5 ORDER BY a_id, b_id""",

    "dedup_incremental_lsh" ->
      s"""WITH newb AS (
           SELECT doc_id + 1000000 AS doc_id,
                  array_to_string(w[1:greatest(len(w)-2, 1)], ' ') AS text
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         osh AS (
           SELECT doc_id,
                  [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         nsh AS (
           SELECT doc_id,
                  [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM newb)),
         omh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM osh),
         nmh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM nsh),
         cand AS (
           SELECT o.doc_id AS old_id, n.doc_id AS new_id, o.sh AS ash, n.sh AS bsh
           FROM omh o JOIN nmh n
             ON (o.s0 = n.s0 OR o.s1 = n.s1 OR o.s2 = n.s2 OR o.s3 = n.s3)),
         scored AS (SELECT old_id, new_id, $jaccardSql AS jaccard FROM cand)
         SELECT old_id, new_id, jaccard FROM scored
         WHERE jaccard >= 0.5 ORDER BY old_id, new_id""",

    "knn_graph_blocked" ->
      s"""WITH q AS ($quantSql),
         scored AS (
           SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                  ${qcosSql("a.q", "b.q")} AS cosine
           FROM q a JOIN q b ON a.vec_id <> b.vec_id),
         ranked AS (
           SELECT q_id, n_id, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM scored)
         SELECT q_id, n_id, cosine, rank FROM ranked
         WHERE rank <= 3 ORDER BY q_id, rank""",

    "near_dup_rate_by_slice" ->
      s"""WITH corpus AS ($nearCorpusSql),
         sh AS ($shinglesSql),
         mh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM sh),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3)),
         pairs AS (SELECT a_id, b_id FROM cand WHERE $jaccardSql >= 0.5),
         dup AS (
           SELECT DISTINCT doc_id % 1000000 AS doc_id
           FROM (SELECT a_id AS doc_id FROM pairs
                 UNION ALL SELECT b_id FROM pairs)),
         flagged AS (
           SELECT d.lang, CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup
           FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(is_dup) AS BIGINT) AS n_near_dup,
                CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm
         FROM flagged GROUP BY 1 ORDER BY lang""",

    "graph_pagerank" ->
      """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         edges AS (
           SELECT a.pk AS ea, b.pk AS eb
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT ea AS src, eb AS dst FROM edges
                 UNION ALL SELECT eb, ea FROM edges),
         deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
         c0 AS (SELECT r0.node AS src, r0.r // deg.deg AS share
                FROM r0 JOIN deg ON r0.node = deg.src),
         r1 AS (SELECT sym.dst AS node,
                  CAST(150000 + (85 * sum(share)) // 100 AS BIGINT) AS r
                FROM sym JOIN c0 USING (src) GROUP BY 1),
         c1 AS (SELECT r1.node AS src, r1.r // deg.deg AS share
                FROM r1 JOIN deg ON r1.node = deg.src),
         r2 AS (SELECT sym.dst AS node,
                  CAST(150000 + (85 * sum(share)) // 100 AS BIGINT) AS r
                FROM sym JOIN c1 USING (src) GROUP BY 1),
         c2 AS (SELECT r2.node AS src, r2.r // deg.deg AS share
                FROM r2 JOIN deg ON r2.node = deg.src),
         r3 AS (SELECT sym.dst AS node,
                  CAST(150000 + (85 * sum(share)) // 100 AS BIGINT) AS r
                FROM sym JOIN c2 USING (src) GROUP BY 1)
         SELECT node, r AS rank_ppm FROM r3 ORDER BY node""",

    "embedding_coverage" ->
      """WITH cov AS (
           SELECT d.lang,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(count(e.vec_id) AS BIGINT) AS n_with_vec
           FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
           GROUP BY 1),
         orph AS (
           SELECT CAST(count(*) AS BIGINT) AS n_orphan_vecs
           FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id
           WHERE d.doc_id IS NULL)
         SELECT lang, n_docs, n_with_vec,
                CAST(n_with_vec * 1000000 // n_docs AS BIGINT) AS coverage_ppm,
                orph.n_orphan_vecs
         FROM cov, orph ORDER BY lang""",

    "embedding_norm_stats" ->
      """WITH q AS (
           SELECT label,
                  [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
           FROM embeddings),
         d AS (SELECT label,
                 list_sum([q[i] * q[i] FOR i IN range(1, len(q) + 1)]) AS d2
               FROM q)
         SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                CAST(min(d2) AS BIGINT) AS min_d2, CAST(max(d2) AS BIGINT) AS max_d2,
                CAST(sum(d2) AS BIGINT) AS sum_d2
         FROM d GROUP BY 1 ORDER BY label""",

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

    "mixture_weights" ->
      """WITH per AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS s
           FROM documents GROUP BY 1)
         SELECT lang, n_docs,
                CAST(n_docs * 1000000 // (SELECT sum(n_docs) FROM per) AS BIGINT) AS raw_ppm,
                CAST(s * 1000000 // (SELECT sum(s) FROM per) AS BIGINT) AS weight_ppm
         FROM per ORDER BY lang""",

    "dup_size_histogram" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0
           UNION ALL
           SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 4 = 0),
         groups AS (
           SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n_copies
           FROM corpus GROUP BY 1)
         SELECT n_copies, CAST(count(*) AS BIGINT) AS n_groups,
                CAST(sum(n_copies) AS BIGINT) AS n_docs
         FROM groups GROUP BY 1 ORDER BY n_copies""",

    "dataset_card_stats" ->
      """SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
           min(doc_id) AS min_id, max(doc_id) AS max_id,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_exact_dups
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "embedding_centroids" ->
      """WITH q AS (
           SELECT vec_id, label,
                  [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
           FROM embeddings),
         x AS (
           SELECT label,
                  unnest([struct_pack(d := i, v := q[i + 1]) FOR i IN range(0, len(q))]) AS s
           FROM q),
         g AS (
           SELECT label, CAST(s['d'] AS INT) AS dim,
                  CAST(count(*) AS BIGINT) AS n_vecs,
                  CAST(sum(s['v']) AS BIGINT) AS sum_q
           FROM x GROUP BY 1, 2)
         SELECT label, dim, n_vecs, sum_q,
                CAST(sum_q AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS mean_q
         FROM g ORDER BY label, dim""",

    "knn_classify_majority" ->
      s"""WITH q AS ($quantSql),
         lab AS (SELECT vec_id, label FROM embeddings),
         scored AS (
           SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                  ${qcosSql("a.q", "b.q")} AS cosine
           FROM q a JOIN q b ON a.vec_id <> b.vec_id),
         ranked AS (
           SELECT q_id, n_id,
                  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
           FROM scored),
         votes AS (
           SELECT q_id, label, CAST(count(*) AS BIGINT) AS n_votes
           FROM ranked JOIN lab ON ranked.n_id = lab.vec_id
           WHERE rnk <= 5 GROUP BY 1, 2),
         win AS (
           SELECT q_id, label, n_votes,
                  row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label) AS r
           FROM votes)
         SELECT q_id AS vec_id, label AS predicted_label, n_votes
         FROM win WHERE r = 1 ORDER BY vec_id""",

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

    "dedup_simhash" ->
      s"""WITH corpus AS ($nearCorpusSql),
         sig AS (
           SELECT doc_id,
             array_to_string([CASE WHEN list_sum(
               [CASE WHEN substr(md5(t), i, 1) >= '8' THEN 1 ELSE -1 END FOR t IN toks])
               >= 0 THEN '1' ELSE '0' END FOR i IN range(1, 17)], '') AS simhash
           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus))
         SELECT doc_id, simhash,
                CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_size
         FROM sig ORDER BY doc_id""",

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (
           SELECT doc_id, lang, source,
             [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
           FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents))
         SELECT a.lang, a.source, a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_distinct(a.sh)) + len(list_distinct(b.sh))
                - len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
         FROM sh a JOIN sh b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         ORDER BY a_id, b_id""",

    // ground truth for the integer-LSH key: exact all-pairs shingle-set
    // Jaccard at the same threshold (see the key's comment on why the
    // near-exhaustive band family makes LSH output == ground truth)
    "dedup_minhash_lsh_fast" ->
      """WITH sh AS (
           SELECT doc_id,
             list_distinct([array_to_string(w[i+1:i+3], ' ')
                            FOR i IN range(0, greatest(len(w)-2, 0))]) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         p AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(len(a.sh) + len(b.sh)
                  - len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT a_id, b_id, jaccard FROM p
         WHERE jaccard >= 0.5 ORDER BY a_id, b_id""",

    "dedup_embedding_cosine" ->
      s"""WITH q AS ($quantSql),
         scored AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                  ${qcosSql("a.q", "b.q")} AS cosine
           FROM q a JOIN q b ON a.vec_id < b.vec_id)
         SELECT a_id, b_id, cosine FROM scored
         WHERE cosine > 0.4 ORDER BY a_id, b_id""",

    "knn_bruteforce_cosine" ->
      s"""WITH q AS ($quantSql),
         scored AS (
           SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                  ${qcosSql("qs.q", "c.q")} AS cosine
           FROM q c JOIN (SELECT * FROM q WHERE vec_id < 8) qs
             ON qs.vec_id <> c.vec_id),
         ranked AS (
           SELECT q_id, n_id, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM scored)
         SELECT q_id, n_id, cosine, rank FROM ranked
         WHERE rank <= 5 ORDER BY q_id, rank""",

    "knn_lsh_bucketed" ->
      s"""WITH q AS (
           SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q,
             array_to_string([CASE WHEN x >= 0 THEN '1' ELSE '0' END FOR x IN embedding[1:8]], '') AS bucket
           FROM embeddings),
         scored AS (
           SELECT qs.vec_id AS q_id, c.vec_id AS n_id, c.bucket AS bucket,
                  ${qcosSql("qs.q", "c.q")} AS cosine
           FROM q c JOIN (SELECT * FROM q WHERE vec_id < 8) qs
             ON qs.bucket = c.bucket AND qs.vec_id <> c.vec_id),
         ranked AS (
           SELECT q_id, n_id, bucket, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM scored)
         SELECT q_id, n_id, bucket, cosine, rank FROM ranked
         WHERE rank <= 3 ORDER BY q_id, rank""",

    "knn_lsh_multiprobe" ->
      s"""WITH q AS (
           SELECT vec_id,
             [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q,
             array_to_string([CASE WHEN x >= 0 THEN '1' ELSE '0' END FOR x IN embedding[1:8]], '') AS bucket
           FROM embeddings),
         qs AS (
           SELECT vec_id, q, unnest([
             bucket,
             (CASE WHEN substr(bucket, 1, 1) = '1' THEN '0' ELSE '1' END) || substr(bucket, 2, 7),
             substr(bucket, 1, 1) || (CASE WHEN substr(bucket, 2, 1) = '1' THEN '0' ELSE '1' END) || substr(bucket, 3, 6)
           ]) AS bucket
           FROM q WHERE vec_id < 8),
         scored AS (
           SELECT qs.vec_id AS q_id, c.vec_id AS n_id, c.bucket AS bucket,
                  ${qcosSql("qs.q", "c.q")} AS cosine
           FROM q c JOIN qs ON qs.bucket = c.bucket AND qs.vec_id <> c.vec_id),
         ranked AS (
           SELECT q_id, n_id, bucket, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM scored)
         SELECT q_id, n_id, bucket, cosine, rank FROM ranked
         WHERE rank <= 3 ORDER BY q_id, rank""",

    "knn_ivf" ->
      s"""WITH q AS ($quantSql),
         cent AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS c_q FROM q WHERE vec_id < 16),
         assigned AS (
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
         scored AS (
           SELECT p.q_id, a.n_id, a.cell_id, ${qcosSql("p.q_q", "a.n_q")} AS cosine
           FROM assigned a JOIN probed p ON a.cell_id = p.cell_id AND p.q_id <> a.n_id),
         ranked AS (
           SELECT q_id, n_id, cell_id, cosine,
                  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
           FROM scored)
         SELECT q_id, n_id, cell_id, cosine, rank FROM ranked
         WHERE rank <= 3 ORDER BY q_id, rank""",

    "kmeans_spherical" -> {
      def assignSql(name: String, cent: String) =
        s"""$name AS (SELECT vec_id, cell_id FROM (
           SELECT n.vec_id, c.cell_id,
                  row_number() OVER (PARTITION BY n.vec_id
                    ORDER BY ${qcosSql("n.q", "c.c_q")} DESC, c.cell_id) AS rn
           FROM q n CROSS JOIN $cent c) WHERE rn = 1)"""
      def updateSql(name: String, a: String) =
        s"""$name AS (
           SELECT cell_id, list(s ORDER BY dim) AS c_q FROM (
             SELECT $a.cell_id, t.i AS dim,
                    CAST(sum(q.q[t.i]) AS BIGINT) >> 10 AS s
             FROM $a JOIN q USING (vec_id), range(1, 65) t(i)
             GROUP BY $a.cell_id, t.i) GROUP BY cell_id)"""
      s"""WITH q AS ($quantSql),
         cent0 AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS c_q FROM q WHERE vec_id < 8),
         ${assignSql("a1", "cent0")},
         ${updateSql("cent1", "a1")},
         ${assignSql("a2", "cent1")},
         ${updateSql("cent2", "a2")},
         ${assignSql("a3", "cent2")}
         SELECT cell_id, CAST(count(*) AS BIGINT) AS n_members,
                CAST(sum(vec_id) AS BIGINT) AS id_checksum
         FROM a3 GROUP BY cell_id ORDER BY cell_id"""
    },

    "semdedup_prune" ->
      s"""WITH q AS ($quantSql),
         cent AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS c_q FROM q WHERE vec_id < 16),
         assigned AS (
           SELECT n_id, n_q, cell_id FROM (
             SELECT n.vec_id AS n_id, n.q AS n_q, c.cell_id,
                    row_number() OVER (PARTITION BY n.vec_id
                      ORDER BY ${qcosSql("n.q", "c.c_q")} DESC, c.cell_id) AS rn
             FROM q n CROSS JOIN cent c)
           WHERE rn = 1),
         pruned AS (
           SELECT DISTINCT b.n_id AS vec_id
           FROM assigned a JOIN assigned b
             ON a.cell_id = b.cell_id AND a.n_id < b.n_id
           WHERE ${qcosSql("a.n_q", "b.n_q")} > 0.4)
         SELECT a.n_id AS vec_id, a.cell_id,
                (p.vec_id IS NULL) AS keep
         FROM assigned a LEFT JOIN pruned p ON a.n_id = p.vec_id
         ORDER BY vec_id""",

    "dedup_clusters" ->
      s"""WITH RECURSIVE corpus AS ($nearCorpusSql),
         sh AS ($shinglesSql),
         mh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM sh),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3)),
         pairs AS (
           SELECT a_id, b_id FROM (SELECT a_id, b_id, $jaccardSql AS jaccard FROM cand)
           WHERE jaccard >= 0.5),
         edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                   UNION ALL SELECT b_id, a_id FROM pairs),
         r AS (
           SELECT doc_id AS node, doc_id AS m FROM corpus
           UNION
           SELECT e.dst AS node, r.m FROM r JOIN edges e ON e.src = r.node),
         clusters AS (SELECT node AS doc_id, min(m) AS cluster_id FROM r GROUP BY node)
         SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
         FROM clusters ORDER BY doc_id""",

    "dedup_cluster_representatives" ->
      s"""WITH RECURSIVE corpus AS ($nearCorpusSql),
         sh AS ($shinglesSql),
         mh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM sh),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3)),
         pairs AS (
           SELECT a_id, b_id FROM (SELECT a_id, b_id, $jaccardSql AS jaccard FROM cand)
           WHERE jaccard >= 0.5),
         edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                   UNION ALL SELECT b_id, a_id FROM pairs),
         r AS (
           SELECT doc_id AS node, doc_id AS m FROM corpus
           UNION
           SELECT e.dst AS node, r.m FROM r JOIN edges e ON e.src = r.node),
         clusters AS (SELECT node AS doc_id, min(m) AS cluster_id FROM r GROUP BY node),
         tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM corpus)
         SELECT c.doc_id, c.cluster_id, t.n_tokens,
                (row_number() OVER (PARTITION BY c.cluster_id
                   ORDER BY t.n_tokens DESC, c.doc_id) = 1) AS is_representative
         FROM clusters c JOIN tok t USING (doc_id) ORDER BY c.doc_id""",

    "multimodal_wav_frame_energy" ->
      """WITH d AS (SELECT doc_id, 256 + (doc_id % 512) AS n FROM documents),
         s AS (SELECT d.doc_id, t.i // 256 AS f,
                      ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS v
               FROM d, range(768) t(i) WHERE t.i < d.n),
         fe AS (SELECT doc_id, f, CAST(sum(v * v) AS BIGINT) AS e
                FROM s GROUP BY 1, 2),
         pk AS (SELECT doc_id, f FROM (
                  SELECT doc_id, f,
                         row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, f) AS rn
                  FROM fe) WHERE rn = 1)
         SELECT fe.doc_id,
                CAST(count(*) AS INT) AS n_frames,
                CAST(sum(fe.e) AS BIGINT) AS total_energy,
                CAST(max(fe.e) AS BIGINT) AS peak_frame_energy,
                CAST(min(pk.f) AS INT) AS peak_frame_index
         FROM fe JOIN pk USING (doc_id)
         GROUP BY fe.doc_id ORDER BY fe.doc_id""",

    "dedup_simhash64" ->
      s"""WITH docs5 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         corpus AS (
           SELECT doc_id, text FROM docs5
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM docs5)),
         m AS (
           SELECT doc_id, [md5(t) || md5('1|' || t) FOR t IN string_split(text, ' ')] AS mat
           FROM corpus),
         sig AS (
           SELECT doc_id,
             array_to_string([CASE WHEN list_sum(
               [CASE WHEN substr(h, i, 1) >= '8' THEN 1 ELSE -1 END FOR h IN mat])
               >= 0 THEN '1' ELSE '0' END FOR i IN range(1, 65)], '') AS simhash
           FROM m),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  a.simhash AS ash, b.simhash AS bsh
           FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            AND (substr(a.simhash, 1, 16) = substr(b.simhash, 1, 16)
              OR substr(a.simhash, 17, 16) = substr(b.simhash, 17, 16)
              OR substr(a.simhash, 33, 16) = substr(b.simhash, 33, 16)
              OR substr(a.simhash, 49, 16) = substr(b.simhash, 49, 16))),
         h AS (SELECT a_id, b_id,
                 CAST(len(list_filter(range(1, 65), i -> ash[i] != bsh[i])) AS INT) AS hamming
               FROM cand)
         SELECT a_id, b_id, hamming FROM h
         WHERE hamming <= 3 ORDER BY a_id, b_id""",

    "dedup_simhash_hamming" ->
      s"""WITH docs5 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         corpus AS (
           SELECT doc_id, text FROM docs5
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM docs5)),
         sig AS (
           SELECT doc_id,
             array_to_string([CASE WHEN list_sum(
               [CASE WHEN substr(md5(t), i, 1) >= '8' THEN 1 ELSE -1 END FOR t IN toks])
               >= 0 THEN '1' ELSE '0' END FOR i IN range(1, 17)], '') AS simhash
           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  a.simhash AS ash, b.simhash AS bsh
           FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            AND (substr(a.simhash, 1, 8) = substr(b.simhash, 1, 8)
              OR substr(a.simhash, 9, 8) = substr(b.simhash, 9, 8))),
         h AS (SELECT a_id, b_id,
                 CAST(len(list_filter(range(1, 17), i -> ash[i] != bsh[i])) AS INT) AS hamming
               FROM cand)
         SELECT a_id, b_id, hamming FROM h
         WHERE hamming <= 1 ORDER BY a_id, b_id""",

    "events_new_vs_returning" ->
      """WITH du AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         f AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY 1),
         a AS (
           SELECT du.day,
                  CAST(count(*) AS BIGINT) AS dau,
                  CAST(sum(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users
           FROM du JOIN f USING (user_id) GROUP BY du.day)
         SELECT day, dau, new_users,
                dau - new_users AS returning_users,
                new_users * 1000000 // dau AS new_ppm
         FROM a ORDER BY day""",

    "events_experiment_readout" ->
      """WITH e AS (
           SELECT event_type, user_id,
                  CAST(json_extract(props, '$.k') AS BIGINT) % 2 AS variant,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         a AS (
           SELECT event_type,
                  CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                  CAST(count(DISTINCT CASE WHEN variant = 0 THEN user_id END) AS BIGINT) AS users_a,
                  CAST(count(DISTINCT CASE WHEN variant = 1 THEN user_id END) AS BIGINT) AS users_b,
                  CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS BIGINT) AS cents_a,
                  CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS BIGINT) AS cents_b
           FROM e GROUP BY event_type)
         SELECT event_type, n_a, n_b, users_a, users_b, cents_a, cents_b,
                cents_a // n_a AS mean_cents_a,
                cents_b // n_b AS mean_cents_b,
                (cents_b // n_b) - (cents_a // n_a) AS mean_diff_cents
         FROM a ORDER BY event_type""",

    "events_bot_score" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         g AS (
           SELECT user_id,
                  ts_us - lag(ts_us) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS gap_us
           FROM e),
         a AS (
           SELECT user_id,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CASE WHEN gap_us < 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
                  CAST(sum(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
           FROM g GROUP BY user_id)
         SELECT user_id, n_events, n_fast, n_gaps,
                CASE WHEN n_gaps = 0 THEN 0
                     ELSE n_fast * 1000000 // n_gaps END AS fast_ppm,
                (n_events >= 10 AND
                 (CASE WHEN n_gaps = 0 THEN 0
                       ELSE n_fast * 1000000 // n_gaps END) >= 120000) AS is_bot
         FROM a ORDER BY user_id""",

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

    "dataset_hash_split" ->
      """WITH h AS (
           SELECT doc_id,
             list_reduce(
               [CAST(ascii(ch) AS BIGINT) FOR ch IN
                 regexp_extract_all(md5('split|' || CAST(doc_id AS VARCHAR)), '.')],
               (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket
           FROM documents)
         SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM h ORDER BY doc_id""",

    "embedding_int8_quant" ->
      """WITH q AS (SELECT vec_id,
                           [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                    FROM embeddings),
         m AS (SELECT vec_id, q,
                      greatest(list_max([abs(v) FOR v IN q]), 1) AS maxabs FROM q),
         e AS (SELECT vec_id, maxabs, len(q) AS n_dims,
                      [abs(abs(v)*127 - ((abs(v)*127 + maxabs//2)//maxabs)*maxabs) FOR v IN q] AS errs,
                      [((abs(v)*127 + maxabs//2)//maxabs) FOR v IN q] AS sabs
               FROM m)
         SELECT vec_id, CAST(maxabs AS BIGINT) AS maxabs_q,
                CAST(n_dims AS INT) AS n_dims,
                CAST(list_sum(errs) AS BIGINT) AS sum_err,
                CAST(list_max(errs) AS BIGINT) AS max_err,
                CAST(len(list_filter(sabs, x -> x = 127)) AS BIGINT) AS n_sat
         FROM e ORDER BY vec_id""",

    "packing_efficiency" ->
      """WITH b AS (
           SELECT doc_id, doc_id % 8 AS bucket,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, bucket, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS cum
           FROM b),
         p AS (
           SELECT bucket, (cum - n_tokens) // 2048 AS pack_id,
                  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
           FROM c GROUP BY 1, 2),
         f AS (SELECT pack_tokens * 1000000 // 2048 AS fill_ppm FROM p)
         SELECT fill_ppm // 100000 AS bin,
                CAST(count(*) AS BIGINT) AS n_packs,
                CAST(min(fill_ppm) AS BIGINT) AS min_fill_ppm,
                CAST(max(fill_ppm) AS BIGINT) AS max_fill_ppm
         FROM f GROUP BY 1 ORDER BY 1""",

    "events_decayed_engagement" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         m AS (SELECT max(ts_us) AS mx FROM e),
         d AS (
           SELECT user_id,
                  least((m.mx - e.ts_us) // 86400000000, 62) AS age_days,
                  e.cents // CAST(pow(2, least((m.mx - e.ts_us) // 86400000000, 62)) AS BIGINT) AS decayed
           FROM e CROSS JOIN m)
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(decayed) AS BIGINT) AS decayed_cents,
                CAST(min(age_days) AS BIGINT) AS latest_age_days
         FROM d GROUP BY user_id ORDER BY user_id""",

    "dataset_shard_shuffle" ->
      """WITH h AS (
           SELECT doc_id,
             list_reduce(
               [CAST(ascii(ch) AS BIGINT) FOR ch IN
                 regexp_extract_all(md5('shuffle|' || CAST(doc_id AS VARCHAR)), '.')],
               (a, b) -> (a * 31 + b) % 1000000007) AS sort_key
           FROM documents)
         SELECT doc_id, sort_key % 8 AS shard, sort_key,
                CAST(row_number() OVER (PARTITION BY sort_key % 8
                  ORDER BY sort_key, doc_id) AS BIGINT) AS position
         FROM h ORDER BY doc_id""",

    "sequence_packing" ->
      """WITH b AS (
           SELECT doc_id, doc_id % 8 AS bucket,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, bucket, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS cum_tokens
           FROM b)
         SELECT doc_id, bucket, n_tokens, cum_tokens,
                (cum_tokens - n_tokens) // 2048 AS pack_id
         FROM c ORDER BY doc_id""",

    "decontamination" ->
      """WITH shingled AS (
           SELECT doc_id,
             [array_to_string(w[i+1:i+5], ' ') FOR i IN range(0, greatest(len(w)-4, 0))] AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         ev AS (SELECT DISTINCT unnest(sh) AS shingle FROM shingled WHERE doc_id % 20 = 0),
         tr AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
         ov AS (SELECT t.doc_id, count(DISTINCT t.shingle) AS n_overlap
                FROM tr t JOIN ev USING (shingle) GROUP BY t.doc_id)
         SELECT d.doc_id, CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
                coalesce(o.n_overlap, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN ov o USING (doc_id) ORDER BY d.doc_id""",

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

    "fuzzy_levenshtein_join" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
         SELECT a.name AS name_a, b.name AS name_b,
                CAST(levenshtein(a.name, b.name) AS INT) AS dist
         FROM n a JOIN n b
           ON string_split(a.name, ' ')[-1] = string_split(b.name, ' ')[-1]
          AND a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 3
         ORDER BY name_a, name_b""",

    "multimodal_frame_sample" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
         f AS (
           SELECT doc_id,
                  unnest([struct_pack(i := i,
                           s := substr(text, CAST((len * i) // 4 AS INT) + 1,
                                 CAST((len * (i + 1)) // 4 AS INT)
                                   - CAST((len * i) // 4 AS INT)))
                          FOR i IN range(0, 4)]) AS fr
           FROM d)
         SELECT doc_id,
                CAST(fr['i'] AS INT) AS frame_index,
                CAST(length(fr['s']) AS BIGINT) AS n_bytes,
                md5(fr['s']) AS frame_md5
         FROM f ORDER BY doc_id, frame_index""",

    "multimodal_wav_decode" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
                           256 + (doc_id % 512) AS n
                    FROM documents),
         s AS (SELECT d.doc_id, d.sample_rate, d.n,
                      ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS v
               FROM d, range(768) t(i) WHERE t.i < d.n)
         SELECT doc_id, sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST((n * 1000) // sample_rate AS BIGINT) AS duration_ms,
                CAST(max(abs(v)) AS INT) AS peak_abs,
                CAST(sum(v * v) AS BIGINT) AS sum_sq
         FROM s GROUP BY doc_id, sample_rate, n
         ORDER BY doc_id""",

    "multimodal_bmp_decode" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8 + doc_id % 9 AS INT) AS width,
                           CAST(4 + doc_id % 5 AS INT) AS height
                    FROM documents),
         px AS (SELECT d.doc_id, d.width, d.height, t.i,
                       (d.doc_id * 2654435761 + t.i * 97) % 256 AS b,
                       (d.doc_id * 2654435761 + t.i * 97 + 31) % 256 AS g,
                       (d.doc_id * 2654435761 + t.i * 97 + 62) % 256 AS r
                FROM d, range(128) t(i) WHERE t.i < d.width * d.height)
         SELECT doc_id, width, height,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b) AS BIGINT) AS sum_b,
                CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS peak_luma,
                CAST(sum((i + 1) * (r + 256 * g + 65536 * b)) AS BIGINT) AS pos_checksum
         FROM px GROUP BY doc_id, width, height
         ORDER BY doc_id""",

    "multimodal_bmp_histogram" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8 + doc_id % 9 AS INT) AS w,
                           CAST(4 + doc_id % 5 AS INT) AS h
                    FROM documents),
         px AS (SELECT d.doc_id,
                       (d.doc_id * 2654435761 + t.i * 97) % 256 AS b,
                       (d.doc_id * 2654435761 + t.i * 97 + 31) % 256 AS g,
                       (d.doc_id * 2654435761 + t.i * 97 + 62) % 256 AS r
                FROM d, range(128) t(i) WHERE t.i < d.w * d.h),
         lb AS (SELECT doc_id,
                       CAST(least((2126 * r + 7152 * g + 722 * b) * 16 // 2550000, 15) AS INT) AS bin
                FROM px)
         SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_pixels
         FROM lb GROUP BY doc_id, bin ORDER BY doc_id, bin""",

    "multimodal_bmp_resize" ->
      """WITH d AS (SELECT doc_id,
                           8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h,
                           CAST((8 + doc_id % 9 + 1) // 2 AS INT) AS width,
                           CAST((4 + doc_id % 5 + 1) // 2 AS INT) AS height
                    FROM documents),
         px AS (SELECT d.doc_id, d.width, d.height, t.j,
                       ((t.j // d.width) * 2 * d.w + (t.j % d.width) * 2) AS i
                FROM d, range(40) t(j) WHERE t.j < d.width * d.height),
         ch AS (SELECT doc_id, width, height, j,
                       (doc_id * 2654435761 + i * 97) % 256 AS b,
                       (doc_id * 2654435761 + i * 97 + 31) % 256 AS g,
                       (doc_id * 2654435761 + i * 97 + 62) % 256 AS r
                FROM px)
         SELECT doc_id, width, height,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b) AS BIGINT) AS sum_b,
                CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS peak_luma,
                CAST(sum((j + 1) * (r + 256 * g + 65536 * b)) AS BIGINT) AS pos_checksum
         FROM ch GROUP BY doc_id, width, height
         ORDER BY doc_id""",

    "multimodal_features" ->
      """SELECT doc_id, 'text/plain' AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS content_md5,
         CAST(length(text) % 640 AS INT) AS decoded_w,
         CAST(length(text) % 480 AS INT) AS decoded_h
         FROM documents ORDER BY doc_id""",

    "range_join_binned" -> rangeJoinOracle,

    // optimizer-rule twin: identical semantics, identical oracle
    "range_join_rule_auto" -> rangeJoinOracle,

    "range_join_rule_date" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                    FROM orders),
         w AS (SELECT m, m - 10 AS w_start, last_day(m) AS w_end
               FROM (SELECT DISTINCT CAST(date_trunc('month', d) AS DATE) AS m FROM o))
         SELECT strftime(w.m, '%Y-%m-%d') AS month,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(o.cents) AS BIGINT) AS sum_cents
         FROM o JOIN w ON o.d >= w.w_start AND o.d <= w.w_end
         GROUP BY w.m ORDER BY month""",

    "range_join_rule_ts_left" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
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
         g AS (
           SELECT user_id, session_id,
                  CAST(min(ts_us) AS BIGINT) AS start_us,
                  CAST(max(ts_us) AS BIGINT) AS end_us
           FROM s GROUP BY user_id, session_id HAVING count(*) >= 5),
         c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, c.ts_us, g.session_id, g.start_us
         FROM c LEFT JOIN g
           ON c.user_id = g.user_id
          AND c.ts_us >= g.start_us AND c.ts_us <= g.end_us
         ORDER BY c.event_id, g.session_id NULLS FIRST""",

    "events_sessionize" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
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
           FROM l)
         SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts_us) AS BIGINT) AS start_us,
           CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
           CAST(sum(value_cents) AS BIGINT) AS value_cents
         FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",

    "events_hourly_anomalies" ->
      """WITH cells AS (
           SELECT event_type,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
         base AS (
           SELECT event_type, hod,
                  CAST(sum(n) AS BIGINT) AS base_total,
                  CAST(count(*) AS BIGINT) AS n_days
           FROM cells GROUP BY 1, 2)
         SELECT c.event_type, c.day, c.hod, c.n,
                CAST(base_total // n_days AS BIGINT) AS baseline_n,
                CAST(c.n * n_days * 1000000 // base_total AS BIGINT) AS ratio_ppm,
                (c.n * n_days * 100 > 150 * base_total) AS is_anomaly
         FROM cells c JOIN base b ON c.event_type = b.event_type AND c.hod = b.hod
         ORDER BY c.event_type, c.day, c.hod""",

    "events_user_gini" ->
      """WITH cnt AS (
           SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2),
         h AS (SELECT event_type, c, count(*) AS f FROM cnt GROUP BY 1, 2),
         k AS (
           SELECT event_type, c, f,
                  sum(f) OVER (PARTITION BY event_type ORDER BY c) AS cum,
                  sum(f) OVER (PARTITION BY event_type) AS n
           FROM h)
         SELECT event_type,
                CAST(max(n) AS BIGINT) AS n_users,
                CAST(sum(c * f) AS BIGINT) AS total_events,
                CAST(sum(c * f * (cum * 2 - f - n)) AS BIGINT) AS gini_num,
                CAST(max(n) * sum(c * f) AS BIGINT) AS gini_den,
                CAST(sum(c * f * (cum * 2 - f - n)) * 1000000
                     // (max(n) * sum(c * f)) AS BIGINT) AS gini_ppm
         FROM k GROUP BY 1 ORDER BY 1""",

    "sample_cap_per_source" ->
      """WITH h AS (
           SELECT doc_id, source,
                  md5('smp|' || CAST(doc_id AS VARCHAR)) AS pri
           FROM documents),
         r AS (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rn
           FROM h)
         SELECT source, rn, doc_id FROM r WHERE rn <= 10 ORDER BY source, rn""",

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

    "lsh_band_calibration" ->
      s"""WITH corpus AS ($nearCorpusSql),
         sh0 AS ($shinglesSql),
         b AS (
           SELECT doc_id, ${bandSql(0)} AS b0, ${bandSql(3)} AS b1,
                  ${bandSql(6)} AS b2, ${bandSql(9)} AS b3
           FROM sh0),
         o AS (SELECT * FROM b WHERE doc_id < 1000000),
         c AS (SELECT doc_id - 1000000 AS doc_id, b0 AS c0, b1 AS c1,
                      b2 AS c2, b3 AS c3
               FROM b WHERE doc_id >= 1000000)
         SELECT bands_agree, count(*) AS n_pairs FROM (
           SELECT CAST(o.b0 IS NOT DISTINCT FROM c.c0 AS BIGINT)
                + CAST(o.b1 IS NOT DISTINCT FROM c.c1 AS BIGINT)
                + CAST(o.b2 IS NOT DISTINCT FROM c.c2 AS BIGINT)
                + CAST(o.b3 IS NOT DISTINCT FROM c.c3 AS BIGINT) AS bands_agree
           FROM o JOIN c USING (doc_id))
         GROUP BY 1 ORDER BY 1""",

    "weighted_median_price" ->
      """WITH fact AS (
           SELECT l_returnflag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                  CAST(round(l_quantity) AS BIGINT) AS qty
           FROM lineitem),
         h AS (SELECT l_returnflag, price_c, sum(qty) AS w FROM fact GROUP BY 1, 2),
         k AS (
           SELECT l_returnflag, price_c, w,
                  sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_c) AS cum,
                  sum(w) OVER (PARTITION BY l_returnflag) AS n
           FROM h)
         SELECT l_returnflag, CAST(max(n) AS BIGINT) AS total_qty,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN price_c END) AS BIGINT)
                  AS wmedian_price_c,
                CAST(sum(price_c * w) // max(n) AS BIGINT) AS wmean_price_c
         FROM k GROUP BY 1 ORDER BY 1""",

    "events_attribution_native" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         u AS (
           SELECT user_id, ts_us, 0 AS side,
                  CAST(NULL AS BIGINT) AS p_id, CAST(NULL AS BIGINT) AS p_cents,
                  event_id AS c_id, ts_us AS c_ts
           FROM e WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts_us, 1, event_id, cents,
                  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           FROM e WHERE event_type = 'purchase'),
         m AS (
           SELECT *,
             last_value(c_id IGNORE NULLS) OVER w AS a_click,
             last_value(c_ts IGNORE NULLS) OVER w AS a_ts
           FROM u WINDOW w AS (
             PARTITION BY user_id ORDER BY ts_us, side ROWS UNBOUNDED PRECEDING)),
         p AS (
           SELECT *,
                  (a_click IS NOT NULL AND ts_us - a_ts <= 3600000000) AS attributed
           FROM m WHERE side = 1)
         SELECT attributed, count(*) AS n_purchases,
                CAST(sum(p_cents) AS BIGINT) AS revenue_cents,
                CAST(sum(CASE WHEN attributed THEN ts_us - a_ts ELSE 0 END) AS BIGINT)
                  AS gap_us_sum
         FROM p GROUP BY 1 ORDER BY 1""",

    "price_realization_by_type" ->
      """WITH li AS (
           SELECT l_partkey,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_c,
                  CAST(round(l_quantity) AS BIGINT) AS qty
           FROM lineitem),
         p AS (
           SELECT p_partkey, p_type,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS retail_c
           FROM part)
         SELECT p_type, count(*) AS n_lines,
                CAST(sum(ext_c) AS BIGINT) AS sum_ext_c,
                CAST(sum(retail_c * qty) AS BIGINT) AS sum_list_c,
                CAST(sum(ext_c) * 1000000 // sum(retail_c * qty) AS BIGINT)
                  AS realization_ppm
         FROM li JOIN p ON li.l_partkey = p.p_partkey
         GROUP BY 1 ORDER BY 1""",

    "events_type_mix_drift" ->
      """WITH e AS (
           SELECT event_type, epoch_us(ts) // 604800000000 AS week FROM events),
         cell AS (SELECT week, event_type, count(*) AS n FROM e GROUP BY 1, 2),
         w AS (SELECT week, sum(n) AS n_week FROM cell GROUP BY 1),
         o AS (SELECT event_type, count(*) AS n_type FROM e GROUP BY 1),
         tot AS (SELECT count(*) AS n_total FROM e)
         SELECT CAST(cell.week AS BIGINT) AS week, cell.event_type,
                CAST(n AS BIGINT) AS n,
                CAST(n * 1000000 // n_week AS BIGINT) AS week_share_ppm,
                CAST(n_type * 1000000 // n_total AS BIGINT) AS overall_share_ppm,
                (abs(n * 1000000 // n_week - n_type * 1000000 // n_total) * 100
                  > (n_type * 1000000 // n_total) * 25) AS is_shifted
         FROM cell JOIN w USING (week) JOIN o USING (event_type) CROSS JOIN tot
         ORDER BY week, event_type""",

    "customer_hhi_by_status" ->
      """WITH cnt AS (
           SELECT o_orderstatus, o_custkey, count(*) AS n
           FROM orders GROUP BY 1, 2)
         SELECT o_orderstatus, count(*) AS n_customers,
                CAST(sum(n) AS BIGINT) AS n_orders,
                CAST(sum(n * n) * 1000000 // (sum(n) * sum(n)) AS BIGINT) AS hhi_ppm
         FROM cnt GROUP BY 1 ORDER BY 1""",

    "events_dau_wau_sketch" ->
      """WITH du AS (
           SELECT DISTINCT
             CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS day,
             o_custkey
           FROM orders),
         cov AS (
           SELECT day + r.range AS day, o_custkey
           FROM du CROSS JOIN range(0, 7) r),
         wau AS (SELECT day, count(DISTINCT o_custkey) AS wau_exact
                 FROM cov GROUP BY 1),
         dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1)
         SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
                CAST(w.wau_exact AS BIGINT) AS wau_exact,
                TRUE AS wau_hll_ok
         FROM dau d JOIN wau w ON d.day = w.day
         ORDER BY d.day""",

    "open_lines_backlog" ->
      """WITH l AS (
           SELECT o.o_orderdate AS od, li.l_shipdate AS sd
           FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
         d AS (
           SELECT CAST(CAST(od AS DATE) - DATE '1992-01-01' AS BIGINT) AS day,
                  1 AS delta
           FROM l
           UNION ALL
           SELECT CAST(CAST(sd AS DATE) - DATE '1992-01-01' AS BIGINT), -1 FROM l),
         g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM d GROUP BY 1)
         SELECT day, net,
                CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS open_lines
         FROM g ORDER BY day""",

    "order_ship_latency_stats" ->
      """WITH f AS (
           SELECT li.l_returnflag,
                  CAST(CAST(li.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                       AS BIGINT) AS gap
           FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
         h AS (SELECT l_returnflag, gap, count(*) AS c FROM f GROUP BY 1, 2),
         k AS (
           SELECT l_returnflag, gap, c,
                  sum(c) OVER (PARTITION BY l_returnflag ORDER BY gap) AS cum,
                  sum(c) OVER (PARTITION BY l_returnflag) AS n
           FROM h)
         SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_lines,
                CAST(min(gap) AS BIGINT) AS min_days,
                CAST(max(gap) AS BIGINT) AS max_days,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS BIGINT)
                  AS p50_days,
                CAST(min(CASE WHEN cum * 10 >= n * 9 THEN gap END) AS BIGINT)
                  AS p90_days,
                CAST(sum(gap * c) // max(n) AS BIGINT) AS mean_days_floor
         FROM k GROUP BY 1 ORDER BY 1""",

    "revenue_concentration_topk" ->
      """WITH p AS (
           SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
           FROM lineitem GROUP BY 1),
         r AS (
           SELECT rev,
                  row_number() OVER (ORDER BY rev DESC, l_partkey) AS rn,
                  sum(rev) OVER (ORDER BY rev DESC, l_partkey
                    ROWS UNBOUNDED PRECEDING) AS cum
           FROM p),
         tot AS (SELECT CAST(sum(rev) AS BIGINT) AS total_rev FROM p)
         SELECT CAST(rn AS BIGINT) AS k, CAST(cum AS BIGINT) AS topk_rev,
                total_rev,
                CAST(cum * 1000000 // total_rev AS BIGINT) AS share_ppm
         FROM r CROSS JOIN tot
         WHERE rn IN (1, 5, 10, 50, 100) ORDER BY k""",

    "dedup_time_windowed" ->
      """WITH base AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         corpus AS (
           SELECT * FROM base
           UNION ALL
           SELECT event_id + 1000000, user_id, event_type, t_us, cents FROM base),
         kept AS (
           SELECT user_id, event_type, cents, t_us // 3600000000 AS hour,
                  count(*) AS n_rows, min(event_id) AS keep_id
           FROM corpus GROUP BY 1, 2, 3, 4)
         SELECT event_type, count(*) AS n_kept,
                CAST(sum(n_rows) AS BIGINT) AS n_total,
                CAST((sum(n_rows) - count(*)) * 1000000 // sum(n_rows) AS BIGINT)
                  AS dropped_ppm
         FROM kept GROUP BY 1 ORDER BY 1""",

    "zorder_layout_stats" ->
      """WITH b AS (SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
         z AS (
           SELECT pk, sk,
                  CAST(list_sum([(((pk >> i) & 1) << (2*i)) + (((sk >> i) & 1) << (2*i+1))
                                 FOR i IN range(0, 31)]) AS BIGINT) AS z
           FROM b),
         ext AS (SELECT min(z) AS zmin, max(z) AS zmax FROM z)
         SELECT CAST((z - zmin) * 32 // (zmax - zmin + 1) + 1 AS BIGINT) AS chunk,
                count(*) AS n,
                min(pk) AS min_pk, max(pk) AS max_pk,
                min(sk) AS min_sk, max(sk) AS max_sk
         FROM z CROSS JOIN ext GROUP BY 1 ORDER BY 1""",

    "changelog_compaction" ->
      """WITH base AS (
           SELECT o_orderkey AS key, o_custkey AS cust,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
           FROM orders),
         log AS (
           SELECT key, cust, price_c, 0 AS seq, 'B' AS op FROM base
           UNION ALL
           SELECT key, cust, price_c + 1000, 1, 'U' FROM base WHERE key % 7 = 0
           UNION ALL
           SELECT key, cust, price_c, 2, 'D' FROM base WHERE key % 5 = 0
           UNION ALL
           SELECT key + 10000000, cust, price_c + 5, 1, 'I' FROM base WHERE key % 11 = 0),
         last AS (
           SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC, op) AS rn
           FROM log)
         SELECT key, cust, CAST(price_c AS BIGINT) AS price_c, op AS last_op
         FROM last WHERE rn = 1 AND op <> 'D' ORDER BY key""",

    "multimodal_payload_budget" ->
      """WITH d AS (
           SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           FROM documents),
         h AS (SELECT source, n_bytes, count(*) AS c FROM d GROUP BY 1, 2),
         k AS (
           SELECT source, n_bytes, c,
                  sum(c) OVER (PARTITION BY source ORDER BY n_bytes) AS cum,
                  sum(c) OVER (PARTITION BY source) AS n
           FROM h)
         SELECT source, CAST(max(n) AS BIGINT) AS n_items,
                CAST(sum(n_bytes * c) AS BIGINT) AS total_bytes,
                CAST(max(n_bytes) AS BIGINT) AS max_bytes,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN n_bytes END) AS BIGINT)
                  AS median_bytes,
                CAST((sum(n_bytes * c) + 134217727) // 134217728 AS BIGINT)
                  AS n_splits_128mb
         FROM k GROUP BY 1 ORDER BY 1""",

    "events_audience_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         p AS (
           SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_common
           FROM tu a JOIN tu b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2),
         tot AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1)
         SELECT ta, tb, CAST(n_common AS BIGINT) AS n_common,
                CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
                CAST(n_common * 1000000 // (na.n + nb.n - n_common) AS BIGINT)
                  AS jaccard_ppm
         FROM p JOIN tot na ON p.ta = na.event_type
                JOIN tot nb ON p.tb = nb.event_type
         ORDER BY ta, tb""",

    "dedup_paragraph_exact" ->
      s"""WITH corpus AS ($corpusSql),
         tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         nck AS (SELECT doc_id, w,
                  CASE WHEN len(w) <= 32 THEN 1
                       ELSE 1 + (len(w) - 32 + 31) // 32 END AS nc
                 FROM tok),
         ch AS (SELECT unnest([md5(array_to_string(w[i*32+1:i*32+32], ' '))
                              FOR i IN range(0, nc)]) AS ch
                FROM nck),
         mult AS (SELECT ch, count(*) AS n_copies FROM ch GROUP BY 1)
         SELECT CAST(n_copies AS BIGINT) AS n_copies,
                count(*) AS n_chunks
         FROM mult GROUP BY 1 ORDER BY 1""",

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

    "events_interarrival_median" ->
      """WITH e AS (
           SELECT event_type, event_id, epoch_us(ts) AS t_us,
                  epoch_us(ts) // 86400000000 AS day
           FROM events),
         gaps AS (
           SELECT event_type, day,
                  t_us - lag(t_us) OVER (PARTITION BY event_type, day
                    ORDER BY t_us, event_id) AS gap
           FROM e),
         h AS (SELECT event_type, day, gap, count(*) AS c
               FROM gaps WHERE gap IS NOT NULL GROUP BY 1, 2, 3),
         k AS (
           SELECT event_type, day, gap, c,
                  sum(c) OVER (PARTITION BY event_type, day ORDER BY gap) AS cum,
                  sum(c) OVER (PARTITION BY event_type, day) AS n
           FROM h)
         SELECT event_type, CAST(day AS BIGINT) AS day,
                CAST(max(n) AS BIGINT) AS n_gaps,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS BIGINT)
                  AS median_gap_us,
                CAST(max(gap) AS BIGINT) AS max_gap_us
         FROM k GROUP BY 1, 2 ORDER BY 1, 2""",

    "graph_degree_hist" ->
      """WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         edges AS (
           SELECT a.pk AS ea, b.pk AS eb
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING count(*) >= 2),
         nodes AS (SELECT ea AS node FROM edges
                   UNION ALL SELECT eb FROM edges),
         deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY 1)
         SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
         FROM deg GROUP BY 1 ORDER BY 1""",

    "events_hourly_baseline" ->
      """WITH e AS (
           SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hod,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         g AS (
           SELECT event_type, CAST(hod AS BIGINT) AS hod,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(cents) AS BIGINT) AS sum_cents
           FROM e GROUP BY 1, 2)
         SELECT event_type, hod, n_events, sum_cents,
                CAST(sum_cents // n_events AS BIGINT) AS avg_cents,
                CAST(n_events * 1000000 //
                  (sum(n_events) OVER (PARTITION BY event_type)) AS BIGINT) AS share_ppm
         FROM g ORDER BY event_type, hod""",

    "events_window_agg" ->
      """WITH e AS (
           SELECT event_type, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events)
         SELECT CAST(ts_us - (ts_us % 300000000) AS BIGINT) AS window_start_us, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(value_cents) AS BIGINT) AS value_cents
         FROM e GROUP BY 1, 2 ORDER BY window_start_us, event_type""",

    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         s0 AS (SELECT user_id, min(ts_us) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT e.user_id, min(e.ts_us) AS t_click FROM e
                JOIN s0 ON s0.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s0.t_view
                GROUP BY e.user_id),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t_purchase FROM e
                JOIN s1 ON s1.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s1.t_click
                GROUP BY e.user_id)
         SELECT s0.user_id, s0.t_view, s1.t_click, s2.t_purchase
         FROM s0 LEFT JOIN s1 ON s1.user_id = s0.user_id
         LEFT JOIN s2 ON s2.user_id = s0.user_id
         ORDER BY s0.user_id""",

    "events_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         s0 AS (SELECT user_id, min(ts_us) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT e.user_id, min(e.ts_us) AS t_click FROM e
                JOIN s0 ON s0.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts_us > s0.t_view
                  AND e.ts_us <= s0.t_view + 3600000000
                GROUP BY e.user_id),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t_purchase FROM e
                JOIN s1 ON s1.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts_us > s1.t_click
                  AND e.ts_us <= s1.t_click + 3600000000
                GROUP BY e.user_id)
         SELECT s0.user_id, s0.t_view, s1.t_click, s2.t_purchase
         FROM s0 LEFT JOIN s1 ON s1.user_id = s0.user_id
         LEFT JOIN s2 ON s2.user_id = s0.user_id
         ORDER BY s0.user_id""",

    "events_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id)
         SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
                CAST(date_diff('day', c.cohort, e.day) AS INT) AS day_n,
                count(DISTINCT e.user_id) AS n_users
         FROM e JOIN c ON c.user_id = e.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "data_row_diff" ->
      """WITH tgt AS (
           SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
           FROM orders WHERE o_orderkey % 97 <> 0
           UNION ALL
           SELECT o_orderkey + 50000000, o_orderstatus, o_totalprice, o_orderpriority
           FROM orders WHERE o_orderkey % 103 = 0),
         b AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders),
         j AS (
           SELECT coalesce(b.o_orderkey, t.o_orderkey) AS o_orderkey,
             CASE WHEN b.o_orderkey IS NULL THEN 'added'
                  WHEN t.o_orderkey IS NULL THEN 'removed'
                  WHEN b.o_orderstatus IS DISTINCT FROM t.o_orderstatus
                    OR b.o_totalprice IS DISTINCT FROM t.o_totalprice
                    OR b.o_orderpriority IS DISTINCT FROM t.o_orderpriority THEN 'changed'
                  ELSE 'same' END AS diff_status,
             CASE WHEN b.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL THEN
               array_to_string(list_filter([
                 CASE WHEN b.o_orderstatus IS DISTINCT FROM t.o_orderstatus THEN 'o_orderstatus' END,
                 CASE WHEN b.o_totalprice IS DISTINCT FROM t.o_totalprice THEN 'o_totalprice' END,
                 CASE WHEN b.o_orderpriority IS DISTINCT FROM t.o_orderpriority THEN 'o_orderpriority' END
               ], x -> x IS NOT NULL), ',')
             ELSE '' END AS changed_cols
           FROM b FULL OUTER JOIN tgt t ON b.o_orderkey = t.o_orderkey)
         SELECT o_orderkey, diff_status, changed_cols
         FROM j WHERE diff_status <> 'same' ORDER BY o_orderkey""",

    "asof_join_nearest" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                  CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events),
         c AS (SELECT * EXCLUDE (event_type) FROM e WHERE event_type = 'click'),
         v AS (SELECT * EXCLUDE (event_type) FROM e WHERE event_type = 'view'),
         j AS (
           SELECT c.event_id, c.user_id, c.ts_us, c.value_cents,
                  v.event_id AS nearest_event_id, v.ts_us AS nearest_ts_us,
                  v.value_cents AS nearest_value_cents,
                  row_number() OVER (PARTITION BY c.event_id
                    ORDER BY abs(v.ts_us - c.ts_us), v.ts_us, v.event_id) AS rn
           FROM c LEFT JOIN v ON c.user_id = v.user_id)
         SELECT event_id, user_id, ts_us, value_cents,
                nearest_event_id, nearest_ts_us, nearest_value_cents
         FROM j WHERE rn = 1 ORDER BY event_id""",

    "asof_join" -> asofJoinOracle,

    // native-operator twin: identical semantics, identical oracle
    "asof_join_native" -> asofJoinOracle,

    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",

    "cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag, l_linestatus""",

    "corpus_clean_pipeline" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  array_to_string(w[1:greatest(len(w)-2, 1)], ' ')
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           UNION ALL
           SELECT doc_id + 2000000, text FROM documents),
         q AS (
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
         sh AS (
           SELECT doc_id,
             [array_to_string(w[i+1:i+3], ' ') FOR i IN range(0, greatest(len(w)-2, 0))] AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM ek)),
         mh AS (SELECT doc_id, sh,
                ${bandSql(0)} AS s0, ${bandSql(3)} AS s1,
                ${bandSql(6)} AS s2, ${bandSql(9)} AS s3 FROM sh),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
           FROM mh a JOIN mh b
             ON a.doc_id < b.doc_id
            AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3)),
         losers AS (
           SELECT DISTINCT b_id AS doc_id FROM (
             SELECT a_id, b_id, $jaccardSql AS jaccard FROM cand)
           WHERE jaccard >= 0.5)
         SELECT e.doc_id, e.quality_score
         FROM ek e LEFT JOIN losers l ON e.doc_id = l.doc_id
         WHERE l.doc_id IS NULL
         ORDER BY e.doc_id""",

    "events_props_extract" ->
      """SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",

    "events_top_paths" ->
      """WITH r AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         p AS (
           SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
           FROM r WHERE rn <= 5 GROUP BY user_id)
         SELECT path, count(*) AS n_users FROM p GROUP BY path
         ORDER BY n_users DESC, path LIMIT 20""",

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

    "intersect_distinct" ->
      """SELECT custkey FROM (
           SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
         ORDER BY custkey""",
  )

  val oracles: Map[String, String] = oraclesBase
}
