package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Assoc, Dedup, Events, GraphOps, Multimodal, Similarity, TextAnalysis}

/** Round-5 continuation registry: association mining, product
  * quantization, corpus-frequency text quality, perceptual-hash image
  * dedup, seasonal decomposition. Same contract as [[Queries]]: every
  * key has a DuckDB oracle re-deriving the identical result from the
  * same parquet tables (exact integer/ppm arithmetic throughout).
  */
object Queries5 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the SQL text entry point: the same declarative plan via
    // spark.sql over temp views (proves the parser-to-Catalyst path
    // yields the oracle-identical result)
    "sql_text_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
               cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) AS sum_price_c,
               cast(sum(cast(round(l_quantity) as bigint)) as bigint) AS sum_qty
               FROM lineitem_v GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")
    }),

    // malformed-data tolerance: try_cast over a semi-structured field
    // never throws — the per-type success/failure accounting a robust
    // ingest records instead of dying on the first bad record
    "malformed_tolerant_parse" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          expr("try_cast(get_json_object(props, '$.k') as bigint)").as("k"),
          expr("try_cast(get_json_object(props, '$.missing') as bigint)").as("m"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_k_ok"),
          sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("n_m_ok"),
          sum(coalesce(col("k"), lit(0L))).as("sum_k"))
        .orderBy("event_type")),

    // assortment drift: per-brand annual revenue share + signed YoY shift
    "brand_share_yoy" -> ((s, dir) =>
      Assoc.brandShareYoy(t(s, dir, "lineitem"), t(s, dir, "part"))
        .orderBy("p_brand", "yr")),

    // monthly returned-lines rate in exact ppm
    "lineitem_return_rate_monthly" -> ((s, dir) =>
      Assoc.returnRateByMonth(t(s, dir, "lineitem")).orderBy("ym")),

    // signed month-over-month growth with portable integer division
    "orders_mom_growth" -> ((s, dir) =>
      Assoc.momGrowth(t(s, dir, "orders")).orderBy("ym")),

    // the feature-store join: per-user flat aggregate ⋈ session rollup
    "user_feature_assembly" -> ((s, dir) =>
      Events.userFeatures(t(s, dir, "events")).orderBy("user_id")),

    // one-row graph fingerprint: degree-assortativity covariance parts
    "graph_degree_assortativity" -> ((s, dir) =>
      GraphOps.degreeAssortativity(Assoc.coOrderEdges(t(s, dir, "lineitem")))),

    // literal-copy embeddings removed by one hash shuffle (planted twins)
    "dedup_embedding_exact" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.embeddingExactDups(
          e.unionByName(e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))))
        .orderBy("keep_id")
    }),

    // blur screen from REAL pixels: horizontal gradient energy per image
    "multimodal_bmp_sharpness" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.bmpSharpness(Multimodal.bmpFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // friend-of-friend audience size on the co-purchase graph
    "graph_two_hop_reach" -> ((s, dir) =>
      GraphOps.twoHopReach(Assoc.coOrderEdges(t(s, dir, "lineitem")))
        .orderBy("node")),

    // lifecycle-order QC: per-rule violation counts over user journeys
    "events_sequence_conformance" -> ((s, dir) =>
      Events.sequenceConformance(t(s, dir, "events")).orderBy("rule")),

    // ANN index health: inverted-list sizes + coarse quantization error
    "ivf_cell_stats" -> ((s, dir) =>
      Similarity.ivfCellStats(t(s, dir, "embeddings")).orderBy("cell_id")),

    // rights screening: ownership-marker hits per source slice
    "text_license_screen" -> ((s, dir) =>
      TextAnalysis.licenseScreen(t(s, dir, "documents")).orderBy("source")),

    // user-grain event-type co-occurrence lift (attract/repel in ppm)
    "events_type_lift" -> ((s, dir) =>
      Assoc.eventTypeLift(t(s, dir, "events")).orderBy("type_a", "type_b")),

    // frequently-bought-together rules: support, both confidences, lift
    "basket_rules_confidence" -> ((s, dir) =>
      Assoc.basketRules(t(s, dir, "lineitem")).orderBy("part_a", "part_b")),

    // monthly revenue = trend + season + residual, exact integer kernels
    "orders_seasonality_decompose" -> ((s, dir) =>
      Assoc.seasonalityDecompose(t(s, dir, "orders")).orderBy("ym")),

    // CCNet-style corpus-frequency quality signal per document
    "text_rare_token_ratio" -> ((s, dir) =>
      TextAnalysis.rareTokenRatio(t(s, dir, "documents")).orderBy("doc_id")),

    // PQ code words + quantization error per vector (the IVF-PQ store);
    // codes ship CSV-serialized — the driver compare hashes scalars
    "embedding_pq_encode" -> ((s, dir) =>
      Similarity.pqEncode(t(s, dir, "embeddings"))
        .select(col("vec_id"), concat_ws(",", col("codes")).as("codes_csv"), col("sq_err"))
        .orderBy("vec_id")),

    // PQ asymmetric-distance top-k: exact queries vs coded corpus
    "knn_pq_adc" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqSearchAdc(e, e.filter(col("vec_id") < 10)).orderBy("q_id", "rank")
    }),

    // dHash near-dup over REAL decoded BMPs: planted one-pixel twins
    // must pair, unrelated images must not
    "multimodal_phash_neardup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.phashNearDup(
          Multimodal.bmpWithPerturbedTwins(t(s, dir, "documents")))
        .orderBy("id_a", "id_b")
    }),

    // image dedup end-to-end: phash pairs → connected components →
    // per-image cluster label (the same star-contraction CC as text)
    "multimodal_phash_clusters" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      // through the re-banding POLICY (round-9): recall is
      // width-invariant for the planted twins, so the cluster output
      // survives whichever width the measured budget picks; the select
      // drops the decision-evidence columns.
      val pairs = Multimodal.phashNearDupAuto(Multimodal.bmpWithPerturbedTwins(docs))
        .select(col("id_a").as("a_id"), col("id_b").as("b_id"))
      val ids = docs.select(col("doc_id"))
        .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id")))
      Dedup.dupClustersStar(ids, pairs).orderBy("doc_id")
    }),

    // link prediction: per-edge neighborhood Jaccard on the co-purchase graph
    "graph_neighbor_jaccard" -> ((s, dir) =>
      GraphOps.neighborJaccard(Assoc.coOrderEdges(t(s, dir, "lineitem")))
        .orderBy("a", "b")),

    // acquisition-cohort LTV curve: cumulative cents per user by age
    "events_cohort_ltv" -> ((s, dir) =>
      Events.cohortLtv(t(s, dir, "events")).orderBy("cohort", "age")),

    // real audio curation: silence-trim bounds over decoded PCM
    "multimodal_wav_silence_trim" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.wavSilenceTrim(
          Multimodal.wavFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // the full IVF-PQ index: coarse cells + residual codes + ADC probe
    "knn_ivfpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10)).orderBy("q_id", "rank")
    }),

    // Johnson-Lindenstrauss projection QC: top-k recall after a ±1
    // random projection to 16 dims (deterministic hash sign matrix)
    "knn_rp_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.randomProjectionRecall(e, e.filter(col("vec_id") < 16))
        .orderBy("q_id")
    }),

    // daily-landing image dedup: new batch probed against the corpus
    // hash index only — never corpus x corpus
    "multimodal_phash_incremental" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val all = Multimodal.bmpWithPerturbedTwins(docs)
      // the corpus index decides the probe's band width (round-9
      // policy routing); evidence columns dropped before the select
      Multimodal.phashIncrementalAuto(
          all.filter(col("doc_id") < 1000000L),
          all.filter(col("doc_id") >= 1000000L))
        .select(col("old_id"), col("new_id"), col("hamming"))
        .orderBy("old_id", "new_id")
    }),

    // Matryoshka truncation QC: top-k recall of half-width embeddings
    "knn_truncated_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.truncatedRecall(e, e.filter(col("vec_id") < 16), dims = 32)
        .orderBy("q_id")
    }),

    // covariance components of discount vs quantity in exact integers
    // (the correlation direction without any float accumulation)
    "discount_qty_covariance" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_discount") * 100).cast("long").as("d_pct"),
          round(col("l_quantity")).cast("long").as("qty"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("d_pct")).as("sum_d"),
          sum(col("qty")).as("sum_q"),
          sum(col("d_pct") * col("qty")).as("sum_dq"))
        .withColumn("cov_numer", expr("n * sum_dq - sum_d * sum_q"))
        .withColumn("cov_sign", signum(col("cov_numer")).cast("int"))
        .orderBy("l_returnflag")),

    // real audio downsample: decode → decimate ×2 → re-encode → decode
    "multimodal_wav_downsample" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.downsampleWavBatch(
          Multimodal.wavFromDocuments(t(s, dir, "documents")), factor = 2)
        .toDF()
        .orderBy("doc_id")
    }),

    // Gopher-style WITHIN-doc repetition: duplicate 4-gram occupancy
    // and the top gram's share, exact ppm
    "text_self_repetition" -> ((s, dir) =>
      TextAnalysis.selfRepetition(t(s, dir, "documents")).orderBy("doc_id")),

    // (embedding_knn_dist_outliers moved to ExtQueriesAnn in round 11:
    // its oracle is now two-branch gate-following and shares the
    // NN-descent CTE helpers that live on ExtHelpers)

    // Deequ-style constraint suite over the warehouse: PK/FK/domain/
    // null/freshness checks as one exact report frame
    "dq_expectations" -> ((s, dir) =>
      graft.ext.Profile.expectations(
          t(s, dir, "orders"), t(s, dir, "lineitem"), t(s, dir, "customer"),
          t(s, dir, "events"), t(s, dir, "documents"))
        .orderBy("check", "table_name")),

    // object-store ingestion: payloads staged as real .bmp FILES, read
    // back via the binaryFile source, decoded from the scanned bytes
    "binary_file_source_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val path = Multimodal.stagingDir(s, "bmpfiles")
      Multimodal.stageBmpFiles(t(s, dir, "documents"), path)
      Multimodal.decodeBmpFiles(path).orderBy("doc_id")
    }),

    // reproducibility artifact: per-shard counts + content checksums
    "dataset_shard_manifest" -> ((s, dir) =>
      graft.ext.TrainPrep.shardManifest(t(s, dir, "documents")).orderBy("shard")),

    // fabricated-numbers screen: leading-digit profile vs Benford ppm
    "events_benford_digits" -> ((s, dir) =>
      Events.benfordDigits(t(s, dir, "events")).orderBy("digit")),

    // two-consecutive-breaches alerting over the hourly anomaly cells
    "events_anomaly_debounce" -> ((s, dir) =>
      Events.anomalyDebounce(t(s, dir, "events"))
        .orderBy("event_type", "day", "hod")),

    // the first BPE training step: corpus adjacent char-pair counts
    "bpe_pair_counts" -> ((s, dir) =>
      TextAnalysis.bpePairCounts(t(s, dir, "documents")).orderBy("rank")),

    // per-dimension p99 |value| clip for int8 index calibration
    "embedding_clip_calibration" -> ((s, dir) =>
      Similarity.clipCalibration(t(s, dir, "embeddings")).orderBy("dim")),

    // the funnel dashboard table: per step, reach and conversion ppm
    "events_funnel_rates" -> ((s, dir) =>
      Events.funnelRates(t(s, dir, "events"), Seq("view", "click", "purchase"))
        .orderBy("step_index")),

    // integer simple-exponential-smoothing forecast over daily revenue
    "events_ses_forecast" -> ((s, dir) =>
      Events.sesForecast(t(s, dir, "events")).orderBy("day")),

    // mixture application: deterministic hash rejection-sampling toward
    // the temperature-mixing targets; per-slice audit row
    "dataset_weighted_sample" -> ((s, dir) =>
      graft.ext.TrainPrep.weightedSample(t(s, dir, "documents")).orderBy("lang")),

    // the compaction step the binaryFile docs promise: tiny objects →
    // one parquet table with a binary column → decode from the compacted
    // layout; stats must equal the file-scan and in-memory paths
    "binary_file_compaction" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val stage = Multimodal.stagingDir(s, "bmpfiles_c")
      val compacted = Multimodal.stagingDir(s, "bmpcompact")
      Multimodal.stageBmpFiles(t(s, dir, "documents"), stage)
      s.read.format("binaryFile").load(stage)
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1).cast("long").as("doc_id"),
          col("content").as("payload"))
        .repartition(4) // compact: many tiny objects -> few parquet files
        .write.mode("overwrite").parquet(compacted)
      s.read.parquet(compacted)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => Multimodal.decodeBmp(id, bytes) })
        .toDF()
        .orderBy("doc_id")
    }),

    // image-dedup final emit: highest-resolution member per phash
    // cluster survives (ties -> lowest id, so originals beat twins)
    "multimodal_phash_representatives" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val media = Multimodal.bmpWithPerturbedTwins(docs)
      // re-banding policy (round-9) — evidence columns dropped here
      val pairs = Multimodal.phashNearDupAuto(media)
        .select(col("id_a").as("a_id"), col("id_b").as("b_id"))
      val ids = docs.select(col("doc_id"))
        .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id")))
      Multimodal.phashClusterRepresentatives(media, Dedup.dupClustersStar(ids, pairs))
        .orderBy("doc_id")
    }),
  )

  /** Shared dHash CTE chain (formula-recomputed pixels → 9×8 luma grid
    * → 64-bit hash → 16-bit bands → band-bucket candidates) — the
    * independent re-derivation both phash keys build on.
    */
  private[graft] val phashCtes =
    """d AS (SELECT doc_id AS src,
                    CAST(8 + doc_id % 9 AS BIGINT) AS w,
                    CAST(4 + doc_id % 5 AS BIGINT) AS h
             FROM documents),
       ids AS (SELECT src, src AS id, 0 AS pert, w, h FROM d
               UNION ALL
               SELECT src, src + 1000000, 1, w, h FROM d),
       g AS (SELECT id, src, pert, w, h,
                    t.i // 9 AS gy, t.i % 9 AS gx
             FROM ids, range(72) t(i)),
       p AS (SELECT id, src, pert, gy, gx,
                    (gx * w) // 9 AS sx, (gy * h) // 8 AS sy, w
             FROM g),
       l AS (SELECT id, gy, gx,
               2126 * ((src * 2654435761 + (sy * w + sx) * 97 + 62) % 256)
             + 7152 * ((src * 2654435761 + (sy * w + sx) * 97 + 31) % 256)
             +  722 * (CASE WHEN pert = 1 AND sy * w + sx = 0
                            THEN (src * 2654435761 + 8) % 256
                            ELSE (src * 2654435761 + (sy * w + sx) * 97) % 256 END) AS luma
             FROM p),
       bits AS (SELECT a.id, a.gy, a.gx,
                       CASE WHEN a.luma > n.luma THEN 1 ELSE 0 END AS bit
                FROM l a JOIN l n ON n.id = a.id AND n.gy = a.gy AND n.gx = a.gx + 1
                WHERE a.gx < 8),
       hsh AS (SELECT id,
                 CAST(bit_or(CASE WHEN bit = 0 THEN 0
                                  WHEN gy * 8 + gx = 63 THEN (-9223372036854775807 - 1)
                                  ELSE (1::BIGINT << CAST(gy * 8 + gx AS INT)) END) AS BIGINT) AS hash
               FROM bits GROUP BY id),
       bands AS (SELECT id, hash, CAST(t.b AS INT) AS band_idx,
                        (hash >> CAST(t.b * 16 AS INT)) & 65535 AS band
                 FROM hsh, range(4) t(b)),
       cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b, x.hash AS ha, y.hash AS hb
                FROM bands x JOIN bands y
                  ON y.band_idx = x.band_idx AND y.band = x.band AND x.id < y.id)"""

  /** [[phashCtes]] plus the round-9 re-banding POLICY re-derivation:
    * the 16-bit candidate budget is measured in SQL exactly as
    * [[graft.ext.Multimodal.phashAutoBands]] measures it, and `acand`
    * generates candidates at the CHOSEN width (32-bit buckets when the
    * budget is super-linear in the image count). The pipeline oracles
    * (clusters / representatives / incremental) build on `acand`; the
    * fixed-width baseline key keeps `cand`.
    */
  private[graft] val phashAutoCtes =
    s"""$phashCtes,
       bands32a AS (SELECT id, hash, CAST(t.b AS INT) AS band_idx,
                           (hash >> CAST(t.b * 32 AS INT)) & 4294967295 AS band
                    FROM hsh, range(2) t(b)),
       bsat AS (SELECT (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT)
                        FROM (SELECT count(*) AS c FROM bands GROUP BY band_idx, band))
                     > 8 * (SELECT count(*) FROM hsh) AS sat),
       acand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b, x.hash AS ha, y.hash AS hb
                 FROM bands x JOIN bands y
                   ON y.band_idx = x.band_idx AND y.band = x.band AND x.id < y.id
                 WHERE NOT (SELECT sat FROM bsat)
                 UNION ALL
                 SELECT DISTINCT x.id, y.id, x.hash, y.hash
                 FROM bands32a x JOIN bands32a y
                   ON y.band_idx = x.band_idx AND y.band = x.band AND x.id < y.id
                 WHERE (SELECT sat FROM bsat))"""

  val oracles: Map[String, String] = Map(

    "brand_share_yoy" ->
      """WITH cells AS (
           SELECT p.p_brand, CAST(year(l.l_shipdate) AS INT) AS yr,
                  count(*) AS n_lines,
                  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS brand_cents
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           GROUP BY 1, 2),
         sh AS (SELECT *, CAST(brand_cents * 1000000 //
                  (sum(brand_cents) OVER (PARTITION BY yr)) AS BIGINT) AS share_ppm
                FROM cells),
         lg AS (SELECT *, lag(share_ppm) OVER (PARTITION BY p_brand ORDER BY yr) AS prev_share_ppm
                FROM sh)
         SELECT p_brand, yr, n_lines, brand_cents, share_ppm,
                CAST(prev_share_ppm AS BIGINT) AS prev_share_ppm,
                CAST(share_ppm - prev_share_ppm AS BIGINT) AS share_shift_ppm
         FROM lg ORDER BY p_brand, yr""",

    "lineitem_return_rate_monthly" ->
      """SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS INT) AS ym,
                count(*) AS n_lines,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS return_ppm
         FROM lineitem GROUP BY 1 ORDER BY ym""",

    "orders_mom_growth" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INT) AS ym,
                           count(*) AS n_orders,
                           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS month_cents
                    FROM orders GROUP BY 1),
         l AS (SELECT *, lag(month_cents) OVER (ORDER BY ym) AS prev_cents FROM m)
         SELECT ym, n_orders, month_cents,
                CAST(prev_cents AS BIGINT) AS prev_cents,
                CAST(month_cents - prev_cents AS BIGINT) AS delta_cents,
                CAST(CASE WHEN prev_cents IS NULL THEN NULL
                          ELSE sign(month_cents - prev_cents)
                               * (abs(month_cents - prev_cents) * 1000000 // prev_cents)
                     END AS BIGINT) AS growth_ppm
         FROM l ORDER BY ym""",

    "user_feature_assembly" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         base AS (SELECT user_id, count(*) AS n_events,
                         CAST(sum(cents) AS BIGINT) AS total_cents,
                         CAST(min(ts_us) // 86400000000 AS BIGINT) AS first_day,
                         CAST(max(ts_us) // 86400000000 AS BIGINT) AS last_day,
                         count(DISTINCT ts_us // 86400000000) AS n_active_days
                  FROM e GROUP BY 1),
         l AS (SELECT user_id, event_id, ts_us,
                      CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
                           WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                           ELSE 0 END AS is_new
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
               FROM l),
         sess AS (SELECT user_id, session_id, max(ts_us) - min(ts_us) AS dur
                  FROM s GROUP BY 1, 2),
         sa AS (SELECT user_id, count(*) AS n_sessions,
                       CAST(sum(dur) AS BIGINT) AS session_time_us
                FROM sess GROUP BY 1)
         SELECT base.user_id, base.n_events, base.total_cents, base.first_day,
                base.last_day, base.n_active_days, sa.n_sessions, sa.session_time_us,
                CAST(base.n_events * 1000000 // greatest(sa.n_sessions, 1) AS BIGINT) AS events_per_session_ppm
         FROM base LEFT JOIN sa USING (user_id) ORDER BY user_id""",

    "graph_degree_assortativity" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         e AS (SELECT a.pk AS ea, b.pk AS eb FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
               GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS (SELECT ea AS u, eb AS v FROM e UNION ALL SELECT eb, ea FROM e),
         deg AS (SELECT u, count(*) AS deg FROM und GROUP BY 1)
         SELECT count(*) AS n_endpoints,
                CAST(sum(du.deg) AS BIGINT) AS sum_du,
                CAST(sum(dv.deg) AS BIGINT) AS sum_dv,
                CAST(sum(du.deg * dv.deg) AS BIGINT) AS sum_dudv,
                CAST(count(*) * sum(du.deg * dv.deg) - sum(du.deg) * sum(dv.deg) AS BIGINT) AS cov_numer,
                (count(*) * sum(du.deg * dv.deg) - sum(du.deg) * sum(dv.deg)) > 0 AS assortative
         FROM und JOIN deg du ON du.u = und.u
                  JOIN deg dv ON dv.u = und.v""",

    "dedup_embedding_exact" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings
                    UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings),
         h AS (SELECT vec_id,
                      md5(array_to_string(
                        [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding], ',')) AS vec_hash
               FROM c)
         SELECT vec_hash, min(vec_id) AS keep_id, count(*) AS n_copies
         FROM h GROUP BY 1 ORDER BY keep_id""",

    "multimodal_bmp_sharpness" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8 + doc_id % 9 AS BIGINT) AS w,
                           CAST(4 + doc_id % 5 AS BIGINT) AS h
                    FROM documents),
         px AS (SELECT doc_id, w, h, t.i AS i,
                  2126 * ((doc_id * 2654435761 + t.i * 97 + 62) % 256)
                + 7152 * ((doc_id * 2654435761 + t.i * 97 + 31) % 256)
                +  722 * ((doc_id * 2654435761 + t.i * 97) % 256) AS luma
                FROM d, range(128) t(i) WHERE t.i < w * h),
         g AS (SELECT a.doc_id, a.w, a.h, abs(b.luma - a.luma) AS grad
               FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i + 1
               WHERE (a.i % a.w) < a.w - 1)
         SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                count(*) AS n_gradients,
                CAST(sum(grad) AS BIGINT) AS grad_sum,
                CAST(sum(grad) // count(*) AS BIGINT) AS grad_mean,
                CAST(max(grad) AS BIGINT) AS grad_max
         FROM g GROUP BY doc_id, w, h ORDER BY doc_id""",

    "graph_two_hop_reach" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         e AS (SELECT a.pk AS ea, b.pk AS eb FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
               GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS (SELECT ea AS u, eb AS v FROM e UNION ALL SELECT eb, ea FROM e),
         two AS (SELECT x.u, y.v FROM und x JOIN und y ON y.u = x.v WHERE x.u != y.v),
         allr AS (SELECT u, v FROM und UNION ALL SELECT u, v FROM two)
         SELECT u AS node, count(DISTINCT v) AS reach_2hop
         FROM allr GROUP BY 1 ORDER BY node""",

    "events_sequence_conformance" ->
      """WITH t AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
                  min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click,
                  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase,
                  min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup,
                  min(epoch_us(ts)) AS first_any
           FROM events GROUP BY user_id),
         n AS (SELECT count(*) AS n_users FROM t)
         SELECT 'click_before_first_view' AS rule,
                CAST((SELECT sum(CASE WHEN first_click IS NOT NULL AND first_view IS NOT NULL
                                       AND first_click < first_view THEN 1 ELSE 0 END) FROM t) AS BIGINT) AS n_violations,
                n_users,
                CAST((SELECT sum(CASE WHEN first_click IS NOT NULL AND first_view IS NOT NULL
                                       AND first_click < first_view THEN 1 ELSE 0 END) FROM t)
                     * 1000000 // n_users AS BIGINT) AS violation_ppm
         FROM n
         UNION ALL
         SELECT 'purchase_without_view',
                CAST((SELECT sum(CASE WHEN first_purchase IS NOT NULL AND first_view IS NULL
                                      THEN 1 ELSE 0 END) FROM t) AS BIGINT),
                n_users,
                CAST((SELECT sum(CASE WHEN first_purchase IS NOT NULL AND first_view IS NULL
                                      THEN 1 ELSE 0 END) FROM t) * 1000000 // n_users AS BIGINT)
         FROM n
         UNION ALL
         SELECT 'signup_not_first_event',
                CAST((SELECT sum(CASE WHEN first_signup IS NOT NULL AND first_signup > first_any
                                      THEN 1 ELSE 0 END) FROM t) AS BIGINT),
                n_users,
                CAST((SELECT sum(CASE WHEN first_signup IS NOT NULL AND first_signup > first_any
                                      THEN 1 ELSE 0 END) FROM t) * 1000000 // n_users AS BIGINT)
         FROM n
         ORDER BY rule""",

    "ivf_cell_stats" ->
      """WITH q AS (SELECT vec_id,
                           [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                    FROM embeddings),
         cent AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS cq FROM q WHERE vec_id < 8),
         ad AS (SELECT a.vec_id, c.cell_id,
                       CAST(list_sum(list_transform(range(1, 65),
                         i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS BIGINT) AS d2c
                FROM q a, cent c),
         asg AS (SELECT vec_id, cell_id, d2c FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2c, cell_id) AS rn
                  FROM ad) WHERE rn = 1)
         SELECT cell_id, count(*) AS n_members,
                CAST(sum(d2c) AS BIGINT) AS sum_d2c,
                CAST(max(d2c) AS BIGINT) AS max_d2c,
                CAST(sum(d2c) // count(*) AS BIGINT) AS mean_d2c
         FROM asg GROUP BY cell_id ORDER BY cell_id""",

    "text_license_screen" ->
      """WITH h AS (SELECT source,
                           CASE WHEN lower(text) LIKE '%copyright%' THEN 1 ELSE 0 END AS hc,
                           CASE WHEN lower(text) LIKE '%all rights reserved%' THEN 1 ELSE 0 END AS hr,
                           CASE WHEN lower(text) LIKE '%license%' THEN 1 ELSE 0 END AS hl
                    FROM documents)
         SELECT source, count(*) AS n_docs,
                CAST(sum(hc) AS BIGINT) AS n_copyright,
                CAST(sum(hr) AS BIGINT) AS n_rights_reserved,
                CAST(sum(hl) AS BIGINT) AS n_license,
                CAST(sum(greatest(hc, hr, hl)) AS BIGINT) AS n_flagged,
                CAST(sum(greatest(hc, hr, hl)) * 1000000 // count(*) AS BIGINT) AS flagged_ppm
         FROM h GROUP BY source ORDER BY source""",

    "sql_text_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "malformed_tolerant_parse" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_k_ok,
         CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_m_ok,
         CAST(sum(coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "events_type_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                      count(*) AS n_ab
               FROM ut a JOIN ut b
                 ON a.user_id = b.user_id AND a.event_type < b.event_type
               GROUP BY 1, 2),
         c AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
         t AS (SELECT count(DISTINCT user_id) AS n_total FROM ut)
         SELECT p.type_a, p.type_b, p.n_ab,
                ca.n AS n_a, cb.n AS n_b,
                CAST(p.n_ab * t.n_total * 1000000 // (ca.n * cb.n) AS BIGINT) AS lift_ppm
         FROM p JOIN c ca ON ca.event_type = p.type_a
                JOIN c cb ON cb.event_type = p.type_b, t
         ORDER BY type_a, type_b""",

    "basket_rules_confidence" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_ab
               FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
               GROUP BY 1, 2 HAVING count(*) >= 2),
         c AS (SELECT pk, count(*) AS n FROM op GROUP BY 1),
         t AS (SELECT count(DISTINCT ok) AS n_total FROM op)
         SELECT p.part_a, p.part_b, p.n_ab, ca.n AS n_a, cb.n AS n_b,
                CAST(p.n_ab * 1000000 // ca.n AS BIGINT) AS conf_ab_ppm,
                CAST(p.n_ab * 1000000 // cb.n AS BIGINT) AS conf_ba_ppm,
                CAST(p.n_ab * t.n_total * 1000000 // (ca.n * cb.n) AS BIGINT) AS lift_ppm
         FROM p JOIN c ca ON ca.pk = p.part_a
                JOIN c cb ON cb.pk = p.part_b, t
         ORDER BY part_a, part_b""",

    "orders_seasonality_decompose" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INT) AS ym,
                           CAST(month(o_orderdate) AS INT) AS moy,
                           count(*) AS n_orders,
                           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS month_cents
                    FROM orders GROUP BY 1, 2),
         w AS (SELECT *,
                 CAST(sum(month_cents) OVER (ORDER BY ym ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS w_sum,
                 count(*) OVER (ORDER BY ym ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS w_n
               FROM m),
         tr AS (SELECT ym, moy, n_orders, month_cents,
                       CASE WHEN w_n = 3 THEN w_sum // 3 END AS trend_cents
                FROM w),
         s AS (SELECT moy, CAST(sum(month_cents) // count(*) AS BIGINT) AS moy_mean FROM m GROUP BY 1),
         g AS (SELECT CAST(sum(month_cents) // count(*) AS BIGINT) AS g_mean FROM m)
         SELECT tr.ym, tr.moy, tr.n_orders, tr.month_cents,
                CAST(tr.trend_cents AS BIGINT) AS trend_cents,
                CAST(s.moy_mean * 1000000 // g.g_mean AS BIGINT) AS seasonal_ppm,
                CAST(tr.month_cents - tr.trend_cents AS BIGINT) AS residual_cents
         FROM tr JOIN s USING (moy), g ORDER BY ym""",

    "text_rare_token_ratio" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT tok, count(*) AS n_occ FROM tok GROUP BY 1)
         SELECT tok.doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN f.n_occ < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
                count(DISTINCT CASE WHEN f.n_occ < 3 THEN tok.tok END) AS n_rare_distinct,
                CAST(sum(CASE WHEN f.n_occ < 3 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS rare_ppm
         FROM tok JOIN f USING (tok)
         GROUP BY tok.doc_id ORDER BY doc_id""",

    "embedding_pq_encode" ->
      """WITH q AS (SELECT vec_id,
                           [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                    FROM embeddings),
         sub AS (SELECT vec_id, CAST(t.s AS INT) AS s,
                        q[t.s * 16 + 1 : t.s * 16 + 16] AS v
                 FROM q, range(4) t(s)),
         cb AS (SELECT CAST(vec_id AS INT) AS cid, s, v AS c FROM sub WHERE vec_id < 8),
         d AS (SELECT a.vec_id, a.s, b.cid,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
               FROM sub a JOIN cb b ON b.s = a.s),
         best AS (SELECT vec_id, s, cid, d2,
                         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
                  FROM d)
         SELECT vec_id, array_to_string(list(cid ORDER BY s), ',') AS codes_csv,
                CAST(sum(d2) AS BIGINT) AS sq_err
         FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""",

    "knn_pq_adc" ->
      """WITH q AS (SELECT vec_id,
                           [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                    FROM embeddings),
         sub AS (SELECT vec_id, CAST(t.s AS INT) AS s,
                        q[t.s * 16 + 1 : t.s * 16 + 16] AS v
                 FROM q, range(4) t(s)),
         cb AS (SELECT CAST(vec_id AS INT) AS cid, s, v AS c FROM sub WHERE vec_id < 8),
         d AS (SELECT a.vec_id, a.s, b.cid,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
               FROM sub a JOIN cb b ON b.s = a.s),
         best AS (SELECT vec_id, s, cid, d2,
                         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
                  FROM d),
         codes AS (SELECT vec_id AS n_id, s, cid FROM best WHERE rn = 1),
         adc AS (SELECT d.vec_id AS q_id, codes.n_id, CAST(sum(d.d2) AS BIGINT) AS adc_d2
                 FROM codes JOIN d ON d.s = codes.s AND d.cid = codes.cid
                 WHERE d.vec_id < 10 AND d.vec_id != codes.n_id
                 GROUP BY 1, 2),
         r AS (SELECT q_id, n_id, adc_d2,
                      CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS INT) AS rank
               FROM adc)
         SELECT q_id, n_id, adc_d2, rank FROM r WHERE rank <= 5
         ORDER BY q_id, rank""",

    "multimodal_phash_neardup" ->
      s"""WITH $phashCtes
         SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(ha, hb)) <= 6
         ORDER BY id_a, id_b""",

    "multimodal_phash_clusters" ->
      s"""WITH RECURSIVE $phashAutoCtes,
         pr AS (SELECT id_a, id_b FROM acand WHERE bit_count(xor(ha, hb)) <= 6),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                   UNION ALL SELECT id_b, id_a FROM pr),
         r AS (SELECT id AS node, id AS m FROM ids
               UNION
               SELECT e.dst AS node, r.m FROM r JOIN edges e ON e.src = r.node),
         clusters AS (SELECT node AS doc_id, min(m) AS cluster_id FROM r GROUP BY node)
         SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
         FROM clusters ORDER BY doc_id""",

    "graph_neighbor_jaccard" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         e AS (SELECT a.pk AS ea, b.pk AS eb FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
               GROUP BY 1, 2 HAVING count(*) >= 2),
         und AS (SELECT ea AS u, eb AS v FROM e UNION ALL SELECT eb, ea FROM e),
         deg AS (SELECT u, count(*) AS deg FROM und GROUP BY 1),
         cmn AS (SELECT x.u AS a, y.u AS b, count(*) AS n_common
                 FROM und x JOIN und y ON x.v = y.v AND x.u < y.u GROUP BY 1, 2)
         SELECT e.ea AS a, e.eb AS b,
                CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
                da.deg AS deg_a, db.deg AS deg_b,
                CAST(coalesce(c.n_common, 0) * 1000000
                     // (da.deg + db.deg - coalesce(c.n_common, 0)) AS BIGINT) AS jaccard_ppm
         FROM e LEFT JOIN cmn c ON c.a = e.ea AND c.b = e.eb
                JOIN deg da ON da.u = e.ea
                JOIN deg db ON db.u = e.eb
         ORDER BY a, b""",

    "events_cohort_ltv" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
         f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
         sz AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY 1),
         cell AS (SELECT f.cohort, e.day - f.cohort AS age,
                         count(DISTINCT e.user_id) AS n_active,
                         CAST(sum(e.cents) AS BIGINT) AS day_cents
                  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
         cum AS (SELECT *, CAST(sum(day_cents) OVER (
                    PARTITION BY cohort ORDER BY age
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
                 FROM cell)
         SELECT cum.cohort, cum.age, cum.n_active, cum.day_cents, cum.cum_cents,
                CAST(cum.cum_cents // sz.cohort_users AS BIGINT) AS ltv_cents_per_user,
                sz.cohort_users
         FROM cum JOIN sz USING (cohort) ORDER BY cohort, age""",

    "multimodal_wav_silence_trim" ->
      """WITH d AS (SELECT doc_id,
                           256 + doc_id % 512 AS n,
                           8000 + (doc_id % 4) * 4000 AS rate
                    FROM documents),
         s AS (SELECT doc_id, n, rate, t.i,
                      ((doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS v
               FROM d, range(768) t(i) WHERE t.i < n),
         b AS (SELECT doc_id, n, rate,
                      min(CASE WHEN abs(v) >= 8192 THEN i END) AS first_i,
                      max(CASE WHEN abs(v) >= 8192 THEN i END) AS last_i
               FROM s GROUP BY 1, 2, 3)
         SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
                CAST(coalesce(first_i, n) AS INT) AS lead_trim,
                CAST(CASE WHEN last_i IS NULL THEN 0 ELSE n - 1 - last_i END AS INT) AS trail_trim,
                CAST(CASE WHEN first_i IS NULL THEN 0 ELSE last_i - first_i + 1 END AS BIGINT) AS kept_samples,
                CAST(CASE WHEN first_i IS NULL THEN 0
                          ELSE (last_i - first_i + 1) * 1000 // rate END AS BIGINT) AS kept_ms
         FROM b ORDER BY doc_id""",

    "knn_ivfpq" ->
      """WITH q AS (SELECT vec_id,
                           [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                    FROM embeddings),
         cent AS (SELECT CAST(vec_id AS INT) AS cell_id, q AS cq FROM q WHERE vec_id < 8),
         ad AS (SELECT a.vec_id, a.q, c.cell_id, c.cq,
                       list_sum(list_transform(range(1, 65),
                         i -> (a.q[i] - c.cq[i]) * (a.q[i] - c.cq[i]))) AS d2c
                FROM q a, cent c),
         asg AS (SELECT vec_id, q, cell_id, cq FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2c, cell_id) AS rn
                  FROM ad) WHERE rn = 1),
         res AS (SELECT vec_id, cell_id,
                        list_transform(range(1, 65), i -> q[i] - cq[i]) AS r
                 FROM asg),
         sub AS (SELECT vec_id, cell_id, CAST(t.s AS INT) AS s,
                        r[t.s * 16 + 1 : t.s * 16 + 16] AS v
                 FROM res, range(4) t(s)),
         cb AS (SELECT CAST(vec_id AS INT) AS cid, s, v AS c FROM sub WHERE vec_id < 8),
         d AS (SELECT a.vec_id, a.cell_id, a.s, b.cid,
                      CAST(list_sum(list_transform(range(1, 17),
                        i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
               FROM sub a JOIN cb b ON b.s = a.s),
         codes AS (SELECT vec_id AS n_id, cell_id, s, cid FROM
                   (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
                    FROM d) WHERE rn = 1),
         probed AS (SELECT vec_id AS q_id, cell_id, cq, q FROM
                    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2c, cell_id) AS rn
                     FROM ad WHERE vec_id < 10) WHERE rn <= 2),
         qres AS (SELECT q_id, cell_id,
                         list_transform(range(1, 65), i -> q[i] - cq[i]) AS qr
                  FROM probed),
         qsub AS (SELECT q_id, cell_id, CAST(t.s AS INT) AS s,
                         qr[t.s * 16 + 1 : t.s * 16 + 16] AS v
                  FROM qres, range(4) t(s)),
         dtab AS (SELECT a.q_id, a.cell_id, a.s, b.cid,
                         CAST(list_sum(list_transform(range(1, 17),
                           i -> (a.v[i] - b.c[i]) * (a.v[i] - b.c[i]))) AS BIGINT) AS d2
                  FROM qsub a JOIN cb b ON b.s = a.s),
         adc AS (SELECT dtab.q_id, codes.n_id, CAST(sum(dtab.d2) AS BIGINT) AS adc_d2
                 FROM codes JOIN dtab ON dtab.cell_id = codes.cell_id
                                     AND dtab.s = codes.s AND dtab.cid = codes.cid
                 WHERE dtab.q_id != codes.n_id GROUP BY 1, 2),
         r AS (SELECT q_id, n_id, adc_d2,
                      CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS INT) AS rank
               FROM adc)
         SELECT q_id, n_id, adc_d2, rank FROM r WHERE rank <= 5
         ORDER BY q_id, rank""",

    "knn_rp_recall" -> {
      def cos(a: String, b: String) =
        s"""CAST(list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE)
            / (sqrt(CAST(list_sum([$a[i] * $a[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE))
               * sqrt(CAST(list_sum([$b[i] * $b[i] FOR i IN range(1, len($b) + 1)]) AS DOUBLE)))"""
      s"""WITH q AS (SELECT vec_id,
                            [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                     FROM embeddings),
         pj AS (SELECT vec_id, q,
                       [CAST(list_sum(list_transform(range(0, 64),
                          i -> CASE WHEN (i * 31 + j * 17) % 2 = 0 THEN q[i + 1]
                                    ELSE -q[i + 1] END)) AS BIGINT)
                        FOR j IN range(0, 16)] AS p
                FROM q),
         fsc AS (SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                        ${cos("qs.q", "c.q")} AS cosine
                 FROM pj c JOIN (SELECT * FROM pj WHERE vec_id < 16) qs
                   ON qs.vec_id <> c.vec_id),
         fr AS (SELECT q_id, n_id FROM
                (SELECT q_id, n_id,
                        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
                 FROM fsc) WHERE rnk <= 5),
         tsc AS (SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                        ${cos("qs.p", "c.p")} AS cosine
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

    // the probe's band width is decided by the CORPUS index side only
    // (id < 1e6 — the side that saturates as the library grows), so
    // the decision CTE here measures corpus bands, not the union
    "multimodal_phash_incremental" ->
      s"""WITH $phashCtes,
         isat AS (SELECT (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT)
                          FROM (SELECT count(*) AS c FROM bands
                                WHERE id < 1000000 GROUP BY band_idx, band))
                       > 8 * (SELECT count(*) FROM hsh WHERE id < 1000000) AS sat),
         bands32i AS (SELECT id, hash, CAST(t.b AS INT) AS band_idx,
                             (hash >> CAST(t.b * 32 AS INT)) & 4294967295 AS band
                      FROM hsh, range(2) t(b)),
         icand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b, x.hash AS ha, y.hash AS hb
                   FROM bands x JOIN bands y
                     ON y.band_idx = x.band_idx AND y.band = x.band
                   WHERE x.id < 1000000 AND y.id >= 1000000
                     AND NOT (SELECT sat FROM isat)
                   UNION ALL
                   SELECT DISTINCT x.id, y.id, x.hash, y.hash
                   FROM bands32i x JOIN bands32i y
                     ON y.band_idx = x.band_idx AND y.band = x.band
                   WHERE x.id < 1000000 AND y.id >= 1000000
                     AND (SELECT sat FROM isat))
         SELECT id_a AS old_id, id_b AS new_id,
                CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
         FROM icand
         WHERE bit_count(xor(ha, hb)) <= 6
         ORDER BY old_id, new_id""",

    "knn_truncated_recall" -> {
      def cos(a: String, b: String) =
        s"""CAST(list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE)
            / (sqrt(CAST(list_sum([$a[i] * $a[i] FOR i IN range(1, len($a) + 1)]) AS DOUBLE))
               * sqrt(CAST(list_sum([$b[i] * $b[i] FOR i IN range(1, len($b) + 1)]) AS DOUBLE)))"""
      s"""WITH q AS (SELECT vec_id,
                            [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q,
                            [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding[1:32]] AS qt
                     FROM embeddings),
         fsc AS (SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                        ${cos("qs.q", "c.q")} AS cosine
                 FROM q c JOIN (SELECT * FROM q WHERE vec_id < 16) qs
                   ON qs.vec_id <> c.vec_id),
         fr AS (SELECT q_id, n_id FROM
                (SELECT q_id, n_id,
                        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rnk
                 FROM fsc) WHERE rnk <= 5),
         tsc AS (SELECT qs.vec_id AS q_id, c.vec_id AS n_id,
                        ${cos("qs.qt", "c.qt")} AS cosine
                 FROM q c JOIN (SELECT * FROM q WHERE vec_id < 16) qs
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

    "discount_qty_covariance" ->
      """SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_d,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                    * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_dq,
           CAST(count(*) * sum(CAST(round(l_discount * 100) AS BIGINT)
                               * CAST(round(l_quantity) AS BIGINT))
                - sum(CAST(round(l_discount * 100) AS BIGINT))
                  * sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS cov_numer,
           CAST(sign(count(*) * sum(CAST(round(l_discount * 100) AS BIGINT)
                                    * CAST(round(l_quantity) AS BIGINT))
                     - sum(CAST(round(l_discount * 100) AS BIGINT))
                       * sum(CAST(round(l_quantity) AS BIGINT))) AS INT) AS cov_sign
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "multimodal_wav_downsample" ->
      """WITH d AS (SELECT doc_id,
                           256 + doc_id % 512 AS n,
                           8000 + (doc_id % 4) * 4000 AS rate
                    FROM documents),
         s AS (SELECT doc_id, n, rate, t.i,
                      ((doc_id * 2654435761 + (t.i * 2) * 40503) % 65536) - 32768 AS v
               FROM d, range(384) t(i) WHERE t.i * 2 < n)
         SELECT doc_id,
                CAST(min(rate) // 2 AS INT) AS sample_rate,
                CAST(count(*) AS BIGINT) AS n_samples,
                CAST(count(*) * 1000 // (min(rate) // 2) AS BIGINT) AS duration_ms,
                CAST(max(abs(v)) AS INT) AS peak_abs,
                CAST(sum(v * v) AS BIGINT) AS sum_sq
         FROM s GROUP BY doc_id ORDER BY doc_id""",

    "text_self_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id,
                       [array_to_string(w[i+1:i+4], ' ')
                        FOR i IN range(0, greatest(len(w) - 3, 0))] AS sh
                FROM t),
         g AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         pg AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                       count(*) AS n_distinct
                FROM pg GROUP BY 1),
         top AS (SELECT doc_id, c AS top_gram_n FROM
                 (SELECT doc_id, c,
                         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rn
                  FROM pg) WHERE rn = 1)
         SELECT d.doc_id,
                coalesce(pd.n_grams, 0) AS n_grams,
                coalesce(pd.n_distinct, 0) AS n_distinct,
                CAST(coalesce(top.top_gram_n, 0) AS BIGINT) AS top_gram_n,
                CAST(CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN 0
                          ELSE (pd.n_grams - pd.n_distinct) * 1000000 // pd.n_grams END AS BIGINT) AS dup_gram_ppm,
                CAST(CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN 0
                          ELSE top.top_gram_n * 1000000 // pd.n_grams END AS BIGINT) AS top_gram_ppm
         FROM documents d LEFT JOIN pd USING (doc_id) LEFT JOIN top USING (doc_id)
         ORDER BY doc_id""",

    "multimodal_phash_representatives" ->
      s"""WITH RECURSIVE $phashAutoCtes,
         pr AS (SELECT id_a, id_b FROM acand WHERE bit_count(xor(ha, hb)) <= 6),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                   UNION ALL SELECT id_b, id_a FROM pr),
         r AS (SELECT id AS node, id AS m FROM ids
               UNION
               SELECT e.dst AS node, r.m FROM r JOIN edges e ON e.src = r.node),
         clusters AS (SELECT node AS doc_id, min(m) AS cluster_id FROM r GROUP BY node),
         px AS (SELECT id AS doc_id, CAST(w * h AS BIGINT) AS n_pixels FROM ids),
         ranked AS (SELECT c.doc_id, c.cluster_id, px.n_pixels,
                           row_number() OVER (PARTITION BY c.cluster_id
                             ORDER BY px.n_pixels DESC, c.doc_id) AS rn
                    FROM clusters c JOIN px USING (doc_id))
         SELECT doc_id, cluster_id, n_pixels, rn = 1 AS is_representative
         FROM ranked ORDER BY doc_id""",

    "dq_expectations" -> {
      def row(check: String, table: String, observed: String, threshold: Long) =
        s"""SELECT '$check' AS "check", '$table' AS table_name,
              CAST(($observed) AS BIGINT) AS observed,
              CAST($threshold AS BIGINT) AS threshold,
              ($observed) <= $threshold AS passed"""
      Seq(
        row("pk_unique_violations", "orders",
          "SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)", 0),
        row("fk_orphans", "lineitem->orders",
          "SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)", 0),
        row("fk_orphans", "orders->customer",
          "SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)", 0),
        row("quantity_out_of_range", "lineitem",
          "SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50", 0),
        row("null_custkey", "orders",
          "SELECT count(*) FROM orders WHERE o_custkey IS NULL", 0),
        row("negative_value", "events",
          "SELECT count(*) FROM events WHERE value < 0", 0),
        row("empty_doc_ppm", "documents",
          "SELECT sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) * 1000000 // count(*) FROM documents", 50000),
        row("staleness_days", "lineitem",
          "SELECT 11688 - date_diff('day', DATE '1970-01-01', CAST(max(l_shipdate) AS DATE)) FROM lineitem", 365),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY \"check\", table_name")
    },

    "binary_file_source_decode" -> ExtQueries.oracles("multimodal_bmp_decode"),

    "binary_file_compaction" -> ExtQueries.oracles("multimodal_bmp_decode"),

    "dataset_shard_manifest" ->
      """WITH h AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                           list_reduce(
                             [CAST(ascii(ch) AS BIGINT) FOR ch IN
                               regexp_extract_all(md5('shuffle|' || CAST(doc_id AS VARCHAR)), '.')],
                             (a, b) -> (a * 31 + b) % 1000000007) AS sk
                    FROM documents)
         SELECT sk % 8 AS shard, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                CAST(sum(doc_id) AS BIGINT) AS id_checksum,
                CAST(sum(sk) % 1000000007 AS BIGINT) AS hash_checksum
         FROM h GROUP BY 1 ORDER BY shard""",

    "events_benford_digits" -> {
      val benfordCase = "CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938 " +
        "WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946 WHEN 7 THEN 57991 " +
        "WHEN 8 THEN 51152 WHEN 9 THEN 45757 END"
      s"""WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
                     WHERE CAST(round(value * 100) AS BIGINT) > 0),
         d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit FROM c),
         g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
         t AS (SELECT sum(n) AS tot FROM g)
         SELECT digit, g.n,
                CAST(g.n * 1000000 // t.tot AS BIGINT) AS observed_ppm,
                CAST($benfordCase AS BIGINT) AS benford_ppm,
                CAST(g.n * 1000000 // t.tot - ($benfordCase) AS BIGINT) AS delta_ppm
         FROM g, t ORDER BY digit"""
    },

    "events_anomaly_debounce" ->
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
           FROM cells GROUP BY 1, 2),
         a AS (
           SELECT c.event_type, c.day, c.hod, c.n,
                  CAST(base_total // n_days AS BIGINT) AS baseline_n,
                  CAST(c.n * n_days * 1000000 // base_total AS BIGINT) AS ratio_ppm,
                  (c.n * n_days * 100 > 150 * base_total) AS is_anomaly,
                  c.day * 24 + c.hod AS abs_hour
           FROM cells c JOIN base b ON c.event_type = b.event_type AND c.hod = b.hod),
         l AS (SELECT *, lag(is_anomaly) OVER w AS pa, lag(abs_hour) OVER w AS ph
               FROM a WINDOW w AS (PARTITION BY event_type ORDER BY abs_hour))
         SELECT event_type, day, hod, n, baseline_n, ratio_ppm, is_anomaly,
                (is_anomaly AND coalesce(pa AND ph = abs_hour - 1, FALSE)) AS is_alert
         FROM l ORDER BY event_type, day, hod""",

    "bpe_pair_counts" ->
      """WITH wds AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         p AS (SELECT substr(w, CAST(i AS INT), 1) AS a, substr(w, CAST(i AS INT) + 1, 1) AS b
               FROM (SELECT w, unnest(range(1, length(w))) AS i
                     FROM wds WHERE length(w) >= 2)),
         c AS (SELECT a, b, count(*) AS n_pairs FROM p GROUP BY 1, 2),
         r AS (SELECT CAST(row_number() OVER (ORDER BY n_pairs DESC, a, b) AS INT) AS rank,
                      a, b, n_pairs
               FROM c)
         SELECT rank, a, b, n_pairs FROM r WHERE rank <= 20 ORDER BY rank""",

    "embedding_clip_calibration" ->
      """WITH q AS (SELECT vec_id,
                           [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) FOR x IN embedding] AS q
                    FROM embeddings),
         v AS (SELECT CAST(t.i AS INT) AS dim, abs(q[CAST(t.i AS INT) + 1]) AS a
               FROM q, range(64) t(i)),
         c AS (SELECT dim, a, count(*) AS c FROM v GROUP BY 1, 2),
         wn AS (SELECT dim, a, c,
                       sum(c) OVER (PARTITION BY dim ORDER BY a ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(c) OVER (PARTITION BY dim) AS n_vals,
                       max(a) OVER (PARTITION BY dim) AS max_q
                FROM c),
         sel AS (SELECT dim, min(a) AS clip_q, min(n_vals) AS n_vals, min(max_q) AS max_q
                 FROM wn WHERE cum * 100 >= n_vals * 99 GROUP BY dim)
         SELECT dim, CAST(clip_q AS BIGINT) AS clip_q, CAST(n_vals AS BIGINT) AS n_vals,
                CAST(max_q AS BIGINT) AS max_q,
                CAST((max_q - clip_q) * 1000000 // greatest(max_q, 1) AS BIGINT) AS headroom_ppm
         FROM sel ORDER BY dim""",

    "events_funnel_rates" ->
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
                GROUP BY e.user_id),
         n AS (SELECT (SELECT count(*) FROM s0) AS n_view,
                      (SELECT count(*) FROM s1) AS n_click,
                      (SELECT count(*) FROM s2) AS n_purchase)
         SELECT 1 AS step_index, 'view' AS step, CAST(n_view AS BIGINT) AS n_users,
                CAST(n_view * 1000000 // greatest(n_view, 1) AS BIGINT) AS conv_from_prev_ppm,
                CAST(n_view * 1000000 // greatest(n_view, 1) AS BIGINT) AS conv_from_first_ppm
         FROM n
         UNION ALL
         SELECT 2, 'click', CAST(n_click AS BIGINT),
                CAST(n_click * 1000000 // greatest(n_view, 1) AS BIGINT),
                CAST(n_click * 1000000 // greatest(n_view, 1) AS BIGINT)
         FROM n
         UNION ALL
         SELECT 3, 'purchase', CAST(n_purchase AS BIGINT),
                CAST(n_purchase * 1000000 // greatest(n_click, 1) AS BIGINT),
                CAST(n_purchase * 1000000 // greatest(n_view, 1) AS BIGINT)
         FROM n
         ORDER BY step_index""",

    "events_ses_forecast" ->
      """WITH RECURSIVE d AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM events GROUP BY 1),
         o AS (SELECT day, cents, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn FROM d),
         r AS (SELECT rn, day, cents, cents AS level, cents AS forecast
               FROM o WHERE rn = 1
               UNION ALL
               SELECT o.rn, o.day, o.cents,
                      (o.cents + r.level) // 2, r.level
               FROM r JOIN o ON o.rn = r.rn + 1)
         SELECT day, cents, CAST(level AS BIGINT) AS level,
                CAST(forecast AS BIGINT) AS forecast,
                CAST(cents - forecast AS BIGINT) AS residual_cents
         FROM r ORDER BY day""",

    "dataset_weighted_sample" ->
      """WITH per AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS s
           FROM documents GROUP BY 1),
         w AS (SELECT lang, n_docs,
                      CAST(n_docs * 1000000 // (SELECT sum(n_docs) FROM per) AS BIGINT) AS raw_ppm,
                      CAST(s * 1000000 // (SELECT sum(s) FROM per) AS BIGINT) AS weight_ppm
               FROM per),
         a AS (SELECT *, weight_ppm * 1000000 // greatest(raw_ppm, 1) AS ratio FROM w),
         acc AS (SELECT lang, n_docs, weight_ppm, raw_ppm,
                        CAST(least(ratio * 1000000 // (SELECT max(ratio) FROM a), 1000000) AS BIGINT) AS accept_ppm
                 FROM a),
         h AS (SELECT doc_id, lang,
                      list_reduce(
                        [CAST(ascii(ch) AS BIGINT) FOR ch IN
                          regexp_extract_all(md5('wsample|' || CAST(doc_id AS VARCHAR)), '.')],
                        (x, y) -> (x * 31 + y) % 1000000007) % 1000000 AS u
               FROM documents)
         SELECT acc.lang, acc.n_docs, acc.weight_ppm, acc.raw_ppm, acc.accept_ppm,
                CAST(sum(CASE WHEN h.u < acc.accept_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM h JOIN acc USING (lang)
         GROUP BY acc.lang, acc.n_docs, acc.weight_ppm, acc.raw_ppm, acc.accept_ppm
         ORDER BY acc.lang""",
  )
}
