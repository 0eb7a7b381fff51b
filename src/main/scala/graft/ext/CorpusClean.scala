package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextPrimitives._

/** The end-to-end training-corpus cleaning pipeline — the composition
  * the individual operators exist for:
  *
  *   1. quality gate   — drop documents under a quality threshold
  *                       ([[TextAnalysis.qualityScore]] components);
  *   2. exact dedup    — keep the minimum doc_id per identical text
  *                       ([[Dedup.exact]] semantics);
  *   3. near-dup prune — MinHash-LSH candidate pairs verified by
  *                       shingle Jaccard ([[Dedup.minhashLsh]]); the
  *                       HIGHER doc_id of each surviving pair is
  *                       dropped (deterministic canonical choice).
  *
  * Output: the surviving documents with a `drop_stage` audit column on
  * the dropped ones when `keepAudit` — a pipeline wants both the clean
  * corpus and the reasons.
  *
  * Scale: stage 1 is a shuffle-free projection; stage 2 shuffles the
  * surviving FULL rows once, keyed by content hash (unlike
  * [[Dedup.exact]]'s pairs-only shuffle, the pipeline must RETURN the
  * surviving documents — any formulation moves the text exactly once,
  * and the window form does it in that single shuffle); stage 3 is
  * the LSH bucket-join (SCALING.md). Stages compose lazily into one
  * Catalyst DAG — no intermediate materialization beyond the staged
  * persists.
  */
object CorpusClean {

  /** @param minQuality  quality_score cut (see TextAnalysis.qualityScore)
    * @param jaccard     near-dup verification threshold
    */
  /** Stage 1 alone — quality-scored, gated survivors. Factored out so
    * the streaming ingest twin
    * ([[graft.streaming.AssembleIngest.assembleIngest]]) applies the
    * IDENTICAL per-row derivation per micro-batch: batch-equals-
    * streaming holds by construction for this stage (it is a pure
    * projection+filter, order-independent).
    */
  private[graft] def qualityScored(docs: DataFrame, minQuality: Double): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin("the", "a", "of", "and", "in", "to", "is")))
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0)))
    val quality =
      least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4 +
        least(nStop.cast("double") / nTok.cast("double") * 5.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(nPunct.cast("double") / length(col("text")).cast("double") * 10.0,
          lit(1.0))) * 0.2
    // widen: everything downstream (quality regex, md5 dedup, LSH
    // shingling) is per-row CPU; a narrow scan must not serialize it.
    Scale.widen(docs).withColumn("quality_score", quality)
      .filter(col("quality_score") >= minQuality)
  }

  /** @param spanExciseWidth when set, stage 4: cross-document span
    *   EXCISION over the survivors ([[Dedup.spanExcise]] — Lee et al.
    *   span-grain dedup: the first occurrence corpus-wide of every
    *   duplicated `w`-token span is kept, every other occurrence is
    *   cut out of its document's text). The survivors' `text` becomes
    *   the cleaned stream and a `chars_removed` audit column rides
    *   along. Off by default: span excision EDITS documents rather
    *   than dropping them, so a pipeline opts in explicitly.
    */
  def clean(
      docs: DataFrame,
      minQuality: Double = 0.3,
      jaccard: Double = 0.5,
      spanExciseWidth: Option[Int] = None): DataFrame = {
    val gated = qualityScored(docs, minQuality)

    // exact dedup: survivor = min doc_id per content hash. Persisted:
    // it feeds BOTH the LSH stage and the final anti-join — without it
    // the quality gate + dedup window re-run per branch (at cluster
    // scale this materialization is a storage checkpoint).
    val exactKept = Checkpoints.truncateLazy(gated
      .withColumn("text_hash", md5(col("text")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("text_hash", "keep_id"))

    // near-dup prune: drop the higher id of each verified LSH pair.
    // Round 9: routed through the re-banding policy — the candidate
    // budget is measured on the (4,3) index before any pair expands,
    // and a saturating corpus regroups the same 12 minhash rows to
    // (2,6) instead of paying the quadratic bucket join.
    val nearDupLosers = Dedup.minhashLshAuto(
      exactKept.select("doc_id", "text"), threshold = jaccard)
      .select(col("b_id").as("doc_id")).distinct()

    val survivors = exactKept.join(nearDupLosers, Seq("doc_id"), "left_anti")
    spanExciseWidth match {
      case None => survivors
      case Some(w) =>
        // the excision pass reads only (doc_id, text); the survivor
        // frame's other columns re-attach by doc_id — one extra
        // survivor-keyed join, the corpus text still moves only once
        // through the excision reassembly
        survivors.drop("text").join(
          Dedup.spanExcise(survivors.select("doc_id", "text"), w)
            .select(col("doc_id"), col("text_clean").as("text"),
              col("chars_removed")),
          Seq("doc_id"))
    }
  }

  /** End-to-end training-mix assembly — the capstone composition:
    *
    *   1. [[clean]]            — quality gate, exact dedup,
    *                             policy-routed near-dup prune;
    *   2. LM-fluency scoring   — [[TextAnalysis.bigramLmScore]] trained
    *                             on the SURVIVORS (the mix should be
    *                             scored against what ships, not against
    *                             what was dropped);
    *   3. fluency banding      — survivors cut into three bands at the
    *                             exact n/3 and 2n/3 order statistics of
    *                             mean_p_ppm, read off the VALUE
    *                             HISTOGRAM: group the scores to
    *                             |distinct ppm values| rows,
    *                             distributed prefix sum
    *                             ([[Scale.chunkedCumSum]]), rank-k
    *                             value = min v with cum(v) ≥ k — a
    *                             1-row driver gate (the same
    *                             measure-then-act class as the skew /
    *                             re-banding policies). The first
    *                             formulation planned
    *                             `orderBy().limit(k)` with k = n/3 — a
    *                             TakeOrderedAndProject buffering a
    *                             third of the surviving corpus through
    *                             ONE task, with `k.toInt` overflowing
    *                             past 2³¹ docs; nothing
    *                             data-proportional reaches a single
    *                             task now;
    *   4. deterministic shards — `portableHash("shard|" + doc_id)`
    *                             (the dataset_shard_shuffle convention)
    *                             % nShards, position = rank within the
    *                             shard by (sort_key, doc_id).
    *
    * Every stage is scan/join/aggregate-shaped; the only total order is
    * per-shard (position) — the order-statistic lookups are histogram
    * aggregates, never a sort of document rows.
    */
  def assemble(docs: DataFrame, nShards: Int = 8): DataFrame =
    finish(Checkpoints.truncateLazy(clean(docs)), nShards)

  /** The capstone WITH the data-selection stage composed in — the
    * clean → dedup → SELECT → pack order a real training pipeline
    * runs: [[clean]]'s survivors are DSIR-scored against the curated
    * `target` slice ([[TrainPrep.dsirSelect]] — model trained on the
    * survivors themselves, threshold from the weight-histogram order
    * statistic, top `keepPpm` kept), and only the selected documents
    * flow into [[finish]] — so the fluency LM trains on, and the
    * tercile bands partition, exactly the mix that ships.
    *
    * Scale: [[clean]]'s cost + the DSIR pass (B-row broadcast model,
    * map-side scoring, histogram threshold — nothing corpus-sized on
    * the driver) + one survivor-keyed semi-join before the finishing
    * stages. The cleaned frame is truncated once and feeds both the
    * selection scoring and the final join — the corpus text still
    * moves through each stage exactly once.
    */
  def assembleSelected(
      docs: DataFrame,
      target: DataFrame,
      nShards: Int = 8,
      buckets: Int = 256,
      keepPpm: Long = 250000L): DataFrame = {
    val cleaned = Checkpoints.truncateLazy(clean(docs))
    val selected = TrainPrep.dsirSelect(
        cleaned.select(col("doc_id"), col("text")), target, buckets, keepPpm)
      .filter(col("kept")).select(col("doc_id"))
    finish(cleaned.join(selected, Seq("doc_id")), nShards)
  }

  /** Stages 2–4 alone — the FINISHING pass over an already-clean
    * survivor set (doc_id, text, ...): survivor-trained LM scoring,
    * histogram-form tercile banding, deterministic shard/position
    * assignment. Factored out of [[assemble]] so the streaming ingest
    * twin finishes its incrementally-maintained gold table through the
    * EXACT code path the batch capstone uses — batch-equals-streaming
    * for the finishing pass is structural, not re-proved.
    */
  def finish(cleaned: DataFrame, nShards: Int = 8): DataFrame = {
    val lm = TextAnalysis.bigramLmScore(cleaned.select("doc_id", "text"))
    // truncated: consumed by the threshold gate AND the final banding
    // projection — without it the LM-score join re-runs per consumer
    val scored = Checkpoints.truncateLazy(cleaned
      .join(lm.select(col("doc_id"), col("mean_p_ppm")), Seq("doc_id"), "left")
      .withColumn("mean_p_ppm", coalesce(col("mean_p_ppm"), lit(0L))))
    val hist = scored.groupBy(col("mean_p_ppm")).agg(count(lit(1)).as("c"))
      .withColumn("_g", lit(1))
    val gate = Scale.chunkedCumSum(hist, Seq("_g"), "mean_p_ppm", "c", "cum")
      .agg(max(col("cum_total")).as("n"),
        min(when(col("cum") >= expr("cum_total div 3"), col("mean_p_ppm"))).as("t1"),
        min(when(col("cum") >= expr("2 * cum_total div 3"), col("mean_p_ppm"))).as("t2"))
      .collect().head
    val n = if (gate.isNullAt(0)) 0L else gate.getLong(0)
    // rank k < 1 (fewer than 3 survivors, or an empty corpus) has no
    // k-th order statistic: the band predicate must then be vacuous,
    // exactly as the previous formulation's k<1 guard produced
    val t1 = if (n / 3 < 1) Long.MinValue else gate.getLong(1)
    val t2 = if (2 * n / 3 < 1) Long.MinValue else gate.getLong(2)
    scored
      .withColumn("fluency_band",
        when(col("mean_p_ppm") <= t1, 1)
          .when(col("mean_p_ppm") <= t2, 2).otherwise(3))
      .withColumn("sort_key",
        TrainPrep.portableHash(concat(lit("shard|"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("sort_key"), lit(nShards.toLong)))
      .withColumn("position", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("sort_key"), col("doc_id"))))
      .select(col("doc_id"), col("quality_score"), col("mean_p_ppm"),
        col("fluency_band"), col("shard"), col("position").cast("long").as("position"))
  }
}
