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
  def clean(
      docs: DataFrame,
      minQuality: Double = 0.3,
      jaccard: Double = 0.5): DataFrame = {
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
    val gated = Scale.widen(docs).withColumn("quality_score", quality)
      .filter(col("quality_score") >= minQuality)

    // exact dedup: survivor = min doc_id per content hash. Persisted:
    // it feeds BOTH the LSH stage and the final anti-join — without it
    // the quality gate + dedup window re-run per branch (at cluster
    // scale this materialization is a storage checkpoint).
    val exactKept = gated
      .withColumn("text_hash", md5(col("text")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("text_hash", "keep_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near-dup prune: drop the higher id of each verified LSH pair.
    // Round 9: routed through the re-banding policy — the candidate
    // budget is measured on the (4,3) index before any pair expands,
    // and a saturating corpus regroups the same 12 minhash rows to
    // (2,6) instead of paying the quadratic bucket join.
    val nearDupLosers = Dedup.minhashLshAuto(
      exactKept.select("doc_id", "text"), threshold = jaccard)
      .select(col("b_id").as("doc_id")).distinct()

    exactKept.join(nearDupLosers, Seq("doc_id"), "left_anti")
  }
}
