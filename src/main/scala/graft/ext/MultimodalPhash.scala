package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The perceptual-hash tier of [[Multimodal]]: dHash LSH banding,
  * Hamming pair joins, the band-saturation monitor and the round-8
  * re-banding policy, batch/incremental near-dup detection, and the
  * cluster-representative emit step. Mixed into `object Multimodal`
  * (self-typed — the media record types and codec functions live
  * there), so call sites keep their `Multimodal.x` address.
  */
trait MultimodalPhash { this: Multimodal.type =>
  /** Perceptual near-dup pairs over library-decoded payloads: dHash
    * each raster ([[dhashFromImage]]) map-side, then the same
    * band-LSH + Hamming-verify join as [[phashNearDup]] — never
    * all-pairs; only 8-byte hashes leave the scan stage.
    */
  def phashNearDupDecoded(
      media: Dataset[BmpRecord],
      maxHamming: Int = 6,
      bands: Int = 4)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashes = media.mapPartitions(_.map(r => (r.doc_id, dhashFromImage(r.doc_id, r.payload))))
      .toDF("id", "hash")
    hammingPairs(bandedHashes(hashes, bands), maxHamming)
  }

  /** [[phashNearDupDecoded]] through the re-banding POLICY — the
    * library-decoder (PNG/JPEG via ImageIO) twin of
    * [[phashNearDupAuto]], so every pipeline consumer measures before
    * it expands. Hashes are eagerly checkpointed (the policy reads them
    * twice; re-decoding the image tier is the cost that would hurt).
    */
  def phashNearDupDecodedAuto(
      media: Dataset[BmpRecord],
      maxHamming: Int = 6,
      budgetFactor: Long = 8L)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashes = Checkpoints.truncate(
      media.mapPartitions(_.map(r => (r.doc_id, dhashFromImage(r.doc_id, r.payload))))
        .toDF("id", "hash"))
    phashNearDupAutoFromHashes(hashes, maxHamming, budgetFactor)
  }


  /** Perceptual-hash near-duplicate detection over REAL decoded
    * images: dHash each payload (map-only — the payload never
    * shuffles; only the 8-byte hash leaves the scan stage), then pair
    * images by LSH banding on the hash (`bands` contiguous bit slices;
    * two images within Hamming distance `bands−1` of each other share
    * at least one band by pigeonhole — a one-pixel edit concentrates
    * its ≤4 grid cells in one band, so planted twins always collide)
    * and keep candidate pairs whose full 64-bit Hamming distance is at
    * most `maxHamming`.
    *
    * Scale shape: the band join is an equi-join on (band_idx, band
    * value) over 8-byte hashes — never all-pairs, identical to the
    * SimHash banding in [[Dedup.simhashPairs]]; candidate volume is
    * governed by band width (16 bits → 65536 buckets per band).
    */
  def phashNearDup(
      media: Dataset[BmpRecord],
      maxHamming: Int = 6,
      bands: Int = 4)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashes = media.mapPartitions(_.map(r => (r.doc_id, dhashFromBytes(r.doc_id, r.payload))))
      .toDF("id", "hash")
    hammingPairs(bandedHashes(hashes, bands), maxHamming)
  }

  /** Incremental perceptual dedup (batch form of
    * [[graft.streaming.MediaIngest.phashIngest]]'s probe): a new image
    * batch is matched against the EXISTING corpus only — one band
    * equi-join of batch hashes against the corpus hash index, full
    * Hamming verify, never corpus×corpus. The daily-landing shape; the
    * corpus side is the persistable 8-byte-per-image index.
    */
  def phashIncremental(
      corpus: Dataset[BmpRecord],
      batch: Dataset[BmpRecord],
      maxHamming: Int = 6,
      bands: Int = 4)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    def hashed(m: Dataset[BmpRecord]): DataFrame =
      m.mapPartitions(_.map(r => (r.doc_id, dhashFromBytes(r.doc_id, r.payload))))
        .toDF("id", "hash")
    phashIncrementalFromHashes(hashed(corpus), hashed(batch), maxHamming, bands)
  }


  /** The (id, hash) frame every phash operator keys on, materialized
    * once: payloads decode map-side, only 16 bytes/row survive. The
    * policy layer ([[phashNearDupAuto]]) reads it twice (monitor +
    * pair join), so it is eagerly checkpointed — decoding the image
    * tier twice is the cost that would actually hurt at 100 TB.
    */
  def phashHashes(media: Dataset[BmpRecord])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    Checkpoints.truncate(
      media.mapPartitions(_.map(r => (r.doc_id, dhashFromBytes(r.doc_id, r.payload))))
        .toDF("id", "hash"))
  }

  /** [[Dedup.simhashBandStats]] for the 64-bit perceptual dHash: per
    * band at the given banding config, bucket occupancy and the EXACT
    * candidate-pair budget the band join would expand
    * (`sum C(c,2)` over buckets). Band width is the knob: 4 bands →
    * 16-bit buckets (cheap, but round 6 measured 17× organic budget
    * saturation on low-entropy rasters), 2 bands → 32-bit buckets
    * (collision probability collapses). An nBands-row aggregate — the
    * monitor is free relative to one avoided pair expansion.
    */
  def phashBandStats(hashes: DataFrame, bands: Int): DataFrame =
    bandedHashes(hashes, bands)
      .groupBy(col("band_idx"), col("band")).agg(count(lit(1)).as("c"))
      .groupBy(col("band_idx"))
      .agg(sum(col("c")).as("n_imgs"),
        count(lit(1)).as("n_buckets"),
        max(col("c")).as("max_bucket"),
        sum(expr("c * (c - 1) div 2")).as("pair_budget"))

  /** The re-banding POLICY for image dedup — [[Dedup.simhashNearPairsAuto]]
    * applied to the perceptual tier (the round-6 monitor finally acts):
    * measure the 16-bit-band candidate budget FIRST, and when it is
    * super-linear in the image count (`pair_budget > budgetFactor ·
    * n_imgs` — the saturation signature of low-entropy rasters) re-band
    * the SAME 64-bit hashes to 32-bit buckets before any pair is
    * expanded. A one-pixel edit only perturbs grid bits gy∈{0,1},
    * gx∈{0,1} (bits 0,1,8,9 — all inside band 0 at either width), so
    * planted-twin recall is width-invariant while the budget collapses.
    * Decision evidence rides on the output (`band_bits`,
    * `pair_budget_16`, `n_imgs`) so a pipeline log records WHY.
    */
  def phashNearDupAuto(
      media: Dataset[BmpRecord],
      maxHamming: Int = 6,
      budgetFactor: Long = 8L)(implicit spark: SparkSession): DataFrame =
    phashNearDupAutoFromHashes(phashHashes(media), maxHamming, budgetFactor)

  /** The policy core over a pre-materialized (id, hash) frame —
    * [[phashNearDupAuto]] minus the decode stage, shared with callers
    * that already hold hashes (and with the policy specs, which pin
    * both decision directions on crafted hash corpora).
    */
  private[graft] def phashNearDupAutoFromHashes(
      hashes: DataFrame,
      maxHamming: Int = 6,
      budgetFactor: Long = 8L): DataFrame = {
    val (bands, budget, nImgs) = phashAutoBands(hashes, budgetFactor)
    hammingPairs(bandedHashes(hashes, bands), maxHamming)
      .withColumn("band_bits", lit(64 / bands))
      .withColumn("pair_budget_16", lit(budget))
      .withColumn("n_imgs", lit(nImgs))
  }

  /** The band-width DECISION shared by every phash policy consumer
    * (batch near-dup, the incremental probe, streaming ingest): measure
    * the 16-bit-band candidate budget of `hashes` (one 1-row aggregate
    * over 16-byte rows — the same eager driver-side gate class as the
    * SNR and simhash re-banding decisions), and return
    * `(bands, budget16, nImgs)` where bands = 2 (32-bit buckets) when
    * the budget is super-linear in the image count, else 4 (16-bit).
    */
  private[graft] def phashAutoBands(
      hashes: DataFrame,
      budgetFactor: Long = 8L): (Int, Long, Long) = {
    val stats = phashBandStats(hashes, 4)
      .agg(sum(col("pair_budget")).as("pair_budget"), max(col("n_imgs")).as("n_imgs"))
      .collect().head
    val budget = stats.getLong(0)
    val nImgs = stats.getLong(1)
    (if (budget > budgetFactor * nImgs) 2 else 4, budget, nImgs)
  }

  /** [[phashIncremental]] behind the re-banding policy: the CORPUS
    * index (the side that saturates as the library grows — the batch
    * is a day's landing) decides the band width for both sides of the
    * probe. Planted-twin recall is width-invariant (the one-pixel
    * perturbation footprint sits inside band 0 at either width — the
    * argument spec-pinned for [[phashNearDupAuto]]), so the policy
    * only caps the candidate budget. Decision evidence rides on the
    * output (`band_bits`, `pair_budget_16`, `n_imgs`).
    */
  def phashIncrementalAuto(
      corpus: Dataset[BmpRecord],
      batch: Dataset[BmpRecord],
      maxHamming: Int = 6,
      budgetFactor: Long = 8L)(implicit spark: SparkSession): DataFrame = {
    val corpusHashes = phashHashes(corpus)
    val (bands, budget, nImgs) = phashAutoBands(corpusHashes, budgetFactor)
    phashIncrementalFromHashes(corpusHashes, phashHashes(batch), maxHamming, bands)
      .withColumn("band_bits", lit(64 / bands))
      .withColumn("pair_budget_16", lit(budget))
      .withColumn("n_imgs", lit(nImgs))
  }

  /** The incremental probe core over pre-materialized (id, hash)
    * frames — [[phashIncremental]] minus the decode stage, shared with
    * the auto policy and the policy specs.
    */
  private[graft] def phashIncrementalFromHashes(
      corpusHashes: DataFrame,
      batchHashes: DataFrame,
      maxHamming: Int,
      bands: Int): DataFrame =
    bandedHashes(corpusHashes, bands)
      .select(col("band_idx"), col("band"), col("id").as("old_id"), col("hash").as("ho"))
      .join(bandedHashes(batchHashes, bands)
          .select(col("band_idx"), col("band"), col("id").as("new_id"), col("hash").as("hn")),
        Seq("band_idx", "band"))
      .select(col("old_id"), col("new_id"),
        expr("cast(bit_count(ho ^ hn) as int)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** Explode a (id, hash) frame into its LSH bands: one row per
    * contiguous `64/bands`-bit slice. The bucket key both the batch
    * pair join and the streaming index probe hash on.
    */
  private[graft] def bandedHashes(hashes: DataFrame, bands: Int): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    hashes.select(col("id"), col("hash"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(b AS band_idx, shiftright(hash, b * $width) & $mask AS band))")).as("bb"))
      .select(col("id"), col("hash"), col("bb.band_idx").as("band_idx"), col("bb.band").as("band"))
  }

  /** Band-bucketed Hamming pairs (id_a < id_b) from a banded frame.
    *
    * Both sides of the self-join ride through [[Dedup.capBuckets]]
    * (lowest `maxBucket` ids per (band_idx, band) bucket) — the same
    * skew guard every other LSH pair expansion applies: the re-banding
    * policy collapses the candidate budget for low-entropy corpora by
    * widening buckets, but a degenerate corpus of near-identical
    * images shares ONE bucket at ANY width, and without the cap its
    * pair count grows ∝ n² unbounded. With it, no bucket contributes
    * more than maxBucket² pairs (maxBucket·(maxBucket−1)/2 after the
    * id ordering). The cap's window rides the join's own hash
    * partitioning on the bucket key — no extra shuffle.
    */
  private[graft] def hammingPairs(
      banded: DataFrame, maxHamming: Int, maxBucket: Int = 10000): DataFrame = {
    val capped = graft.ext.Dedup.capBuckets(
      banded, Seq("band_idx", "band"), "id", maxBucket)
    capped.select(col("band_idx"), col("band"), col("id").as("id_a"), col("hash").as("ha"))
      .join(capped.select(col("band_idx"), col("band"), col("id").as("id_b"), col("hash").as("hb")),
        Seq("band_idx", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr("cast(bit_count(ha ^ hb) as int)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The image-dedup pipeline's final emit step: given the phash
    * cluster labels, keep the highest-RESOLUTION member of each
    * duplicate cluster (pixel count from the REAL decoded header; ties
    * → lowest id) — the image twin of the token-count rule in
    * [[graft.ext.Dedup.clusterRepresentatives]]. The pixel-count
    * projection is map-only over the payload scan; the pick is one
    * window over the |images|-row label frame.
    */
  def phashClusterRepresentatives(
      media: Dataset[BmpRecord],
      clusters: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val px = decodeBmpBatch(media).toDF()
      .select(col("doc_id"), (col("width").cast("long") * col("height")).as("n_pixels"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_pixels").desc, col("doc_id"))
    clusters.select(col("doc_id"), col("cluster_id"))
      .join(px, Seq("doc_id"))
      .withColumn("is_representative", row_number().over(w) === 1)
  }
}
