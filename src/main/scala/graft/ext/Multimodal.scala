package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as a per-partition batch
  * stage.
  *
  * The Spark-side architecture is the real thing: a typed
  * `Dataset[MediaRecord]` with the payload as a binary column, a
  * `mapPartitions` stage that processes records in fixed-size batches
  * (the shape a vectorized decoder — JNI image lib, ONNX runtime —
  * needs), and a typed feature output. The DECODER ITSELF IS A STUB:
  * this container has no image/audio libraries, so [[decodeStub]]
  * computes deterministic byte-level features (length, md5, a fake
  * "width/height" parsed from the payload) in place of pixel decoding.
  * Swap [[decodeStub]] for a real decoder; nothing else changes.
  *
  * Scale: payloads dominate bytes, so the layout rule is: NEVER shuffle
  * payload columns. Feature extraction is a map-only stage (no shuffle);
  * downstream joins/groupBys must operate on (id, features) projections
  * with the payload column pruned — parquet column pruning makes the
  * scan itself cheap when only metadata is touched.
  */
object Multimodal {

  /** One media object: payload + metadata the pipeline can route on. */
  case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      declared_w: Int,
      declared_h: Int)

  /** Extracted features (decoder output). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      content_md5: String,
      decoded_w: Int,
      decoded_h: Int)

  /** Build a MediaRecord dataset from the documents table, encoding the
    * text as the binary payload (a deterministic stand-in for image
    * bytes; real pipelines read payloads from parquet binary columns or
    * object-store URIs).
    */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (length(col("text")) % 640).cast("int").as("declared_w"),
      (length(col("text")) % 480).cast("int").as("declared_h"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic byte-level features standing in for a
    * real image/audio decode. Real implementation would hand each batch
    * to a native decoder; the batching, schema and partition flow are
    * production-shaped.
    */
  def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = r.payload.length.toLong,
        content_md5 = hex,
        decoded_w = r.declared_w,
        decoded_h = r.declared_h)
    }

  /** The decode stage: per-partition, batched (default 64 records per
    * decoder call — the unit a vectorized/native decoder amortizes its
    * setup over).
    */
  def extractFeatures(
      media: Dataset[MediaRecord],
      batchSize: Int = 64)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeStub(batch))
    }
  }

  /** End-to-end: documents → media records → batched stub decode →
    * features frame.
    */
  def featuresFromDocuments(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    extractFeatures(fromDocuments(docs)).toDF()

  /** STUB resize: declared dimensions are scaled and the payload
    * downsampled by byte-striding — standing in for a real pixel
    * resampler. Map-only (no shuffle), output payload strictly smaller:
    * the shape a thumbnailing stage has.
    */
  def resizeStub(
      media: Dataset[MediaRecord],
      scalePercent: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    require(scalePercent > 0 && scalePercent <= 100, "scalePercent must be in (0, 100]")
    media.mapPartitions(_.map { r =>
      val stride = math.max(1, 100 / scalePercent)
      r.copy(
        payload = r.payload.indices.collect { case i if i % stride == 0 => r.payload(i) }.toArray,
        declared_w = r.declared_w * scalePercent / 100,
        declared_h = r.declared_h * scalePercent / 100)
    })
  }

  /** One sampled "frame" of a media payload: the 1-record → N-frames
    * expansion shape (video frame sampling, audio chunking). */
  case class MediaFrame(
      doc_id: Long,
      frame_index: Int,
      frame_payload: Array[Byte])

  /** Frame sampling: explode each payload into `n` evenly spaced
    * chunks. STUB decode — chunks are byte slices standing in for
    * decoded frames — but the dataflow is the production one: a
    * flatMap-shaped mapPartitions (1 → N rows, no shuffle), frame
    * payloads never wider than one frame in memory, downstream
    * repartition ONLY on (doc_id, frame_index) projections.
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      n: Int)(implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    require(n > 0, "frame count must be positive")
    media.mapPartitions(_.flatMap { r =>
      val len = r.payload.length
      (0 until n).iterator.map { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        MediaFrame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    })
  }
}
