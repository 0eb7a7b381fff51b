package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.Multimodal

/** Streaming media ingestion — the perceptual-dedup twin of
  * [[Sessionize.nearDupIngest]] for IMAGE payloads: each micro-batch of
  * (doc_id, payload) rows is dHashed with the real decoder, collapsed
  * against itself, probed against a PERSISTED hash index of everything
  * already ingested (band equi-join + full-Hamming verify — never
  * batch×corpus all-pairs), and the survivors' (id, hash) rows are
  * appended to the gold table and the index.
  *
  * The index stores 8-byte hashes only — payload bytes never leave the
  * batch's scan stage, so index probe cost is independent of image
  * sizes. At warehouse scale the index is a bucketed table on the band
  * key (see [[graft.ext.Scale.writeBucketed]]); the per-batch marker
  * protocol makes retried batches idempotent, same as nearDupIngest.
  *
  * Idempotence under partial commits: foreachBatch is at-least-once
  * and the sink does TWO non-atomic appends (gold, then index). A
  * fully-committed batch replays as a marker no-op; a batch that
  * crashed between the appends (or after both, before the marker)
  * self-heals on retry because each append anti-joins the ids already
  * present in its target table — exactly the missing suffix lands,
  * never a duplicate row. Gold stays FIRST so a doc is indexed only
  * after it is durably in gold (the reverse order could drop a future
  * duplicate of a doc that never landed).
  */
object MediaIngest {

  private def readCommitted(dir: String)(
      implicit spark: SparkSession): Option[DataFrame] =
    IngestCommit.readCommitted(spark, dir)

  def phashIngest(
      media: DataFrame, // (doc_id LONG, payload BINARY)
      outDir: String,
      indexDir: String,
      checkpoint: String,
      maxHamming: Int = 6,
      bands: Option[Int] = None)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import spark.implicits._
        val batchKey = IngestCommit.contentKey(batch.toDF())
        if (!IngestCommit.isCommitted(spark, indexDir, batchId, batchKey)) {
          val hashes = batch.select(col("doc_id"), col("payload"))
            .as[(Long, Array[Byte])]
            .mapPartitions(_.map { case (id, bytes) =>
              (id, Multimodal.dhashFromBytes(id, bytes))
            })
            .toDF("id", "hash")
            .persist()
          // Band width through the re-banding POLICY (round-9,
          // [[Multimodal.phashAutoBands]]): the persisted INDEX is the
          // side that saturates as the library grows, so it decides;
          // before any index exists the batch's own hashes do. A fixed
          // `bands` arg pins the width (the pre-policy behavior, kept
          // for the width-sensitivity specs).
          val dataDir = s"$indexDir/hashes"
          val persistedIdx = readCommitted(dataDir)
          val chosenBands = bands.getOrElse(
            Multimodal.phashAutoBands(persistedIdx.getOrElse(hashes))._1)
          // (1) in-batch collapse: the higher id of every near-pair drops
          val inBatchDrop = Multimodal
            .hammingPairs(Multimodal.bandedHashes(hashes, chosenBands), maxHamming)
            .select(col("id_b").as("id")).distinct()
          val kept = hashes.join(inBatchDrop, Seq("id"), "left_anti")
          // (2) probe the persisted index: band equi-join, Hamming verify
          val fresh = persistedIdx match {
            case Some(persisted) =>
              // ONLY the persisted side is bucket-capped (the
              // pairsWithinBuckets skew guard): that side grows with
              // the corpus, so an uncapped hot band bucket expands
              // unboundedly; the batch side is bounded by the
              // micro-batch itself, and capping it would silently skip
              // dedup candidates for in-batch docs past the cap —
              // weakening the streaming-vs-batch prefix-parity
              // contract for no scale benefit
              val idx = graft.ext.Dedup.capBuckets(
                  Multimodal.bandedHashes(persisted, chosenBands),
                  Seq("band_idx", "band"), "id")
                .select(col("band_idx"), col("band"), col("hash").as("i_hash"))
              val hit = Multimodal.bandedHashes(kept, chosenBands)
                .join(idx, Seq("band_idx", "band"))
                .filter(expr(s"bit_count(hash ^ i_hash) <= $maxHamming"))
                .select(col("id")).distinct()
              kept.join(hit, Seq("id"), "left_anti")
            case None => kept
          }
          // (3) append survivors to gold and index, then commit the
          // batch. Each append anti-joins the ids already in its
          // target so replaying a partially-committed batch writes
          // exactly the missing suffix (idempotence note above).
          def notAlreadyIn(frame: DataFrame, dir: String): DataFrame =
            readCommitted(dir) match {
              case Some(existing) =>
                frame.join(existing.select("id").distinct(), Seq("id"), "left_anti")
              case None => frame
            }
          val surv = fresh.persist()
          notAlreadyIn(surv, outDir).write.mode("append").parquet(outDir)
          notAlreadyIn(surv, dataDir).write.mode("append").parquet(dataDir)
          surv.unpersist()
          hashes.unpersist()
          IngestCommit.mark(spark, indexDir, batchId, batchKey)
          ()
        }
      }
      .start()
}
