package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The INCREMENTAL twin of the batch capstone
  * [[graft.ext.CorpusClean.assemble]]: a streaming ingest that
  * maintains the clean survivor corpus (quality gate → exact dedup →
  * near-dup prune, each micro-batch checked against a PERSISTED
  * corpus index), plus a finishing pass that runs the batch capstone's
  * own stages 2–4 (survivor-trained bigram-LM scoring, histogram-form
  * tercile banding, deterministic shards) over the maintained gold
  * table.
  *
  * Dataflow per micro-batch (composed from the
  * [[Sessionize.nearDupIngest]] re-bandable index):
  *
  *   1. quality gate — [[graft.ext.CorpusClean.qualityScored]], the
  *      IDENTICAL per-row derivation the batch pipeline applies
  *      (order-independent: a pure projection+filter);
  *   2. exact dedup — min doc_id per md5(text) WITHIN the batch, then
  *      an anti-join against the persisted `xh` hash index (hash-only:
  *      the corpus text is never rescanned);
  *   3. near-dup prune — in-batch collapse (lowest id of each verified
  *      pair wins) at the banding shape the re-banding policy picks on
  *      the PERSISTED matrix index, then a probe of that index: band
  *      equi-join, exact-Jaccard verify against stored shingle sets;
  *   4. idempotent appends — survivors (doc_id, text, quality_score)
  *      to the gold table; their shingles, minhash matrices, and text
  *      hashes to the three index tables.
  *
  * Batch-equals-streaming contract (spec-pinned): when documents
  * arrive in doc_id order and the corpus has no near-dup CHAINS
  * (a∼b∼c with a≁c), the streaming gold table equals
  * [[graft.ext.CorpusClean.clean]]'s survivor set, and
  * [[finishAssembly]] over it equals the batch [[graft.ext.CorpusClean.assemble]]
  * row for row. On a chain the two semantics legitimately differ:
  * the batch pipeline drops the higher id of EVERY verified pair
  * (pair-loser semantics — c drops via b∼c even though b itself
  * dropped), while the ingest keeps any doc that near-dups no
  * PREVIOUSLY KEPT doc (survivor-vs-survivor semantics — the only
  * definition available online, since dropped docs are never
  * indexed). Both are standard; the divergence class is documented
  * here and exercised in the spec.
  *
  * Idempotence: same mechanism as [[Sessionize.nearDupIngest]] — a
  * fully-committed batch leaves `indexDir/_committed/<batchId>_<contentKey>` and
  * replays as a no-op; a partial commit self-heals because every
  * append anti-joins the doc_ids already in its target, so exactly
  * the missing suffix lands on retry. Gold stays FIRST so a doc is
  * indexed only after it is durably in gold.
  */
object AssembleIngest {

  /** @param dsirModel when set, the SELECTION stage of the batch
    *   capstone variant [[graft.ext.CorpusClean.assembleSelected]]
    *   composed into the ingest: the (bucket, logratio_micro) model is
    *   FROZEN at stream start ([[DsirIngest]]'s deployment convention)
    *   and each micro-batch's clean survivors are admitted to GOLD
    *   only when their frozen-model score exceeds `dsirThreshold`.
    *   The dedup INDEXES still ingest every clean survivor — exactly
    *   mirroring the batch order clean → dedup → select: a document
    *   the selector drops must still knock out its later near-dups.
    */
  def assembleIngest(
      docs: DataFrame, outDir: String, indexDir: String, checkpoint: String,
      minQuality: Double = 0.3, k: Int = 3, threshold: Double = 0.5,
      rowsPerBand: Option[Int] = None,
      dsirModel: Option[DataFrame] = None, dsirThreshold: Long = 0L,
      dsirBuckets: Int = 256)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery = {
    // freeze the selection model NOW — B rows on the driver,
    // re-materialized per batch; admission verdicts stay prefix-stable
    val frozenDsir = dsirModel.map(_.select(col("bucket"), col("logratio_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.ext.TextPrimitives._
        // register on the MICRO-BATCH's cloned session too — its
        // function registry does not inherit outer registrations
        graft.functions.GraftFunctions.register(batch.sparkSession)
        graft.functions.GraftFunctions.register(spark)
        val mhDir = s"$indexDir/mh"
        val shDir = s"$indexDir/sh"
        val xhDir = s"$indexDir/xh"
        val batchKey = IngestCommit.contentKey(batch.toDF())
        if (!IngestCommit.isCommitted(spark, indexDir, batchId, batchKey)) {
          def readCommitted(dir: String): Option[DataFrame] =
            IngestCommit.readCommitted(spark, dir)

          // (1) quality gate — the batch pipeline's own stage
          val gated = graft.ext.CorpusClean
            .qualityScored(batch.toDF(), minQuality)
            .select(col("doc_id"), col("text"), col("quality_score"))

          // (2) exact dedup: min id per content hash within the batch,
          // then hash-only anti-join against everything already kept
          val exactKept = gated
            .withColumn("text_hash", md5(col("text")))
            .withColumn("_keep", min("doc_id").over(
              org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
            .filter(col("doc_id") === col("_keep"))
            .drop("_keep")
          val exactNew = readCommitted(xhDir) match {
            case Some(xh) => exactKept.join(
              xh.select(col("text_hash")).distinct(), Seq("text_hash"), "left_anti")
            case None => exactKept
          }

          // (3) near-dup: shingles + raw minhash matrix once; shape
          // from the re-banding policy measured on the PERSISTED index
          // (the side that saturates); the batch's own matrix decides
          // before any index exists
          val sh0 = exactNew
            .withColumn("sh", shingles(tokens(col("text")), k))
            .withColumn("shh", shingleHashes(col("sh")))
            .withColumn("mh", graft.ext.Dedup.minhashMatrix(col("shh")))
            .persist()
          val persistedMh = readCommitted(mhDir)
          val chosenRows = rowsPerBand.getOrElse(
            graft.ext.Dedup.minhashAutoRows(
              persistedMh.getOrElse(sh0.select(col("doc_id"), col("mh"))))._1)
          val inBatchDrop = graft.ext.Dedup
            .pairsFromBandSigs(
              graft.ext.Dedup.bandSigsFromMatrix(sh0, chosenRows), sh0, threshold)
            .select(col("b_id").as("doc_id")).distinct()
          val kept = sh0.join(inBatchDrop, Seq("doc_id"), "left_anti")
          val dupIds = persistedMh match {
            case Some(persisted) =>
              // ONLY the persisted side is bucket-capped (the
              // pairsWithinBuckets skew guard): that side grows with
              // the corpus, so an uncapped hot band bucket expands
              // unboundedly; the batch side is bounded by the
              // micro-batch itself, and capping it would silently skip
              // candidates for in-batch docs past the cap — weakening
              // the streaming-vs-batch prefix-parity contract for no
              // scale benefit
              val cand = graft.ext.Dedup.capBuckets(
                  graft.ext.Dedup.bandSigsFromMatrix(persisted, chosenRows),
                  Seq("band_id", "sig"), "doc_id")
                .withColumnRenamed("doc_id", "old_id")
                .join(graft.ext.Dedup.bandSigsFromMatrix(kept, chosenRows)
                  .withColumnRenamed("doc_id", "new_id"),
                  Seq("band_id", "sig"))
                .select(col("old_id"), col("new_id")).distinct()
              cand
                .join(spark.read.parquet(shDir)
                  .select(col("doc_id").as("old_id"), col("sh").as("a_sh")), Seq("old_id"))
                .join(kept.select(col("doc_id").as("new_id"), col("sh").as("b_sh")), Seq("new_id"))
                .filter(graft.functions.GraftFunctions
                  .jaccardNative(col("a_sh"), col("b_sh")) >= threshold)
                .select(col("new_id").as("doc_id")).distinct()
            case None => kept.select(col("doc_id")).limit(0)
          }

          // (4) idempotent appends — gold first (see scaladoc note)
          def notAlreadyIn(frame: DataFrame, dir: String): DataFrame =
            IngestCommit.readCommitted(spark, dir) match {
              case Some(existing) => frame.join(
                existing.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
              case None => frame
            }
          // EAGER lineage truncation, not persist: surv's plan reads
          // the index paths (shDir/mhDir via the probe), and every
          // parquet append triggers refreshByPath, which RE-EXECUTES
          // any cached plan reading that path — a cached surv would be
          // recomputed against the just-updated index after the mh
          // append, find each new doc duplicating ITSELF (jaccard 1.0),
          // and recache as empty, silently starving the later appends.
          // Truncation pins the rows with no file-relation left in the
          // plan, so the self-invalidation cannot trigger.
          val surv = graft.ext.Checkpoints.truncate(
            kept.join(dupIds, Seq("doc_id"), "left_anti"))
          // frozen-model DSIR admission gates GOLD only (indexes below
          // keep every clean survivor — the batch pipeline's dedup also
          // sees selection-dropped docs)
          val goldRows = frozenDsir match {
            case Some(m) =>
              import spark.implicits._
              val verdict = graft.ext.TrainPrep
                .dsirScore(surv.select(col("doc_id"), col("text")),
                  m.toDF("bucket", "logratio_micro"), dsirBuckets)
                .filter(col("logw_micro") > dsirThreshold)
                .select(col("doc_id"))
              surv.join(verdict, Seq("doc_id"))
            case None => surv
          }
          notAlreadyIn(goldRows.select("doc_id", "text", "quality_score"), outDir)
            .write.mode("append").parquet(outDir)
          notAlreadyIn(surv.select("doc_id", "sh"), shDir)
            .write.mode("append").parquet(shDir)
          notAlreadyIn(surv.select("doc_id", "mh"), mhDir)
            .write.mode("append").parquet(mhDir)
          notAlreadyIn(surv.select("doc_id", "text_hash"), xhDir)
            .write.mode("append").parquet(xhDir)
          sh0.unpersist()
          IngestCommit.mark(spark, indexDir, batchId, batchKey)
        }
        ()
      }
      .start()
  }

  /** The finishing pass over the maintained gold table — stages 2–4 of
    * the batch capstone, run through [[graft.ext.CorpusClean.finish]]
    * itself (not a re-implementation): survivor-trained LM, tercile
    * bands, shards. Call after ingest (or on any schedule — it reads
    * only the gold table).
    */
  def finishAssembly(spark: SparkSession, goldDir: String, nShards: Int = 8): DataFrame =
    graft.ext.CorpusClean.finish(spark.read.parquet(goldDir), nShards)
}
