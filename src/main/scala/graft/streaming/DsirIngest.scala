package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ext.TrainPrep

/** Admission-time DSIR selection — the DEPLOYMENT mode of the
  * weights → selection program: a model trained offline
  * ([[TrainPrep.dsirWeights]]' bucket log-ratios) and a threshold
  * chosen offline ([[TrainPrep.dsirSelect]]'s order statistic) are
  * FROZEN, and every arriving document is scored and admitted (or not)
  * at ingest, before it ever lands in the corpus. This is the third
  * leg of the DSIR tier: [[DsirMonitor]] watches the stream's
  * distribution drift against the target; this ingest ACTS on the
  * trained model per document.
  *
  * Contract (spec-pinned): the admitted gold set after any number of
  * batches equals `dsirScore(allSoFar, model).filter(logw > threshold)`
  * — scoring shares [[TrainPrep.dsirScore]]'s expressions with the
  * batch path, and the frozen model makes admission decisions
  * PREFIX-STABLE: a document's verdict never changes when later
  * batches arrive (unlike the monitor's evolving view — deliberately).
  * A token bucket absent from the frozen model scores 0 (the
  * documented pass-through for out-of-training-distribution features).
  *
  * Replay safety: the [[IngestCommit]] append protocol — batch marker
  * as the fast-path no-op, anti-join against committed gold so an
  * unmarked replay re-lands only what is missing and can never
  * duplicate admitted rows.
  *
  * Scale shape: the B-row model is collected ONCE at start and
  * broadcast per batch; each batch pays one map-side probe + one
  * doc-keyed partial aggregation + one append. Nothing corpus-sized
  * shuffles; the persisted gold is only read for the replay anti-join.
  */
object DsirIngest {

  def dsirIngest(
      docs: DataFrame,
      model: DataFrame,
      threshold: Long,
      outDir: String,
      checkpoint: String,
      buckets: Int = 256)(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // freeze the model NOW: B rows to the driver, re-materialized per
    // batch — the deployed artifact, immune to upstream mutation
    val frozen = model.select(col("bucket"), col("logratio_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val goldDir = s"$outDir/gold"
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchKey = IngestCommit.contentKey(batch.toDF())
        if (!IngestCommit.isCommitted(spark, outDir, batchId, batchKey)) {
          val m = frozen.toDF("bucket", "logratio_micro")
          val admitted = TrainPrep.dsirScore(batch.toDF(), m, buckets)
            .filter(col("logw_micro") > threshold)
          val fresh = IngestCommit.readCommitted(spark, goldDir) match {
            case Some(g) =>
              admitted.join(g.select(col("doc_id")), Seq("doc_id"), "left_anti")
            case None => admitted
          }
          // EAGER truncation before the append: fresh's plan READS
          // goldDir (the replay anti-join) while the append WRITES it —
          // that only works because file listing happens at plan time,
          // and read-your-own-write-path is fragile across Spark
          // versions and file-index caching (the advisor's round-13
          // note; AssembleIngest hit the cached-plan variant of this
          // for real). Materializing pins the rows with no file
          // relation left in the plan, decoupling read from write.
          graft.ext.Checkpoints.truncate(fresh)
            .write.mode("append").parquet(goldDir)
          IngestCommit.mark(spark, outDir, batchId, batchKey)
        }
        ()
      }
      .start()
  }
}
