package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ext.TrainPrep

/** Streaming twin of [[graft.ext.TrainPrep.dsirWeights]]' MODEL — the
  * DSIR target-vs-raw bucket log-ratio table maintained continuously
  * over a document ingest: "is the stream drifting away from the
  * target distribution, and which feature buckets carry the drift?"
  *
  * Per micro-batch: the batch collapses to its B-bucket count
  * distribution ([[TrainPrep.dsirCounts]] — the same aggregate the
  * batch path runs), which MERGES into the running raw distribution by
  * element-wise addition (counts are mergeable for the same reason
  * every sufficient statistic here is), and the log-ratio model of the
  * ACCUMULATED corpus is rewritten through
  * [[TrainPrep.dsirModelFrom]] — the batch operator's own finishing
  * expressions, so after any number of batches the report is
  * bit-identical to the one-shot model over everything ingested
  * (spec-pinned, including across a kill-and-restart). The TARGET
  * distribution is a fixed reference — collapsed ONCE at watch() to a
  * B-length driver array, never recomputed per batch.
  *
  * State is one dense B-length count vector — driver model state —
  * committed through the [[VersionedModelState]] protocol (per-batch
  * version paths + marker; a replay of an unmarked batch rebuilds from
  * the last committed version, so at-least-once re-merges can neither
  * double-count nor lose counts). Merging uses `Math.addExact`: a
  * count overflow after ~9e18 tokens must throw, not wrap (the
  * GramMatrix convention).
  */
object DsirMonitor {

  def watch(
      stream: DataFrame,
      target: DataFrame,
      stateDir: String,
      reportDir: String,
      checkpoint: String,
      buckets: Int = 256)(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // the fixed reference distribution: B rows, computed exactly once
    val tgtRows = TrainPrep.dsirCounts(target, buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!VersionedModelState.isCommitted(spark, stateDir, batchId)) {
          val part = new Array[Long](buckets)
          TrainPrep.dsirCounts(batch.toDF(), buckets).collect()
            .foreach(r => part(r.getLong(0).toInt) = r.getLong(1))
          val merged: Array[Long] =
            VersionedModelState.lastCommitted(spark, stateDir)
              .map { prevDf =>
                val prev = new Array[Long](buckets)
                prevDf.as[(Int, Long)].collect()
                  .foreach { case (i, v) => prev(i) = v }
                prev.lazyZip(part).map(Math.addExact(_, _)).toArray
              }
              .getOrElse(part)
          VersionedModelState.commit(spark, stateDir, batchId,
            merged.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("i", "v")) {
            val rawB = merged.zipWithIndex.collect {
              case (c, b) if c > 0 => (b.toLong, c)
            }.toSeq.toDF("bucket", "c_raw")
            val tgtB = tgtRows.toDF("bucket", "c_tgt")
            TrainPrep.dsirModelFrom(rawB, tgtB, buckets)
              .orderBy("bucket")
              .coalesce(1).write.mode("overwrite").parquet(reportDir)
          }
        }
        ()
      }
      .start()
  }
}
