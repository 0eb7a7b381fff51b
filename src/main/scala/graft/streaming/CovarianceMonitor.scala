package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ext.Similarity

/** Streaming twin of [[graft.ext.Similarity.dimCovariance]] — the
  * feature-decorrelation audit maintained continuously over an
  * embedding ingest instead of as a batch pass.
  *
  * Per micro-batch: the batch folds into ONE packed Gram buffer
  * ([[graft.functions.GramMatrix]] — n, per-dim sums, upper-triangle
  * products), which MERGES into the running buffer by element-wise
  * addition (the aggregate was designed mergeable for exactly this
  * duality: partial buffers combine the same way across partitions,
  * batches, or days), and the top-k covariance report of the
  * ACCUMULATED corpus is rewritten through
  * [[Similarity.covFromGram]] — the batch operator's own finishing
  * arithmetic, so after any number of batches the report is
  * bit-identical to the one-shot `dimCovariance(allSoFar)`
  * (spec-pinned, including across a kill-and-restart).
  *
  * State is one `1 + d + d(d+1)/2`-long buffer — driver model state —
  * committed through the [[VersionedModelState]] protocol (per-batch
  * version paths + marker; a replay of an unmarked batch rebuilds from
  * the last committed version, so the at-least-once re-merge can never
  * double-count).
  */
object CovarianceMonitor {

  def watch(
      stream: DataFrame,
      stateDir: String,
      reportDir: String,
      checkpoint: String,
      topK: Int = 32)(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!VersionedModelState.isCommitted(spark, stateDir, batchId)) {
          val part = Similarity.gramPacked(batch.toDF())
          val prev: Seq[Long] =
            VersionedModelState.lastCommitted(spark, stateDir)
              .map(_.as[(Int, Long)].collect().sortBy(_._1).map(_._2).toSeq)
              .getOrElse(Seq.empty)
          val merged: Seq[Long] =
            if (prev.isEmpty) part
            else if (part.isEmpty) prev
            else {
              require(prev.length == part.length,
                s"gram buffers disagree: ${prev.length} vs ${part.length}")
              // addExact: the accumulated buffer grows without bound
              // across batches — a grid-contract violation must throw
              // here too, not wrap (same convention as GramMatrix)
              prev.lazyZip(part).map(Math.addExact(_, _))
            }
          VersionedModelState.commit(spark, stateDir, batchId,
            merged.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")) {
            Similarity.covFromGram(spark, merged, topK)
              .coalesce(1).write.mode("overwrite").parquet(reportDir)
          }
        }
        ()
      }
      .start()
  }
}
