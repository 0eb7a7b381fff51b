package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ext.Similarity

/** Streaming twin of [[graft.ext.Similarity.embeddingDrift]] — the
  * "has my embedding distribution moved since the baseline" monitor an
  * ingest pipeline runs continuously instead of as a batch audit.
  *
  * Per micro-batch: the batch's per-dimension exact integer
  * (count, coordinate-sum) statistics are MERGED by addition into a
  * running state table (sums are mergeable — the same reason map-side
  * combine works, and the same duality the streaming skew monitor
  * pins), then the drift report of the ACCUMULATED corpus against the
  * fixed baseline snapshot is rewritten through
  * [[Similarity.driftFromPerDim]] — the batch operator's own finishing
  * expressions, so after any number of batches the report is
  * bit-identical to the one-shot `embeddingDrift(baseline, allSoFar)`.
  *
  * State is |dims| rows of integers — driver model state (the
  * k·dims class the registry audits), so the merge is a local fold and
  * the state write carries no file lineage: the overwrite can never
  * collide with a plan reading the same path (the refreshByPath
  * hazard AssembleIngest documents).
  *
  * Idempotence + crash atomicity: foreachBatch is at-least-once and a
  * MERGE is not self-healing (a re-merge double-counts, unlike the
  * append sinks' anti-joins), so state goes through the
  * [[VersionedModelState]] commit protocol — per-batch version paths,
  * marker as the atomic commit point, replays of unmarked batches
  * rebuild from the last COMMITTED version (see its scaladoc for the
  * full crash analysis).
  *
  * The report rewrite stays an in-place overwrite: it is derived
  * purely from committed state, so a torn report (crash mid-write) is
  * repaired by the replay that re-derives it.
  */
object EmbeddingDriftMonitor {

  def watch(
      stream: DataFrame,
      baseline: DataFrame,
      stateDir: String,
      reportDir: String,
      checkpoint: String)(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    // the fixed baseline side: |dims| integer rows, computed once
    val base = Similarity.perDimStats(baseline, "old")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!VersionedModelState.isCommitted(spark, stateDir, batchId)) {
          val part = Similarity.perDimStats(batch.toDF(), "new")
            .as[(Int, Long, Long)].collect()
          val prev: Seq[(Int, Long, Long)] =
            VersionedModelState.lastCommitted(spark, stateDir)
              .map(_.as[(Int, Long, Long)].collect().toSeq)
              .getOrElse(Seq.empty)
          val merged = (prev ++ part).groupBy(_._1).toSeq
            .map { case (d, xs) => (d, xs.map(_._2).sum, xs.map(_._3).sum) }
            .sortBy(_._1)
          // lineage-free local frames -> the writes cannot collide
          // with any plan reading these paths
          VersionedModelState.commit(spark, stateDir, batchId,
            merged.toDF("dim", "n_new", "sum_new")) {
            Similarity.driftFromPerDim(
                base.toDF("dim", "n_old", "sum_old"),
                merged.toDF("dim", "n_new", "sum_new"))
              .coalesce(1).write.mode("overwrite").parquet(reportDir)
          }
        }
        ()
      }
      .start()
  }
}
