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
  * append sinks' anti-joins), so state is committed like a version
  * log, never updated in place:
  *
  *   - batch `b` writes its merged state to the fresh per-batch path
  *     `stateDir/v/<b>` (its own staging — overwrite there can only
  *     clobber a crashed attempt of the SAME uncommitted batch);
  *   - the marker `stateDir/_committed/<b>` is created AFTER the
  *     state and report writes — the single atomic commit point;
  *   - a replay of a marked batch is a no-op; a replay of an UNMARKED
  *     batch rebuilds from the LAST COMMITTED version, never from a
  *     possibly-already-merged uncommitted write — the double-count
  *     window of the in-place design is structurally gone, as is its
  *     lose-everything window (`mode(overwrite)` on the live state
  *     deleted the accumulated sums before rewriting them);
  *   - superseded version dirs are GC'd only after the new marker
  *     lands, so the newest marker's state dir always exists (a crash
  *     between marker and GC just leaves one extra tiny dir for the
  *     next commit to collect). Markers are kept forever — they are
  *     the replay no-op record.
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
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val committedDir = new org.apache.hadoop.fs.Path(s"$stateDir/_committed")
        val marker = new org.apache.hadoop.fs.Path(s"$stateDir/_committed/$batchId")
        if (!fs.exists(marker)) {
          val part = Similarity.perDimStats(batch.toDF(), "new")
            .as[(Int, Long, Long)].collect()
          // last COMMITTED version only — an unmarked v/<id> dir is a
          // crashed attempt (possibly fully merged) and must be ignored
          val committed: Seq[Long] =
            if (fs.exists(committedDir))
              fs.listStatus(committedDir).toSeq.map(_.getPath.getName.toLong)
            else Seq.empty
          val prev: Seq[(Int, Long, Long)] = committed.sorted.lastOption match {
            case Some(v) => spark.read.parquet(s"$stateDir/v/$v")
              .as[(Int, Long, Long)].collect().toSeq
            case None => Seq.empty
          }
          val merged = (prev ++ part).groupBy(_._1).toSeq
            .map { case (d, xs) => (d, xs.map(_._2).sum, xs.map(_._3).sum) }
            .sortBy(_._1)
          // lineage-free local frames -> the writes cannot collide
          // with any plan reading these paths
          merged.toDF("dim", "n_new", "sum_new")
            .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v/$batchId")
          Similarity.driftFromPerDim(
              base.toDF("dim", "n_old", "sum_old"),
              merged.toDF("dim", "n_new", "sum_new"))
            .coalesce(1).write.mode("overwrite").parquet(reportDir)
          fs.mkdirs(marker) // the atomic commit point
          committed.foreach(v => // GC superseded versions, markers stay
            fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v/$v"), true))
        }
        ()
      }
      .start()
  }
}
