package graft.ext

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (CC label propagation,
  * star contraction, k-core peeling, PageRank): every round REPLACES
  * its working frame, so plans must be cut or they grow by one
  * join-aggregate subtree per round.
  *
  * Two materialization modes, chosen per session:
  *
  *  - default: eager `localCheckpoint` — blocks live on executor
  *    local storage. Right for `local[...]` and short interactive
  *    runs; NOT fault-tolerant (a lost executor loses its blocks and
  *    the truncated lineage cannot recompute them — on a 100-node
  *    cluster one preemption would kill a 30-round job).
  *  - `spark.graft.checkpointDir` set: eager RELIABLE
  *    `Dataset.checkpoint` — blocks land on the shared FS
  *    (HDFS/S3/…), surviving executor loss. The session's
  *    SparkContext checkpoint dir is initialized from the conf on
  *    first use. Old checkpoint files are reclaimed by Spark when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
  *    otherwise the job-scoped dir should be deleted by the caller
  *    after the run (both standard Spark operational practice).
  */
object Checkpoints {

  def truncate(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    ss.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        val sc = ss.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** [[truncate]] without the eager barrier: the frame materializes
    * during the FIRST action that consumes it and is reused (lineage
    * truncated, blocks reference-tracked) by every later one. Right
    * for measure-then-act operators whose measuring aggregate IS the
    * first action — the materialization rides the job the gate pays
    * anyway instead of adding a sequential round-trip; an explicit
    * unpersist is never needed.
    */
  def truncateLazy(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    ss.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        val sc = ss.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = false)
      case None =>
        df.localCheckpoint(eager = false)
    }
  }
}
