package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned commit protocol for MERGED driver-model state in
  * at-least-once `foreachBatch` sinks — the append sinks' anti-joins
  * self-heal on replay, but a MERGE double-counts, so merged state is
  * committed like a version log and never updated in place:
  *
  *   - batch `b` writes its merged state to the fresh per-batch path
  *     `stateDir/v/<b>` (its own staging — an overwrite there can only
  *     clobber a crashed attempt of the SAME uncommitted batch);
  *   - the empty marker `stateDir/_committed/<b>` is created AFTER the
  *     state (and any derived report) — the single atomic commit
  *     point;
  *   - a replay of a marked batch is a no-op; a replay of an UNMARKED
  *     batch rebuilds from the LAST COMMITTED version, never from a
  *     possibly-already-merged uncommitted write — no double-count
  *     window and no lose-everything window (in-place
  *     `mode(overwrite)` deleted the accumulated state before
  *     rewriting it);
  *   - superseded version dirs are GC'd only after the new marker
  *     lands, so the newest marker's state dir always exists (a crash
  *     between marker and GC leaves one extra tiny dir for the next
  *     commit to collect). Markers are kept forever — they are the
  *     replay no-op record.
  *
  * State is driver-model-sized (k·d integers — the class the registry
  * audits), so every write is a tiny lineage-free local frame: the
  * writes cannot collide with any cached plan reading the same path
  * (the refreshByPath hazard AssembleIngest documents).
  *
  * Shared by [[EmbeddingDriftMonitor]] (per-dim drift sums) and
  * [[CovarianceMonitor]] (packed Gram buffer).
  *
  * Restart contract: monitors must resume from the SAME streaming
  * checkpoint (Spark then aligns batch ids with batch content via its
  * WAL). A fresh checkpoint restarts ids at 0, and a NEW batch whose
  * id collides with an old marker would be merge-skipped — for merged
  * state there is no content-keyed fallback (unlike [[IngestCommit]]'s
  * append sinks, whose anti-joins heal any miss): the version log is
  * id-addressed by construction. Operationally: fresh checkpoint ⇒
  * fresh stateDir.
  */
private[graft] object VersionedModelState {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isCommitted(spark: SparkSession, stateDir: String, batchId: Long): Boolean =
    fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"$stateDir/_committed/$batchId"))

  private def committedIds(spark: SparkSession, stateDir: String): Seq[Long] = {
    val f = fs(spark, stateDir)
    val dir = new org.apache.hadoop.fs.Path(s"$stateDir/_committed")
    if (f.exists(dir)) f.listStatus(dir).toSeq.map(_.getPath.getName.toLong)
    else Seq.empty
  }

  /** The last COMMITTED state version, if any — an unmarked `v/<id>`
    * dir is a crashed attempt (possibly fully merged) and is ignored;
    * a marker whose `v/<id>` dir is missing is skipped (GC keeps only
    * the newest, and a PRE-versioned state dir has markers with no
    * version dirs at all). When no version dir exists but the legacy
    * in-place layout (`stateDir/data` + markers) does, that state is
    * adopted as the base the next commit versions — the one-time
    * migration path for monitors restarted over a pre-protocol state
    * dir, which would otherwise crash on a nonexistent `v/` path and
    * orphan the accumulated sums (it inherits the old layout's crash
    * caveat exactly once: `data` written ahead of its marker cannot be
    * distinguished from committed data).
    */
  def lastCommitted(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val f = fs(spark, stateDir)
    val ids = committedIds(spark, stateDir)
    ids.sorted.reverse
      .find(v => f.exists(new org.apache.hadoop.fs.Path(s"$stateDir/v/$v")))
      .map(v => spark.read.parquet(s"$stateDir/v/$v"))
      .orElse {
        val legacy = new org.apache.hadoop.fs.Path(s"$stateDir/data")
        if (ids.nonEmpty && f.exists(legacy))
          Some(spark.read.parquet(s"$stateDir/data"))
        else None
      }
  }

  /** Write `merged` to this batch's version path, run the caller's
    * report write, then commit atomically via the marker and GC the
    * superseded versions.
    */
  def commit(
      spark: SparkSession, stateDir: String, batchId: Long,
      merged: DataFrame)(writeReport: => Unit): Unit = {
    val prev = committedIds(spark, stateDir)
    merged.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v/$batchId")
    writeReport
    val f = fs(spark, stateDir)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$stateDir/_committed/$batchId"))
    prev.foreach(v => // GC superseded versions, markers stay
      f.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v/$v"), true))
  }
}
