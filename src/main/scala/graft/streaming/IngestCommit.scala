package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing of the APPEND-sink ingests
  * ([[Sessionize.nearDupIngest]], [[MediaIngest]], [[AssembleIngest]],
  * [[SpanIngest]]): the committed-data probe and the per-batch marker.
  * Append sinks self-heal on replay via anti-joins against their
  * targets, so the marker here is a fast-path no-op record — the
  * MERGE-state guard with versioned rebuild is [[VersionedModelState]]'s
  * job, not this one's.
  */
private[graft] object IngestCommit {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The table at `dir`, only if a committed part file exists.
    * Directory-exists is not enough: a crash during the very first
    * batch's append can leave only an uncommitted `_temporary/` tree,
    * and a bare `spark.read.parquet` would then throw schema-inference
    * errors on every restart — permanently wedging the stream in
    * exactly the recovery path the marker protocol is meant to harden.
    */
  def readCommitted(spark: SparkSession, dir: String): Option[DataFrame] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val hasData = f.exists(p) && f.listStatus(p)
      .exists(st => st.isFile && st.getPath.getName.startsWith("part-"))
    if (hasData) Some(spark.read.parquet(dir)) else None
  }

  /** CONTENT key of a micro-batch's id multiset — order- and
    * partitioning-independent (count + xor of id hashes). The commit
    * marker is keyed by (batchId, contentKey), not batchId alone:
    * after a restart with a FRESH checkpoint, Spark restarts batch
    * ids at 0, so a batch-id-only marker would silently SKIP a new
    * batch whose id collides with an old marker — admission-time data
    * loss (caught by the broker-delivery spec). With the content key,
    * only a genuine replay (same id, same rows) takes the fast path;
    * everything else falls through to the per-append anti-joins,
    * which remain the real idempotence guard.
    */
  def contentKey(batch: DataFrame, idCol: String = "doc_id"): String = {
    import org.apache.spark.sql.functions._
    val r = batch.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(hash(col(idCol)).cast("long")), lit(0L)).as("x")).collect()(0)
    s"${r.getLong(0)}x${java.lang.Long.toHexString(r.getLong(1))}"
  }

  def isCommitted(
      spark: SparkSession, markerRoot: String, batchId: Long, key: String): Boolean =
    fs(spark, markerRoot).exists(
      new org.apache.hadoop.fs.Path(s"$markerRoot/_committed/${batchId}_$key"))

  def mark(spark: SparkSession, markerRoot: String, batchId: Long, key: String): Unit =
    fs(spark, markerRoot).mkdirs(
      new org.apache.hadoop.fs.Path(s"$markerRoot/_committed/${batchId}_$key"))

  /** Assert-or-stamp a format marker under `markerRoot` — the guard an
    * index directory needs against being reopened under an
    * INCOMPATIBLE layout flag (e.g. [[SpanIngest]]'s 8-byte vs 16-byte
    * span-key width: a restart with the opposite `wideKeys` would
    * mis-probe or fail mid-batch on the parquet append with no hint of
    * why). First open stamps `_format/<name>=<value>`; every later
    * open requires the stamped value to match.
    */
  def assertFormat(
      spark: SparkSession, markerRoot: String, name: String, value: String): Unit = {
    val f = fs(spark, markerRoot)
    val dir = new org.apache.hadoop.fs.Path(s"$markerRoot/_format")
    if (f.exists(dir)) {
      val stamped = f.listStatus(dir).map(_.getPath.getName)
        .collectFirst { case s if s.startsWith(s"$name=") => s.drop(name.length + 1) }
      stamped match {
        case Some(v) if v != value =>
          throw new IllegalStateException(
            s"index at $markerRoot was created with $name=$v but is being " +
              s"reopened with $name=$value — replay with the original flag " +
              "or point at a fresh directory")
        case Some(_) => ()
        case None => f.mkdirs(new org.apache.hadoop.fs.Path(s"$markerRoot/_format/$name=$value"))
      }
    } else f.mkdirs(new org.apache.hadoop.fs.Path(s"$markerRoot/_format/$name=$value"))
  }
}
