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
    * partitioning-independent. The commit marker is keyed by
    * (batchId, contentKey), not batchId alone: after a restart with a
    * FRESH checkpoint, Spark restarts batch ids at 0, so a
    * batch-id-only marker would silently SKIP a new batch whose id
    * collides with an old marker — admission-time data loss (caught
    * by the broker-delivery spec). With the content key, only a
    * genuine replay (same id, same rows) takes the fast path;
    * everything else falls through to the per-append anti-joins,
    * which remain the real idempotence guard.
    *
    * Key = (count, sum of 64-bit id hashes mod 2^61−1, xor of the
    * same hashes). Round 15 used count + XOR of 32-bit hashes alone —
    * the round-15 advisor showed XOR CANCELS duplicate pairs (any id
    * appearing an even number of times contributes nothing, so
    * {a,a,c} and {b,b,c} collided) on top of a ~2^-32 birthday
    * surface; a false match here skips the entire batch body at
    * admission time. The SUM component counts multiplicity (2·h(a) ≠
    * 2·h(b)), xxhash64 widens the space, and the Mersenne-prime
    * modulus keeps the sum inside ANSI-safe long arithmetic at any
    * batch size (decimal(38,0) accumulator, exact).
    */
  def contentKey(batch: DataFrame, idCol: String = "doc_id"): String = {
    import org.apache.spark.sql.functions._
    val h = xxhash64(col(idCol))
    val r = batch.agg(
      count(lit(1)).as("n"),
      coalesce(
        pmod(sum(h.cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(BigDecimal(2305843009213693951L))).cast("long"),
        lit(0L)).as("s"),
      coalesce(bit_xor(h), lit(0L)).as("x")).collect()(0)
    s"${r.getLong(0)}x${java.lang.Long.toHexString(r.getLong(1))}" +
      s"x${java.lang.Long.toHexString(r.getLong(2))}"
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
    def entries(): Seq[String] =
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).map(_.getPath.getName).toSeq
        .filter(_.startsWith(s"$name="))
    val stamped = entries().map(_.drop(name.length + 1))
    stamped.find(_ != value) match {
      case Some(v) =>
        throw new IllegalStateException(
          s"index at $markerRoot was created with $name=$v but is being " +
            s"reopened with $name=$value — replay with the original flag " +
            "or point at a fresh directory")
      case None if stamped.nonEmpty => () // already stamped with this value
      case None =>
        // STAMP-THEN-VERIFY (round-15 advisor): the old check-then-stamp
        // had a race — two streams opening the same fresh dir with
        // CONFLICTING flags could both see "no marker" and both pass,
        // leaving contradictory markers and the mixed-layout corruption
        // this guard exists to prevent. Stamping first via atomic
        // mkdirs, then RE-LISTING, closes the silent-both-pass case: if
        // a conflicting stamp landed concurrently, the re-list sees ≥2
        // name= entries and at least one opener (whichever re-lists
        // after the second stamp) throws before touching data.
        f.mkdirs(new org.apache.hadoop.fs.Path(s"$markerRoot/_format/$name=$value"))
        val after = entries()
        if (after.length != 1)
          throw new IllegalStateException(
            s"index at $markerRoot has conflicting $name markers " +
              s"${after.mkString(", ")} — two streams raced the first open " +
              "with different flags; wipe the directory and restart ONE of them")
    }
  }
}
