package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The object-store staging tier of [[Multimodal]]: materialize
  * payloads as individual files on the session's Hadoop filesystem and
  * read them back through the `binaryFile` source — the ingestion seam
  * a real multimodal corpus crosses. Self-typed into the object like
  * [[MultimodalPhash]].
  */
trait MediaStaging { this: Multimodal.type =>
  /** Object-store ingestion for media: stage every payload as an
    * individual `<doc_id>.bmp` FILE, then read the directory back
    * through Spark's `binaryFile` source — the path a real multimodal
    * corpus takes (images land as files in object storage; the scan
    * yields (path, length, content) rows) — and run the REAL decoder
    * over the scanned bytes. Decoded stats must equal the in-memory
    * pipeline's: proves the source preserves bytes and the
    * path→doc_id recovery.
    *
    * Scale note: `binaryFile` is the bootstrap source; production
    * compacts small files into parquet binary columns (the layout
    * every other multimodal key uses) precisely because millions of
    * tiny objects throttle listing — this key IS that ingestion step.
    * Staging clears stale files first so a previous larger run can't
    * pollute the read.
    *
    * Both the clear and the per-payload writes go through the Hadoop
    * `FileSystem` resolved from the session's hadoopConfiguration, so
    * on a real cluster the staged directory lands on the configured
    * shared FS (HDFS/S3/…), not scattered across executor-local disks;
    * `local[...]` resolves it to the local FS and behaves as before.
    */
  def stageBmpFiles(docs: DataFrame, dir: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // Hadoop's checksummed LocalFileSystem costs ~25x java.nio on a
    // many-tiny-files write (one .crc + stream ceremony per file —
    // caught by the bench tripwire), so the local scheme takes the
    // direct path; any non-local scheme (hdfs://, s3a://) goes through
    // the configured FS, checksums off, which is what makes the staged
    // directory visible cluster-wide.
    val uri = new Path(dir).toUri
    val isLocal = uri.getScheme == null || uri.getScheme == "file"
    if (isLocal) {
      val root = java.nio.file.Paths.get(uri.getPath)
      if (java.nio.file.Files.isDirectory(root)) {
        val it = java.nio.file.Files.list(root)
        try it.forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally it.close()
      }
      java.nio.file.Files.createDirectories(root)
      val local = root.toString
      docs.select(col("doc_id")).as[Long].foreachPartition { (it: Iterator[Long]) =>
        it.foreach { id =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(local, s"$id.bmp"), encodeBmp(id))
          ()
        }
      }
    } else {
      val root = new Path(dir)
      val fs = root.getFileSystem(hconf.value)
      if (fs.exists(root)) fs.delete(root, true)
      fs.mkdirs(root)
      docs.select(col("doc_id")).as[Long].foreachPartition { (it: Iterator[Long]) =>
        // newInstance, not the JVM-cached FileSystem.get: setWriteChecksum
        // would otherwise silently disable client-side checksums for every
        // other writer sharing the cached instance in this executor.
        val efs = org.apache.hadoop.fs.FileSystem.newInstance(
          new Path(dir).toUri, hconf.value)
        try {
          efs.setWriteChecksum(false)
          it.foreach { id =>
            val out = efs.create(new Path(dir, s"$id.bmp"), true)
            try out.write(encodeBmp(id)) finally out.close()
          }
        } finally efs.close()
      }
    }
  }

  private val stagingCleanupRegistered =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Per-session staging root for keys that must materialize real
    * files: scoping by `applicationId` means two concurrent sessions
    * (bench + verify, parallel CI) can never clobber each other's
    * staged directories mid-scan. The appId-scoped root is deleted on
    * JVM shutdown (first call registers the hook) — without that,
    * every session leaks its thousands of staged tiny files into
    * java.io.tmpdir forever, since no later session reuses the path.
    */
  def stagingDir(spark: SparkSession, name: String): String = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_rt_${spark.sparkContext.applicationId}")
    if (stagingCleanupRegistered.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))
    }
    s"$root/$name"
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val it = java.nio.file.Files.walk(root)
      try it.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally it.close()
    }

  def decodeBmpFiles(dir: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeBmp(id, bytes) })
      .toDF()
  }
}
