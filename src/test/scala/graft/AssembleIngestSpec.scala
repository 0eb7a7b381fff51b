package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.CorpusClean
import graft.streaming.AssembleIngest

/** The incremental assembly twin: streaming ingest (quality gate →
  * exact dedup vs the hash index → near-dup prune vs the re-bandable
  * matrix index) + the batch capstone's own finishing pass must equal
  * the one-shot batch `CorpusClean.assemble` over the concatenated
  * input, and a replay (kill-and-restart with fresh checkpoint, plus a
  * simulated partial commit) must change nothing.
  */
class AssembleIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Delete the commit marker(s) for a batch id — markers are now
    * content-keyed (`<batchId>_<key>`), so tests locate them by
    * prefix.
    */
  private def deleteMarker(root: String, batchId: Long): Unit = {
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$root/_committed")
    val hits = fsys.listStatus(dir)
      .filter(_.getPath.getName.startsWith(s"${batchId}_"))
    assert(hits.nonEmpty, s"no marker for batch $batchId under $root")
    hits.foreach(st => fsys.delete(st.getPath, true))
  }

  // stopword-rich lowercase sentences that pass the 0.3 quality gate
  private val A = "the quick brown fox jumps over the lazy dog in a sunny field of grass"
  private val B = "a model of the data is trained in the cloud and served to users at scale"
  private val C = "the pipeline reads a table of documents and writes the clean rows to disk"
  private val D = "an index of the corpus is kept in parquet and probed by the next batch"
  private def dropLast(t: String) = t.split(" ").dropRight(1).mkString(" ")

  private def batch1 = Seq(
    1L -> A,
    2L -> A, // in-batch exact dup of 1
    3L -> B)
  private def batch2 = Seq(
    11L -> dropLast(A), // near-copy of corpus doc 1
    12L -> C,
    13L -> B, // cross-batch exact dup of 3
    14L -> "zz!!@@##") // quality-gate drop
  private def batch3 = Seq(
    21L -> dropLast(C), // near-copy of corpus doc 12
    22L -> D,
    23L -> dropLast(D), // in-batch near-dup pair with 24... and of 22!
    24L -> dropLast(dropLast(D)))

  // NOTE: 22/23/24 form a same-batch near-dup CLUSTER (all pairwise
  // >= 0.5 on 3-shingles): in-batch collapse keeps only 22 — identical
  // to the batch pipeline's pair-loser drops (23 and 24 both lose a
  // pair against 22). No a~b~c-with-a≁c chain is present, so the two
  // semantics coincide (the documented contract).

  private def union = (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text")

  test("streaming ingest + batch finishing pass equals the one-shot batch capstone, and replays are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_assemble").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[(Long, String)]
    val q = AssembleIngest.assembleIngest(in.toDS().toDF("doc_id", "text"), out, idx, ckpt)
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      in.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    // survivor set equals the batch pipeline's
    val gold = spark.read.parquet(out)
    val wantClean = CorpusClean.clean(union)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(wantClean == Seq(1L, 3L, 12L, 22L), s"batch ground truth moved: $wantClean")
    assert(gold.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == wantClean)

    // finishing the gold table through the capstone's own stages 2-4
    // equals the one-shot batch assemble row for row
    val got = AssembleIngest.finishAssembly(spark, out)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val want = CorpusClean.assemble(union)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(got == want, s"streaming+finish != batch assemble:\n$got\n$want")

    // kill-and-restart replay: fresh checkpoint restarts batchIds at 0
    // over the same out/index dirs — fully-committed batches no-op on
    // their markers
    val in2 = MemoryStream[(Long, String)]
    val q2 = AssembleIngest.assembleIngest(
      in2.toDS().toDF("doc_id", "text"), out, idx,
      new java.io.File(dir, "ckpt2").getPath)
    try {
      in2.addData(batch1); q2.processAllAvailable()
      in2.addData(batch2); q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == wantClean,
      "replayed batches duplicated gold rows")

    // simulated PARTIAL commit: delete batch 0's marker (data already
    // present) and replay it — the per-append anti-joins must self-heal
    // to a no-op instead of duplicating gold/index rows
    deleteMarker(idx, 0L)
    val in3 = MemoryStream[(Long, String)]
    val q3 = AssembleIngest.assembleIngest(
      in3.toDS().toDF("doc_id", "text"), out, idx,
      new java.io.File(dir, "ckpt3").getPath)
    try { in3.addData(batch1); q3.processAllAvailable() } finally q3.stop()
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == wantClean,
      "partial-commit replay duplicated gold rows")
    Seq("mh", "sh", "xh").foreach { t =>
      val ids = spark.read.parquet(s"$idx/$t").select("doc_id").collect().map(_.getLong(0))
      assert(ids.sorted.toSeq == wantClean, s"index $t diverged after partial-commit replay")
    }
  }

  test("broker-shaped delivery (Kafka at-least-once twin): arbitrary re-batching + redelivery of the same arrival order lands identical gold and indexes") {
    // The in-sandbox Kafka approximation (SURVEY §8.4: no broker —
    // MemoryStream stands in): a broker guarantees per-partition
    // ORDER but neither batch boundaries nor exactly-once delivery.
    // This spec drives AssembleIngest through exactly those degrees
    // of freedom — (a) the same message order cut into DIFFERENT
    // micro-batches, (b) at-least-once REDELIVERY of whole earlier
    // spans (the consumer-restart-from-old-offset case), including
    // across a kill-and-restart with a fresh checkpoint — and pins
    // that gold and all three near-dup indexes equal the canonical
    // run's. Why this holds structurally: exact-dup admission heals
    // at doc_id granularity (anti-joins), and near-dup winners depend
    // only on ARRIVAL ORDER of distinct docs (an earlier doc always
    // wins its cluster, in-batch or cross-batch), which is exactly
    // the invariant a partition-ordered broker preserves.
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val msgs = batch1 ++ batch2 ++ batch3 // the partition's total order
    val wantClean = Seq(1L, 3L, 12L, 22L)

    def runBroker(tag: String, deliveries: Seq[Seq[(Long, String)]],
        restartAfter: Int): (Seq[Long], Map[String, Seq[Long]]) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_broker_$tag").toFile
      val out = new java.io.File(dir, "gold").getPath
      val idx = new java.io.File(dir, "index").getPath
      val in = MemoryStream[(Long, String)]
      var q = AssembleIngest.assembleIngest(
        in.toDS().toDF("doc_id", "text"), out, idx,
        new java.io.File(dir, "ckpt").getPath)
      try {
        deliveries.zipWithIndex.foreach { case (b, i) =>
          if (i == restartAfter) {
            // consumer crash: restart with a FRESH checkpoint (batch
            // ids restart at 0 — the marker fast-path must not be
            // fooled) and redelivery continues below
            q.stop()
            q = AssembleIngest.assembleIngest(
              in.toDS().toDF("doc_id", "text"), out, idx,
              new java.io.File(dir, s"ckpt_r$i").getPath)
          }
          in.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      val gold = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val idxs = Seq("mh", "sh", "xh").map { t =>
        t -> spark.read.parquet(s"$idx/$t").select("doc_id")
          .collect().map(_.getLong(0)).distinct.sorted.toSeq
      }.toMap
      (gold, idxs)
    }

    // (a) same order, different batch boundaries: 2-4-2-3 cut
    val rebatched = Seq(msgs.take(2), msgs.slice(2, 6), msgs.slice(6, 8), msgs.drop(8))
    val (goldA, idxA) = runBroker("rebatch", rebatched, restartAfter = -1)
    assert(goldA == wantClean, s"rebatched gold diverged: $goldA")
    idxA.foreach { case (t, ids) => assert(ids == wantClean, s"index $t: $ids") }

    // (b) at-least-once: batch1 fully redelivered inside batch2's
    // span; then a crash-restart redelivers batch2's span again
    // before batch3 — every span lands at least once, some twice
    val redelivered = Seq(
      batch1,
      batch1 ++ batch2, // redelivery of span 1 + new span 2
      batch2,           // post-restart redelivery from the old offset
      batch3)
    val (goldB, idxB) = runBroker("redeliver", redelivered, restartAfter = 2)
    assert(goldB == wantClean, s"at-least-once gold diverged: $goldB")
    idxB.foreach { case (t, ids) => assert(ids == wantClean, s"index $t: $ids") }
  }

  test("DSIR-composed assembly: streaming ingest under the frozen selection model + batch finishing equals the one-shot assembleSelected; indexes keep unselected survivors") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import graft.ext.TrainPrep
    // curated target slice favoring the B/C vocabulary — the selector
    // must genuinely split the survivor set
    val target = Seq(100L -> B, 101L -> C).toDF("doc_id", "text")
    val keepPpm = 500000L
    val cleaned = CorpusClean.clean(union).select(col("doc_id"), col("text"))
    val sel = TrainPrep.dsirSelect(cleaned, target, 256, keepPpm).collect()
    val keptIds = sel.filter(_.getAs[Boolean]("kept")).map(_.getLong(0)).sorted.toSeq
    assert(keptIds.nonEmpty && keptIds.size < sel.length,
      s"selection must split the survivors, kept: ${keptIds.mkString(",")}")
    // the frozen threshold IS the (n-k)-th order statistic = the max
    // unkept weight (kept <=> strictly above it)
    val thr = sel.filter(!_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("logw_micro")).max
    val model = {
      val rawB = TrainPrep.dsirCounts(cleaned, 256).withColumnRenamed("c", "c_raw")
      val tgtB = TrainPrep.dsirCounts(target, 256).withColumnRenamed("c", "c_tgt")
      TrainPrep.dsirModelFrom(rawB, tgtB, 256)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_dsirasm").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val in = MemoryStream[(Long, String)]
    val q = AssembleIngest.assembleIngest(
      in.toDS().toDF("doc_id", "text"), out, idx,
      new java.io.File(dir, "ckpt").getPath,
      dsirModel = Some(model), dsirThreshold = thr)
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      in.addData(batch3); q.processAllAvailable()
    } finally q.stop()
    // gold = clean survivors ∩ frozen-model admissions = the batch
    // selection; the dedup indexes keep EVERY clean survivor
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == keptIds,
      "streaming gold diverges from the batch selection")
    val allClean = cleaned.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    Seq("mh", "sh", "xh").foreach { t =>
      val ids = spark.read.parquet(s"$idx/$t").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == allClean,
        s"index $t must ingest unselected survivors too (dedup sees them)")
    }
    // finishing the selected gold through the capstone's own stages
    // equals the one-shot composed batch capstone row for row
    val got = AssembleIngest.finishAssembly(spark, out)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val want = CorpusClean.assembleSelected(union, target, keepPpm = keepPpm)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(got == want, s"streaming+finish != batch assembleSelected:\n$got\n$want")
  }

  test("streaming embedding-drift monitor: merged state report equals the one-shot batch drift after every batch") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def vecs(ids: Range, off: Double) = ids.map(i => (i.toLong,
      (0 until 6).map(d => (((i * 7 + d * 3) % 13) * 0.01 + off).toFloat).toArray))
    val baseline = vecs(0 until 50, 0.0).toDF("vec_id", "embedding")
    val b1 = vecs(100 until 140, 0.25)
    val b2 = vecs(140 until 170, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft_edrift").toFile
    val state = new java.io.File(dir, "state").getPath
    val report = new java.io.File(dir, "report").getPath
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EmbeddingDriftMonitor.watch(
      in.toDS().toDF("vec_id", "embedding"), baseline, state, report,
      new java.io.File(dir, "ckpt").getPath)
    def assertReportEquals(seen: Seq[(Long, Array[Float])]): Unit = {
      val got = spark.read.parquet(report).orderBy("dim").collect().map(_.toString).toSeq
      val want = graft.ext.Similarity.embeddingDrift(
          baseline, seen.toDF("vec_id", "embedding"))
        .orderBy("dim").collect().map(_.toString).toSeq
      assert(got == want, s"monitor report diverged from one-shot drift:\n$got\n$want")
    }
    try {
      in.addData(b1); q.processAllAvailable(); assertReportEquals(b1)
      in.addData(b2); q.processAllAvailable(); assertReportEquals(b1 ++ b2)
    } finally q.stop()
    // replay with a fresh checkpoint: committed batchIds no-op on their
    // markers — a re-merge would double-count the running sums
    val in2 = MemoryStream[(Long, Array[Float])]
    val q2 = graft.streaming.EmbeddingDriftMonitor.watch(
      in2.toDS().toDF("vec_id", "embedding"), baseline, state, report,
      new java.io.File(dir, "ckpt2").getPath)
    try {
      in2.addData(b1); q2.processAllAvailable()
    } finally q2.stop()
    assertReportEquals(b1 ++ b2)
  }

  test("span ingest: every arriving doc gets exactly the batch auditor's row over the prefix corpus; replay and torn index appends self-heal") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import graft.streaming.SpanIngest
    val sb1 = Seq(
      1L -> "a b c d e f g",       // spans shared with 2 (in-batch) and 11 (later)
      2L -> "a b c d e zz yy",     // shares "a b c d e" with 1
      3L -> "p q r s t u v")       // unique
    val sb2 = Seq(
      11L -> "x1 a b c d e f x2",  // hits 1 and 2 via the index
      12L -> "m n o p q r",        // no 5-span overlap with 3's spans? "p q r s t" vs... none
      13L -> "zz")                 // < w tokens -> zeros
    val dir = java.nio.file.Files.createTempDirectory("graft_spaningest").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "idx").getPath
    def goldRows(ids: Seq[Long]) = spark.read.parquet(out)
      .filter(col("doc_id").isin(ids: _*)).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    def auditorRows(prefix: Seq[(Long, String)], ids: Seq[Long]) =
      graft.ext.Dedup.crossDocSpans(prefix.toDF("doc_id", "text"), w = 5)
        .filter(col("doc_id").isin(ids: _*)).orderBy("doc_id")
        .collect().map(_.toString).toSeq
    val in = MemoryStream[(Long, String)]
    val q = SpanIngest.spanIngest(in.toDS().toDF("doc_id", "text"), out, idx,
      new java.io.File(dir, "ckpt").getPath)
    try {
      in.addData(sb1); q.processAllAvailable()
      assert(goldRows(sb1.map(_._1)) == auditorRows(sb1, sb1.map(_._1)),
        "batch-1 rows diverge from the prefix auditor")
      in.addData(sb2); q.processAllAvailable()
      assert(goldRows(sb2.map(_._1)) == auditorRows(sb1 ++ sb2, sb2.map(_._1)),
        "batch-2 rows diverge from the prefix auditor")
      // admission-time view: batch-1 rows did NOT get retro-flagged
      assert(goldRows(sb1.map(_._1)) == auditorRows(sb1, sb1.map(_._1)),
        "earlier gold rows must stay at their admission-time values")
    } finally q.stop()
    // torn span-index append: drop half of doc 11's span rows and
    // delete batch 1's marker -> the replay must re-land exactly the
    // missing suffix and leave gold untouched
    val allSpans = spark.read.parquet(s"$idx/spans").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val torn = allSpans.filter { case (d, h) => d != 11L || h % 2 == 0 }
    val fsys = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(s"$idx/spans"), true)
    torn.toSeq.toDF("doc_id", "h").write.parquet(s"$idx/spans")
    deleteMarker(idx, 1L)
    val in2 = MemoryStream[(Long, String)]
    val q2 = SpanIngest.spanIngest(in2.toDS().toDF("doc_id", "text"), out, idx,
      new java.io.File(dir, "ckpt2").getPath)
    try {
      in2.addData(sb1); q2.processAllAvailable() // batch 0: marker no-op
      in2.addData(sb2); q2.processAllAvailable() // batch 1: heals the tear
    } finally q2.stop()
    val healed = spark.read.parquet(s"$idx/spans").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(healed == allSpans.sorted.toSeq, "torn span append did not heal to the exact original set")
    assert(goldRows(sb2.map(_._1)) == auditorRows(sb1 ++ sb2, sb2.map(_._1)),
      "gold diverged after the healing replay")
    assert(spark.read.parquet(out).count() == (sb1 ++ sb2).length,
      "replay duplicated gold rows")
  }

  test("streaming covariance monitor: merged Gram report equals the one-shot batch covariance after every batch, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    def vecs(ids: Range, off: Double) = ids.map(i => (i.toLong,
      (0 until 6).map(d => (((i * 11 + d * 5) % 17) * 0.02 + off).toFloat).toArray))
    val b1 = vecs(0 until 40, 0.1)
    val b2 = vecs(40 until 75, -0.2)
    val dir = java.nio.file.Files.createTempDirectory("graft_covmon").toFile
    val state = new java.io.File(dir, "state").getPath
    val report = new java.io.File(dir, "report").getPath
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.CovarianceMonitor.watch(
      in.toDS().toDF("vec_id", "embedding"), state, report,
      new java.io.File(dir, "ckpt").getPath, topK = 10)
    def assertReportEquals(seen: Seq[(Long, Array[Float])]): Unit = {
      val got = spark.read.parquet(report).orderBy("rank")
        .collect().map(_.toString).toSeq
      val want = graft.ext.Similarity.dimCovariance(
          seen.toDF("vec_id", "embedding"), topK = 10)
        .orderBy("rank").collect().map(_.toString).toSeq
      assert(got == want, s"monitor report diverged from one-shot covariance:\n$got\n$want")
    }
    try {
      in.addData(b1); q.processAllAvailable(); assertReportEquals(b1)
      in.addData(b2); q.processAllAvailable(); assertReportEquals(b1 ++ b2)
    } finally q.stop()
    // kill-and-restart with a fresh checkpoint: committed batches no-op
    // on their markers — a re-merge would double-count the Gram sums
    val in2 = MemoryStream[(Long, Array[Float])]
    val q2 = graft.streaming.CovarianceMonitor.watch(
      in2.toDS().toDF("vec_id", "embedding"), state, report,
      new java.io.File(dir, "ckpt2").getPath, topK = 10)
    try { in2.addData(b1); q2.processAllAvailable() } finally q2.stop()
    assertReportEquals(b1 ++ b2)
  }

  test("drift monitor migration: a pre-versioned state dir (markers + live data path) is adopted, not crashed on") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    def vecs(ids: Range, off: Double) = ids.map(i => (i.toLong,
      (0 until 6).map(d => (((i * 7 + d * 3) % 13) * 0.01 + off).toFloat).toArray))
    val baseline = vecs(0 until 50, 0.0).toDF("vec_id", "embedding")
    val b1 = vecs(100 until 140, 0.25)
    val b2 = vecs(140 until 170, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft_edrift_mig").toFile
    val state = new java.io.File(dir, "state").getPath
    val report = new java.io.File(dir, "report").getPath
    // hand-build the LEGACY layout: batch 0 (b1) committed in-place —
    // live state at state/data, marker at state/_committed/0, no v/
    graft.ext.Similarity.perDimStats(b1.toDF("vec_id", "embedding"), "new")
      .coalesce(1).write.parquet(s"$state/data")
    new java.io.File(s"$state/_committed/0").mkdirs()
    // restart the monitor: batch 0 no-ops on the old marker; batch 1
    // must adopt the legacy state as its base, not crash on v/0
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EmbeddingDriftMonitor.watch(
      in.toDS().toDF("vec_id", "embedding"), baseline, state, report,
      new java.io.File(dir, "ckpt").getPath)
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(report).orderBy("dim").collect().map(_.toString).toSeq
    val want = graft.ext.Similarity.embeddingDrift(
        baseline, (b1 ++ b2).toDF("vec_id", "embedding"))
      .orderBy("dim").collect().map(_.toString).toSeq
    assert(got == want, s"migrated monitor diverged from one-shot drift:\n$got\n$want")
  }

  test("drift monitor crash recovery: an unmarked (crashed) state version is ignored — rebuild from the last committed version") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    def vecs(ids: Range, off: Double) = ids.map(i => (i.toLong,
      (0 until 6).map(d => (((i * 7 + d * 3) % 13) * 0.01 + off).toFloat).toArray))
    val baseline = vecs(0 until 50, 0.0).toDF("vec_id", "embedding")
    val b1 = vecs(100 until 140, 0.25)
    val b2 = vecs(140 until 170, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft_edrift_crash").toFile
    val state = new java.io.File(dir, "state").getPath
    val report = new java.io.File(dir, "report").getPath
    // run 1: b1 only -> batch 0 fully committed (marker present)
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EmbeddingDriftMonitor.watch(
      in.toDS().toDF("vec_id", "embedding"), baseline, state, report,
      new java.io.File(dir, "ckpt").getPath)
    try { in.addData(b1); q.processAllAvailable() } finally q.stop()
    // simulate batch 1 crashing BETWEEN its state write and its
    // marker: a fully-written but UNCOMMITTED v/1 — poisoned here, so
    // any code path that reads it is loudly detectable
    Seq((0, 999999999L, 999999999L)).toDF("dim", "n_new", "sum_new")
      .coalesce(1).write.mode("overwrite").parquet(s"$state/v/1")
    // restart with a fresh checkpoint: batch 0 (b1) no-ops on its
    // marker; batch 1 (b2) must rebuild from committed v/0 — with the
    // old in-place design it would re-merge the live (already-merged)
    // state and double-count
    val in2 = MemoryStream[(Long, Array[Float])]
    val q2 = graft.streaming.EmbeddingDriftMonitor.watch(
      in2.toDS().toDF("vec_id", "embedding"), baseline, state, report,
      new java.io.File(dir, "ckpt2").getPath)
    try {
      in2.addData(b1); q2.processAllAvailable()
      in2.addData(b2); q2.processAllAvailable()
    } finally q2.stop()
    val got = spark.read.parquet(report).orderBy("dim").collect().map(_.toString).toSeq
    val want = graft.ext.Similarity.embeddingDrift(
        baseline, (b1 ++ b2).toDF("vec_id", "embedding"))
      .orderBy("dim").collect().map(_.toString).toSeq
    assert(got == want, s"crash replay diverged from one-shot drift:\n$got\n$want")
    // the commit GC keeps exactly the newest committed version
    val vdirs = new java.io.File(s"$state/v").listFiles().map(_.getName).sorted.toSeq
    assert(vdirs == Seq("1"), s"expected only the newest committed version, got $vdirs")
  }

  test("DSIR monitor: accumulated bucket model equals the one-shot batch model after every batch, across kill-and-restart, crash versions ignored") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def docs(ids: Range, bias: Int) = ids.map(i => (i.toLong,
      (0 until 8).map(k => words((i * 3 + k * bias) % words.length)).mkString(" ")))
    val target = docs(1000 until 1020, 1).toDF("doc_id", "text")
    val b1 = docs(0 until 30, 2)
    val b2 = docs(30 until 55, 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsirmon").toFile
    val state = new java.io.File(dir, "state").getPath
    val report = new java.io.File(dir, "report").getPath
    import graft.ext.TrainPrep
    def oneShot(seen: Seq[(Long, String)]): Seq[String] =
      TrainPrep.dsirModelFrom(
          TrainPrep.dsirCounts(seen.toDF("doc_id", "text"), 256)
            .withColumnRenamed("c", "c_raw"),
          TrainPrep.dsirCounts(target, 256).withColumnRenamed("c", "c_tgt"),
          256)
        .orderBy("bucket").collect().map(_.toString).toSeq
    def got(): Seq[String] =
      spark.read.parquet(report).orderBy("bucket").collect().map(_.toString).toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DsirMonitor.watch(
      in.toDS().toDF("doc_id", "text"), target, state, report,
      new java.io.File(dir, "ckpt").getPath)
    try {
      in.addData(b1); q.processAllAvailable()
      assert(got() == oneShot(b1), "batch-1 model diverged from one-shot")
      in.addData(b2); q.processAllAvailable()
      assert(got() == oneShot(b1 ++ b2), "batch-2 model diverged from one-shot")
    } finally q.stop()
    // poison an uncommitted crash version: the restart must ignore it
    Seq((0, 999999999L)).toDF("i", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$state/v/2")
    // kill-and-restart with a fresh checkpoint: the replayed batch
    // no-ops on its marker - a re-merge would double-count the counts
    val in2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.DsirMonitor.watch(
      in2.toDS().toDF("doc_id", "text"), target, state, report,
      new java.io.File(dir, "ckpt2").getPath)
    try { in2.addData(b1); q2.processAllAvailable() } finally q2.stop()
    assert(got() == oneShot(b1 ++ b2), "replay must not change the model")
  }

  test("DSIR admission ingest: gold equals one-shot scoring+filter under the frozen model, verdicts are prefix-stable, replay re-lands only the torn suffix") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def docs(ids: Range, bias: Int) = ids.map(i => (i.toLong,
      (0 until 8).map(k => words((i * 3 + k * bias) % words.length)).mkString(" ")))
    import graft.ext.TrainPrep
    // offline training: model from a training corpus vs a target slice
    val trainRaw = docs(0 until 60, 2).toDF("doc_id", "text")
    val target = docs(1000 until 1020, 1).toDF("doc_id", "text")
    val model = {
      val rawB = TrainPrep.dsirCounts(trainRaw, 256).withColumnRenamed("c", "c_raw")
      val tgtB = TrainPrep.dsirCounts(target, 256).withColumnRenamed("c", "c_tgt")
      TrainPrep.dsirModelFrom(rawB, tgtB, 256)
    }
    // a threshold that splits the stream: every 3rd doc carries extra
    // target-weighted tokens, the midpoint between extremes separates
    def boost(ds: Seq[(Long, String)]): Seq[(Long, String)] =
      ds.map { case (id, t) =>
        (id, if (id % 3 == 0) t + " alpha alpha alpha alpha" else t) }
    val b1 = boost(docs(100 until 130, 2))
    val b2 = boost(docs(130 until 155, 5))
    val thr = {
      val ws = TrainPrep.dsirScore((b1 ++ b2).toDF("doc_id", "text"), model, 256)
        .collect().map(_.getLong(2)).sorted
      assert(ws.head < ws.last, "weights must spread for this harness")
      (ws.head + ws.last) / 2
    }
    def oneShot(seen: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
      TrainPrep.dsirScore(seen.toDF("doc_id", "text"), model, 256)
        .filter(col("logw_micro") > thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(oneShot(b1 ++ b2).nonEmpty &&
      oneShot(b1 ++ b2).size < (b1 ++ b2).size,
      "the threshold must genuinely split the stream")
    val dir = java.nio.file.Files.createTempDirectory("graft_dsiring").toFile
    val out = new java.io.File(dir, "out").getPath
    def gold(): Seq[(Long, Long, Long)] =
      spark.read.parquet(s"$out/gold")
        .collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
          r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("logw_micro"))))
        .sortBy(_._1).toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.DsirIngest.dsirIngest(
      in.toDS().toDF("doc_id", "text"), model, thr, out,
      new java.io.File(dir, "ckpt").getPath)
    try {
      in.addData(b1); q.processAllAvailable()
      val afterB1 = gold()
      assert(afterB1 == oneShot(b1), "batch-1 admissions diverge from one-shot")
      in.addData(b2); q.processAllAvailable()
      assert(gold() == oneShot(b1 ++ b2), "batch-2 admissions diverge")
      // prefix stability: batch-1 verdicts unchanged after batch 2
      assert(gold().filter(_._1 < 130) == afterB1,
        "a frozen model must never retro-change an admission")
    } finally q.stop()
    // torn append: drop half of batch 2's gold rows + its marker; the
    // replay must re-land exactly the missing rows, duplicating none
    val full = gold()
    val torn = full.filter { case (id, _, _) => id < 130 || id % 2 == 0 }
    val fsys = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(s"$out/gold"), true)
    torn.toDF("doc_id", "n_tokens", "logw_micro").write.parquet(s"$out/gold")
    deleteMarker(out, 1L)
    val in2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.DsirIngest.dsirIngest(
      in2.toDS().toDF("doc_id", "text"), model, thr, out,
      new java.io.File(dir, "ckpt2").getPath)
    try {
      in2.addData(b1); q2.processAllAvailable() // marker fast-path no-op
      in2.addData(b2); q2.processAllAvailable() // heals the tear
    } finally q2.stop()
    assert(gold() == full, "torn-append healing must restore the exact gold set")
  }
}
