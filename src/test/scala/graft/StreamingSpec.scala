package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{MediaIngest, Sessionize}
import graft.streaming.Sessionize.{Event, Session}

/** Structured Streaming specs: the streaming twins of the batch event
  * analytics, driven through MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Long, user: Long, value: Double): Event =
    Event(id, new Timestamp(minute * 60000L), user, "click", value)

  test("windowed counts aggregate a stream with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.windowedCounts(in.toDF(), windowMinutes = 5)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(ev(1, 0, 1, 1.0), ev(2, 3, 1, 2.0), ev(3, 7, 2, 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .selectExpr("window.start", "event_type", "n_events", "value_cents")
        .collect().sortBy(_.getTimestamp(0).getTime)
      assert(rows.length == 2)
      assert(rows(0).getLong(2) == 2 && rows(0).getLong(3) == 300L)
      assert(rows(1).getLong(2) == 1 && rows(1).getLong(3) == 400L)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val in = MemoryStream[Event]
    val q = Sessionize.enrich(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 100, 1, 1.0), ev(2, 101, 2, 2.0), ev(3, 102, 9, 3.0))
      q.processAllAvailable()
      val got = spark.table("enriched").select("event_id", "segment")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Sessionize.attribution(clicks.toDF(), purchases.toDF(), windowMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(ev(10, 100, 1, 0.0), ev(11, 200, 1, 0.0), ev(12, 100, 2, 0.0))
      purchases.addData(ev(20, 120, 1, 9.0), // within 30m of click 10 only
        ev(21, 215, 1, 5.0), // within 30m of click 11 only
        ev(22, 300, 2, 7.0)) // no click within 30m
      q.processAllAvailable()
      val got = spark.table("attrib").select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((20L, 10L), (21L, 11L)))
    } finally q.stop()
  }

  test("foreachBatch deduped ingest appends only never-seen texts across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toFile
    val out = new java.io.File(dir, "gold").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[(Long, String)]
    val q = Sessionize.dedupedIngest(in.toDS().toDF("doc_id", "text"), out, ckpt)
    try {
      in.addData(1L -> "alpha", 2L -> "alpha", 3L -> "beta") // in-batch dup
      q.processAllAvailable()
      in.addData(4L -> "beta", 5L -> "gamma") // cross-batch dup
      q.processAllAvailable()
      val texts = spark.read.parquet(out).select("text")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(texts == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("near-dup ingest: batches filtered against the persisted signature index and themselves") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[(Long, String)]
    val q = Sessionize.nearDupIngest(in.toDS().toDF("doc_id", "text"), out, idx, ckpt)
    try {
      in.addData(1L -> "alpha beta gamma delta epsilon zeta eta theta",
        2L -> "one two three four five six seven")
      q.processAllAvailable()
      in.addData(
        11L -> "alpha beta gamma delta epsilon zeta eta", // near-copy of corpus doc 1
        12L -> "completely fresh words appearing here only",
        13L -> "red orange yellow green blue indigo violet",
        14L -> "red orange yellow green blue indigo")      // in-batch near-copy of 13
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 12L, 13L))
      // the index holds exactly the gold docs' minhash matrices
      val idxIds = spark.read.parquet(s"$idx/mh").select("doc_id")
        .distinct().collect().map(_.getLong(0)).sorted.toSeq
      assert(idxIds == Seq(1L, 2L, 12L, 13L))

      // replay safety: foreachBatch is at-least-once, and the sink does
      // three non-atomic appends — replaying the SAME batches (fresh
      // checkpoint restarts batchIds at 0 over the same out/index dirs)
      // must not duplicate gold rows or index entries. Fully-committed
      // batches no-op on their _committed marker; a partial commit
      // would self-heal via the per-append anti-joins.
      val ckpt2 = new java.io.File(dir, "ckpt2").getPath
      val in2 = MemoryStream[(Long, String)]
      val q2 = Sessionize.nearDupIngest(in2.toDS().toDF("doc_id", "text"), out, idx, ckpt2)
      try {
        in2.addData(1L -> "alpha beta gamma delta epsilon zeta eta theta",
          2L -> "one two three four five six seven")
        q2.processAllAvailable()
      } finally q2.stop()
      val idsAfter = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(idsAfter == Seq(1L, 2L, 12L, 13L), "replayed batch duplicated gold rows")
      val sigCountAfter = spark.read.parquet(s"$idx/mh").count()
      val shIdsAfter = spark.read.parquet(s"$idx/sh").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(shIdsAfter == Seq(1L, 2L, 12L, 13L), "replayed batch duplicated shingle index rows")
      assert(new java.io.File(s"$idx/_committed").list().nonEmpty, "commit markers missing")
      assert(sigCountAfter ==
        spark.read.parquet(s"$idx/mh").select("doc_id").distinct().count(),
        "replayed batch duplicated matrix index rows")
    } finally q.stop()
  }

  test("near-dup ingest re-bands its probe on a saturating index: stored matrices regroup, exact copies still drop") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_reband").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[(Long, String)]
    // rowsPerBand = None → the adaptive default: the per-batch shape is
    // measured on the PERSISTED matrix index
    val q = Sessionize.nearDupIngest(in.toDS().toDF("doc_id", "text"), out, idx, ckpt)
    try {
      // batch 1: 600 fixed-4-word-vocabulary docs — the organic-scale
      // failure shape (trigram domain of 64: minhash rows concentrate
      // on the few globally-smallest shingles and (4,3) buckets go
      // fat). The in-batch collapse first removes verified >= 0.5
      // pairs; the SURVIVORS must still saturate the stored index.
      val rnd = new scala.util.Random(13)
      val vocab = Array("alpha", "beta", "gamma", "delta")
      in.addData((0L until 600L).map(i =>
        i -> Seq.fill(30)(vocab(rnd.nextInt(4))).mkString(" ")))
      q.processAllAvailable()
      val g1 = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      // the decision input the NEXT batch will measure: the persisted
      // index really is saturated at (4,3), so the probe re-bands
      val (rows, budget, n) = graft.ext.Dedup.minhashAutoRows(
        spark.read.parquet(s"$idx/mh"))
      assert(rows == 6 && budget > 8L * n,
        s"index must saturate the (4,3) budget (rows=$rows budget=$budget n=$n)")
      // batch 2: exact copies of 10 INDEXED docs — identical minhash
      // rows collide at ANY shape, so the RE-BANDED (2,6) probe must
      // drop every one against the persisted index
      val goldTexts = spark.read.parquet(out)
        .filter(org.apache.spark.sql.functions.col("doc_id").isin(g1.take(10): _*))
        .select("doc_id", "text").collect()
      in.addData(goldTexts.map(r =>
        (r.getLong(0) + 1000000L) -> r.getString(1)).toSeq)
      q.processAllAvailable()
      val gold = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(gold.toSeq == g1.toSeq,
        s"every exact copy must drop through the (2,6) probe (gold grew ${gold.length - g1.length})")
    } finally q.stop()
  }

  test("streaming skew monitor: merged per-batch counts feed Profile.skew exactly") {
    // incremental analytics duality: maintain running per-key counts in
    // a gold table via foreachBatch (partial counts are mergeable by
    // sum — the same reason map-side combine works), then run the BATCH
    // Profile.skew over the running state. The report after N batches
    // must equal the one-shot report over the concatenated input —
    // nothing about the diagnostic is batch-bound.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toFile
    val state = new java.io.File(dir, "counts").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[Long]
    val q = in.toDS().toDF("k")
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.functions._
        val delta = batch.groupBy(col("k")).agg(count(lit(1)).as("c"))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(state)))
            spark.read.parquet(state).unionByName(delta)
              .groupBy(col("k")).agg(sum(col("c")).as("c"))
          else delta
        val tmp = state + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state)
      }
      .start()
    try {
      in.addData(Seq.fill(50)(7L) ++ (101L to 110L): _*) // hot key 7
      q.processAllAvailable()
      in.addData(Seq.fill(30)(7L) ++ (111L to 120L): _*)
      q.processAllAvailable()
      import org.apache.spark.sql.functions._
      // reconstruct the raw multiset from running counts, then compare
      // the streaming-state report against the one-shot batch report
      val fromState = spark.read.parquet(state)
        .select(explode(expr("array_repeat(k, cast(c as int))")).as("k"))
      val oneShot = (Seq.fill(80)(7L) ++ (101L to 120L)).toDF("k")
      val a = graft.ext.Profile.skew(fromState, "k", "stream").collect()(0)
      val b = graft.ext.Profile.skew(oneShot, "k", "stream").collect()(0)
      assert(a == b, s"streaming-state report diverged:\n$a\n$b")
      assert(a.getLong(3) == 80L) // max_n: the hot key
    } finally q.stop()
  }

  test("streaming CMS: per-batch sketches merged by cell sum EQUAL the batch-built sketch") {
    // the CMS merge claim, asserted exactly: cmsBuild is a cell-wise
    // count, so summing per-micro-batch sketches must reproduce the
    // full-data sketch bit-for-bit — which is why a 1000-executor (or
    // streaming) build needs no resketching, only a sum
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toFile
    val cells = new java.io.File(dir, "cells").getPath
    val in = MemoryStream[Long]
    val q = in.toDS().toDF("k")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ext.FreqSketch.cmsBuild(batch, "k", depth = 4, width = 64)
          .write.mode("append").parquet(cells)
      }
      .option("checkpointLocation", new java.io.File(dir, "ckpt").getPath)
      .start()
    try {
      in.addData(1L to 500L: _*)
      q.processAllAvailable()
      in.addData(1L to 300L: _*) // second batch repeats a prefix
      q.processAllAvailable()
      val merged = spark.read.parquet(cells)
        .groupBy("row", "slot").agg(sum("cnt").as("cnt"))
      val full = graft.ext.FreqSketch.cmsBuild(
        spark.range(1, 501).union(spark.range(1, 301)).toDF("k"),
        "k", depth = 4, width = 64)
      assert(merged.except(full).isEmpty && full.except(merged).isEmpty)
      // and the merged sketch still answers queries correctly
      val est = graft.ext.FreqSketch.cmsEstimate(
        merged, spark.range(1, 301).toDF("k"), "k", depth = 4, width = 64)
      assert(est.filter(col("est_n") < 2).isEmpty) // every queried key appeared twice
    } finally q.stop()
  }

  test("streaming HLL: per-batch sketches merge to the EXACT batch-built estimate") {
    // same mergeability claim for the native HLL aggregate: registers
    // are per-set maxima, so merging per-micro-batch sketch binaries
    // reproduces the full-data registers bit-for-bit — a streaming
    // distinct-count needs no state beyond one 4 KB sketch per batch
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_stream").toFile
    val sk = new java.io.File(dir, "sketches").getPath
    val in = MemoryStream[Long]
    val q = in.toDS().toDF("k")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.agg(call_function("graft_hll_sketch", col("k")).as("sk"))
          .write.mode("append").parquet(sk)
      }
      .option("checkpointLocation", new java.io.File(dir, "ckpt").getPath)
      .start()
    try {
      in.addData(1L to 800L: _*)
      q.processAllAvailable()
      in.addData(401L to 1200L: _*) // overlapping second batch
      q.processAllAvailable()
      val mergedEst = spark.read.parquet(sk)
        .agg(call_function("graft_hll_merge_estimate", col("sk")))
        .collect()(0).getLong(0)
      val directEst = spark.range(1, 1201).toDF("k")
        .agg(call_function("graft_hll_distinct", col("k")))
        .collect()(0).getLong(0)
      assert(mergedEst == directEst,
        s"streamed merge $mergedEst != batch-built $directEst")
      assert(math.abs(directEst - 1200L) <= 60L, s"est $directEst off 1200")
    } finally q.stop()
  }

  test("drift monitor diffs each streamed snapshot drop against the base") {
    implicit val s = spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toFile
    val watch = new java.io.File(dir, "drops").getPath
    val out = new java.io.File(dir, "findings").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val base = graft.schema.Snapshot.fromMeta(spark,
      tables = Seq(graft.schema.TableMeta("t1", ""), graft.schema.TableMeta("t2", "")),
      columns = Seq(
        graft.schema.ColumnMeta("t1", "id", 1, "bigint", "", false, "", false),
        graft.schema.ColumnMeta("t1", "name", 2, "text", "", true, "", false),
        graft.schema.ColumnMeta("t2", "id", 1, "bigint", "", false, "", false)))
    // drop s1: t1.name retyped, t2 entirely absent
    Seq(
      ("s1", "t1", "id", 1, "bigint", "", false, "", false),
      ("s1", "t1", "name", 2, "varchar(10)", "", true, "", false))
      .toDF(graft.streaming.DriftMonitor.dropSchema.fieldNames: _*)
      .write.parquet(watch)
    val q = graft.streaming.DriftMonitor.watch(base, watch, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val findings = spark.read.parquet(out)
      .select("snapshot_id", "kind", "check", "table_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(findings.contains(("s1", "column", "column_type", "t1")), findings.toString)
    assert(findings.contains(("s1", "table", "table_missing", "t2")), findings.toString)
    // no spurious index/FK drift from a columns-only drop
    assert(!findings.exists { case (_, k, _, _) => k == "index" || k == "fk" },
      findings.toString)
  }

  test("drift monitor survives kill-and-restart: checkpointed offsets skip batch A, partition overwrite dedups a replay") {
    implicit val s = spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_restart").toFile
    val watch = new java.io.File(dir, "drops").getPath
    val out = new java.io.File(dir, "findings").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val base = graft.schema.Snapshot.fromMeta(spark,
      tables = Seq(graft.schema.TableMeta("t1", "")),
      columns = Seq(
        graft.schema.ColumnMeta("t1", "id", 1, "bigint", "", false, "", false),
        graft.schema.ColumnMeta("t1", "name", 2, "text", "", true, "", false)))
    def land(id: String, nameType: String): Unit =
      Seq((id, "t1", "id", 1, "bigint", "", false, "", false),
        (id, "t1", "name", 2, nameType, "", true, "", false))
        .toDF(graft.streaming.DriftMonitor.dropSchema.fieldNames: _*)
        .coalesce(1).write.mode("append").parquet(watch)
    def findings(): Set[(String, String)] =
      spark.read.parquet(out).select("snapshot_id", "check").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet

    // run 1: snapshot s1 drifts, then the monitor is killed
    land("s1", "varchar(10)")
    val q1 = graft.streaming.DriftMonitor.watch(base, watch, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(findings() == Set("s1" -> "column_type"))

    // run 2: NEW query over the same checkpoint; only s2's drop is new.
    // The restart must not re-diff s1 (checkpointed file offsets), and
    // s2's findings must land exactly once.
    land("s2", "int")
    val q2 = graft.streaming.DriftMonitor.watch(base, watch, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(findings() == Set("s1" -> "column_type", "s2" -> "column_type"))
    val perSnapshot = spark.read.parquet(out)
      .groupBy("snapshot_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSnapshot == Map("s1" -> 1L, "s2" -> 1L),
      s"each snapshot must hold exactly its one finding, got $perSnapshot")

    // run 3: a REPLAYED batch (fresh checkpoint over the same drops +
    // findings dirs — batch ids restart at 0, every drop re-processed).
    // The snapshot_id= partition overwrite must rewrite, not append.
    val ckpt2 = new java.io.File(dir, "ckpt2").getPath
    val q3 = graft.streaming.DriftMonitor.watch(base, watch, out, ckpt2)
    try q3.processAllAvailable() finally q3.stop()
    val after = spark.read.parquet(out)
      .groupBy("snapshot_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == Map("s1" -> 1L, "s2" -> 1L),
      s"replay must overwrite partitions, not duplicate findings: $after")
  }

  test("streaming dedup drops watermark-window duplicates, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // times well past epoch 0: the initial watermark is 1970-01-01,
      // and rows AT the watermark boundary are treated as expired
      in.addData(ev(1, 100, 1, 1.0), ev(1, 100, 1, 1.0), ev(2, 101, 2, 2.0)) // dup id 1
      q.processAllAvailable()
      in.addData(ev(2, 102, 2, 2.0), ev(3, 103, 3, 3.0)) // id 2 again, cross-batch
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("built-in session_window merges gap-bounded sessions on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.sessionWindows(in.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      // user 1: events at 0 and 10 min (one session), and 50 min (second)
      in.addData(ev(1, 0, 1, 1.25), ev(2, 10, 1, 2.50), ev(3, 50, 1, 4.00))
      q.processAllAvailable()
      val rows = spark.table("sw_sessions").orderBy("session_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(3) == 2 && rows(0).getLong(4) == 375L)
      assert(rows(1).getLong(3) == 1 && rows(1).getLong(4) == 400L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions close on gap and emit exact aggregates") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // user 1: two events 10 min apart, then a 40-min gap -> the first
    // session closes when event 3 arrives; the second stays open in state.
    in.addData(ev(1, 0, 1, 1.25), ev(2, 10, 1, 2.50), ev(3, 50, 1, 4.00))
    // NoTimeout + AvailableNow: drain the data, then terminate — with
    // the production ProcessingTimeTimeout the query stays alive to
    // evaluate idle-session timeouts and never terminates.
    val q = Sessionize.sessions(in.toDS(), gapMinutes = 30,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "stream did not terminate")
      val sessions = spark.table("sessions").as[Session].collect()
      assert(sessions.length == 1) // second session still open in state
      val closed = sessions.head
      assert(closed.user_id == 1L)
      assert(closed.n_events == 2L)
      assert(closed.duration_us == 10L * 60 * 1000000L)
      assert(closed.value_cents == 375L)
    } finally q.stop()
  }

  test("phash ingest: perceptual twins are dropped against the persisted index, fresh images pass") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import graft.ext.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("graft_phash_ingest").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[(Long, Array[Byte])]
    val q = MediaIngest.phashIngest(in.toDS().toDF("doc_id", "payload"), out, idx, ckpt)
    try {
      // batch 1: 5 originals — all fresh
      in.addData((0L until 5L).map(id => id -> Multimodal.encodeBmp(id)))
      q.processAllAvailable()
      // batch 2: one-pixel twins of 0..2 (must hit the index) + two new
      in.addData(
        (0L until 3L).map(id => (id + 1000000L) -> Multimodal.perturbBmp(Multimodal.encodeBmp(id))) ++
        Seq(7L -> Multimodal.encodeBmp(7L), 8L -> Multimodal.encodeBmp(8L)))
      q.processAllAvailable()
      val gold = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
      assert(gold.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L),
        s"twins must drop, fresh pass: ${gold.toSeq}")
    } finally q.stop()
  }

  test("phash ingest re-bands its probe on a saturating index: the policy fires and twins still drop") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import graft.ext.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("graft_phash_reband").toFile
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val in = MemoryStream[(Long, Array[Byte])]
    // bands = None → the round-9 adaptive default (per-batch decision
    // measured on the persisted index)
    val q = MediaIngest.phashIngest(in.toDS().toDF("doc_id", "payload"), out, idx, ckpt)
    try {
      // batch 1: 3000 low-entropy formula rasters. The in-batch
      // collapse first thins them to a mutually-non-near survivor set
      // (that is the point of the collapse), so the persisted index
      // holds only survivors — the saturation threshold must be
      // crossed by THAT set, which takes a few thousand seeds.
      in.addData((0L until 3000L).map(id => id -> Multimodal.encodeBmp(id)))
      q.processAllAvailable()
      val g1 = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
      // the decision input the NEXT batch will measure: the persisted
      // index really is saturated, so the probe re-bands to 32-bit
      val (bands, budget, n) = Multimodal.phashAutoBands(
        spark.read.parquet(s"$idx/hashes"))
      assert(bands == 2 && budget > 8L * n,
        s"index must saturate the 16-bit budget (bands=$bands budget=$budget n=$n)")
      // batch 2: twins of 10 INDEXED images (one-pixel edits — band-0
      // footprint at either width); the RE-BANDED probe must catch
      // every one against the persisted index
      val twinSrc = g1.take(10).toSeq
      in.addData(twinSrc.map(id =>
        (id + 1000000L) -> Multimodal.perturbBmp(Multimodal.encodeBmp(id))))
      q.processAllAvailable()
      val gold = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
      assert(gold.toSeq == g1.toSeq,
        s"every twin must drop through the 32-bit probe (gold grew ${gold.length - g1.length})")
    } finally q.stop()
  }

  test("phash ingest survives kill-and-restart: file source + real checkpoint, exactly-once across the restart") {
    // the recovery claim, proven: a REAL file source (not MemoryStream),
    // a REAL checkpoint dir, the query killed between batches and a NEW
    // query object restarted over the same checkpoint/out/index dirs.
    // Batch A must not re-ingest after the restart (checkpointed file
    // offsets + the marker/anti-join sink protocol), batch B must still
    // dedup against A's persisted index, and an idle third restart must
    // change nothing.
    implicit val s = spark
    import graft.ext.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("graft_phash_restart").toFile
    val inDir = new java.io.File(dir, "landing").getPath
    val out = new java.io.File(dir, "gold").getPath
    val idx = new java.io.File(dir, "index").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    def land(rows: Seq[(Long, Array[Byte])]): Unit =
      rows.toDF("doc_id", "payload").coalesce(1)
        .write.mode("append").parquet(inDir)
    def stream() = MediaIngest.phashIngest(
      spark.readStream
        .schema("doc_id LONG, payload BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir),
      out, idx, ckpt)
    def goldIds(): Seq[Long] =
      spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted.toSeq

    // run 1: 5 originals land, then the query is killed
    land((0L until 5L).map(id => id -> Multimodal.encodeBmp(id)))
    val q1 = stream()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(goldIds() == Seq(0L, 1L, 2L, 3L, 4L))

    // run 2: NEW query over the same checkpoint; twins of 0..2 + two
    // fresh land. Batch A is not replayed; twins hit A's index.
    land((0L until 3L).map(id => (id + 1000000L) -> Multimodal.perturbBmp(Multimodal.encodeBmp(id))) ++
      Seq(7L -> Multimodal.encodeBmp(7L), 8L -> Multimodal.encodeBmp(8L)))
    val q2 = stream()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(goldIds() == Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L),
      s"restart must not re-ingest batch A nor miss batch B: ${goldIds()}")

    // run 3: idle restart — nothing new, nothing duplicated
    val q3 = stream()
    try { q3.processAllAvailable() } finally q3.stop()
    assert(goldIds() == Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L), "idle restart must be a no-op")
    val idxIds = spark.read.parquet(s"$idx/hashes").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(idxIds == Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L), "index must hold exactly the gold ids once")
  }
}
