package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event analytics
  * ([[graft.ext.Events]]): watermarked windowed aggregation and custom
  * session state via `flatMapGroupsWithState`.
  *
  * The reference is batch-only (SURVEY.md §2.4 — no streaming surface),
  * so this is engine extension: the operators a snapshot-watch /
  * continuous-ingest deployment of the engine needs. Both transforms
  * are expressed over a streaming DataFrame and run identically on a
  * batch frame (Spark's unified API) — the specs exercise them through
  * `MemoryStream`.
  *
  * Scale: state is partitioned by user_id (the group key), so state
  * size is bounded by active users within the timeout, not event
  * volume; the watermark bounds out-of-order buffering.
  */
object Sessionize {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long, valueCents: Long)

  case class Session(user_id: Long, start_us: Long, duration_us: Long,
      n_events: Long, value_cents: Long)

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen within the watermark horizon — the ingest-time guard a
    * training-data pipeline puts in front of at-least-once sources.
    * State is bounded by the watermark (ids older than it are evicted),
    * unlike plain `dropDuplicates` whose state grows forever.
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Tumbling-window count/sum per event_type with a watermark for late
    * data — the canonical streaming aggregation shape.
    */
  def windowedCounts(events: DataFrame, windowMinutes: Int = 5,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Stream-static enrichment: join the event stream against a static
    * (batch) dimension frame. The static side is broadcast — each
    * micro-batch joins map-side with no shuffle of the stream and no
    * streaming state at all (unlike stream-stream joins). This is the
    * shape for decorating an ingest stream with reference data
    * (user→segment, doc→license) at 100 TB/day rates.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: attribute each purchase to the same
    * user's clicks within the preceding `windowMinutes`. Both sides are
    * watermarked and the join condition bounds event time on both
    * sides, so Spark evicts join state once the watermark passes the
    * interval — state is O(active interval), not O(stream).
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30, watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Incremental deduplicated ingest via foreachBatch: every
    * micro-batch is exact-deduped within itself AND against everything
    * already written, then appended — the merge pattern for building a
    * dedup'd gold table from an at-least-once stream. The anti-join
    * reads only the (text_hash) column of the existing table (column
    * pruning), so the probe cost scales with table row count, not
    * payload bytes; at warehouse scale the target would be a bucketed
    * table on text_hash making the probe exchange-free.
    */
  def dedupedIngest(docs: DataFrame, outDir: String, checkpoint: String)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val hashed = batch.withColumn("text_hash", md5(col("text")))
          .dropDuplicates("text_hash")
        // existence via the Hadoop FS of the path's scheme — a bare
        // java.io.File check is always false on hdfs:///s3a:// and
        // would silently disable the cross-batch dedup
        val outPath = new org.apache.hadoop.fs.Path(outDir)
        val exists = outPath
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(outPath)
        val fresh =
          if (exists)
            hashed.join(spark.read.parquet(outDir).select("text_hash"),
              Seq("text_hash"), "left_anti")
          else hashed
        fresh.write.mode("append").parquet(outDir)
        ()
      }
      .start()

  /** NEAR-dup incremental ingest — the streaming twin of
    * [[graft.ext.Dedup.minhashLshIncremental]]: each micro-batch is
    * (1) near-dup-collapsed within itself (keep the lowest id of every
    * verified pair), (2) probed against a PERSISTED signature index of
    * everything already ingested — one equi-join on (band_id, sig),
    * exact-Jaccard verify against the stored shingle sets — and
    * (3) appended to the gold table, with the survivors' minhash
    * matrices and shingles appended to the index.
    *
    * The index is two parquet tables under `indexDir`: `mh`
    * (doc_id, mh ARRAY<STRING>) — the RE-BANDABLE layout
    * ([[graft.ext.Dedup.minhashMatrix]]): the 12 minhash rows are
    * stored raw and band keys are derived AT PROBE TIME at the shape
    * the per-batch policy chooses ([[graft.ext.Dedup.minhashAutoRows]]
    * measured on the persisted index — the side that saturates as the
    * library grows; the batch's own matrix decides before any index
    * exists). A saturation-driven re-band therefore never re-hashes
    * the corpus — the next probe simply concatenates the stored rows
    * 6-wide instead of 3-wide. `sh` (doc_id, sh) is read column-pruned
    * for the verified candidates only. Probe cost per batch scales
    * with |batch| × bucket collisions, never |corpus|². At warehouse
    * scale the derive-at-probe layout trades the exchange-free
    * pre-bucketed (band_id, sig) table for re-band freedom: bucketing
    * `mh` by doc_id keeps the anti-join cheap, and the probe's
    * shuffle is |index| band keys — the price of never rewriting the
    * index when the monitor trips. A fixed `rowsPerBand` pins the
    * shape (the pre-policy behavior, kept for shape-sensitivity
    * specs).
    *
    * Idempotence: foreachBatch is at-least-once, and this sink does
    * THREE non-atomic appends (gold, sh, sigs). Two mechanisms make a
    * replay safe: a fully-committed batch leaves a
    * `indexDir/_committed/<batchId>_<contentKey>` marker and replays as a no-op;
    * a partially-committed batch self-heals because each of the three
    * appends anti-joins the doc_ids already present in its target
    * table, so exactly the missing suffix of the three writes lands on
    * retry. The gold append stays FIRST: the probe reads `sigs`, so a
    * doc may be indexed only after it is durably in gold — the reverse
    * order could drop a future duplicate of a doc that never landed.
    */
  def nearDupIngest(
      docs: DataFrame, outDir: String, indexDir: String, checkpoint: String,
      k: Int = 3, rowsPerBand: Option[Int] = None, threshold: Double = 0.5)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.ext.TextPrimitives._
        // register on the MICRO-BATCH's session: foreachBatch hands a
        // cloned session whose function registry does not inherit
        // outer-session registrations
        graft.functions.GraftFunctions.register(batch.sparkSession)
        graft.functions.GraftFunctions.register(spark)
        val mhDir = s"$indexDir/mh"
        val shDir = s"$indexDir/sh"
        val batchKey = IngestCommit.contentKey(batch.toDF())
        if (!IngestCommit.isCommitted(spark, indexDir, batchId, batchKey)) {
          val sh0 = batch.toDF()
            .select(col("doc_id"), col("text"), shingles(tokens(col("text")), k).as("sh"))
            .withColumn("shh", shingleHashes(col("sh")))
            .withColumn("mh", graft.ext.Dedup.minhashMatrix(col("shh")))
            .persist()

          // banding shape through the re-banding POLICY: the persisted
          // index decides (it is what saturates); the batch's own
          // matrix decides before any index exists
          val persistedMh = IngestCommit.readCommitted(spark, mhDir)
          val chosenRows = rowsPerBand.getOrElse(
            graft.ext.Dedup.minhashAutoRows(
              persistedMh.getOrElse(sh0.select(col("doc_id"), col("mh"))))._1)

          // (1) in-batch collapse: lowest id of each verified pair
          // wins, pairs generated at the chosen shape
          val inBatchDrop = graft.ext.Dedup
            .pairsFromBandSigs(
              graft.ext.Dedup.bandSigsFromMatrix(sh0, chosenRows), sh0, threshold)
            .select(col("b_id").as("doc_id")).distinct()
          val kept = batch.toDF().join(inBatchDrop, Seq("doc_id"), "left_anti")
          val sh = sh0.join(kept.select("doc_id"), Seq("doc_id"), "left_semi")

          // (2) probe the corpus index: band keys derived from the
          // stored matrices at the chosen shape, exact-Jaccard verify
          val dupIds = persistedMh match {
            case Some(persisted) =>
              // ONLY the persisted side is bucket-capped (the
              // pairsWithinBuckets skew guard): that side grows with
              // the corpus, so an uncapped hot band bucket expands
              // unboundedly; the batch side is bounded by the
              // micro-batch itself, and capping it would silently skip
              // candidates for in-batch docs past the cap — weakening
              // the streaming-vs-batch prefix-parity contract for no
              // scale benefit
              val cand = graft.ext.Dedup.capBuckets(
                  graft.ext.Dedup.bandSigsFromMatrix(persisted, chosenRows),
                  Seq("band_id", "sig"), "doc_id")
                .withColumnRenamed("doc_id", "old_id")
                .join(graft.ext.Dedup.bandSigsFromMatrix(sh, chosenRows)
                  .withColumnRenamed("doc_id", "new_id"),
                  Seq("band_id", "sig"))
                .select(col("old_id"), col("new_id")).distinct()
              cand
                .join(spark.read.parquet(shDir)
                  .select(col("doc_id").as("old_id"), col("sh").as("a_sh")), Seq("old_id"))
                .join(sh.select(col("doc_id").as("new_id"), col("sh").as("b_sh")), Seq("new_id"))
                .filter(graft.functions.GraftFunctions
                  .jaccardNative(col("a_sh"), col("b_sh")) >= threshold)
                .select(col("new_id").as("doc_id")).distinct()
            case None => kept.select(col("doc_id")).limit(0)
          }

          // (3) append survivors + their index material. Each append
          // anti-joins the ids already in its target so a replay of a
          // partially-committed batch writes exactly the missing suffix
          // (see the idempotence scaladoc note above).
          def notAlreadyIn(frame: DataFrame, dir: String): DataFrame =
            IngestCommit.readCommitted(spark, dir) match {
              case Some(existing) => frame.join(
                existing.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
              case None => frame
            }
          // EAGER lineage truncation, not persist: the probe reads
          // shDir/mhDir, and each append's refreshByPath RE-EXECUTES
          // any cached plan reading the written path — a cached surv
          // would be recomputed against the half-updated index between
          // appends (value-safe here only because mh, the candidate
          // source, is written last; truncation removes the fragility
          // and the silent recompute — see AssembleIngest for the
          // order where the recompute IS value-corrupting).
          val surv = graft.ext.Checkpoints.truncate(
            kept.join(dupIds, Seq("doc_id"), "left_anti"))
          notAlreadyIn(surv, outDir).write.mode("append").parquet(outDir)
          val survSh = graft.ext.Checkpoints.truncate(
            sh.join(surv.select("doc_id"), Seq("doc_id"), "left_semi"))
          notAlreadyIn(survSh.select("doc_id", "sh"), shDir)
            .write.mode("append").parquet(shDir)
          notAlreadyIn(survSh.select("doc_id", "mh"), mhDir)
            .write.mode("append").parquet(mhDir)
          sh0.unpersist()
          IngestCommit.mark(spark, indexDir, batchId, batchKey)
        }
        ()
      }
      .start()

  /** Gap-based sessions via the BUILT-IN `session_window` — the
    * declarative twin of [[sessions]]: Spark merges overlapping
    * per-event windows (ts, ts+gap] per key and closes a session when
    * the watermark passes its end. Prefer this when per-session output
    * (count/sum/bounds) is enough; drop to [[sessions]] only for
    * custom state transitions the built-in can't express.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_cents"))

  /** Gap-based sessions with explicit state: a session closes when its
    * user is idle past `gapMinutes` — emitted only on close, the
    * standard flatMapGroupsWithState pattern.
    *
    * @param timeout how idle sessions are eventually flushed.
    *   ProcessingTimeTimeout (default) re-triggers micro-batches to close
    *   idle sessions even with no traffic — the production setting; note
    *   it keeps the query alive, so `Trigger.AvailableNow` runs never
    *   terminate under it. NoTimeout closes sessions only when a
    *   later event proves the gap — deterministic and terminating, the
    *   right mode for drain-style/batch-replay runs (and tests).
    */
  def sessions(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val timeoutEnabled = timeout != GroupStateTimeout.NoTimeout()

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.last - s.start, s.n, s.valueCents))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000L
              val cents = math.round(e.value * 100)
              cur match {
                case Some(s) if us - s.last <= gapUs =>
                  cur = Some(s.copy(last = us, n = s.n + 1, valueCents = s.valueCents + cents))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.last - s.start, s.n, s.valueCents)
                  cur = Some(SessionState(us, us, 1, cents))
                case None =>
                  cur = Some(SessionState(us, us, 1, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeoutEnabled) state.setTimeoutDuration(s"$gapMinutes minutes")
            }
            closed.reverseIterator
          }
      }
  }
}
