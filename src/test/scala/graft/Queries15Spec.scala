package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis}

/** Round-14 hardening: the de-skewed span-excision first-occurrence
  * selection (Zipf-hot boilerplate spans), the 128-bit span-key
  * width, and the collision audit behind the width choice.
  */
class Queries15Spec extends SparkSpec {
  import spark.implicits._

  // ── spanExcise de-skew ────────────────────────────────────────────

  test("spanExcise: seeded hot-span corpus — one span in EVERY doc keeps exactly the corpus-wide first occurrence") {
    // the Zipf head case the de-skew exists for: the same 3-token
    // boilerplate pasted into all 200 documents, plus per-doc unique
    // tails so nothing else duplicates
    val docs = (0L until 200L)
      .map(i => (i, s"hot span here u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val r = Dedup.spanExcise(docs, w = 3).orderBy("doc_id").collect()
    assert(r.length == 200)
    val first = r.head
    assert(first.getAs[String]("text_clean") == "hot span here u0a u0b u0c",
      "doc 0 owns the first occurrence and must pass through intact")
    assert(first.getAs[Long]("n_spans_excised") == 0L)
    // every other doc loses exactly the one hot span (3 positions)
    r.tail.foreach { row =>
      assert(row.getAs[Long]("n_spans_excised") == 1L,
        s"doc ${row.getAs[Long]("doc_id")} must excise the hot span once")
      assert(row.getAs[Long]("n_tokens_removed") == 3L)
      val id = row.getAs[Long]("doc_id")
      assert(row.getAs[String]("text_clean") == s"u${id}a u${id}b u${id}c")
    }
  }

  test("spanExcise: the first-occurrence selection is an aggregate, not a key-partitioned window (the 100x hot-key guard)") {
    val docs = Seq((0L, "a b c d"), (1L, "x a b c")).toDF("doc_id", "text")
    val plan = Dedup.spanExcise(docs, w = 3).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      s"spanExcise must not contain any Window node (found ${windows.size}): " +
        "a window over the span key serializes every occurrence of a " +
        "Zipf-hot span into one partition")
  }

  test("spanExcise: narrow and wide key widths agree bit-for-bit on a collision-free corpus") {
    val docs = (0L until 50L)
      .map(i => (i, s"shared lead in t${i}x t${i}y plus shared lead in"))
      .toDF("doc_id", "text")
    val narrow = Dedup.spanExcise(docs, w = 3).orderBy("doc_id").collect()
    val wide = Dedup.spanExcise(docs, w = 3, wideKeys = true).orderBy("doc_id").collect()
    assert(narrow.map(_.toString).toSeq == wide.map(_.toString).toSeq)
  }

  test("crossDocSpans: de-skewed aggregate form matches semantics on a seeded corpus, both widths") {
    val docs = Seq(
      (0L, "p q r s t"),   // owns 'p q r' etc.
      (1L, "z p q r s"),   // shares spans with doc 0
      (2L, "m n o")        // unique, exactly one span at w=3
    ).toDF("doc_id", "text")
    for (wideKeys <- Seq(false, true)) {
      val r = Dedup.crossDocSpans(docs, w = 3, flagPpm = 300000L, wideKeys = wideKeys)
        .orderBy("doc_id").collect()
      assert(r.length == 3)
      // doc 0: spans pqr,qrs,rst -> pqr and qrs duplicated in doc 1
      assert(r(0).getAs[Long]("n_spans") == 3L)
      assert(r(0).getAs[Long]("n_dup_spans") == 2L)
      assert(r(1).getAs[Long]("n_dup_spans") == 2L)
      assert(r(2).getAs[Long]("n_dup_spans") == 0L)
    }
  }

  // ── rotated PQ ────────────────────────────────────────────────────

  test("pqSearchAdcRotated: full-dimension rotation does not lose recall vs raw-axis PQ at equal code budget (the PqRotProbe claim)") {
    // the probe's own configuration on the sf0.001 embeddings (m=8,
    // k=8, recall@5 vs exact full-width cosine). The measured arms:
    // raw 0.1250, rotated-8-rounds 0.1375 here; 0.1875 vs 0.2250
    // (+20% rel) at sf0.01 — the BASELINE-recorded reproduction of
    // round-13's PqWhitenProbe at equal bits. A rank-deficient or
    // decorrelated corpus makes rotation a no-op, so the durable
    // assertion is >=; the strict uplift is pinned at sf0.01 in
    // BASELINE.md where the sample is 10x.
    val df = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vecs = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = df.filter(col("vec_id") < 16)
    val qIds = vecs.map(_._1).filter(_ < 16).sorted.toSeq
    def cosd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) -2.0 else s / math.sqrt(na * nb)
    }
    val dbl = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    val byId = dbl.toMap
    val exact = qIds.map { q =>
      q -> dbl.filter(_._1 != q)
        .map { case (id, v) => (cosd(byId(q), v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
    }.toMap
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.collect()
        .map(r => (r.getLong(r.fieldIndex("q_id")), r.getLong(r.fieldIndex("n_id")),
          r.getInt(r.fieldIndex("rank"))))
        .filter { case (q, nid, _) => q != nid }
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._3).map(_._2).take(5).toSet).toMap
      qIds.map(q => (exact(q) & got.getOrElse(q, Set.empty)).size).sum.toDouble /
        (qIds.size * 5)
    }
    val raw = recallOf(Similarity.pqSearchAdc(df, queries, m = 8, k = 8, topK = 6))
    val rot = recallOf(Similarity.pqSearchAdcRotated(df, queries, m = 8, k = 8, topK = 6))
    assert(rot >= raw,
      s"rotation must not lose recall at equal bits: rotated $rot vs raw $raw")
  }

  // ── wide-key streaming span ingest ────────────────────────────────

  test("spanIngest under wideKeys: prefix parity with the wide-key batch auditor holds (production width end to end)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sb1 = Seq(1L -> "a b c d e f g", 2L -> "a b c d e zz yy", 3L -> "p q r s t u v")
    val sb2 = Seq(11L -> "x1 a b c d e f x2", 12L -> "m n o p q r")
    val dir = java.nio.file.Files.createTempDirectory("graft_spanwide").toFile
    val out = new java.io.File(dir, "gold").getPath
    def goldRows(ids: Seq[Long]) = spark.read.parquet(out)
      .filter(col("doc_id").isin(ids: _*)).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    def auditorRows(prefix: Seq[(Long, String)], ids: Seq[Long]) =
      Dedup.crossDocSpans(prefix.toDF("doc_id", "text"), w = 5, wideKeys = true)
        .filter(col("doc_id").isin(ids: _*)).orderBy("doc_id")
        .collect().map(_.toString).toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.SpanIngest.spanIngest(
      in.toDS().toDF("doc_id", "text"), out,
      new java.io.File(dir, "idx").getPath,
      new java.io.File(dir, "ckpt").getPath, wideKeys = true)
    try {
      in.addData(sb1); q.processAllAvailable()
      assert(goldRows(sb1.map(_._1)) == auditorRows(sb1, sb1.map(_._1)))
      in.addData(sb2); q.processAllAvailable()
      assert(goldRows(sb2.map(_._1)) == auditorRows(sb1 ++ sb2, sb2.map(_._1)),
        "wide-key batch-2 rows diverge from the wide-key prefix auditor")
    } finally q.stop()
  }

  // ── production-depth BPE ──────────────────────────────────────────

  test("chunk-grain BPE reaches >= 1024 merges, replay-audited: prefix-stable under checkpoint cadence, symbol-disjoint, rank-ordered") {
    // the production-depth demonstration the registry key deliberately
    // does NOT run per-round (a ~150-pass train is a batch job, not a
    // gate; its sf0.1/organic throughput is recorded in BASELINE §R14)
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
      .filter(col("doc_id") < 500)
    val deep = TextAnalysis.bpeTrainMergesChunked(docs,
        passes = 176, kBatch = 32, window = 128, chunkChars = 32,
        checkpointEvery = 8)
      .orderBy("merge_idx").collect()
    assert(deep.length >= 1024,
      s"expected >= 1024 merges at 176 passes, got ${deep.length}")
    // replay audit (a): within every pass the selected batch is
    // mutually symbol-disjoint — the precondition that makes the
    // one-fold batch application equal one-by-one application
    deep.groupBy(_.getInt(1)).foreach { case (p, rows) =>
      // per-pair symbol SET: a self-pair (x, x) — merging a run of x —
      // is one symbol, legal, and conflicts only with OTHER pairs
      val sets = rows.map(r => Set(r.getString(2), r.getString(3)))
      val union = sets.flatMap(identity)
      assert(union.distinct.length == sets.map(_.size).sum,
        s"pass $p selected pairs sharing a symbol")
    }
    // replay audit (b): selection happens in rank order, so counts are
    // non-increasing within a pass
    deep.groupBy(_.getInt(1)).foreach { case (p, rows) =>
      val counts = rows.sortBy(_.getInt(0)).map(_.getLong(5))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"pass $p counts not rank-ordered: ${counts.mkString(",")}")
    }
    // replay audit (c): PREFIX STABILITY — an independent shallow run
    // at a DIFFERENT checkpoint cadence reproduces the deep table's
    // first 16 passes bit-for-bit (the trainer is deterministic and
    // lineage truncation is invisible to results)
    val prefix = TextAnalysis.bpeTrainMergesChunked(docs,
        passes = 16, kBatch = 32, window = 128, chunkChars = 32,
        checkpointEvery = 1)
      .orderBy("merge_idx").collect()
    val deepPrefix = deep.filter(_.getInt(1) <= 16)
    assert(prefix.map(_.toString).toSeq == deepPrefix.map(_.toString).toSeq,
      "deep run's first 16 passes diverge from an independent shallow run")
  }

  // ── span-key collision audit ──────────────────────────────────────

  test("spanKeyCollisionAudit: wide keys are collision-free and narrow collisions are non-negative") {
    val docs = (0L until 100L)
      .map(i => (i, s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f"))
      .toDF("doc_id", "text")
    val r = Dedup.spanKeyCollisionAudit(docs, w = 5).collect().head
    val nSpans = r.getAs[Long]("n_spans")
    assert(nSpans == 200L, s"100 docs x 2 distinct 5-spans, got $nSpans")
    assert(r.getAs[Long]("n_keys_wide") == nSpans, "md5-128 must be collision-free here")
    assert(r.getAs[Long]("collisions_wide") == 0L)
    assert(r.getAs[Long]("collisions_narrow") >= 0L)
    assert(r.getAs[Long]("collisions_narrow") ==
      nSpans - r.getAs[Long]("n_keys_narrow"))
  }
}
