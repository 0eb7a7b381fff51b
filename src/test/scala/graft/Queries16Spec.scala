package graft

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity}
import graft.streaming.IngestCommit

/** Round-15: the persisted ANN index (write → reload → serve) and the
  * ingest-directory format guard.
  */
class Queries16Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")
  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  private def freshIx(tag: String): String = {
    val p = s"/tmp/graft_test_ann_$tag"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  // ── persisted index ≡ inline chain ───────────────────────────────

  test("AnnIndex: reloaded index answers bit-identically to the inline rotated chain") {
    val e = embeddings
    val ix = freshIx("roundtrip")
    AnnIndex.write(e, ix)
    val persisted = AnnIndex.searchTopK(spark, ix, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("adc_d2"), col("rank"))
      .collect().toSeq
    val inline = Similarity.ivfPqTopKRotated(e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("adc_d2"), col("rank"))
      .collect().toSeq
    assert(persisted.nonEmpty, "persisted search returned nothing")
    assert(persisted == inline,
      "persisted path diverged from the inline chain")
  }

  test("AnnIndex: rerank serve path matches the inline rotated rerank") {
    val e = embeddings
    val ix = freshIx("rerank")
    AnnIndex.write(e, ix)
    val persisted = AnnIndex.searchRerank(spark, ix, e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("exact_d2"), col("rank"))
      .collect().toSeq
    val inline = Similarity.ivfPqRerankRotated(e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("exact_d2"), col("rank"))
      .collect().toSeq
    assert(persisted.nonEmpty && persisted == inline)
  }

  // ── the PRODUCTION claim: serving never re-trains ─────────────────

  test("AnnIndex: the serve plan contains no Gram/eigen/training stage and scans the corpus only as the query side") {
    val e = embeddings
    val ix = freshIx("planaudit")
    AnnIndex.write(e, ix)
    val served = AnnIndex.searchTopK(spark, ix, e.filter(col("vec_id") < 10))
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("gram"),
      "serve plan re-runs the Gram/eigen training aggregate")
    // the only MAIN-TREE embeddings.parquet scan allowed is the query
    // frame itself; index frames come from the model directory. (The
    // plan STRING also shows the query subtree a second time inside a
    // `dynamicpruning` SubqueryAdaptiveBroadcast — that is the
    // partition-pruning filter over the cell_id-partitioned codes,
    // i.e. the desired probed-lists-only read, not a corpus rescan.)
    val leafScans = served.queryExecution.executedPlan.collectLeaves()
      .count(_.toString.contains("embeddings.parquet"))
    assert(leafScans <= 1,
      s"serve plan scans the corpus $leafScans times — the index must answer from its own artifacts")
    assert(plan.contains("dynamicpruning"),
      "probed search lost dynamic partition pruning over the cell_id-partitioned codes")
    assert(plan.contains("graft_test_ann_planaudit"),
      "serve plan does not read the persisted model directory at all")
  }

  test("AnnIndex: codes are partitioned by cell_id on disk (probed search prunes unvisited lists)") {
    val ix = freshIx("layout")
    AnnIndex.write(embeddings, ix)
    val fs = new org.apache.hadoop.fs.Path(ix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$ix/codes"))
      .map(_.getPath.getName).filter(_.startsWith("cell_id="))
    assert(parts.length == 8, s"expected 8 cell_id= partitions, got ${parts.toSeq}")
  }

  // ── contract widening: external queries rotate through the model ──

  test("AnnIndex: a query vector NOT in the corpus is answered (the inline chain's vec_id-subset narrowing is lifted)") {
    val e = embeddings
    val ix = freshIx("external")
    AnnIndex.write(e, ix)
    // an external query: vec 3's embedding under a fresh id — the
    // exact rerank must find vec 3 itself at distance 0, rank 1
    val external = e.filter(col("vec_id") === 3)
      .select(lit(999999L).as("vec_id"), col("embedding"))
    val r = AnnIndex.searchRerank(spark, ix, e, external)
      .orderBy("rank").collect()
    assert(r.nonEmpty, "external query returned no rows")
    assert(r.head.getAs[Long]("n_id") == 3L &&
      r.head.getAs[Long]("exact_d2") == 0L,
      s"identical external vector must rerank its twin to rank 1, got ${r.head}")
    // and the inline chain REJECTS the same call instead of silently
    // returning empty (round-14 advisor finding)
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKRotated(e, external).collect()
    }
    assert(ex.getMessage.contains("not present in the corpus"))
  }

  test("AnnIndex: load refuses a format-version mismatch") {
    val ix = freshIx("version")
    AnnIndex.write(embeddings, ix)
    spark.read.parquet(s"$ix/meta")
      .withColumn("version", lit(AnnIndex.FormatVersion + 1))
      .write.mode("overwrite").parquet(s"$ix/meta2")
    // swap in the bumped meta
    val fs = new org.apache.hadoop.fs.Path(ix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ix/meta"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$ix/meta2"),
      new org.apache.hadoop.fs.Path(s"$ix/meta"))
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.searchTopK(spark, ix, embeddings.filter(col("vec_id") < 2)).collect()
    }
    assert(ex.getMessage.contains("format version"))
  }

  // ── sampled BPE trainer ───────────────────────────────────────────

  test("bpeTrainMergesSampled: measured head agreement in both grains (exact equality is FALSE at this corpus size — pinned honestly)") {
    import graft.ext.TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 500)
    // The round-14 verdict hypothesized the sampled table EQUALS the
    // full table at these depths. Measured on this corpus it is FALSE
    // in BOTH grains (documented, BASELINE §R15): 500 docs is far too
    // small for rank stability past the Zipf head — word grain agrees
    // for 7 rules then swaps adjacent ranks; chunk grain loses ~half
    // its VOCABULARY to the sample (chunks are mostly doc-unique), so
    // counts don't merely scale. What sampling provably preserves at
    // any corpus size is the HEAD (high-count pairs have relatively
    // tiny sampling noise), and the stable-head depth grows with
    // corpus size — so the spec pins the measured head agreement and
    // set overlap, which is also exactly the tripwire that catches a
    // broken sample predicate.
    val sampledDocs = docs.filter(
      graft.ext.TrainPrep.portableHash(
        concat(lit("bpesample|"), col("doc_id").cast("string"))) % 100 < 50)
    def headAndOverlap(full: Seq[(String, String)], samp: Seq[(String, String)],
        grain: String): Unit = {
      assert(full.nonEmpty && samp.nonEmpty, s"$grain trainer learned nothing")
      assert(samp.take(4) == full.take(4),
        s"$grain Zipf head must agree: ${samp.take(4)} vs ${full.take(4)}")
      // table SIZES differ by regime (the sampled corpus's thinner
      // pair space can select deeper per conflict-filtered pass), so
      // the agreement metric is |∩| / min(|A|,|B|) — rule containment
      // of the shallower table in the deeper one
      val inter = samp.toSet.intersect(full.toSet).size
      val minSz = math.min(samp.size, full.size)
      info(s"$grain agreement: $inter of $minSz (sampled ${samp.size} " +
        s"rules, full ${full.size})")
      assert(inter * 10 >= minSz * 8,
        s"$grain head agreement collapsed: $inter of $minSz")
    }
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.orderBy("merge_idx").select("sym_a", "sym_b")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    headAndOverlap(
      pairs(TextAnalysis.bpeTrainMergesBatched(docs, passes = 8, kBatch = 8, window = 32)),
      pairs(TextAnalysis.bpeTrainMergesBatched(sampledDocs, passes = 8, kBatch = 8, window = 32)),
      "word-grain")
    headAndOverlap(
      pairs(TextAnalysis.bpeTrainMergesChunked(docs,
        passes = 12, kBatch = 32, window = 128, chunkChars = 32,
        checkpointEvery = 4)),
      pairs(TextAnalysis.bpeTrainMergesSampled(docs)),
      "chunk-grain")
  }

  // ── open-world encode (byte fallback / OOV) ───────────────────────

  test("bpeEncodeFallback: replaying the merge table over an IN-vocab chunk reproduces its trained symbol string") {
    import graft.ext.TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 250)
    // closed world: encode the training slice under its own model —
    // zero OOV chunks, and totals equal the closed-world audit's
    val r = TextAnalysis.bpeEncodeFallback(docs, docs).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_oov_chunks") == 0L,
        s"training slice re-encode must be fully in-vocab: $row")
    }
    val closed = TextAnalysis.bpeFertilityChunked(docs)
      .select("lang", "n_chunks", "n_tokens", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    val open = r
      .map(x => (x.getAs[String]("lang"), x.getAs[Long]("n_chunks"),
        x.getAs[Long]("n_tokens"), x.getAs[Long]("n_chars"))).toSet
    assert(open == closed,
      "open-world encode of the training slice diverged from the closed-world audit")
  }

  test("bpeEncodeFallback: unseen chunks are counted as OOV and still fully encoded (total coverage)") {
    import graft.ext.TextAnalysis
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 500)
    val r = TextAnalysis.bpeEncodeFallback(
      all.filter(col("doc_id") < 250), all).collect()
    val totalOov = r.map(_.getAs[Long]("n_oov_chunks")).sum
    assert(totalOov > 0, "the 250/500 split must produce OOV chunks")
    r.foreach { row =>
      // every chunk encodes to >= 1 token: coverage is total
      assert(row.getAs[Long]("n_tokens") >= row.getAs[Long]("n_chunks"), s"$row")
      assert(row.getAs[Long]("n_oov_tokens") > 0 ||
        row.getAs[Long]("n_oov_chunks") == 0L, s"$row")
      // replayed merges COMPRESS: OOV tokens must be fewer than OOV
      // chars would be under a no-merge char fallback... unless no
      // merge applies; weaker monotone bound: tokens <= chars
      assert(row.getAs[Long]("n_tokens") <= row.getAs[Long]("n_chars"), s"$row")
    }
  }

  // ── unigram-LM tokenizer ──────────────────────────────────────────

  test("Unigram: a repeated bigram dominates the learned vocab and the encode uses it") {
    import graft.ext.Unigram
    // 'ab' repeated: the seed counts make 'ab' (and its powers) the
    // hot pieces; after EM the best path of 'ababab...' must use
    // multi-char pieces, not single chars
    val docs = (0L until 50L).map(i => (i, "ab ab ab ab", "xx"))
      .toDF("doc_id", "text", "lang")
    val model = Unigram.unigramTrain(docs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(model.exists(_._1.length > 1), s"no multi-char piece survived: ${model.toSeq}")
    val enc = Unigram.unigramEncode(docs).collect()
    assert(enc.length == 1)
    val row = enc.head
    // 11 chars per doc ('ab▁ab▁ab▁ab'), one 11-char chunk per doc
    assert(row.getAs[Long]("n_chars") == 11L * 50L, s"$row")
    assert(row.getAs[Long]("n_chunks") == 50L, s"$row")
    // multi-char pieces compress: strictly fewer tokens than chars
    assert(row.getAs[Long]("n_tokens") < row.getAs[Long]("n_chars"), s"$row")
    // Viterbi log-mass is negative by construction
    assert(row.getAs[Long]("lp_micro_total") < 0L, s"$row")
  }

  test("Unigram: corpus train/encode invariants on the real slice") {
    import graft.ext.Unigram
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 500)
    val model = Unigram.unigramTrain(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(model.nonEmpty)
    // singles are never pruned (base coverage): every single char of
    // the chunk stream is in the model
    val singles = model.filter(_._2 == 1L).map(_._1).toSet
    val chars = docs.select(explode(split(translate(col("text"), " ", "▁"), "")).as("c"))
      .filter(length(col("c")) > 0).distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(singles),
      s"missing base chars: ${chars -- singles}")
    // scores are the pinned log grid: all negative, count-monotone
    // (a higher count never scores lower)
    val byCount = model.sortBy(_._3).toSeq
    byCount.sliding(2).foreach { w =>
      if (w.size == 2)
        assert(w(0)._3 == w(1)._3 || w(0)._4 <= w(1)._4, s"${w(0)} vs ${w(1)}")
    }
    assert(model.forall(_._4 < 0L))
    val enc = Unigram.unigramEncode(docs).collect()
    assert(enc.length == 5, s"expected 5 langs, got ${enc.length}")
    enc.foreach { row =>
      assert(row.getAs[Long]("n_tokens") >= 1L)
      assert(row.getAs[Long]("n_tokens") <= row.getAs[Long]("n_chars"), s"$row")
      assert(row.getAs[Long]("fertility_ppm") > 0L, s"$row")
    }
  }

  // ── ingest format marker ──────────────────────────────────────────

  test("IngestCommit.assertFormat: first open stamps, matching reopen passes, conflicting reopen throws") {
    val root = freshIx("format_marker")
    IngestCommit.assertFormat(spark, root, "keywidth", "wide128")
    IngestCommit.assertFormat(spark, root, "keywidth", "wide128") // idempotent
    val ex = intercept[IllegalStateException] {
      IngestCommit.assertFormat(spark, root, "keywidth", "narrow64")
    }
    assert(ex.getMessage.contains("keywidth=wide128"))
  }
}
