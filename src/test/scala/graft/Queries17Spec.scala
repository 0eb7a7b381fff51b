package graft

import org.apache.spark.sql.functions._

import graft.ext.{TextAnalysis, TokenizerModel, Unigram}
import graft.streaming.IngestCommit

/** Round-16: the native Viterbi expression, persisted tokenizer
  * models, open-world unigram encode, the chunk-model broadcast gate,
  * and the hardened content key.
  */
class Queries17Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")
  private def documents = spark.read.parquet(s"$dir/documents.parquet")

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_test_tok_$tag"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  // ── native Viterbi ≡ pinned procedure ────────────────────────────

  test("UnigramViterbi: hand-pinned DP cases — score max, then fewest pieces, then longest final piece") {
    graft.functions.GraftFunctions.register(spark)
    def seg(w: String, model: Map[String, Long]): (Long, Seq[String], Long) = {
      val r = Seq(w).toDF("w")
        .select(call_function("graft_unigram_viterbi",
          col("w"), typedLit(model), lit(4), lit(null).cast("long")).as("v"))
        .select(col("v.s"), col("v.pieces"), col("v.n_oov")).collect()(0)
      (r.getLong(0), r.getSeq[String](1), r.getLong(2))
    }
    // score wins: "ab" (-10) beats a(-7)+b(-7)=-14
    assert(seg("ab", Map("a" -> -7L, "b" -> -7L, "ab" -> -10L)) ==
      ((-10L, Seq("ab"), 0L)))
    // equal score -> fewest pieces: "ab"(-14) == a+b(-14), one piece wins
    assert(seg("ab", Map("a" -> -7L, "b" -> -7L, "ab" -> -14L)) ==
      ((-14L, Seq("ab"), 0L)))
    // equal score, equal pieces -> SMALLEST start of the final piece
    // (longest final piece): "abc" as a(-6)+bc(-8) vs ab(-8)+c(-6):
    // both -14, both 2 pieces; final piece "bc" starts at 1 < "c" at 2
    assert(seg("abc", Map("a" -> -6L, "b" -> -9L, "c" -> -6L,
      "ab" -> -8L, "bc" -> -8L)) == ((-14L, Seq("a", "bc"), 0L)))
    // code points, not bytes: multibyte '▁' segments cleanly
    assert(seg("▁a", Map("▁" -> -3L, "a" -> -5L, "▁a" -> -7L)) ==
      ((-7L, Seq("▁a"), 0L)))
  }

  test("UnigramViterbi: unseen character throws without fallback, becomes a counted OOV piece with it") {
    graft.functions.GraftFunctions.register(spark)
    val model = Map("a" -> -5L, "b" -> -5L)
    val closed = Seq("aXb").toDF("w")
      .select(call_function("graft_unigram_viterbi",
        col("w"), typedLit(model), lit(4), lit(null).cast("long")).as("v"))
    val ex = intercept[Exception] { closed.collect() }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("absent from the model") ||
        ex.getCause != null && ex.getCause.getMessage.contains("absent from the model")),
      s"expected the fail-fast message, got: ${ex.getMessage}")
    val open = Seq("aXb").toDF("w")
      .select(call_function("graft_unigram_viterbi",
        col("w"), typedLit(model), lit(4), lit(-99L)).as("v"))
      .select(col("v.s"), col("v.pieces"), col("v.n_oov")).collect()(0)
    assert(open.getLong(0) == -109L) // -5 + -99 + -5
    assert(open.getSeq[String](1) == Seq("a", "X", "b"))
    assert(open.getLong(2) == 1L)
  }

  // ── open world: fallback really fires; closed world: exact twin ──

  test("unigramEncodeFallback: closed-world inputs reproduce unigramEncode exactly") {
    val d = documents.filter(col("doc_id") < 120)
    val base = Unigram.unigramEncode(d).orderBy("lang").collect().toSeq
    val fb = Unigram.unigramEncodeFallback(d, d).orderBy("lang")
      .drop("n_oov_chunks", "n_oov_chars", "oov_chunk_ppm")
      .collect().toSeq
    assert(base.nonEmpty && fb == base,
      "fallback encode over a training-covered corpus must equal the closed-world encode")
    val oov = Unigram.unigramEncodeFallback(d, d)
      .agg(sum("n_oov_chars")).collect()(0).getLong(0)
    assert(oov == 0L, s"no character can be OOV when train == encode, got $oov")
  }

  test("unigramEncodeFallback: withheld characters are genuinely OOV (the registry split fires the branch)") {
    val d = documents.filter(col("doc_id") < 500)
    val r = Unigram.unigramEncodeFallback(d.filter(!col("text").contains("q")), d)
      .agg(sum("n_oov_chars").as("oov"), sum("n_oov_chunks").as("oc"))
      .collect()(0)
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L,
      s"the q-withheld split must produce real OOV, got $r")
  }

  // ── persisted tokenizer models ───────────────────────────────────

  test("TokenizerModel(unigram): persisted encode is bit-identical to the inline chain") {
    val d = documents.filter(col("doc_id") < 200)
    val md = freshDir("ug_roundtrip")
    TokenizerModel.writeUnigram(d, md)
    val persisted = TokenizerModel
      .unigramEncodePersisted(spark, md, d, openWorld = false)
      .orderBy("lang").collect().toSeq
    val inline = Unigram.unigramEncode(d).orderBy("lang").collect().toSeq
    assert(persisted.nonEmpty && persisted == inline,
      "persisted unigram encode diverged from the inline train-then-encode chain")
  }

  test("TokenizerModel(unigram): the serve plan has NO training stage — documents scanned once, model read from the directory") {
    val d = documents.filter(col("doc_id") < 200)
    val md = freshDir("ug_planaudit")
    TokenizerModel.writeUnigram(d, md)
    val served = TokenizerModel.unigramEncodePersisted(spark, md, d)
    val leaves = served.queryExecution.executedPlan.collectLeaves()
    val docScans = leaves.count(_.toString.contains("documents.parquet"))
    assert(docScans == 1,
      s"persisted encode must scan the corpus exactly once, got $docScans")
    // the model rides as the native-expression literal: NO scan of the
    // model dir in the distributed plan either — the plan is pure map
    // + partial agg (zero joins, zero exchanges beyond the final agg)
    val planStr = served.queryExecution.executedPlan.toString
    assert(!planStr.contains("Join"),
      "persisted unigram encode must be join-free (model is a literal)")
  }

  test("TokenizerModel(bpe): persisted encode is bit-identical to the inline fallback chain") {
    val d = documents.filter(col("doc_id") < 200)
    val train = d.filter(col("doc_id") < 100)
    val md = freshDir("bpe_roundtrip")
    TokenizerModel.writeBpe(train, md)
    val persisted = TokenizerModel.bpeEncodePersisted(spark, md, d)
      .orderBy("lang").collect().toSeq
    val inline = TextAnalysis.bpeEncodeFallback(train, d)
      .orderBy("lang").collect().toSeq
    assert(persisted.nonEmpty && persisted == inline,
      "persisted BPE encode diverged from the inline train-then-encode chain")
  }

  test("TokenizerModel: version and kind guards refuse mis-reads") {
    val d = documents.filter(col("doc_id") < 60)
    val md = freshDir("guards")
    TokenizerModel.writeUnigram(d, md)
    // kind mismatch
    val exKind = intercept[IllegalArgumentException] {
      TokenizerModel.bpeEncodePersisted(spark, md, d).collect()
    }
    assert(exKind.getMessage.contains("'unigram' model"))
    // version mismatch
    spark.read.parquet(s"$md/meta")
      .withColumn("version", lit(TokenizerModel.FormatVersion + 1))
      .write.mode("overwrite").parquet(s"$md/meta2")
    val fs = new org.apache.hadoop.fs.Path(md)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$md/meta"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$md/meta2"),
      new org.apache.hadoop.fs.Path(s"$md/meta"))
    val exVer = intercept[IllegalArgumentException] {
      TokenizerModel.unigramEncodePersisted(spark, md, d).collect()
    }
    assert(exVer.getMessage.contains("format version"))
  }

  // ── chunk-model broadcast gate ───────────────────────────────────

  test("gatedChunkModel: under budget broadcasts, over budget shuffles (plan-only routing)") {
    val d = documents.filter(col("doc_id") < 100)
    val chunks = d.select(explode(split(col("text"), " ")).as("w"))
    val model = chunks.groupBy("w").agg(count(lit(1)).cast("long").as("n_tok"))
    def planOf(budget: Long): String = chunks
      .join(TextAnalysis.gatedChunkModel(model, budget), Seq("w"))
      .groupBy("w").agg(sum("n_tok"))
      .queryExecution.executedPlan.toString
    // isolate the GATE's routing: at test scale BOTH sides are tiny,
    // so Spark's size-based auto-broadcast would pick the corpus side
    // anyway (at production scale that side is the 100 TB stream);
    // the explicit broadcast() hint is threshold-independent
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(planOf(1000000L).contains("BroadcastHashJoin"),
        "a model under the budget must broadcast")
      val big = planOf(0L)
      assert(!big.contains("BroadcastHashJoin"),
        s"a model over the budget must NOT broadcast:\n$big")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  // ── content key: the advisor's cancellation counterexample ───────

  test("IngestCommit.contentKey: duplicate-paired multisets no longer collide, order still free") {
    val aac = Seq("a", "a", "c").toDF("doc_id")
    val bbc = Seq("b", "b", "c").toDF("doc_id")
    assert(IngestCommit.contentKey(aac) != IngestCommit.contentKey(bbc),
      "XOR-cancelling multisets {a,a,c} vs {b,b,c} must differ under the summed key")
    val caa = Seq("c", "a", "a").toDF("doc_id").repartition(3)
    assert(IngestCommit.contentKey(aac) == IngestCommit.contentKey(caa),
      "the key must stay order- and partitioning-independent")
    // multiplicity matters now: {a} vs {a,a,a} (same xor: h^h^h = h)
    val a1 = Seq("a").toDF("doc_id")
    val a3 = Seq("a", "a", "a").toDF("doc_id")
    assert(IngestCommit.contentKey(a1) != IngestCommit.contentKey(a3))
  }

  // ── tokenize-at-admission under the frozen persisted model ───────

  test("TokenizeIngest: gold equals the one-shot batch encode, replay adds nothing, unseen chars are counted not fatal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val md = freshDir("ingest_model")
    TokenizerModel.writeUnigram(
      documents.filter(col("doc_id") < 150 && !col("text").contains("q")), md)
    val root = java.nio.file.Files.createTempDirectory("graft_tok_ingest").toFile
    val out = new java.io.File(root, "out").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath
    val b1 = documents.filter(col("doc_id") < 60)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val b2 = documents.filter(col("doc_id") >= 60 && col("doc_id") < 120)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq :+
      ((999L, "en", "qqq brand new text with the withheld letter q"))
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.TokenizeIngest.tokenizeIngest(
      in.toDS().toDF("doc_id", "lang", "text"), md, out, ckpt)
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val gold = spark.read.parquet(s"$out/gold")
      .orderBy("doc_id").collect().toSeq
    val all = documents.filter(col("doc_id") < 120)
      .select("doc_id", "lang", "text")
      .unionByName(Seq((999L, "en", "qqq brand new text with the withheld letter q"))
        .toDF("doc_id", "lang", "text"))
    val oneShot = graft.streaming.TokenizeIngest.batchEncode(spark, md, all)
      .orderBy("doc_id").collect().toSeq
    assert(gold.nonEmpty && gold == oneShot,
      "streamed gold diverged from the one-shot frozen-model encode")
    // the withheld-letter doc was admitted WITH its OOV accounting
    val novel = gold.find(_.getAs[Long]("doc_id") == 999L).get
    assert(novel.getAs[Long]("n_oov_chars") > 0L,
      "unseen characters must be counted, not dropped or fatal")
    // replay with a fresh checkpoint (batch ids restart at 0): the
    // content-keyed markers + anti-join must add nothing
    val ckpt2 = new java.io.File(root, "ckpt2").getPath
    val in2 = MemoryStream[(Long, String, String)]
    val q2 = graft.streaming.TokenizeIngest.tokenizeIngest(
      in2.toDS().toDF("doc_id", "lang", "text"), md, out, ckpt2)
    try {
      in2.addData(b1: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = spark.read.parquet(s"$out/gold").orderBy("doc_id").collect().toSeq
    assert(after == gold, "replayed batch duplicated gold rows")
  }

  // ── Lloyd-trained quantizers ─────────────────────────────────────

  test("ivfPqTopKRotatedKmeans: deterministic, and the trained quantizers genuinely move off the seeds") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val a = graft.ext.Similarity.ivfPqTopKRotatedKmeans(e, q)
      .orderBy("q_id", "rank").collect().toSeq
    val b = graft.ext.Similarity.ivfPqTopKRotatedKmeans(e, q)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a.nonEmpty && a == b, "k-means build must be run-to-run deterministic")
    val seeded = graft.ext.Similarity.ivfPqTopKRotated(e, q)
      .orderBy("q_id", "rank").collect().toSeq
    assert(a != seeded,
      "2 Lloyd rounds left every centroid exactly on its seed — training is a no-op?")
  }

  test("AnnIndex.write(lloydIters=2): persisted trained index answers bit-identically to the inline kmeans chain") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val ix = freshDir("ann_kmeans")
    graft.ext.AnnIndex.write(e, ix, lloydIters = 2)
    val persisted = graft.ext.AnnIndex.searchTopK(spark, ix, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("adc_d2"), col("rank"))
      .collect().toSeq
    val inline = graft.ext.Similarity.ivfPqTopKRotatedKmeans(e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("adc_d2"), col("rank"))
      .collect().toSeq
    assert(persisted.nonEmpty && persisted == inline,
      "persisted trained-quantizer index diverged from the inline kmeans chain")
  }

  // ── incremental append under the frozen model ────────────────────

  test("AnnIndex.append: appended twins serve bit-identically, replay is a no-op, model files are untouched") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val ix = freshDir("ann_append")
    graft.ext.AnnIndex.write(e, ix)
    def snap(part: String) = spark.read.parquet(s"$ix/$part")
      .collect().map(_.toString).sorted.toSeq
    val rotBefore = snap("rotation")
    val centBefore = snap("centroids")
    val cbBefore = snap("codebook")
    val twins = e.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
    val n1 = graft.ext.AnnIndex.append(spark, ix, twins)
    assert(n1 == e.count(), s"first append must admit every new id, got $n1")
    // replay self-heals: same batch again appends NOTHING
    val n2 = graft.ext.AnnIndex.append(spark, ix, twins)
    assert(n2 == 0L, s"replayed append must be a no-op, appended $n2")
    // frozen model: no training artifact changed
    assert(snap("rotation") == rotBefore && snap("centroids") == centBefore &&
      snap("codebook") == cbBefore, "append must not touch the trained model")
    // a twin encodes bit-identically to its original — the frozen-model
    // claim pinned at the CODES level (cell assignment + every
    // subspace code equal), which is exactly what makes the registry
    // key's codes-UNION oracle valid. (A served-top-k pairing check
    // would be flaky here: ADC distances tie corpus-wide at this tiny
    // codebook, so rank order fills with small ids first.)
    val codes = spark.read.parquet(s"$ix/codes")
      .select("n_id", "cell_id", "sub", "cid").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3)))).toSeq
    val orig = codes.filter(_._1 < 1000000L).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val twinned = codes.filter(_._1 >= 1000000L).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    assert(orig.nonEmpty && twinned.size == orig.size)
    orig.foreach { case (nid, cs) =>
      assert(twinned(nid + 1000000L) == cs,
        s"twin of $nid encoded differently under the frozen model")
    }
    // and the served path does read the twinned index (2x the lists)
    val served = graft.ext.AnnIndex.searchTopK(spark, ix,
      e.filter(col("vec_id") < 5), topK = 10).collect()
    assert(served.nonEmpty)
  }

  test("IngestCommit.assertFormat: conflicting markers from a raced first open are detected, not silently tolerated") {
    val root = freshDir("fmt_race")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the race's end state: both stamps landed
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_format/keywidth=wide128"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_format/keywidth=narrow64"))
    val ex = intercept[IllegalStateException] {
      IngestCommit.assertFormat(spark, root, "keywidth", "wide128")
    }
    assert(ex.getMessage.contains("was created with") ||
      ex.getMessage.contains("conflicting"),
      s"conflicting markers must throw, got: ${ex.getMessage}")
  }
}
