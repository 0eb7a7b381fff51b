package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis, TrainPrep}

/** Round-13: span excision, the batch-phash skew cap, batched deep BPE
  * training, the PCA projection consumer of the Gram buffer, and the
  * curriculum→packing composition.
  */
class Queries13Spec extends SparkSpec {
  import spark.implicits._

  // ── batch phash pair join: bounded under a degenerate corpus ──────

  test("hammingPairs: a corpus of identical hashes yields bounded pairs under the bucket cap, full pairs above it") {
    // 40 identical 64-bit hashes: every banding width puts them all in
    // ONE bucket per band — the degenerate case the re-banding policy
    // cannot save (widening buckets never separates equal hashes)
    val hashes = (0L until 40L).map(i => (i, 0x5a5a5a5a5a5a5a5aL)).toDF("id", "hash")
    val banded = Multimodal.bandedHashes(hashes, bands = 4)
    val capped = Multimodal.hammingPairs(banded, maxHamming = 6, maxBucket = 10)
      .collect()
    // lowest 10 ids per bucket survive -> exactly C(10,2) distinct pairs
    assert(capped.length == 45, s"expected 45 capped pairs, got ${capped.length}")
    assert(capped.forall(r => r.getLong(0) < 10 && r.getLong(1) < 10),
      "cap must keep the lowest ids")
    // above the corpus size the cap is a no-op: all C(40,2) pairs
    val full = Multimodal.hammingPairs(banded, maxHamming = 6, maxBucket = 10000)
    assert(full.count() == 780L)
  }

  // ── spanExcise ────────────────────────────────────────────────────

  test("spanExcise: the corpus-wide first occurrence of a duplicated span is kept, later ones are cut; untouched docs pass through") {
    val docs = Seq(
      (0L, "a b c d e"),   // owns the first occurrence of 'a b c'
      (1L, "x a b c y"),   // its 'a b c'@1 is a later occurrence -> cut
      (2L, "q r s")        // no duplicated span
    ).toDF("doc_id", "text")
    val r = Dedup.spanExcise(docs, w = 3).orderBy("doc_id").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("a b c d e", "x y", "q r s"))
    // doc 1: 3 tokens removed, 1 span excised, 9-3=6 chars removed
    assert(r(1).getLong(2) == 5L && r(1).getLong(3) == 3L &&
      r(1).getLong(4) == 1L && r(1).getLong(5) == 6L)
    assert(r(0).getLong(3) == 0L && r(2).getLong(3) == 0L,
      "docs keeping their spans must lose nothing")
  }

  test("spanExcise: within-doc repetition alone is not cross-doc and is kept; overlapping excised spans remove the position union") {
    val docs = Seq(
      (0L, "m n o p m n o"),  // 'm n o' twice, but only in this doc
      (1L, "u v w x y z"),
      (2L, "u v w x y q")     // shares 3 overlapping spans with doc 1
    ).toDF("doc_id", "text")
    val r = Dedup.spanExcise(docs, w = 3).orderBy("doc_id").collect()
    assert(r(0).getString(1) == "m n o p m n o",
      "within-doc repeats are not cross-doc duplication")
    assert(r(1).getString(1) == "u v w x y z", "first occurrences stay")
    // doc 2's spans @0 @1 @2 all duplicated -> union covers pos 0..4
    assert(r(2).getString(1) == "q")
    assert(r(2).getLong(3) == 5L && r(2).getLong(4) == 3L &&
      r(2).getLong(5) == 10L)
  }

  test("spanExcise: a fully-excised document reports its whole normalized length and stays present") {
    val docs = Seq(
      (0L, "a b c"),
      (1L, "a b c")  // identical: the whole doc is one duplicated span
    ).toDF("doc_id", "text")
    val r = Dedup.spanExcise(docs, w = 3).orderBy("doc_id").collect()
    assert(r.length == 2, "every doc_id present")
    assert(r(0).getString(1) == "a b c" && r(1).getString(1) == "")
    assert(r(1).getLong(3) == 3L && r(1).getLong(5) == 5L)
  }

  test("CorpusClean.clean: the spanExciseWidth flag swaps survivor text for the excised stream with a chars_removed audit") {
    val docs = Seq(
      (0L, "the cat sat on the mat and then went home"),
      (1L, "dogs like the cat sat on the mat too much"),
      (2L, "completely unrelated text with the usual words")
    ).toDF("doc_id", "text")
    val r = graft.ext.CorpusClean.clean(docs, minQuality = 0.0,
        jaccard = 0.99, spanExciseWidth = Some(5))
      .orderBy("doc_id").collect()
    assert(r.length == 3, "no doc dropped at these gates")
    val byId = r.map(x => x.getLong(x.fieldIndex("doc_id")) ->
      x.getString(x.fieldIndex("text"))).toMap
    // doc 1 loses 'the cat sat on the mat' (doc 0 owns the first
    // occurrences of spans 'the cat sat on the'@2 and
    // 'cat sat on the mat'@3 — their position union is 2..7)
    assert(byId(0L) == "the cat sat on the mat and then went home")
    assert(byId(1L) == "dogs like too much")
    val cr = r.map(x => x.getLong(x.fieldIndex("doc_id")) ->
      x.getLong(x.fieldIndex("chars_removed"))).toMap
    assert(cr(1L) > 0 && cr(0L) == 0 && cr(2L) == 0)
  }

  // ── curriculum -> packing composition ─────────────────────────────

  test("curriculumPack: packs never mix phases, run in curriculum order within (phase, bucket), and chunk at the token budget") {
    val docs = (0L until 40L).map { i =>
      // difficulty rises with i: longer docs of increasingly rare words
      val words = (0 to (i % 10).toInt).map(j => s"w${i}_$j") ++ Seq("the", "a")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val r = TrainPrep.curriculumPack(docs, phases = 4, tokenBudget = 8, buckets = 2)
      .collect()
    assert(r.length == 40)
    // cum_tokens is the running sum in (difficulty, doc_id) order per
    // (phase, bucket); pack boundaries respect the budget: the pack id
    // of each doc is the chunk containing its START offset
    val curDf = TrainPrep.curriculumPhases(docs, 4)
      .select("doc_id", "difficulty").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.groupBy(x => (x.getInt(1), x.getLong(2))).foreach { case (_, grp) =>
      val ordered = grp.sortBy(x => (curDf(x.getLong(0)), x.getLong(0)))
      var cum = 0L
      ordered.foreach { row =>
        val n = row.getLong(3)
        assert(row.getLong(5) == cum / 8, "pack_id = start offset div budget")
        cum += n
        assert(row.getLong(4) == cum, "cum_tokens is the running sum")
      }
    }
  }

  test("curriculumPackManifest: per-pack totals reconcile with the doc-grain assignment") {
    val docs = (0L until 30L).map(i => (i, s"alpha beta w$i gamma")).toDF("doc_id", "text")
    val doc = TrainPrep.curriculumPack(docs, 4, 8, 2).collect()
    val man = TrainPrep.curriculumPackManifest(docs, 4, 8, 2).collect()
    val fromDoc = doc.groupBy(x => (x.getInt(1), x.getLong(2), x.getLong(5)))
      .view.mapValues(g => (g.length.toLong, g.map(_.getLong(3)).sum, g.map(_.getLong(0)).sum)).toMap
    assert(man.length == fromDoc.size)
    man.foreach { m =>
      val k = (m.getInt(0), m.getLong(1), m.getLong(2))
      assert(fromDoc(k) == ((m.getLong(3), m.getLong(4), m.getLong(5))),
        s"manifest row $k diverges from doc grain")
    }
  }

  // ── batched deep BPE training ─────────────────────────────────────

  test("bpeTrainMergesBatched: kBatch=1 degenerates to exactly the sequential Sennrich trainer") {
    val docs = Seq(
      (0L, "low low low lower lowest"),
      (1L, "new newer newest low wide")).toDF("doc_id", "text")
    val seq = TextAnalysis.bpeTrainMerges(docs, rounds = 6)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val bat = TextAnalysis.bpeTrainMergesBatched(docs, passes = 6, kBatch = 1, window = 1)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
    assert(seq.toSeq == bat.toSeq,
      "kBatch=1 batched schedule must equal the sequential merge table")
  }

  test("bpeTrainMergesBatched: disjoint top pairs fold in ONE pass; symbol conflicts defer to the next pass") {
    // 'ab' x2 + 'cd' x3: (c,d) and (a,b) share no symbol -> one pass
    val d1 = Seq((0L, "ab ab cd cd cd")).toDF("doc_id", "text")
    val r1 = TextAnalysis.bpeTrainMergesBatched(d1, passes = 4, kBatch = 8, window = 32)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
    assert(r1.toSeq == Seq(
      (1, 1, "c", "d", "cd", 3L),
      (2, 1, "a", "b", "ab", 2L)))
    // 'xy' x3 + 'yx' x2: (y,x) shares both symbols with rank-1 (x,y)
    // -> it must wait for pass 2
    val d2 = Seq((0L, "xy xy xy yx yx")).toDF("doc_id", "text")
    val r2 = TextAnalysis.bpeTrainMergesBatched(d2, passes = 4, kBatch = 8, window = 32)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
    assert(r2.toSeq == Seq(
      (1, 1, "x", "y", "xy", 3L),
      (2, 2, "y", "x", "yx", 2L)))
  }

  test("bpeTrainMergesBatched: every pass's batch is mutually symbol-disjoint (the one-fold-application precondition)") {
    val docs = (0L until 50L).map(i => (i, s"alpha beta gamma w$i delta alpha beta"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrainMergesBatched(docs, passes = 6, kBatch = 8, window = 32)
      .collect()
    assert(m.length > 6, "deep schedule should learn more than one rule per pass somewhere")
    m.groupBy(_.getInt(1)).foreach { case (pass, rows) =>
      val syms = rows.flatMap(r => Seq(r.getString(2), r.getString(3)))
      assert(syms.distinct.length == syms.length,
        s"pass $pass selected symbol-sharing merges: ${syms.mkString(",")}")
    }
  }

  // ── PCA consumer of the Gram buffer ───────────────────────────────

  test("pcaComponents: a rank-1 corpus yields the exact grid direction; deflation zeroes the matrix and the degenerate branch keeps the start vector") {
    // vectors along (3,4): C = 14e6 * [[9,12],[12,16]] on the 1e-3
    // grid; power iteration from (1e6,1e6) hits the fixed point
    // (750000,1000000) in one round and stays
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(6.0f, 8.0f)),
      (2L, Array(-3.0f, -4.0f))).toDF("vec_id", "embedding")
    val comps = Similarity.pcaComponents(vecs, k = 2, iters = 12)
      .orderBy("component", "dim").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(comps.take(2).toSeq == Seq((1, 0, 750000L), (1, 1, 1000000L)))
    // the deflation is EXACT here (every division lands on the grid),
    // so component 2's matrix is zero and the iteration keeps all-1e6
    assert(comps.drop(2).toSeq == Seq((2, 0, 1000000L), (2, 1, 1000000L)))
  }

  test("pcaProject: exact centered projection numerators, partition-invariant") {
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(6.0f, 8.0f)),
      (2L, Array(-3.0f, -4.0f))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pcaProject(df, k = 2, iters = 12).orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val r = run(vecs)
    // hand math: v1=(75e4,1e6); q.v1: 6.25e9 / 1.25e10 / -6.25e9;
    // sx.v1 = 1.25e10; pc1 = 3*qv - 1.25e10
    assert(r == Seq(
      (0L, 6250000000L, 7000000000L, 3L),
      (1L, 25000000000L, 28000000000L, 3L),
      (2L, -31250000000L, -35000000000L, 3L)))
    // centered projections sum to zero by construction
    assert(r.map(_._2).sum == 0L && r.map(_._3).sum == 0L)
    assert(run(vecs.repartition(5)) == r, "projection not partition-invariant")
  }

  // ── GramMatrix: grid-contract violations throw, never wrap ────────

  test("GramMatrix: accumulation past int64 throws (addExact/multiplyExact), not a silent wrap") {
    graft.functions.GraftFunctions.register(spark)
    // 3037000500^2 = 9223372037000250000 > 2^63-1: one row overflows
    // the product cell on the first update
    val big = Seq(Tuple1(Array(3037000500L)), Tuple1(Array(3037000500L)))
      .toDF("q")
    val ex = intercept[Exception] {
      big.agg(call_function("graft_gram", col("q"))).head()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(c => c.isInstanceOf[ArithmeticException] &&
        c.getMessage != null && c.getMessage.contains("overflow")),
      s"expected an ArithmeticException overflow in the cause chain, got $ex")
  }
}
