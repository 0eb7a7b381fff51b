package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity}

/** Round-12: the native mergeable Gram accumulator + the covariance
  * audit built on it, cross-doc span-level dedup, and the lossless
  * explicit-palette GIF seam.
  */
class Queries12Spec extends SparkSpec {
  import spark.implicits._

  // ── GramMatrix / dimCovariance ────────────────────────────────────

  private val tinyVecs = Seq(
    (0L, Array(1.0f, 2.0f, -1.0f)),
    (1L, Array(2.0f, 0.0f, 1.0f)),
    (2L, Array(0.0f, 1.0f, 3.0f)),
    (3L, Array(-1.0f, 1.0f, 0.0f)))

  test("GramMatrix: one-pass native buffer equals the compositional explode formulation, under any partitioning") {
    graft.functions.GraftFunctions.register(spark)
    val df = tinyVecs.toDF("vec_id", "embedding")
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1e3).cast("long")).as("q"))
    def packed(frame: org.apache.spark.sql.DataFrame): Seq[Long] =
      frame.agg(call_function("graft_gram", col("q"))).head().getSeq[Long](0)
    val g = packed(df)
    // partitioning/merge-order invariance: same multiset, any split
    assert(packed(df.repartition(7)) == g, "gram buffer not partition-invariant")
    assert(packed(df.repartition(1)) == g, "gram buffer not partition-invariant")
    // compositional re-derivation: explode to (dim, value), self-join
    val x = tinyVecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), posexplode(
        transform(col("embedding"),
          v => round(v.cast("double") * 1e3).cast("long"))).as(Seq("d", "v")))
    val d = 3
    val n = x.groupBy().agg(countDistinct("vec_id")).head().getLong(0)
    assert(g(0) == n)
    val sums = x.groupBy("d").agg(sum("v").as("s")).orderBy("d")
      .collect().map(_.getLong(1))
    assert(g.slice(1, 1 + d) == sums.toSeq, "per-dim sums diverge")
    val prods = x.as("a").join(x.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.d") <= col("b.d"))
      .groupBy(col("a.d").as("i"), col("b.d").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("p"))
      .orderBy("i", "j").collect().map(_.getLong(2))
    assert(g.drop(1 + d) == prods.toSeq, "product triangle diverges")
  }

  test("dimCovariance: exact integer numerators on a hand corpus; empty corpus yields an empty frame") {
    val r = Similarity.dimCovariance(tinyVecs.toDF("vec_id", "embedding"), topK = 3)
      .orderBy("rank").collect()
    // hand math on the 1e3 grid: q0=(1000,2000,-1000), q1=(2000,0,1000),
    // q2=(0,1000,3000), q3=(-1000,1000,0); n=4
    // cov(0,1) = 4*Σx0x1 - Σx0Σx1 = 4*(2e6+0+0-1e6) - 2e3*4e3 = 4e6-8e6 = -4e6
    // cov(0,2) = 4*(-1e6+2e6+0+0) - 2e3*3e3 = 4e6-6e6 = -2e6
    // cov(1,2) = 4*(-2e6+0+3e6+0) - 4e3*3e3 = 4e6-12e6 = -8e6
    val byPair = r.map(x => ((x.getInt(1), x.getInt(2)), x.getLong(3))).toMap
    assert(byPair == Map((0, 1) -> -4000000L, (0, 2) -> -2000000L, (1, 2) -> -8000000L))
    // rank = |cov| desc: (1,2) then (0,1) then (0,2)
    assert(r.map(x => (x.getInt(1), x.getInt(2))).toSeq ==
      Seq((1, 2), (0, 1), (0, 2)))
    assert(r.forall(_.getLong(4) == 4L), "n_rows evidence wrong")
    val empty = Similarity.dimCovariance(
      tinyVecs.toDF("vec_id", "embedding").limit(0), topK = 3)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq ==
      Seq("rank", "dim_i", "dim_j", "cov_num", "n_rows"))
  }

  // ── crossDocSpans ─────────────────────────────────────────────────

  test("crossDocSpans: shared w-token spans across docs are flagged; short docs report zeros, never drop") {
    val docs = Seq(
      // 6 tokens -> 2 spans; shares span "a b c d e" with doc 2
      (1L, "a b c d e f"),
      // 5 tokens -> 1 span, duplicated -> ppm 1e6, contaminated
      (2L, "a b c d e"),
      // 6 tokens -> 2 spans, none shared
      (3L, "p q r s t u"),
      // 3 tokens -> zero spans
      (4L, "x y z")).toDF("doc_id", "text")
    val r = Dedup.crossDocSpans(docs, w = 5, flagPpm = 300000L)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, 2L, 1L, 500000L, true),   // 1 of 2 spans duplicated
      (2L, 1L, 1L, 1000000L, true),  // its only span is the shared one
      (3L, 2L, 0L, 0L, false),
      (4L, 0L, 0L, 0L, false)))      // < w tokens: present with zeros
  }

  test("crossDocSpans: within-doc repetition alone is NOT cross-doc duplication") {
    val docs = Seq(
      (1L, "a b c d e a b c d e"), // repeats its own span; no other doc has it
      (2L, "k l m n o p")).toDF("doc_id", "text")
    val r = Dedup.crossDocSpans(docs, w = 5).orderBy("doc_id").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(0L, 0L),
      "self-repetition must not count as cross-doc duplication")
  }

  test("GramMatrix contract edges: zero-width vectors are a legal empty-moment corpus; a malformed buffer and NULL components fail loudly") {
    graft.functions.GraftFunctions.register(spark)
    // zero-width vectors -> packed = [n] (d = 0): both audits emit
    // zero pair/dim rows instead of spinning in the d-derivation
    val zeroDim = Seq((0L, Array.empty[Float]), (1L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    assert(Similarity.dimCovariance(zeroDim, topK = 4).collect().isEmpty)
    assert(Similarity.dimVariance(zeroDim).collect().isEmpty)
    // a length no dimension produces (1+d+d(d+1)/2 is never 2) fails
    // loudly, not forever
    val ex = intercept[RuntimeException](
      Similarity.covFromGram(spark, Seq(1L, 2L), topK = 4))
    assert(ex.getMessage.contains("malformed gram buffer"))
    // NULL vector component: loud, never folded as 0
    val withNull = Seq(Tuple1(Array[java.lang.Long](1L, null, 3L)))
      .toDF("q")
    val err = intercept[Exception] {
      withNull.agg(call_function("graft_gram", col("q"))).collect()
    }
    assert(err.toString.contains("NULL vector component") ||
      Option(err.getCause).exists(_.toString.contains("NULL vector component")),
      s"expected the loud NULL-component failure, got: $err")
  }

  test("dimVariance: exact diagonal numerators, ranked") {
    // dim0: sx=2000, sxx=6e6 -> 4*6e6-4e6 = 2.0e7
    // dim1: sx=4000, sxx=6e6 -> 2.4e7-1.6e7 = 0.8e7
    // dim2: sx=3000, sxx=11e6 -> 4.4e7-0.9e7 = 3.5e7
    val r = Similarity.dimVariance(tinyVecs.toDF("vec_id", "embedding"))
      .orderBy("rank").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getLong(2)))
    assert(r.toSeq == Seq((1, 2, 35000000L), (2, 0, 20000000L), (3, 1, 8000000L)))
  }

  // ── bpeTrainMerges ────────────────────────────────────────────────

  test("bpeTrainMerges: hand-traced merge sequence, word-frequency weighting, and early stop when pairs run out") {
    // "aaab"x3 + "ab"x2: r1 (a,a)=6 -> r2 (a,b)=5 -> r3 (aa,ab)=3 -> dry
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.bpeTrainMerges(docs, rounds = 4)
      .orderBy("round").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)),
      s"merge sequence diverged: ${r.mkString(",")}")
  }

  test("bpeTrainMerges: merge application is greedy left-to-right non-overlapping") {
    // 'a a a a' under (a,a) must become 'aa aa' (2 merges), not 3
    // overlapping counts — so round 2 learns (aa,aa)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.bpeTrainMerges(docs, rounds = 4)
      .orderBy("round").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(4)))
    assert(r.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)),
      s"greedy merge contract violated: ${r.mkString(",")}")
  }

  test("bpeTrainMerges round 1 equals bpePairCounts' top row (the one-round operator is the trainer's first step)") {
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val first = graft.ext.TextAnalysis.bpeTrainMerges(docs, rounds = 1).collect().head
    val top = graft.ext.TextAnalysis.bpePairCounts(docs, k = 1).collect().head
    assert((first.getString(1), first.getString(2), first.getLong(4)) ==
      (top.getString(1), top.getString(2), top.getLong(3)),
      "trainer round 1 diverged from the pair-count operator's argmax")
  }

  // ── curriculumPhases ──────────────────────────────────────────────

  test("curriculumPhases: phases are monotone in difficulty, cover every doc, and order deterministically within a phase") {
    // 8 docs: ids 0-3 all-common tokens (rare_ppm 0, difficulty =
    // length), ids 4-7 increasingly rare-token-heavy
    val docs = Seq(
      (0L, "a a a"), (1L, "a a a a"), (2L, "a a a a a"), (3L, "a a a a a a"),
      (4L, "a a a z4"), (5L, "a a z5a z5b"), (6L, "a z6a z6b z6c"),
      (7L, "z7a z7b z7c z7d")).toDF("doc_id", "text")
    val r = graft.ext.TrainPrep.curriculumPhases(docs, phases = 4)
      .orderBy("doc_id").collect()
    assert(r.length == 8, "every doc must band somewhere")
    // difficulty ordering implies phase ordering (monotone banding)
    val byDifficulty = r.sortBy(x => (x.getLong(3), x.getLong(0)))
    assert(byDifficulty.map(_.getInt(4)).toSeq == byDifficulty.map(_.getInt(4)).sorted.toSeq,
      "phase must be monotone in difficulty")
    // n=8, quartiles at ranks 2/4/6: exactly 2 docs per phase
    assert(r.groupBy(_.getInt(4)).view.mapValues(_.length).toMap ==
      Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2))
    // positions are 1..2 within each phase, ordered by (difficulty, id)
    r.groupBy(_.getInt(4)).foreach { case (_, rows) =>
      assert(rows.sortBy(x => (x.getLong(3), x.getLong(0)))
        .map(_.getLong(5)).toSeq == Seq(1L, 2L))
    }
    // the all-common docs are the easy phase; the all-rare doc is hardest
    assert(r.find(_.getLong(0) == 0L).get.getInt(4) == 1)
    assert(r.find(_.getLong(0) == 7L).get.getInt(4) == 4)
  }

  test("curriculumPhases: corpora smaller than the phase count band vacuously (absent order statistics)") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = graft.ext.TrainPrep.curriculumPhases(docs, phases = 4)
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    // n=2: rank 2·2/4=1 exists, ranks 0 vacuous -> both docs still band
    assert(r.forall(x => x.getInt(4) >= 1 && x.getInt(4) <= 4))
  }

  // ── PortableHash native expression ────────────────────────────────

  test("PortableHash native expression equals the compositional md5-fold, including empty/unicode/null") {
    val strs: Seq[String] = Seq("", "a", "hello world", "üñïçødé ✓✗",
      "a b c d e", "\t\n", "0" * 500) ++
      (0 until 200).map(i => s"doc-$i-${"x" * (i % 17)}")
    val df = (strs :+ null).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val compositional = aggregate(
      transform(split(md5(col("s")), ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, x) => (acc * 31L + x) % 1000000007L)
    val bad = df.select(col("id"),
        graft.ext.TrainPrep.portableHash(col("s")).as("native"),
        compositional.as("comp"))
      .filter(!(col("native") <=> col("comp"))).collect()
    assert(bad.isEmpty, s"native/compositional divergence: ${bad.mkString(",")}")
  }

  // ── GIF seam ──────────────────────────────────────────────────────

  test("GIF encode is lossless: decoded stats equal the BMP tier's for every raster shape, including sub-8-row heights") {
    // ids 0..44 cover all (width, height) residue combinations; the
    // h=4 rows (id % 5 == 0) are the non-interlace regression class
    for (id <- 0L until 45L) {
      val viaGif = Multimodal.decodeImage(id, Multimodal.encodeGif(id))
      val viaBmp = Multimodal.decodeBmp(id, Multimodal.encodeBmp(id))
      assert(viaGif == viaBmp, s"GIF decode diverged from BMP stats at id=$id")
    }
  }
}
