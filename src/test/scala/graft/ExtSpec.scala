package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext._

/** Unit tests for the dataset-scale extension operators over hand-built
  * frames and the sf0.001 testdata (the full DuckDB cross-check runs in
  * the driver's correctness gate; these pin semantics and edge cases).
  */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val d = docsDf(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val r = Dedup.exact(d).orderBy("keep_id").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("edge cases: unicode, empty, and sub-shingle-width docs don't break dedup/text ops") {
    val d = docsDf(
      1L -> "héllo wörld 한글 텍스트 données мир",
      2L -> "héllo wörld 한글 텍스트 données мир", // exact unicode dup
      3L -> "",
      4L -> "solo",
      5L -> "two words")
    // exact dedup groups the unicode pair byte-identically
    val ex = Dedup.exact(d).collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(ex(1L) == 2L)
    // shingle-based ops must not crash on docs shorter than the width
    assert(Dedup.minhashLsh(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L)))
    assert(Dedup.simhashNearPairs(d).count() >= 1) // the unicode pair at least
    // bigrams: empty + single-word docs contribute nothing, no crash
    val bg = TextAnalysis.topBigrams(d, 10).collect()
    assert(bg.map(_.getString(0)).contains("two words"))
    assert(!bg.map(_.getString(0)).exists(_.contains("solo")))
    // PII redaction is a no-op on PII-free unicode text
    val red = d.select(TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSet
    assert(red.contains("héllo wörld 한글 텍스트 données мир"))
  }

  test("ANN recall vs exact brute force is measured and bounded") {
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val qs = e.filter(col("vec_id") < 16)
    val k = 5
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(e, qs, k))
    val lsh1 = hits(Similarity.lshTopK(e, qs, k, bits = 8))
    val lsh3 = hits(Similarity.lshTopK(e, qs, k, bits = 8, probes = 3))
    val ivf = hits(Similarity.ivfTopK(e, qs, k, cells = 16, probes = 3))
    def recall(approx: Set[(Long, Long)]) =
      (approx & exact).size.toDouble / exact.size
    // deterministic corpus + deterministic algorithms: these are fixed
    // numbers (measured: lsh1=0.025 lsh3=0.075 ivf=0.9625), asserted as
    // floors so a regression (bucketing bug, probe-order bug) trips the
    // spec. The LSH numbers are the real behavior of 8 sign bits on a
    // 500-vector corpus: 256 buckets over-partition it (~2 vectors per
    // bucket), so most true neighbors land elsewhere — IVF with 3-of-16
    // probed cells is the right index at this corpus:bucket ratio, and
    // its 0.96 recall shows the quantized-cosine math itself is sound.
    info(s"recall: lsh1=${recall(lsh1)} lsh3=${recall(lsh3)} ivf=${recall(ivf)}")
    assert(recall(lsh3) >= recall(lsh1),
      s"multi-probe must not lose recall: ${recall(lsh3)} < ${recall(lsh1)}")
    assert(recall(lsh3) >= 0.05, s"lsh3 recall ${recall(lsh3)}")
    assert(recall(ivf) >= 0.9, s"ivf recall ${recall(ivf)}")
    assert(recall(lsh1) > 0.0, s"lsh1 recall ${recall(lsh1)}")
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again" // -1 word
    val other = "completely different words about spark shuffles and partitions here now"
    val d = docsDf(1L -> base, 2L -> near, 3L -> other)
    val pairs = Dedup.minhashLsh(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("integer-domain minhash (fast variant) matches the md5 variant's pairs on a seeded corpus") {
    // seeded near-copies over real testdata: every doc + its 2-words-
    // shorter twin. Precision is exact by construction (both variants
    // verify candidates with true Jaccard); candidate recall depends on
    // the hash family, so pin >= 0.95 of the oracle variant's pairs.
    val d = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    val corpus = d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = pairSet(Dedup.minhashLsh(corpus))
    val fast = pairSet(Dedup.minhashLshFast(corpus))
    assert(slow.nonEmpty)
    val recall = (slow & fast).size.toDouble / slow.size
    assert(recall >= 0.95, s"fast-variant recall $recall (${slow.size} oracle pairs)")
    // soundness: every emitted fast pair clears the same verified threshold
    assert(Dedup.minhashLshFast(corpus).filter(col("jaccard") < 0.5).isEmpty)
  }

  test("simhash: identical docs share a bucket; signature is 16 bits") {
    val d = docsDf(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "unrelated content entirely different")
    val r = Dedup.simhashBuckets(d).orderBy("doc_id").collect()
    assert(r(0).getString(1).length == 16)
    assert(r(0).getString(1) == r(1).getString(1))
    assert(r(0).getLong(2) == 2 && r(2).getLong(2) >= 1)
  }

  test("ngram jaccard pairs stay within blocks") {
    val d = Seq(
      (1L, "a b c d e", "en", "s1"), (2L, "a b c d x", "en", "s1"),
      (3L, "a b c d e", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val r = Dedup.ngramJaccardPairs(d, 3, Seq("lang", "source")).collect()
    assert(r.map(x => (x.getLong(2), x.getLong(3))).toSeq == Seq((1L, 2L))) // doc 3: other block
    assert(r.head.getDouble(4) > 0.3 && r.head.getDouble(4) < 1.0)
  }

  test("embedding near-dups: exact duplicate vector scores 1.0, orthogonal filtered") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Dedup.embeddingNearDups(e, 0.9).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(math.abs(r.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("blocked embedding near-dups equals the brute-force reference for any block count") {
    val rnd = new scala.util.Random(42)
    val e = (0L until 120L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = pairSet(Dedup.embeddingNearDups(e, 0.2))
    assert(ref.nonEmpty) // the corpus must actually exercise the threshold
    Seq(1, 3, 16, 128).foreach { b =>
      assert(pairSet(Dedup.embeddingNearDupsBlocked(e, 0.2, blocks = b)) == ref,
        s"blocks=$b diverges from brute force")
    }
  }

  test("LSH bucket cap drops beyond-cap members BEFORE the aggregation buffer") {
    // a degenerate hot bucket with 10^6 members (e.g. an empty-document
    // signature) plus one healthy bucket — the hazard the cap exists for
    val hot = spark.range(0, 1000000L).select(
      lit(0).as("band_id"), lit("HOT").as("sig"), col("id").as("doc_id"))
    val ok = spark.range(0, 5).select(
      lit(1).as("band_id"), lit("OK").as("sig"), (col("id") + 5000000L).as("doc_id"))
    val pairs = Dedup.pairsWithinBuckets(hot.unionByName(ok),
      Seq("band_id", "sig"), maxBucket = 50)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val (hotPairs, okPairs) = rows.partition(_._1 < 5000000L)
    // hot bucket: exactly C(50,2) pairs over its 50 LOWEST ids
    assert(hotPairs.length == 50 * 49 / 2)
    assert(hotPairs.forall { case (a, b) => a < 50 && b < 50 })
    // buckets <= maxBucket are untouched: all C(5,2) pairs survive
    assert(okPairs.length == 10)
    // structural: the row_number cap sits BELOW the collect_list
    // aggregate, so no aggregation buffer ever sees the full bucket
    val lp = pairs.queryExecution.optimizedPlan.toString
    assert(lp.contains("row_number") && lp.contains("collect_list"), lp)
    assert(lp.indexOf("collect_list") < lp.indexOf("row_number"),
      s"cap must apply before aggregation:\n$lp")
  }

  test("blocked kNN graph equals per-query brute force for every vector") {
    val rnd = new scala.util.Random(7)
    val e = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val graph = Similarity.knnGraphBlocked(e, k = 4, blocks = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // reference: brute force with the whole corpus as the query set
    val brute = Similarity.bruteForceTopK(e, e, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(graph == brute)
    assert(graph.map(_._1).size * 4 == graph.size) // k rows per vector
  }

  test("incremental LSH pairs a new batch against the corpus only") {
    val olds = docsDf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight",
      3L -> "totally unrelated words nothing shared here at all")
    val news = docsDf(
      101L -> "alpha beta gamma delta epsilon zeta eta",   // near-copy of 1
      102L -> "fresh content with no match in the corpus xyzzy")
    val r = Dedup.minhashLshIncremental(olds, news).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 101L)))
    // direction contract: old ids on the left, batch ids on the right
    assert(r.forall { case (o, n) => o < 100L && n >= 100L })
  }

  test("incremental LSH releases its shingle caches; only the pair output stays cached") {
    // Repeated daily-ingest calls must not accumulate MEMORY_AND_DISK
    // blocks for the session lifetime: the two big intermediate shingle
    // frames are unpersisted before returning; the (pair-sized) output
    // is the single surviving cache entry and the caller can drop it.
    spark.sharedState.cacheManager.clearCache()
    val olds = docsDf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight")
    val news = docsDf(101L -> "alpha beta gamma delta epsilon zeta eta")
    val out = Dedup.minhashLshIncremental(olds, news)
    assert(!spark.sharedState.cacheManager.isEmpty, "output frame should be cached")
    out.unpersist(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "shingle caches leaked past minhashLshIncremental")
  }

  test("gopher rules: each gate trips on its own boundary; clean doc passes all") {
    val fifty = (1 to 50).map(i => s"tok$i").mkString(" ")          // 50 distinct words
    val good = ((1 to 46).map(i => s"tok$i") ++ Seq("the", "of", "and", "in")).mkString(" ")
    val d = Seq(
      (1L, good),                                  // passes everything
      (2L, (1 to 49).map(i => s"tok$i").mkString(" ")), // 49 words: r_word_count
      (3L, Seq.fill(50)("the").mkString(" ")),     // all same: r_distinct_frac (stopword ok)
      (4L, fifty),                                 // zero stopwords: r_stopword_frac
      (5L, (fifty + " " + "x" * 25)),              // 25-char word: r_max_word_len
      (6L, (1 to 50).map(_ => "ab").mkString(" ")) // mean len 2: r_mean_word_len
    ).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.gopherRules(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1).getBoolean(7), r(1).toString)      // passes_all
    assert(!r(2).getBoolean(2) && !r(2).getBoolean(7)) // r_word_count
    assert(!r(3).getBoolean(5) && !r(3).getBoolean(7)) // r_distinct_frac
    assert(!r(4).getBoolean(4) && !r(4).getBoolean(7)) // r_stopword_frac
    assert(!r(5).getBoolean(6) && !r(5).getBoolean(7)) // r_max_word_len
    assert(!r(6).getBoolean(3) && !r(6).getBoolean(7)) // r_mean_word_len
  }

  test("chunk windows: clamped last chunk, full overlap coverage, short-doc passthrough") {
    import graft.ext.TrainPrep
    val words40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, words40), (2L, "just five little words here")).toDF("doc_id", "text")
    val r = TrainPrep.chunkWindows(d, w = 32, s = 16).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getInt(3)))
    val doc1 = r.filter(_._1 == 1L).sortBy(_._2)
    // 40 words, w=32, s=16: chunks at offsets 0 and 16 (clamped to 24 words)
    assert(doc1.map(_._2).toSeq == Seq(0, 1))
    assert(doc1(0)._4 == 32 && doc1(1)._4 == 24)
    assert(doc1(0)._3.startsWith("w1 ") && doc1(1)._3.startsWith("w17 "))
    assert(doc1(1)._3.endsWith(" w40"))
    // short doc: one chunk, verbatim
    val doc2 = r.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2(0)._3 == "just five little words here")
  }

  test("integer pagerank: hub outranks leaves, ranks deterministic, mass bounded") {
    import graft.ext.GraphOps
    // star (hub 0, leaves 1..5) + a disjoint 2-cycle
    val edges = ((1L to 5L).map(l => (0L, l)) ++ Seq((10L, 11L))).toDF("ea", "eb")
    val r = GraphOps.pageRank(edges, iterations = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r.size == 8)
    (1L to 5L).foreach(l => assert(r(0L) > r(l), s"hub must outrank leaf $l"))
    // symmetric 2-cycle nodes are at the uniform fixed point
    assert(r(10L) == r(11L))
    // integer truncation only loses mass: total <= |V| * 1e6
    assert(r.values.sum <= 8L * 1000000L)
    assert(r.values.forall(_ >= 150000L))
    // determinism across re-evaluation
    val r2 = GraphOps.pageRank(edges, iterations = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == r2)
  }

  test("label centroids: exact per-dimension sums and counts") {
    val e = Seq(
      (1L, Array(1.0f, 0.5f), 0), (2L, Array(3.0f, -0.5f), 0),
      (3L, Array(0.0f, 2.0f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelCentroids(e).orderBy("label", "dim").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getLong(2), x.getLong(3))).toSeq
    // quantized 1e6 fixed point: label 0 sums (4.0, 0.0), label 1 (0.0, 2.0)
    assert(r == Seq((0, 0, 2L, 4000000L), (0, 1, 2L, 0L),
      (1, 0, 1L, 0L), (1, 1, 1L, 2000000L)))
  }

  test("kNN majority vote labels by neighborhood; ties break to the smaller label") {
    // 0 sits among three label-1 vectors and two label-2s: majority 1
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 9),
      (1L, Array(0.99f, 0.01f), 1), (2L, Array(0.98f, 0.02f), 1),
      (3L, Array(0.97f, 0.03f), 1),
      (4L, Array(0.96f, 0.04f), 2), (5L, Array(0.95f, 0.05f), 2))
      .toDF("vec_id", "embedding", "label")
    val byId = Similarity.knnClassify(e, k = 5, blocks = 3).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2))).toMap
    assert(byId(0L) == (1, 3L))
    // vec 5's neighborhood is {0(9), 1(1), 2(1), 3(1), 4(2)}: majority 1
    assert(byId(5L)._1 == 1)
  }

  test("dataset card counts exact duplicates per slice") {
    val d = Seq(
      (1L, "same text", "en", "web"), (2L, "same text", "en", "web"),
      (3L, "other", "en", "web"), (4L, "same text", "de", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.ext.TextAnalysis.datasetCard(d).orderBy("lang", "source").collect()
    val en = r.find(_.getString(0) == "en").get
    assert(en.getLong(2) == 3L && en.getLong(4) == 2L && en.getLong(7) == 1L,
      en.toString) // 3 docs, 2 distinct, 1 exact dup
    val de = r.find(_.getString(0) == "de").get
    assert(de.getLong(2) == 1L && de.getLong(7) == 0L)
  }

  test("brute-force top-k ranks by cosine, deterministic tie-break") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)),                      // query
      (1L, Array(0.9f, 0.1f)), (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0), 2)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("LSH top-k only compares within sign buckets; multiprobe recovers bit-flip neighbors") {
    val e = Seq(
      (0L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (1L, Array(0.9f, 1.0f, 1.0f, 1.0f)),   // same bucket as 0
      (2L, Array(-0.1f, 1.0f, 1.0f, 1.0f))). // near 0 but across the dim-1 boundary
      toDF("vec_id", "embedding")
    val r1 = Similarity.lshTopK(e, e.filter($"vec_id" === 0), k = 3, bits = 4).collect()
    assert(r1.map(_.getLong(1)).toSeq == Seq(1L)) // 2 is never considered
    // probing the flipped-first-bit bucket recovers the boundary neighbor
    val r3 = Similarity.lshTopK(e, e.filter($"vec_id" === 0), k = 3, bits = 4, probes = 2)
      .orderBy("rank").collect()
    assert(r3.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("hash split is a stable per-row function; packing chunks the token stream; decontaminate flags planted overlap") {
    import graft.ext.TrainPrep
    val d = (1L to 40L).map(i => (i, s"tok$i " * 10)).toDF("doc_id", "text")
    val s1 = TrainPrep.hashSplit(d).collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // stability: same ids -> same splits, independent of partitioning
    val s2 = TrainPrep.hashSplit(d.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(s1 == s2 && s1.values.toSet.subsetOf(Set("train", "val", "test")))

    // 10 tokens/doc, budget 25, 1 bucket: docs at offsets 0,10,20,30... ->
    // packs 0,0,0,1 per floor(offset/25)
    val p = TrainPrep.packSequences(d.filter($"doc_id" <= 4), tokenBudget = 25, buckets = 1)
      .orderBy("doc_id").collect().map(_.getLong(4)).toSeq
    assert(p == Seq(0L, 0L, 0L, 1L))

    val eval = d.filter($"doc_id" % 4 === 0)
    val flags = TrainPrep.decontaminate(d, eval).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert((1L to 40L).forall(i => flags(i) == (i % 4 == 0)))
  }

  test("binned interval join matches inclusive bounds across bin boundaries") {
    import graft.ext.RangeJoin
    val points = Seq((1L, 5L, "a"), (1L, 25L, "b"), (1L, 26L, "c"), (2L, 10L, "d"))
      .toDF("k", "p", "tag")
    val intervals = Seq((1L, 100L, 5L, 25L)).toDF("k", "iv_id", "s", "e")
    val r = RangeJoin.binnedIntervalJoin(points, intervals, Seq("k"), "p", "s", "e",
        binWidth = 10L)
      .select("tag", "iv_id").collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(r == Set(("a", 100L), ("b", 100L))) // inclusive ends; c outside, d wrong key
  }

  test("dup clusters: transitive pairs collapse to the min id; singletons self-label") {
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val r = Dedup.dupClusters(docs, pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSet
    assert(r == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (20L, 20L, true)))
  }

  test("star-contraction CC equals label propagation, incl. a 64-hop chain") {
    // a long chain (diameter 64) + a clique + singletons: propagation's
    // worst case, star contraction's showcase
    val chain = (0L until 64L).map(i => (i, i + 1))
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val docs = ((0L to 65L) ++ (100L to 105L) ++ Seq(999L)).toDF("doc_id")
    val pairs = (chain ++ clique).toDF("a_id", "b_id")
    val star = Dedup.dupClustersStar(docs, pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSet
    val prop = Dedup.dupClusters(docs, pairs, maxRounds = 100).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSet
    assert(star == prop, s"star=$star\nprop=$prop")
    assert(star.contains((64L, 0L, false)) && star.contains((999L, 999L, true)))
    // random graphs: same labels for every seed
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 60L
      val es = (1 to 80).map(_ => (rnd.nextInt(n.toInt).toLong, rnd.nextInt(n.toInt).toLong))
        .filter { case (a, b) => a != b }
      val ds = (0L until n).toDF("doc_id")
      val ps = es.toDF("a_id", "b_id")
      val s2 = Dedup.dupClustersStar(ds, ps).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val p2 = Dedup.dupClusters(ds, ps, maxRounds = 100).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(s2 == p2)
    }
  }

  test("simhash Hamming pairs: identical docs collide at distance 0") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely unrelated content about spark physical planning"))
      .toDF("doc_id", "text")
    val r = Dedup.simhashNearPairs(d, maxHamming = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
    assert(r.contains((1L, 2L, 0)))
    assert(r.filter(_._3 == 0).toSet == Set((1L, 2L, 0)))
  }

  test("minhash maxBucket cap bounds in-bucket pair expansion") {
    val d = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    val full = Dedup.minhashLsh(d).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val capped = Dedup.minhashLsh(d, maxBucket = 2).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L))) // only the 2 lowest ids per bucket pair up
  }

  test("IVF top-k searches only probed cells; more probes widen recall") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid of cell 0, also the query
      (1L, Array(0.0f, 1.0f)),   // centroid of cell 1
      (2L, Array(0.9f, 0.1f)),   // assigned to cell 0
      (3L, Array(0.1f, 0.9f))).  // assigned to cell 1
      toDF("vec_id", "embedding")
    val r1 = Similarity.ivfTopK(e, e.filter($"vec_id" === 0), k = 3, cells = 2, probes = 1)
      .orderBy("rank").collect()
    assert(r1.map(_.getLong(1)).toSeq == Seq(2L)) // cell-1 members invisible
    val r2 = Similarity.ivfTopK(e, e.filter($"vec_id" === 0), k = 3, cells = 2, probes = 2)
      .orderBy("rank").collect()
    assert(r2.map(_.getLong(1)).toSeq == Seq(2L, 3L, 1L)) // cosine order
  }

  test("new vs returning: first-seen day counts as new, later days as returning") {
    implicit val s = spark
    import s.implicits._
    val day = 86400000000000L // nanos
    val e = Seq(
      (1L, 0L, 1L, "c", 1.0, "{}"),        // user 1 day 0 (new)
      (2L, day, 1L, "c", 1.0, "{}"),       // user 1 day 1 (returning)
      (3L, day, 2L, "c", 1.0, "{}"),       // user 2 day 1 (new)
      (4L, day + 1L, 2L, "c", 1.0, "{}"))  // same user+day: no double count
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.newVsReturning(e).orderBy("day").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (0L, 1L, 1L, 0L, 1000000L),
      (1L, 2L, 1L, 1L, 500000L)))
  }

  test("experiment readout: exact per-arm metrics, integer means, no self-join needed") {
    implicit val s = spark
    import s.implicits._
    // variant = k % 2: A gets k=2,4 (users 1,1), B gets k=1 (user 2)
    val e = Seq(
      (1L, 0L, 1L, "click", 1.00, """{"k": 2}"""),
      (2L, 0L, 1L, "click", 2.00, """{"k": 4}"""),
      (3L, 0L, 2L, "click", 5.00, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.experimentReadout(e).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)   // n_a, n_b
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)   // users_a, users_b
    assert(r.getLong(5) == 300L && r.getLong(6) == 500L) // cents
    assert(r.getLong(7) == 150L && r.getLong(8) == 500L) // integer means
    assert(r.getLong(9) == 350L)                         // mean diff
  }

  test("bot score: burst fraction in exact ppm, volume gate, single-event users never flag") {
    implicit val s = spark
    import s.implicits._
    val sec = 1000000000L // nanos
    // user 1: 12 events 0.5 s apart -> all gaps fast, flagged
    // user 2: 12 events 10 s apart -> zero fast, not flagged
    // user 3: one event -> no gaps, fast_ppm 0, not flagged
    val rows =
      (0 until 12).map(i => (100L + i, i * sec / 2, 1L, "c", 1.0, "{}")) ++
      (0 until 12).map(i => (200L + i, i * 10L * sec, 2L, "c", 1.0, "{}")) ++
      Seq((300L, 0L, 3L, "c", 1.0, "{}"))
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.botScore(e).orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(4), x.getBoolean(5)))
    assert(r.toSeq == Seq(
      (1L, 12L, 1000000L, true),
      (2L, 12L, 0L, false),
      (3L, 1L, 0L, false)))
  }

  test("ngram coverage curve: top-k head mass exact, monotone in k") {
    // one template repeated 5x (its grams get count 5), plus unique docs
    val template = (1 to 9).map(i => s"t$i").mkString(" ") // 2 8-grams x5
    val docs = ((1 to 5).map(i => (i.toLong, template)) ++
      Seq((10L, (1 to 20).map(i => s"u$i").mkString(" ")))) // 13 unique grams
      .toDF("doc_id", "text")
    val r = TextAnalysis.ngramCoverageCurve(docs, probes = Seq(1, 2, 100))
      .orderBy("top_k").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // total: 5*2 template occurrences + 13 unique = 23
    assert(r.forall(_._3 == 23L))
    assert(r(0)._2 == 5L)                       // top-1 = one template gram
    assert(r(1)._2 == 10L)                      // top-2 = both template grams
    assert(r(2)._2 == 23L && r(2)._4 == 1000000L) // k=100 covers everything
    assert(r.map(_._2).toSeq == r.map(_._2).toSeq.sorted) // monotone
  }

  test("boilerplate ngrams: shared 8-grams flagged across docs, short docs report zero") {
    val docs = Seq(
      (1L, "a b c d e f g h unique1 tail1"),
      (2L, "a b c d e f g h unique2 tail2"), // shares the first 8-gram with doc 1
      (3L, "completely different words here")) // < 8 tokens -> 0 grams
      .toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateNgrams(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r(0)._2 == 3 && r(0)._3 == 1) // 3 distinct grams, 1 shared
    assert(r(1)._2 == 3 && r(1)._3 == 1)
    assert(r(2) == ((3L, 0L, 0L)))
  }

  test("cluster representatives: longest member wins, ties to lowest id, singletons self-represent") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d e"), (3L, "a b"), // cluster {1,2,3}: 2 wins (5 tokens)
      (9L, "lone doc")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val r = Dedup.clusterRepresentatives(docs, clusters).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getBoolean(3)))
    assert(r.toSeq == Seq((1L, false), (2L, true), (3L, false), (9L, true)))
  }

  test("wav frame energy: ragged last frame, exact energies, earliest peak on ties") {
    implicit val s = spark
    import s.implicits._
    val id = 5L // n = 261 samples -> frames of 256 + 5
    val d = Seq((id, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.wavFrameEnergy(Multimodal.wavFromDocuments(d))
      .collect().head
    val n = Multimodal.wavSampleCount(id)
    val energies = (0 until n).map(Multimodal.wavSample(id, _))
      .map(v => v.toLong * v.toLong)
      .grouped(256).map(_.sum).toSeq
    assert(out.n_frames == energies.size && energies.size == 2)
    assert(out.total_energy == energies.sum)
    assert(out.peak_frame_energy == energies.max)
    assert(out.peak_frame_index == energies.indexOf(energies.max))
  }

  test("decayed engagement: halves per day, floors exactly, saturates at 62 days") {
    implicit val s = spark
    import s.implicits._
    val day = 86400000000000L // nanos
    // user 1: 100.00 now + 100.00 one day earlier + 100.00 at 100 days
    // user 2: 0.03 three days old -> floor(3/8) = 0
    val e = Seq(
      (1L, 3L * day, 1L, "c", 100.0, "{}"),
      (2L, 2L * day, 1L, "c", 100.0, "{}"),
      (3L, 3L * day - 100L * day, 1L, "c", 100.0, "{}"),
      (4L, 0L, 2L, "c", 0.03, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.decayedEngagement(e).orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r(0) == ((1L, 3L, 10000L + 5000L + 0L, 0L)))
    assert(r(1) == ((2L, 1L, 0L, 3L))) // floor(3 cents / 8) = 0, age 3
  }

  test("packing efficiency: per-pack fill ppm histogram, overflow pack binned above 10") {
    val d = Seq(
      (0L, "a b c"), (8L, "a b c d"), (16L, "a b c d e"), // bucket 0: 12 tokens
      (1L, "a b"))                                        // bucket 1: 2 tokens
      .toDF("doc_id", "text")
    val r = TrainPrep.packingEfficiency(d, tokenBudget = 8, buckets = 8)
      .orderBy("bin").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // bucket 0: one pack of 12/8 tokens -> 1500000 ppm (the spill pack);
    // bucket 1: one pack at 250000 ppm
    assert(r.toSeq == Seq((2L, 1L, 250000L, 250000L), (15L, 1L, 1500000L, 1500000L)))
  }

  test("spherical k-means: partitions by cosine, conserves members, deterministic") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),       // seeds
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)),
      (4L, Array(0.8f, 0.2f)), (5L, Array(0.2f, 0.8f))).toDF("vec_id", "embedding")
    val r = Similarity.sphericalKMeans(e, k = 2, iterations = 2)
      .orderBy("cell_id").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((0, 3L, 6L), (1, 3L, 9L))) // {0,2,4} vs {1,3,5}
    // member conservation + reproducibility on the real table shape
    val big = (0L until 100L).map(i =>
      (i, Array((math.cos(i * 0.1)).toFloat, (math.sin(i * 0.1)).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.sphericalKMeans(big, k = 4, iterations = 2)
      .orderBy("cell_id").collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(a.map(_._2).sum == 100L)
    assert(a.map(_._3).sum == (0L until 100L).sum)
    val b = Similarity.sphericalKMeans(big, k = 4, iterations = 2)
      .orderBy("cell_id").collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("int8 quantization QC: exact integer errors, saturation count, zero-vector guard") {
    val e = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.int8QuantQc(e).orderBy("vec_id").collect()
    // q = [1e6, -5e5, 2.5e5]; s_abs = [127, 64, 32] (round-half-up)
    assert(r(0).getLong(1) == 1000000L)          // maxabs_q
    assert(r(0).getInt(2) == 3)
    assert(r(0).getLong(3) == 750000L)           // 0 + 500000 + 250000
    assert(r(0).getLong(4) == 500000L)
    assert(r(0).getLong(5) == 1L)                // only the max dim saturates
    // zero vector: guard divides by 1, everything quantizes to 0 exactly
    assert(r(1).getLong(1) == 1L && r(1).getLong(3) == 0L && r(1).getLong(5) == 0L)
  }

  test("shard shuffle: deterministic, seed-sensitive, contiguous positions per shard") {
    val d = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = TrainPrep.shardShuffle(d, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = TrainPrep.shardShuffle(d, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // re-run identical
    // positions are 1..n within each shard, no gaps
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a different seed is a genuine reshuffle (some assignment moves)
    val c = TrainPrep.shardShuffle(d, shards = 4, seed = "epoch2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(c.toMap != a.map(r => (r._1, r._2)).toMap)
  }

  test("semDedup prunes within cells only, keeps the lowest id of each near-dup pair") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)),    // centroid 0
      (1L, Array(0.0f, 1.0f)),    // centroid 1
      (2L, Array(0.99f, 0.01f)),  // cell 0, near-dup of 0 -> pruned
      (3L, Array(0.01f, 0.99f)),  // cell 1, near-dup of 1 -> pruned
      (4L, Array(-0.6f, 0.8f)),   // cell 1, cos 0.8 to its centroid — under τ=0.9
      // near-dup of 0 in DIRECTION but it lands in cell 0 with 0 and 2;
      // pruned because 0 (a lower id) is above threshold
      (5L, Array(0.98f, 0.02f))).toDF("vec_id", "embedding")
    val r = Similarity.semDedup(e, cells = 2, threshold = 0.9)
      .orderBy("vec_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getBoolean(2)))
    assert(r.toSeq == Seq(
      (0L, 0, true), (1L, 1, true), (2L, 0, false),
      (3L, 1, false), (4L, 1, true), (5L, 0, false)))
    // cross-cell near-dups are NOT pruned (the clustering is the
    // blocking): two near-identical vectors forced into different cells
    // both survive — the approximation SemDeDup trades for Σ|cell|² cost
    val cross = Seq(
      (0L, Array(1.0f, 0.05f)),  // centroid 0
      (1L, Array(1.0f, -0.05f)), // centroid 1 (near-identical to 0)
      (2L, Array(0.9f, 0.1f)),   // cell 0
      (3L, Array(0.9f, -0.1f))). // cell 1
      toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(cross, cells = 2, threshold = 0.9)
      .filter(col("keep")).count()
    assert(kept >= 2) // 0 and 1 both kept despite cosine ~0.995
  }

  test("hashed linear quality classifier: additive over tokens, deterministic, multiplicity counts") {
    val d = Seq((1L, "alpha"), (2L, "alpha alpha"), (3L, "alpha beta"), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityClassifier(d).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    val wAlpha = r(0)._3
    assert(r(1)._3 == 2 * wAlpha)              // multiplicity counts
    val wBeta = r(2)._3 - wAlpha               // additivity
    assert(wAlpha.abs <= 1000 && wBeta.abs <= 1000)
    // split("") yields one empty token: the empty doc scores w("") once,
    // deterministically — same in the oracle (string_split('', ' '))
    assert(r(3)._2 == 1L)
    assert(r.forall(x => x._4 == (x._3 >= 0)))
    // rerun is bit-identical (pure projection, no randomness)
    val again = TextAnalysis.qualityClassifier(d).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(again.toSeq == r.toSeq)
  }

  test("token counts / quality / language-id / fingerprints are per-row projections") {
    val d = Seq((1L, "the cat sat on a mat!", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val tc = TextAnalysis.tokenCounts(d).collect().head
    assert(tc.getInt(1) == 6)            // ws tokens ("mat!" is one ws token)
    assert(tc.getInt(2) == 7)            // bpe: 6 words + '!'
    val q = TextAnalysis.qualityScore(d).collect().head
    assert(q.getInt(1) == 6 && q.getInt(2) == 2) // stopwords: "the", "a"
    val lid = TextAnalysis.languageId(d).collect().head
    assert(lid.getString(6).nonEmpty)
    val fp = TextAnalysis.fingerprints(d).collect().head
    assert(fp.getString(1).length == 32 && fp.getString(2).length == 32)
  }

  test("rolling fingerprint: identical windows collide, edits move it only locally") {
    val d = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "short"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.rollingFingerprint(d).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == r(1).getLong(1)) // identical docs -> same fingerprint
    assert(r(0).getLong(1) >= 0)
    assert(r(2).getLong(1) == -1L)             // shorter than the window
  }

  test("multimodal resize stub scales dimensions and strides the payload") {
    implicit val s = spark
    val d = Seq((1L, "0123456789", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val resized = Multimodal.resizeStub(Multimodal.fromDocuments(d), scalePercent = 50)
      .collect().head
    assert(resized.payload.length == 5) // every 2nd byte
    assert(new String(resized.payload, "UTF-8") == "02468")
  }

  test("multimodal: batched stub decode preserves ids and hashes content") {
    implicit val s = spark
    val d = Seq((7L, "hello world", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.featuresFromDocuments(d).collect().head
    assert(f.getLong(0) == 7L)
    assert(f.getLong(2) == 11L) // utf-8 bytes
    assert(f.getString(3) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("wav codec: encode is a spec-compliant RIFF file and decode inverts it exactly") {
    implicit val s = spark
    val bytes = Multimodal.encodeWav(5L)
    // header fields, byte-for-byte
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(bytes.slice(12, 16), "US-ASCII") == "fmt ")
    assert(new String(bytes.slice(36, 40), "US-ASCII") == "data")
    val stats = Multimodal.decodeWav(5L, bytes)
    val n = Multimodal.wavSampleCount(5L)
    assert(stats.sample_rate == Multimodal.wavRate(5L) && stats.n_samples == n)
    val expected = (0 until n).map(Multimodal.wavSample(5L, _))
    assert(stats.peak_abs == expected.map(math.abs).max)
    assert(stats.sum_sq == expected.map(v => v.toLong * v.toLong).sum)
    assert(stats.duration_ms == n.toLong * 1000L / stats.sample_rate)
  }

  test("wav decode: tolerates foreign chunks, rejects malformed input with a field-level error") {
    // a LIST chunk between fmt and data (what real encoders emit) must be skipped
    val base = Multimodal.encodeWav(9L)
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = base.slice(0, 36) ++ listChunk ++ base.slice(36, base.length)
    // fix the RIFF size for the inserted 12 bytes (little-endian at offset 4)
    val bb = java.nio.ByteBuffer.wrap(withList).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, withList.length - 8)
    assert(Multimodal.decodeWav(9L, withList) == Multimodal.decodeWav(9L, base))
    // malformed inputs: each fails with the offending field named
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.decodeWav(1L, b)).getMessage
    assert(msg(base.take(20)).contains("truncated"))
    val badMagic = base.clone(); badMagic(0) = 'X'.toByte
    assert(msg(badMagic).contains("RIFF"))
    val badFmt = base.clone(); badFmt(20) = 3 // audioFormat = 3 (IEEE float)
    assert(msg(badFmt).contains("unsupported format: 3"))
    val badSize = base.clone()
    java.nio.ByteBuffer.wrap(badSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue) // data chunk claims more than remains
    assert(msg(badSize).contains("overruns"))
    // a second data chunk must be rejected, not silently overwrite the first
    val dup = base ++ "data".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 1, 0, 2, 0)
    java.nio.ByteBuffer.wrap(dup).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, dup.length - 8)
    assert(msg(dup).contains("duplicate data"))
  }

  test("bmp codec: encode is a real 24-bit BI_RGB file and decode inverts it exactly") {
    val bytes = Multimodal.encodeBmp(11L)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val w = Multimodal.bmpWidth(11L); val h = Multimodal.bmpHeight(11L)
    val stride = (w * 3 + 3) / 4 * 4
    assert(bytes.length == 54 + stride * h)
    val stats = Multimodal.decodeBmp(11L, bytes)
    assert(stats.width == w && stats.height == h)
    val px = (0 until w * h).map(i =>
      (Multimodal.bmpChannel(11L, i, 2), Multimodal.bmpChannel(11L, i, 1),
        Multimodal.bmpChannel(11L, i, 0))) // (r, g, b)
    assert(stats.sum_r == px.map(_._1.toLong).sum)
    assert(stats.sum_g == px.map(_._2.toLong).sum)
    assert(stats.sum_b == px.map(_._3.toLong).sum)
    assert(stats.peak_luma == px.map { case (r, g, b) => 2126L * r + 7152L * g + 722L * b }.max)
    assert(stats.pos_checksum == px.zipWithIndex.map { case ((r, g, b), i) =>
      (i + 1).toLong * (r + 256L * g + 65536L * b) }.sum)
  }

  test("bmp decode: honors pixel offset, top-down rows; rejects malformed input") {
    val base = Multimodal.encodeBmp(4L)
    val expect = Multimodal.decodeBmp(4L, base)
    // a gap between the headers and the pixel array (real writers emit
    // these for palettes/ICC profiles): decoder must honor dataOffset
    val gap = 16
    val shifted = base.slice(0, 54) ++ Array.fill(gap)(0x7f.toByte) ++ base.drop(54)
    val sb = java.nio.ByteBuffer.wrap(shifted).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.putInt(2, shifted.length) // file size
    sb.putInt(10, 54 + gap)      // pixel data offset
    assert(Multimodal.decodeBmp(4L, shifted) == expect)
    // top-down variant (negative height): same logical image, rows
    // stored first-row-first — decode must agree exactly
    val w = Multimodal.bmpWidth(4L); val h = Multimodal.bmpHeight(4L)
    val stride = (w * 3 + 3) / 4 * 4
    val td = base.clone()
    val tb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tb.putInt(22, -h)
    (0 until h).foreach { j =>
      System.arraycopy(base, 54 + (h - 1 - j) * stride, td, 54 + j * stride, stride)
    }
    assert(Multimodal.decodeBmp(4L, td) == expect)
    // malformed inputs fail with the offending field named
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.decodeBmp(1L, b)).getMessage
    assert(msg(base.take(40)).contains("truncated"))
    val badMagic = base.clone(); badMagic(0) = 'X'.toByte
    assert(msg(badMagic).contains("BM magic"))
    val badBpp = base.clone()
    java.nio.ByteBuffer.wrap(badBpp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 32)
    assert(msg(badBpp).contains("bit depth"))
    val badComp = base.clone()
    java.nio.ByteBuffer.wrap(badComp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1) // BI_RLE8
    assert(msg(badComp).contains("BI_RGB"))
    val badOffset = base.clone()
    java.nio.ByteBuffer.wrap(badOffset).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, base.length - 4) // pixel array would overrun the file
    assert(msg(badOffset).contains("overruns"))
  }

  test("bmp resize: nearest-neighbor downsample samples (x·f, y·f), re-encode round-trips") {
    val id = 13L // w=8+4=12, h=4+3=7 -> 6x4 at factor 2 (odd height path)
    val src = Multimodal.encodeBmp(id)
    val w = Multimodal.bmpWidth(id); val h = Multimodal.bmpHeight(id)
    val resized = Multimodal.resizeBmp(id, src, factor = 2)
    val stats = Multimodal.decodeBmp(id, resized)
    val ow = (w + 1) / 2; val oh = (h + 1) / 2
    assert(stats.width == ow && stats.height == oh)
    // expected: source-formula channels at the sampled positions
    val px = for (oy <- 0 until oh; ox <- 0 until ow) yield {
      val i = (oy * 2) * w + (ox * 2)
      (Multimodal.bmpChannel(id, i, 2), Multimodal.bmpChannel(id, i, 1),
        Multimodal.bmpChannel(id, i, 0))
    }
    assert(stats.sum_r == px.map(_._1.toLong).sum)
    assert(stats.pos_checksum == px.zipWithIndex.map { case ((r, g, b), j) =>
      (j + 1).toLong * (r + 256L * g + 65536L * b) }.sum)
    // factor=1 is the identity on pixel content (container re-normalized)
    assert(Multimodal.decodeBmp(id, Multimodal.resizeBmp(id, src, factor = 1)) ==
      Multimodal.decodeBmp(id, src))
  }

  test("bmp luminance histogram: bins match the brute-force pixel formula, counts conserve") {
    implicit val s = spark
    import s.implicits._
    val id = 7L
    val d = Seq((id, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.bmpLumaHistogram(Multimodal.bmpFromDocuments(d))
      .collect().map(b => b.bin -> b.n_pixels).toMap
    val w = Multimodal.bmpWidth(id); val h = Multimodal.bmpHeight(id)
    val expect = (0 until w * h)
      .map { i =>
        val luma = 2126L * Multimodal.bmpChannel(id, i, 2) +
          7152L * Multimodal.bmpChannel(id, i, 1) +
          722L * Multimodal.bmpChannel(id, i, 0)
        math.min(15, (luma * 16L / 2550000L).toInt)
      }
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    assert(out == expect)
    assert(out.values.sum == w.toLong * h)
  }

  test("bmp pipeline: batched decode over generated payloads matches the formula") {
    implicit val s = spark
    import s.implicits._
    val d = Seq((6L, "x", "en", "s", 1L), (601L, "y", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decodeBmpBatch(Multimodal.bmpFromDocuments(d))
      .collect().map(b => b.doc_id -> b).toMap
    Seq(6L, 601L).foreach { id =>
      val w = Multimodal.bmpWidth(id); val h = Multimodal.bmpHeight(id)
      val rs = (0 until w * h).map(Multimodal.bmpChannel(id, _, 2))
      assert(out(id).width == w && out(id).height == h)
      assert(out(id).sum_r == rs.map(_.toLong).sum)
    }
  }

  test("wav decode: odd-sized data chunk keeps the chunk walker aligned") {
    // a foreign 16-bit WAV whose data size is odd (a byte-accurate but
    // block-misaligned writer): decode must consume the stray payload
    // byte + RIFF pad so a trailing chunk still parses from its header
    val base = Multimodal.encodeWav(7L)
    val bbBase = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataSize = bbBase.getInt(40)
    val trailer = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    // extra payload byte (odd size) + pad byte, then the trailing chunk
    val odd = base ++ Array[Byte](0x55, 0x00) ++ trailer
    val bb = java.nio.ByteBuffer.wrap(odd).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, dataSize + 1)
    bb.putInt(4, odd.length - 8)
    assert(Multimodal.decodeWav(7L, odd) == Multimodal.decodeWav(7L, base))
  }

  test("wav pipeline: batched decode over generated payloads matches the formula on a sample") {
    implicit val s = spark
    val d = Seq((3L, "x", "en", "s", 1L), (300L, "y", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decodeWavBatch(Multimodal.wavFromDocuments(d))
      .collect().map(w => w.doc_id -> w).toMap
    Seq(3L, 300L).foreach { id =>
      val n = Multimodal.wavSampleCount(id)
      val samples = (0 until n).map(Multimodal.wavSample(id, _))
      assert(out(id).n_samples == n)
      assert(out(id).sum_sq == samples.map(v => v.toLong * v.toLong).sum)
      assert(out(id).peak_abs == samples.map(math.abs).max)
    }
  }

  test("sessionize splits on gap, aggregates exactly") {
    val us = 1000000L
    val events = Seq(
      // user 1: two events 10 min apart (one session), then 40 min gap (new session)
      (1L, 0L * us * 60, 1L, "click", 1.25, "{}"),
      (2L, 10L * us * 60, 1L, "view", 2.50, "{}"),
      (3L, 50L * us * 60, 1L, "click", 4.00, "{}"),
      // user 2: single event
      (4L, 5L * us * 60, 2L, "view", 10.00, "{}"))
      .toDF("event_id", "ts_us_in", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_us_in") * 1000) // engine expects nanos
      .drop("ts_us_in")
    val r = Events.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(r.length == 3)
    val s1 = r(0)
    assert(s1.getLong(0) == 1L && s1.getLong(2) == 2L)       // 2 events
    assert(s1.getLong(4) == 10L * 60 * us)                   // 10 min duration
    assert(s1.getLong(5) == 375L)                            // 1.25+2.50 in cents
    assert(r(1).getLong(2) == 1L && r(2).getLong(0) == 2L)
  }

  test("window agg buckets by exact integer arithmetic") {
    val us = 1000000L
    val events = Seq(
      (1L, 0L, 1L, "click", 1.00, "{}"),
      (2L, 4L * 60 * us, 1L, "click", 2.00, "{}"),  // same 5-min window
      (3L, 6L * 60 * us, 1L, "click", 3.00, "{}"))  // next window
      .toDF("event_id", "ts_us_in", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_us_in") * 1000)
      .drop("ts_us_in")
    val r = Events.windowAgg(events, windowMinutes = 5)
      .orderBy("window_start_us").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(2), x.getLong(3))).toSeq ==
      Seq((0L, 2L, 300L), (300L * us, 1L, 300L)))
  }

  test("row-level data diff: added/removed/changed with per-column change list") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "status", "price")
    val target = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0))
      .toDF("id", "status", "price")
    val r = DataDiff.rowDiff(base, target, Seq("id")).orderBy("id").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getSeq[String](2))).toSeq == Seq(
      (2L, "changed", Seq("status", "price")),
      (3L, "removed", Seq.empty),
      (4L, "added", Seq.empty)))
    val summary = DataDiff.diffSummary(base, target, Seq("id"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(summary == Map("changed" -> 1L, "removed" -> 1L, "added" -> 1L))

    // value-shift pair ("a","bc") vs ("ab","c"): concatenations collide,
    // the delimited fingerprint must not
    val b2 = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val t2 = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val shifted = DataDiff.rowDiff(b2, t2, Seq("id")).collect()
    assert(shifted.length == 1 && shifted.head.getString(1) == "changed")
    assert(shifted.head.getSeq[String](2) == Seq("x", "y"))
  }

  test("multimodal frame sampling: 1 record -> n byte-sliced frames, no loss") {
    implicit val s = spark
    val d = Seq((1L, "abcdefghij", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(d), 3)
      .collect().sortBy(_.frame_index)
    assert(frames.length == 3)
    assert(frames.map(_.frame_payload.length).sum == 10) // partition of the payload
    assert(new String(frames.flatMap(_.frame_payload), "UTF-8") == "abcdefghij")
  }

  test("as-of join matches the latest right row at-or-before each left ts") {
    val clicks = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 5L))
      .toDF("event_id", "user_id", "ts_us")
    val views = Seq((11L, 100L, 10L), (12L, 100L, 20L), (13L, 100L, 30L))
      .toDF("event_id", "user_id", "ts_us")
    val r = AsOf.asofJoin(clicks, views, Seq("user_id"), "ts_us")
      .orderBy("event_id").collect()
    // click@10 matches view@10 (equal ts counts); click@25 -> view@20;
    // user 200 has no views -> nulls
    assert(r(0).getLong(3) == 11L)
    assert(r(1).getLong(3) == 12L)
    assert(r(2).isNullAt(3))
  }

  test("corpus cleaning drops low-quality, exact-dup, and near-dup docs in order") {
    val good = "the quick brown fox jumps over the lazy dog and runs in a field of green grass today"
    val near = "the quick brown fox jumps over the lazy dog and runs in a field of green grass"
    val junk = "!!! ??? ###"
    val d = Seq(
      (1L, good), (2L, good),  // 2 = exact dup of 1 -> dropped at stage 2
      (3L, near),              // near dup of 1 -> dropped at stage 3 (higher id loses)
      (4L, junk),              // fails the quality gate
      (5L, "completely different text about spark partitions and shuffles in the big cluster")
    ).toDF("doc_id", "text")
    val kept = CorpusClean.clean(d).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 5L))
  }

  test("count-min sketch: never underestimates, bounded size, exact on no-collision input") {
    import org.apache.spark.sql.functions.col
    // skewed key set: key 0 hot, sparse tail — 64 slots force collisions
    val df = spark.range(1000).select((col("id") % 37 * (col("id") % 37)).as("k"))
    val exact = df.groupBy("k").count()
    val sketch = graft.ext.FreqSketch.cmsBuild(df, "k", depth = 4, width = 64)
    assert(sketch.count() <= 4L * 64L)
    val est = graft.ext.FreqSketch.cmsEstimate(sketch, exact, "k", depth = 4, width = 64)
    val joined = exact.join(est, "k").collect()
    assert(joined.length == exact.count())
    joined.foreach(r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("count"), r.toString))
    // wide sketch, few keys: no collisions -> estimates are exact
    val wide = graft.ext.FreqSketch.cmsBuild(df, "k", depth = 4, width = 4096)
    val est2 = graft.ext.FreqSketch.cmsEstimate(wide, exact, "k", depth = 4, width = 4096)
    exact.join(est2, "k").collect().foreach(r =>
      assert(r.getAs[Long]("est_n") == r.getAs[Long]("count"), r.toString))
  }

  test("extension queries all run non-empty on sf0.001") {
    val dir = sf("sf0.001")
    ExtQueries.all.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
