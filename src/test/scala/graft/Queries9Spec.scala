package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Scale}

/** Round-9: the re-banding policy ROUTED INTO the production phash
  * pipeline (round-8 shipped the policy; its consumers still called
  * fixed-width phashNearDup), plus the round-9 policy additions.
  */
class Queries9Spec extends SparkSpec {

  test("phash pipeline re-bands on the saturating corpus: incremental probe picks 32-bit buckets at full twin recall") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val all = Multimodal.bmpWithPerturbedTwins(docs)
    val corpus = all.filter(col("doc_id") < 1000000L)
    val batch = all.filter(col("doc_id") >= 1000000L)
    val auto = Multimodal.phashIncrementalAuto(corpus, batch).collect()
    // the synthetic raster corpus saturates 16-bit bands (round-6
    // measured 17×; Queries8Spec pins the batch policy) — the ROUTED
    // incremental probe must re-band too
    assert(auto.nonEmpty && auto.head.getAs[Int]("band_bits") == 32,
      "the corpus index is saturated — the incremental probe must re-band")
    val b16 = auto.head.getAs[Long]("pair_budget_16")
    val n = auto.head.getAs[Long]("n_imgs")
    assert(b16 > 8L * n, s"decision evidence: budget16=$b16 vs n=$n")
    // every planted twin (id + 1e6, one-pixel edit inside band 0 at
    // either width) must still probe-hit its original
    val twinHits = auto.collect {
      case r if r.getAs[Long]("new_id") == r.getAs[Long]("old_id") + 1000000L =>
        r.getAs[Long]("old_id")
    }.toSet
    val want = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(twinHits == want, "re-banding must not lose a single planted twin in the probe")
    // the evidence-free frame is exactly what the registry key selects
    assert(auto.head.schema.fieldNames.toSet
      .contains("hamming"), "probe must carry the verify distance")
  }

  test("phash pipeline keeps 16-bit width on a healthy corpus: the probe must not pay the wider-band config") {
    import spark.implicits._
    // well-spread hashes (xxhash64 of the id): 16-bit buckets stay
    // near-singleton — the corpus-side decision must keep bands=4
    val corpusHashes = spark.range(0, 2000)
      .select(col("id"), xxhash64(col("id")).as("hash"))
    val (bands, budget, n) = Multimodal.phashAutoBands(corpusHashes)
    assert(bands == 4 && budget <= 8L * n,
      s"healthy corpus must keep the cheap width (bands=$bands budget=$budget n=$n)")
  }

  test("adaptive agg: salted path fires ONLY on the skewed key, and totals are strategy-invariant") {
    val d = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("lang"), col("n_chars"))
    val salted = Scale.adaptiveAgg(d, "lang", "n_chars")
    assert(salted.select(col("agg_strategy")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("salted"),
      "documents.lang holds ~2x its even share — the measured gate must salt")
    assert(salted.queryExecution.optimizedPlan.toString.contains("__salt"),
      "salted plan must carry the two-phase salt column")
    // the two-phase rewrite must never change the aggregate's data
    val plain = d.groupBy(col("lang"))
      .agg(sum("n_chars").as("n_chars"), count(lit(1)).as("n_rows"))
    assert(salted.drop("agg_strategy", "skew_x_ppm").except(plain).count() == 0)
    assert(plain.except(salted.drop("agg_strategy", "skew_x_ppm")).count() == 0)
    // the healthy key takes the plain hash aggregate, no salt machinery
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val pl = Scale.adaptiveAgg(e, "event_type", "cents")
    assert(pl.select(col("agg_strategy")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("plain"))
    assert(!pl.queryExecution.optimizedPlan.toString.contains("__salt"),
      "a healthy key must not pay the extra salt shuffle")
  }

  test("two-level IVF: supers=1 degenerates to flat assignment — every rank agrees exactly") {
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val cmp = graft.ext.Similarity.ivfTwoLevelCompare(
      e, e.filter(col("vec_id") < 4), k = 3, cells = 8, probes = 2, supers = 1)
    val rows = cmp.collect()
    assert(rows.nonEmpty)
    // one super owns every centroid, so the child scan IS the flat scan
    rows.foreach { r =>
      assert(r.getAs[Boolean]("agree"),
        s"supers=1 must be bitwise the flat assignment: $r")
      assert(r.getAs[Long]("n_id") == r.getAs[Long]("n_id_flat"))
    }
  }

  test("IVF build policy: flat below the measured crossover, two-level above, same gate both ways") {
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val q = e.filter(col("vec_id") < 4)
    // below threshold: flat build, and it IS ivfTopK's answer at the
    // same adaptive cells
    val n = e.count()
    val cells = graft.ext.Similarity.adaptiveCells(n)
    val flat = graft.ext.Similarity.ivfTopKAuto(e, q, k = 3, probes = 2,
      buildThreshold = 1000000L)
    assert(flat.select(col("build_mode")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("flat"))
    val ref = graft.ext.Similarity.ivfTopK(e, q, k = 3, cells = cells, probes = 2)
      .select(col("q_id"), col("rank"), col("n_id"))
    val got = flat.select(col("q_id"), col("rank"), col("n_id"))
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0,
      "the flat branch of the build policy must reproduce ivfTopK")
    // at/above threshold: two-level build, same output shape, evidence
    // pinned; with supers clamped to cells the result stays defined
    val two = graft.ext.Similarity.ivfTopKAuto(e, q, k = 3, probes = 2,
      buildThreshold = 1L)
    val rows = two.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[String]("build_mode") == "two_level"))
    assert(rows.forall(r => r.getAs[Long]("n_corpus") == n))
    assert(rows.forall(r => r.getAs[Int]("cells") == cells))
  }

  test("minhash re-banding: a saturating low-entropy corpus regroups to (2,6) — budget collapses, exact-dup recall stays full") {
    import spark.implicits._
    // a fixed 4-word vocabulary: 64 possible shingles, so the (4,3)
    // buckets saturate exactly the way the organic ×10 fixed-vocab
    // corpus saturates the text tiers (BASELINE §Round 6)
    val rnd = new scala.util.Random(9)
    val vocab = Array("alpha", "beta", "gamma", "delta")
    val base = (0L until 300L).map(i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(4))).mkString(" ")))
    // planted EXACT duplicates at id+1e6: identical minhash rows, so
    // they collide in every band at ANY shape — recall is guaranteed
    // by construction, not probabilistically
    val docs = (base ++ base.map { case (i, t) => (i + 1000000L, t) })
      .toDF("doc_id", "text")
    val rows = Dedup.minhashLshAuto(docs).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rows_per_band") == 6),
      "a saturated (4,3) index must regroup to (2,6)")
    val b43 = rows.head.getAs[Long]("pair_budget_43")
    val n = rows.head.getAs[Long]("n_docs")
    assert(b43 > 8L * n, s"decision evidence: budget43=$b43 vs n=$n")
    // the regroup's measured payoff: the (2,6) budget the join actually
    // paid is a small fraction of the (4,3) budget it avoided
    val b26 = Dedup.minhashBandStats(docs, 3, 2, 6)
      .agg(sum(col("pair_budget"))).collect().head.getLong(0)
    assert(b26 * 2 < b43,
      s"re-banding must collapse the candidate budget: b26=$b26 vs b43=$b43")
    // zero lost exact duplicates
    val found = rows.collect {
      case r if r.getAs[Long]("b_id") == r.getAs[Long]("a_id") + 1000000L
        && r.getAs[Double]("jaccard") == 1.0 => r.getAs[Long]("a_id")
    }.toSet
    assert((0L until 300L).forall(found.contains),
      "an exact duplicate collides at every shape — none may be lost")
  }

  test("incremental minhash probe re-bands when the CORPUS index is saturated — exact copies in the batch all probe-hit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Array("alpha", "beta", "gamma", "delta")
    val corpus = (0L until 300L).map(i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(4))).mkString(" "))).toDF("doc_id", "text")
    // today's batch: exact copies of the corpus at +1e6 — identical
    // minhash rows probe-hit at ANY shape, so recall is deterministic
    val batch = corpus.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val rows = Dedup.minhashLshIncrementalAuto(corpus, batch).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rows_per_band") == 6),
      "a saturated corpus index must regroup the probe to (2,6)")
    val b43 = rows.head.getAs[Long]("corpus_pair_budget_43")
    val n = rows.head.getAs[Long]("n_corpus_docs")
    assert(b43 > 8L * n, s"decision evidence: budget43=$b43 vs n=$n")
    val hit = rows.collect {
      case r if r.getAs[Long]("new_id") == r.getAs[Long]("old_id") + 1000000L
        && r.getAs[Double]("jaccard") == 1.0 => r.getAs[Long]("old_id")
    }.toSet
    assert((0L until 300L).forall(hit.contains),
      "re-banding the probe must not lose a single exact duplicate")
  }

  test("minhash re-banding keeps (4,3) on a healthy corpus and reproduces minhashLsh exactly") {
    val d = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    val corpus = d.unionByName(d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
    val auto = Dedup.minhashLshAuto(corpus)
    assert(auto.select(col("rows_per_band")).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(3),
      "real text does not saturate the (4,3) index — the cheap shape must win")
    // the healthy branch IS the fixed-shape operator, bit for bit
    val got = auto.select(col("a_id"), col("b_id"), col("jaccard"))
    val ref = Dedup.minhashLsh(corpus)
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0,
      "the (4,3) branch of the policy must reproduce minhashLsh exactly")
  }

  test("NN-descent: converges on clustered vectors, improves monotonically on weak-structure ones, deterministic") {
    import spark.implicits._
    val k = 4
    def recallOf(e: org.apache.spark.sql.DataFrame, rounds: Int,
        exact: Set[(Long, Long)]): Double = {
      val got = graft.ext.Similarity.nnDescent(e, k, rounds)
        .select(col("q_id"), col("n_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    // CLUSTERED corpus — the intended ANN deployment (BASELINE: the
    // synthetic near-uniform embeddings are the documented
    // weak-structure nemesis of every neighborhood method here):
    // 16 well-separated centers x 30 CONTIGUOUS-id members with
    // deterministic rational perturbations. The id-window init sees
    // only ±k ids; the true top-4 may sit ~25 ids away inside the
    // cluster, reachable only through the neighbor-of-neighbor
    // doubling — a genuine descent test, not an init artifact.
    val clustered = (0L until 480L).map { i =>
      val c = (i / 30L).toInt; val m = (i % 30L).toInt
      (i, (0 until 16).map(d =>
        (if ((c * 5 + d * 3) % 16 < 8) 1.0f else -1.0f)
          + ((m * 13 + d * 7) % 11 - 5) * 0.01f).toArray)
    }.toDF("vec_id", "embedding")
    val exactC = graft.ext.Similarity.knnGraphBlocked(clustered, k)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rc1 = recallOf(clustered, 1, exactC)
    val rc = recallOf(clustered, 4, exactC)
    info(s"clustered recall: 1 round=$rc1 4 rounds=$rc (exact edges=${exactC.size})")
    assert(rc >= 0.9, s"4 rounds on clustered vectors must reach >= 0.9 recall, got $rc")
    assert(rc > rc1, s"descent must keep converging ($rc1 -> $rc)")
    // weak-structure corpus: no convergence promise (documented), but
    // refinement must still help and the output must be deterministic
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val exactE = graft.ext.Similarity.knnGraphBlocked(e, k)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r0 = recallOf(e, 0, exactE); val r2 = recallOf(e, 2, exactE)
    info(s"weak-structure recall: init=$r0 after-2-rounds=$r2")
    assert(r2 > r0, s"refinement must improve on the id-window init ($r0 -> $r2)")
    val a = graft.ext.Similarity.nnDescent(e, k, 2).collect().toSeq
    val b = graft.ext.Similarity.nnDescent(e, k, 2).collect().toSeq
    assert(a == b, "NN-descent must be deterministic")
    a.foreach { r =>
      assert(r.getAs[Int]("rank") <= k)
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("n_id"))
    }
  }

  test("bigram LM score: templated text out-scores word-salad over the same vocabulary; counts are exact") {
    import spark.implicits._
    val vocab = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    // 20 copies of one fluent template vs 20 word-salad docs drawn from
    // the SAME vocabulary: salad keeps the leading-token counts high
    // (the denominators) while scattering the continuations (the
    // numerators) — the separation the fluency filter exists for.
    // (A corpus of globally-UNIQUE words scores a perfect 1e6 under
    // MLE-on-self — c12 = c1 = 1 — which is why the discriminating
    // control must share the vocabulary, not avoid it.)
    val rnd = new scala.util.Random(17)
    val template = (0L until 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog"))
    val salad = (100L until 120L).map(i =>
      (i, Seq.fill(9)(vocab(rnd.nextInt(8))).mkString(" ")))
    val docs = (template ++ salad).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("mean_p_ppm")).toMap
    val tMin = (0L until 20L).map(got).min
    val sMax = (100L until 120L).map(got).max
    info(s"template mean_p_ppm=$tMin, worst salad=$sMax")
    assert(tMin * 2 > 3 * sMax,
      s"fluent text must clearly out-score same-vocab salad ($tMin vs $sMax)")
    // exactness on an isolated corpus: template only — after "the" the
    // continuation splits quick/lazy 20/40 each (500000 ppm), the other
    // six bigrams are deterministic (1000000 ppm)
    val alone = graft.ext.TextAnalysis.bigramLmScore(template.toDF("doc_id", "text"))
      .filter(col("doc_id") === 0L).collect().head
    assert(alone.getAs[Long]("n_bigrams") == 8L)
    assert(alone.getAs[Long]("sum_p_ppm") == 7000000L)
    assert(alone.getAs[Long]("mean_p_ppm") == 875000L)
  }

  test("LPA communities: disjoint cliques converge to their min label; deterministic reruns") {
    import spark.implicits._
    // two disjoint 4-cliques: round 1 sends every node to the min of
    // its neighbors, round 2 to the clique minimum — hand-derivable
    val clique = Seq(1L, 2L, 3L, 4L)
    val clique2 = Seq(11L, 12L, 13L, 14L)
    def edgesOf(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (edgesOf(clique) ++ edgesOf(clique2)).toDF("ea", "eb")
    val got = graft.ext.GraphOps.labelPropagation(edges, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    clique.foreach(n => assert(got(n) == (1L, 4L), s"node $n: ${got(n)}"))
    clique2.foreach(n => assert(got(n) == (11L, 4L), s"node $n: ${got(n)}"))
    val rerun = graft.ext.GraphOps.labelPropagation(edges, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rerun == got.toSeq.map { case (n, (c, s)) => (n, c, s) }.sorted,
      "LPA must be deterministic")
  }

  test("train assembly: tercile bands, dense in-shard positions, deterministic") {
    val run = Queries9.all("train_assembly_pipeline")
    val rows = run(spark, sf("sf0.001")).collect()
    val n = rows.length
    assert(n > 0)
    // value-threshold bands: band 1 holds AT LEAST the first tercile
    // (ties at the cut value stay in the lower band, both engines)
    val byBand = rows.groupBy(_.getAs[Int]("fluency_band")).view.mapValues(_.length).toMap
    assert(byBand.getOrElse(1, 0) >= n / 3, s"band sizes: $byBand (n=$n)")
    assert(byBand.getOrElse(1, 0) + byBand.getOrElse(2, 0) >= 2 * n / 3)
    assert(byBand.keySet.subsetOf(Set(1, 2, 3)))
    // band values must be consistent with the thresholds they define
    val maxB1 = rows.filter(_.getAs[Int]("fluency_band") == 1).map(_.getAs[Long]("mean_p_ppm")).max
    val minB3 = rows.filter(_.getAs[Int]("fluency_band") == 3).map(_.getAs[Long]("mean_p_ppm")).min
    assert(maxB1 < minB3, "bands must be value-ordered")
    // every shard's positions are exactly 1..size
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (s, rs) =>
      val pos = rs.map(_.getAs[Long]("position")).sorted.toSeq
      assert(pos == (1L to rs.length.toLong), s"shard $s positions not dense: $pos")
    }
    // deterministic
    val again = run(spark, sf("sf0.001")).collect().toSeq
    assert(again == rows.toSeq, "assembly must be deterministic")
  }

  test("two-level IVF: the flat side of the comparison IS ivfTopK's answer (shared probe/search tail)") {
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
    val cmp = graft.ext.Similarity.ivfTwoLevelCompare(
        e, e.filter(col("vec_id") < 4), k = 3, cells = 8, probes = 2, supers = 2)
      .select(col("q_id"), col("rank"), col("n_id_flat").as("n_id"))
      .filter(col("n_id").isNotNull)
    val ref = graft.ext.Similarity.ivfTopK(
        e, e.filter(col("vec_id") < 4), k = 3, cells = 8, probes = 2)
      .select(col("q_id"), col("rank"), col("n_id"))
    assert(cmp.except(ref).count() == 0 && ref.except(cmp).count() == 0,
      "the comparison's flat branch must reproduce ivfTopK exactly")
  }
}
