package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ext.{Assoc, Events, GraphOps, Multimodal, Similarity, TextAnalysis}

/** Round-5 continuation batch: hand-checked value invariants on tiny
  * frames plus the scale-shape assertions (broadcasts where promised,
  * no fact-table self-joins). Full value equality vs DuckDB is the
  * verify gate's job.
  */
class Queries5Spec extends SparkSpec {

  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  // ---- association mining ----

  private def ev(rows: (Long, String)*): DataFrame =
    rows.toDF("user_id", "event_type")
      .select(col("user_id"), col("event_type"),
        lit(1L).as("event_id"), lit(0L).as("ts"), lit(0.0).as("value"), lit("{}").as("props"))

  test("event-type lift: co-occurring pair lifts above independence, exact ppm") {
    // 4 users: types a+b always together (2 users), c alone (2 users)
    val e = ev(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b", 3L -> "c", 4L -> "c")
    val r = Assoc.eventTypeLift(e).collect()
    assert(r.length == 1) // only (a, b) co-occurs
    val row = r.head
    assert(row.getAs[String]("type_a") == "a" && row.getAs[String]("type_b") == "b")
    assert(row.getAs[Long]("n_ab") == 2 && row.getAs[Long]("n_a") == 2)
    // lift = n_ab·n/(n_a·n_b) = 2·4/(2·2) = 2.0 → 2_000_000 ppm
    assert(row.getAs[Long]("lift_ppm") == 2000000L)
  }

  test("event-type lift: duplicate events per (user, type) don't inflate counts") {
    val e = ev(1L -> "a", 1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b")
    val r = Assoc.eventTypeLift(e).collect()
    assert(r.head.getAs[Long]("n_ab") == 2) // user-grain, not event-grain
    assert(r.head.getAs[Long]("lift_ppm") == 1000000L) // 2·2/(2·2) = 1.0
  }

  test("basket rules: support filter, directional confidence, exact ppm") {
    val li = Seq(
      (10L, 1L), (10L, 2L), // order 10: parts 1,2
      (11L, 1L), (11L, 2L), // order 11: parts 1,2
      (12L, 1L), (12L, 3L), // order 12: parts 1,3 (pair 1-3 support 1 → dropped)
      (13L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val r = Assoc.basketRules(li, minSupport = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("part_a") == 1L && row.getAs[Long]("part_b") == 2L)
    assert(row.getAs[Long]("n_ab") == 2)
    // part 1 in 4 orders, part 2 in 2: conf(1→2) = 2/4, conf(2→1) = 2/2
    assert(row.getAs[Long]("conf_ab_ppm") == 500000L)
    assert(row.getAs[Long]("conf_ba_ppm") == 1000000L)
    // lift = 2·4/(4·2) = 1.0
    assert(row.getAs[Long]("lift_ppm") == 1000000L)
  }

  test("basket rules: pair generation has no fact-table self-join (one exchange per aggregate, no SMJ of lineitem vs lineitem)") {
    val p = plan(SparkEntry.queries("basket_rules_confidence")(spark, sf("sf0.001")))
    // the pair frame comes from one per-basket collect + in-place expansion;
    // totals join back via broadcast
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"), "pair stage must not self-join the fact table:\n" + p.take(2000))
  }

  test("seasonality: trend is the centered 3-month mean, null at the edges; residual exact") {
    val o = Seq(
      ("1995-01-05", 100.00), ("1995-02-05", 200.00),
      ("1995-03-05", 300.00), ("1995-04-05", 400.00))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Assoc.seasonalityDecompose(o).orderBy("ym").collect()
    assert(r.length == 4)
    assert(r(0).isNullAt(r(0).fieldIndex("trend_cents")))
    assert(r(3).isNullAt(r(3).fieldIndex("trend_cents")))
    assert(r(1).getAs[Long]("trend_cents") == 20000L) // (100+200+300)·100/3
    assert(r(1).getAs[Long]("residual_cents") == 0L)
    assert(r(2).getAs[Long]("trend_cents") == 30000L)
    // single year: each month IS its month-of-year mean; global mean 250.00
    assert(r(0).getAs[Long]("seasonal_ppm") == 10000L * 1000000L / 25000L)
  }

  // ---- text: corpus-frequency rare tokens ----

  test("rare-token ratio: corpus frequency decides rarity, ppm exact") {
    val d = Seq(
      (1L, "the the the rare1"),
      (2L, "the the rare2 rare3"),
      (3L, "the"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.rareTokenRatio(d, minCount = 3).orderBy("doc_id").collect()
    // "the" occurs 6× (common); rare1..rare3 once each
    assert(r(0).getAs[Long]("n_tokens") == 4 && r(0).getAs[Long]("n_rare") == 1)
    assert(r(0).getAs[Long]("rare_ppm") == 250000L)
    assert(r(1).getAs[Long]("n_rare") == 2 && r(1).getAs[Long]("n_rare_distinct") == 2)
    assert(r(2).getAs[Long]("n_rare") == 0 && r(2).getAs[Long]("rare_ppm") == 0L)
  }

  // ---- product quantization ----

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("PQ encode: a vector equal to a centroid gets that code with zero error; ties break low") {
    // dim 8, m=2 → subvectors of 4; centroids = vec_id 0 and 1
    val c0 = Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    val c1 = Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)
    val d = vecs(0L -> c0, 1L -> c1,
      5L -> c0,                                       // exact copy of centroid 0
      6L -> Seq(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f))     // sub0 → c1, sub1 → c0
    val r = Similarity.pqEncode(d, m = 2, k = 2).orderBy("vec_id").collect()
    def codes(i: Int) = r(i).getSeq[Int](r(i).fieldIndex("codes")).toList
    assert(codes(2) == List(0, 0) && r(2).getAs[Long]("sq_err") == 0L)
    assert(codes(3) == List(1, 0) && r(3).getAs[Long]("sq_err") == 0L)
    assert(codes(0) == List(0, 0) && codes(1) == List(1, 1))
  }

  test("PQ ADC: exactly-coded vectors score their true distance; ties rank by id") {
    val c0 = Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    val c1 = Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)
    val corpus = vecs(0L -> c0, 1L -> c1, 7L -> c1) // 7 = coded copy of c1
    val queries = vecs(0L -> c0)
    val r = Similarity.pqSearchAdc(corpus, queries, m = 2, k = 2, topK = 2)
      .orderBy("rank").collect()
    // both 1 and 7 reconstruct exactly to c1; ADC = |c0−c1|² = 4·(1e6)²
    assert(r.map(_.getAs[Long]("n_id")).toList == List(1L, 7L))
    assert(r.forall(_.getAs[Long]("adc_d2") == 4L * 1000000000000L))
  }

  // ---- perceptual hash over real decoded BMPs ----

  test("dHash: one-pixel perturbation stays within Hamming 6; unrelated images are far") {
    val a = Multimodal.encodeBmp(1L)
    val b = Multimodal.perturbBmp(a)
    assert(a.length == b.length && a.zip(b).count { case (x, y) => x != y } == 1,
      "perturbation must be exactly one byte")
    val ha = Multimodal.dhashFromBytes(1L, a)
    val hb = Multimodal.dhashFromBytes(1L, b)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 6)
    val hc = Multimodal.dhashFromBytes(2L, Multimodal.encodeBmp(2L))
    assert(java.lang.Long.bitCount(ha ^ hc) > 6, "independent images must not near-pair")
  }

  test("dHash is row-order invariant: a top-down re-encode of the same image hashes identically") {
    val docId = 3L
    val bottomUp = Multimodal.encodeBmp(docId)
    // rewrite as top-down: negate height, reverse the stored row order
    val bb = java.nio.ByteBuffer.wrap(bottomUp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bb.getInt(18); val h = bb.getInt(22); val off = bb.getInt(10)
    val stride = (w * 3 + 3) / 4 * 4
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -h)
    for (r <- 0 until h)
      System.arraycopy(bottomUp, off + r * stride, topDown, off + (h - 1 - r) * stride, stride)
    assert(Multimodal.dhashFromBytes(docId, topDown) == Multimodal.dhashFromBytes(docId, bottomUp))
  }

  test("phash near-dup pairs every planted twin with its original and nothing below the Hamming bar") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 40).select(col("id").as("doc_id"))
    val pairs = Multimodal.phashNearDup(Multimodal.bmpWithPerturbedTwins(docs))
      .collect()
    val planted = pairs.filter(r => r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L)
    assert(planted.length == 40, s"all 40 twins must pair, got ${planted.length}")
    assert(pairs.forall(_.getAs[Int]("hamming") <= 6))
  }

  // ---- wave 2: graph, cohort LTV, audio trim, IVF-PQ ----

  test("neighbor Jaccard: triangle edge scores its true overlap; bridge edge scores 0") {
    // triangle 1-2-3 plus pendant 3-4: edge (1,2) has common neighbor {3};
    // edge (3,4) has none
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("ea", "eb")
    val r = GraphOps.neighborJaccard(e).orderBy("a", "b").collect()
    val e12 = r.find(x => x.getAs[Long]("a") == 1L && x.getAs[Long]("b") == 2L).get
    // N(1)={2,3}, N(2)={1,3}: common {3}, union {1,2,3} → 1/3
    assert(e12.getAs[Long]("n_common") == 1 && e12.getAs[Long]("jaccard_ppm") == 333333L)
    val e34 = r.find(x => x.getAs[Long]("a") == 3L && x.getAs[Long]("b") == 4L).get
    assert(e34.getAs[Long]("n_common") == 0 && e34.getAs[Long]("jaccard_ppm") == 0L)
  }

  test("cohort LTV: cumulative cents and per-user LTV accumulate within cohort") {
    val day = 86400000000L * 1000L // one day in ts nanos
    val e = Seq(
      (1L, 0L * day, 10.00), (2L, 0L * day, 20.00), // cohort day 0: users 1,2
      (1L, 1L * day, 30.00),                        // day 1: only user 1 active
      (3L, 1L * day, 40.00))                        // cohort day 1: user 3
      .toDF("user_id", "ts", "value")
      .select(lit(1L).as("event_id"), col("ts"), col("user_id"),
        lit("view").as("event_type"), col("value"), lit("{}").as("props"))
    val r = Events.cohortLtv(e).orderBy("cohort", "age").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Long]("day_cents") == 3000L && r(0).getAs[Long]("cum_cents") == 3000L)
    assert(r(1).getAs[Long]("cum_cents") == 6000L) // cohort 0 through age 1
    assert(r(1).getAs[Long]("ltv_cents_per_user") == 3000L) // 6000 / 2 users
    assert(r(2).getAs[Long]("cohort_users") == 1L && r(2).getAs[Long]("cum_cents") == 4000L)
  }

  test("silence trim: bounds honor the threshold; all-quiet clip keeps nothing") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // hand-build WAVs via the real encoder, then trim with a threshold
    // ABOVE every generated sample to exercise the all-quiet path
    val docs = Seq(1L, 2L).toDF("doc_id")
    val quiet = Multimodal.wavSilenceTrim(Multimodal.wavFromDocuments(docs), threshold = 40000)
      .collect()
    assert(quiet.forall(t => t.kept_samples == 0L && t.lead_trim.toLong == t.n_samples))
    val trimmed = Multimodal.wavSilenceTrim(Multimodal.wavFromDocuments(docs), threshold = 8192)
      .collect()
    trimmed.foreach { t =>
      assert(t.kept_samples == t.n_samples - t.lead_trim - t.trail_trim)
      assert(t.kept_samples > 0)
      // recompute the first loud index from the pinned sample formula
      val n = Multimodal.wavSampleCount(t.doc_id)
      val firstLoud = (0 until n).indexWhere(i => math.abs(Multimodal.wavSample(t.doc_id, i)) >= 8192)
      assert(t.lead_trim == firstLoud)
    }
  }

  test("IVF-PQ: a vector whose residual matches a codebook entry exactly scores ADC 0 against itself-like queries") {
    // corpus: centroids 0..1 (cells=2), codebook ids 0..1, plus copies
    val c0 = Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    val c1 = Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)
    val corpus = vecs(0L -> c0, 1L -> c1, 5L -> c0, 9L -> c1)
    val queries = vecs(0L -> c0)
    val r = Similarity.ivfPqTopK(corpus, queries, cells = 2, m = 2, k = 2, probes = 2, topK = 3)
      .orderBy("rank").collect()
    // 5 is an exact copy of centroid 0: residual 0, code reconstructs exactly → ADC 0
    assert(r(0).getAs[Long]("n_id") == 5L && r(0).getAs[Long]("adc_d2") == 0L)
  }

  test("IVF-PQ probes limit the searched cells: probes=1 only scores the query's own cell") {
    val c0 = Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    val c1 = Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)
    val corpus = vecs(0L -> c0, 1L -> c1, 5L -> c0, 9L -> c1)
    val queries = vecs(0L -> c0)
    val got = Similarity.ivfPqTopK(corpus, queries, cells = 2, m = 2, k = 2, probes = 1, topK = 10)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(got == Set(5L), s"only cell-0 members should be scored, got $got")
  }

  test("truncated recall: identical truncation gives recall 1.0; adversarial tail dims lower it") {
    // vectors whose first 2 dims agree but tails diverge: truncating to
    // 2 dims must reorder neighbors for the probe query
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 5f, 0f),
      2L -> Seq(1f, 0f, 0f, 5f),
      3L -> Seq(0f, 1f, 0f, 0f))
    val q = vecs(0L -> Seq(1f, 0f, 0f, 0f))
    val full = Similarity.truncatedRecall(corpus, q, dims = 4, k = 2).collect().head
    assert(full.getAs[Long]("recall_ppm") == 1000000L) // dims=4 IS the full vector
    val r = Similarity.truncatedRecall(corpus, q, dims = 2, k = 2).collect().head
    assert(r.getAs[Long]("k_full") == 2L)
    assert(r.getAs[Long]("recall_ppm") <= 1000000L)
  }

  test("discount/qty covariance: planted positive and negative relationships get the right sign") {
    val li = Seq(
      // flag A: discount rises with quantity → positive covariance
      ("A", 0.01, 10.0), ("A", 0.05, 30.0), ("A", 0.10, 50.0),
      // flag B: discount falls with quantity → negative
      ("B", 0.10, 10.0), ("B", 0.05, 30.0), ("B", 0.01, 50.0))
      .toDF("l_returnflag", "l_discount", "l_quantity")
    val got = li
      .select(col("l_returnflag"),
        round(col("l_discount") * 100).cast("long").as("d_pct"),
        round(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("d_pct")).as("sum_d"),
        sum(col("qty")).as("sum_q"), sum(col("d_pct") * col("qty")).as("sum_dq"))
      .withColumn("cov_numer", expr("n * sum_dq - sum_d * sum_q"))
      .orderBy("l_returnflag").collect()
    assert(got(0).getAs[Long]("cov_numer") > 0)
    assert(got(1).getAs[Long]("cov_numer") < 0)
  }

  test("WAV downsample: real re-encode halves rate and keeps even-index samples exactly") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val r = Multimodal.downsampleWavBatch(Multimodal.wavFromDocuments(docs), factor = 2)
      .collect().sortBy(_.doc_id)
    r.foreach { st =>
      val n = Multimodal.wavSampleCount(st.doc_id)
      assert(st.sample_rate == Multimodal.wavRate(st.doc_id) / 2)
      assert(st.n_samples == (n + 1) / 2)
      val expSumSq = (0 until n by 2).map { i =>
        val v = Multimodal.wavSample(st.doc_id, i).toLong; v * v
      }.sum
      assert(st.sum_sq == expSumSq)
    }
  }

  test("self repetition: a looping doc scores high, varied text low, short docs zero") {
    val d = Seq(
      (1L, "a b c d a b c d a b c d"),    // "a b c d" repeats: 9 grams, 4 distinct
      (2L, "one two three four five six"), // all distinct
      (3L, "tiny doc"))                    // < 4 tokens → no grams
      .toDF("doc_id", "text")
    val r = TextAnalysis.selfRepetition(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_grams") == 9 && r(0).getAs[Long]("n_distinct") == 4)
    assert(r(0).getAs[Long]("dup_gram_ppm") == (9L - 4L) * 1000000L / 9L)
    assert(r(0).getAs[Long]("top_gram_n") == 3) // "a b c d" occurs 3x
    assert(r(1).getAs[Long]("dup_gram_ppm") == 0 && r(1).getAs[Long]("top_gram_ppm") > 0)
    assert(r(2).getAs[Long]("n_grams") == 0 && r(2).getAs[Long]("top_gram_ppm") == 0)
  }

  test("knn-distance outliers: an isolated vector flags, clustered ones don't") {
    // tight cluster of 4 near-identical vectors + one orthogonal loner
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0.01f, 0f, 0f, 1f, 0f, 0f, 0f),
      2L -> Seq(1f, 0f, 0.01f, 0f, 1f, 0f, 0f, 0f),
      3L -> Seq(1f, 0f, 0f, 0.01f, 1f, 0f, 0f, 0f),
      9L -> Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, -1f))
    val r = Similarity.knnDistOutliers(corpus, k = 3, blocks = 2, threshold = 0.5)
      .orderBy("vec_id").collect()
    assert(!r(0).getAs[Boolean]("is_isolated"))
    assert(r(4).getAs[Boolean]("is_isolated"), "the orthogonal loner must flag")
  }

  test("phash representatives: exactly one survivor per cluster; originals beat equal-size twins") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 20).select(col("id").as("doc_id"))
    val media = Multimodal.bmpWithPerturbedTwins(docs)
    val pairs = Multimodal.phashNearDup(media)
      .select(col("id_a").as("a_id"), col("id_b").as("b_id"))
    val ids = docs.select(col("doc_id"))
      .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id")))
    val reps = Multimodal.phashClusterRepresentatives(
      media, graft.ext.Dedup.dupClustersStar(ids, pairs)).collect()
    val byCluster = reps.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.forall(_._2.count(_.getAs[Boolean]("is_representative")) == 1))
    // a twin (+1e6) has the same resolution as its original, so the
    // lower-id original must win its cluster
    reps.filter(r => r.getAs[Long]("doc_id") >= 1000000L && r.getAs[Boolean]("is_representative"))
      .foreach { r =>
        val cluster = byCluster(r.getAs[Long]("cluster_id"))
        assert(!cluster.exists(_.getAs[Long]("doc_id") < 1000000L),
          "a twin may only represent a cluster with no original in it")
      }
  }

  test("dq expectations: all warehouse checks pass on clean data; a planted violation flips its row") {
    val r = SparkEntry.queries("dq_expectations")(spark, sf("sf0.001")).collect()
    assert(r.length == 8 && r.forall(_.getAs[Boolean]("passed")), r.mkString("; "))
    // planted orphan: a lineitem row pointing at a nonexistent order
    val orders = graft.sources.Tables.load(spark, sf("sf0.001"), "orders")
    val li = graft.sources.Tables.load(spark, sf("sf0.001"), "lineitem")
    val badLi = li.unionByName(li.limit(1).withColumn("l_orderkey", lit(-999L)))
    val cust = graft.sources.Tables.load(spark, sf("sf0.001"), "customer")
    val ev = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val r2 = graft.ext.Profile.expectations(orders, badLi, cust, ev, docs)
      .filter(col("table_name") === "lineitem->orders").collect().head
    assert(!r2.getAs[Boolean]("passed") && r2.getAs[Long]("observed") == 1L)
  }

  test("binaryFile source: decoded stats from scanned files equal the in-memory decode") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 12).select(col("id").as("doc_id"))
    val path = java.nio.file.Files.createTempDirectory("graft_bmpfiles").toString
    Multimodal.stageBmpFiles(docs, path)
    val fromFiles = Multimodal.decodeBmpFiles(path).orderBy("doc_id").collect()
    val inMemory = Multimodal.decodeBmpBatch(Multimodal.bmpFromDocuments(docs))
      .toDF().orderBy("doc_id").collect()
    assert(fromFiles.toSeq == inMemory.toSeq)
    // staging must clear stale files: restage a smaller set and re-read
    Multimodal.stageBmpFiles(spark.range(0, 3).select(col("id").as("doc_id")), path)
    assert(Multimodal.decodeBmpFiles(path).count() == 3)
  }

  test("funnel rates: reach and conversion collapse the per-user funnel correctly") {
    val day = 3600000000000L // one hour in nanos
    val e = Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "purchase"), // full journey
      (2L, 0L, "view"), (2L, 1L, "click"),                       // stops at click
      (3L, 0L, "view"),                                          // view only
      (4L, 0L, "click"))                                         // click w/o view: not in funnel
      .map { case (u, h, t) => (u, h * day, t) }
      .toDF("user_id", "ts", "event_type")
      .select(lit(1L).as("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    val r = Events.funnelRates(e, Seq("view", "click", "purchase")).orderBy("step_index").collect()
    assert(r.map(_.getAs[Long]("n_users")).toList == List(3L, 2L, 1L))
    assert(r(1).getAs[Long]("conv_from_prev_ppm") == 666666L) // 2/3
    assert(r(2).getAs[Long]("conv_from_prev_ppm") == 500000L) // 1/2
    assert(r(2).getAs[Long]("conv_from_first_ppm") == 333333L) // 1/3
  }

  test("SES forecast: level halves toward each observation; first-day residual is zero") {
    val day = 86400000000000L
    val e = Seq((0L, 100.0), (1L, 200.0), (2L, 200.0))
      .map { case (d, v) => (d * day, v) }
      .toDF("ts", "value")
      .select(lit(1L).as("event_id"), col("ts"), lit(1L).as("user_id"),
        lit("view").as("event_type"), col("value"), lit("{}").as("props"))
    val r = Events.sesForecast(e).orderBy("day").collect()
    assert(r(0).getAs[Long]("level") == 10000L && r(0).getAs[Long]("residual_cents") == 0L)
    assert(r(1).getAs[Long]("forecast") == 10000L) // yesterday's level
    assert(r(1).getAs[Long]("level") == 15000L)    // (20000+10000)/2
    assert(r(2).getAs[Long]("level") == 17500L)
    assert(r(2).getAs[Long]("residual_cents") == 20000L - 15000L)
  }

  test("weighted sample: over-represented slices are cut toward the √n targets, minority kept whole") {
    val d = (1L to 90L).map(i => (i, "en")) ++ (91L to 100L).map(i => (i, "ko"))
    val docs = d.toDF("doc_id", "lang").withColumn("text", lit("x"))
      .withColumn("source", lit("s")).withColumn("n_chars", lit(1L))
    val r = graft.ext.TrainPrep.weightedSample(docs).orderBy("lang").collect()
    val en = r(0); val ko = r(1)
    // ko is the most up-weighted slice -> keeps everything
    assert(ko.getAs[Long]("accept_ppm") == 1000000L && ko.getAs[Long]("n_kept") == 10L)
    // en is down-sampled: acceptance strictly below 1 and kept < n_docs
    assert(en.getAs[Long]("accept_ppm") < 1000000L)
    assert(en.getAs[Long]("n_kept") < 90L && en.getAs[Long]("n_kept") > 0L)
    // determinism: the same call keeps the same count
    val r2 = graft.ext.TrainPrep.weightedSample(docs).orderBy("lang").collect()
    assert(r2(0).getAs[Long]("n_kept") == en.getAs[Long]("n_kept"))
  }

  test("anomaly debounce: a lone breach stays quiet, two consecutive hours page") {
    val hour = 3600000000000L // nanos
    // type 'a': 26 days of 1 event at hour 0 establish the baseline;
    // day 30 gets a burst at hours 0 AND 1, day 40 a lone burst at hour 0
    val rows =
      (0L until 26L).map(d => (d * 24L * hour, "a")) ++
      (0L until 26L).map(d => (d * 24L * hour + hour, "a")) ++
      Seq.fill(10)((30L * 24L * hour, "a")) ++ Seq.fill(10)((30L * 24L * hour + hour, "a")) ++
      Seq.fill(10)((40L * 24L * hour, "a"))
    val e = rows.toDF("ts", "event_type")
      .select(lit(1L).as("event_id"), col("ts"), lit(1L).as("user_id"),
        col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
    val r = Events.anomalyDebounce(e).collect()
    def cell(day: Long, hod: Long) =
      r.find(x => x.getAs[Long]("day") == day && x.getAs[Long]("hod") == hod).get
    assert(cell(30, 0).getAs[Boolean]("is_anomaly") && !cell(30, 0).getAs[Boolean]("is_alert"))
    assert(cell(30, 1).getAs[Boolean]("is_alert"), "second consecutive breach must page")
    assert(cell(40, 0).getAs[Boolean]("is_anomaly") && !cell(40, 0).getAs[Boolean]("is_alert"))
  }

  test("BPE pair counts: the dominant adjacent pair ranks first with its exact count") {
    val d = Seq((1L, "aab aab x"), (2L, "aab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpePairCounts(d, k = 5).orderBy("rank").collect()
    // pairs per "aab": (a,a), (a,b) -> 3 occurrences each; tie broken lexicographically
    assert(r(0).getAs[String]("a") == "a" && r(0).getAs[String]("b") == "a")
    assert(r(0).getAs[Long]("n_pairs") == 3)
    assert(r(1).getAs[String]("b") == "b" && r(1).getAs[Long]("n_pairs") == 3)
    assert(!r.exists(_.getAs[String]("a") == "x"), "1-char words contribute no pairs")
  }

  test("clip calibration: nearest-rank p99 sits at or below the max, headroom exact") {
    val d = vecs(
      (0L to 9L).map(i => i -> (Seq.fill(3)(0.1f) :+ (if (i == 9) 10f else 0.2f))): _*)
    val r = Similarity.clipCalibration(d, pct = 90).orderBy("dim").collect()
    // dim 3: nine 0.2e6 values + one 10e6 outlier; p90 of 10 values = 9th asc = 200000
    val d3 = r(3)
    assert(d3.getAs[Long]("clip_q") == 200000L && d3.getAs[Long]("max_q") == 10000000L)
    assert(d3.getAs[Long]("headroom_ppm") == (10000000L - 200000L) * 1000000L / 10000000L)
    assert(r(0).getAs[Long]("clip_q") == 100000L && r(0).getAs[Long]("headroom_ppm") == 0L)
  }

  test("k-core: the 3-core of a clique-plus-tail is exactly the clique") {
    // K4 on {1,2,3,4} plus tail 4-5-6
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("ea", "eb")
    val core = GraphOps.kCore(e, k = 3).collect()
    assert(core.map(_.getAs[Long]("node")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(core.forall(_.getAs[Long]("core_degree") == 3L))
    assert(GraphOps.kCore(e, k = 4).count() == 0, "no 4-core exists")
  }

  test("shard manifest: checksums reconstruct from the pure per-id hash; shards partition the corpus") {
    val docs = (1L to 40L).map(i => (i, "w " * i.toInt)).toDF("doc_id", "text")
    val m = graft.ext.TrainPrep.shardManifest(docs).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 40L)
    assert(m.map(_.getAs[Long]("id_checksum")).sum == (1L to 40L).sum)
    // re-running yields the identical manifest (pure function of ids)
    val m2 = graft.ext.TrainPrep.shardManifest(docs).collect()
    assert(m.sortBy(_.getAs[Long]("shard")).toSeq == m2.sortBy(_.getAs[Long]("shard")).toSeq)
  }

  test("benford digits: shares sum to ~1e6 and the expectation column carries the log table") {
    val e = (1L to 300L).map(i => (i % 90 + 10).toDouble) // uniform 10..99 cents
      .toDF("value")
      .select(lit(1L).as("event_id"), lit(0L).as("ts"), lit(1L).as("user_id"),
        lit("view").as("event_type"), col("value"), lit("{}").as("props"))
    val r = Events.benfordDigits(e).orderBy("digit").collect()
    assert(r.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val total = r.map(_.getAs[Long]("observed_ppm")).sum
    assert(total > 999990L && total <= 1000000L) // floor-div rounding only
    assert(r(0).getAs[Long]("benford_ppm") == 301029L)
    assert(r.forall(x => x.getAs[Long]("delta_ppm") ==
      x.getAs[Long]("observed_ppm") - x.getAs[Long]("benford_ppm")))
  }

  // ---- plan-shape assertions: the scale properties the new family promises ----

  test("PQ encode scores candidates against a BROADCAST codebook — no shuffle join on the corpus") {
    val p = plan(SparkEntry.queries("embedding_pq_encode")(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "codebook must broadcast:\n" + p.take(1500))
  }

  test("IVF-PQ search joins codes to broadcast distance tables — no corpus-side SMJ") {
    val p = plan(SparkEntry.queries("knn_ivfpq")(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "centroids/codebook/dtab must broadcast:\n" + p.take(1500))
  }

  test("weighted sample broadcasts the slice weight table onto the scan") {
    val p = plan(SparkEntry.queries("dataset_weighted_sample")(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("DQ referential checks run as hash anti-joins, never nested-loop") {
    val p = plan(SparkEntry.queries("dq_expectations")(spark, sf("sf0.001")))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "anti-joins must stay equi-hash:\n" + p.take(1500))
  }

  test("binaryFile compaction: many tiny objects become few parquet files with identical decoded stats") {
    val r = SparkEntry.queries("binary_file_compaction")(spark, sf("sf0.001")).collect()
    val direct = SparkEntry.queries("multimodal_bmp_decode")(spark, sf("sf0.001")).collect()
    assert(r.toSeq == direct.toSeq, "compacted decode must equal the in-memory decode")
    val compacted = new java.io.File(
      graft.ext.Multimodal.stagingDir(spark, "bmpcompact"))
    val parts = compacted.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts <= 4, s"compaction must bound the file count, got $parts")
  }

  test("RP recall: projecting to the full dimension count with identity-ish signs keeps recall sane") {
    // 4 well-separated vectors: RP to 16 dims from 8 keeps neighborhoods mostly intact
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f, 1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val r = Similarity.randomProjectionRecall(corpus, vecs(0L -> Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),
      outDims = 16, k = 2).collect().head
    assert(r.getAs[Long]("k_full") == 2L)
    assert(r.getAs[Long]("recall_ppm") >= 500000L, "RP to 2x dims should keep most neighbors")
    assert(r.getAs[Long]("recall_ppm") <= 1000000L)
  }

  test("incremental phash probes batch-vs-corpus only: every twin pairs, no twin-twin pairs emitted") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 25).select(col("id").as("doc_id"))
    val all = Multimodal.bmpWithPerturbedTwins(docs)
    val r = Multimodal.phashIncremental(
      all.filter(col("doc_id") < 1000000L),
      all.filter(col("doc_id") >= 1000000L)).collect()
    val planted = r.filter(x => x.getAs[Long]("new_id") == x.getAs[Long]("old_id") + 1000000L)
    assert(planted.length == 25, s"every twin must hit its original, got ${planted.length}")
    assert(r.forall(x => x.getAs[Long]("old_id") < 1000000L && x.getAs[Long]("new_id") >= 1000000L))
  }

  test("sequence conformance: planted lifecycle violations count into the right rule rows") {
    val e = Seq(
      (1L, 0L, "view"), (1L, 1L, "click"),       // conformant
      (2L, 0L, "click"), (2L, 1L, "view"),       // click before first view
      (3L, 0L, "purchase"),                      // purchase without view
      (4L, 0L, "view"), (4L, 1L, "signup"))      // signup after activity
      .map { case (u, t0, ty) => (u, t0 * 1000000000L, ty) }
      .toDF("user_id", "ts", "event_type")
      .select(lit(1L).as("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    val r = Events.sequenceConformance(e).orderBy("rule").collect()
    val byRule = r.map(x => x.getAs[String]("rule") -> x.getAs[Long]("n_violations")).toMap
    assert(byRule("click_before_first_view") == 1L)
    assert(byRule("purchase_without_view") == 1L)
    assert(byRule("signup_not_first_event") == 1L)
    assert(r.forall(_.getAs[Long]("n_users") == 4L))
  }

  test("IVF cell stats: a member identical to its centroid contributes zero error") {
    val c0 = Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    val c1 = Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)
    val corpus = vecs(0L -> c0, 1L -> c1, 5L -> c0, 6L -> c0)
    val r = Similarity.ivfCellStats(corpus, cells = 2).orderBy("cell_id").collect()
    assert(r(0).getAs[Long]("n_members") == 3L) // 0, 5, 6
    assert(r(0).getAs[Long]("sum_d2c") == 0L && r(0).getAs[Long]("mean_d2c") == 0L)
    assert(r(1).getAs[Long]("n_members") == 1L)
  }

  test("license screen: marker docs flag once each, clean docs don't") {
    val d = Seq(
      (1L, "Copyright 2024 someone", "a"),
      (2L, "this text is under a LICENSE and all rights reserved", "a"),
      (3L, "perfectly clean prose", "a"))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = TextAnalysis.licenseScreen(d).collect().head
    assert(r.getAs[Long]("n_copyright") == 1L)
    assert(r.getAs[Long]("n_rights_reserved") == 1L && r.getAs[Long]("n_license") == 1L)
    assert(r.getAs[Long]("n_flagged") == 2L) // doc 2 counts once despite two markers
    assert(r.getAs[Long]("flagged_ppm") == 666666L)
  }

  test("exact embedding dedup: planted copies collapse to the lowest id; distinct vectors survive") {
    val e = vecs(1L -> Seq(1f, 2f), 2L -> Seq(1f, 2f), 3L -> Seq(3f, 4f))
    val r = Similarity.embeddingExactDups(e).orderBy("keep_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("keep_id") == 1L && r(0).getAs[Long]("n_copies") == 2L)
    assert(r(1).getAs[Long]("keep_id") == 3L && r(1).getAs[Long]("n_copies") == 1L)
  }

  test("sharpness: a flat image has zero gradient energy; the real-payload path matches the formula") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // a hand-built flat gray 4x2 BMP: every gradient is 0
    val w = 4; val h = 2
    val stride = (w * 3 + 3) / 4 * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (_ <- 0 until h; _ <- 0 until w) bb.put(100.toByte).put(100.toByte).put(100.toByte)
    import spark.implicits._
    val flat = Seq(Multimodal.BmpRecord(1L, bb.array())).toDS()
    val r = Multimodal.bmpSharpness(flat).collect().head
    assert(r.grad_sum == 0L && r.grad_max == 0L && r.n_gradients == (w - 1).toLong * h)
  }

  test("two-hop reach: a path graph's endpoint reaches exactly two nodes") {
    // path 1-2-3: node 1 reaches {2, 3}, node 2 reaches {1, 3}
    val e = Seq((1L, 2L), (2L, 3L)).toDF("ea", "eb")
    val r = GraphOps.twoHopReach(e).collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Long]("reach_2hop")).toMap
    assert(r(1L) == 2L && r(2L) == 2L && r(3L) == 2L)
  }

  test("MoM growth: signed ppm via positive-operand division; first month null") {
    val o = Seq(("1995-01-05", 100.0), ("1995-02-05", 150.0), ("1995-03-05", 75.0))
      .toDF("d", "o_totalprice")
      .select(to_date(col("d")).as("o_orderdate"), col("o_totalprice"))
    val r = Assoc.momGrowth(o).orderBy("ym").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("growth_ppm")))
    assert(r(1).getAs[Long]("growth_ppm") == 500000L)   // +50%
    assert(r(2).getAs[Long]("growth_ppm") == -500000L)  // -50%
  }

  test("user features: session rollup joins onto the flat aggregate; gaps split sessions") {
    val min = 60000000000L // one minute in nanos
    val e = Seq(
      (1L, 0L * min), (1L, 10L * min),  // session 1 (10 min)
      (1L, 60L * min),                  // 50-min gap -> session 2
      (2L, 0L * min))                   // single-event user
      .toDF("user_id", "ts")
      .select(monotonically_increasing_id().as("event_id"), col("ts"), col("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    val r = Events.userFeatures(e).orderBy("user_id").collect()
    assert(r(0).getAs[Long]("n_sessions") == 2L)
    assert(r(0).getAs[Long]("session_time_us") == 10L * 60L * 1000000L)
    assert(r(0).getAs[Long]("events_per_session_ppm") == 1500000L) // 3 events / 2 sessions
    assert(r(1).getAs[Long]("n_sessions") == 1L && r(1).getAs[Long]("session_time_us") == 0L)
  }

  test("degree assortativity: a star graph is disassortative, a clique neutral") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("ea", "eb")
    val rs = GraphOps.degreeAssortativity(star).collect().head
    assert(rs.getAs[Long]("cov_numer") < 0 && !rs.getAs[Boolean]("assortative"))
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("ea", "eb")
    val rk = GraphOps.degreeAssortativity(k3).collect().head
    assert(rk.getAs[Long]("cov_numer") == 0L) // all degrees equal
  }

  test("brand share YoY: shares sum to ~1e6 per year and shifts are exact differences") {
    val li = Seq(
      (1L, "1995-06-01", 100.0), (2L, "1995-06-01", 300.0),   // year 1: A 25%, B 75%
      (1L, "1996-06-01", 200.0), (2L, "1996-06-01", 200.0))   // year 2: 50/50
      .toDF("l_partkey", "d", "l_extendedprice")
      .select(col("l_partkey"), to_date(col("d")).cast("timestamp").as("l_shipdate"),
        col("l_extendedprice"))
    val p = Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
    val r = Assoc.brandShareYoy(li, p).orderBy("p_brand", "yr").collect()
    assert(r(0).getAs[Long]("share_ppm") == 250000L)
    assert(r(1).getAs[Long]("share_ppm") == 500000L)
    assert(r(1).getAs[Long]("share_shift_ppm") == 250000L)
    assert(r(3).getAs[Long]("share_shift_ppm") == -250000L)
  }

  test("return rate: only 'R' lines count, ppm exact per month") {
    val li = Seq(("1995-01-05", "R"), ("1995-01-06", "N"), ("1995-01-07", "A"))
      .toDF("d", "l_returnflag")
      .select(to_date(col("d")).cast("timestamp").as("l_shipdate"), col("l_returnflag"))
    val r = Assoc.returnRateByMonth(li).collect().head
    assert(r.getAs[Long]("n_returned") == 1L && r.getAs[Long]("return_ppm") == 333333L)
  }

  test("phash pipeline never shuffles payload bytes: the hash projection happens before the exchange") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 8).select(col("id").as("doc_id"))
    val p = plan(Multimodal.phashNearDup(Multimodal.bmpWithPerturbedTwins(docs)))
    // payload column must not appear in any Exchange's output schema
    val exchanges = p.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty)
    assert(!p.contains("payload#") || !exchanges.exists(_.contains("payload")),
      "payload must be dropped before shuffling:\n" + p.take(1500))
  }
}
