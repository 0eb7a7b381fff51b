package graft

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, Scale, Similarity}

/** Round-8 policy layer: phash re-banding, √n IVF cells, the
  * skew-adaptive join, and audio-fingerprint codec robustness.
  */
class Queries8Spec extends SparkSpec {

  test("phash re-banding: saturated low-entropy images re-band to 32-bit buckets at full planted-twin recall") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val media = Multimodal.bmpWithPerturbedTwins(docs)
    val fixed = Multimodal.phashNearDup(media).collect()
    val auto = Multimodal.phashNearDupAuto(media).collect()
    assert(auto.nonEmpty && auto.head.getAs[Int]("band_bits") == 32,
      "the synthetic raster corpus saturates 16-bit bands (round-6 measured) — the policy must re-band")
    // planted one-pixel twins (id + 1e6) must pair under BOTH configs:
    // the perturbation only touches bits 0,1,8,9 — inside band 0 at
    // either width
    def twins(rows: Array[org.apache.spark.sql.Row]): Set[Long] =
      rows.collect {
        case r if r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L =>
          r.getAs[Long]("id_a")
      }.toSet
    val want = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(twins(fixed) == want, "16-bit config must catch every planted twin")
    assert(twins(auto) == want, "re-banding must not lose a single planted twin")
    // the budget the decision measured must really be super-linear
    val b16 = auto.head.getAs[Long]("pair_budget_16")
    val n = auto.head.getAs[Long]("n_imgs")
    assert(b16 > 8L * n, s"decision evidence: budget16=$b16 vs n=$n")
  }

  test("phash re-banding: a healthy high-entropy hash corpus keeps the cheap 16-bit config") {
    import spark.implicits._
    // well-spread 64-bit hashes: xxhash64 of the id — 16-bit buckets
    // stay near-singleton, budget is sub-linear, policy must NOT pay
    // the wider-band config
    val hashes = spark.range(0, 2000)
      .select(col("id"), xxhash64(col("id")).as("hash"))
    val auto = Multimodal.phashNearDupAutoFromHashes(hashes)
    assert(auto.schema.fieldNames.contains("band_bits"))
    val stats = Multimodal.phashBandStats(hashes, 4)
      .agg(sum(col("pair_budget")), max(col("n_imgs"))).collect().head
    assert(stats.getLong(0) <= 8L * stats.getLong(1),
      "probe corpus must be below the saturation threshold for this test to bite")
    // near-pairs of random hashes may be empty; the decision is pinned
    // through the evidence columns when any row exists
    val rows = auto.limit(1).collect()
    if (rows.nonEmpty) assert(rows.head.getAs[Int]("band_bits") == 16)
  }

  test("ulaw fingerprint robustness: every doc's codec self-distance is dominated by the mismatched control") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 60).select(col("id").as("doc_id"))
    val qc = Multimodal.ulawFingerprintQc(docs).collect()
    assert(qc.length == 60)
    qc.foreach { r =>
      assert(r.robust, s"doc ${r.doc_id}: self=${r.self_l1} !< control=${r.control_l1}")
      assert(r.control_l1 >= 5 * r.self_l1,
        s"doc ${r.doc_id}: margin collapsed (self=${r.self_l1} control=${r.control_l1})")
      assert(r.n_frames == ((r.n_samples + 63) / 64).toInt)
    }
  }

  test("adaptiveCells: floor(sqrt(n)) with the minimum floor, deterministic at any corpus size") {
    assert(Similarity.adaptiveCells(0) == 8)
    assert(Similarity.adaptiveCells(63) == 8)
    assert(Similarity.adaptiveCells(100) == 10)
    assert(Similarity.adaptiveCells(500) == 22)
    assert(Similarity.adaptiveCells(1000000) == 1000)
    assert(Similarity.adaptiveCells(999999) == 999)
    // the scan-fraction claim: probes/cells falls as the corpus grows
    val f = Seq(1000L, 100000L, 10000000L)
      .map(n => 2.0 / Similarity.adaptiveCells(n))
    assert(f == f.sorted.reverse && f.distinct.size == 3)
  }

  test("adaptive join: salted path fires ONLY on the skewed input, and rewrites to an identical result") {
    val d = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val dim = d.groupBy(col("lang")).agg(count(lit(1)).as("lang_docs"))
    val salted = Scale.adaptiveJoin(d, dim, "lang")
    assert(salted.columns.contains("join_strategy"))
    val sRows = salted.select(col("join_strategy")).distinct().collect()
    assert(sRows.map(_.getString(0)).toSeq == Seq("salted"),
      "documents.lang holds 1.9x+ its even share — the measured gate must salt")
    // the salted plan really spreads the key: the salt explode is in it
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), "salted plan must carry the salt column")
    // result equality: strategy must never change the join's data
    // (rows are unique by doc_id, so symmetric EXCEPT = frame equality)
    val plain = d.join(dim, Seq("lang"))
    assert(salted.count() == plain.count())
    assert(salted.drop("join_strategy", "skew_x_ppm").except(plain).count() == 0)
    assert(plain.except(salted.drop("join_strategy", "skew_x_ppm")).count() == 0)
    // the healthy key takes the plain path with NO salt machinery
    val e = graft.sources.Tables.load(spark, sf("sf0.001"), "events")
      .select(col("event_type"), col("value"))
    val edim = e.groupBy(col("event_type")).agg(count(lit(1)).as("type_events"))
    val pl = Scale.adaptiveJoin(e, edim, "event_type")
    assert(pl.select(col("join_strategy")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("plain"))
    assert(!pl.queryExecution.optimizedPlan.toString.contains("__salt"),
      "a healthy key must not pay the salt explosion")
  }
}
