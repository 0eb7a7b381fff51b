package graft

import org.apache.spark.sql.functions._

import graft.ext.{CorpusClean, Dedup, Scale, Similarity, TextAnalysis}

/** Round-10: the advisor's exactness fixes (NULL-sig budget exclusion,
  * integer-exact fourth root, empty-input gates) and the verdict's two
  * scale-killer rewrites (histogram-form capstone terciles, pre-window
  * limited n-gram coverage head).
  */
class Queries10Spec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("shingle-less docs carry NULL band sigs and are excluded from the LSH budget and bucket stats") {
    val base = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog in the field",
      2L -> "the quick brown fox jumps over the lazy dog in the field",
      3L -> "an entirely different document about spark shuffles and joins")
    // <3 tokens -> zero 3-shingles -> NULL minhash rows in all bands.
    // The engine groups sigs per (band, sig) while `||` concatenation
    // in SQL NULL-propagates into ONE merged group — the only
    // convention both sides express identically is exclusion (a doc
    // with no signature occupies no bucket and equi-joins nothing).
    val short = docsDf(100L -> "hi", 101L -> "two words", 102L -> "x")
    val withShort = base.unionByName(short)

    val stats = Dedup.minhashBandStats(withShort).collect()
    assert(stats.length == 4)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 3L,
        s"shingle-less docs must not count into band stats: $r")
      // docs 1 and 2 are identical -> 1 pair per band; doc 3 alone
      assert(r.getAs[Long]("pair_budget") == 1L, r.toString)
    }

    val auto = Dedup.minhashLshAuto(withShort).collect()
    val autoBase = Dedup.minhashLshAuto(base).collect()
    assert(auto.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      autoBase.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "shingle-less docs must not change the verified pair set")
    assert(auto.head.getAs[Long]("n_docs") == 3L &&
      auto.head.getAs[Long]("pair_budget_43") == 4L,
      "decision evidence counts sig-bearing docs only")
  }

  test("adaptiveSupers is the exact integer fourth root at and around perfect fourth powers") {
    // pow(n, 0.25) is not correctly rounded; the nested-isqrt form is.
    // Perfect fourth powers are exactly where a 1-ulp libm error flips
    // the floor.
    val cases = Seq[(Long, Int)](
      16L -> 2, 81L -> 3, 4096L -> 8, 4095L -> 7, 4097L -> 8,
      65536L -> 16, 65535L -> 15, 14641L -> 11,
      (1L << 40) -> 1024, ((1L << 40) - 1) -> 1023,
      1L -> 2, 0L -> 2 /* minSupers floor */ )
    cases.foreach { case (n, want) =>
      assert(Similarity.adaptiveSupers(n) == want, s"n=$n")
    }
  }

  test("adaptiveAgg takes the plain branch on an empty frame instead of throwing") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val r = Scale.adaptiveAgg(empty, "k", "v")
    assert(r.collect().isEmpty)
    assert(r.columns.contains("agg_strategy"))
  }

  test("ngramCoverageCurve cuts the head with orderBy+limit BEFORE the rank window") {
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val r = TextAnalysis.ngramCoverageCurve(docs, probes = Seq(10, 100))
    // the vocabulary head must reach the unpartitioned window already
    // limited to max(probes) rows: a TakeOrderedAndProject in the plan,
    // never a window over all distinct 8-grams
    // plan-shape check gated on the pinned Spark line: physical
    // operator names are planner implementation detail and may change
    // across versions without any behavior change (value assertions
    // below always run)
    if (spark.version.startsWith("4.")) {
      val plan = r.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"expected a pre-window top-k limit in:\n$plan")
    }
    // cum over the survivors equals cum over the full histogram at
    // every consumed rank — values must match the unlimited math
    val rows = r.collect()
    assert(rows.length == 2)
    val total = rows.head.getAs[Long]("total_occurrences")
    assert(rows.forall(_.getAs[Long]("total_occurrences") == total))
    assert(rows.forall(x => x.getAs[Long]("covered") <= total))
  }

  test("capstone terciles: histogram-form thresholds equal the sort-based order statistics, no TakeOrderedAndProject") {
    val docs = graft.sources.Tables.load(spark, sf("sf0.001"), "documents")
    val out = CorpusClean.assemble(docs)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // re-derive the band cuts the slow-but-obvious way: sort the ppm
    // values, rank-k value at k = n/3 and 2n/3
    val ppm = rows.map(_.getAs[Long]("mean_p_ppm")).sorted
    val n = ppm.length
    def cut(k: Int): Long = if (k < 1) Long.MinValue else ppm(k - 1)
    val (t1, t2) = (cut(n / 3), cut(2 * n / 3))
    rows.foreach { r =>
      val v = r.getAs[Long]("mean_p_ppm")
      val want = if (v <= t1) 1 else if (v <= t2) 2 else 3
      assert(r.getAs[Int]("fluency_band") == want, r.toString)
    }
    // the scale claim: nothing data-proportional reaches one task — no
    // TakeOrderedAndProject (the old orderBy().limit(n/3) plan) in the
    // returned frame's plan. Gated on the pinned Spark line: operator
    // names are planner detail (value assertions above always run).
    if (spark.version.startsWith("4.")) {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("TakeOrderedAndProject"), plan)
    }
  }

  test("capstone assemble survives an empty corpus (gate null-guards)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusClean.assemble(empty).collect().isEmpty)
  }
}
