package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Round-11: the kNN-graph BUILD policy (knnGraphAuto — exact blocked
  * tile join below the measured crossover, NN-descent at/above it) and
  * the consumers routed through it, plus the overflow-proof isqrt.
  */
class Queries11Spec extends SparkSpec {
  import spark.implicits._

  private def emb(dir: String) =
    graft.sources.Tables.load(spark, dir, "embeddings")

  private def sfDir = sf("sf0.001")

  test("knnGraphAuto below the threshold IS the exact blocked graph plus decision evidence") {
    val e = emb(sfDir)
    val auto = Similarity.knnGraphAuto(e, k = 3, exactThreshold = 100000L)
    val exact = Similarity.knnGraphBlocked(e, k = 3)
    val a = auto.collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[String]("graph_mode") == "exact_blocked"))
    val n = e.count()
    assert(a.forall(_.getAs[Long]("n_corpus") == n))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("n_id"))
    assert(a.map(key).toSet == exact.collect().map(key).toSet)
  }

  test("knnGraphAuto at/above the threshold IS the NN-descent graph plus decision evidence") {
    val e = emb(sfDir)
    val auto = Similarity.knnGraphAuto(e, k = 4, exactThreshold = 1L)
    val descent = Similarity.nnDescent(e, k = 4, rounds = 2)
    val a = auto.collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[String]("graph_mode") == "nn_descent"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("n_id"))
    assert(a.map(key).toSet == descent.collect().map(key).toSet)
  }

  test("knnClassify routes through the policy: descent-branch labels agree with exact-branch labels on a clustered corpus") {
    // 300 vectors in 10 well-separated sign-pattern clusters, labeled
    // by cluster: the regime where the approximate graph must not
    // change a single majority vote.
    val d = 16
    val e = spark.range(300).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${d - 1}), i -> cast(" +
        "(case when pmod(hash(cast(id / 30 as int), i), 2) = 0 " +
        "then 1.0 else -1.0 end) " +
        "+ (pmod(id * 13 + i * 7, 11) - 5) * 0.01 as float))").as("embedding"),
      (col("id") / 30).cast("long").as("label"))
    val viaExact = Similarity.knnClassify(e, k = 5, exactThreshold = 100000L)
      .orderBy("vec_id").collect()
    val viaDescent = Similarity.knnClassify(e, k = 5, exactThreshold = 1L)
      .orderBy("vec_id").collect()
    assert(viaExact.length == 300 && viaDescent.length == 300)
    assert(viaExact.forall(r =>
      r.getAs[Long]("predicted_label") == r.getAs[Long]("vec_id") / 30))
    assert(viaDescent.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("predicted_label"))).toSeq ==
      viaExact.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("predicted_label"))).toSeq)
  }

  test("knnDistOutliers routes through the policy and the descent branch only over-flags, never under-flags") {
    // descent misses can only LOWER the k-th cosine (a missed true
    // neighbor is replaced by a farther candidate) -> isolation flags
    // from the descent branch are a superset of the exact ones
    val e = emb(sfDir)
    val exact = Similarity.knnDistOutliers(e, k = 3, exactThreshold = 100000L)
    val descent = Similarity.knnDistOutliers(e, k = 3, exactThreshold = 1L)
    val exFlag = exact.filter(col("is_isolated")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val deFlag = descent.filter(col("is_isolated")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(exFlag.subsetOf(deFlag),
      s"exact-isolated ${exFlag.size} must be within descent-isolated ${deFlag.size}")
  }

  test("knnGraphClusters never crosses planted clusters through EITHER graph branch") {
    // 10 well-separated sign-pattern clusters of 30 contiguous ids:
    // same-cluster cosine ~0.99, cross-cluster ~0. At minCosine 0.9,
    // each branch may SPLIT a planted cluster into sub-components
    // (both graphs keep only k=4 edges per node, and the exact top-4
    // favors identical mod-11 twins while descent's id-window init
    // favors contiguous connectors — the branches legitimately
    // partition differently, the documented approximation contract),
    // but neither may ever MERGE across planted clusters, and both
    // must do substantial in-cluster merging.
    val d = 16
    val e = spark.range(300).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${d - 1}), i -> cast(" +
        "(case when pmod(hash(cast(id / 30 as int), i), 2) = 0 " +
        "then 1.0 else -1.0 end) " +
        "+ (pmod(id * 13 + i * 7, 11) - 5) * 0.01 as float))").as("embedding"))
    for ((thr, mode) <- Seq(100000L -> "exact_blocked", 1L -> "nn_descent")) {
      val rows = Similarity
        .knnGraphClusters(e, k = 4, minCosine = 0.9, exactThreshold = thr)
        .orderBy("vec_id").collect()
      assert(rows.length == 300)
      assert(rows.forall(_.getAs[String]("graph_mode") == mode))
      val labels = rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id")))
      assert(labels.forall { case (v, c) => c / 30 == v / 30 },
        s"$mode components crossed planted clusters: ${labels.take(40).mkString(",")}")
      assert(labels.map(_._2).distinct.length < 150,
        s"$mode: expected substantial in-cluster merging, got near-singletons")
    }
  }

  test("semanticDecontaminate flags the planted paraphrase and broadcasts the eval side") {
    // corpus vec 50 is eval vec 900 plus per-dim noise of 0.01 — no
    // shared tokens needed, the embedding-space leak the n-gram
    // decontaminator cannot see
    val base = spark.range(100).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), i -> cast((pmod(hash(id, i), 2001) - 1000) * 0.001 as float))")
        .as("embedding"))
    val ev = base.filter(col("vec_id") === 42)
      .select((col("vec_id") + 858).as("vec_id"),
        expr("transform(embedding, v -> cast(v + 0.01 as float))").as("embedding"))
    val r = Similarity.semanticDecontaminate(base, ev, threshold = 0.999)
    val rows = r.orderBy("vec_id").collect()
    assert(rows.length == 100)
    val flagged = rows.filter(_.getAs[Boolean]("is_contaminated")).map(_.getAs[Long]("vec_id"))
    assert(flagged.toSeq == Seq(42L), s"flagged: ${flagged.mkString(",")}")
    assert(rows.forall(_.getAs[Long]("closest_eval_id") == 900L))
    // scale claim: the eval side broadcasts; the corpus never shuffles
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"eval set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("embeddingDrift reports an exactly-quantized constant shift in the offset dimension only") {
    val base = spark.range(100).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), i -> cast(pmod(id * 7 + i * 3, 13) * 0.01 as float))")
        .as("embedding"))
    val shifted = base.select(col("vec_id"),
      expr("transform(embedding, (v, i) -> cast(if(i = 0, v + 0.5, v) as float))")
        .as("embedding"))
    val r = Similarity.embeddingDrift(base, shifted).orderBy("dim").collect()
    assert(r.length == 8)
    assert(r.head.getAs[Int]("dim") == 0 &&
      r.head.getAs[Double]("shift") == 500000.0,
      s"dim-0 shift must be exactly 0.5 on the 1e-6 grid: ${r.head}")
    assert(r.tail.forall(_.getAs[Double]("shift") == 0.0), r.mkString("\n"))
    assert(r.forall(x => x.getAs[Long]("n_old") == 100L && x.getAs[Long]("n_new") == 100L))
  }

  test("isqrt fix-up is overflow-proof at the top of the Long range") {
    // r*r for r near floor(sqrt(Long.MaxValue)) = 3037000499 overflows
    // Long; the division-form comparisons must not spin or mis-round.
    // floor(sqrt(Long.MaxValue)) = 3037000499; floor(sqrt(3037000499)) = 55108
    assert(Similarity.adaptiveSupers(Long.MaxValue) == 55108)
    val r = 3037000499L
    assert(Similarity.adaptiveSupers(r * r) == 55108) // exact square at the edge
    // spot-check the nested floor against BigInt ground truth
    for (n <- Seq(Long.MaxValue, Long.MaxValue - 1, r * r, r * r - 1, (1L << 62) + 12345L)) {
      val want = {
        def big(x: BigInt): BigInt = {
          var lo = BigInt(0); var hi = x
          while (lo < hi) { val m = (lo + hi + 1) / 2; if (m * m <= x) lo = m else hi = m - 1 }
          lo
        }
        big(big(BigInt(n))).toInt
      }
      assert(Similarity.adaptiveSupers(n) == math.max(2, want), s"n=$n")
    }
  }
}
