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
