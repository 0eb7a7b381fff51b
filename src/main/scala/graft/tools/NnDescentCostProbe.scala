package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Measurement probe for the round-9 NN-descent kNN-graph builder: on
  * a given corpus, time the EXACT tile-join build
  * ([[Similarity.knnGraphBlocked]], n²/2 cosine evals by contract)
  * against [[Similarity.nnDescent]] (≈ rounds·n·(2k)² candidate
  * evals), and report NN-descent's measured recall against the exact
  * graph. Above `maxExact` vectors the exact build is skipped (that
  * is the point of the probe) and NN-descent runs alone.
  *
  * args: dir|synth:N[:D] [k] [rounds] [maxExact]
  */
object NnDescentCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 4
    val rounds = if (args.length > 2) args(2).toInt else 2
    val maxExact = if (args.length > 3) args(3).toLong else 10000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("nn-descent-cost-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val e =
      if (dir.startsWith("clust:")) {
        // `clust:N:C[:D]` — N vectors in C well-separated sign-pattern
        // clusters with small deterministic perturbations: the
        // INTENDED ANN regime (real embedding corpora are clustered;
        // the uniform synth/organic vectors are the documented
        // weak-structure nemesis of every neighborhood method here)
        val parts = dir.stripPrefix("clust:").split(":")
        val n = parts(0).toLong
        val c = parts(1).toInt
        val d = if (parts.length > 2) parts(2).toInt else 16
        spark.range(n).select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${d - 1}), i -> cast(" +
            s"(case when pmod(hash(cast(id / ${math.max(n / c, 1L)} as int), i), 2) = 0 " +
            "then 1.0 else -1.0 end) " +
            s"+ (pmod(id * 13 + i * 7, 11) - 5) * 0.01 as float))")
            .as("embedding"))
      } else if (dir.startsWith("synth:")) {
        val parts = dir.stripPrefix("synth:").split(":")
        val n = parts(0).toLong
        val d = if (parts.length > 1) parts(1).toInt else 64
        spark.range(n).select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${d - 1}), " +
            "i -> cast(cast(hash(id, i) % 1000 as double) / 1000.0 as float))")
            .as("embedding"))
      } else graft.sources.Tables.load(spark, dir, "embeddings")
    // materialize synthesized corpora once — a generator expression
    // would otherwise be re-evaluated per tile/round on BOTH sides
    val eM = graft.ext.Checkpoints.truncate(e)
    val n = eM.count()
    println(s"n=$n k=$k rounds=$rounds " +
      s"evals_exact=${n * (n - 1) / 2} evals_nnd~=${rounds.toLong * n * (2 * k) * (2 * k)}")

    def time(label: String, mk: () => DataFrame): DataFrame = {
      mk().write.format("noop").mode("overwrite").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${ts.min}%.3f s (passes: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      mk()
    }

    val nnd = time("nn_descent", () => Similarity.nnDescent(eM, k, rounds))
    if (n <= maxExact) {
      val exact = time("exact_tile_join", () => Similarity.knnGraphBlocked(eM, k))
      val hit = nnd.select(col("q_id"), col("n_id"))
        .intersect(exact.select(col("q_id"), col("n_id"))).count()
      val total = exact.count()
      println(f"nnd recall vs exact: $hit/$total (${hit * 100.0 / total}%.2f%%)")
    } else {
      println(s"exact build skipped (n=$n > maxExact=$maxExact) — that is the point")
    }
    spark.stop()
  }
}
