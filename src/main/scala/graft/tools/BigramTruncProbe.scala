package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Checkpoints, Scale}
import graft.ext.TextPrimitives._

/** Same-run cost pair for the round-10 bigram-LM lineage truncation
  * (the dedup_minhash_lsh_auto methodology: both variants measured in
  * ONE JVM on the same materialized input, min-of-2 after a warm
  * pass). The shipped [[graft.ext.TextAnalysis.bigramLmScore]]
  * truncates the exploded bigram frame because three consumers read
  * it; the baseline here re-runs the tokenize+explode lineage per
  * consumer.
  */
object BigramTruncProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("bigram-trunc-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    def pairsRaw: DataFrame = Scale.widen(docs)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(slice(w, 1, size(w) - 1),
             (t, i) -> struct(t AS w1, element_at(w, i + 2) AS w2))""")).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))

    def score(pairs: DataFrame): Long = {
      val c12 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      pairs.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .select(col("doc_id"), expr("c12 * 1000000 div c1").as("p_ppm"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_ppm")).as("sum_p_ppm"))
        .count()
    }

    def time(tag: String)(f: => Long): Double = {
      f // warm
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val w = (System.nanoTime() - t0) / 1e9
        println(f"$tag pass: $w%.3f s ($n rows)"); w
      }
      walls.min
    }

    val reversed = args.length > 1 && args(1) == "rev"
    val (trunc, fixed) = if (reversed) {
      val f = time("untruncated")(score(pairsRaw))
      val t = time("truncated")(score(Checkpoints.truncateLazy(pairsRaw)))
      (t, f)
    } else {
      val t = time("truncated")(score(Checkpoints.truncateLazy(pairsRaw)))
      val f = time("untruncated")(score(pairsRaw))
      (t, f)
    }
    println(f"RESULT truncated=$trunc%.3f s untruncated=$fixed%.3f s ratio=${fixed / trunc}%.2f")
    spark.stop()
  }
}
