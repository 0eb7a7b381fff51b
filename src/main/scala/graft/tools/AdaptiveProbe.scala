package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Calibration probe for the round-7 adaptive IVF-PQ policy: prints the
  * measured residual SNR, the chosen mode, and recall@5 vs brute force
  * on a given corpus — run on both the structured sf* embeddings and
  * the weak-structure organic embeddings to place the SNR threshold
  * between the two regimes.
  *
  * args: dir [cells] — cells is an integer, "auto" (√n via
  * Similarity.adaptiveCells — the round-8 growth-table mode), or
  * omitted for the fixed default 8. The printed scan_frac =
  * mean(shortlist_len)/n is the fraction of the corpus each query
  * actually scores.
  */
object AdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("adaptive-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val n = e.count()
    val cells =
      if (args.length < 2) 8
      else if (args(1) == "auto") Similarity.adaptiveCells(n)
      else args(1).toInt
    val res = Similarity.ivfPqAdaptive(e, q, cells = cells).persist()
    val head = res.select(col("mode"), col("snr_ppm")).limit(1).collect().head
    val truth = Similarity.bruteForceTopK(e, q, 5)
      .select(col("q_id"), col("n_id"))
    // brute-force top-5 is cosine-ranked; adaptive is L2-ranked over
    // UNNORMALIZED vectors, so compare against L2 truth instead
    val truthL2 = {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(spark)
      val c = e.select(col("vec_id").as("n_id"),
        graft.ext.TextPrimitives.quantized(col("embedding")).as("cv"))
      val qq = q.select(col("vec_id").as("q_id"),
        graft.ext.TextPrimitives.quantized(col("embedding")).as("qq"))
      val w = Window.partitionBy("q_id").orderBy(col("d2"), col("n_id"))
      c.join(broadcast(qq), col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          expr("aggregate(zip_with(cv, qq, (x, y) -> (x - y) * (x - y)), cast(0 as bigint), (acc, v) -> acc + v)").as("d2"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"))
    }
    val hit = res.select(col("q_id"), col("n_id"))
      .join(truthL2, Seq("q_id", "n_id")).count()
    val denom = truthL2.count()
    val slStats = res.groupBy(col("q_id")).agg(max(col("shortlist_len")).as("sl"))
      .agg(min(col("sl")), max(col("sl")), avg(col("sl"))).collect().head
    println(s"PROBE dir=$dir n=$n cells=$cells mode=${head.getString(0)} snr_ppm=${head.getLong(1)} " +
      s"recall5_l2=${hit.toDouble / denom} sl_min=${slStats.get(0)} sl_max=${slStats.get(1)} " +
      s"scan_frac=${slStats.getDouble(2) / n} " +
      s"cos_recall=${res.select(col("q_id"), col("n_id")).join(truth, Seq("q_id", "n_id")).count().toDouble / denom}")
    spark.stop()
  }
}
