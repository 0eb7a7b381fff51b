package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Tuning probe for the round-7 re-banding spec: build a fixed-vocab
  * corpus (the regime that saturates 16-bit SimHash) with planted
  * near-dup twins, and measure both configs' candidate-pair budgets and
  * planted-pair recalls. args: nDocs vocab docLen
  */
object RebandProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt; val vocab = args(1).toInt; val len = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.range(0, n).select(col("id").as("doc_id"),
      expr(s"concat_ws(' ', transform(sequence(0, ${len - 1}), " +
        s"j -> concat('w', pmod(hash(id * 31 + j * 7), $vocab))))").as("text"))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" "), concat(lit("x"), pmod(hash(col("doc_id")), lit(99991)))).as("text")))
      .persist()
    corpus.count()
    def budget(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("pair_budget"))).collect().head.getLong(0)
    val b16 = budget(Dedup.simhashBandStats(corpus))
    val b64 = budget(Dedup.simhashBandStats64(corpus))
    def recall(pairs: org.apache.spark.sql.DataFrame): Double = {
      val hits = pairs.filter(col("b_id") === col("a_id") + 100000L).count()
      hits.toDouble / n
    }
    val r16 = recall(Dedup.simhashNearPairs(corpus))
    val r64 = recall(Dedup.simhashNearPairs64(corpus))
    println(s"REBAND n=$n vocab=$vocab len=$len b16=$b16 b64=$b64 ratio=${b16.toDouble / math.max(1, b64)} r16=$r16 r64=$r64")
    spark.stop()
  }
}
