package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Round-8 payoff probe for the phash re-banding policy: decode a real
  * BMP corpus of `n` images plus their planted one-pixel twins, and
  * measure both band widths' candidate-pair budgets and planted-twin
  * recalls. The synthetic rasters are the LOW-ENTROPY regime (round 6
  * measured 17× organic 16-bit saturation at ×10 scale) — exactly
  * where the 32-bit re-band must cut the budget without losing a twin.
  * args: nImages
  */
object PhashRebandProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .appName("phash-reband-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(0, n).select(col("id").as("doc_id"))
    val hashes = Multimodal.phashHashes(Multimodal.bmpWithPerturbedTwins(docs))
    def budget(bands: Int): Long =
      Multimodal.phashBandStats(hashes, bands)
        .agg(sum(col("pair_budget"))).collect().head.getLong(0)
    def recall(bands: Int): Double =
      Multimodal.hammingPairs(Multimodal.bandedHashes(hashes, bands), 6)
        .filter(col("id_b") === col("id_a") + 1000000L).count().toDouble / n
    val b16 = budget(4); val b32 = budget(2)
    println(s"PHASH_REBAND n=$n b16=$b16 b32=$b32 " +
      s"ratio=${b16.toDouble / math.max(1L, b32)} r16=${recall(4)} r32=${recall(2)}")
    spark.stop()
  }
}
