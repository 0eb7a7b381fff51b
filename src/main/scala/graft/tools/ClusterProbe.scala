package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup_clusters pipeline stages. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    val corpus = d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))).as("text")))
    // warm JIT
    time("warmup lsh")(graft.ext.Dedup.minhashLsh(corpus).count())
    time("lsh count")(graft.ext.Dedup.minhashLsh(corpus).count())
    val pairs = graft.ext.Dedup.minhashLsh(corpus)
    val t0 = System.nanoTime()
    val cl = graft.ext.Dedup.dupClusters(corpus, pairs)
    time("cluster total")(cl.count())
    time("with orderBy")(graft.ext.Dedup.dupClusters(corpus, graft.ext.Dedup.minhashLsh(corpus)).orderBy("doc_id").count())
    time("fast lsh warmup")(graft.ext.Dedup.minhashLshFast(corpus).count())
    spark.sharedState.cacheManager.clearCache()
    time("fast lsh")(graft.ext.Dedup.minhashLshFast(corpus).count())
    spark.sharedState.cacheManager.clearCache()
    time("md5 lsh")(graft.ext.Dedup.minhashLsh(corpus).count())
    spark.stop()
  }
}
