package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a subset of registry keys without a full bench run:
  * `runMain graft.tools.TimeKeys <key1,key2,...> [sfDir] [passes]`.
  * Same measurement protocol as [[graft.Bench]] (min over passes,
  * caches cleared between keys).
  */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeKeys <key1,key2,...> [sfDir] [passes]")
    val keys = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val best = collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; k <- keys) {
      val fn = graft.SparkEntry.queries(k)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      best(k) = math.min(best(k), dt)
      println(f"[time] pass $p $k: $dt%.3f s")
    }
    keys.foreach(k => println(f"[best] $k: ${best(k)}%.3f s"))
    spark.stop()
  }
}
