package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scaling evidence for [[graft.ext.Scale.chunkedCumSum]]: cumulative
  * sum over a ONE-group histogram of N distinct values — the shape
  * where `Window.partitionBy(g).orderBy(o)` degrades to a single task
  * no matter the cluster width. Runs both formulations at 1×/4×/16×
  * through the noop sink (count() would prune the cum column and
  * measure nothing) and prints per-multiple wall seconds; recorded in
  * SCALING.md.
  */
object CumSumProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val baseN = 600000L

    def hist(mult: Int): DataFrame =
      spark.range(baseN * mult).select(
        lit("g").as("grp"), col("id").as("ord"), (col("id") % 1000 + 1).as("v"))

    def run(name: String, df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val mults = sys.env.getOrElse("SPARK_GRAFT_CUMSUM_MULTS", "1,4,16,64")
      .split(",").map(_.trim.toInt).toSeq
    for (mult <- mults) {
      val h = hist(mult).persist()
      h.count()
      val plain = run("window", h.withColumn("cum",
        sum(col("v")).over(Window.partitionBy("grp").orderBy("ord"))))
      val chunked = run("chunked", graft.ext.Scale.chunkedCumSum(
        h, Seq("grp"), "ord", "v", "cum", chunks = 64))
      println(f"""{"probe":"cumsum","mult":$mult,"rows":${baseN * mult},"window_sec":$plain%.2f,"chunked_sec":$chunked%.2f}""")
      h.unpersist()
    }
    spark.stop()
  }
}
