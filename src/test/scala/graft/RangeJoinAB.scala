package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B: pure interval join (no equi key) at sf0.1 with the
  * RangeJoinRule off (BroadcastNestedLoopJoin) vs on (binned hash
  * join). Run: sbt 'Test/runMain graft.RangeJoinAB' — numbers land in
  * SCALING.md.
  */
object RangeJoinAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.sources.Tables.load(spark, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), expr("ts div 1000").as("t_us"))
    val sessions = graft.ext.Events.sessionize(e)
      .select(col("session_id"), col("user_id"), col("start_us"),
        (col("start_us") + col("duration_us")).as("end_us"))
    def q = clicks.join(sessions,
      clicks("t_us") >= sessions("start_us") && clicks("t_us") <= sessions("end_us"))
    def time(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = q.count()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    time("warm") // first run pays session/scan warmup, ignore
    time("BNLJ (rule off)")
    spark.conf.set("spark.graft.rangeJoin.binWidth", (3600L * 1000000L).toString)
    time("binned (rule on, 1h bins)")
    time("binned (second run)")
    spark.stop()
  }
}
