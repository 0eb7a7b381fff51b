package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"@@@ $name")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    val dir = "/root/testdata/sf0.001"
    dump("scan_project_filter", graft.SparkEntry.queries("scan_project_filter")(spark, dir))
    val base = graft.schema.Snapshot.fromParquetDir(spark, dir)
    dump("diff_dag", graft.diff.Diff.diff(base, base))
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    dump("lsh_ann", graft.ext.Similarity.lshTopK(e, e.limit(4), k = 3))
    dump("tpch_q5", graft.SparkEntry.queries("tpch_q5_local_supplier")(spark, dir))
    // round-3 Catalyst tier: the native as-of operator and the
    // rule-rewritten interval join (pre-checkpoint plan re-derived here)
    dump("asof_native", graft.SparkEntry.queries("asof_join_native")(spark, dir))
    org.apache.spark.sql.graft.Bridge.addOptimization(
      spark, graft.plans.RangeJoinRule(spark))
    spark.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
    try {
      val clicks = graft.sources.Tables.load(spark, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val sessions = graft.ext.Events.sessionize(
          graft.sources.Tables.load(spark, dir, "events"))
        .select(col("user_id").as("s_user_id"), col("session_id"), col("start_us"),
          (col("start_us") + col("duration_us")).as("end_us"))
      dump("range_join_rule", clicks.join(sessions,
        clicks("user_id") === sessions("s_user_id") &&
          clicks("ts_us") >= sessions("start_us") &&
          clicks("ts_us") <= sessions("end_us")))
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    spark.stop()
  }
}
