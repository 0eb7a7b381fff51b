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
    spark.stop()
  }
}
