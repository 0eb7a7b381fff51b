package graft

/** One-shot audit harness (run by hand, not a spec): explain every
  * registry key at sf0.001 and report the ones whose physical plan
  * contains a SortMergeJoin — candidates for a missed broadcast of a
  * derived-tiny side (the IVF-PQ SMJ incident class).
  */
object SmjSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val hits = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val n = "SortMergeJoin".r.findAllIn(p).length
        if (n > 0) hits += ((name, n))
      } catch { case e: Throwable => println(s"EXPLAIN-FAIL $name: ${e.getMessage.take(120)}") }
    }
    println("=== keys with SortMergeJoin ===")
    hits.foreach { case (k, n) => println(f"$n%3d  $k") }
    println(s"=== total: ${hits.size} keys ===")
    spark.stop()
  }
}
