package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Scale

/** Scratch: drive extensions injection + scale utilities end-to-end. */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("== graft_qdot via extensions-injected SQL ==")
    spark.sql("SELECT graft_qdot(array(2L,3L), array(10L,100L)) AS d").show()

    val dir = "/root/testdata/sf0.01"
    val orders = graft.sources.Tables.load(spark, dir, "orders")
    val customer = graft.sources.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))

    println("== salted join vs plain join on orders x customer ==")
    val plain = orders.join(customer, "o_custkey").count()
    val salted = Scale.saltedJoin(orders, customer, "o_custkey", salts = 8).count()
    println(s"plain=$plain salted=$salted equal=${plain == salted}")

    println("== bucketed snapshot round-trip, exchange-free join ==")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS demo_orders_a")
    spark.sql("DROP TABLE IF EXISTS demo_orders_b")
    // in-memory catalog: dirs outlive the session even after DROP
    Seq("demo_orders_a", "demo_orders_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    Scale.writeBucketed(orders, "demo_orders_a", "o_orderkey", 8)
    Scale.writeBucketed(orders, "demo_orders_b", "o_orderkey", 8)
    val j = spark.table("demo_orders_a").alias("a")
      .join(spark.table("demo_orders_b").alias("b"), "o_orderkey")
    println(s"joined rows: ${j.count()}")
    j.limit(1).collect()
    val plan = j.queryExecution.executedPlan.toString
    println("plan has Exchange: " + plan.contains("Exchange"))

    println("== probe: salts=0 ==")
    try Scale.saltedJoin(orders, customer, "o_custkey", salts = 0).count()
    catch { case e: IllegalArgumentException => println("error: " + e.getMessage) }
    spark.stop()
  }
}
