package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossover measurement behind
  * [[graft.ext.TextAnalysis.gatedChunkModel]]'s broadcast budget: a
  * synthetic chunk-grain encode model of varying size joined back
  * over a fixed 10M-row chunk stream (the encode-corpus side), each
  * size timed with the model side (a) broadcast-hinted and (b) forced
  * to a shuffle join (auto-broadcast off, no hint). Prints one line
  * per (rows, strategy) for SCALING.md's probe table.
  *
  * What the budget actually protects against at 100 TB is MEMORY, not
  * latency — a corpus-sized broadcast OOMs the driver/executors long
  * before its build time matters — so the interesting outputs are
  * (1) where the latency crossover sits on this host (broadcast wins
  * while the model is small; the hash-relation build + per-task copy
  * overtakes the exchange somewhere in the millions of rows) and
  * (2) that the shuffle path's cost is FLAT-ish in model size, i.e.
  * routing large models to it is safe, not just survivable.
  *
  * Run: sbt "runMain graft.tools.BroadcastGateProbe"
  */
object BroadcastGateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val streamRows = sys.env.getOrElse("SPARK_GRAFT_PROBE_STREAM", "10000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-broadcast-gate-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 32-char chunk keys (the production unit): md5-expanded ids
    def chunkKey(c: org.apache.spark.sql.Column) = md5(c.cast("string"))

    def model(rows: Long): DataFrame = spark.range(rows)
      .select(chunkKey(col("id")).as("w"),
        (col("id") % 7 + 1).as("n_tok"), lit(32L).as("n_chr"))

    // stream whose keys all HIT the model (worst case for the join)
    def stream(modelRows: Long): DataFrame = spark.range(streamRows)
      .select(chunkKey(col("id") % modelRows).as("w"),
        (col("id") % 5).cast("string").as("lang"))

    def timed(tag: String, f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[gateprobe] $tag%-28s ${s}%8.2f s")
      s
    }

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Seq(100000L, 500000L, 2000000L, 8000000L).foreach { rows =>
      val m = model(rows).persist()
      m.count() // materialize off the clock
      val st = stream(rows)
      def run(joined: DataFrame): Unit = {
        joined.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_tok").as("t"))
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"rows=$rows broadcast", run(st.join(broadcast(m), Seq("w"))))
      timed(s"rows=$rows shuffle", run(st.join(m, Seq("w"))))
      m.unpersist()
    }
    spark.stop()
  }
}
