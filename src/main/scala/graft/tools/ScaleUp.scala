package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Materialize an sf×`mult` replica of a testdata directory (default
  * 10× sf0.1 ≈ "sf1.0") so the correctness gate and the bench can run
  * at the next scale step on REAL files — partition counts, scan
  * widths and shuffle volumes all 10×, not an in-memory union.
  *
  * Construction per copy i (the ScalingProbe discipline, applied to
  * every table):
  *   - every entity key shifts by i·10^8 — copies are disjoint
  *     sub-databases, so per-key join fan-outs and group sizes match
  *     the base corpus and the workload grows LINEARLY in rows;
  *   - `documents.text` gets copy-suffixed words so copies share no
  *     shingles (exact clones would inflate LSH buckets quadratically
  *     and measure the skew cap, not the operator);
  *   - `embeddings.embedding` gets a deterministic per-copy,
  *     per-dimension perturbation (direction changes, not just norm —
  *     a pure scale would leave cosine structure identical and create
  *     10⁵ artificial exact-duplicate pairs across copies);
  *   - dimension tables (region, nation) stay as-is.
  *
  * `events.ts` is written back as TIMESTAMP(MICROS) (the round-4
  * generator's layout) so the replica exercises the same read path as
  * the driver's data.
  */
object ScaleUp {
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1.0"
    val mult = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(name: String)(f: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = Tables.load(spark, src, name)
      (0 until mult).map(i => f(base, i)).reduce(_ unionByName _)
    }
    def shifted(df: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Shift)))

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.load(spark, src, "region"),
      "nation" -> Tables.load(spark, src, "nation"),
      "customer" -> copies("customer")(shifted(_, _, "c_custkey")),
      "supplier" -> copies("supplier")(shifted(_, _, "s_suppkey")),
      "part" -> copies("part")(shifted(_, _, "p_partkey")),
      "orders" -> copies("orders")(shifted(_, _, "o_orderkey", "o_custkey")),
      "lineitem" -> copies("lineitem")(
        shifted(_, _, "l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> copies("events") { (d, i) =>
        shifted(d, i, "event_id", "user_id")
          // restore the on-disk TIMESTAMP(MICROS) layout from the
          // engine's nanos-long contract
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      },
      "documents" -> copies("documents") { (d, i) =>
        shifted(d, i, "doc_id")
          .withColumn("text",
            if (i == 0) col("text")
            else regexp_replace(col("text"), "([a-z]+)", "$1" + i.toString))
          .withColumn("n_chars", length(col("text")).cast("long"))
      },
      "embeddings" -> copies("embeddings") { (d, i) =>
        shifted(d, i, "vec_id")
          .withColumn("embedding",
            if (i == 0) col("embedding")
            else transform(col("embedding"), (x, j) =>
              x + (pmod(col("vec_id") * 31 + j.cast("long") * 17, lit(13L)) - lit(6L))
                .cast("float") * lit(0.01f * i)))
      })

    tables.foreach { case (name, df) =>
      df.coalesce(math.max(1, mult / 2))
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> $dst/$name.parquet")
    }
    spark.stop()
  }
}
