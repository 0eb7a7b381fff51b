package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Scale, Similarity}
import graft.ext.TextPrimitives.{qcosinePre, qnorm, quantized}

/** Measurement probe for the round-9 two-level coarse assignment: on a
  * given corpus, time (and count distance evals for) the FLAT
  * assignment (every vector × every centroid) vs the TWO-LEVEL
  * assignment (vector × supers, then only the chosen super's child
  * cells) at the adaptive sizes (cells = √n, supers = ∜n), and report
  * the cell-assignment agreement between the two. Run on organic1.0
  * (weak-structure, ~8k vectors) for the BASELINE §Round 9 numbers.
  *
  * args: dir [cells] [supers]
  */
object TwoLevelCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("two-level-cost-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // `synth:N[:D]` — a deterministic hash-float corpus of N vectors,
    // for placing the wall-clock crossover beyond what the parquet
    // corpora reach (the eval-count model needs n ≥ ~10^5 before the
    // two-level plan's two extra tiny joins amortize)
    val e =
      if (dir.startsWith("synth:")) {
        val parts = dir.stripPrefix("synth:").split(":")
        val n = parts(0).toLong
        val d = if (parts.length > 1) parts(1).toInt else 64
        spark.range(n).select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${d - 1}), " +
            "i -> cast(cast(hash(id, i) % 1000 as double) / 1000.0 as float))")
            .as("embedding"))
      } else graft.sources.Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val cells = if (args.length > 1) args(1).toInt else Similarity.adaptiveCells(n)
    val supers = if (args.length > 2) args(2).toInt else Similarity.adaptiveSupers(n)
    println(s"n=$n cells=$cells supers=$supers " +
      s"evals_flat=${n * cells} evals_two_level~=${n * (supers + cells / math.max(supers, 1))}")

    val cent = e.filter(col("vec_id") < cells)
      .select(col("vec_id").cast("int").as("cell_id"),
        quantized(col("embedding")).as("c_q"))
      .withColumn("c_nrm", qnorm(col("c_q")))
    val sup = cent.filter(col("cell_id") < supers)
      .select(col("cell_id").as("sup_id"), col("c_q").as("s_q"),
        col("c_nrm").as("s_nrm"))
    val c = Scale.widen(e)
      .select(col("vec_id").as("n_id"), quantized(col("embedding")).as("n_q"))
      .withColumn("n_nrm", qnorm(col("n_q")))

    def flatAssign(): DataFrame =
      c.join(broadcast(cent))
        .groupBy(col("n_id"))
        .agg(max_by(col("cell_id"),
          struct(qcosinePre(col("n_q"), col("c_q"), col("n_nrm"), col("c_nrm")),
            -col("cell_id"))).as("cell_id"))
    def twoLevelAssign(): DataFrame = {
      val centSup = cent.join(broadcast(sup))
        .groupBy(col("cell_id"))
        .agg(max_by(col("sup_id"),
          struct(qcosinePre(col("c_q"), col("s_q"), col("c_nrm"), col("s_nrm")),
            -col("sup_id"))).as("sup_id"))
      val centWithSup = cent.join(broadcast(centSup), Seq("cell_id"))
      c.join(broadcast(sup))
        .groupBy(col("n_id"))
        .agg(max_by(col("sup_id"),
          struct(qcosinePre(col("n_q"), col("s_q"), col("n_nrm"), col("s_nrm")),
            -col("sup_id"))).as("sup_id"),
          first(col("n_q")).as("n_q"), first(col("n_nrm")).as("n_nrm"))
        .join(broadcast(centWithSup), Seq("sup_id"))
        .groupBy(col("n_id"))
        .agg(max_by(col("cell_id"),
          struct(qcosinePre(col("n_q"), col("c_q"), col("n_nrm"), col("c_nrm")),
            -col("cell_id"))).as("cell_id"))
    }

    def time(label: String, mk: () => DataFrame): DataFrame = {
      // warm pass then min-of-2 timed passes (host-weather discipline)
      mk().write.format("noop").mode("overwrite").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${ts.min}%.3f s (passes: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      mk()
    }
    val f = time("flat_assign", () => flatAssign())
    val t = time("two_level_assign", () => twoLevelAssign())
    val joined = f.withColumnRenamed("cell_id", "flat_cell")
      .join(t.withColumnRenamed("cell_id", "two_cell"), Seq("n_id"))
    val agree = joined.filter(col("flat_cell") === col("two_cell")).count()
    println(f"assignment agreement: $agree/${n} (${agree * 100.0 / n}%.2f%%)")
    spark.stop()
  }
}
