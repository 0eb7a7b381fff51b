package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Which full-dimension rotation preserves PqWhitenProbe's +13%
  * rel recall at equal PQ bits, at what oracle cost? The 64-component
  * 12-iteration eigen chain is the measured winner but its SQL
  * re-derivation exceeds DuckDB's ~1000-node CTE dependency-path cap,
  * so the shippable operator needs either fewer power rounds or a
  * structurally cheaper rotation. Arms (m=8, k=8, recall@5 vs exact
  * full-width cosine): raw axes; PCA-64 at iters 12/8/4/2; the
  * deterministic ±1 sign rotation (the randomProjectionRecall matrix
  * at outDims = 64). Usage:
  * `runMain graft.tools.PqRotProbe [sfDir] [m] [k]`.
  */
object PqRotProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val m = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))

    val vecs = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val qIds = vecs.map(_._1).filter(_ < 16).sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) -2.0 else d / math.sqrt(na * nb)
    }
    val byId = vecs.toMap
    val exact: Map[Long, Set[Long]] = qIds.map { q =>
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => (cos(byId(q), v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSet
    }.toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getLong(r.fieldIndex("q_id")), r.getLong(r.fieldIndex("n_id")),
          r.getInt(r.fieldIndex("rank"))))
        .filter { case (q, n, _) => q != n }
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._3).map(_._2).take(5).toSet).toMap
      val hits = qIds.map(q => (exact(q) & got.getOrElse(q, Set.empty)).size).sum
      hits.toDouble / (qIds.length * 5)
    }

    val queries = e.filter(col("vec_id") < 16)
    val raw = recallOf(Similarity.pqSearchAdc(e, queries, m, k, 6))
    val arms = Seq(12, 8, 4, 2).map { it =>
      it -> recallOf(Similarity.pqSearchAdcRotated(e, queries, m, k, 6, iters = it))
    }
    // deterministic ±1 sign rotation at full width, integer-exact
    val d = 64
    val signRotated = e
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${d - 1}), j ->
              aggregate(zip_with(transform(embedding, x -> cast(round(cast(x as double) * 1e6) as bigint)),
                  sequence(0, size(embedding) - 1), (x, i) ->
                  case when (i * 31 + j * 17) % 2 = 0 then x else -x end),
                cast(0 as bigint), (acc, v) -> acc + v))""").as("q"))
    val rp = recallOf(Similarity.pqSearchAdcQ(signRotated,
      signRotated.filter(col("vec_id") < 16), m, k, 6))

    val armsJson = arms.map { case (it, r) => f""""pca64_iters$it":$r%.4f""" }.mkString(",")
    println(f"""{"probe":"pq_rot","sf":"$sfDir","m":$m,"k":$k,"recall_raw":$raw%.4f,$armsJson,"recall_signrot64":$rp%.4f}""")
    spark.stop()
  }
}
