package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Measure what whitening actually buys PRODUCT QUANTIZATION — the
  * claim [[graft.ext.Similarity.pcaWhitenProject]]'s scaladoc makes
  * ("PQ codebooks waste bits on high-variance directions"). Three
  * indexes at the SAME code budget (m subspaces × log₂k bits):
  *
  *   raw      — PQ over the raw 64-dim embeddings (the shipped
  *              knn_pq_adc configuration),
  *   rotated  — PQ over the UNwhitened PCA-16 projection (decorrelated,
  *              variance still skewed),
  *   whitened — PQ over the whitened PCA-16 projection (decorrelated +
  *              equalized).
  *
  * recall@5 of [[Similarity.pqSearchAdc]] against exact full-width
  * cosine (driver-side ground truth over the raw floats). Usage:
  * `runMain graft.tools.PqWhitenProbe [sfDir] [m] [k]`.
  */
object PqWhitenProbe {

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

    // exact ground truth: top-5 cosine per query over the raw floats
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
      // pqSearchAdc output: (q_id, rank, n_id, ...) — check columns
      // drop the query's own code (rank-1 self hit) so 5 real
      // candidates remain — the exact side excludes self too
      val got = df.collect()
        .map(r => (r.getLong(r.fieldIndex("q_id")), r.getLong(r.fieldIndex("n_id")),
          r.getInt(r.fieldIndex("rank"))))
        .filter { case (q, n, _) => q != n }
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._3).map(_._2).take(5).toSet).toMap
      val hits = qIds.map(q => (exact(q) & got.getOrElse(q, Set.empty)).size).sum
      hits.toDouble / (qIds.length * 5)
    }

    val rawAdc = Similarity.pqSearchAdc(e, e.filter(col("vec_id") < 16), m, k, 6)

    def asEmb(df: org.apache.spark.sql.DataFrame, cols: Seq[org.apache.spark.sql.Column]) =
      df.select(col("vec_id"), array(cols: _*).as("embedding"))
    val proj = Similarity.pcaProject(e, k = 16, iters = 12)
    val rotated = asEmb(proj, (1 to 16).map(i =>
      (col(s"pc${i}_num").cast("double") / (col("n_rows").cast("double") * 1e9))
        .cast("float")))
    val rotAdc = Similarity.pqSearchAdc(rotated,
      rotated.filter(col("vec_id") < 16), m, k, 6)

    // full-dim rotation (no truncation) — the textbook decorrelate-
    // then-PQ case: same information, axes aligned to the spectrum
    val proj64 = Similarity.pcaProject(e, k = 64, iters = 12)
    val rotated64 = asEmb(proj64, (1 to 64).map(i =>
      (col(s"pc${i}_num").cast("double") / (col("n_rows").cast("double") * 1e9))
        .cast("float")))
    val rot64Adc = Similarity.pqSearchAdc(rotated64,
      rotated64.filter(col("vec_id") < 16), m, k, 6)

    val wht = Similarity.pcaWhitenProject(e, k = 16, iters = 12)
    val whitened = asEmb(wht, (1 to 16).map(i =>
      (col(s"pc${i}_white").cast("double") * 1e-6).cast("float")))
    val whtAdc = Similarity.pqSearchAdc(whitened,
      whitened.filter(col("vec_id") < 16), m, k, 6)

    println(f"""{"probe":"pq_whiten","sf":"$sfDir","m":$m,"k":$k,"recall_raw":${recallOf(rawAdc)}%.4f,"recall_rotated16":${recallOf(rotAdc)}%.4f,"recall_rotated64":${recallOf(rot64Adc)}%.4f,"recall_whitened16":${recallOf(whtAdc)}%.4f}""")
    spark.stop()
  }
}
