package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Adversarial Zipf-head probe for the DE-SKEWED span excision
  * (round-14's fix: first-occurrence selection as groupBy +
  * min-struct + join-back instead of a window over the global span
  * key): the 200-doc spec proves the PLAN SHAPE; this probe proves
  * the CLAIM at measured scale — one 5-gram injected into >10% of an
  * organic ×10 corpus (the "same boilerplate header in every crawl
  * page" case), excision run with AQE skew-join ON vs OFF vs AQE
  * fully off, wall times printed for SCALING.md / BASELINE.
  *
  * What to expect if the de-skew argument is right: the hot key is
  * absorbed by map-side partial aggregation BEFORE the shuffle (the
  * groupBy side) and the join-back probe is AQE-splittable, so the
  * skew-join toggle should move the needle only modestly — the plan
  * no longer has a structurally unsplittable stage. A window-form
  * regression would show as a catastrophic OFF-vs-ON gap (one task
  * owns the hot partition either way).
  */
object SpanSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/organic1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val hotMod = sys.env.getOrElse("SPARK_GRAFT_HOT_MOD", "8").toInt // 1/8 = 12.5% of docs
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-span-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // inject the SAME 5-token span at the head of every hotMod-th doc
    val corpus = base.withColumn("text",
      when(col("doc_id") % hotMod === 0,
        concat(lit("zqhot zqspan zqalpha zqbeta zqgamma "), col("text")))
        .otherwise(col("text")))
    val nDocs = corpus.count()
    val nHot = corpus.filter(col("doc_id") % hotMod === 0).count()
    System.err.println(s"[probe] corpus $nDocs docs, hot span in $nHot (${100 * nHot / nDocs}%)")

    def timed(tag: String, conf: Map[String, String]): Unit = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // warm once at tiny scale so codegen isn't billed to the first arm
      val t0 = System.nanoTime()
      Dedup.spanExcise(corpus, w = 5)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"""{"arm":"$tag","sec":$dt%.3f,"docs":$nDocs,"hot_docs":$nHot}""")
    }

    // JIT/IO warmup outside the arms
    Dedup.spanExcise(corpus.limit(2000), w = 5)
      .write.format("noop").mode("overwrite").save()

    for (pass <- 1 to 2) {
      timed(s"aqe_skewjoin_on_p$pass", Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true"))
      timed(s"aqe_skewjoin_off_p$pass", Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "false"))
      timed(s"aqe_off_p$pass", Map(
        "spark.sql.adaptive.enabled" -> "false"))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()
  }
}
