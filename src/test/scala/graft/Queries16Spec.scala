package graft

import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, Similarity}
import graft.streaming.IngestCommit

/** Round-15: the persisted ANN index (write → reload → serve) and the
  * ingest-directory format guard.
  */
class Queries16Spec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")
  private def embeddings = spark.read.parquet(s"$dir/embeddings.parquet")

  private def freshIx(tag: String): String = {
    val p = s"/tmp/graft_test_ann_$tag"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  // ── persisted index ≡ inline chain ───────────────────────────────

  test("AnnIndex: reloaded index answers bit-identically to the inline rotated chain") {
    val e = embeddings
    val ix = freshIx("roundtrip")
    AnnIndex.write(e, ix)
    val persisted = AnnIndex.searchTopK(spark, ix, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("adc_d2"), col("rank"))
      .collect().toSeq
    val inline = Similarity.ivfPqTopKRotated(e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("adc_d2"), col("rank"))
      .collect().toSeq
    assert(persisted.nonEmpty, "persisted search returned nothing")
    assert(persisted == inline,
      "persisted path diverged from the inline chain")
  }

  test("AnnIndex: rerank serve path matches the inline rotated rerank") {
    val e = embeddings
    val ix = freshIx("rerank")
    AnnIndex.write(e, ix)
    val persisted = AnnIndex.searchRerank(spark, ix, e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("exact_d2"), col("rank"))
      .collect().toSeq
    val inline = Similarity.ivfPqRerankRotated(e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "rank")
      .select(col("q_id"), col("n_id"), col("exact_d2"), col("rank"))
      .collect().toSeq
    assert(persisted.nonEmpty && persisted == inline)
  }

  // ── the PRODUCTION claim: serving never re-trains ─────────────────

  test("AnnIndex: the serve plan contains no Gram/eigen/training stage and scans the corpus only as the query side") {
    val e = embeddings
    val ix = freshIx("planaudit")
    AnnIndex.write(e, ix)
    val served = AnnIndex.searchTopK(spark, ix, e.filter(col("vec_id") < 10))
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("gram"),
      "serve plan re-runs the Gram/eigen training aggregate")
    // the only MAIN-TREE embeddings.parquet scan allowed is the query
    // frame itself; index frames come from the model directory. (The
    // plan STRING also shows the query subtree a second time inside a
    // `dynamicpruning` SubqueryAdaptiveBroadcast — that is the
    // partition-pruning filter over the cell_id-partitioned codes,
    // i.e. the desired probed-lists-only read, not a corpus rescan.)
    val leafScans = served.queryExecution.executedPlan.collectLeaves()
      .count(_.toString.contains("embeddings.parquet"))
    assert(leafScans <= 1,
      s"serve plan scans the corpus $leafScans times — the index must answer from its own artifacts")
    assert(plan.contains("dynamicpruning"),
      "probed search lost dynamic partition pruning over the cell_id-partitioned codes")
    assert(plan.contains("graft_test_ann_planaudit"),
      "serve plan does not read the persisted model directory at all")
  }

  test("AnnIndex: codes are partitioned by cell_id on disk (probed search prunes unvisited lists)") {
    val ix = freshIx("layout")
    AnnIndex.write(embeddings, ix)
    val fs = new org.apache.hadoop.fs.Path(ix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$ix/codes"))
      .map(_.getPath.getName).filter(_.startsWith("cell_id="))
    assert(parts.length == 8, s"expected 8 cell_id= partitions, got ${parts.toSeq}")
  }

  // ── contract widening: external queries rotate through the model ──

  test("AnnIndex: a query vector NOT in the corpus is answered (the inline chain's vec_id-subset narrowing is lifted)") {
    val e = embeddings
    val ix = freshIx("external")
    AnnIndex.write(e, ix)
    // an external query: vec 3's embedding under a fresh id — the
    // exact rerank must find vec 3 itself at distance 0, rank 1
    val external = e.filter(col("vec_id") === 3)
      .select(lit(999999L).as("vec_id"), col("embedding"))
    val r = AnnIndex.searchRerank(spark, ix, e, external)
      .orderBy("rank").collect()
    assert(r.nonEmpty, "external query returned no rows")
    assert(r.head.getAs[Long]("n_id") == 3L &&
      r.head.getAs[Long]("exact_d2") == 0L,
      s"identical external vector must rerank its twin to rank 1, got ${r.head}")
    // and the inline chain REJECTS the same call instead of silently
    // returning empty (round-14 advisor finding)
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKRotated(e, external).collect()
    }
    assert(ex.getMessage.contains("not present in the corpus"))
  }

  test("AnnIndex: load refuses a format-version mismatch") {
    val ix = freshIx("version")
    AnnIndex.write(embeddings, ix)
    spark.read.parquet(s"$ix/meta")
      .withColumn("version", lit(AnnIndex.FormatVersion + 1))
      .write.mode("overwrite").parquet(s"$ix/meta2")
    // swap in the bumped meta
    val fs = new org.apache.hadoop.fs.Path(ix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ix/meta"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$ix/meta2"),
      new org.apache.hadoop.fs.Path(s"$ix/meta"))
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.searchTopK(spark, ix, embeddings.filter(col("vec_id") < 2)).collect()
    }
    assert(ex.getMessage.contains("format version"))
  }

  // ── ingest format marker ──────────────────────────────────────────

  test("IngestCommit.assertFormat: first open stamps, matching reopen passes, conflicting reopen throws") {
    val root = freshIx("format_marker")
    IngestCommit.assertFormat(spark, root, "keywidth", "wide128")
    IngestCommit.assertFormat(spark, root, "keywidth", "wide128") // idempotent
    val ex = intercept[IllegalStateException] {
      IngestCommit.assertFormat(spark, root, "keywidth", "narrow64")
    }
    assert(ex.getMessage.contains("keywidth=wide128"))
  }
}
