package graft

import org.apache.spark.sql.functions._

import graft.ext.{Assoc, GraphOps, Multimodal}

/** Round-6 batch: entropy-coded image formats at the decode seam and
  * the keyed k-core. Value invariants on tiny inputs; full equality vs
  * DuckDB is the verify gate's job.
  */
class Queries6Spec extends SparkSpec {

  import spark.implicits._

  test("PNG round-trips the seeded pixel field exactly: stats and dhash equal the BMP rendering") {
    (0L until 40L).foreach { id =>
      val png = Multimodal.encodePng(id)
      val bmp = Multimodal.encodeBmp(id)
      // a real PNG container (magic) that is genuinely compressed differently
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
      assert(Multimodal.decodeImage(id, png) == Multimodal.decodeBmp(id, bmp))
      assert(Multimodal.dhashFromImage(id, png) == Multimodal.dhashFromBytes(id, bmp))
    }
  }

  test("perturbed PNG twin decodes to the perturbBmp pixel field (shared phash oracle holds)") {
    (0L until 20L).foreach { id =>
      val twinPng = Multimodal.encodePng(id, perturb = true)
      val twinBmp = Multimodal.perturbBmp(Multimodal.encodeBmp(id))
      assert(Multimodal.decodeImage(id, twinPng) == Multimodal.decodeBmp(id, twinBmp))
      assert(Multimodal.dhashFromImage(id, twinPng) == Multimodal.dhashFromBytes(id, twinBmp))
    }
  }

  test("JPEG QC: real decodes land inside tolerance; a shredded raster does not") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = spark.range(0, 30).select(col("id").as("doc_id"))
    val qc = Multimodal.jpegDecodeQc(Multimodal.jpegFromDocuments(docs), 60000L).collect()
    assert(qc.length == 30)
    assert(qc.forall(_.mean_abs_err_ok), "real JPEG decodes must sit inside the 60-level tolerance")
    assert(qc.forall(r => r.width == 8 + (r.doc_id % 9) && r.height == 4 + (r.doc_id % 5)))
    // a JPEG of the WRONG doc's pixels reads as garbage vs the seeded
    // field — the tolerance must reject it (this is what 'bounded
    // reconstruction' buys over a bare does-it-decode check)
    val shred = Multimodal.jpegFromDocuments(docs)
      .map(r => Multimodal.BmpRecord(r.doc_id + 1000L, r.payload))
    val bad = Multimodal.jpegDecodeQc(shred, 60000L).collect()
    assert(bad.count(!_.mean_abs_err_ok) > 20, "mismatched pixels must breach tolerance")
  }

  test("broadcast audit: recall-QC comparison joins broadcast their |Q|*k derived-tiny sides") {
    Seq("knn_rp_recall", "knn_truncated_recall").foreach { key =>
      val p = SparkEntry.queries(key)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("SortMergeJoin"),
        s"$key: the |Q|*k top-k comparison frames must broadcast:\n" + p.take(1200))
    }
  }

  test("SMJ allowlist: no registry key grows a SortMergeJoin outside the audited corpus-scale set") {
    // Round-6 sweep verdict (SmjSweep/SmjSweep2): these keys' SMJs join
    // structurally corpus-scale sides — CC label joins, blocked
    // quadratic verifiers, full-outer diffs, per-customer/edge frames —
    // where SMJ is the RIGHT plan at 100 TB. Any key appearing here
    // that isn't in the allowlist is a fresh derived-tiny broadcast
    // miss (the IVF-PQ incident class) and must be triaged, not added
    // blindly.
    val allow = Set(
      "corpus_clean_pipeline", "customer_decile_transitions", "data_row_diff",
      "dedup_cluster_representatives", "dedup_clusters", "dedup_embedding_cosine",
      // graph_lpa_communities (round 9): each LPA round joins the
      // |E|-row symmetric edge list with the |V|-row label frame on
      // dst, and the size attach joins two |V|-scale frames — both
      // sides grow with the graph, SMJ is the right 100 TB plan
      "embedding_knn_dist_outliers", "graph_lpa_communities",
      "graph_neighbor_jaccard", "knn_classify_majority",
      // knn_graph_build_auto (round 11): at spec/sf scale the measured
      // gate selects the exact branch, whose plan IS knn_graph_blocked's
      // audited blocked tile join; the descent branch's n·k edge
      // self-joins are corpus-scale by construction — SMJ is right in
      // both branches
      "knn_graph_blocked", "knn_graph_build_auto",
      // knn_graph_clusters_auto (round 11): the policy-routed graph
      // (audited above) plus star-contraction CC, whose edge-frame
      // self-joins are corpus-scale by construction — same class as
      // dedup_clusters
      "knn_graph_clusters_auto",
      "merge_upsert", "multimodal_phash_clusters",
      "multimodal_phash_representatives", "multimodal_png_phash_clusters",
      // multimodal_gif_phash_clusters (round 13): byte-for-byte the
      // png clusters composition over a different lossless codec —
      // the same audited CC label joins (corpus-scale by construction)
      "multimodal_gif_phash_clusters",
      "near_dup_rate_by_slice", "semdedup_prune", "tpch_q8_market_share",
      // round-9 triage: the FULL OUTER join of the two top-k lists
      // (two-level vs flat agreement) — BroadcastHashJoin does not
      // support full outer, and both sides are |Q|·k rows (never
      // corpus-scale), so the SMJ is structurally forced AND free
      "knn_ivf_two_level")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, "/root/testdata/sf0.001").queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      if (p.contains("SortMergeJoin") && !allow(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"new SortMergeJoin keys outside the audited allowlist: $offenders")
  }

  test("keyed k-core reaches its fixpoint within the shared 8-round budget on the co-purchase graph") {
    val edges = Assoc.coOrderEdges(
      graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem"))
      .persist()
    try {
      val at8 = GraphOps.kCore(edges, k = 3, maxRounds = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val at20 = GraphOps.kCore(edges, k = 3, maxRounds = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(at8 == at20, "8 peel rounds must already be the fixpoint (oracle budget)")
      assert(at8.nonEmpty, "the 3-core must be non-trivial on this data")
    } finally { edges.unpersist(); () }
  }
}
