package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Assoc, Dedup, GraphOps, Multimodal}

/** Round-6 registry: entropy-coded image formats (PNG/JPEG via the
  * in-JDK javax.imageio codecs) at the batched decode seam, and the
  * k-core graph operator promoted to an oracle key. Same contract as
  * [[Queries]]: every key has a DuckDB oracle re-deriving the identical
  * result from the same parquet tables.
  *
  * PNG is lossless, so the library-decoded raster IS the seeded pixel
  * field and every PNG key reuses the BMP tier's oracle derivation
  * verbatim — the pixel contract is format-independent; only the
  * container changed. JPEG is lossy, so its key pins what is exact
  * (decoded dimensions, a bounded-reconstruction verdict) — the
  * within-tolerance pattern the approx-sketch keys use.
  */
object Queries6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  /** Measured JPEG reconstruction error at quality 0.95 over the
    * seeded noise field: mean abs per-channel error 28.2–38.5 levels
    * across 500 docs. Tolerance 60 levels sits above that tail and
    * well below the ~85-level mean a shredded/garbage raster scores
    * (uniform-vs-uniform |Δ| expectation), so the boolean separates a
    * real decode from a broken one.
    */
  private val JpegTolMilli = 60000L

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // entropy-coded decode seam: documents → real PNGs (DEFLATE) →
    // in-JDK library decode → exact stats (lossless: same oracle as BMP)
    "multimodal_png_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeImageBatch(
          Multimodal.pngFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),

    // lossy decode QC: real JPEGs, exact decoded dims + bounded mean
    // reconstruction error (DCT quantization can't hash-match pixels)
    "multimodal_jpeg_decode_qc" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.jpegDecodeQc(
          Multimodal.jpegFromDocuments(t(s, dir, "documents")), JpegTolMilli)
        .toDF()
        .orderBy("doc_id")
    }),

    // the phash dedup pipeline fed from PNG payloads: library decode →
    // dHash → band LSH → Hamming verify; planted one-pixel twins pair
    "multimodal_png_phash_neardup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.phashNearDupDecoded(
          Multimodal.pngWithPerturbedTwins(t(s, dir, "documents")))
        .orderBy("id_a", "id_b")
    }),

    // PNG-fed image dedup end-to-end: phash pairs → star-contraction CC
    "multimodal_png_phash_clusters" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      val pairs = Multimodal.phashNearDupDecoded(
          Multimodal.pngWithPerturbedTwins(docs))
        .select(col("id_a").as("a_id"), col("id_b").as("b_id"))
      val ids = docs.select(col("doc_id"))
        .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id")))
      Dedup.dupClustersStar(ids, pairs).orderBy("doc_id")
    }),

    // k-core community extraction over the co-purchase graph, peeled
    // for a FIXED round budget both engine and oracle share (the spec
    // pins true-fixpoint semantics on hand graphs; 8 rounds reach the
    // fixpoint on this data — asserted by Queries6Spec)
    "graph_k_core" -> ((s, dir) =>
      GraphOps.kCore(Assoc.coOrderEdges(t(s, dir, "lineitem")),
          k = KCoreK, maxRounds = KCoreRounds)
        .orderBy("node")),
  )

  private val KCoreK = 3
  private val KCoreRounds = 8

  /** Unrolled k-core peel: round i recomputes symmetric degrees over
    * the surviving edge set and drops endpoints below k — plain chained
    * CTEs (per-round aggregation is outside recursive-CTE SQL, which is
    * why this oracle is GENERATED for a fixed round count rather than
    * written recursively). Extra rounds after the fixpoint are no-ops,
    * so engine (early-stops on the edge-count fixpoint) and oracle
    * (always runs `rounds` peels) agree whenever the fixpoint is
    * reached within the budget — and agree by construction at the
    * budget even if not.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    // AS MATERIALIZED is load-bearing: each e_i is referenced three
    // times by round i+1, so an inlining planner would expand e_rounds
    // into 3^rounds scans of lineitem
    sb.append(
      """WITH pl AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         e0 AS MATERIALIZED (SELECT a.pk AS ea, b.pk AS eb
                FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
                GROUP BY 1, 2 HAVING count(*) >= 2)""")
    for (i <- 0 until rounds) {
      sb.append(s""",
         s$i AS (SELECT ea AS u FROM e$i UNION ALL SELECT eb FROM e$i),
         k$i AS MATERIALIZED (SELECT u FROM s$i GROUP BY u HAVING count(*) >= $k),
         e${i + 1} AS MATERIALIZED (SELECT ea, eb FROM e$i
                       WHERE ea IN (SELECT u FROM k$i)
                         AND eb IN (SELECT u FROM k$i))""")
    }
    sb.append(s"""
       SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
       FROM (SELECT ea AS u FROM e$rounds UNION ALL SELECT eb FROM e$rounds) s
       GROUP BY u ORDER BY node""")
    sb.toString
  }

  val oracles: Map[String, String] = Map(

    // lossless container swap: the BMP pixel-formula oracle verbatim
    "multimodal_png_decode" -> ExtQueries.oracles("multimodal_bmp_decode"),

    "multimodal_jpeg_decode_qc" ->
      """SELECT doc_id,
                CAST(8 + doc_id % 9 AS INT) AS width,
                CAST(4 + doc_id % 5 AS INT) AS height,
                TRUE AS mean_abs_err_ok,
                TRUE AS nonzero_payload
         FROM documents ORDER BY doc_id""",

    // identical pixels → identical hashes → the BMP phash oracles hold
    "multimodal_png_phash_neardup" -> Queries5.oracles("multimodal_phash_neardup"),
    "multimodal_png_phash_clusters" -> Queries5.oracles("multimodal_phash_clusters"),

    "graph_k_core" -> kCoreOracle(KCoreK, KCoreRounds),
  )
}
