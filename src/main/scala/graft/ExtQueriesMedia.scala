package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOf, CorpusClean, DataDiff, Dedup, Events, GraphOps, Multimodal, RangeJoin, Similarity, TextAnalysis, TrainPrep}


/** Multimodal tier: binary payload decode/feature keys over the BMP/WAV codec seams (split from ExtQueries, round 7 — no behavior change).
  * Shared corpus/SQL helpers live in [[ExtHelpers]]; every key keeps its
  * DuckDB oracle twin next to it in this file's `oracles` map.
  */
object ExtQueriesMedia extends ExtHelpers {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(


    "multimodal_features" -> ((s, dir) =>
      Multimodal.featuresFromDocuments(t(s, dir, "documents"))(s).orderBy("doc_id")),


    // REAL format decode at the batching seam: spec-compliant RIFF/WAVE
    // PCM payloads are assembled per doc and pushed through a genuine
    // chunk-walking WAV parser inside the batched mapPartitions stage.
    // The oracle recomputes every decoded statistic from the seeded
    // sample formula — a wrong header field or byte order anywhere in
    // the codec would shift peak/sum-of-squares and fail the hash.
    "multimodal_wav_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeWavBatch(
          Multimodal.wavFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),


    // 16-bin luminance histogram over REAL decoded pixels (exposure /
    // contrast screen of a vision-curation pass)
    "multimodal_bmp_histogram" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.bmpLumaHistogram(
          Multimodal.bmpFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id", "bin")
    }),


    // frame-level audio energy from REAL decoded PCM: per-doc total,
    // peak frame and its index (the loudest-segment curation shape)
    "multimodal_wav_frame_energy" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.wavFrameEnergy(
          Multimodal.wavFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),


    // REAL image decode at the batching seam: genuine 24-bit BI_RGB BMP
    // files assembled per doc (bottom-up rows, 4-byte row padding) and
    // parsed back by a real header-walking decoder. The positional
    // checksum weights every pixel by its logical index and channel, so
    // a forgotten bottom-up flip, a mis-stepped row pad, or a B/R swap
    // diverges the hash even when plain channel sums would not.
    "multimodal_bmp_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeBmpBatch(
          Multimodal.bmpFromDocuments(t(s, dir, "documents")))
        .toDF()
        .orderBy("doc_id")
    }),


    // REAL resize: decode → nearest-neighbor ×1/2 downsample → re-encode
    // → decode; the oracle recomputes the thumbnail's stats from the
    // source pixel formula at the sampled positions, so a wrong sampling
    // kernel, row order, or re-encode padding diverges the hash
    "multimodal_bmp_resize" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.resizeBmpBatch(
          Multimodal.bmpFromDocuments(t(s, dir, "documents")), factor = 2)
        .toDF()
        .orderBy("doc_id")
    }),


    // the 1-record -> N-frames flatMap expansion (video frame sampling /
    // audio chunking shape); output projects each frame to (len, md5) so
    // payload bytes never reach the result
    "multimodal_frame_sample" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.sampleFrames(
          Multimodal.fromDocuments(t(s, dir, "documents")), n = 4)
        .toDF()
        .select(col("doc_id"), col("frame_index"),
          length(col("frame_payload")).cast("long").as("n_bytes"),
          md5(col("frame_payload")).as("frame_md5"))
        .orderBy("doc_id", "frame_index")
    }),


    // per-source multimodal payload budget: the partition-planning
    // numbers (total/max/median bytes, 128 MiB split count) a payload-
    // aware reader needs BEFORE scheduling decode work — computed from
    // metadata-width columns only, the binary payload itself never
    // shuffles (same pruning contract as multimodal_features).
    "multimodal_payload_budget" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      val hist = d.groupBy(col("source"), col("n_bytes")).agg(count(lit(1)).as("c"))
      val byBytes = Window.partitionBy(col("source")).orderBy(col("n_bytes"))
      val all = Window.partitionBy(col("source"))
      hist
        .withColumn("cum", sum(col("c")).over(byBytes))
        .withColumn("n", sum(col("c")).over(all))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_items"),
          sum(col("n_bytes") * col("c")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("n_bytes")))
            .as("median_bytes"))
        .withColumn("n_splits_128mb",
          expr("(total_bytes + 134217727) div 134217728"))
        .orderBy("source")
    }),
  )

  val oracles: Map[String, String] = Map(


    "multimodal_features" ->
      """SELECT doc_id, 'text/plain' AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS content_md5,
         CAST(length(text) % 640 AS INT) AS decoded_w,
         CAST(length(text) % 480 AS INT) AS decoded_h
         FROM documents ORDER BY doc_id""",


    "multimodal_wav_decode" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
                           256 + (doc_id % 512) AS n
                    FROM documents),
         s AS (SELECT d.doc_id, d.sample_rate, d.n,
                      ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS v
               FROM d, range(768) t(i) WHERE t.i < d.n)
         SELECT doc_id, sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST((n * 1000) // sample_rate AS BIGINT) AS duration_ms,
                CAST(max(abs(v)) AS INT) AS peak_abs,
                CAST(sum(v * v) AS BIGINT) AS sum_sq
         FROM s GROUP BY doc_id, sample_rate, n
         ORDER BY doc_id""",


    "multimodal_bmp_histogram" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8 + doc_id % 9 AS INT) AS w,
                           CAST(4 + doc_id % 5 AS INT) AS h
                    FROM documents),
         px AS (SELECT d.doc_id,
                       (d.doc_id * 2654435761 + t.i * 97) % 256 AS b,
                       (d.doc_id * 2654435761 + t.i * 97 + 31) % 256 AS g,
                       (d.doc_id * 2654435761 + t.i * 97 + 62) % 256 AS r
                FROM d, range(128) t(i) WHERE t.i < d.w * d.h),
         lb AS (SELECT doc_id,
                       CAST(least((2126 * r + 7152 * g + 722 * b) * 16 // 2550000, 15) AS INT) AS bin
                FROM px)
         SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_pixels
         FROM lb GROUP BY doc_id, bin ORDER BY doc_id, bin""",


    "multimodal_wav_frame_energy" ->
      """WITH d AS (SELECT doc_id, 256 + (doc_id % 512) AS n FROM documents),
         s AS (SELECT d.doc_id, t.i // 256 AS f,
                      ((d.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS v
               FROM d, range(768) t(i) WHERE t.i < d.n),
         fe AS (SELECT doc_id, f, CAST(sum(v * v) AS BIGINT) AS e
                FROM s GROUP BY 1, 2),
         pk AS (SELECT doc_id, f FROM (
                  SELECT doc_id, f,
                         row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, f) AS rn
                  FROM fe) WHERE rn = 1)
         SELECT fe.doc_id,
                CAST(count(*) AS INT) AS n_frames,
                CAST(sum(fe.e) AS BIGINT) AS total_energy,
                CAST(max(fe.e) AS BIGINT) AS peak_frame_energy,
                CAST(min(pk.f) AS INT) AS peak_frame_index
         FROM fe JOIN pk USING (doc_id)
         GROUP BY fe.doc_id ORDER BY fe.doc_id""",


    "multimodal_bmp_decode" ->
      """WITH d AS (SELECT doc_id,
                           CAST(8 + doc_id % 9 AS INT) AS width,
                           CAST(4 + doc_id % 5 AS INT) AS height
                    FROM documents),
         px AS (SELECT d.doc_id, d.width, d.height, t.i,
                       (d.doc_id * 2654435761 + t.i * 97) % 256 AS b,
                       (d.doc_id * 2654435761 + t.i * 97 + 31) % 256 AS g,
                       (d.doc_id * 2654435761 + t.i * 97 + 62) % 256 AS r
                FROM d, range(128) t(i) WHERE t.i < d.width * d.height)
         SELECT doc_id, width, height,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b) AS BIGINT) AS sum_b,
                CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS peak_luma,
                CAST(sum((i + 1) * (r + 256 * g + 65536 * b)) AS BIGINT) AS pos_checksum
         FROM px GROUP BY doc_id, width, height
         ORDER BY doc_id""",


    "multimodal_bmp_resize" ->
      """WITH d AS (SELECT doc_id,
                           8 + doc_id % 9 AS w, 4 + doc_id % 5 AS h,
                           CAST((8 + doc_id % 9 + 1) // 2 AS INT) AS width,
                           CAST((4 + doc_id % 5 + 1) // 2 AS INT) AS height
                    FROM documents),
         px AS (SELECT d.doc_id, d.width, d.height, t.j,
                       ((t.j // d.width) * 2 * d.w + (t.j % d.width) * 2) AS i
                FROM d, range(40) t(j) WHERE t.j < d.width * d.height),
         ch AS (SELECT doc_id, width, height, j,
                       (doc_id * 2654435761 + i * 97) % 256 AS b,
                       (doc_id * 2654435761 + i * 97 + 31) % 256 AS g,
                       (doc_id * 2654435761 + i * 97 + 62) % 256 AS r
                FROM px)
         SELECT doc_id, width, height,
                CAST(sum(r) AS BIGINT) AS sum_r,
                CAST(sum(g) AS BIGINT) AS sum_g,
                CAST(sum(b) AS BIGINT) AS sum_b,
                CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS peak_luma,
                CAST(sum((j + 1) * (r + 256 * g + 65536 * b)) AS BIGINT) AS pos_checksum
         FROM ch GROUP BY doc_id, width, height
         ORDER BY doc_id""",


    "multimodal_frame_sample" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
         f AS (
           SELECT doc_id,
                  unnest([struct_pack(i := i,
                           s := substr(text, CAST((len * i) // 4 AS INT) + 1,
                                 CAST((len * (i + 1)) // 4 AS INT)
                                   - CAST((len * i) // 4 AS INT)))
                          FOR i IN range(0, 4)]) AS fr
           FROM d)
         SELECT doc_id,
                CAST(fr['i'] AS INT) AS frame_index,
                CAST(length(fr['s']) AS BIGINT) AS n_bytes,
                md5(fr['s']) AS frame_md5
         FROM f ORDER BY doc_id, frame_index""",


    "multimodal_payload_budget" ->
      """WITH d AS (
           SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
           FROM documents),
         h AS (SELECT source, n_bytes, count(*) AS c FROM d GROUP BY 1, 2),
         k AS (
           SELECT source, n_bytes, c,
                  sum(c) OVER (PARTITION BY source ORDER BY n_bytes) AS cum,
                  sum(c) OVER (PARTITION BY source) AS n
           FROM h)
         SELECT source, CAST(max(n) AS BIGINT) AS n_items,
                CAST(sum(n_bytes * c) AS BIGINT) AS total_bytes,
                CAST(max(n_bytes) AS BIGINT) AS max_bytes,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN n_bytes END) AS BIGINT)
                  AS median_bytes,
                CAST((sum(n_bytes * c) + 134217727) // 134217728 AS BIGINT)
                  AS n_splits_128mb
         FROM k GROUP BY 1 ORDER BY 1""",
  )
}
