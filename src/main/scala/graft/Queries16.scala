package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{AnnIndex, TextAnalysis, Unigram}

/** Round-15 registry keys (historical file-number convention:
  * `QueriesN` carries the keys landed in round N−1) — the round-14
  * verdict's production-gap list, headlined by the PERSISTED ANN
  * index:
  *
  * 1. `knn_ivfpq_persisted` — [[graft.ext.AnnIndex]]: build the
  *    rotated IVF-PQ index ONCE into a parquet model directory
  *    (rotation basis + coarse centroids + residual codebook +
  *    cell-partitioned codes), reload it, and answer the query batch
  *    through the reloaded frames. The oracle is `knn_ivfpq_rotated`'s
  *    VERBATIM — the persisted path must be bit-identical to the
  *    inline chain, which is exactly the write→reload round-trip
  *    claim.
  * 2. `knn_ivfpq_rerank_persisted` — the full production serve path
  *    against the persisted index: reloaded-index ADC shortlist +
  *    exact RAW-space rerank (one corpus scan, shortlist broadcast).
  *    Shares `knn_ivfpq_rerank_rotated`'s oracle verbatim, same
  *    argument.
  */
object Queries16 extends ExtHelpers {

  /** Scratch location for a registry key's index build: one directory
    * per (process, source dir) — the pid discriminator keeps two
    * concurrent bench/gate PROCESSES over the same source dir from
    * clobbering each other's index mid-build/mid-read (round-15
    * advisor); within a process the path is deterministic and
    * overwritten per invocation — the key deliberately measures
    * build + reload + serve, the honest cost of the round-trip. No
    * cleanup by design: gate scratch under /tmp, bounded by the
    * model-artifact size, reclaimed at reboot.
    */
  private def ixDir(dir: String, tag: String): String =
    s"/tmp/graft_ann_index/${tag}_p${ProcessHandle.current().pid()}_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "knn_ivfpq_persisted" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val ix = ixDir(dir, "topk")
      AnnIndex.write(e, ix)
      AnnIndex.searchTopK(s, ix, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    "knn_ivfpq_rerank_persisted" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val ix = ixDir(dir, "rerank")
      AnnIndex.write(e, ix)
      AnnIndex.searchRerank(s, ix, e, e.filter(col("vec_id") < 10))
        .orderBy("q_id", "rank")
    }),

    // the 100 TB trainer shape: merges learned on a deterministic
    // hash-sample (portableHash(seed|doc_id) % 100 < 50 over the
    // pinned 500-doc slice), everything else unchanged — the oracle
    // re-derives the identical sample via the md5-fold twin and the
    // identical 12 batched passes
    "bpe_train_merges_sampled" -> ((s, dir) =>
      TextAnalysis.bpeTrainMergesSampled(
          t(s, dir, "documents").filter(col("doc_id") < 500))
        .orderBy("merge_idx")),

    // open-world encode: model trained on docs < 250, corpus docs
    // < 500 encoded under it — unseen chunks replay the merge table
    // from their character split (chars are base symbols: total
    // coverage), and the audit gains the OOV columns it was missing
    "bpe_encode_fallback" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 500)
      TextAnalysis.bpeEncodeFallback(d.filter(col("doc_id") < 250), d)
        .orderBy("lang")
    }),

    // the SentencePiece-alternative tokenizer: seed substring vocab,
    // 2 Viterbi-EM rounds with pruning, pinned log-grid scores — the
    // oracle unrolls the identical DP relationally
    "unigram_train" -> ((s, dir) =>
      Unigram.unigramTrain(t(s, dir, "documents").filter(col("doc_id") < 500))
        .orderBy("piece")),

    "unigram_encode" -> ((s, dir) =>
      Unigram.unigramEncode(t(s, dir, "documents").filter(col("doc_id") < 500))
        .orderBy("lang")),
  )

  /** SQL twin of [[graft.ext.TrainPrep.portableHash]] over
    * `seed|doc_id`, as a boolean sample predicate.
    */
  private[graft] def sampledPredSql(seed: String, pct: Int): String =
    s"""list_reduce([CAST(ascii(ch) AS BIGINT) FOR ch IN
          regexp_extract_all(md5('$seed|' || CAST(doc_id AS VARCHAR)), '.')],
        (a, b) -> (a * 31 + b) % 1000000007) % 100 < $pct"""

  /** The sampled chunk-grain trainer oracle: Queries15's chunked
    * derivation with the corpus CTE narrowed by the portable-hash
    * sample twin — same 12 batched passes, same chunking.
    */
  private val bpeSampledSql = {
    val (passes, window, kBatch) = (12, 128, 32)
    val passCtes = (1 to passes).map(i =>
      Queries13.bpeBatchPass(i, s"s${i - 1}", window, kBatch))
    val union = (1 to passes).map(i =>
      s"SELECT $i AS pass, sel_rank, ma, mb, c FROM b$i")
      .mkString("\n           UNION ALL ")
    s"""WITH c0 AS (
         SELECT replace(text, ' ', '▁') AS t
         FROM documents
         WHERE doc_id < 500 AND ${sampledPredSql("bpesample", 50)}),
       w0 AS (
         SELECT w, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest([substr(t, i * 32 + 1, 32)
                 FOR i IN range(0, CAST(ceil(length(t) / 32.0) AS BIGINT))]) AS w
               FROM c0)
         WHERE len(w) > 0 GROUP BY w),
       s0 AS (
         SELECT freq, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
         FROM w0),
       ${passCtes.mkString(",\n       ")}
       SELECT CAST(row_number() OVER (ORDER BY pass, sel_rank) AS INT) AS merge_idx,
              pass, ma AS sym_a, mb AS sym_b, ma || mb AS merged,
              c AS pair_count
       FROM ($union)
       ORDER BY merge_idx"""
  }

  /** The open-world encode oracle: train the 12 w-carrying passes on
    * the doc_id < 250 slice (Queries15's fertility machinery), then
    * REPLAY each pass's merge list over the character split of every
    * encode-slice chunk absent from the trained vocab — one fold CTE
    * per pass, the trainer's own greedy CASE fold — and aggregate the
    * combined model at language grain with the OOV columns.
    */
  private[graft] val bpeEncodeFallbackSql = {
    val (passes, window, kBatch) = (12, 128, 32)
    val passCtes = (1 to passes).map(i =>
      Queries15.bpeBatchPassW(i, s"s${i - 1}", window, kBatch))
    val replayCtes = (1 to passes).map(i =>
      s"""f$i AS MATERIALIZED (
         SELECT t.w,
                list_reduce(string_split(t.s, ' '), (acc, x) ->
                  CASE WHEN len([m FOR m IN ms IF m['mb'] = x AND
                         (acc = m['ma'] OR ends_with(acc, ' ' || m['ma']))]) > 0
                       THEN acc || x ELSE acc || ' ' || x END) AS s
         FROM f${i - 1} t CROSS JOIN m$i)""")
    s"""WITH tr0 AS (
         SELECT replace(text, ' ', '▁') AS t
         FROM documents WHERE doc_id < 250),
       w0 AS (
         SELECT w, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest([substr(t, i * 32 + 1, 32)
                 FOR i IN range(0, CAST(ceil(length(t) / 32.0) AS BIGINT))]) AS w
               FROM tr0)
         WHERE len(w) > 0 GROUP BY w),
       s0 AS (
         SELECT w, freq,
                array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
         FROM w0),
       ${passCtes.mkString(",\n       ")},
       enc AS (
         SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tok,
                CAST(length(w) AS BIGINT) AS n_chr,
                CAST(0 AS BIGINT) AS is_oov
         FROM s$passes),
       dch AS (
         SELECT lang, w FROM (
           SELECT lang, unnest([substr(t, i * 32 + 1, 32)
                   FOR i IN range(0, CAST(ceil(length(t) / 32.0) AS BIGINT))]) AS w
           FROM (SELECT lang, replace(text, ' ', '▁') AS t
                 FROM documents WHERE doc_id < 500))
         WHERE len(w) > 0),
       f0 AS (
         SELECT w, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
         FROM (SELECT DISTINCT w FROM dch
               WHERE w NOT IN (SELECT w FROM s$passes))),
       ${replayCtes.mkString(",\n       ")},
       oenc AS (
         SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tok,
                CAST(length(w) AS BIGINT) AS n_chr,
                CAST(1 AS BIGINT) AS is_oov
         FROM f$passes),
       model AS (SELECT * FROM enc UNION ALL SELECT * FROM oenc)
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens,
              CAST(sum(n_chr) AS BIGINT) AS n_chars,
              CAST(sum(is_oov) AS BIGINT) AS n_oov_chunks,
              CAST(sum(is_oov * n_tok) AS BIGINT) AS n_oov_tokens,
              CAST(sum(is_oov) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS oov_chunk_ppm,
              CAST(sum(n_tok) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS fertility_ppm,
              CAST(sum(n_tok) * 1000000
                // greatest(sum(n_chr), 1) AS BIGINT) AS compression_ppm
       FROM dch JOIN model USING (w)
       GROUP BY lang ORDER BY lang"""
  }

  // ── unigram-LM oracle machinery ───────────────────────────────────
  //
  // The engine's Viterbi DP is a codegen'd fold; DuckDB 1.0 has no
  // fold-with-initializer, so the oracle unrolls the SAME pinned
  // procedure relationally: per position i, the best state is the
  // row_number()-1 row over the union of the ≤maxPieceLen candidate
  // extensions, ordered (score DESC, pieces ASC, start ASC) — the
  // exact total order the engine's struct-max encodes. Chunk width 12
  // bounds the unroll; backtrack is the same ≤12-step pointer walk.

  private val UG_CHUNK = 12
  private val UG_PLEN = 4
  private val UG_TOP = 48
  private val UG_ROUNDS = 2

  /** One Viterbi block over the chunk table `chTab` under model
    * `mPrev`: emits ps$tag (in-vocab substring scores), b${tag}_0..12
    * (best state per position), bb$tag (their union). With
    * `fallback`, ps$tag also carries one row per UNSEEN single
    * character at the pinned fallback score (min model score − 1e6);
    * no model piece can end at an unseen character's position
    * (singles are never pruned), so the row competes with nothing —
    * it IS the DP's only candidate there, exactly the native
    * expression's rule.
    */
  private[graft] def ugDpCtes(
      tag: String, mPrev: String, chTab: String = "ch",
      fallback: Boolean = false): String = {
    val fbRows = if (!fallback) "" else
      s"""
         UNION ALL
         SELECT $chTab.w, CAST(jj.j AS INT) AS j, CAST(jj.j + 1 AS INT) AS i,
                (SELECT min(s) FROM $mPrev) - 1000000 AS s
         FROM $chTab CROSS JOIN range(0, $UG_CHUNK) jj(j)
         WHERE jj.j + 1 <= length($chTab.w)
           AND substr($chTab.w, CAST(jj.j AS INT) + 1, 1) NOT IN
               (SELECT piece FROM $mPrev WHERE length(piece) = 1)"""
    val ps =
      s"""ps$tag AS MATERIALIZED (
         SELECT $chTab.w, CAST(jj.j AS INT) AS j, CAST(jj.j + ll.l AS INT) AS i, m.s
         FROM $chTab CROSS JOIN range(0, $UG_CHUNK) jj(j)
                 CROSS JOIN range(1, ${UG_PLEN + 1}) ll(l)
         JOIN $mPrev m
           ON m.piece = substr($chTab.w, CAST(jj.j AS INT) + 1, CAST(ll.l AS INT))
         WHERE jj.j + ll.l <= length($chTab.w)$fbRows)"""
    val b0 =
      s"""b${tag}_0 AS (SELECT w, CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS np,
           CAST(0 AS INT) AS pj FROM $chTab)"""
    val bs = (1 to UG_CHUNK).map { i =>
      val cands = (math.max(0, i - UG_PLEN) until i).map { j =>
        s"""SELECT b.w, b.s + p.s AS s, b.np + 1 AS np, CAST($j AS INT) AS pj
           FROM b${tag}_$j b JOIN ps$tag p ON p.w = b.w AND p.j = $j AND p.i = $i"""
      }.mkString("\n           UNION ALL ")
      s"""b${tag}_$i AS MATERIALIZED (
         SELECT w, s, np, pj FROM (
           SELECT w, s, np, pj,
                  row_number() OVER (PARTITION BY w
                    ORDER BY s DESC, np ASC, pj ASC) AS rn
           FROM ($cands)) WHERE rn = 1)"""
    }
    val bb = s"""bb$tag AS MATERIALIZED (${(0 to UG_CHUNK).map(i =>
      s"SELECT w, $i AS i, s, np, pj FROM b${tag}_$i").mkString("\n         UNION ALL ")})"""
    (Seq(ps, b0) ++ bs :+ bb).mkString(",\n       ")
  }

  /** Best-path pieces backtrack over a DP block: the ≤UG_CHUNK-step
    * pointer walk from each chunk's final position, emitting
    * pieces$tag (w, piece) with multiplicity. Shared by the EM rounds
    * and the open-world encode oracle (which needs per-chunk OOV
    * piece counts).
    */
  private[graft] def ugBacktrackCtes(tag: String, chTab: String = "ch"): Seq[String] = {
    val p0 = s"p${tag}_0 AS (SELECT w, CAST(length(w) AS INT) AS pos FROM $chTab)"
    val pk = (1 to UG_CHUNK).map(k =>
      s"""p${tag}_$k AS (SELECT p.w, b.pj AS pos FROM p${tag}_${k - 1} p
         JOIN bb$tag b ON b.w = p.w AND b.i = p.pos WHERE p.pos > 0)""")
    val pieces = s"""pieces$tag AS (${(1 to UG_CHUNK).map(k =>
      s"""SELECT p.w, substr(p.w, b.pj + 1, p.pos - b.pj) AS piece
         FROM p${tag}_${k - 1} p JOIN bb$tag b ON b.w = p.w AND b.i = p.pos
         WHERE p.pos > 0""").mkString("\n         UNION ALL ")})"""
    (Seq(p0) ++ pk :+ pieces)
  }

  /** One EM round: DP under m{r-1}, backtrack the best-path pieces,
    * usage-count them, retain (singles floored at 1; multis at
    * minCount 2), rescore on the pinned log grid → m$r. */
  private def ugRoundCtes(r: Int): String = {
    val tag = s"$r"
    val dp = ugDpCtes(tag, s"m${r - 1}")
    val backtrack = ugBacktrackCtes(tag)
    val tail =
      s"""u$tag AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS u
         FROM pieces$tag JOIN ch USING (w) GROUP BY piece),
       v$tag AS (
         SELECT m.piece,
                CASE WHEN length(m.piece) = 1
                     THEN greatest(coalesce(u.u, 0), 1)
                     ELSE coalesce(u.u, 0) END AS c
         FROM m${r - 1} m LEFT JOIN u$tag u USING (piece)
         WHERE length(m.piece) = 1 OR coalesce(u.u, 0) >= 2),
       m$r AS MATERIALIZED (
         SELECT piece, c,
                CAST(floor((ln(CAST(c AS DOUBLE)) - ln(CAST(t.t AS DOUBLE))) * 1e6)
                  AS BIGINT) AS s
         FROM v$tag CROSS JOIN
              (SELECT CAST(sum(c) AS BIGINT) AS t FROM v$tag) t)"""
    (Seq(dp) ++ backtrack ++ Seq(tail)).mkString(",\n       ")
  }

  /** Shared prefix: chunking, seed counts, seed vocab + scores, then
    * UG_ROUNDS EM rounds ending at model m$UG_ROUNDS. */
  private[graft] def ugTrainCtes(docFilter: String = "doc_id < 500"): String =
    s"""c0 AS (SELECT lang, replace(text, ' ', '▁') AS t
         FROM documents WHERE $docFilter),
       ch AS MATERIALIZED (
         SELECT w, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest([substr(t, i * $UG_CHUNK + 1, $UG_CHUNK)
                 FOR i IN range(0, CAST(ceil(length(t) / $UG_CHUNK.0) AS BIGINT))]) AS w
               FROM c0)
         WHERE len(w) > 0 GROUP BY w),
       sd AS (
         SELECT piece, CAST(sum(freq) AS BIGINT) AS c
         FROM (SELECT ch.freq,
                      substr(ch.w, CAST(jj.j AS INT) + 1, CAST(ll.l AS INT)) AS piece
               FROM ch CROSS JOIN range(0, $UG_CHUNK) jj(j)
                       CROSS JOIN range(1, ${UG_PLEN + 1}) ll(l)
               WHERE jj.j + ll.l <= length(ch.w))
         GROUP BY piece),
       v0 AS (
         SELECT piece, c FROM sd WHERE length(piece) = 1
         UNION ALL
         SELECT piece, c FROM (
           SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
           FROM sd WHERE length(piece) > 1) WHERE rn <= $UG_TOP),
       m0 AS MATERIALIZED (
         SELECT piece, c,
                CAST(floor((ln(CAST(c AS DOUBLE)) - ln(CAST(t.t AS DOUBLE))) * 1e6)
                  AS BIGINT) AS s
         FROM v0 CROSS JOIN (SELECT CAST(sum(c) AS BIGINT) AS t FROM v0) t),
       ${(1 to UG_ROUNDS).map(ugRoundCtes).mkString(",\n       ")}"""

  private val unigramTrainSql =
    s"""WITH ${ugTrainCtes()}
       SELECT piece, CAST(length(piece) AS BIGINT) AS n_chars,
              c AS count, s AS score
       FROM m$UG_ROUNDS ORDER BY piece"""

  private[graft] val unigramEncodeSql = {
    val dp = ugDpCtes("e", s"m$UG_ROUNDS")
    s"""WITH ${ugTrainCtes()},
       $dp,
       encb AS (
         SELECT b.w, b.np AS n_tok, b.s AS lp_micro
         FROM bbe b JOIN (SELECT w, CAST(length(w) AS INT) AS n FROM ch) q
           ON q.w = b.w AND b.i = q.n),
       dch AS (
         SELECT lang, w FROM (
           SELECT lang, unnest([substr(t, i * $UG_CHUNK + 1, $UG_CHUNK)
                   FOR i IN range(0, CAST(ceil(length(t) / $UG_CHUNK.0) AS BIGINT))]) AS w
           FROM c0)
         WHERE len(w) > 0)
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens,
              CAST(sum(length(w)) AS BIGINT) AS n_chars,
              CAST(sum(lp_micro) AS BIGINT) AS lp_micro_total,
              CAST(sum(n_tok) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS fertility_ppm,
              CAST(sum(n_tok) * 1000000
                // greatest(sum(length(w)), 1) AS BIGINT) AS compression_ppm
       FROM dch JOIN encb USING (w)
       GROUP BY lang ORDER BY lang"""
  }

  val oracles: Map[String, String] = Map(
    // bit-identity with the inline rotated chain IS the persistence
    // claim: same oracle text, zero re-derivation drift possible
    "knn_ivfpq_persisted" -> Queries15.ivfPqRotatedSql,
    "knn_ivfpq_rerank_persisted" -> Queries15.ivfPqRerankRotatedSql,

    "bpe_train_merges_sampled" -> bpeSampledSql,

    "bpe_encode_fallback" -> bpeEncodeFallbackSql,

    "unigram_train" -> unigramTrainSql,

    "unigram_encode" -> unigramEncodeSql,
  )
}
