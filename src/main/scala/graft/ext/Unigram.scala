package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, SentencePiece's other algorithm) —
  * the alternative to BPE the round-14 verdict listed as the missing
  * tokenizer step: a piece VOCABULARY with log-probability scores,
  * trained by EM (Viterbi E-step, count M-step with pruning), encoding
  * each chunk by its max-score segmentation rather than by replaying
  * merge rules.
  *
  * Everything is pinned so a plain-SQL engine re-derives identical
  * integers ("exact" = exactly this procedure):
  *
  *  - Unit: `chunkChars`-character chunks of the space-marked ('▁')
  *    text, collapsed to a chunk-frequency table (the
  *    [[TextAnalysis.bpeTrainMergesChunked]] unit at a DP-friendly
  *    width).
  *  - Seed vocab: every substring of length 1..`maxPieceLen` of every
  *    chunk, occurrence-counted with chunk frequency; ALL single
  *    characters are retained (base coverage, never pruned), plus the
  *    top `vocabTop` multi-character pieces by (count DESC, piece ASC).
  *  - Scores: s_p = floor((ln(c_p) − ln(T))·1e6) as BIGINT with
  *    T = Σ c over the retained vocab — the DSIR log-grid convention
  *    (integer counts into double ln, one grouped expression shape on
  *    both engines, floored to the 1e6 grid).
  *  - Viterbi (per chunk, exact DP): best[0] = (score 0, pieces 0);
  *    best[i] = max over j ∈ [max(0, i−maxPieceLen), i−1] with
  *    w[j+1..i] in vocab of (best[j].score + s_piece, best[j].np + 1,
  *    start j), maximizing score, then FEWEST pieces, then SMALLEST j
  *    (longest final piece) — a total deterministic order. Single
  *    chars are always in vocab, so every position is reachable.
  *  - EM round: usage_p = Σ_chunks freq(w) · multiplicity of p on
  *    w's best path; then singles keep max(usage, 1) (smoothing
  *    floor), multis survive iff usage ≥ `minCount`; rescore from the
  *    retained usages. `rounds` rounds.
  *
  * Scale shape: the trainer is the BPE-trainer dataflow — the corpus
  * collapses once to chunk frequencies, each EM round is ONE
  * distributed pass (the DP is a codegen'd fold per DISTINCT chunk
  * with the model as a broadcast literal map; usage is a
  * partial-aggregated explode), and only the vocab-sized usage table
  * reaches the driver. Encode is map-only under the broadcast model.
  * At 100 TB, train on a [[TextAnalysis.bpeTrainMergesSampled]]-style
  * hash-sample and encode everything — same contract as BPE.
  *
  * Closed-world note: encoding assumes every CHARACTER of the input
  * was seen in training (single chars are never pruned, so training
  * coverage is total); an unseen character has no vocab entry and its
  * chunk would get a null path. [[TextAnalysis.bpeEncodeFallback]] is
  * the operator that makes open-world coverage explicit for BPE; the
  * unigram twin would add byte-fallback singles the same way.
  */
object Unigram {

  /** (piece, count, score) rows — the driver-side model state, always
    * vocab-sized.
    */
  private[graft] type Model = Seq[(String, Long, Long)]

  private def chunkFreq(docs: DataFrame, chunkChars: Int): DataFrame =
    docs
      .select(translate(col("text"), " ", "▁").as("t"))
      .select(explode(expr(
        s"""transform(sequence(0, greatest(cast(ceil(length(t) / $chunkChars.0D) as int) - 1, 0)),
              i -> substring(t, i * $chunkChars + 1, $chunkChars))""")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** All substrings of length 1..maxPieceLen, occurrence-counted with
    * chunk frequency.
    */
  private def seedCounts(chunks: DataFrame, maxPieceLen: Int): DataFrame =
    chunks
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1),
              j -> transform(sequence(1, least($maxPieceLen, length(w) - j)),
                l -> substring(w, j + 1, l))))""")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** The pinned log-grid score: floor((ln(c) − ln(T))·1e6). */
  private def score(c: Long, t: Long): Long =
    math.floor((math.log(c.toDouble) - math.log(t.toDouble)) * 1e6).toLong

  private def rescored(counts: Seq[(String, Long)]): Model = {
    val t = counts.map(_._2).sum
    counts.map { case (p, c) => (p, c, score(c, t)) }
  }

  /** The Viterbi DP as ONE fold expression over the chunk column `w`:
    * returns array of (s, nn, nj) structs, index i+1 = best state at
    * position i, with nn = −pieces and nj = −start (so array_max's
    * lexicographic struct order IS the pinned tie order).
    */
  private def dpBest(mLit: Column, maxPieceLen: Int): Column =
    aggregate(
      sequence(lit(1), length(col("w"))),
      array(struct(lit(0L).as("s"), lit(0L).as("nn"), lit(0L).as("nj"))),
      (acc, i) => {
        val cands = transform(
          sequence(greatest(i - lit(maxPieceLen), lit(0)), i - lit(1)),
          j => {
            val piece = col("w").substr(j + lit(1), i - j)
            val sc = element_at(mLit, piece)
            val prev = element_at(acc, j + lit(1))
            when(sc.isNotNull,
              struct((prev.getField("s") + sc).as("s"),
                (prev.getField("nn") - lit(1L)).as("nn"),
                (lit(0L) - j.cast("long")).as("nj")))
          })
        array_append(acc, array_max(filter(cands, c => c.isNotNull)))
      })

  /** Best-path pieces (with multiplicity) from the DP table: walk the
    * stored start pointers back from position n — at most n steps,
    * expressed as a bounded fold; the zero-length tail pairs filter
    * out.
    */
  private def dpPieces(dp: Column): Column = {
    val n = length(col("w"))
    val path = aggregate(
      sequence(lit(1), n),
      array(n.cast("long")),
      (acc, _) => {
        val last = element_at(acc, size(acc))
        val prevj = lit(0L) -
          element_at(dp, last.cast("int") + 1).getField("nj")
        when(last > 0L, array_append(acc, prevj)).otherwise(acc)
      })
    filter(
      transform(sequence(lit(1), size(path) - 1), k => {
        val a = element_at(path, k + 1)
        val b = element_at(path, k)
        col("w").substr(a.cast("int") + 1, (b - a).cast("int"))
      }),
      p => length(p) > 0)
  }

  /** Train the model: seed, then `rounds` EM rounds. Returns the
    * final (piece, count, score) rows.
    */
  private[graft] def trainModel(
      docs: DataFrame,
      rounds: Int,
      maxPieceLen: Int,
      vocabTop: Int,
      chunkChars: Int,
      minCount: Long): Model = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8], got $rounds")
    require(maxPieceLen >= 2 && maxPieceLen <= 8,
      s"maxPieceLen must be in [2,8], got $maxPieceLen")
    val chunks = Checkpoints.truncateLazy(chunkFreq(docs, chunkChars))
    val sd = seedCounts(chunks, maxPieceLen)
    val singles = sd.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val multis = sd.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabTop)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var model: Model = rescored((singles ++ multis).sortBy(_._1))
    for (_ <- 1 to rounds) {
      val mLit = typedLit(model.map(p => p._1 -> p._3).toMap)
      val usage = chunks
        .withColumn("dp", dpBest(mLit, maxPieceLen))
        .select(col("freq"), explode(dpPieces(col("dp"))).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val retained = model.flatMap { case (p, _, _) =>
        val u = usage.getOrElse(p, 0L)
        if (p.length == 1) Some((p, math.max(u, 1L)))
        else if (u >= minCount) Some((p, u))
        else None
      }
      model = rescored(retained)
    }
    model
  }

  /** The trained model as a DataFrame — (piece, n_chars, count,
    * score), the `unigram_train` registry surface.
    */
  def unigramTrain(
      docs: DataFrame,
      rounds: Int = 2,
      maxPieceLen: Int = 4,
      vocabTop: Int = 48,
      chunkChars: Int = 12,
      minCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainModel(docs, rounds, maxPieceLen, vocabTop, chunkChars, minCount)
      .map { case (p, c, s) => (p, p.length.toLong, c, s) }
      .toDF("piece", "n_chars", "count", "score")
  }

  /** Corpus encode under the trained model — per language: chunk and
    * token counts, Viterbi log-score mass, fertility and compression
    * (the [[TextAnalysis.bpeFertilityChunked]] audit shape for the
    * unigram model). Each DISTINCT chunk pays the DP once; the
    * (chunk → n_tok) model broadcasts back over the lang-keyed
    * stream.
    */
  def unigramEncode(
      docs: DataFrame,
      rounds: Int = 2,
      maxPieceLen: Int = 4,
      vocabTop: Int = 48,
      chunkChars: Int = 12,
      minCount: Long = 2L): DataFrame = {
    val model = trainModel(docs, rounds, maxPieceLen, vocabTop, chunkChars, minCount)
    val mLit = typedLit(model.map(p => p._1 -> p._3).toMap)
    val enc = chunkFreq(docs, chunkChars)
      .withColumn("dp", dpBest(mLit, maxPieceLen))
      .withColumn("best",
        element_at(col("dp"), (length(col("w")) + 1).cast("int")))
      .select(col("w"),
        (lit(0L) - col("best.nn")).as("n_tok"),
        col("best.s").as("lp_micro"),
        length(col("w")).cast("long").as("n_chr"))
    docs
      .select(col("lang"), translate(col("text"), " ", "▁").as("t"))
      .select(col("lang"), explode(expr(
        s"""transform(sequence(0, greatest(cast(ceil(length(t) / $chunkChars.0D) as int) - 1, 0)),
              i -> substring(t, i * $chunkChars + 1, $chunkChars))""")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(enc), Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chr")).as("n_chars"),
        sum(col("lp_micro")).as("lp_micro_total"))
      .withColumn("fertility_ppm",
        expr("n_tokens * 1000000 div greatest(n_chunks, 1)"))
      .withColumn("compression_ppm",
        expr("n_tokens * 1000000 div greatest(n_chars, 1)"))
  }
}
