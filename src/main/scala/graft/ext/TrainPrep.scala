package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextPrimitives._

/** Training-set preparation operators: deterministic dataset splitting,
  * sequence packing, and benchmark decontamination — the last mile of a
  * large-scale training-data pipeline after cleaning/dedup.
  *
  * Scale design:
  *  - [[hashSplit]] is a pure per-row projection (zero shuffles): the
  *    split is a function of the id alone, so it is stable under
  *    re-runs, re-partitioning, and incremental ingest — rows never
  *    migrate between train/val/test when the corpus grows, unlike
  *    `randomSplit`, whose assignment depends on partitioning.
  *  - [[packSequences]] is one window over (bucket, doc order). The
  *    bucket key bounds each window partition to corpus/buckets — the
  *    packer parallelizes across buckets (one training shard each) and
  *    never materializes a global order.
  *  - [[decontaminate]] broadcasts the eval-set shingle index (eval
  *    suites are ~1e3-1e6 shingles — KBs to MBs); the train side is a
  *    map-side explode + broadcast semi-probe + partial count, so the
  *    100 TB corpus is never shuffled by shingle.
  */
object TrainPrep {

  /** Engine-portable deterministic hash of a string column into
    * [0, 1e9+7): polynomial fold (base 31) of the md5 hex characters.
    * Identical in any engine with md5 + a list fold (init-0 fold equals
    * first-element-init fold for `acc*31 + x`).
    *
    * Evaluated by the fused native expression
    * ([[graft.functions.PortableHash]] — value-identical, spec-pinned
    * against the compositional `aggregate(transform(split(md5)))`
    * form, which allocated 32 single-char strings per input); wrapped
    * directly via the Bridge so no session registration is needed.
    */
  def portableHash(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.PortableHash(
        org.apache.spark.sql.graft.Bridge.expression(c)))

  /** Deterministic train/val/test split: bucket = hash(seed|id) % 100,
    * train = [0, trainPct), val = [trainPct, trainPct+valPct), test =
    * the rest. Per-row projection; see scale notes above.
    */
  def hashSplit(
      docs: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10,
      seed: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"percentages must partition [0,100]: train=$trainPct val=$valPct")
    val bucket = portableHash(concat(lit(s"$seed|"), col("doc_id").cast("string"))) % 100
    docs.select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Sequence packing ("concat then chunk"): documents are streamed in
    * id order within `buckets` independent shards; each doc is assigned
    * to the context-window pack containing its start offset in the
    * concatenated token stream. One window aggregation per shard.
    *
    * Output: (doc_id, bucket, n_tokens, cum_tokens, pack_id) — enough
    * for a writer to emit shard/pack-partitioned training files.
    */
  def packSequences(
      docs: DataFrame,
      tokenBudget: Int = 2048,
      buckets: Int = 8): DataFrame = {
    require(tokenBudget > 0 && buckets > 0, "budget and buckets must be positive")
    val nTok = size(tokens(col("text"))).cast("long")
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        nTok.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_tokens) div ${tokenBudget.toLong}"))
  }

  /** Benchmark decontamination: per train document, how many distinct
    * word `k`-shingles it shares with the eval corpus. A training
    * pipeline drops (or at least audits) every `contaminated` doc so
    * benchmark answers don't leak into the training set.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, k: Int = 5): DataFrame = {
    val evalShingles = eval
      .select(explode(shingles(tokens(col("text")), k)).as("shingle"))
      .distinct()
    val overlap = Scale.widen(train)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), k)).as("shingle"))
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("shingle")).as("n_overlap"))
    train.select(col("doc_id"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** Fixed-window document chunking with overlap — the pretraining /
    * retrieval prep step that turns documents into length-bounded
    * training (or index) units: window `w` words, stride `s`, last
    * window clamped to the document end. Chunk count is
    * `1 + ceil((len - w) / s)` (one chunk for docs of ≤ `w` words), so
    * consecutive chunks overlap by `w - s` words and every word is in
    * at least one chunk.
    *
    * Pure per-row explode — zero shuffles, scan-speed like the rest of
    * the text layer; chunk ids are deterministic (doc_id, offset), so
    * re-runs and retries produce identical units.
    */
  def chunkWindows(docs: DataFrame, w: Int = 32, s: Int = 16): DataFrame = {
    require(w >= 1 && s >= 1 && s <= w, s"need 1 <= stride <= window, got w=$w s=$s")
    val words = tokens(col("text"))
    val n = size(words)
    val nChunks = when(n <= w, lit(1L))
      .otherwise(lit(1L) + expr(s"(size(split(text, ' ')) - $w + $s - 1) div $s"))
    docs
      .select(col("doc_id"), words.as("_w"), nChunks.as("_nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("_nc") - 1), i =>
          concat_ws(" ", slice(col("_w"), (i * s).cast("int") + 1, lit(w)))))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_words", size(split(col("chunk_text"), " ")))
  }

  /** Tokens → vocabulary ids: build the top-`vocabSize` vocabulary by
    * corpus frequency (ties broken lexicographically — deterministic),
    * then re-encode every document as its ordered id sequence with
    * out-of-vocabulary tokens mapped to id 0 (<unk>; in-vocab ids start
    * at 1, frequency-ranked). The tokenize-to-ids step of a training
    * pipeline as pure relational ops: explode with position, broadcast
    * vocab join, re-assemble ordered arrays — no UDF, no driver-side
    * vocab dictionary.
    *
    * Scale: the vocab is a top-k aggregate (partial map-side counts,
    * one shuffle of |distinct tokens| rows) and broadcasts; the corpus
    * pays one explode + broadcast probe + one (doc_id)-keyed
    * re-assembly shuffle.
    */
  def tokensToIds(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    // top-k FIRST via orderBy+limit (TakeOrderedAndProject — each
    // partition contributes its local top-k, no global sort), THEN the
    // rank window over only the vocabSize survivors. Ranking all
    // distinct tokens with an unpartitioned window would put the whole
    // vocabulary through one task.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("tok"))
    val vocab = docs
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .withColumn("tok_id", row_number().over(w).cast("long"))
      .select(col("tok"), col("tok_id"))
    val pos = docs.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    pos
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        // CSV-joined (the oracle-portable sequence encoding): arrays
        // don't survive the driver's row-sort hash compare
        array_join(
          transform(array_sort(collect_list(struct(col("pos"),
            coalesce(col("tok_id"), lit(0L)).as("tok_id")))), s => s("tok_id")),
          ",").as("token_ids_csv"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok_id").isNull, 1L).otherwise(0L)).as("n_unk"))
  }

  /** Pack-fill QC over [[packSequences]]: per-pack token fill as a ppm
    * of the context budget, histogrammed in decile bins — the waste
    * metric a packing strategy is judged by (fill < 1e6 wastes context;
    * > 1e6 marks the boundary pack whose last document spills). Cost on
    * top of the packer: one (bucket, pack) aggregate + a |bins|-row
    * final aggregate.
    */
  def packingEfficiency(
      docs: DataFrame,
      tokenBudget: Int = 2048,
      buckets: Int = 8): DataFrame =
    packSequences(docs, tokenBudget, buckets)
      .groupBy(col("bucket"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_ppm", expr(s"pack_tokens * 1000000 div ${tokenBudget}L"))
      .groupBy(expr("fill_ppm div 100000").as("bin"))
      .agg(count(lit(1)).as("n_packs"),
        min(col("fill_ppm")).as("min_fill_ppm"),
        max(col("fill_ppm")).as("max_fill_ppm"))

  /** Deterministic global shuffle + shard assignment — the "shuffle the
    * corpus, write N training shards" step, made reproducible: shard =
    * hash(seed|id) mod n, position = rank of hash WITHIN the shard
    * (ties by id). The training order is a pure function of (seed, id
    * set): re-runs, retries, and incremental rebuilds emit identical
    * shards, and changing the seed is a full reshuffle — what
    * `orderBy(rand())` can never give.
    *
    * Scale shape: one hash projection + one shuffle keyed by shard with
    * a per-shard sort (each window partition is corpus/n docs — n is
    * picked so a shard fits a writer task). At 100 TB this is exactly
    * the `repartition(n, shard).sortWithinPartitions(hash)` layout a
    * shard writer runs.
    */
  def shardShuffle(
      docs: DataFrame,
      shards: Int = 8,
      seed: String = "shuffle"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val h = portableHash(concat(lit(s"$seed|"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("sort_key"), col("doc_id"))
    docs.select(col("doc_id"), h.as("sort_key"))
      .withColumn("shard", pmod(col("sort_key"), lit(shards.toLong)))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("sort_key"), col("position"))
  }

  /** Shard manifest — the reproducibility artifact a training run
    * records next to its shards: per shard, the document count, total
    * whitespace tokens, and two order-insensitive content checksums
    * (sum of ids, sum of per-doc hashes mod 1e9+7) so a re-materialized
    * shard can be verified without re-reading the original corpus.
    * Built on [[shardShuffle]]'s deterministic assignment; exact
    * integers throughout.
    */
  def shardManifest(docs: DataFrame, shards: Int = 8, seed: String = "shuffle"): DataFrame = {
    val assigned = shardShuffle(docs.select(col("doc_id")), shards, seed)
      .select(col("doc_id"), col("shard"), col("sort_key"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(assigned, Seq("doc_id"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("doc_id")).as("id_checksum"),
        (sum(col("sort_key")) % 1000000007L).as("hash_checksum"))
  }

  /** Temperature-resampling mixture weights (α = 0.5): per slice,
    * weight ∝ √n normalized to ppm — the standard multilingual
    * data-mixing recipe that upsamples small languages relative to
    * their raw share. Exact arithmetic: `floor(sqrt(bigint))` is
    * deterministic (IEEE sqrt is correctly rounded; counts < 2^53 are
    * exact doubles) and the normalization is an integer DIV. The
    * whole computation runs over the |slices|-row aggregate, so the
    * corpus pays one partial-aggregated count shuffle and nothing
    * else.
    */
  def mixtureWeights(docs: DataFrame, sliceCol: String = "lang"): DataFrame = {
    val per = docs.groupBy(col(sliceCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("s", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    per
      .withColumn("raw_ppm", expr("n_docs * 1000000 div (sum(n_docs) over ())"))
      .withColumn("weight_ppm", expr("s * 1000000 div (sum(s) over ())"))
      .drop("s")
  }

  /** APPLY the mixture: deterministic per-document rejection sampling
    * that moves each slice's share toward its [[mixtureWeights]]
    * target. Acceptance per slice = (target/current share ratio),
    * normalized so the most up-weighted slice keeps everything —
    * down-sampling only, the lossless direction (up-sampling is
    * repetition, a training-loop concern). The keep decision is
    * hash(seed|doc_id) — a pure function of the doc id, so re-runs,
    * retries, and different partitionings keep THE SAME documents.
    *
    * Emits the per-slice audit row (docs in, acceptance, docs kept) —
    * the summary a mixture step logs; the kept id set is derivable by
    * re-applying the same pure predicate.
    *
    * Scale shape: weights are a |slices|-row broadcast; the
    * keep-filter is a codegen'd per-row projection over the scan; one
    * final tiny aggregate per slice.
    */
  def weightedSample(docs: DataFrame, sliceCol: String = "lang", seed: String = "wsample"): DataFrame = {
    val w = mixtureWeights(docs, sliceCol)
      .withColumn("ratio", expr("weight_ppm * 1000000 div greatest(raw_ppm, 1L)"))
      .withColumn("accept_ppm",
        expr("least(ratio * 1000000 div (max(ratio) over ()), 1000000L)"))
      .select(col(sliceCol), col("n_docs"), col("weight_ppm"), col("raw_ppm"), col("accept_ppm"))
    val u = portableHash(concat(lit(s"$seed|"), col("doc_id").cast("string"))) % 1000000L
    docs.select(col("doc_id"), col(sliceCol))
      .join(broadcast(w), Seq(sliceCol))
      .withColumn("kept", u < col("accept_ppm"))
      .groupBy(col(sliceCol))
      .agg(
        first(col("n_docs")).as("n_docs"),
        first(col("weight_ppm")).as("weight_ppm"),
        first(col("raw_ppm")).as("raw_ppm"),
        first(col("accept_ppm")).as("accept_ppm"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Curriculum assembly: band the corpus easy→hard into `phases`
    * training phases by a deterministic integer difficulty score, and
    * order each phase — the "train on clean/common text first, feed
    * the rare tail later" schedule of curriculum-learning data prep.
    *
    * Difficulty is an exact composite: `rare_ppm · 4096 +
    * min(n_tokens, 4095)` — rarity dominates (documents made of
    * low-frequency tokens are the hard tail), length breaks ties
    * inside a rarity level, and the packing keeps the composite inside
    * int64 with zero overlap between the two fields. Swapping in a
    * model-scored difficulty (loss percentile, LM score) changes
    * nothing structural — [[graft.ext.CorpusClean.finish]] does
    * exactly that with its fluency bands.
    *
    * Scale shape: rarity is one token-keyed shuffle + one doc-keyed
    * aggregation ([[graft.ext.TextAnalysis.rareTokenRatio]]); the
    * phase thresholds are k·n/phases order statistics read from a
    * difficulty HISTOGRAM cumulative sum (the capstone's tercile
    * convention — never a global sort of document rows); `position`
    * is the only per-row ordering and it is per-phase, the same
    * class as shard-local ordering every shard writer needs anyway.
    * Docs shorter than the tokenizer's floor (zero tokens) band into
    * phase 1 with zeros — present, never dropped.
    */
  def curriculumPhases(docs: DataFrame, phases: Int = 4): DataFrame = {
    require(phases >= 2, s"phases must be >= 2, got $phases")
    val rare = TextAnalysis.rareTokenRatio(docs.select("doc_id", "text"))
    val scored = Checkpoints.truncateLazy(docs.select("doc_id")
      .join(rare.select("doc_id", "n_tokens", "rare_ppm"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens", "rare_ppm"))
      .withColumn("difficulty",
        expr("rare_ppm * 4096 + least(n_tokens, 4095)")))
    val hist = scored.groupBy(col("difficulty")).agg(count(lit(1)).as("c"))
      .withColumn("_g", lit(1))
    val aggs = max(col("cum_total")).as("n") +:
      (1 until phases).map(k =>
        min(when(col("cum") >= expr(s"$k * cum_total div $phases"),
          col("difficulty"))).as(s"t$k"))
    val gate = Scale.chunkedCumSum(hist, Seq("_g"), "difficulty", "c", "cum")
      .agg(aggs.head, aggs.tail: _*).collect().head
    val n = if (gate.isNullAt(0)) 0L else gate.getLong(0)
    // rank k·n/phases < 1 has no order statistic: the band predicate
    // must be vacuous (the CorpusClean.finish absent-rank convention)
    val ts = (1 until phases).map(k =>
      if (k * n / phases < 1) Long.MinValue else gate.getLong(k))
    val phase = ts.zipWithIndex.foldRight(lit(phases)) {
      case ((t, i), rest) => when(col("difficulty") <= t, i + 1).otherwise(rest)
    }
    val w = Window.partitionBy(col("phase"))
      .orderBy(col("difficulty"), col("doc_id"))
    scored.withColumn("phase", phase)
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("rare_ppm"),
        col("difficulty"), col("phase"), col("position"))
  }

  /** Curriculum → packing composition: band the corpus into
    * [[curriculumPhases]]' easy→hard phases, then run
    * [[packSequences]]' concat-then-chunk packer WITHIN each phase —
    * documents stream through `buckets` independent shards per phase
    * in CURRICULUM order (difficulty, then doc_id), so a trainer
    * consuming (phase, bucket, pack_id) order gets the schedule the
    * curriculum promised, in context-window-sized units. The two
    * operators existed separately; a real assembly needs them
    * composed — phase boundaries must also be PACK boundaries (a pack
    * never mixes phases), which post-hoc packing of the whole corpus
    * cannot guarantee.
    *
    * Output is doc-grain: (doc_id, phase, bucket, n_tokens,
    * cum_tokens, pack_id) — enough for a writer to emit
    * phase/shard/pack-partitioned training files, and for
    * [[curriculumPackManifest]] to aggregate the manifest.
    *
    * Scale shape: everything [[curriculumPhases]] costs, plus ONE
    * window over (phase, bucket) — the same shard-local ordering class
    * as the packer alone; no global sort, no new corpus-sized join
    * (the packer reads the curriculum output's own columns).
    */
  def curriculumPack(
      docs: DataFrame,
      phases: Int = 4,
      tokenBudget: Int = 2048,
      buckets: Int = 8): DataFrame = {
    require(tokenBudget > 0 && buckets > 0, "budget and buckets must be positive")
    val cur = curriculumPhases(docs, phases)
    val w = Window.partitionBy(col("phase"), col("bucket"))
      .orderBy(col("difficulty"), col("doc_id"))
    cur
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_tokens) div ${tokenBudget.toLong}"))
      .select(col("doc_id"), col("phase"), col("bucket"),
        col("n_tokens"), col("cum_tokens"), col("pack_id"))
  }

  /** The reproducibility artifact of [[curriculumPack]] — per
    * (phase, bucket, pack_id): document count, token total, fill ppm
    * of the context budget, and an order-insensitive id checksum (the
    * [[shardManifest]] convention), so a re-materialized phase shard
    * verifies without re-reading the corpus. |phases·buckets·packs|
    * rows — manifest-sized, never corpus-sized.
    */
  def curriculumPackManifest(
      docs: DataFrame,
      phases: Int = 4,
      tokenBudget: Int = 2048,
      buckets: Int = 8): DataFrame =
    curriculumPack(docs, phases, tokenBudget, buckets)
      .groupBy(col("phase"), col("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        sum(col("doc_id")).as("id_checksum"))
      .withColumn("fill_ppm", expr(s"pack_tokens * 1000000 div ${tokenBudget.toLong}"))

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram features are
    * under the TARGET distribution than under the RAW distribution —
    * `log w(doc) = Σ_tokens [log p_target(bucket(tok)) −
    * log p_raw(bucket(tok))]` with Laplace-smoothed bucket
    * distributions (`(c+1)/(N+B)`). High-weight documents "look like"
    * the target corpus; resampling by these weights is the standard
    * cheap alternative to training a quality classifier.
    *
    * Exactness: the per-BUCKET log-ratio is integerized on the 1e6
    * grid FIRST (`floor(1e6·logratio)` — a B-row model, deterministic
    * in any engine), and only then summed per document — so the
    * doc-grain sum is exact Long addition, associative under any
    * partitioning, never an order-dependent float reduction.
    *
    * Scale shape: token→bucket is a per-row projection of the
    * [[portableHash]]; both bucket distributions are B-row aggregates
    * (map-side combined); the B-row log-ratio model BROADCASTS back
    * onto the token stream; the only doc-grain work is one partial-
    * aggregated sum keyed by doc_id. The corpus text never shuffles,
    * and nothing the size of the corpus reaches the driver.
    */
  /** Token → feature bucket, the engine-portable DSIR feature map:
    * [[portableHash]] of the salted token mod `buckets`.
    */
  private def dsirBucket(buckets: Int): Column =
    pmod(portableHash(concat(lit("dsir|"), col("w"))), lit(buckets.toLong))

  /** A corpus collapsed to its DSIR bucket-count distribution —
    * (bucket, c), only buckets with mass. B-row model frame; this is
    * both the batch path's aggregate and the streaming monitor's
    * per-batch partial (counts merge by addition).
    */
  private[graft] def dsirCounts(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(dsirBucket(buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** The DSIR model finisher shared by [[dsirWeights]] and the
    * streaming [[graft.streaming.DsirMonitor]] — identical expressions
    * on identical counts give bit-identical log-ratios, so the
    * monitor's accumulated report equals the one-shot batch model
    * (the [[graft.ext.Similarity.driftFromPerDim]] convention). Input:
    * (bucket, c_raw) and (bucket, c_tgt) count frames; output one row
    * per raw-massed bucket: (bucket, c_raw, c_tgt, logratio_micro).
    *
    * Cross-engine exactness caveat (advisor, round 13): this is the
    * repo's ln-oracle convention — JVM `Math.log` (intrinsic, 1-ulp
    * tolerance) and DuckDB's libm `ln` are not GUARANTEED
    * bit-identical, so a log-ratio landing exactly on a 1e6-grid
    * boundary could floor differently across engines. The expression
    * grouping below eliminates the identical-distribution case (equal
    * operands subtract to exactly 0), and the gates have never
    * observed a boundary hit on unequal distributions (a ±1-ulp
    * disagreement must coincide with a value within ~1e-16 of the
    * grid line); if one ever appears, snap near-boundary values
    * (|frac − round(frac)| < 1e-9) before flooring on BOTH engines.
    */
  private[graft] def dsirModelFrom(
      rawB: DataFrame, tgtB: DataFrame, buckets: Int): DataFrame = {
    val b = lit(buckets.toLong)
    val totals = rawB.agg(sum(col("c_raw")).as("n_raw"))
      .crossJoin(broadcast(tgtB.agg(coalesce(sum(col("c_tgt")), lit(0L)).as("n_tgt"))))
    // every probed bucket appears in rawB by construction, so a left
    // join from the raw side loses nothing; absent target mass is the
    // smoothing floor
    rawB
      .join(tgtB, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .crossJoin(broadcast(totals))
      // grouped as (target log-mass) − (raw log-mass): when the two
      // distributions are identical the operands are identical doubles
      // and the difference is EXACTLY zero — no ±ulp residue for the
      // 1e6-grid floor to amplify into a spurious −1
      .withColumn("logratio_micro",
        floor(((log(col("c_tgt") + lit(1L)) + log(col("n_raw") + b))
          - (log(col("c_raw") + lit(1L)) + log(col("n_tgt") + b))) * lit(1e6))
          .cast("long"))
      .select(col("bucket"), col("c_raw"), col("c_tgt"), col("logratio_micro"))
  }

  /** Score documents against a (bucket, logratio_micro) model — the
    * application half of [[dsirWeights]], shared with the
    * admission-time [[graft.streaming.DsirIngest]] so a frozen
    * deployed model scores exactly like the training-time pass.
    * Zero-word tokens keep a null bucket: they ride through the LEFT
    * broadcast probe into the doc-keyed aggregation, so "every doc_id
    * present" costs no corpus×corpus presence join (the plan audit
    * caught the join form) — the corpus pays one broadcast probe +
    * one partial-aggregated doc-keyed sum, zero SMJ. A token whose
    * bucket is ABSENT from the model scores 0 (the deterministic
    * pass-through; within [[dsirWeights]] absence cannot happen —
    * every raw bucket is in the model by construction).
    */
  private[graft] def dsirScore(
      docs: DataFrame, model: DataFrame, buckets: Int): DataFrame =
    Scale.widen(docs)
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("w"))
      .withColumn("bucket",
        when(length(col("w")) > 0, dsirBucket(buckets)).otherwise(lit(null)))
      .join(broadcast(model.select(col("bucket"), col("logratio_micro"))),
        Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("bucket").isNotNull, 1L).otherwise(0L)).as("n_tokens"),
        sum(coalesce(col("logratio_micro"), lit(0L))).as("logw_micro"))

  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val rawB = Scale.widen(raw)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(dsirBucket(buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c_raw"))
    val tgtB = dsirCounts(target, buckets).withColumnRenamed("c", "c_tgt")
    val model = dsirModelFrom(rawB, tgtB, buckets)
    dsirScore(raw, model, buckets)
  }

  /** The selection [[dsirWeights]] exists for: keep the top
    * `keepPpm`-millionths of the raw corpus by importance weight —
    * the resampling step of DSIR, with the threshold read from a
    * weight HISTOGRAM order statistic (the curriculum/capstone
    * convention — never a global sort of document rows). Ties at the
    * threshold keep the whole tie class OUT (kept ⇔ weight strictly
    * above the (n−k)-th order statistic), so the kept count
    * under-fills by at most the tie class and the decision is
    * deterministic under any partitioning; `keepPpm` quotas with no
    * order statistic (rank < 1) vacuously keep everything — the
    * [[curriculumPhases]] absent-rank convention.
    *
    * Scale shape: [[dsirWeights]]' cost + one weight-histogram
    * aggregate and a driver-side threshold read; the kept flag is a
    * map-side comparison.
    */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      buckets: Int = 256,
      keepPpm: Long = 250000L): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L,
      s"keepPpm must be in [0, 1e6], got $keepPpm")
    val wts = Checkpoints.truncateLazy(dsirWeights(raw, target, buckets))
    val hist = wts.groupBy(col("logw_micro")).agg(count(lit(1)).as("c"))
      .withColumn("_g", lit(1))
    val gate = Scale.chunkedCumSum(hist, Seq("_g"), "logw_micro", "c", "cum")
      .agg(max(col("cum_total")).as("n"),
        min(when(col("cum") >= expr(s"cum_total - cum_total * $keepPpm div 1000000"),
          col("logw_micro"))).as("t"))
      .collect().head
    val n = if (gate.isNullAt(0)) 0L else gate.getLong(0)
    val rank = n - n * keepPpm / 1000000L
    val t = if (rank < 1) Long.MinValue else gate.getLong(1)
    wts.select(col("doc_id"), col("n_tokens"), col("logw_micro"),
      (col("logw_micro") > lit(t)).as("kept"))
  }

  /** Token-budget planning: given a training-run token budget, how
    * many tokens to DRAW from each source under the sqrt-temperature
    * mixture (the [[mixtureWeights]] α=0.5 convention, here over
    * source token counts), and what that implies per source — the
    * epoch multiplier (`epochs_ppm > 1e6` ⇔ the source must repeat)
    * and the share of the source left unread. This is the planning
    * table a pipeline writes BEFORE materializing a mixture: it makes
    * over-epoching (the "we will see this tiny source 40 times"
    * failure) visible as a column instead of a surprise.
    *
    * All arithmetic is exact integer ppm (the repo-wide convention);
    * source-grain model only — one token-count aggregation over the
    * corpus, then |sources| rows of planning math.
    */
  def tokenBudgetPlan(docs: DataFrame, budget: Long = 50000L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val per = docs
      .select(col("source"), size(filter(tokens(col("text")), w => length(w) > 0))
        .cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("s", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    per.crossJoin(broadcast(per.agg(sum(col("s")).as("s_total"))))
      .withColumn("weight_ppm", expr("s * 1000000 div s_total"))
      .withColumn("planned_tokens", expr(s"$budget * weight_ppm div 1000000"))
      .withColumn("epochs_ppm",
        expr("CASE WHEN n_tokens > 0 THEN planned_tokens * 1000000 div n_tokens ELSE 0 END"))
      .withColumn("oversampled", col("epochs_ppm") > lit(1000000L))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight_ppm"),
        col("planned_tokens"), col("epochs_ppm"), col("oversampled"))
  }
}
