package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment of
  * the engine's operators reaches for — key salting for skew, and
  * bucketed table round-trips for shuffle-free co-located joins.
  *
  * AQE's skew-join splitting (on by default in Spark 4) handles most
  * skew transparently; explicit salting remains the answer when one
  * key's volume exceeds what a single split can absorb (the classic
  * "null key" / "megacustomer" case), and for skewed AGGREGATIONS,
  * which AQE does not split.
  */
object Scale {

  /** Raise a frame's partition count to the cluster's core count before
    * a CPU-heavy per-row derivation (md5 shingling, simhash, per-pair
    * dot products). A scan of a small file set plans as few partitions
    * as it has files/row-groups — a single-file table runs any
    * downstream map stage on ONE core no matter how wide the cluster.
    * One cheap shuffle of the raw rows buys full map-side parallelism.
    *
    * No-op when the input is already at least as wide as the cluster
    * (the 100 TB case: thousands of input splits), so it never
    * DOWN-scales a big scan or adds a shuffle where parallelism exists.
    *
    * The width probe is plan-free for the common case (registry keys
    * pass raw file scans): the planned split count is derived from the
    * already-listed FileIndex with the same byte arithmetic Spark's
    * FilePartition packing uses. Any other lineage (local relations,
    * shuffled/derived frames, mixed scans) makes the estimate UNKNOWN —
    * there the probe falls back to `df.rdd.getNumPartitions`, which
    * costs one physical planning pass but is exact, so an
    * already-wide frame (e.g. a caller's `repartition(2·cores)`) is a
    * guaranteed no-op and widen never down-scales or inserts a gratuitous
    * shuffle. `inputPartitions` overrides the probe entirely.
    */
  def widen(df: DataFrame, inputPartitions: Option[Int] = None): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = inputPartitions.getOrElse {
      val est = estimatedScanPartitions(df, target)
      // 0 = "not a pure file-scan lineage" — unknown, not narrow. Fall
      // back to the exact (plan-forcing) probe rather than assuming
      // narrow and silently repartitioning a frame that is already wide.
      if (est > 0) est else df.rdd.getNumPartitions
    }
    if (current < target) df.repartition(target) else df
  }

  /** Estimated file-scan partition count from the ANALYZED plan only —
    * `FilePartition.maxSplitBytes` arithmetic (maxPartitionBytes cap,
    * open-cost floor, bytes-per-core target) over `FileIndex
    * .sizeInBytes`, which the read already listed. Returns 0 ("unknown —
    * caller must probe exactly") when any leaf is not a file scan.
    */
  private def estimatedScanPartitions(df: DataFrame, target: Int): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    val leafSizes = df.queryExecution.analyzed.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          // the FileIndex already holds the listing; count files so the
          // per-file open cost matches FilePartition's packing (a
          // many-small-files scan IS wide even at few total bytes)
          Some((fs.location.sizeInBytes, fs.location.inputFiles.length))
        case _ => None
      }
      case _ => None
    }
    if (leafSizes.isEmpty || leafSizes.exists(_.isEmpty)) 0
    else {
      val open = conf.filesOpenCostInBytes
      val nFiles = leafSizes.flatten.map(_._2.toLong).sum
      val total = leafSizes.flatten.map(_._1).sum + open * math.max(1L, nFiles)
      val bytesPerCore = total / math.max(1, target.toLong)
      val split = math.min(conf.filesMaxPartitionBytes, math.max(open, bytesPerCore))
      math.max(1, math.ceil(total.toDouble / split).toInt)
    }
  }

  /** Skew-safe equi-join of a large skewed frame against a smaller one.
    *
    * The big side gets a random-but-deterministic salt in [0, salts)
    * (hash of the whole row, not the key — the hot KEY is exactly what
    * must spread); the small side is exploded `salts`× so every
    * (key, salt) bucket finds its match. Result set is identical to the
    * plain join; the shuffle spreads each hot key over `salts`
    * partitions.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** The skew POLICY the skew report feeds — measure→decide→act (the
    * dedup_simhash_rebanding pattern applied to joins): measure the
    * big side's per-key histogram FIRST (a 1-row aggregate — the same
    * eager driver-side gate class as the SNR and re-banding
    * decisions), and when the hottest key holds more than
    * `skewThresholdPpm` of its even share (`max_n · n_keys / n_rows`
    * in ppm — [[Profile.skew]]'s `skew_x_ppm`) run [[saltedJoin]];
    * healthy keys take the plain equi-join Catalyst can freely
    * broadcast or co-locate. Decision evidence rides on the output
    * (`join_strategy`, `skew_x_ppm`) so a pipeline log records WHY.
    *
    * Salting targets the shuffle-join case (a dim too big to
    * broadcast); when Catalyst broadcasts the exploded small side
    * anyway the salt is harmless — the policy guards the 100 TB plan,
    * where the hot key of an SMJ/shuffled-hash join is the stage
    * straggler. AQE's skew split handles symmetric skew; the explicit
    * policy covers the one-key-exceeds-any-split case and keeps the
    * decision observable.
    */
  def adaptiveJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16,
      skewThresholdPpm: Long = 1500000L): DataFrame = {
    val m = big.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("max_n"), sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"))
      .collect().head
    val skewXPpm =
      (BigInt(m.getLong(0)) * m.getLong(2) * 1000000 / m.getLong(1)).toLong
    val skewed = skewXPpm > skewThresholdPpm
    val joined = if (skewed) saltedJoin(big, small, key, salts)
      else big.join(small, Seq(key))
    joined
      .withColumn("join_strategy", lit(if (skewed) "salted" else "plain"))
      .withColumn("skew_x_ppm", lit(skewXPpm))
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Supported
    * aggregates must be decomposable (sum/count/min/max — the partial
    * column name is reused for the final).
    */
  def saltedSumAgg(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", rand_from(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as(valueCol), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(valueCol).as(valueCol), sum("__n").as("n_rows"))

  /** The skew POLICY for AGGREGATION — [[adaptiveJoin]]'s gate applied
    * to the group-by side (AQE splits skewed join partitions but never
    * skewed aggregations): measure the per-key histogram FIRST (the
    * same map-combinable 1-row aggregate), and when the hottest key
    * exceeds `skewThresholdPpm` of its even share run the two-phase
    * [[saltedSumAgg]]; healthy keys take the plain hash aggregate.
    * Decision evidence rides on the output (`agg_strategy`,
    * `skew_x_ppm`).
    *
    * Scale honesty: for decomposable aggregates Spark's partial
    * (map-side) aggregation already bounds the hot key's reducer input
    * at one row per map task — the salt pays off when partial
    * aggregation is ineffective (high group cardinality spills the
    * hash map, `spark.sql.aggregate.partialaggregate` fallbacks) or
    * when the per-key state is wide (collect-style aggregates), and it
    * is how the same gate extends to those. The decision is measured,
    * so the healthy path never pays the extra shuffle.
    */
  def adaptiveAgg(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int = 16,
      skewThresholdPpm: Long = 1500000L): DataFrame = {
    val m = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("max_n"), sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"))
      .collect().head
    // empty input: max/sum aggregate to NULL (and n_rows=0 would divide
    // by zero) — no skew exists, take the plain branch
    val skewXPpm =
      if (m.isNullAt(0) || m.isNullAt(1) || m.getLong(1) == 0L) 0L
      else (BigInt(m.getLong(0)) * m.getLong(2) * 1000000 / m.getLong(1)).toLong
    val skewed = skewXPpm > skewThresholdPpm
    val agged = if (skewed) saltedSumAgg(df, key, valueCol, salts)
      else df.groupBy(col(key))
        .agg(sum(valueCol).as(valueCol), count(lit(1)).as("n_rows"))
    agged
      .withColumn("agg_strategy", lit(if (skewed) "salted" else "plain"))
      .withColumn("skew_x_ppm", lit(skewXPpm))
  }

  // deterministic per-row "randomness" for salting aggregations: hash
  // of all columns (monotonically_increasing_id would break retries)
  private def rand_from(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** Bloom-pruned exact semi-join: build a bloom filter over the small
    * side's key (a distributed treeAggregate; the driver holds only the
    * ~`1.2·n·log2(1/fpp)`-bit filter), filter the big side with it
    * BEFORE the shuffle, then exact left-semi join the survivors.
    *
    * The result is exactly `big ⋉ small`: bloom filters have no false
    * negatives, and the semi-join removes the ≤`fpp` false positives.
    * What changes is the shuffle volume — at 100 TB, a selective small
    * side means the exchange moves ~`sel + fpp` of the fact table
    * instead of all of it. This is the explicit, always-on form of
    * Spark's planner-gated runtime bloom filter.
    *
    * Keys must be bigint on both sides (see
    * [[graft.functions.BloomMightContain]]).
    */
  def bloomPrunedSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    graft.functions.GraftFunctions.register(big.sparkSession)
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    big.filter(org.apache.spark.sql.functions.call_function(
      "graft_bloom_might_contain", col(bigKey), lit(bytes)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Range-clustered parquet layout: `repartitionByRange` assigns each
    * output file a DISJOINT range of `sortCol` (sampled boundaries →
    * near-equal file sizes), and sorting within partitions narrows
    * every parquet row-group's min/max span. A downstream range
    * predicate on `sortCol` then skips whole row-groups via parquet
    * statistics — at 100 TB, a time- or score-range query reads the few
    * files covering its range instead of the full table. The
    * single-column analog of Z-ordering; combine with `partitionBy` on
    * a low-cardinality column for two-level pruning.
    */
  def writeRangeClustered(
      df: DataFrame,
      path: String,
      sortCol: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Z-ordered parquet layout: two-dimensional generalization of
    * [[writeRangeClustered]]. Each dimension is bucketed to 16-bit ids
    * with `width_bucket` over its (min, max) — one tiny stats
    * aggregate — then the bucket ids are Morton-interleaved
    * ([[graft.functions.ZOrderInterleave]]) and the frame is
    * range-partitioned + sorted by the z-value. Every file then covers
    * a bounded SQUARE-ish region of (a, b) space, so a predicate box on
    * either or both columns skips most files/row-groups — where a
    * single-column sort leaves the second dimension spanning the full
    * range in every file.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      partitions: Int,
      buckets: Int = 65536): Unit = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect().head
    // degenerate guards: an empty frame has null stats (plain write —
    // nothing to cluster); a constant column makes width_bucket NULL
    // (min==max), which would null every z-value and collapse the
    // range partitioner to ONE file — coalesce pins such rows to
    // bucket 0, degrading that dimension gracefully to "no signal"
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    def bucket(c: String, lo: Double, hi: Double) =
      coalesce(least(greatest(
        width_bucket(col(c).cast("double"), lit(lo), lit(hi), lit(buckets)) - 1,
        lit(0L)), lit(buckets - 1L)), lit(0L))
    val z = org.apache.spark.sql.functions.call_function("graft_zorder",
      bucket(colA, stats.getDouble(0), stats.getDouble(1)),
      bucket(colB, stats.getDouble(2), stats.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write a frame as a bucketed+sorted table: subsequent equi-joins /
    * aggregations on the bucket key among same-bucketed tables run with
    * NO shuffle (the scan provides the required hash distribution).
    * The repeated-snapshot diff case (§7.5) pre-buckets both snapshots
    * on the key so every nightly diff is exchange-free.
    *
    * Caveat with the default in-memory catalog: table metadata dies
    * with the session but the warehouse DIRECTORY persists, and Spark
    * refuses to create a "new" table over an existing location
    * (LOCATION_ALREADY_EXISTS) — `DROP TABLE IF EXISTS` in a fresh
    * session won't clean it. Use a persistent metastore, or clear the
    * location first.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      path: Option[String] = None): Unit = {
    // an explicit path sidesteps the LOCATION_ALREADY_EXISTS caveat
    // above: overwrite of a path-based table is idempotent even when a
    // fresh session's in-memory catalog forgot the table
    val w = df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }

  /** Distributed prefix sum: adds `out` (running sum of `valueCol` up
    * to and including the current row, ordered by `orderCol` within
    * `groupCols`) and `${out}_total` (the group total).
    *
    * `Window.partitionBy(group).orderBy(order)` holds EACH GROUP in
    * ONE task — with few groups (or one) the cumsum runs on as many
    * cores as there are groups, and at 100 TB a single task must sort
    * and buffer a whole group. This is the classic two-phase fix:
    *
    *   1. bucket rows into `chunks` order-aligned ranges per group
    *      (deterministic affine bucketing on the order column's
    *      [min, max] — a pure per-row function, no sampling pass);
    *   2. cumsum WITHIN each (group, chunk) in parallel;
    *   3. prefix-sum the per-chunk totals on the tiny (group, chunk)
    *      frame and broadcast the offsets back.
    *
    * The result is bit-identical to the single-task window FOR EXACT
    * value types (integral/decimal): equal order values share a chunk,
    * so no tie straddles a boundary (asserted by the equivalence
    * property spec), and exact addition is associative. A FLOATING
    * POINT `valueCol` would re-associate the additions across chunks
    * and change rounding — rejected eagerly rather than returning
    * almost-right sums. Requires a numeric `orderCol`; ranges are
    * assumed not to overflow `decimal(38)` affine arithmetic (any long
    * range qualifies).
    */
  def chunkedCumSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      out: String,
      chunks: Int = 64): DataFrame = {
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           (_: org.apache.spark.sql.types.DecimalType) => ()
      case other => throw new IllegalArgumentException(
        s"chunkedCumSum: valueCol '$valueCol' is $other — the bit-identical contract " +
          "requires an exact (integral/decimal) type; cast floats to fixed-point first")
    }
    val g = groupCols.map(col)
    // null-safe join keys: a NULL group is its own window partition in
    // the plain formulation, so an inner using-column join (null never
    // equals null) would silently DROP those rows and break the
    // bit-identical contract — join on <=> instead
    def nullSafeOn(right: DataFrame): Column =
      groupCols.map(c => df(c) <=> right(c)).reduce(_ && _)
    val stats = df.groupBy(g: _*)
      .agg(min(col(orderCol)).as("_lo"), max(col(orderCol)).as("_hi"))
    // affine bucket: monotone in orderCol, constant for equal values;
    // decimal domain so (order − lo) · chunks never overflows long
    val bucket = when(col("_hi") === col("_lo"), lit(0)).otherwise(
      ((col(orderCol).cast("decimal(38,0)") - col("_lo").cast("decimal(38,0)"))
        * chunks
        / (col("_hi").cast("decimal(38,0)") - col("_lo").cast("decimal(38,0)") + 1))
        .cast("int"))
    val withChunk = groupCols
      .foldLeft(df.join(broadcast(stats), nullSafeOn(stats)))((d, c) => d.drop(stats(c)))
      .withColumn("_chunk", bucket)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy((groupCols :+ "_chunk").map(col): _*).orderBy(col(orderCol))
    // per-chunk totals + exclusive prefix over chunks: |groups·chunks|
    // rows — broadcastable at any data scale
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("_chunk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = withChunk
      .groupBy((groupCols :+ "_chunk").map(col): _*)
      .agg(sum(col(valueCol)).as("_ctot"))
      .withColumn("_off", coalesce(sum(col("_ctot")).over(wOff), lit(0L)))
      .withColumn("_gtot", sum(col("_ctot")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
      .drop("_ctot")
    val partial = withChunk.withColumn("_incum", sum(col(valueCol)).over(wIn))
    val joinOn = (groupCols.map(c => partial(c) <=> offs(c)) :+
      (partial("_chunk") === offs("_chunk"))).reduce(_ && _)
    (groupCols :+ "_chunk")
      .foldLeft(partial.join(broadcast(offs), joinOn))((d, c) => d.drop(offs(c)))
      .withColumn(out, col("_incum") + col("_off"))
      .withColumn(s"${out}_total", col("_gtot"))
      .drop("_chunk", "_incum", "_off", "_gtot", "_lo", "_hi")
  }
}
