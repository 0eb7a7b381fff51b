package graft

import org.apache.spark.sql.functions._

import graft.ext.Scale

/** Scale utilities: salting preserves join/agg semantics; bucketed
  * tables join without a shuffle.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val big = (1 to 1000).map(i => (if (i % 2 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "v") // heavy skew on key 1
    val small = Seq((1L, "one"), (3L, "three"), (5L, "five")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Scale.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("bloom-pruned semi-join is exactly the plain semi-join") {
    val big = (1L to 5000L).map(i => (i, s"row$i")).toDF("k", "v")
    val small = (1L to 5000L).filter(_ % 37 == 0).map(i => (i, "x")).toDF("sk", "x")
    val plain = big.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    val bloomed = Scale.bloomPrunedSemiJoin(big, small, "k", "sk",
      expectedItems = 1000L, fpp = 0.05)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bloomed == plain && plain.size == 5000 / 37)
    // the probe runs in generated code over the deserialized filter
    // (range input: a LocalRelation would be filter-folded by the
    // optimizer and hide the probe; PlanSpec asserts the parquet shape)
    val bigPhysical = spark.range(1, 5001).toDF("k")
    val plan = Scale.bloomPrunedSemiJoin(bigPhysical, small, "k", "sk", 1000L, 0.05)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"), plan)
  }

  test("range-clustered layout writes disjoint per-file ranges, pushdown intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toFile
    val df = graft.sources.Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Scale.writeRangeClustered(df, dir.getPath, "o_totalprice", partitions = 4)
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2, "expected multiple range files")
    // range partitioning ⇒ per-file [min,max] spans are disjoint
    // (up to shared boundary values) — the property row-group skipping
    // and file-level stat pruning rely on
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min("o_totalprice"), max("o_totalprice")).collect().head
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $aMax > $bMin")
      case _ =>
    }
    // the range predicate still reaches the scan as a pushed filter
    val plan = spark.read.parquet(dir.getPath)
      .where(col("o_totalprice") > 100000.0 && col("o_totalprice") < 120000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"), plan)
  }

  test("z-ordered layout bounds both dimensions per file") {
    import graft.functions.ZOrderInterleave.interleave
    // known Morton values: a on even bits, b on odd
    assert(interleave(0L, 0L) == 0L && interleave(1L, 0L) == 1L)
    assert(interleave(0L, 1L) == 2L && interleave(3L, 5L) == 39L)
    // inputs are masked to 31 bits so z never sets the SIGN bit — a
    // signed sort by z must equal the unsigned one
    assert(interleave(0xFFFFFFFFL, 0L) == 0x1555555555555555L)
    assert(interleave(0xFFFFFFFFL, 0xFFFFFFFFL) == 0x3FFFFFFFFFFFFFFFL)
    assert(interleave(0xFFFFFFFFL, 0xFFFFFFFFL) > 0L)

    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    val df = graft.sources.Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Scale.writeZOrdered(df, dir.getPath, "o_custkey", "o_totalprice", partitions = 4)
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 3, s"expected >=3 z-range files, got ${files.length}")
    // a query box over the lowest quarter of BOTH dimensions must not
    // touch every file — the property a single-column sort cannot give
    // for the second dimension
    val s = df.agg(min("o_custkey"), max("o_custkey"),
      min("o_totalprice"), max("o_totalprice")).collect().head
    val cCut = s.getLong(0) + (s.getLong(1) - s.getLong(0)) / 4
    val pCut = s.getDouble(2) + (s.getDouble(3) - s.getDouble(2)) / 4
    val box = col("o_custkey") <= cCut && col("o_totalprice") <= pCut
    val total = df.where(box).count()
    assert(total > 0, "query box must match some rows")
    val hit = files.count(f => spark.read.parquet(f.getPath).where(box).count() > 0)
    assert(hit < files.length,
      s"z-order should confine the box to a file subset: $hit/${files.length}")
  }

  test("z-order degenerate inputs: constant column and empty frame still write") {
    val dirs = (1 to 2).map(_ => java.nio.file.Files.createTempDirectory("graft_zdeg").toFile)
    // constant column: width_bucket would be NULL (min==max); the
    // coalesce guard pins it to bucket 0 instead of nulling every z
    val const = spark.range(100).toDF("k").withColumn("c", lit(5L))
    Scale.writeZOrdered(const, dirs(0).getPath, "c", "k", partitions = 4)
    assert(spark.read.parquet(dirs(0).getPath).count() == 100)
    // empty frame: null stats -> plain write, no NPE
    val empty = spark.range(0).toDF("k").withColumn("c", lit(5L))
    Scale.writeZOrdered(empty, dirs(1).getPath, "c", "k", partitions = 4)
    assert(spark.read.parquet(dirs(1).getPath).count() == 0)
  }

  test("salted aggregation matches plain aggregation") {
    val df = (1 to 999).map(i => (if (i % 3 == 0) 7L else i.toLong, i.toLong))
      .toDF("k", "x")
    val plain = df.groupBy("k").agg(sum("x").as("x"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val salted = Scale.saltedSumAgg(df, "k", "x", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("widen raises narrow inputs to cluster width, no-ops on wide scans, forces no plan") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
      .coalesce(1)
    assert(Scale.widen(narrow).rdd.getNumPartitions == target)
    // a single-file scan is narrow: it must be widened — decided from
    // the FileIndex alone, never by forcing a physical plan (df.rdd)
    val dir = java.nio.file.Files.createTempDirectory("widen").toString
    (1 to 100).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/one")
    val narrowScan = spark.read.parquet(s"$dir/one")
    assert(Scale.widen(narrowScan).rdd.getNumPartitions == target)
    // a scan with more files than cores is already wide (per-file open
    // cost makes many small files a wide scan, as FilePartition packs
    // them): no repartition added
    (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
      .repartition(target * 2).write.mode("overwrite").parquet(s"$dir/many")
    val wideScan = spark.read.parquet(s"$dir/many")
    assert(Scale.widen(wideScan).queryExecution.logical eq wideScan.queryExecution.logical)
    // caller-supplied width always wins, any lineage
    val wide = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
      .repartition(target * 2)
    assert(Scale.widen(wide, inputPartitions = Some(target * 2))
      .queryExecution.logical eq wide.queryExecution.logical)
    // a derived lineage (not a pure file scan) is UNKNOWN width, not
    // narrow: the probe falls back to the exact partition count, so an
    // already-wide shuffled frame is left alone — never down-scaled
    assert(Scale.widen(wide).queryExecution.logical eq wide.queryExecution.logical)
    // ... and a file scan joined with an in-memory dim (mixed leaves)
    // takes the same exact-probe path without repartitioning when wide
    val dim = (1 to 5).map(i => (i.toLong, s"t$i")).toDF("doc_id", "tag")
    val mixedWide = spark.read.parquet(s"$dir/one").join(dim, "doc_id")
      .repartition(target * 2)
    assert(Scale.widen(mixedWide).rdd.getNumPartitions == target * 2)
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // one hot key (~90% of the left side) against a uniform right side;
    // thresholds lowered so the test-sized data crosses them. AQE is
    // the engine's first line against join skew (SCALING.md) — this
    // pins that the claim actually fires, not just that it's configured.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val left = spark.range(200000)
        .select((when(col("id") % 10 === 0, col("id")).otherwise(0L)).as("k"),
          concat(lit("padpadpadpadpadpadpadpad-"), col("id")).as("payload"))
      val right = spark.range(0, 200000, 7)
        .select(col("id").as("k"), lit("r").as("rv"))
      val joined = left.join(right, "k")
      joined.collect() // executes THIS plan (count() would plan a new one)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed tables join with no exchange") {
    spark.sql("DROP TABLE IF EXISTS g_bucket_a")
    spark.sql("DROP TABLE IF EXISTS g_bucket_b")
    // in-memory catalog: warehouse dirs outlive the test JVM; DROP in a
    // fresh session is a no-op on them -> LOCATION_ALREADY_EXISTS
    Seq("g_bucket_a", "g_bucket_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) { Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete() }
    }
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "g_bucket_a", "k", buckets = 4)
    Scale.writeBucketed(b, "g_bucket_b", "k", buckets = 4)
    // force a non-broadcast join so the assertion sees the shuffle (or
    // its absence) rather than a BroadcastExchange
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_bucket_a").join(spark.table("g_bucket_b"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("chunkedCumSum equals the single-task window cumsum, all edge shapes") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // deterministic pseudo-random rows: multiple groups, heavy order
    // ties, negative values, one single-row group, one constant-order
    // group (degenerate _lo == _hi bucket)
    val rows = (1 to 2000).map { i =>
      val g = s"g${i % 3}"
      val ord = ((i * 2654435761L) % 97) / 3 // many ties
      val v = ((i * 40503L) % 41) - 20       // negative values too
      (g, ord, v)
    } ++ Seq(("solo", 5L, 7L), ("const", 1L, 2L), ("const", 1L, 3L), ("const", 1L, 4L))
    val df = (rows.map { case (g, o, v) => (Option(g), o, v) } ++
      // NULL group: its own partition in the window formulation — the
      // chunked form must not drop it through its inner joins
      Seq((None, 1L, 5L), (None, 2L, 6L), (None, 9L, 1L)))
      .toDF("grp", "ord", "v")
      // collapse ties first: cumsum over a histogram-like frame (one
      // row per (grp, ord)) is the library function's contract
      .groupBy("grp", "ord").agg(sum("v").as("v"))
    val naive = df
      .withColumn("cum", sum(col("v")).over(Window.partitionBy("grp").orderBy("ord")))
      .withColumn("cum_total", sum(col("v")).over(Window.partitionBy("grp")))
      .select("grp", "ord", "v", "cum", "cum_total")
    for (chunks <- Seq(1, 7, 64)) {
      val fast = graft.ext.Scale.chunkedCumSum(df, Seq("grp"), "ord", "v", "cum", chunks)
        .select("grp", "ord", "v", "cum", "cum_total")
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"chunkedCumSum(chunks=$chunks) diverges from the window cumsum")
    }
  }

  test("chunkedCumSum parallelizes: inner window partitions by (group, chunk)") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("g", i.toLong, 1L)).toDF("grp", "ord", "v")
    val out = graft.ext.Scale.chunkedCumSum(df, Seq("grp"), "ord", "v", "cum", 16)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("_chunk"),
      s"inner cumsum window must partition by the chunk column:\n$plan")
  }
}
