package graft

import org.apache.spark.sql.SparkSession

/** GraftSparkExtensions: functions injected via spark.sql.extensions
  * are SQL-callable in a session that never touched graft code.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injection makes graft_qdot available in SQL") {
    spark // force the shared session (and its SparkContext) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions exercises the same injection path the
      // spark.sql.extensions static conf uses; the conf itself is read
      // from the SparkContext at context creation, which the shared
      // test context predates
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate() // new session over the existing SparkContext
      val r = s2.sql("SELECT graft_qdot(array(2L, 3L), array(10L, 100L)) AS d")
        .collect().head.getLong(0)
      assert(r == 320L)
      val h = s2.sql(
        "SELECT graft_hamming('0110', '0011') AS h").collect().head.getInt(0)
      assert(h == 2)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("SCHEMA DIFF SQL statement runs the flagship pipeline via the injected parser") {
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // base vs itself: empty report
      val same = s2.sql(
        "SCHEMA DIFF ('/root/testdata/sf0.001', '/root/testdata/sf0.001')")
      assert(same.columns.toSeq == Seq("table_name", "report_list"))
      assert(same.count() == 0)
      // drifted copy (fewer tables on the target side): findings appear,
      // and LANG ko selects the Korean templates
      val drift = java.nio.file.Files.createTempDirectory("graft_sqldiff").toString
      for (t <- Seq("nation", "orders")) {
        val src = java.nio.file.Paths.get(s"/root/testdata/sf0.001/$t.parquet")
        java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$drift/$t.parquet"))
      }
      val rep = s2.sql(s"SCHEMA DIFF ('/root/testdata/sf0.001', '$drift') LANG ko")
        .collect()
      assert(rep.nonEmpty)
      val msgs = rep.flatMap(_.getSeq[String](1))
      assert(msgs.exists(_.contains("데이터베이스에는 없습니다")), msgs.mkString("\n"))
      // ordinary SQL still parses through the delegate
      assert(s2.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("DATA DIFF SQL statement runs the row-diff pipeline via the injected parser") {
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // target = nation with one row dropped and one region key changed
      val drift = java.nio.file.Files.createTempDirectory("graft_datadiff").toString
      s2.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .filter(org.apache.spark.sql.functions.col("n_nationkey") =!= 0)
        .withColumn("n_regionkey",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("n_nationkey") === 1,
            org.apache.spark.sql.functions.lit(99))
            .otherwise(org.apache.spark.sql.functions.col("n_regionkey")))
        .write.parquet(s"$drift/nation.parquet")
      val d = s2.sql(
        s"DATA DIFF ('/root/testdata/sf0.001', '$drift') TABLE nation KEY (n_nationkey)")
        .collect()
      val byKind = d.groupBy(_.getAs[String]("diff_status")).view.mapValues(_.length).toMap
      assert(byKind.get("removed").contains(1), byKind.toString) // key 0 gone
      assert(byKind.get("changed").contains(1), byKind.toString) // key 1 retyped
      assert(!byKind.contains("added"), byKind.toString)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("malformed DIFF statements fail with ParseException, not raw IO/argument errors") {
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // nonexistent path: the footer read fails INSIDE statement parsing
      val e1 = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql("DATA DIFF ('/no/such/dir', '/no/such/dir') TABLE nation KEY (n_nationkey)")
      }
      assert(e1.getMessage.contains("invalid GRAFT DIFF statement"), e1.getMessage)
      // empty KEY list: require() is rethrown as a parse error
      val e2 = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql("DATA DIFF ('/root/testdata/sf0.001', '/root/testdata/sf0.001') TABLE nation KEY ( , )")
      }
      assert(e2.getMessage.contains("at least one column"), e2.getMessage)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("graft_jaccard equals the built-in distinct-count formula; used by LSH verify") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")), // 2/4
      (Seq("a", "a", "b"), Seq("a")), // in-array dups: sets {a,b},{a} -> 1/2
      (Seq.empty[String], Seq.empty[String]), // 0.0 by convention, not 0/0
      (Seq("x"), Seq.empty[String]), // 0/1
      (Seq("ü ü", "ß"), Seq("ß", "ü ü"))) // unicode, order-insensitive -> 1.0
      .toDF("a", "b")
    val got = df.select(
      graft.functions.GraftFunctions.jaccardNative(col("a"), col("b")).as("j"),
      graft.ext.TextPrimitives.jaccard(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
    val d = Seq((1L, "a b c d e"), (2L, "a b c d")).toDF("doc_id", "text")
    val plan = graft.ext.Dedup.minhashLsh(d).queryExecution.executedPlan.toString
    assert(plan.contains("graft_jaccard"), plan)
  }

  test("graft_containment equals the built-in intersect/distinct formula") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")), // inter 2, na 3
      (Seq("a", "a", "b"), Seq("a")), // dups: sets {a,b},{a} -> inter 1, na 2
      (Seq.empty[String], Seq("x")), // inter 0, na 0
      (Seq("x", "y"), Seq.empty[String]), // inter 0, na 2
      (Seq("ü ü", "ß"), Seq("ß", "ü ü"))) // unicode -> inter 2, na 2
      .toDF("a", "b")
    val got = df.select(
      graft.functions.GraftFunctions.containmentNative(col("a"), col("b")).as("st"),
      size(array_intersect(col("a"), col("b"))).as("ref_inter"),
      size(array_distinct(col("a"))).as("ref_na")).collect()
    got.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getInt(0) == r.getInt(1) && st.getInt(1) == r.getInt(2), r.toString)
    }
    // null-safe
    val n = Seq((Option(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
      .select(graft.functions.GraftFunctions.containmentNative(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0))
    // the containment key's plan uses the native expression
    val plan = SparkEntry.queries("dedup_containment")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_containment"), plan)
  }

  test("graft_hamming: exact distance, length surplus counted, null-safe, in codegen") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      ("0000", "0000", 0), ("1111", "0000", 4), ("0101", "0100", 1),
      ("010101", "0101", 2), // surplus bytes count as distance
      ("", "", 0)).toDF("a", "b", "want")
    val got = df.select(
      graft.functions.GraftFunctions.hammingNative(col("a"), col("b")).as("h"),
      col("want")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null-safe
    val n = Seq((Option("01"), Option.empty[String])).toDF("a", "b")
      .select(graft.functions.GraftFunctions.hammingNative(col("a"), col("b")).as("h"))
      .collect().head
    assert(n.isNullAt(0))
    // the simhash verify path uses the native expression
    val d = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val plan = graft.ext.Dedup.simhashNearPairs(d).queryExecution.executedPlan.toString
    assert(plan.contains("graft_hamming"), plan)
  }

  test("graft_rolling_minhash equals the per-window HOF fold, all edges") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa",            // constant: all windows equal
      "short",                 // < k -> -1
      "exactly8",              // == k: single window
      "",                      // empty -> -1
      "tschüß ünïcode ßtring", // non-ASCII code points
      "abc中文def-mixed multibyte content here")
    val df = texts.toDF("text")
    for (k <- Seq(3, 8)) {
      val m = 2147483647L
      val codes = transform(split(col("text"), ""), c => ascii(c))
      val hof = when(size(codes) >= k,
        array_min(transform(sequence(lit(0), size(codes) - k),
          i => aggregate(slice(codes, i + lit(1), lit(k)), lit(0L),
            (acc, c) => (acc * 257L + c) % m)))).otherwise(lit(-1L))
      val rows = df.select(
        call_function("graft_rolling_minhash", col("text"), lit(k)).as("native"),
        hof.as("ref")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getLong(0) == r.getLong(1), s"k=$k text='$t': $r")
      }
    }
    // null-safe
    val n = Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_rolling_minhash", col("text"), lit(8)))
      .collect().head
    assert(n.isNullAt(0))
    // the registry key's plan uses the native expression
    val plan = SparkEntry.queries("text_rolling_fingerprint")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_rolling_minhash"), plan)
    // ... and its generated code actually COMPILES: with fallback
    // disabled a Janino failure throws instead of silently dropping
    // the stage to interpreted execution (the static-forwarder trap:
    // scalac emits no forwarder for a companion method named `eval`)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      SparkEntry.queries("text_rolling_fingerprint")(spark, sf("sf0.001")).collect()
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("error paths: wrong-length sketch and missing as-of columns fail with clear messages") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col}
    graft.functions.GraftFunctions.register(spark)
    // a non-sketch binary into the merge aggregate → explicit require
    val bad = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk")
        .agg(call_function("graft_hll_merge_estimate", col("sk"))).collect()
    }
    assert(bad.getMessage.contains("4096-byte sketch") ||
      Option(bad.getCause).exists(_.getMessage.contains("4096-byte sketch")),
      s"unhelpful error: ${bad.getMessage}")
    // a missing key column in the as-of builder → named-column error
    val left = Seq((1L, 2L)).toDF("id", "ts")
    val miss = intercept[IllegalArgumentException] {
      graft.ext.AsOf.asofJoinNative(left, left, Seq("nope"), "ts")
    }
    assert(miss.getMessage.contains("nope"))
  }

  test("native HLL aggregate: partition-invariant, accurate at all ranges, SQL-callable") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{call_function, col}
    // accuracy sweep incl. the linear-counting small range and dups
    Seq(10, 500, 20000).foreach { n =>
      val ds = (1 to n).flatMap(i => Seq(i.toLong, i.toLong)).toDF("v")
      val est = ds.agg(call_function("graft_hll_distinct", col("v")))
        .collect()(0).getLong(0)
      assert(math.abs(est - n) <= math.max(1L, (n * 0.05).toLong), s"n=$n est=$est")
      // merge correctness: the estimate is a pure function of the input
      // SET — any partitioning produces bit-identical registers
      val est13 = ds.repartition(13).agg(call_function("graft_hll_distinct", col("v")))
        .collect()(0).getLong(0)
      assert(est13 == est, s"partitioning changed the estimate: $est13 != $est")
    }
    // string inputs and the SQL surface
    val sqlEst = spark.sql(
      "SELECT graft_hll_distinct(CAST(id AS STRING)) FROM range(3000)")
      .collect()(0).getLong(0)
    assert(math.abs(sqlEst - 3000) <= 150, s"sql est=$sqlEst")
    // nulls are ignored, empty input estimates zero
    assert(Seq[Option[Long]](None, None).toDF("v")
      .agg(call_function("graft_hll_distinct", col("v")))
      .collect()(0).getLong(0) == 0L)
  }

  test("HLL hash: canonical full-width bytes per type, non-atomic inputs rejected") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{call_function, col}
    // value-equal doubles must hash equal: -0.0 ≡ 0.0
    assert(graft.functions.Hll.hash(java.lang.Double.valueOf(-0.0d)) ==
      graft.functions.Hll.hash(java.lang.Double.valueOf(0.0d)))
    assert(graft.functions.Hll.hash(java.lang.Float.valueOf(-0.0f)) ==
      graft.functions.Hll.hash(java.lang.Float.valueOf(0.0f)))
    // doubles/decimals/binary hash their canonical bytes, not a 32-bit
    // hashCode — estimates over such columns stay in tolerance
    val dEst = (1 to 20000).map(_ * 0.25).toDF("v")
      .agg(call_function("graft_hll_distinct", col("v")))
      .collect()(0).getLong(0)
    assert(math.abs(dEst - 20000) <= 1000, s"double est=$dEst")
    val decEst = spark.sql(
      "SELECT graft_hll_distinct(CAST(id AS DECIMAL(20,2)) / 4) FROM range(20000)")
      .collect()(0).getLong(0)
    assert(math.abs(decEst - 20000) <= 1000, s"decimal est=$decEst")
    val binEst = spark.sql(
      "SELECT graft_hll_distinct(CAST(CAST(id AS STRING) AS BINARY)) FROM range(20000)")
      .collect()(0).getLong(0)
    assert(math.abs(binEst - 20000) <= 1000, s"binary est=$binEst")
    // non-atomic input types fail analysis instead of degrading silently
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hll_distinct(array(id)) FROM range(10)").collect()
    }
    assert(err.getMessage.contains("atomic"), err.getMessage)
  }

  test("HLL sketch rollup: merged fine-grained sketches equal direct estimation exactly") {
    val rows = SparkEntry.queries("hll_sketch_rollup")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: rollup != direct — merge is lossy")
      assert(r.getBoolean(3), s"${r.getString(0)}: estimate outside 5%")
    }
  }

  test("native as-of join: custom operator equals the window composition, plan has AsOfJoin") {
    import spark.implicits._
    // edges: exact-ts tie (must match), no right row for a key, null
    // keys (grouped, like the window's partitionBy), interleaved keys
    val clicks = Seq(
      (1L, Some(10L), 100L), (2L, Some(10L), 200L), (3L, Some(20L), 150L),
      (4L, None, 50L), (5L, Some(30L), 400L))
      .toDF("event_id", "user_id", "ts_us")
    val views = Seq(
      (11L, Some(10L), 100L), (12L, Some(10L), 180L), (13L, Some(40L), 10L),
      (14L, None, 50L), (15L, Some(30L), 500L))
      .toDF("event_id", "user_id", "ts_us")
    val native = graft.ext.AsOf.asofJoinNative(clicks, views, Seq("user_id"), "ts_us")
    val composed = graft.ext.AsOf.asofJoin(clicks, views, Seq("user_id"), "ts_us")
    assert(native.collect().map(_.toSeq).toSet == composed.collect().map(_.toSeq).toSet)
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), s"native path must not plan a window:\n$p")
    // exact-ts tie matched ("known at t"), no-match rows null-padded
    val byId = native.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(byId(1L).contains(11L), "exact-ts view must match")
    assert(byId(5L).isEmpty, "future-only view must not match")
  }

  test("native as-of join: self-join inputs (shared exprIds) work; sf0.001 parity") {
    val dir = sf("sf0.001")
    val native = SparkEntry.queries("asof_join_native")(spark, dir).collect()
    val composed = SparkEntry.queries("asof_join")(spark, dir).collect()
    assert(native.length == composed.length && native.nonEmpty)
    assert(native.map(_.toSeq).toSeq == composed.map(_.toSeq).toSeq)
  }

  test("range-join rule: garbage or non-positive binWidth conf disables the rewrite, never throws") {
    import spark.implicits._
    org.apache.spark.sql.graft.Bridge.addOptimization(spark, graft.plans.RangeJoinRule(spark))
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    def j = pts.join(ivs, pts("p") >= ivs("s") && pts("p") <= ivs("e"))
    Seq("abc", "-5", "0", "").foreach { bad =>
      spark.conf.set("spark.graft.rangeJoin.binWidth", bad)
      try {
        assert(j.collect().length == 1, s"conf='$bad'")
        assert(!j.queryExecution.executedPlan.toString.contains("Generate explode"),
          s"conf='$bad' must not enable the rewrite")
      } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    }
  }

  test("runtime-registered rule (extraOptimizations): auto key equals the manual binned key") {
    val dir = sf("sf0.001")
    val auto = SparkEntry.queries("range_join_rule_auto")(spark, dir).collect()
    val manual = SparkEntry.queries("range_join_binned")(spark, dir).collect()
    assert(auto.map(_.toSeq).toSeq == manual.map(_.toSeq).toSeq && auto.nonEmpty)
    // the conf must not leak out of the key
    assert(spark.conf.getOption("spark.graft.rangeJoin.binWidth").isEmpty)
    // with the rule registered and the conf set, the naive BETWEEN join
    // plans as a binned hash join (the key materializes before returning,
    // so we re-derive the pre-checkpoint plan here)
    org.apache.spark.sql.graft.Bridge.addOptimization(spark, graft.plans.RangeJoinRule(spark))
    spark.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
    try {
      import org.apache.spark.sql.functions._
      val clicks = graft.sources.Tables.load(spark, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val sessions = graft.ext.Events.sessionize(
          graft.sources.Tables.load(spark, dir, "events"))
        .select(col("user_id").as("s_user_id"), col("session_id"), col("start_us"),
          (col("start_us") + col("duration_us")).as("end_us"))
      val p = clicks.join(sessions,
          clicks("user_id") === sessions("s_user_id") &&
            clicks("ts_us") >= sessions("start_us") &&
            clicks("ts_us") <= sessions("end_us"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Generate explode") && !p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("range-join rule: fires on DATE intervals and on LEFT OUTER with a preserved point side") {
    val dir = sf("sf0.001")
    org.apache.spark.sql.graft.Bridge.addOptimization(spark, graft.plans.RangeJoinRule(spark))
    import org.apache.spark.sql.functions._
    // date shape: pure-range month-window join, binWidth in days
    spark.conf.set("spark.graft.rangeJoin.binWidth", "7")
    try {
      val o = graft.sources.Tables.load(spark, dir, "orders")
        .select(to_date(col("o_orderdate")).as("d"))
      val w = o.select(trunc(col("d"), "MM").as("m")).distinct()
        .select(col("m"), date_sub(col("m"), 10).as("w_start"), last_day(col("m")).as("w_end"))
      val p = o.join(w, o("d") >= w("w_start") && o("d") <= w("w_end"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Generate explode") && !p.contains("BroadcastNestedLoopJoin"), p)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    // timestamp + left-outer shape: rewrite fires when the point side is
    // preserved, and unmatched point rows still come out null-padded
    spark.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
    try {
      val df = SparkEntry.queries("range_join_rule_ts_left")(spark, dir)
      val rows = df.collect()
      assert(rows.nonEmpty && rows.exists(_.isNullAt(3)),
        "left outer must emit unmatched clicks with null session_id")
      // distinct event_ids with a null session never also appear matched
      val nullIds = rows.filter(_.isNullAt(3)).map(_.getLong(0)).toSet
      val matchedIds = rows.filterNot(_.isNullAt(3)).map(_.getLong(0)).toSet
      assert(nullIds.intersect(matchedIds).isEmpty)
      // the registry key unsets the conf in its own finally — restore it
      // for the plan-shape assertions below
      spark.conf.set("spark.graft.rangeJoin.binWidth", "3600000000")
      val clicks = graft.sources.Tables.load(spark, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("click_ts"))
      val sessions = graft.ext.Events.sessionize(
          graft.sources.Tables.load(spark, dir, "events"))
        .filter(col("n_events") >= 5)
        .select(col("user_id").as("s_user_id"), col("session_id"),
          timestamp_micros(col("start_us")).as("start_ts"),
          timestamp_micros(col("start_us") + col("duration_us")).as("end_ts"))
      val plan = clicks.join(sessions,
          clicks("user_id") === sessions("s_user_id") &&
            clicks("click_ts") >= sessions("start_ts") &&
            clicks("click_ts") <= sessions("end_ts"),
          "left_outer")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode") && !plan.contains("BroadcastNestedLoopJoin"), plan)
      // the mirror-image shape (preserved INTERVAL side) must NOT be
      // rewritten — bin explosion would duplicate unmatched intervals
      val wrongSide = sessions.join(clicks,
          clicks("user_id") === sessions("s_user_id") &&
            clicks("click_ts") >= sessions("start_ts") &&
            clicks("click_ts") <= sessions("end_ts"),
          "left_outer")
        .queryExecution.executedPlan.toString
      assert(!wrongSide.contains("Generate explode"), wrongSide)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("range-join binning rule: interval theta join becomes a hash join, results identical") {
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      // negatives, an empty interval (s > e), a null bound, varied widths
      val points = Seq.tabulate(400)(i => (i.toLong, (i * 37 - 2000).toLong))
        .toDF("pid", "p")
      val ivals = (Seq.tabulate(50)(i =>
        (i.toLong, Some((i * 211 - 3000).toLong), Some((i * 211 - 3000 + 40 * (i % 7)).toLong))) ++
        Seq((90L, Some(500L), Some(100L)), (91L, None, Some(100L))))
        .toDF("iid", "s", "e")
      def joined = points.join(ivals,
        points("p") >= ivals("s") && points("p") <= ivals("e"))

      val naive = joined.collect().map(_.toSeq).toSet // rule off: BNLJ
      val naivePlan = joined.queryExecution.executedPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)

      s2.conf.set("spark.graft.rangeJoin.binWidth", "100")
      try {
        val binnedPlan = joined.queryExecution.executedPlan.toString
        assert(!binnedPlan.contains("BroadcastNestedLoopJoin") &&
          !binnedPlan.contains("CartesianProduct"), binnedPlan)
        assert(binnedPlan.contains("Generate explode"), binnedPlan)
        assert(joined.collect().map(_.toSeq).toSet == naive,
          "binned rewrite changed the join result")
      } finally s2.conf.unset("spark.graft.rangeJoin.binWidth")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("range-join binning rule: equi keys survive, non-matching shapes left alone") {
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      val points = Seq.tabulate(300)(i => ((i % 5).toLong, i.toLong * 11))
        .toDF("k", "p")
      val ivals = Seq.tabulate(40)(i => ((i % 5).toLong, i.toLong * 80, i.toLong * 80 + 120))
        .toDF("k", "s", "e")
      def joined = points.join(ivals,
        points("k") === ivals("k") && points("p") >= ivals("s") && points("p") <= ivals("e"))
      val naive = joined.collect().map(_.toSeq).toSet
      s2.conf.set("spark.graft.rangeJoin.binWidth", "128")
      try {
        assert(joined.collect().map(_.toSeq).toSet == naive)
        val p = joined.queryExecution.executedPlan.toString
        // the pre-existing equi key k must still be a join key next to
        // the bin — both appear in the hash-join key list
        assert(p.contains("Generate explode"), p)
        assert(!p.contains("BroadcastNestedLoopJoin"), p)
        // a left outer preserving the POINT side is rewritten (points are
        // never exploded, so preserved rows can't duplicate) and stays
        // result-identical to the nested-loop plan
        val outer = points.join(ivals,
          points("p") >= ivals("s") && points("p") <= ivals("e"), "left")
        assert(outer.queryExecution.executedPlan.toString
          .contains("Generate explode"))
        val outerRows = outer.collect().map(_.toSeq).toSet
        s2.conf.unset("spark.graft.rangeJoin.binWidth")
        val outerNaive = points.join(ivals,
            points("p") >= ivals("s") && points("p") <= ivals("e"), "left")
          .collect().map(_.toSeq).toSet
        s2.conf.set("spark.graft.rangeJoin.binWidth", "128")
        assert(outerRows == outerNaive)
        // a left outer preserving the INTERVAL side must NOT be rewritten
        // (bin explosion would emit an unmatched interval once per bin)
        val outerWrong = ivals.join(points,
          points("p") >= ivals("s") && points("p") <= ivals("e"), "left")
        assert(!outerWrong.queryExecution.executedPlan.toString
          .contains("Generate explode"))
        // non-long range columns are left alone
        val strPts = Seq(("a", "m")).toDF("id", "v")
        val strIv = Seq(("x", "a", "z")).toDF("iid", "lo", "hi")
        val sJoin = strPts.join(strIv, strPts("v") >= strIv("lo") && strPts("v") <= strIv("hi"))
        assert(sJoin.queryExecution.executedPlan.toString
          .contains("BroadcastNestedLoopJoin"))
      } finally s2.conf.unset("spark.graft.rangeJoin.binWidth")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
