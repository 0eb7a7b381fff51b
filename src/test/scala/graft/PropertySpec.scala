package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.diff._
import graft.schema._

/** Property-based invariants of the diff engine over random snapshot
  * pairs (SURVEY.md §5.3), driven by seeded ScalaCheck generators so
  * runs are reproducible:
  *  - diff(s, s) = ∅
  *  - every reported table exists in the base snapshot
  *  - directionality: target-only additions are never reported
  *  - determinism: repeated runs produce identical ordered reports
  */
class PropertySpec extends SparkSpec {

  private val name = Gen.oneOf("t1", "t2", "t3", "t4", "t5")
  private val colName = Gen.oneOf("a", "b", "c", "d")
  private val dtype = Gen.oneOf("int", "bigint", "text", "varchar(10)")

  private val genColumns: Gen[List[ColumnMeta]] =
    Gen.listOfN(6, for {
      t <- name; c <- colName; dt <- dtype
      nullable <- Gen.oneOf(true, false)
      auto <- Gen.oneOf(true, false)
    } yield ColumnMeta(t, c, 1, dt, "", nullable, "", auto))
      .map(_.groupBy(c => (c.table_name, c.column_name)).values.map(_.head)
        .toList.sortBy(c => (c.table_name, c.column_name))
        .zipWithIndex.map { case (c, i) => c.copy(ordinal = i + 1) })

  private def sample(seed: Long): List[ColumnMeta] =
    genColumns(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private def snapshot(cols: List[ColumnMeta]): SchemaSnapshot =
    Snapshot.fromMeta(spark,
      cols.map(_.table_name).distinct.sorted.map(TableMeta(_, "")), cols)

  private def messages(b: SchemaSnapshot, t: SchemaSnapshot): Seq[String] =
    Diff.diff(b, t)
      .orderBy("table_name", "kind_rank", "object_ordinal", "check_rank", "message")
      .select("message").collect().map(_.getString(0)).toSeq

  test("diff(s, s) is empty for random snapshots") {
    (1L to 12L).foreach { seed =>
      val s = snapshot(sample(seed))
      assert(Diff.diff(s, s).isEmpty, s"seed=$seed")
    }
  }

  test("every reported table exists in base; target-only additions never reported") {
    (1L to 12L).foreach { seed =>
      val a = sample(seed)
      val b = sample(seed + 1000)
      val reportedTables = Diff.diff(snapshot(a), snapshot(b))
        .select("table_name").distinct().collect().map(_.getString(0)).toSet
      val baseTables = a.map(_.table_name).toSet
      val targetOnly = b.map(_.table_name).toSet -- baseTables
      assert(reportedTables.subsetOf(baseTables), s"seed=$seed: reported beyond base")
      assert(reportedTables.intersect(targetOnly).isEmpty, s"seed=$seed: target-only reported")
    }
  }

  test("diff output is deterministic across repeated evaluation") {
    (1L to 6L).foreach { seed =>
      val base = snapshot(sample(seed))
      val target = snapshot(sample(seed + 500))
      assert(messages(base, target) == messages(base, target), s"seed=$seed")
    }
  }

  // --- full-entity snapshots: columns + indexes + FKs -----------------

  private val genIndexes: Gen[List[IndexMeta]] =
    Gen.listOfN(4, for {
      t <- name; i <- Gen.oneOf("ix1", "ix2", "ix3")
      cols <- Gen.someOf("a", "b", "c").map(_.toList)
      uniq <- Gen.oneOf(true, false)
    } yield IndexMeta(t, i, 1, cols, "", uniq))
      .map(_.groupBy(x => (x.table_name, x.index_name)).values.map(_.head).toList)

  private val genFks: Gen[List[ForeignKeyMeta]] =
    Gen.listOfN(3, for {
      t <- name; f <- Gen.oneOf("fk1", "fk2")
      rt <- name; rc <- colName
    } yield ForeignKeyMeta(t, f, 1, "a", rt, rc))
      .map(_.groupBy(x => (x.table_name, x.constraint_name)).values.map(_.head).toList)

  private def fullSnapshot(seed: Long): SchemaSnapshot = {
    val cols = sample(seed)
    val idx = genIndexes(Gen.Parameters.default, Seed(seed * 31)).getOrElse(Nil)
      .filter(i => cols.exists(_.table_name == i.table_name))
    val fks = genFks(Gen.Parameters.default, Seed(seed * 37)).getOrElse(Nil)
      .filter(f => cols.exists(_.table_name == f.table_name))
    Snapshot.fromMeta(spark,
      cols.map(_.table_name).distinct.sorted.map(TableMeta(_, "")), cols, idx, fks)
  }

  test("full-entity invariants: self-diff empty, direction honored, deterministic") {
    (1L to 8L).foreach { seed =>
      val s1 = fullSnapshot(seed)
      val s2 = fullSnapshot(seed + 777)
      assert(Diff.diff(s1, s1).isEmpty, s"seed=$seed self-diff not empty")
      val m1 = messages(s1, s2)
      assert(m1 == messages(s1, s2), s"seed=$seed nondeterministic")
      // every message names an object from the base side
      val baseTables = s1.tables.collect().map(_.getString(0)).toSet
      val reported = Diff.diff(s1, s2).select("table_name")
        .distinct().collect().map(_.getString(0)).toSet
      assert(reported.subsetOf(baseTables), s"seed=$seed reported beyond base")
    }
  }

  test("salted two-phase aggregation equals the plain aggregate on random skewed data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val genRows: Gen[List[(Long, Long)]] = Gen.listOfN(400, for {
      k <- Gen.frequency(8 -> Gen.const(1L), 2 -> Gen.choose(2L, 9L)) // hot key 1
      v <- Gen.choose(-1000L, 1000L)
    } yield (k, v))
    (1L to 5L).foreach { seed =>
      val rows = genRows(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val df = rows.toDF("k", "v")
      val salted = df
        .withColumn("salt", pmod(xxhash64(col("v"), col("k")), lit(7)))
        .groupBy(col("k"), col("salt")).agg(sum("v").as("s"), count(lit(1)).as("c"))
        .groupBy(col("k")).agg(sum("s").as("sum_v"), sum("c").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val plain = df.groupBy(col("k")).agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted == plain, s"seed=$seed")
    }
  }

  test("bloom-pruned semi-join equals the plain semi-join on random key sets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val genKeys: Gen[(List[Long], List[Long])] = for {
      big <- Gen.listOfN(300, Gen.choose(0L, 500L))
      small <- Gen.listOfN(40, Gen.choose(0L, 500L))
    } yield (big, small)
    (1L to 5L).foreach { seed =>
      val (bigKeys, smallKeys) = genKeys(Gen.Parameters.default, Seed(seed))
        .getOrElse((Nil, Nil))
      val big = bigKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
      val small = smallKeys.toDF("sk")
      val plain = big.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val bloomed = graft.ext.Scale.bloomPrunedSemiJoin(big, small, "k", "sk",
        expectedItems = 64L, fpp = 0.2) // high fpp: exactness must not depend on it
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(bloomed == plain, s"seed=$seed")
    }
  }

  test("PII redaction is idempotent and leaves no matches behind") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ext.TextAnalysis
    val genDoc: Gen[String] = for {
      pre <- Gen.alphaLowerStr.map(_.take(12))
      user <- Gen.alphaNumStr.map(s => if (s.isEmpty) "u1" else s.take(8))
      digits <- Gen.listOfN(8, Gen.choose(0, 9)).map(_.mkString)
      post <- Gen.alphaLowerStr.map(_.take(12))
    } yield s"$pre $user@mail-host.com call +1-$digits $post"
    val docs = (1L to 30L).flatMap(seed =>
      genDoc(Gen.Parameters.default, Seed(seed))).toDF("text")
    val once = docs.select(TextAnalysis.redactPii(col("text")).as("r"))
    val twice = once.select(TextAnalysis.redactPii(col("r")).as("r"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
    val leftover = once.where(
      col("r").rlike(TextAnalysis.EmailRe) || col("r").rlike(TextAnalysis.PhoneRe))
    assert(leftover.isEmpty, s"unredacted PII: ${leftover.collect().mkString(";")}")
  }

  test("SCD-2 intervals chain per key, and exactly the latest row is current") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val genRows: Gen[List[(Long, Long, String)]] = Gen.listOfN(120, for {
      k <- Gen.choose(1L, 12L)
      day <- Gen.choose(0L, 400L)
      st <- Gen.oneOf("A", "B", "C")
    } yield (k, day, st))
    (1L to 5L).foreach { seed =>
      val rows = genRows(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
        .zipWithIndex.map { case ((k, day, st), i) => (k, i.toLong, day, st) }
      val df = rows.toDF("key", "id", "day", "state")
        .select(col("key"), col("id"),
          expr("timestamp '2020-01-01 00:00:00' + make_interval(0, 0, 0, day)").as("ts"),
          col("state"))
      val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("id"))
      val scd = df.withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(col("key"), col("id"), col("ts").as("valid_from"),
          col("next_ts").as("valid_to"), col("next_ts").isNull.as("is_current"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      // exactly one current row per key; it is the (ts, id)-max row
      scd.groupBy(_._1).foreach { case (k, rs) =>
        assert(rs.count(_._5) == 1, s"seed=$seed key=$k current-count")
        val latest = rs.maxBy(r => (r._3.getTime, r._2))
        assert(latest._5, s"seed=$seed key=$k latest not current")
        // intervals chain: each non-current row's valid_to appears as a
        // valid_from in the same key, and intervals never invert
        rs.filterNot(_._5).foreach { r =>
          assert(!r._4.get.before(r._3), s"seed=$seed inverted interval")
          assert(rs.exists(o => o._3 == r._4.get),
            s"seed=$seed key=$k broken chain at ${r._4.get}")
        }
      }
    }
  }

  test("merge-upsert output is exactly base ∪ updates with update precedence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val genKeys: Gen[(Set[Long], Set[Long])] = for {
      b <- Gen.listOf(Gen.choose(1L, 60L)).map(_.toSet)
      u <- Gen.listOf(Gen.choose(1L, 60L)).map(_.toSet)
    } yield (b, u)
    (1L to 5L).foreach { seed =>
      val (bk, uk) = genKeys(Gen.Parameters.default, Seed(seed))
        .getOrElse((Set.empty[Long], Set.empty[Long]))
      val base = bk.toSeq.sorted.toDF("b_key")
        .select(col("b_key"), (col("b_key") * 10).as("b_price"))
      val updates = uk.toSeq.sorted.toDF("u_key")
        .select(col("u_key"), (col("u_key") * 100).as("u_price"))
      val merged = base.join(updates, col("b_key") === col("u_key"), "full_outer")
        .select(coalesce(col("b_key"), col("u_key")).as("key"),
          coalesce(col("u_price"), col("b_price")).as("price"),
          when(col("b_key").isNull, "insert")
            .when(col("u_key").isNull, "keep").otherwise("update").as("action"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(merged.map(_._1).toSet == (bk ++ uk), s"seed=$seed keys")
      merged.foreach { case (k, p, a) =>
        val want = if (uk(k)) ("u", k * 100) else ("b", k * 10)
        assert(p == want._2, s"seed=$seed key=$k price")
        val wantAction =
          if (bk(k) && uk(k)) "update" else if (uk(k)) "insert" else "keep"
        assert(a == wantAction, s"seed=$seed key=$k action")
      }
    }
  }

  test("histogram median equals the directly computed middle elements on random data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val genVals: Gen[List[(String, Long)]] = Gen.listOfN(300, for {
      g <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(1L, 40L)
    } yield (g, v))
    (1L to 5L).foreach { seed =>
      val rows = genVals(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      val got = rows.toDF("g", "qty")
        .groupBy(col("g"), col("qty")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("qty"))))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
        .withColumn("p1", expr("(n + 1) div 2"))
        .withColumn("p2", expr("n div 2 + 1"))
        .groupBy(col("g"))
        .agg((sum(when(col("cum") - col("c") < col("p1") && col("p1") <= col("cum"),
          col("qty")).otherwise(0L)) +
          sum(when(col("cum") - col("c") < col("p2") && col("p2") <= col("cum"),
            col("qty")).otherwise(0L))).as("median_x2"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        val s = vs.map(_._2).sorted
        g -> (s((s.size - 1) / 2) + s(s.size / 2))
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("grouped exact percentiles: ordered, and each is an element of its group") {
    val rows = SparkEntry.queries("exact_percentiles_grouped")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p90) = (r.getAs[Long]("p25"), r.getAs[Long]("p50"), r.getAs[Long]("p90"))
      assert(p25 <= p50 && p50 <= p90, r.toString)
      assert(p25 >= 1 && p90 <= 50, r.toString) // quantity domain
    }
  }

  test("markov transitions: per-source probabilities account for all mass") {
    val rows = SparkEntry.queries("events_markov_transitions")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev")).foreach { case (prev, rs) =>
      val totalN = rs.map(_.getAs[Long]("n")).sum
      rs.foreach { r =>
        val want = r.getAs[Long]("n") * 1000000L / totalN
        assert(r.getAs[Long]("p_ppm") == want, s"$prev: $r")
      }
      // floor-division remainders: the ppm sum is within one ulp per row
      val s = rs.map(_.getAs[Long]("p_ppm")).sum
      assert(s > 1000000L - rs.size && s <= 1000000L, s"$prev sums to $s")
    }
  }

  test("containment: every planted prefix truncation scores exactly 1.0") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sf("sf0.001")).collect()
    val planted = rows.filter(r =>
      r.getAs[Long]("a_id") >= 1000000L &&
        r.getAs[Long]("a_id") - 1000000L == r.getAs[Long]("b_id"))
    assert(planted.nonEmpty)
    // a prefix truncation's shingles are a subset of the original's
    planted.foreach(r =>
      assert(r.getAs[Long]("containment_ppm") == 1000000L, r.toString))
    // and every planted truncation large enough to have shingles is found
    val found = planted.map(_.getAs[Long]("a_id")).toSet
    val expected = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")) >= 6)
      .collect().map(_.getAs[Long]("doc_id") + 1000000L).toSet
    assert(expected.subsetOf(found), s"missing: ${expected -- found}")
  }

  test("chunk windows: every word covered, overlaps consistent, reassembly exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val docs = (1L to 30L).map { i =>
      val n = 1 + rnd.nextInt(90)
      (i, (1 to n).map(j => s"d${i}w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val (w, s) = (32, 16)
    val chunks = graft.ext.TrainPrep.chunkWindows(docs, w, s).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.split(" ").toSeq
      val got = chunks(id)
      // stride-S prefixes: chunk i starts at word i*S and has <= W words
      got.zipWithIndex.foreach { case (c, i) =>
        val expectWords = words.slice(i * s, i * s + w)
        assert(c.split(" ").toSeq == expectWords, s"doc $id chunk $i")
      }
      // coverage: the last chunk reaches the end of the document
      assert(got.last.split(" ").last == words.last, s"doc $id tail")
      // chunk count formula
      val expected = if (words.length <= w) 1 else 1 + (words.length - w + s - 1) / s
      assert(got.length == expected, s"doc $id count")
    }
  }

  test("mixture weights: ppm columns bounded, ordering preserved, √n compression") {
    val r = SparkEntry.queries("mixture_weights")(spark, sf("sf0.001")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // integer-DIV normalization can only undershoot ppm totals
    assert(r.map(_._3).sum <= 1000000L && r.map(_._4).sum <= 1000000L)
    assert(r.map(_._3).sum >= 1000000L - r.length && r.map(_._4).sum >= 1000000L - r.length)
    // √ compression: every slice's weight share moves TOWARD uniform
    val sorted = r.sortBy(_._2)
    sorted.foreach { case (_, _, raw, wppm) =>
      val uniform = 1000000L / r.length
      assert((wppm - uniform).abs <= (raw - uniform).abs + 1,
        s"temperature must compress toward uniform: raw=$raw w=$wppm")
    }
    // monotone: more docs never means a smaller weight
    sorted.sliding(2).foreach {
      case Array((_, n1, _, w1), (_, n2, _, w2)) =>
        assert(n1 > n2 || w1 <= w2 + 1, s"monotonicity: ($n1,$w1) vs ($n2,$w2)")
      case _ => ()
    }
  }

  test("property: native as-of join equals the window composition on random datasets") {
    import spark.implicits._
    val keyGen = Gen.chooseNum(0L, 6L)
    val tsGen = Gen.chooseNum(-1000L, 1000L)
    def side(seed: Long, n: Int, idBase: Long) = {
      val g = Gen.listOfN(n, Gen.zip(keyGen, tsGen))
      val rows = g(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen"))
        // (key, ts) must be unique per side — the documented determinism
        // contract of BOTH implementations
        .distinct.zipWithIndex.map { case ((k, ts), i) => (idBase + i, k, ts) }
      rows.toDF("id", "k", "ts")
    }
    (1L to 8L).foreach { seed =>
      val left = side(seed, 60, 1000L)
      val right = side(seed + 100, 40, 2000L)
      val native = graft.ext.AsOf.asofJoinNative(left, right, Seq("k"), "ts")
        .collect().map(_.toSeq).toSet
      val composed = graft.ext.AsOf.asofJoin(left, right, Seq("k"), "ts")
        .collect().map(_.toSeq).toSet
      assert(native == composed, s"seed=$seed")
    }
  }

  test("native as-of join: mismatched input partitionings still co-align under AQE") {
    import spark.implicits._
    // wildly different child layouts force EnsureRequirements + AQE
    // coalescing to agree on ONE partitioning for both sides — the
    // contract AsOfJoinExec's zipPartitions merge depends on
    val left = (1L to 500L).map(i => (i, i % 11, i * 3)).toDF("id", "k", "ts")
      .repartition(37)
    val right = (1L to 200L).map(i => (1000L + i, i % 11, i * 7)).toDF("id", "k", "ts")
      .repartition(1)
    val native = graft.ext.AsOf.asofJoinNative(left, right, Seq("k"), "ts")
      .collect().map(_.toSeq).toSet
    val composed = graft.ext.AsOf.asofJoin(left, right, Seq("k"), "ts")
      .collect().map(_.toSeq).toSet
    assert(native == composed && native.size == 500)
  }

  test("native as-of join: a child pre-partitioned on a strict key SUBSET cannot mis-join") {
    import spark.implicits._
    // Left arrives hash-partitioned on k1 only, right on (k1,k2):
    // subset clustering would SATISFY a plain ClusteredDistribution on
    // both sides while the partition indexes of equal (k1,k2) keys
    // disagree — zipPartitions would then merge rows of different
    // partitions and drop/misattribute matches. The exec requires
    // exact full-key clustering (requireAllClusterKeys), so
    // EnsureRequirements must re-exchange and the result stays
    // oracle-equal to the window composition.
    val left = (1L to 400L).map(i => (i, i % 7, i % 5, i * 3)).toDF("id", "k1", "k2", "ts")
      .repartition(8, $"k1")
    val right = (1L to 300L).map(i => (2000L + i, i % 7, i % 5, i * 5)).toDF("id", "k1", "k2", "ts")
      .repartition(16, $"k1", $"k2")
    val native = graft.ext.AsOf.asofJoinNative(left, right, Seq("k1", "k2"), "ts")
      .collect().map(_.toSeq).toSet
    val composed = graft.ext.AsOf.asofJoin(left, right, Seq("k1", "k2"), "ts")
      .collect().map(_.toSeq).toSet
    assert(native == composed && native.size == 400)
    // and the reverse subset assignment
    val native2 = graft.ext.AsOf.asofJoinNative(
      left.repartition(16, $"k1", $"k2"), right.repartition(8, $"k2"), Seq("k1", "k2"), "ts")
      .collect().map(_.toSeq).toSet
    assert(native2 == composed)
  }

  test("property: range-join binning rule preserves join results for random intervals") {
    spark // force shared session before building the extensions session
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import s2.implicits._
      val vGen = Gen.chooseNum(-500L, 500L)
      (1L to 6L).foreach { seed =>
        val pts = Gen.listOfN(80, vGen)(Gen.Parameters.default, Seed(seed))
          .getOrElse(sys.error("gen")).zipWithIndex
          .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
        val ivs = Gen.listOfN(30, Gen.zip(vGen, Gen.chooseNum(-50L, 200L)))(
            Gen.Parameters.default, Seed(seed + 7))
          .getOrElse(sys.error("gen")).zipWithIndex
          // negative lengths produce EMPTY intervals on purpose
          .map { case ((s0, len), i) => (i.toLong, s0, s0 + len) }
          .toDF("iid", "s", "e")
        def j = pts.join(ivs, pts("p") >= ivs("s") && pts("p") <= ivs("e"))
        val naive = j.collect().map(_.toSeq).toSet
        // width 1 (degenerate), small, and large-vs-domain widths
        Seq(1L, 37L, 5000L).foreach { w =>
          s2.conf.set("spark.graft.rangeJoin.binWidth", w.toString)
          try assert(j.collect().map(_.toSeq).toSet == naive, s"seed=$seed w=$w")
          finally s2.conf.unset("spark.graft.rangeJoin.binWidth")
        }
      }
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("kNN graph ranks are a permutation prefix: k rows per vector, ranks 1..k, no self") {
    val rows = SparkEntry.queries("knn_graph_blocked")(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    byQ.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1 to 3).toSeq)
      assert(g.map(_._2).distinct.length == 3)
    }
    assert(rows.forall { case (q, n, _) => q != n })
  }
}
