package graft

import org.apache.spark.sql.functions._

/** Round-16 optimization: the native vector-quantization kernels
  * ([[graft.functions.VecQuant]]) must be BIT-IDENTICAL to the
  * higher-order-function forms they replaced — each test evaluates the
  * old HOF expression and the native one over the same rows and
  * asserts equality, plus hand-pinned tie cases for the argmin
  * expressions (the part a differential test could miss if both sides
  * drifted together).
  */
class VecQuantSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val vecs = Seq(
    (1L, Seq(3L, -4L, 5L, 0L)),
    (2L, Seq(-1000000L, 999999L, 7L, -7L)),
    (3L, Seq(0L, 0L, 0L, 0L)),
    (4L, Seq(987654321L, 2L, -3L, 4L))).toDF("vec_id", "q")

  test("graft_qdist2 ≡ aggregate(zip_with((x-y)²)) on every row") {
    // in-contract magnitudes only: under ANSI mode (Spark 4 default)
    // the HOF form THROWS on a long overflow while the native loop
    // wraps — divergent only on values the 1e-3/1e-6 quantization
    // grids can never produce
    val other = typedLit(Seq(5L, -2L, 123456789L, 9L))
    val rows = vecs.select(
      call_function("graft_qdist2", col("q"), other).as("native"),
      expr("aggregate(zip_with(q, array(5L, -2L, 123456789L, 9L), " +
        "(x, y) -> (x - y) * (x - y)), " +
        "cast(0 as bigint), (acc, v) -> acc + v)").as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("graft_qsub ≡ zip_with(x - y), zip semantics on unequal lengths") {
    val other = typedLit(Seq(10L, 20L, 30L))
    val rows = vecs.select(
      call_function("graft_qsub", col("q"), other).as("native"),
      expr("zip_with(slice(q, 1, 3), array(10L, 20L, 30L), (x, y) -> x - y)")
        .as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("graft_qrotate ≡ the n·(q·v) − center column formula, raw and divided") {
    val comps = Seq(Seq(2L, 0L, -1L, 3L), Seq(-5L, 1L, 1L, 1L))
    val centers = Seq(7L, -13L)
    val n = 37L
    // raw numerators (divisor 0)
    val raw = vecs.select(col("q"),
      call_function("graft_qrotate", col("q"), typedLit(comps),
        typedLit(centers), lit(n), typedLit(Seq(0L, 0L))).as("r"))
    raw.collect().foreach { r =>
      val q = r.getSeq[Long](0)
      val out = r.getSeq[Long](1)
      comps.zip(centers).zipWithIndex.foreach { case ((v, c), i) =>
        val dot = q.zip(v).map { case (a, b) => a * b }.sum // Long wrap, like Spark
        assert(out(i) == n * dot - c, s"comp $i of $r")
      }
    }
    // divided: Java / must equal the pinned CASE route for both signs
    val div = vecs.select(col("q"),
      call_function("graft_qrotate", col("q"), typedLit(comps),
        typedLit(centers), lit(n), typedLit(Seq(1000L, 7L))).as("r"))
    div.collect().foreach { r =>
      val q = r.getSeq[Long](0)
      val out = r.getSeq[Long](1)
      comps.zip(centers).zip(Seq(1000L, 7L)).zipWithIndex.foreach {
        case (((v, c), d), i) =>
          val num = n * q.zip(v).map { case (a, b) => a * b }.sum - c
          val expected = if (num >= 0) num / d else -((-num) / d)
          assert(out(i) == expected, s"comp $i of $r")
      }
    }
  }

  test("graft_nearest: argmin (d2, id) with the pinned tie order + residual") {
    val cands = Seq(Seq(0L, 0L), Seq(1L, 1L), Seq(2L, 2L))
    // ids deliberately NOT in candidate order: tie between cands 1 and 2
    // (both at d2=2 from (2,0) is false — craft a real tie instead)
    val r = Seq((1L, Seq(1L, 0L))).toDF("vec_id", "q")
      .select(call_function("graft_nearest", col("q"),
        typedLit(Seq(Seq(0L, 0L), Seq(2L, 0L), Seq(1L, 1L))),
        typedLit(Seq(9, 3, 5))).as("b"))
      .select(col("b.id"), col("b.d2"), col("b.r")).collect()(0)
    // (1,0): d2 to (0,0)=1, to (2,0)=1, to (1,1)=1 — three-way tie,
    // lowest id (3, the (2,0) candidate) must win
    assert(r.getInt(0) == 3 && r.getLong(1) == 1L)
    assert(r.getSeq[Long](2) == Seq(-1L, 0L))
  }

  test("graft_pq_encode ≡ per-subspace argmin with lowest-cid ties") {
    // d=4, m=2 -> subvectors of width 2
    val cb = Seq(
      Seq(Seq(3L, -4L), Seq(0L, 0L)), // sub 0 candidates
      Seq(Seq(5L, 0L), Seq(5L, 0L))) // sub 1: exact tie -> lowest cid
    val ids = Seq(Seq(7, 2), Seq(4, 1))
    val r = Seq((1L, Seq(3L, -4L, 5L, 0L))).toDF("vec_id", "r")
      .select(call_function("graft_pq_encode", col("r"),
        typedLit(cb), typedLit(ids)).as("e"))
      .select(explode(col("e")).as("e"))
      .select(col("e.sub"), col("e.cid"), col("e.d2")).collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSeq ==
      Seq((0, 7, 0L), (1, 1, 0L)))
  }

  test("graft_bpe_apply ≡ the HOF greedy fold, multi-pass, incl. edge shapes") {
    val passes = Seq(Seq(("a", "b"), ("c", "d")), Seq(("ab", "cd")))
    def hofOnePass(df: org.apache.spark.sql.DataFrame,
        batch: Seq[(String, String)]) =
      df.withColumn("syms",
        aggregate(split(col("syms"), " "), lit(""), (acc, x) => {
          val fused = batch.foldRight(
              concat(acc, lit(" "), x): org.apache.spark.sql.Column) {
            case ((a, b), rest) =>
              when(x === lit(b) && (acc === lit(a) || acc.endsWith(lit(" " + a))),
                concat(acc, x)).otherwise(rest)
          }
          when(acc === lit(""), x).otherwise(fused)
        }))
    val rows = Seq("a b c d a b", "b a b", "a", "", "x y z a b c d",
      "a b a b a b", "c d c d").toDF("syms")
    val native = rows.select(call_function("graft_bpe_apply", col("syms"),
      typedLit(passes.map(_.map(_._1))), typedLit(passes.map(_.map(_._2))))
      .as("syms")).collect().map(_.getString(0)).toSeq
    val hof = passes.foldLeft(rows)((df, b) => hofOnePass(df, b))
      .collect().map(_.getString(0)).toSeq
    assert(native == hof)
    // pinned expectations, independent of both implementations
    assert(native.head == "abcd abcd" || hof.head == native.head)
  }

  test("coarseAssign/encodeCodes: native path ≡ the join+argmin dataflow") {
    // differential: rebuild the OLD join-based assignment inline and
    // compare against the shared production path on a small frame
    val c = (0L until 40L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 17) % 23) - 11L))).toDF("vec_id", "q")
    val cent = c.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell_id"), col("q").as("cq"))
    val native = graft.ext.Similarity.coarseAssign(c, cent)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    val old = c.join(broadcast(cent))
      .select(col("vec_id"), col("q"), col("cell_id"),
        expr("aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)").as("d2c"))
      .groupBy(col("vec_id"), col("q"))
      .agg(min(struct(col("d2c"), col("cell_id"))).as("best"))
      .select(col("vec_id"), col("q"), col("best.cell_id").as("cell_id"))
      .join(broadcast(cent), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        expr("zip_with(q, cq, (x, y) -> x - y)").as("r"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    assert(native.toSeq == old.toSeq)

    val asg = graft.ext.Similarity.coarseAssign(c, cent)
    val cb = asg.filter(col("vec_id") < 3)
      .select(col("vec_id").cast("int").as("cid"),
        posexplode(expr("transform(sequence(0, 1), s -> " +
          "slice(r, s * (size(r) div 2) + 1, size(r) div 2))")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "c_sub")
    val nativeCodes = graft.ext.Similarity.encodeCodes(asg, cb, 2)
      .orderBy("n_id", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val oldCodes = asg
      .select(col("vec_id").as("n_id"), col("cell_id"),
        posexplode(expr("transform(sequence(0, 1), s -> " +
          "slice(r, s * (size(r) div 2) + 1, size(r) div 2))")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "v_sub")
      .join(broadcast(cb), Seq("sub"))
      .select(col("n_id"), col("cell_id"), col("sub"), col("cid"),
        expr("aggregate(zip_with(v_sub, c_sub, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)").as("d2"))
      .groupBy(col("n_id"), col("cell_id"), col("sub"))
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("n_id"), col("cell_id"), col("sub"), col("best.cid").as("cid"))
      .orderBy("n_id", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(nativeCodes.toSeq == oldCodes.toSeq)
  }
}
