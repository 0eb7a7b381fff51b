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
}
