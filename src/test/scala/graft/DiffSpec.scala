package graft

import graft.diff._
import graft.diff.Messages._
import graft.schema._

/** Unit tests for the diff engine over hand-built snapshots, covering
  * every check branch (D2-D15) and the reference's edge semantics.
  */
class DiffSpec extends SparkSpec {

  private def users(cols: ColumnMeta*)(idx: IndexMeta*)(fks: ForeignKeyMeta*): SchemaSnapshot =
    Snapshot.fromMeta(spark, Seq(TableMeta("users", "")), cols, idx, fks)

  private def messages(base: SchemaSnapshot, target: SchemaSnapshot,
      opts: DiffOptions = DiffOptions()): Seq[String] =
    Diff.diff(base, target, opts)
      .orderBy("table_name", "kind_rank", "object_ordinal", "check_rank")
      .select("message").collect().map(_.getString(0)).toSeq

  private val idCol = ColumnMeta("users", "id", 1, "bigint", "", false, "", true)
  private val nameCol = ColumnMeta("users", "name", 2, "varchar(255)", "", true, "the name", false)

  test("identical snapshots produce no findings") {
    val s1 = users(idCol, nameCol)(IndexMeta("users", "idx_name", 1, Seq("name"), "", false))(
      ForeignKeyMeta("users", "fk_org", 1, "org_id", "orgs", "id"))
    val s2 = users(idCol, nameCol)(IndexMeta("users", "idx_name", 1, Seq("name"), "", false))(
      ForeignKeyMeta("users", "fk_org", 1, "org_id", "orgs", "id"))
    assert(messages(s1, s2).isEmpty)
  }

  test("D2 missing table reports only the table line") {
    val base = Snapshot.fromMeta(spark, Seq(TableMeta("users", "")), Seq(idCol))
    val target = Snapshot.fromMeta(spark, Seq.empty)
    assert(messages(base, target) ==
      Seq("Table: users exists in the base database, but not in the target database."))
  }

  test("D4 missing column") {
    assert(messages(users(idCol, nameCol)()(), users(idCol)()()) ==
      Seq("Column: users.name exists in the base database, but not in the target database."))
  }

  test("D5-D9 column attribute mismatches, reference message text and order") {
    val changed = ColumnMeta("users", "name", 2, "text", "''::text", false, "renamed", true)
    assert(messages(users(idCol, nameCol)()(), users(idCol, changed)()()) == Seq(
      "Column: users.name has different data type. => varchar(255) != text",
      "Column: users.name has different comment. => the name != renamed",
      "Column: users.name has different nullable. => NULL != NOT NULL",
      "Column: users.name has different default value. =>  != ''::text",
      "Column: users.name has different AUTO_INCREMENT. => NOT AUTO_INCREMENT != AUTO_INCREMENT"))
  }

  test("D10-D13 index checks incl. ORDER-sensitive column list") {
    val b = users(idCol)(
      IndexMeta("users", "idx_a", 1, Seq("a", "b"), "", true),
      IndexMeta("users", "idx_gone", 2, Seq("x"), "", false))()
    val t = users(idCol)(
      IndexMeta("users", "idx_a", 1, Seq("b", "a"), "(a > 0)", false))()
    assert(messages(b, t) == Seq(
      "Index: users.idx_a has different columns. Please check the order. => a, b != b, a",
      "Index: users.idx_a has different predicate. =>  != (a > 0)",
      "Index: users.idx_a has different uniqueness. => UNIQUE != NOT UNIQUE",
      "Index: users.idx_gone exists in the base database, but not in the target database."))
  }

  test("D14-D15 foreign key checks") {
    val b = users(idCol)()(
      ForeignKeyMeta("users", "fk_org", 1, "org_id", "orgs", "id"),
      ForeignKeyMeta("users", "fk_gone", 2, "x_id", "xs", "id"))
    val t = users(idCol)()(
      ForeignKeyMeta("users", "fk_org", 1, "org_id", "organizations", "id"))
    assert(messages(b, t) == Seq(
      "Foreign Key: users.fk_org references different column. => orgs.id != organizations.id",
      "Foreign Key: users.fk_gone exists in the base database, but not in the target database."))
  }

  test("directional: target-only objects are ignored (reference parity)") {
    val base = users(idCol)()()
    val target = users(idCol, nameCol)(IndexMeta("users", "idx_extra", 1, Seq("name"), "", false))()
    assert(messages(base, target).isEmpty)
  }

  test("bidirectional extension reports target-only objects too") {
    val base = users(idCol)()()
    val target = users(idCol, nameCol)()()
    val msgs = messages(base, target, DiffOptions(bidirectional = true))
    assert(msgs == Seq("Column: users.name exists in the base database, but not in the target database."))
    val dirs = Diff.diff(base, target, DiffOptions(bidirectional = true))
      .select("direction").collect().map(_.getString(0)).toSeq
    assert(dirs == Seq("target_to_base"))
  }

  test("Korean messages") {
    val b = users(idCol)()()
    val t = Snapshot.fromMeta(spark, Seq.empty)
    assert(messages(b, t, DiffOptions(language = Korean)) ==
      Seq("Table: users가 base 데이터베이스에는 있지만, target 데이터베이스에는 없습니다."))
  }

  test("ignore_list suppresses checks (reference declares but never honors it)") {
    val changed = ColumnMeta("users", "name", 2, "text", "", true, "renamed", false)
    val msgs = messages(users(idCol, nameCol)()(), users(idCol, changed)()(),
      DiffOptions(ignore = Set(CheckType.TypeOfColumn, CheckType.CommentOfColumn)))
    assert(msgs.isEmpty)
  }

  test("strictNullDefaults distinguishes NULL from '' (reference cannot)") {
    val bCol = ColumnMeta("users", "name", 2, "text", null, true, "", false)
    val tCol = ColumnMeta("users", "name", 2, "text", "", true, "", false)
    assert(messages(users(idCol, bCol)()(), users(idCol, tCol)()()).isEmpty) // parity: '' == NULL
    val strict = messages(users(idCol, bCol)()(), users(idCol, tCol)()(),
      DiffOptions(strictNullDefaults = true))
    assert(strict.size == 1 && strict.head.contains("different default value"))
  }

  test("registerViews exposes findings and report to spark.sql") {
    val base = users(idCol, nameCol)()()
    val target = users(idCol)()()
    Diff.registerViews(base, target)
    val n = spark.sql(
      "SELECT count(*) FROM graft_findings WHERE check = 'column_missing'")
      .collect().head.getLong(0)
    assert(n == 1)
    val rep = spark.sql(
      "SELECT report_list[0] FROM graft_report WHERE table_name = 'users'")
      .collect().head.getString(0)
    assert(rep.contains("users.name exists in the base database"))
  }

  test("report groups per table, ordered, empty tables dropped") {
    val base = Snapshot.fromMeta(spark,
      Seq(TableMeta("a_ok", ""), TableMeta("b_bad", ""), TableMeta("c_gone", "")),
      Seq(ColumnMeta("a_ok", "id", 1, "int", "", false, "", false),
        ColumnMeta("b_bad", "id", 1, "int", "", false, "", false),
        ColumnMeta("b_bad", "v", 2, "int", "", false, "", false)))
    val target = Snapshot.fromMeta(spark,
      Seq(TableMeta("a_ok", ""), TableMeta("b_bad", "")),
      Seq(ColumnMeta("a_ok", "id", 1, "int", "", false, "", false),
        ColumnMeta("b_bad", "id", 1, "bigint", "", false, "", false)))
    val rep = Report.fromFindings(Diff.diff(base, target)).collect()
    assert(rep.map(_.getString(0)).toSeq == Seq("b_bad", "c_gone"))
    assert(rep(0).getSeq[String](1) == Seq(
      "Column: b_bad.id has different data type. => int != bigint",
      "Column: b_bad.v exists in the base database, but not in the target database."))
    val json = Report.toJsonString(Report.fromFindings(Diff.diff(base, target)))
    assert(json.contains("\"report_table_list\""))
    assert(json.contains("\"table_name\": \"b_bad\""))
  }
}
