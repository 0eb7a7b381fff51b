package graft

import graft.diff._
import graft.schema._

/** Golden end-to-end tests: both reference example pairs
  * (`/root/reference/examples/{postgres,mysql}/{base,target}.sql`,
  * FIXTURES.md) ported to in-memory snapshots exactly as the catalogs
  * would present them, diffed, and asserted against the complete
  * expected finding sets — including the verbatim golden report subset
  * from the reference README (README.md:55-80).
  *
  * Porting notes:
  *  - MySQL: PK index is `PRIMARY`; inline FKs auto-name `<tbl>_ibfk_N`
  *    and auto-create an index named after the column unless an index
  *    already covers it (PK prefix or a later explicit index).
  *  - The invalid target DDL (`examples/mysql/target.sql:62-68`
  *    declares an FK on an undeclared column) is ported with that FK
  *    dropped, preserving the intended "receiver_id missing" findings
  *    (FIXTURES.md §3 correction).
  *  - Postgres: PK index is `<tbl>_pkey`; inline FKs auto-name
  *    `<tbl>_<col>_fkey`; SERIAL renders integer + nextval default;
  *    no FK auto-indexes.
  */
class FixtureSpec extends SparkSpec {

  private def report(base: SchemaSnapshot, target: SchemaSnapshot): Map[String, Seq[String]] =
    Report.fromFindings(Diff.diff(base, target))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap

  private def col(t: String, n: Int, name: String, dt: String, nullable: Boolean,
      default: String = "", autoinc: Boolean = false) =
    ColumnMeta(t, name, n, dt, default, nullable, "", autoinc)
  private def idx(t: String, n: Int, name: String, cols: Seq[String],
      unique: Boolean = false, pred: String = "") =
    IndexMeta(t, name, n, cols, pred, unique)
  private def fk(t: String, n: Int, name: String, c: String, rt: String, rc: String = "id") =
    ForeignKeyMeta(t, name, n, c, rt, rc)

  // =====================================================================
  // MySQL pair (examples/mysql/{base,target}.sql)
  // =====================================================================

  // fixture metadata lives in MySqlFixture (shared with MySqlWireSpec,
  // where the fake wire server renders the same schemas as
  // information_schema catalog result sets)
  private lazy val myTarget: SchemaSnapshot = Snapshot.fromMeta(spark,
    MySqlFixture.targetTables, MySqlFixture.targetCols,
    MySqlFixture.targetIdx, MySqlFixture.targetFks)

  private lazy val myBase: SchemaSnapshot = Snapshot.fromMeta(spark,
    MySqlFixture.baseTables, MySqlFixture.baseCols,
    MySqlFixture.baseIdx, MySqlFixture.baseFks)

  test("MySQL example pair: full expected finding set") {
    val got = report(myBase, myTarget)
    val want = Map(
      "admins" -> Seq(
        "Column: admins.id has different AUTO_INCREMENT. => AUTO_INCREMENT != NOT AUTO_INCREMENT"),
      "blocks" -> Seq(
        "Table: blocks exists in the base database, but not in the target database."),
      "comments" -> Seq(
        "Column: comments.body has different nullable. => NOT NULL != NULL"),
      "followers" -> Seq(
        "Index: followers.idx_follower_follower_id exists in the base database, but not in the target database."),
      "messages" -> Seq(
        "Column: messages.receiver_id exists in the base database, but not in the target database.",
        "Index: messages.receiver_id exists in the base database, but not in the target database.",
        "Foreign Key: messages.messages_ibfk_2 exists in the base database, but not in the target database."),
      "posts" -> Seq(
        "Column: posts.id has different AUTO_INCREMENT. => AUTO_INCREMENT != NOT AUTO_INCREMENT",
        "Column: posts.title has different default value. => asdf != "),
      "reports_fk_test" -> Seq(
        "Index: reports_fk_test.post_id exists in the base database, but not in the target database.",
        "Foreign Key: reports_fk_test.reports_fk_test_ibfk_2 exists in the base database, but not in the target database."),
      "tags" -> Seq(
        "Column: tags.name has different data type. => varchar(255) != varchar(155)"))
    assert(got == want)
  }

  test("MySQL pair matches the reference README golden report subset verbatim") {
    // README.md:55-80 shows followers, reports_fk_test, posts, tags.
    val got = report(myBase, myTarget)
    assert(got("followers") == Seq(
      "Index: followers.idx_follower_follower_id exists in the base database, but not in the target database."))
    assert(got("reports_fk_test") == Seq(
      "Index: reports_fk_test.post_id exists in the base database, but not in the target database.",
      "Foreign Key: reports_fk_test.reports_fk_test_ibfk_2 exists in the base database, but not in the target database."))
    assert(got("posts") == Seq(
      "Column: posts.id has different AUTO_INCREMENT. => AUTO_INCREMENT != NOT AUTO_INCREMENT",
      "Column: posts.title has different default value. => asdf != "))
    assert(got("tags") == Seq(
      "Column: tags.name has different data type. => varchar(255) != varchar(155)"))
  }

  // =====================================================================
  // PostgreSQL pair (examples/postgres/{base,target}.sql)
  // =====================================================================

  private def serial(t: String, n: Int, name: String, seq: String, dt: String = "integer") =
    col(t, n, name, dt, false, default = s"nextval('$seq'::regclass)")

  private lazy val pgBaseTables = Seq(
    "users", "posts", "comments", "tags", "post_tags", "likes", "followers",
    "notifications", "messages", "sessions", "settings", "reports", "blocks",
    "mutes", "key_values", "reports_fk_test").map(TableMeta(_, ""))

  private lazy val pgBaseCols = Seq(
    serial("users", 1, "id", "users_id_seq"),
    col("users", 2, "name", "varchar(255)", false),
    col("users", 3, "email", "varchar(255)", false),
    serial("posts", 1, "id", "posts_id_seq"),
    col("posts", 2, "title", "varchar(255)", false),
    col("posts", 3, "body", "text", false),
    col("posts", 4, "user_id", "integer", true),
    serial("comments", 1, "id", "comments_id_seq"),
    col("comments", 2, "body", "text", false),
    col("comments", 3, "post_id", "integer", true),
    serial("tags", 1, "id", "tags_id_seq"),
    col("tags", 2, "name", "varchar(255)", false),
    col("post_tags", 1, "post_id", "integer", false),
    col("post_tags", 2, "tag_id", "integer", false),
    col("likes", 1, "user_id", "integer", false),
    col("likes", 2, "post_id", "integer", false),
    col("followers", 1, "follower_id", "integer", false),
    col("followers", 2, "followee_id", "integer", false),
    serial("notifications", 1, "id", "notifications_id_seq"),
    col("notifications", 2, "user_id", "integer", true),
    col("notifications", 3, "message", "text", false),
    serial("messages", 1, "id", "messages_id_seq"),
    col("messages", 2, "sender_id", "integer", true),
    col("messages", 3, "receiver_id", "integer", true),
    col("messages", 4, "body", "text", false),
    serial("sessions", 1, "id", "sessions_id_seq"),
    col("sessions", 2, "user_id", "integer", true),
    col("sessions", 3, "token", "varchar(255)", false),
    serial("settings", 1, "id", "settings_id_seq"),
    col("settings", 2, "user_id", "integer", true),
    col("settings", 3, "theme", "varchar(255)", false),
    serial("reports", 1, "id", "reports_id_seq"),
    col("reports", 2, "user_id", "integer", true),
    col("reports", 3, "post_id", "integer", true),
    col("reports", 4, "reason", "text", false),
    col("blocks", 1, "blocker_id", "integer", false),
    col("blocks", 2, "blockee_id", "integer", false),
    col("mutes", 1, "muter_id", "integer", false),
    col("mutes", 2, "mutee_id", "integer", false),
    serial("key_values", 1, "key", "key_values_key_seq"),
    col("key_values", 2, "value", "text", false),
    serial("reports_fk_test", 1, "id", "reports_fk_test_id_seq"),
    col("reports_fk_test", 2, "user_id", "integer", true),
    col("reports_fk_test", 3, "post_id", "integer", true),
    col("reports_fk_test", 4, "reason", "text", false))

  private lazy val pgBaseIdx = Seq(
    idx("users", 1, "users_pkey", Seq("id"), unique = true),
    idx("users", 2, "idx_user_email", Seq("email")),
    idx("users", 3, "idx_user_name_email", Seq("name", "email")),
    idx("posts", 1, "posts_pkey", Seq("id"), unique = true),
    idx("posts", 2, "idx_post_user_id", Seq("user_id")),
    idx("comments", 1, "comments_pkey", Seq("id"), unique = true),
    idx("comments", 2, "idx_comment_post_id", Seq("post_id")),
    idx("tags", 1, "tags_pkey", Seq("id"), unique = true),
    idx("post_tags", 1, "post_tags_pkey", Seq("post_id", "tag_id"), unique = true),
    idx("post_tags", 2, "idx_post_tag_post_id", Seq("post_id")),
    idx("post_tags", 3, "idx_post_tag_tag_id", Seq("tag_id")),
    idx("likes", 1, "likes_pkey", Seq("user_id", "post_id"), unique = true),
    idx("likes", 2, "idx_like_user_id", Seq("user_id")),
    idx("likes", 3, "idx_like_post_id", Seq("post_id")),
    idx("followers", 1, "followers_pkey", Seq("follower_id", "followee_id"), unique = true),
    idx("notifications", 1, "notifications_pkey", Seq("id"), unique = true),
    idx("messages", 1, "messages_pkey", Seq("id"), unique = true),
    idx("sessions", 1, "sessions_pkey", Seq("id"), unique = true),
    idx("settings", 1, "settings_pkey", Seq("id"), unique = true),
    idx("reports", 1, "reports_pkey", Seq("id"), unique = true),
    idx("blocks", 1, "blocks_pkey", Seq("blocker_id", "blockee_id"), unique = true),
    idx("mutes", 1, "mutes_pkey", Seq("muter_id", "mutee_id"), unique = true),
    idx("key_values", 1, "key_values_pkey", Seq("key"), unique = true),
    idx("reports_fk_test", 1, "reports_fk_test_pkey", Seq("id"), unique = true))

  private lazy val pgBaseFks = Seq(
    fk("posts", 1, "posts_user_id_fkey", "user_id", "users"),
    fk("comments", 1, "comments_post_id_fkey", "post_id", "posts"),
    fk("post_tags", 1, "post_tags_post_id_fkey", "post_id", "posts"),
    fk("post_tags", 2, "post_tags_tag_id_fkey", "tag_id", "tags"),
    fk("likes", 1, "likes_user_id_fkey", "user_id", "users"),
    fk("likes", 2, "likes_post_id_fkey", "post_id", "posts"),
    fk("followers", 1, "followers_follower_id_fkey", "follower_id", "users"),
    fk("followers", 2, "followers_followee_id_fkey", "followee_id", "users"),
    fk("notifications", 1, "notifications_user_id_fkey", "user_id", "users"),
    fk("messages", 1, "messages_sender_id_fkey", "sender_id", "users"),
    fk("messages", 2, "messages_receiver_id_fkey", "receiver_id", "users"),
    fk("sessions", 1, "sessions_user_id_fkey", "user_id", "users"),
    fk("settings", 1, "settings_user_id_fkey", "user_id", "users"),
    fk("reports", 1, "reports_user_id_fkey", "user_id", "users"),
    fk("reports", 2, "reports_post_id_fkey", "post_id", "posts"),
    fk("blocks", 1, "blocks_blocker_id_fkey", "blocker_id", "users"),
    fk("blocks", 2, "blocks_blockee_id_fkey", "blockee_id", "users"),
    fk("mutes", 1, "mutes_muter_id_fkey", "muter_id", "users"),
    fk("mutes", 2, "mutes_mutee_id_fkey", "mutee_id", "users"),
    fk("reports_fk_test", 1, "reports_fk_test_user_id_fkey", "user_id", "users"),
    fk("reports_fk_test", 2, "reports_fk_test_post_id_fkey", "post_id", "posts"))

  private lazy val pgBase: SchemaSnapshot =
    Snapshot.fromMeta(spark, pgBaseTables, pgBaseCols, pgBaseIdx, pgBaseFks)

  /** Target = base with the seeded drift (examples/postgres/target.sql). */
  private lazy val pgTarget: SchemaSnapshot = Snapshot.fromMeta(spark,
    pgBaseTables,
    pgBaseCols
      .filterNot(c => c.table_name == "sessions" && c.column_name == "user_id") // target:60-63
      .map {
        case c if c.table_name == "users" && c.column_name == "id" =>
          c.copy(data_type = "bigint")                              // target:6 BIGSERIAL
        case c if c.table_name == "posts" && c.column_name == "title" =>
          c.copy(data_type = "varchar(100)")                        // target:13
        case c if c.table_name == "tags" && c.column_name == "name" =>
          c.copy(is_nullable = true)                                // target:26
        case c if c.table_name == "likes" && c.column_name == "user_id" =>
          c.copy(data_type = "bigint")                              // target:36
        case c => c
      },
    pgBaseIdx
      .filterNot(i => i.index_name == "idx_like_post_id")           // target:97 (absent)
      .filterNot(i => i.index_name == "key_values_pkey")            // target:99-102 (no PK)
      .map {
        case i if i.index_name == "idx_user_name_email" =>
          i.copy(columns = Seq("email", "name"))                    // target:91 (order!)
        case i if i.index_name == "idx_comment_post_id" =>
          i.copy(predicate = "(post_id IS NOT NULL)")               // target:94
        case i => i
      },
    pgBaseFks
      .filterNot(_.constraint_name == "notifications_user_id_fkey") // target:49
      .filterNot(_.constraint_name == "sessions_user_id_fkey")      // target:60-63
      .map {
        case f if f.constraint_name == "reports_fk_test_post_id_fkey" =>
          f.copy(ref_table = "messages")                            // target:111-113
        case f => f
      })

  test("PostgreSQL example pair: full expected finding set") {
    val got = report(pgBase, pgTarget)
    val want = Map(
      "comments" -> Seq(
        "Index: comments.idx_comment_post_id has different predicate. =>  != (post_id IS NOT NULL)"),
      "key_values" -> Seq(
        "Index: key_values.key_values_pkey exists in the base database, but not in the target database."),
      "likes" -> Seq(
        "Column: likes.user_id has different data type. => integer != bigint",
        "Index: likes.idx_like_post_id exists in the base database, but not in the target database."),
      "notifications" -> Seq(
        "Foreign Key: notifications.notifications_user_id_fkey exists in the base database, but not in the target database."),
      "posts" -> Seq(
        "Column: posts.title has different data type. => varchar(255) != varchar(100)"),
      "reports_fk_test" -> Seq(
        "Foreign Key: reports_fk_test.reports_fk_test_post_id_fkey references different column. => posts.id != messages.id"),
      "sessions" -> Seq(
        "Column: sessions.user_id exists in the base database, but not in the target database.",
        "Foreign Key: sessions.sessions_user_id_fkey exists in the base database, but not in the target database."),
      "tags" -> Seq(
        "Column: tags.name has different nullable. => NOT NULL != NULL"),
      "users" -> Seq(
        "Column: users.id has different data type. => integer != bigint",
        "Index: users.idx_user_name_email has different columns. Please check the order. => name, email != email, name"))
    assert(got == want)
  }

  test("both pairs: diff(s, s) is empty and reversed diff only reports additions") {
    assert(report(myBase, myBase).isEmpty)
    assert(report(pgBase, pgBase).isEmpty)
    // reversed MySQL diff: target-only view — base-only objects become
    // invisible; target additions (none here) would be the only findings
    val reversed = report(myTarget, myBase)
    assert(!reversed.contains("blocks")) // blocks is base-only: invisible in reverse
  }

  test("MySQL table-comment drift: golden finding when the comparison is on (CLI default for MySQL)") {
    // the reference leaves MySQL table comments as a TODO (mysql.rs:144);
    // our MySQL dialect fetches information_schema.tables.table_comment
    // and graft.cli.Main defaults compareTableComments ON for MySQL
    def snap(comment: String) = Snapshot.fromMeta(spark,
      tables = Seq(TableMeta("users", comment), TableMeta("posts", "post table")),
      columns = Seq(ColumnMeta("users", "id", 1, "int", "", false, "", true),
        ColumnMeta("posts", "id", 1, "int", "", false, "", true)))
    val base = snap("the user table")
    val target = snap("renamed user table")
    val on = Report.fromFindings(
        Diff.diff(base, target, DiffOptions(compareTableComments = true)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(on == Map("users" -> Seq(
      "Table: users has different comment. => the user table != renamed user table")))
    // parity default (off) and the ignore_list suppression both silence it
    assert(report(base, target).isEmpty)
    assert(Diff.diff(base, target, DiffOptions(compareTableComments = true,
      ignore = Set(CheckType.CommentOfTable))).isEmpty)
  }
}
