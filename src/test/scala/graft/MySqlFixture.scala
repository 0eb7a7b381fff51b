package graft

import graft.schema.{ColumnMeta, ForeignKeyMeta, IndexMeta, TableMeta}

/** The ported MySQL example corpus (reference examples/mysql/
  * {base,target}.sql with the FIXTURES.md §3 invalid-DDL correction) as
  * plain metadata Seqs — shared by [[FixtureSpec]] (diff-engine golden
  * tests) and [[MySqlWireSpec]] (where the fake wire server renders the
  * SAME schemas as information_schema catalog result sets).
  */
object MySqlFixture {

  private def col(t: String, n: Int, name: String, dt: String, nullable: Boolean,
      default: String = "", autoinc: Boolean = false) =
    ColumnMeta(t, name, n, dt, default, nullable, "", autoinc)
  private def idx(t: String, n: Int, name: String, cols: Seq[String],
      unique: Boolean = false, pred: String = "") =
    IndexMeta(t, name, n, cols, pred, unique)
  private def fk(t: String, n: Int, name: String, c: String, rt: String, rc: String = "id") =
    ForeignKeyMeta(t, name, n, c, rt, rc)

  lazy val baseTables: Seq[TableMeta] = Seq(
    "users", "posts", "comments", "tags", "post_tags", "likes", "followers",
    "notifications", "messages", "sessions", "settings", "reports", "blocks",
    "mutes", "admins", "reports_fk_test").map(TableMeta(_, ""))

  lazy val baseCols: Seq[ColumnMeta] = Seq(
    col("users", 1, "id", "int", false, autoinc = true),
    col("users", 2, "name", "varchar(255)", false),
    col("users", 3, "email", "varchar(255)", false),
    col("posts", 1, "id", "int", false, autoinc = true),
    col("posts", 2, "title", "varchar(255)", false, default = "asdf"),
    col("posts", 3, "body", "text", false),
    col("posts", 4, "user_id", "int", true),
    col("comments", 1, "id", "int", false, autoinc = true),
    col("comments", 2, "body", "text", false),
    col("comments", 3, "post_id", "int", true),
    col("tags", 1, "id", "int", false, autoinc = true),
    col("tags", 2, "name", "varchar(255)", false),
    col("post_tags", 1, "post_id", "int", false),
    col("post_tags", 2, "tag_id", "int", false),
    col("likes", 1, "user_id", "int", false),
    col("likes", 2, "post_id", "int", false),
    col("followers", 1, "follower_id", "int", false),
    col("followers", 2, "followee_id", "int", false),
    col("notifications", 1, "id", "int", false, autoinc = true),
    col("notifications", 2, "user_id", "int", true),
    col("notifications", 3, "message", "text", false),
    col("messages", 1, "id", "int", false, autoinc = true),
    col("messages", 2, "sender_id", "int", true),
    col("messages", 3, "receiver_id", "int", true),
    col("messages", 4, "body", "text", false),
    col("sessions", 1, "id", "int", false, autoinc = true),
    col("sessions", 2, "user_id", "int", true),
    col("sessions", 3, "token", "varchar(255)", false),
    col("settings", 1, "id", "int", false, autoinc = true),
    col("settings", 2, "user_id", "int", true),
    col("settings", 3, "theme", "varchar(255)", false),
    col("reports", 1, "id", "int", false, autoinc = true),
    col("reports", 2, "user_id", "int", true),
    col("reports", 3, "post_id", "int", true),
    col("reports", 4, "reason", "text", false),
    col("blocks", 1, "blocker_id", "int", false),
    col("blocks", 2, "blockee_id", "int", false),
    col("mutes", 1, "muter_id", "int", false),
    col("mutes", 2, "mutee_id", "int", false),
    col("admins", 1, "id", "int", false, autoinc = true),
    col("admins", 2, "name", "varchar(255)", false),
    col("admins", 3, "email", "varchar(255)", false),
    col("reports_fk_test", 1, "id", "int", false, autoinc = true),
    col("reports_fk_test", 2, "user_id", "int", true),
    col("reports_fk_test", 3, "post_id", "int", true),
    col("reports_fk_test", 4, "reason", "text", false))

  lazy val baseIdx: Seq[IndexMeta] = Seq(
    idx("users", 1, "PRIMARY", Seq("id"), unique = true),
    idx("users", 2, "idx_user_email", Seq("email")),
    idx("users", 3, "idx_user_name_email", Seq("name", "email")),
    idx("posts", 1, "PRIMARY", Seq("id"), unique = true),
    idx("comments", 1, "PRIMARY", Seq("id"), unique = true),
    idx("comments", 2, "idx_comment_post_id", Seq("post_id")),
    idx("tags", 1, "PRIMARY", Seq("id"), unique = true),
    idx("post_tags", 1, "PRIMARY", Seq("post_id", "tag_id"), unique = true),
    idx("post_tags", 2, "idx_post_tag_post_id", Seq("post_id")),
    idx("post_tags", 3, "idx_post_tag_tag_id", Seq("tag_id")),
    idx("likes", 1, "PRIMARY", Seq("user_id", "post_id"), unique = true),
    idx("likes", 2, "idx_like_user_id", Seq("user_id")),
    idx("likes", 3, "idx_like_post_id", Seq("post_id")),
    idx("followers", 1, "PRIMARY", Seq("follower_id", "followee_id"), unique = true),
    idx("followers", 2, "followee_id", Seq("followee_id")), // FK auto-index
    idx("followers", 3, "idx_follower_follower_id", Seq("follower_id")),
    idx("notifications", 1, "PRIMARY", Seq("id"), unique = true),
    idx("notifications", 2, "user_id", Seq("user_id")),
    idx("messages", 1, "PRIMARY", Seq("id"), unique = true),
    idx("messages", 2, "sender_id", Seq("sender_id")),
    idx("messages", 3, "receiver_id", Seq("receiver_id")),
    idx("sessions", 1, "PRIMARY", Seq("id"), unique = true),
    idx("sessions", 2, "user_id", Seq("user_id")),
    idx("settings", 1, "PRIMARY", Seq("id"), unique = true),
    idx("settings", 2, "user_id", Seq("user_id")),
    idx("reports", 1, "PRIMARY", Seq("id"), unique = true),
    idx("reports", 2, "user_id", Seq("user_id")),
    idx("reports", 3, "post_id", Seq("post_id")),
    idx("blocks", 1, "PRIMARY", Seq("blocker_id", "blockee_id"), unique = true),
    idx("blocks", 2, "blockee_id", Seq("blockee_id")),
    idx("mutes", 1, "PRIMARY", Seq("muter_id", "mutee_id"), unique = true),
    idx("mutes", 2, "mutee_id", Seq("mutee_id")),
    idx("admins", 1, "PRIMARY", Seq("id"), unique = true),
    idx("reports_fk_test", 1, "PRIMARY", Seq("id"), unique = true),
    idx("reports_fk_test", 2, "user_id", Seq("user_id")),
    idx("reports_fk_test", 3, "post_id", Seq("post_id")))

  lazy val baseFks: Seq[ForeignKeyMeta] = Seq(
    fk("posts", 1, "posts_ibfk_1", "user_id", "users"),
    fk("comments", 1, "comments_ibfk_1", "post_id", "posts"),
    fk("post_tags", 1, "post_tags_ibfk_1", "post_id", "posts"),
    fk("post_tags", 2, "post_tags_ibfk_2", "tag_id", "tags"),
    fk("likes", 1, "likes_ibfk_1", "user_id", "users"),
    fk("likes", 2, "likes_ibfk_2", "post_id", "posts"),
    fk("followers", 1, "followers_ibfk_1", "follower_id", "users"),
    fk("followers", 2, "followers_ibfk_2", "followee_id", "users"),
    fk("notifications", 1, "notifications_ibfk_1", "user_id", "users"),
    fk("messages", 1, "messages_ibfk_1", "sender_id", "users"),
    fk("messages", 2, "messages_ibfk_2", "receiver_id", "users"),
    fk("sessions", 1, "sessions_ibfk_1", "user_id", "users"),
    fk("settings", 1, "settings_ibfk_1", "user_id", "users"),
    fk("reports", 1, "reports_ibfk_1", "user_id", "users"),
    fk("reports", 2, "reports_ibfk_2", "post_id", "posts"),
    fk("blocks", 1, "blocks_ibfk_1", "blocker_id", "users"),
    fk("blocks", 2, "blocks_ibfk_2", "blockee_id", "users"),
    fk("mutes", 1, "mutes_ibfk_1", "muter_id", "users"),
    fk("mutes", 2, "mutes_ibfk_2", "mutee_id", "users"),
    fk("reports_fk_test", 1, "reports_fk_test_ibfk_1", "user_id", "users"),
    fk("reports_fk_test", 2, "reports_fk_test_ibfk_2", "post_id", "posts"))

  /** Target = base with the seeded drift applied (examples/mysql/target.sql). */
  lazy val targetTables: Seq[TableMeta] = baseTables.filterNot(_.table_name == "blocks")

  lazy val targetCols: Seq[ColumnMeta] = baseCols
    .filterNot(c => c.table_name == "blocks")
    .filterNot(c => c.table_name == "messages" && c.column_name == "receiver_id")
    .map {
      case c if c.table_name == "posts" && c.column_name == "id" =>
        c.copy(is_auto_increment = false)                         // target.sql:12
      case c if c.table_name == "posts" && c.column_name == "title" =>
        c.copy(default_value = "")                                // target.sql:13
      case c if c.table_name == "comments" && c.column_name == "body" =>
        c.copy(is_nullable = true)                                // target.sql:21
      case c if c.table_name == "tags" && c.column_name == "name" =>
        c.copy(data_type = "varchar(155)")                        // target.sql:28
      case c if c.table_name == "admins" && c.column_name == "id" =>
        c.copy(is_auto_increment = false)                         // target.sql:112
      case c => c
    }

  lazy val targetIdx: Seq[IndexMeta] = baseIdx
    .filterNot(_.table_name == "blocks")
    .filterNot(i => i.table_name == "followers" && i.index_name == "idx_follower_follower_id")
    .filterNot(i => i.table_name == "messages" && i.index_name == "receiver_id")
    .filterNot(i => i.table_name == "reports_fk_test" && i.index_name == "post_id")

  lazy val targetFks: Seq[ForeignKeyMeta] = baseFks
    .filterNot(_.table_name == "blocks")
    .filterNot(_.constraint_name == "messages_ibfk_2")   // invalid-DDL correction
    .filterNot(_.constraint_name == "reports_fk_test_ibfk_2")
}
