package graft

import graft.dialect.MySql
import graft.diff.{Diff, DiffOptions, Report}
import graft.mysql.MySqlWire
import graft.schema.{ColumnMeta, ForeignKeyMeta, IndexMeta, Snapshot, TableMeta}

/** Wire-level MySQL e2e — the in-sandbox stand-in for the
  * environment-blocked live-MySQL spec: a protocol-accurate fake server
  * ([[FakeMySqlServer]]) serves the ported reference example catalogs
  * (MySqlFixture) as information_schema result sets over real TCP +
  * real MySQL packet framing; the production wire client +
  * [[Snapshot.fromMySqlWire]] run the UNMODIFIED dialect SQL against
  * it; the diff engine must reproduce the FIXTURES.md §3 findings.
  *
  * What this catches that the Derby e2e cannot: the exact SQL TEXT
  * pushed to a MySQL endpoint (asserted byte-identical server-side),
  * the text-protocol row decoding (lenenc strings, 1/0 booleans, 0xFB
  * NULLs), handshake/auth framing, and the ERR path for SQL the server
  * rejects. What only a real mysqld can catch remains documented in
  * [[LiveMySqlSpec]] (which this same client can drive when one
  * exists).
  */
class MySqlWireSpec extends SparkSpec {

  private def tableRows(ts: Seq[TableMeta]): Seq[Seq[String]] =
    ts.map(t => Seq(t.table_name, t.table_comment))

  private def colRows(cs: Seq[ColumnMeta]): Seq[Seq[String]] =
    cs.map(c => Seq(c.table_name, c.column_name, c.ordinal.toString, c.data_type,
      c.default_value, if (c.is_nullable) "1" else "0", c.comment,
      if (c.is_auto_increment) "1" else "0"))

  private def idxRows(is: Seq[IndexMeta]): Seq[Seq[String]] =
    is.map(i => Seq(i.table_name, i.index_name, i.ordinal.toString,
      i.columns.mkString(","), i.predicate, if (i.is_unique) "1" else "0"))

  private def fkRows(fs: Seq[ForeignKeyMeta]): Seq[Seq[String]] =
    fs.map(f => Seq(f.table_name, f.constraint_name, f.ordinal.toString,
      f.column_name, f.ref_table, f.ref_column))

  private val tableCols = Seq("table_name", "table_comment")
  private val columnCols = Seq("table_name", "column_name", "ordinal", "data_type",
    "default_value", "is_nullable", "comment", "is_auto_increment")
  private val indexCols = Seq("table_name", "index_name", "ordinal", "columns_csv",
    "predicate", "is_unique")
  private val fkCols = Seq("table_name", "constraint_name", "ordinal", "column_name",
    "ref_table", "ref_column")

  private def catalog(
      ts: Seq[TableMeta], cs: Seq[ColumnMeta],
      is: Seq[IndexMeta], fs: Seq[ForeignKeyMeta]): Map[String, (Seq[String], Seq[Seq[String]])] =
    Map(
      MySql.tablesSql -> (tableCols -> tableRows(ts)),
      MySql.columnsSql -> (columnCols -> colRows(cs)),
      MySql.indexesSql -> (indexCols -> idxRows(is)),
      MySql.foreignKeysSql -> (fkCols -> fkRows(fs)),
      "SELECT NULL AS n, 'x' AS v" -> (Seq("n", "v") -> Seq(Seq(null, "x"))))

  private def withServer[A](f: FakeMySqlServer => A): A = {
    val server = new FakeMySqlServer(Map(
      "graft_base" -> catalog(MySqlFixture.baseTables, MySqlFixture.baseCols,
        MySqlFixture.baseIdx, MySqlFixture.baseFks),
      "graft_target" -> catalog(MySqlFixture.targetTables, MySqlFixture.targetCols,
        MySqlFixture.targetIdx, MySqlFixture.targetFks)))
    try f(server) finally server.close()
  }

  /** The FIXTURES.md §3 finding set — what ANY full-pipeline drive of
    * the ported example catalogs must produce, whichever transport
    * carried the snapshot.
    */
  private val fixtureFindings = Map(
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

  test("full diff e2e over the wire: dialect SQL down, catalog rows up, FIXTURES findings out") {
    withServer { server =>
      val base = Snapshot.fromMySqlWire(spark, "127.0.0.1", server.port, "root", "graft_base")
      val target = Snapshot.fromMySqlWire(spark, "127.0.0.1", server.port, "root", "graft_target")

      // the server received EXACTLY the four production dialect
      // statements, in snapshot order, byte-identical — per database
      val expectedSql = Vector(
        MySql.tablesSql, MySql.columnsSql, MySql.indexesSql, MySql.foreignKeysSql)
      assert(server.receivedQueries("graft_base") == expectedSql)
      assert(server.receivedQueries("graft_target") == expectedSql)

      val report = Report.fromFindings(Diff.diff(base, target, DiffOptions()))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      assert(report == fixtureFindings,
        "wire-protocol snapshot must reproduce the FIXTURES.md §3 finding set exactly")
    }
  }

  test("CLI `run` drives the wire client end-to-end: config -> COM_PING -> snapshots -> report JSON") {
    withServer { server =>
      val dir = java.nio.file.Files.createTempDirectory("graft-wire-cli")
      val cfgPath = dir.resolve("config.json")
      graft.config.Config.save(graft.config.GraftConfig(
        database_pairs = Seq(graft.config.DatabasePair(
          name = "default",
          database_type = "mysql",
          base_connection = s"mysql-wire://root@127.0.0.1:${server.port}/graft_base",
          target_connection = s"mysql-wire://root@127.0.0.1:${server.port}/graft_target")),
        default_database_pair = "default"), cfgPath)
      val out = dir.resolve("report").toString
      // the reference `magiceye run` path (background.rs:8-66): config →
      // connect (COM_PING over the wire) → snapshots → check → report
      graft.cli.Main.run(spark, List("run",
        "--config", cfgPath.toString, "--table-comments", "off", "--out", out))
      // byte-identical dialect SQL reached the server through the CLI
      val expectedSql = Vector(
        MySql.tablesSql, MySql.columnsSql, MySql.indexesSql, MySql.foreignKeysSql)
      assert(server.receivedQueries("graft_base") == expectedSql)
      assert(server.receivedQueries("graft_target") == expectedSql)
      // the emitted JSON file carries exactly the FIXTURES finding set
      val reportFile = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".json")).head
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(
        java.nio.file.Files.readAllBytes(reportFile.toPath))
      import scala.jdk.CollectionConverters._
      val got = root.get("report_table_list").elements().asScala.map { n =>
        n.get("table_name").asText() ->
          n.get("report_list").elements().asScala.map(_.asText()).toSeq
      }.toMap
      assert(got == fixtureFindings,
        "CLI run over mysql-wire:// must emit the FIXTURES.md §3 findings as JSON")
    }
  }

  test("text-protocol decoding: lenenc strings, 0xFB NULL, COM_PING, ERR on unknown SQL") {
    withServer { server =>
      val c = new MySqlWire.Client("127.0.0.1", server.port, "root", "graft_base")
      try {
        c.ping()
        val rs = c.query("SELECT NULL AS n, 'x' AS v")
        assert(rs.columns == Seq("n", "v"))
        assert(rs.rows == Seq(Seq(null, "x")), "0xFB must decode to SQL NULL")
        val err = intercept[MySqlWire.MySqlWireException] {
          c.query("SELECT * FROM not_in_catalog")
        }
        assert(err.code == 1064 && err.message.contains("unexpected query"))
        // the connection survives an ERR and keeps serving
        assert(c.query("SELECT NULL AS n, 'x' AS v").rows.nonEmpty)
      } finally c.close()
    }
  }

  test("an ERR packet mid-result-set throws instead of returning a truncated catalog") {
    withServer { server =>
      val c = new MySqlWire.Client("127.0.0.1", server.port, "root", "graft_base")
      try {
        val err = intercept[MySqlWire.MySqlWireException] {
          c.query(FakeMySqlServer.MidStreamErrSql)
        }
        assert(err.code == 1317 && err.message.contains("interrupted"),
          "a server kill during row streaming must surface as the server's error")
      } finally c.close()
    }
  }

  test("large catalog round-trip: multi-packet result sets frame and decode correctly") {
    // 3000 rows exercises many packets per result set (one per row in
    // the text protocol) and the lenenc length paths
    val big = (1 to 3000).map(i => Seq(s"t_$i", s"comment $i with some padding text"))
    val server = new FakeMySqlServer(Map(
      "big" -> Map(MySql.tablesSql -> (tableCols -> big))))
    try {
      val c = new MySqlWire.Client("127.0.0.1", server.port, "root", "big")
      try {
        val rs = c.query(MySql.tablesSql)
        assert(rs.rows.size == 3000)
        assert(rs.rows.last == Seq("t_3000", "comment 3000 with some padding text"))
      } finally c.close()
    } finally server.close()
  }
}
