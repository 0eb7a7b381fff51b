package graft

import java.io.File
import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dialect.MySql
import graft.diff.{Diff, DiffOptions, Report}
import graft.schema.SchemaSnapshot

/** LIVE MySQL validation of the dialect catalog SQL — the MySQL twin of
  * [[LivePgSpec]]: boot a real mysqld, load the reference's seeded
  * drift corpus (`examples/mysql/{base,target}.sql`, with the FIXTURES
  * §3 correction — target declares an FK on an undeclared column,
  * invalid on real MySQL), run the four production
  * [[graft.dialect.MySql]] catalog queries against both live schemas
  * through the `mysql` batch client (byte-identical SQL to what the
  * JDBC path pushes down as subqueries), feed the results through the
  * real diff engine, and assert the FIXTURES.md §3 expected findings
  * incl. the reference README golden subset.
  *
  * Env-gated: this container ships no MySQL/MariaDB server, so the
  * spec `assume`-skips here; it runs the full e2e wherever `mysqld` and
  * a `mysql` client exist (CI with a mysql service, a dev box). The
  * point of keeping it in-tree: the MySQL flagship path has an
  * executable validation recipe, not a prose TODO.
  */
class LiveMySqlSpec extends SparkSpec {

  private val refDir = "/root/reference/examples/mysql"

  private def have(cmd: String): Boolean = Seq("sh", "-c", s"command -v $cmd").! == 0

  private def haveEnv: Boolean =
    (have("mysqld") || have("mariadbd")) && have("mysql") &&
      new File(s"$refDir/base.sql").exists

  test("dialect catalog SQL end-to-end against live MySQL (reference example corpus)") {
    assume(haveEnv, "mysqld/mariadbd + mysql client unavailable in this environment")

    val work = Files.createTempDirectory("graft-livemysql").toFile
    val dataDir = s"${work.getAbsolutePath}/data"
    val sock = s"${work.getAbsolutePath}/mysql.sock"
    val server = if (have("mysqld")) "mysqld" else "mariadbd"
    def sh(cmd: String): Int = Seq("sh", "-c", cmd).!
    def shOut(cmd: String): String = Seq("sh", "-c", cmd).!!
    val mysql = s"mysql --socket=$sock -u root --batch"

    try {
      assert(sh(s"$server --initialize-insecure --datadir=$dataDir > $work/init.log 2>&1") == 0 ||
        sh(s"mariadb-install-db --datadir=$dataDir > $work/init.log 2>&1") == 0,
        "mysql data dir initialization failed")
      assert(sh(s"$server --datadir=$dataDir --socket=$sock --skip-networking " +
        s"--pid-file=$work/mysqld.pid > $work/mysqld.log 2>&1 &") == 0, "mysqld start failed")
      // wait for the socket
      var tries = 0
      while (sh(s"$mysql -e 'SELECT 1' > /dev/null 2>&1") != 0 && tries < 60) {
        Thread.sleep(500); tries += 1
      }
      assert(tries < 60, "mysqld did not come up")

      sh(s"$mysql -e 'CREATE DATABASE graft_base; CREATE DATABASE graft_target'")

      // Port the reference DDL: strip CREATE DATABASE/USE; apply the
      // FIXTURES §3 correction (drop the FK on the undeclared
      // receiver_id column — finding #5, the missing column, survives).
      def portDdl(src: String): String =
        new String(Files.readAllBytes(Paths.get(src)), "UTF-8")
          .replace(",\n  FOREIGN KEY (receiver_id) REFERENCES users(id)", "")
          .linesIterator
          .filterNot(l => l.startsWith("CREATE DATABASE") || l.startsWith("USE "))
          .mkString("\n")
      val f1 = s"$work/base_ddl.sql"; val f2 = s"$work/target_ddl.sql"
      Files.write(Paths.get(f1), portDdl(s"$refDir/base.sql").getBytes("UTF-8"))
      Files.write(Paths.get(f2), portDdl(s"$refDir/target.sql").getBytes("UTF-8"))
      assert(sh(s"$mysql graft_base < $f1") == 0, "base DDL load failed")
      assert(sh(s"$mysql graft_target < $f2") == 0, "target DDL load failed")

      // ---- run the PRODUCTION dialect SQL via the batch client ----
      // batch mode emits tab-separated rows with a header; NULLs print
      // as the literal "NULL" (the dialect SQL coalesces them away).
      def runSql(db: String, sql: String, out: String): String = {
        val sqlFile = s"$work/$out.sql"
        Files.write(Paths.get(sqlFile), sql.getBytes("UTF-8"))
        val tsv = shOut(s"$mysql $db < $sqlFile")
        val tsvFile = s"$work/$out.tsv"
        Files.write(Paths.get(tsvFile), tsv.getBytes("UTF-8"))
        tsvFile
      }
      def readTsv(path: String): DataFrame = {
        val df = spark.read.option("header", "true").option("sep", "\t").csv(path)
        df.columns.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(""))))
      }
      def snap(db: String): SchemaSnapshot = {
        val tables = readTsv(runSql(db, MySql.tablesSql, s"${db}_tables"))
        val columns = readTsv(runSql(db, MySql.columnsSql, s"${db}_columns"))
          .withColumn("ordinal", col("ordinal").cast("int"))
          .withColumn("is_nullable", col("is_nullable") === "1")
          .withColumn("is_auto_increment", col("is_auto_increment") === "1")
        val indexes = MySql.postProcessIndexes(
          readTsv(runSql(db, MySql.indexesSql, s"${db}_indexes"))
            .withColumn("ordinal", col("ordinal").cast("int"))
            .withColumn("is_unique", col("is_unique") === "1"))
        val fks = readTsv(runSql(db, MySql.foreignKeysSql, s"${db}_fks"))
          .withColumn("ordinal", col("ordinal").cast("int"))
        SchemaSnapshot(tables, columns, indexes, fks)
      }

      val base = snap("graft_base")
      val target = snap("graft_target")

      assert(base.tables.count() == 18, "FIXTURES §3: 18 base tables (incl. admins)")

      val report = Report.fromFindings(
        Diff.diff(base, target, DiffOptions(compareTableComments = true)))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      val all: Set[String] = report.values.flatten.toSet

      // FIXTURES.md §3 expected findings (README.md:55-80 golden subset
      // among them), as rendered by Messages in English mode.
      val expected = Seq(
        "Column: posts.id has different AUTO_INCREMENT. => AUTO_INCREMENT != NOT AUTO_INCREMENT",
        "Column: comments.body has different nullable. => NOT NULL != NULL",
        "Column: tags.name has different data type. => varchar(255) != varchar(155)",
        "Column: messages.receiver_id exists in the base database, but not in the target database.",
        "Table: blocks exists in the base database, but not in the target database.",
        "Index: followers.idx_follower_follower_id exists in the base database, but not in the target database.",
        "Column: admins.id has different AUTO_INCREMENT. => AUTO_INCREMENT != NOT AUTO_INCREMENT")
      expected.foreach(m => assert(all.contains(m),
        s"missing finding: $m\nhave: ${all.mkString("\n")}"))
      // default drift renders with MySQL's quoting of defaults; assert
      // on the stable prefix
      assert(all.exists(_.startsWith("Column: posts.title has different default value.")),
        s"default-drift finding missing in: ${all.mkString("\n")}")
      // FK + auto-index drift on reports_fk_test (README golden #9/#10)
      assert(all.exists(m => m.startsWith("Foreign Key: reports_fk_test.") &&
        m.contains("exists in the base database")),
        s"FK-missing finding missing in: ${all.mkString("\n")}")

      val flat = report.values.flatten.toSeq
      assert(flat.size == flat.distinct.size, "duplicate findings — join fan-out in dialect SQL")
    } finally {
      sh(s"sh -c 'kill $$(cat $work/mysqld.pid) 2>/dev/null'")
      ()
    }
  }
}
