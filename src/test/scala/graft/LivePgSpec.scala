package graft

import java.io.File
import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dialect.Postgres
import graft.diff.{Diff, DiffOptions, Report}
import graft.schema.SchemaSnapshot

/** LIVE PostgreSQL validation of the dialect catalog SQL.
  *
  * The flagship `diff-jdbc` path ships the SQL in
  * [[graft.dialect.Postgres]] (the repo's equivalent of reference
  * postgres.rs:50-148); before this spec it had only ever executed
  * against Derby through a Derby-flavoured test dialect. Here we boot a
  * REAL PostgreSQL server (the container ships postgres 15 binaries but
  * no pgjdbc jar, so transport is `psql --csv` rather than
  * `spark.read.jdbc` — the SQL strings under test are byte-identical to
  * what the JDBC path pushes down as `(sql) graft_snap` subqueries),
  * load the reference's own seeded drift corpus
  * (`examples/postgres/{base,target}.sql`), run all four production
  * catalog queries against both live databases, feed the results
  * through the real diff engine, and assert the FIXTURES.md §2 expected
  * finding set.
  *
  * The reference DDL carries no COMMENT ON statements, so the
  * pg_description join paths would be exercised only trivially; the
  * setup seeds a table comment and a drifting column comment to prove
  * the (objoid, objsubid) joins resolve real comments.
  *
  * Env-gated: skips (assume) when postgres binaries, the postgres OS
  * user, or the reference examples are unavailable.
  */
class LivePgSpec extends SparkSpec {

  private val pgBin = "/usr/local/bin"
  private val refDir = "/root/reference/examples/postgres"

  private def haveEnv: Boolean =
    new File(s"$pgBin/initdb").exists &&
      new File(s"$pgBin/pg_ctl").exists &&
      Seq("which", "psql").! == 0 &&
      Seq("id", "postgres").! == 0 &&
      new File(s"$refDir/base.sql").exists

  /** Run a command as the postgres OS user (the server refuses root). */
  private def asPg(cmd: String): Int =
    Seq("su", "postgres", "-s", "/bin/bash", "-c", s"cd /tmp && $cmd").!

  private def asPgOut(cmd: String): String =
    Seq("su", "postgres", "-s", "/bin/bash", "-c", s"cd /tmp && $cmd").!!

  test("dialect catalog SQL end-to-end against live PostgreSQL (reference example corpus)") {
    assume(haveEnv, "postgres binaries / user / reference examples unavailable")

    val work = Files.createTempDirectory("graft-livepg").toFile
    work.setReadable(true, false); work.setWritable(true, false); work.setExecutable(true, false)
    val dataDir = s"${work.getAbsolutePath}/data"
    val sock = work.getAbsolutePath
    val port = 54390 + (ProcessHandle.current().pid() % 97).toInt
    val psql = s"psql -h $sock -p $port"

    try {
      assert(asPg(s"initdb -D $dataDir -A trust") == 0, "initdb failed")
      // Socket-only server: listen_addresses='' avoids TCP port clashes.
      assert(asPg(s"pg_ctl -D $dataDir -l $work/pg.log -o \"-p $port -k $sock -c listen_addresses=''\" start") == 0,
        "pg_ctl start failed")

      asPg(s"$psql -d postgres -c 'CREATE DATABASE graft_base' -c 'CREATE DATABASE graft_target'")

      // The reference scripts CREATE DATABASE prod/dev and \c into them;
      // strip those so base and target land in separate databases here.
      def portDdl(src: String, extra: String): String = {
        val ddl = new String(Files.readAllBytes(Paths.get(src)), "UTF-8")
          .linesIterator
          .filterNot(l => l.startsWith("CREATE DATABASE") || l.startsWith("\\c"))
          .mkString("\n")
        ddl + "\n" + extra + "\n"
      }
      // Seeded comments: prove the pg_description joins fetch real rows.
      val f1 = s"$work/base_ddl.sql"
      val f2 = s"$work/target_ddl.sql"
      Files.write(Paths.get(f1), portDdl(s"$refDir/base.sql",
        "COMMENT ON TABLE users IS 'user accounts';\n" +
          "COMMENT ON COLUMN users.email IS 'login email';").getBytes("UTF-8"))
      Files.write(Paths.get(f2), portDdl(s"$refDir/target.sql",
        "COMMENT ON COLUMN users.email IS 'contact email';").getBytes("UTF-8"))
      new File(f1).setReadable(true, false); new File(f2).setReadable(true, false)
      assert(asPg(s"$psql -v ON_ERROR_STOP=1 -d graft_base -f $f1") == 0, "base DDL load failed")
      assert(asPg(s"$psql -v ON_ERROR_STOP=1 -d graft_target -f $f2") == 0, "target DDL load failed")

      // ---- run the PRODUCTION dialect SQL over psql, parse CSV ----
      def runSql(db: String, sql: String, out: String): String = {
        val sqlFile = s"$work/$out.sql"
        Files.write(Paths.get(sqlFile), sql.getBytes("UTF-8"))
        new File(sqlFile).setReadable(true, false)
        val csv = asPgOut(s"$psql -d $db --csv -f $sqlFile")
        val csvFile = s"$work/$out.csv"
        Files.write(Paths.get(csvFile), csv.getBytes("UTF-8"))
        csvFile
      }
      // psql CSV: booleans are t/f, NULLs are empty (the dialect SQL
      // coalesces every nullable string to '', so empty ≡ '' here).
      def readCsv(path: String): DataFrame = {
        val df = spark.read.option("header", "true").csv(path)
        df.columns.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(""))))
      }
      def snap(db: String): SchemaSnapshot = {
        val tables = readCsv(runSql(db, Postgres.tablesSql, s"${db}_tables"))
        val columns = readCsv(runSql(db, Postgres.columnsSql, s"${db}_columns"))
          .withColumn("ordinal", col("ordinal").cast("int"))
          .withColumn("is_nullable", col("is_nullable") === "t")
          .withColumn("is_auto_increment", col("is_auto_increment") === "t")
        val indexes = Postgres.postProcessIndexes(
          readCsv(runSql(db, Postgres.indexesSql, s"${db}_indexes"))
            .withColumn("ordinal", col("ordinal").cast("int"))
            .withColumn("is_unique", col("is_unique") === "t"))
        val fks = readCsv(runSql(db, Postgres.foreignKeysSql, s"${db}_fks"))
          .withColumn("ordinal", col("ordinal").cast("int"))
        SchemaSnapshot(tables, columns, indexes, fks)
      }

      val base = snap("graft_base")
      val target = snap("graft_target")

      // Live-catalog sanity: the corpus is 16 tables / 45 columns.
      assert(base.tables.count() == 16)
      assert(base.columns.count() == 45)
      assert(base.tables.filter(col("table_comment") === "user accounts").count() == 1,
        "pg_description table-comment join fetched nothing")
      assert(base.columns.filter(col("comment") === "login email").count() == 1,
        "pg_description column-comment join fetched nothing")

      val report = Report.fromFindings(Diff.diff(base, target, DiffOptions()))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      val all: Set[String] = report.values.flatten.toSet

      // FIXTURES.md §2 expected findings, as rendered by Messages.
      val expected = Seq(
        "Column: users.id has different data type. => integer != bigint",
        "Column: posts.title has different data type. => varchar(255) != varchar(100)",
        "Column: tags.name has different nullable. => NOT NULL != NULL",
        "Column: likes.user_id has different data type. => integer != bigint",
        "Foreign Key: notifications.notifications_user_id_fkey exists in the base database, but not in the target database.",
        "Column: sessions.user_id exists in the base database, but not in the target database.",
        "Index: users.idx_user_name_email has different columns. Please check the order. => name, email != email, name",
        "Index: likes.idx_like_post_id exists in the base database, but not in the target database.",
        "Index: key_values.key_values_pkey exists in the base database, but not in the target database.",
        "Foreign Key: reports_fk_test.reports_fk_test_post_id_fkey references different column. => posts.id != messages.id",
        // the seeded comment drift through the live pg_description join
        "Column: users.email has different comment. => login email != contact email")
      expected.foreach(m => assert(all.contains(m), s"missing finding: $m\nhave: ${all.mkString("\n")}"))

      // The partial-index predicate arrives via pg_get_expr, which
      // parenthesizes: assert on the live rendering.
      assert(all.exists(m => m.startsWith("Index: comments.idx_comment_post_id has different predicate.")
        && m.contains("post_id IS NOT NULL")), s"predicate finding missing in: ${all.mkString("\n")}")

      // Fan-out guard: no duplicated finding lines (a constraint_column_usage
      // or pg_attribute join explosion would duplicate rows before grouping).
      val flat = report.values.flatten.toSeq
      assert(flat.size == flat.distinct.size, "duplicate findings — join fan-out in dialect SQL")
    } finally {
      asPg(s"pg_ctl -D $dataDir stop -m immediate")
      ()
    }
  }
}
