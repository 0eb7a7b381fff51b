package graft

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dialect.Dialect
import graft.diff.Diff
import graft.schema.Snapshot

/** End-to-end exercise of the JDBC snapshot path against embedded
  * Derby (the only DBMS on this classpath). The Postgres/MySQL dialect
  * SQL can't run on Derby, so a Derby test dialect introspects Derby's
  * own catalog (SYS.SYSTABLES/SYSCOLUMNS) — which drives exactly the
  * same engine path: `spark.read.jdbc(url, "(sql) graft_snap")`
  * subquery pushdown, column-contract projection, postProcessIndexes,
  * and the diff DAG over the result.
  */
class JdbcSnapshotSpec extends SparkSpec {

  /** Derby introspection meeting the SchemaSnapshot column contract. */
  private object DerbyDialect extends Dialect {
    val name = "derby-test"
    val tablesSql: String = """
      SELECT TABLENAME AS table_name, '' AS table_comment
      FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'"""
    val columnsSql: String = """
      SELECT t.TABLENAME AS table_name,
             c.COLUMNNAME AS column_name,
             c.COLUMNNUMBER AS ordinal,
             CAST(c.COLUMNDATATYPE AS VARCHAR(128)) AS data_type,
             '' AS default_value,
             CASE WHEN CAST(c.COLUMNDATATYPE AS VARCHAR(128)) LIKE '%NOT NULL%'
                  THEN FALSE ELSE TRUE END AS is_nullable,
             '' AS comment,
             CASE WHEN c.AUTOINCREMENTVALUE IS NULL THEN FALSE ELSE TRUE END
               AS is_auto_increment
      FROM SYS.SYSCOLUMNS c JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
      WHERE t.TABLETYPE = 'T'"""
    val indexesSql: String = """
      SELECT c.CONGLOMERATENAME AS index_name,
             t.TABLENAME AS table_name,
             1 AS ordinal,
             '' AS columns_csv, '' AS predicate,
             FALSE AS is_unique
      FROM SYS.SYSCONGLOMERATES c JOIN SYS.SYSTABLES t ON c.TABLEID = t.TABLEID
      WHERE c.ISINDEX AND t.TABLETYPE = 'T'"""
    val foreignKeysSql: String = """
      SELECT t.TABLENAME AS table_name,
             CAST('' AS VARCHAR(128)) AS constraint_name,
             1 AS ordinal,
             CAST('' AS VARCHAR(128)) AS column_name,
             CAST('' AS VARCHAR(128)) AS ref_table,
             CAST('' AS VARCHAR(128)) AS ref_column
      FROM SYS.SYSTABLES t WHERE 1 = 0"""
    override def postProcessIndexes(df: DataFrame): DataFrame =
      df.withColumn("columns", split(col("columns_csv"), ","))
        .drop("columns_csv")
        .select("table_name", "index_name", "ordinal", "columns", "predicate", "is_unique")
  }

  test("ping succeeds against a live database and fails against a dead one") {
    val dbDir = java.nio.file.Files.createTempDirectory("derbyping").toString
    val url = s"jdbc:derby:$dbDir/pingdb;create=true"
    DriverManager.getConnection(url).close()
    // Derby has no DUAL/одно-row builtin reachable via bare SELECT 1;
    // point pingSql at SYSDUMMY1 through a dialect override
    val d = new Dialect {
      val name = "derby-ping"
      val tablesSql = ""; val columnsSql = ""; val indexesSql = ""; val foreignKeysSql = ""
      override val pingSql = "SELECT 1 AS ping FROM SYSIBM.SYSDUMMY1"
    }
    Snapshot.ping(spark, url, d) // must not throw
    intercept[Exception] {
      Snapshot.ping(spark, s"jdbc:derby:$dbDir/nope_does_not_exist", d)
    }
  }

  test("Progress reports the 5-step shape with stage/task counts") {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val p = new graft.diff.Progress(spark, lines.append(_))
    try {
      val n = p.step("check")(spark.range(100).count())
      assert(n == 100L)
    } finally p.close()
    assert(lines.length == 2)
    assert(lines(0).contains("step 1 (check)"))
    assert(lines(1).matches(""".*done in .* s \(\d+ stages, \d+ tasks\)"""))
  }

  test("TuiProgress renders in-place frames with live counts and a final newline") {
    val out = new StringBuilder
    val p = new graft.cli.TuiProgress(spark, totalSteps = 2,
      write = s => out.synchronized { out.append(s); () },
      input = () => -2, framePeriodMs = 20L)
    try {
      val n = p.step("base snapshot")(spark.range(50).count())
      assert(n == 50L)
      Thread.sleep(80) // let the ticker paint a few frames
      p.step("check")(())
    } finally p.close()
    val s = out.synchronized(out.toString)
    val frames = s.split('\r').filter(_.nonEmpty)
    assert(frames.length >= 3, s"expected repainted frames, got: $s")
    assert(frames.exists(_.contains("[1/2]")) && frames.exists(_.contains("[2/2]")))
    assert(frames.exists(f => f.contains("base snapshot") && f.matches(""".*\d+ stages \d+ tasks.*""")))
    assert(s.endsWith("\n"), "close() must move off the progress line")
  }

  test("TuiProgress: q aborts — jobs cancelled, AbortRequested surfaces") {
    val sent = new java.util.concurrent.atomic.AtomicBoolean(false)
    val p = new graft.cli.TuiProgress(spark, totalSteps = 5,
      write = _ => (),
      input = () => if (sent.compareAndSet(false, true)) 'q' else -2,
      framePeriodMs = 10L)
    try {
      intercept[graft.cli.AbortRequested] {
        p.step("base snapshot") {
          // long enough that the abort lands mid-step
          spark.range(2000000000L).selectExpr("sum(id * id)").collect()
        }
        p.step("target snapshot")(())
      }
    } finally p.close()
  }

  test("JDBC sink round-trip: Spark writes a table over JDBC, snapshot + read see it") {
    val dbDir = java.nio.file.Files.createTempDirectory("derbysink").toString
    val url = s"jdbc:derby:$dbDir/sinkdb;create=true"
    DriverManager.getConnection(url).close()
    import spark.implicits._
    val src = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
      .toDF("ID", "NAME", "TOTAL")
    src.write.mode("overwrite")
      .jdbc(url, "SINK_DOCS", new java.util.Properties())
    // the written table is visible to the catalog snapshot path...
    val snap = Snapshot.fromJdbc(spark, url, DerbyDialect)
    assert(snap.tables.select("table_name").collect().map(_.getString(0))
      .contains("SINK_DOCS"))
    // ...and round-trips values through the JDBC source
    val back = spark.read.jdbc(url, "SINK_DOCS", new java.util.Properties())
    assert(back.count() == 3)
    assert(back.agg(sum($"TOTAL")).collect().head.getDouble(0) == 60.75)
    assert(back.schema.fieldNames.toSet == Set("ID", "NAME", "TOTAL"))
  }

  test("fromJdbc snapshots a live Derby and the diff DAG runs over it") {
    val dbDir = java.nio.file.Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE USERS (ID INT NOT NULL, NAME VARCHAR(64))")
      st.execute("CREATE TABLE ORDERS (ID INT NOT NULL, USER_ID INT, TOTAL DOUBLE)")
      st.close()
    } finally conn.close()

    val snap = Snapshot.fromJdbc(spark, url, DerbyDialect)
    val tables = snap.tables.select("table_name")
      .collect().map(_.getString(0)).toSet
    assert(tables == Set("USERS", "ORDERS"))
    val cols = snap.columns
      .filter(col("table_name") === "USERS")
      .orderBy("ordinal")
      .select("column_name", "is_nullable")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(cols.toSeq == Seq(("ID", false), ("NAME", true))) // NOT NULL honored

    // the diff DAG runs over JDBC-loaded snapshots: drop a table from
    // the "target" and expect exactly the table-missing finding
    val target = snap.copy(tables = snap.tables.filter(col("table_name") =!= "ORDERS"),
      columns = snap.columns.filter(col("table_name") =!= "ORDERS"))
    val msgs = Diff.diff(snap, target)
      .select("message").collect().map(_.getString(0)).toSeq
    assert(msgs == Seq(
      "Table: ORDERS exists in the base database, but not in the target database."))
  }

  test("partitioned fromJdbc: hash-bucket predicates split the scan and union to the same snapshot") {
    val dbDir = java.nio.file.Files.createTempDirectory("derbysplit").toString
    val url = s"jdbc:derby:$dbDir/splitdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // names of assorted lengths so the MOD(LENGTH(...)) buckets are non-trivial
      Seq("T1", "TAB_TWO", "TABLE_THREE_LONG", "T4X", "MEDIUM_FIVE")
        .foreach(n => st.execute(s"CREATE TABLE $n (ID INT NOT NULL, V VARCHAR(32))"))
      st.close()
    } finally conn.close()

    val one = Snapshot.fromJdbc(spark, url, DerbyDialect)
    val split = Snapshot.fromJdbc(spark, url, DerbyDialect, numPartitions = 3)
    // the predicate split is plan-visible: 3 JDBC partitions, not 1
    assert(split.tables.rdd.getNumPartitions == 3)
    assert(one.tables.rdd.getNumPartitions == 1)
    // and row-complete: every bucket hits exactly once, union == unsplit
    def names(df: org.apache.spark.sql.DataFrame) =
      df.select("table_name").collect().map(_.getString(0)).sorted.toSeq
    assert(names(split.tables) == names(one.tables))
    assert(names(split.columns) == names(one.columns))
    assert(split.columns.count() == one.columns.count())
  }
}
