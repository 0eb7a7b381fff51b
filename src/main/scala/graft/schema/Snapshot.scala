package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.dialect.Dialect

/** Snapshot loaders.
  *
  * The reference acquires a snapshot with an N+1 loop: one table-list
  * query then 3-4 catalog queries PER TABLE, strictly sequential
  * (reference fetching.rs:29-50, background.rs:21-46 — `2*(1+4N)` round
  * trips per run). Spark-natively we do ONE set-oriented JDBC read per
  * entity kind (4 reads total per snapshot, regardless of table count),
  * each pushed down to the server as a single catalog query. At
  * 100k-table catalogs this is the difference between hours and seconds.
  */
object Snapshot {

  /** Connection health check (reference S3, postgres.rs:7-11: acquire a
    * connection as a ping). One pushed-down `SELECT 1` round trip;
    * throws the driver's SQLException on failure.
    */
  def ping(
      spark: SparkSession,
      url: String,
      dialect: Dialect,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    spark.read.jdbc(url, s"(${dialect.pingSql}) graft_ping", props).collect()
    ()
  }

  /** Snapshot of a live database via JDBC. Each entity kind is one
    * pushed-down server-side query (see [[graft.dialect.Postgres]] /
    * [[graft.dialect.MySql]] for the SQL). `numPartitions` > 1 splits
    * each catalog read into that many parallel JDBC partitions via
    * per-bucket `WHERE` predicates on a server-side hash of
    * `table_name` ([[graft.dialect.Dialect.tableNameBucketSql]]) — the
    * `predicates` overload of `spark.read.jdbc`, so a 100k-table
    * catalog streams over N connections instead of one. The buckets
    * partition the rows (each row matches exactly one predicate), so
    * the union is the same frame the single-partition read yields.
    */
  def fromJdbc(
      spark: SparkSession,
      url: String,
      dialect: Dialect,
      props: java.util.Properties = new java.util.Properties(),
      numPartitions: Int = 1): SchemaSnapshot = {
    def read(sql: String): DataFrame =
      if (numPartitions <= 1) spark.read.jdbc(url, s"($sql) graft_snap", props)
      else spark.read.jdbc(url, s"($sql) graft_snap",
        Array.tabulate(numPartitions)(i => dialect.tableNameBucketSql(numPartitions, i)),
        props)
    SchemaSnapshot(
      tables = read(dialect.tablesSql),
      columns = read(dialect.columnsSql),
      indexes = dialect.postProcessIndexes(read(dialect.indexesSql)),
      foreignKeys = read(dialect.foreignKeysSql))
  }

  /** `mysql-wire://user@host:port/db` — the URL scheme that routes a
    * CLI connection through the driverless wire client
    * ([[fromMySqlWire]]) instead of JDBC. Matches the reference's
    * mysql connection config shape (host/port/user/database) without
    * requiring a driver jar on the classpath.
    */
  object WireUrl {
    private val Re = "^mysql-wire://([^@/]+)@([^:/]+):([0-9]+)/(.+)$".r
    def unapply(url: String): Option[(String, String, Int, String)] = url match {
      case Re(user, host, port, db) => Some((user, host, port.toInt, db))
      case _ => None
    }
  }

  /** COM_PING over the wire client — the [[ping]] analog for
    * `mysql-wire://` connections (reference S3 on the driverless path).
    */
  def pingMySqlWire(host: String, port: Int, user: String, database: String): Unit = {
    val client = new graft.mysql.MySqlWire.Client(host, port, user, database)
    try client.ping() finally client.close()
  }

  /** Snapshot of a live MySQL database over the RAW WIRE PROTOCOL —
    * the driverless fallback for environments with a MySQL server but
    * no JDBC driver on the classpath ([[graft.mysql.MySqlWire]]). Same
    * four set-oriented catalog queries as [[fromJdbc]] with the
    * [[graft.dialect.MySql]] dialect, same output contract; values
    * arrive in the text protocol (everything a string, booleans as
    * MySQL's 1/0 rendering) and are cast here exactly as the JDBC
    * path's driver would. Catalog frames are driver-local
    * (`createDataFrame` over collected rows): catalogs are metadata-
    * sized by definition — the 100k-table parallel-read path stays
    * [[fromJdbc]] with `numPartitions`.
    */
  def fromMySqlWire(
      spark: SparkSession,
      host: String,
      port: Int,
      user: String,
      database: String): SchemaSnapshot = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField}
    val client = new graft.mysql.MySqlWire.Client(host, port, user, database)
    try {
      def frame(rs: graft.mysql.MySqlWire.ResultSet): DataFrame = {
        val schema = StructType(rs.columns.map(c => StructField(c, StringType, nullable = true)))
        spark.createDataFrame(
          java.util.Arrays.asList(rs.rows.map(r =>
            org.apache.spark.sql.Row.fromSeq(r)): _*), schema)
      }
      val d = graft.dialect.MySql
      val tables = frame(client.query(d.tablesSql))
      val columns = frame(client.query(d.columnsSql))
        .withColumn("ordinal", col("ordinal").cast("int"))
        .withColumn("is_nullable", col("is_nullable") === "1")
        .withColumn("is_auto_increment", col("is_auto_increment") === "1")
      val indexes = d.postProcessIndexes(
        frame(client.query(d.indexesSql))
          .withColumn("ordinal", col("ordinal").cast("int"))
          .withColumn("is_unique", col("is_unique") === "1"))
      val fks = frame(client.query(d.foreignKeysSql))
        .withColumn("ordinal", col("ordinal").cast("int"))
      SchemaSnapshot(tables, columns, indexes, fks)
    } finally client.close()
  }

  /** Treat a directory of parquet files as a "database": each
    * `<name>.parquet` is a table whose columns come from the parquet
    * schema (footer). Lets the testdata dirs act as diffable databases
    * and gives data-lake users schema drift checks with no DBMS at all.
    *
    * Footers are read through the Spark datasource (driver-side, tiny);
    * the resulting metadata frames are ordinary DataFrames.
    */
  def fromParquetDir(spark: SparkSession, dir: String): SchemaSnapshot = {
    val files = new java.io.File(dir).listFiles()
    val tableFiles = Option(files).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val tables = tableFiles.map { f =>
      val name = f.getName.stripSuffix(".parquet")
      name -> graft.sources.Tables.parquet(spark, f.getAbsolutePath).schema
    }
    fromSchemas(spark, tables.toSeq)
  }

  /** Build a snapshot from (tableName, StructType) pairs — the core of
    * [[fromParquetDir]] and handy for tests.
    */
  def fromSchemas(spark: SparkSession, tables: Seq[(String, StructType)]): SchemaSnapshot = {
    import spark.implicits._
    val tableMeta = tables.map { case (n, _) => TableMeta(n, "") }
    val colMeta = tables.flatMap { case (n, schema) =>
      schema.fields.zipWithIndex.map { case (f, i) =>
        ColumnMeta(
          table_name = n,
          column_name = f.name,
          ordinal = i + 1,
          data_type = f.dataType.sql.toLowerCase,
          default_value = "",
          is_nullable = f.nullable,
          comment = f.getComment().getOrElse(""),
          is_auto_increment = false)
      }
    }
    SchemaSnapshot(
      tables = tableMeta.toDF(),
      columns = colMeta.toDF(),
      indexes = spark.emptyDataset[IndexMeta].toDF(),
      foreignKeys = spark.emptyDataset[ForeignKeyMeta].toDF())
  }

  /** Build a snapshot from in-memory metadata rows (test fixtures). */
  def fromMeta(
      spark: SparkSession,
      tables: Seq[TableMeta],
      columns: Seq[ColumnMeta] = Seq.empty,
      indexes: Seq[IndexMeta] = Seq.empty,
      foreignKeys: Seq[ForeignKeyMeta] = Seq.empty): SchemaSnapshot = {
    import spark.implicits._
    SchemaSnapshot(
      tables = spark.createDataset(tables).toDF(),
      columns = spark.createDataset(columns).toDF(),
      indexes = spark.createDataset(indexes).toDF(),
      foreignKeys = spark.createDataset(foreignKeys).toDF())
  }
}
