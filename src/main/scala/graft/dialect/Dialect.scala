package graft.dialect

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-DBMS catalog introspection SQL, pushed down through the JDBC
  * source as subquery tables (`spark.read.jdbc(url, "(sql) t", ...)`).
  *
  * Design note vs the reference (myyrakle/magiceye): the reference runs
  * these queries once PER TABLE with a `WHERE table_name = $1` bind
  * (reference postgres.rs:46-199, mysql.rs:33-151 — `1 + 3..4·N` round
  * trips). We drop the per-table predicate, filter by schema only, and
  * key every row by `table_name`, so one server-side query returns the
  * whole catalog per entity kind. Server-only functions the reference
  * leans on (`pg_get_expr`, `array_position(indkey)`, `GROUP_CONCAT`)
  * stay server-side inside the pushdown — re-implementing pg's
  * `int2vector` client-side would be wasted work (SURVEY.md §7.3).
  *
  * Every query must produce the [[graft.schema.SchemaSnapshot]] column
  * contract: see the case classes in `graft.schema.Model`.
  */
trait Dialect {
  def name: String
  def tablesSql: String
  def columnsSql: String
  def indexesSql: String
  def foreignKeysSql: String
  /** Probe statement for a connection health check (reference S3).
    * The literal is aliased because Spark wraps this as a subquery
    * (`SELECT * FROM (...) x`) and some DBMSs reject unnamed derived
    * columns.
    */
  def pingSql: String = "SELECT 1 AS ping"
  /** Dialect-specific fixup of the raw indexes frame (e.g. split a
    * comma-joined column list into an array). Default: identity.
    */
  def postProcessIndexes(df: DataFrame): DataFrame = df

  /** Server-side predicate selecting bucket `bucket` of `buckets`
    * by a hash of `table_name`, used to split a catalog read into
    * parallel JDBC partitions for very large (100k-table) catalogs.
    * The predicates must PARTITION the rows: every row satisfies
    * exactly one bucket's predicate, or the snapshot would drop or
    * duplicate catalog entries. The default uses only `MOD`/`LENGTH`
    * (portable to every tested DBMS incl. Derby); dialects override
    * with a real server-side hash for better balance.
    */
  def tableNameBucketSql(buckets: Int, bucket: Int): String =
    s"MOD(LENGTH(table_name), $buckets) = $bucket"
}

/** PostgreSQL catalog introspection (reference `src/sql/postgres.rs`).
  *
  * - Column type rendering reproduces `format_type` (postgres.rs:39-44):
  *   `character varying` → `varchar(<len>)`, all else verbatim.
  * - Column comments come from `pg_description` joined on
  *   `(objoid, objsubid = ordinal_position)`; the reference's correlated
  *   scalar subquery (postgres.rs:58-68) becomes a plain join through
  *   `pg_class`/`pg_namespace`, evaluated entirely server-side.
  * - Index column order via `array_position(ix.indkey, a.attnum)`
  *   (postgres.rs:114); aggregated server-side to a comma list, split to
  *   an ordered array client-side.
  */
object Postgres extends Dialect {
  val name = "postgres"

  val tablesSql: String = """
    SELECT t.table_name,
           coalesce(pgd.description, '') AS table_comment
    FROM information_schema.tables t
    LEFT JOIN pg_catalog.pg_class c
      ON c.relname = t.table_name
     AND c.relnamespace = (SELECT oid FROM pg_catalog.pg_namespace WHERE nspname = 'public')
    LEFT JOIN pg_catalog.pg_description pgd
      ON pgd.objoid = c.oid AND pgd.objsubid = 0
    WHERE t.table_schema = 'public'"""

  val columnsSql: String = """
    SELECT
        c.table_name,
        c.column_name,
        c.ordinal_position AS ordinal,
        CASE WHEN c.data_type = 'character varying'
             THEN 'varchar(' || coalesce(c.character_maximum_length, 0) || ')'
             ELSE c.data_type END AS data_type,
        coalesce(c.column_default, '') AS default_value,
        (c.is_nullable = 'YES') AS is_nullable,
        coalesce(pgd.description, '') AS comment,
        false AS is_auto_increment
    FROM information_schema.columns c
    LEFT JOIN pg_catalog.pg_class cls
      ON cls.relname = c.table_name
     AND cls.relnamespace = (SELECT oid FROM pg_catalog.pg_namespace WHERE nspname = 'public')
    LEFT JOIN pg_catalog.pg_description pgd
      ON pgd.objoid = cls.oid AND pgd.objsubid = c.ordinal_position
    WHERE c.table_schema = 'public'"""

  val indexesSql: String = """
    SELECT
        t.relname AS table_name,
        i.relname AS index_name,
        row_number() OVER (PARTITION BY t.relname ORDER BY i.relname) AS ordinal,
        string_agg(a.attname, ',' ORDER BY array_position(ix.indkey, a.attnum)) AS columns_csv,
        coalesce(pg_get_expr(ix.indpred, ix.indrelid), '') AS predicate,
        ix.indisunique AS is_unique
    FROM pg_class t
    JOIN pg_index ix ON t.oid = ix.indrelid
    JOIN pg_class i ON i.oid = ix.indexrelid
    JOIN pg_attribute a ON a.attrelid = t.oid AND a.attnum = ANY(ix.indkey)
    WHERE t.relnamespace = (SELECT oid FROM pg_catalog.pg_namespace WHERE nspname = 'public')
    GROUP BY t.relname, i.relname, ix.indisunique, ix.indpred, ix.indrelid"""

  val foreignKeysSql: String = """
    SELECT
        tc.table_name,
        tc.constraint_name,
        row_number() OVER (PARTITION BY tc.table_name ORDER BY tc.constraint_name) AS ordinal,
        kcu.column_name,
        ccu.table_name AS ref_table,
        ccu.column_name AS ref_column
    FROM information_schema.table_constraints AS tc
    JOIN information_schema.key_column_usage AS kcu
      ON tc.constraint_name = kcu.constraint_name
     AND tc.table_schema = kcu.table_schema
    JOIN information_schema.constraint_column_usage AS ccu
      ON ccu.constraint_name = tc.constraint_name
    WHERE tc.constraint_type = 'FOREIGN KEY'"""

  override def postProcessIndexes(df: DataFrame): DataFrame =
    df.withColumn("columns", split(col("columns_csv"), ","))
      .drop("columns_csv")
      .select("table_name", "index_name", "ordinal", "columns", "predicate", "is_unique")

  override def tableNameBucketSql(buckets: Int, bucket: Int): String =
    s"MOD(ABS(hashtext(table_name)), $buckets) = $bucket"
}

/** MySQL catalog introspection (reference `src/sql/mysql.rs`).
  *
  * - `column_type` is already rendered (`varchar(255)`), used verbatim
  *   (mysql.rs:41).
  * - `is_auto_increment` = substring test on `extra` (mysql.rs:65).
  * - The reference never fetches MySQL table comments (mysql.rs:144
  *   TODO) — we DO fetch them (`information_schema.tables.table_comment`)
  *   and document the reference gap; parity mode ignores the check.
  * - Index predicate is always `''` on MySQL (mysql.rs:98).
  */
object MySql extends Dialect {
  val name = "mysql"

  val tablesSql: String = """
    SELECT table_name,
           coalesce(table_comment, '') AS table_comment
    FROM information_schema.tables
    WHERE table_schema = DATABASE()"""

  val columnsSql: String = """
    SELECT
        table_name,
        column_name,
        ordinal_position AS ordinal,
        column_type AS data_type,
        coalesce(column_default, '') AS default_value,
        (is_nullable = 'YES') AS is_nullable,
        coalesce(column_comment, '') AS comment,
        (coalesce(extra, '') LIKE '%auto_increment%') AS is_auto_increment
    FROM information_schema.columns
    WHERE table_schema = DATABASE()"""

  val indexesSql: String = """
    SELECT
        table_name,
        index_name,
        ROW_NUMBER() OVER (PARTITION BY table_name ORDER BY index_name) AS ordinal,
        GROUP_CONCAT(column_name ORDER BY seq_in_index) AS columns_csv,
        '' AS predicate,
        !non_unique AS is_unique
    FROM information_schema.statistics
    WHERE table_schema = DATABASE()
    GROUP BY table_name, index_name, non_unique"""

  val foreignKeysSql: String = """
    SELECT
        kcu.table_name,
        kcu.constraint_name,
        ROW_NUMBER() OVER (PARTITION BY kcu.table_name ORDER BY kcu.constraint_name) AS ordinal,
        kcu.column_name,
        kcu.referenced_table_name AS ref_table,
        kcu.referenced_column_name AS ref_column
    FROM information_schema.key_column_usage kcu
    JOIN information_schema.referential_constraints rc
      ON kcu.constraint_name = rc.constraint_name
    WHERE kcu.table_name IS NOT NULL
      AND kcu.table_schema = DATABASE()
      AND rc.constraint_schema = DATABASE()"""

  override def postProcessIndexes(df: DataFrame): DataFrame =
    df.withColumn("columns", split(col("columns_csv"), ","))
      .drop("columns_csv")
      .select("table_name", "index_name", "ordinal", "columns", "predicate", "is_unique")

  override def tableNameBucketSql(buckets: Int, bucket: Int): String =
    s"MOD(crc32(table_name), $buckets) = $bucket"
}
