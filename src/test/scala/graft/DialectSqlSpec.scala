package graft

import graft.dialect.{Dialect, MySql, Postgres}

/** Golden + structural validation of the dialect introspection SQL.
  *
  * The sandbox has no live PostgreSQL/MySQL, so these queries cannot be
  * executed for real (JdbcSnapshotSpec exercises the JDBC pathway via
  * Derby with Derby-flavoured SQL). This spec is the drift gate instead:
  *
  *  1. a GOLDEN pin of the exact SQL text per dialect per entity — any
  *     edit to the shipped SQL fails here until the golden is
  *     consciously updated against the reference semantics
  *     (reference postgres.rs:50-148, mysql.rs:37-124);
  *  2. a parser-level lint — balanced parentheses and string literals,
  *     no statement terminator (every query is wrapped as a JDBC
  *     subquery `(sql) graft_snap`, where a stray `;` or unbalanced
  *     quote breaks the wrap on the server);
  *  3. the SELECT-list alias contract — each query's depth-0 output
  *     columns must match the [[graft.schema]] Model contract exactly
  *     and in order, since `Snapshot.fromJdbc` consumes them
  *     positionally-by-name into the typed frames;
  *  4. the referenced catalog objects must stay the reference's set —
  *     drifting to a different catalog table IS a semantic change.
  */
class DialectSqlSpec extends org.scalatest.funsuite.AnyFunSuite {

  // ---- a tiny depth/quote-aware scanner (the "parser level") ----------

  /** Strip string literals ('' escapes included), then check balance. */
  private def lint(name: String, sql: String): Unit = {
    assert(!sql.contains(";"), s"$name: ';' breaks the JDBC subquery wrap")
    var depth = 0
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1 // escaped ''
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '('  => depth += 1
        case ')'  => depth -= 1; assert(depth >= 0, s"$name: unbalanced ')' at $i")
        case _    => ()
      }
      i += 1
    }
    assert(!inStr, s"$name: unterminated string literal")
    assert(depth == 0, s"$name: unbalanced parentheses (depth $depth at end)")
  }

  /** Depth-0 SELECT-list aliases, in order. Alias resolution mirrors
    * SQL: explicit `AS x` wins, else the last dotted path segment.
    */
  private def selectAliases(sql: String): Seq[String] = {
    val s = sql.replaceAll("\\s+", " ").trim
    val upper = s.toUpperCase
    require(upper.startsWith("SELECT "), s"not a SELECT: $s")
    // find the depth-0 FROM
    var depth = 0
    var inStr = false
    var fromAt = -1
    var i = 0
    while (i < s.length && fromAt < 0) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(" FROM ", i)) fromAt = i
      }
      i += 1
    }
    require(fromAt > 0, s"no depth-0 FROM in: $s")
    val list = s.substring("SELECT ".length, fromAt)
    // split on depth-0 commas
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    depth = 0; inStr = false
    list.foreach { c =>
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case '('  => depth += 1; cur += c
        case ')'  => depth -= 1; cur += c
        case ','  if depth == 0 => items += cur.toString; cur.clear()
        case _    => cur += c
      }
    }
    items += cur.toString
    items.map(_.trim).map { item =>
      val asIdx = item.toUpperCase.lastIndexOf(" AS ")
      if (asIdx >= 0) item.substring(asIdx + 4).trim
      else item.split("\\.").last.trim
    }.toSeq
  }

  /** Referenced catalog objects: identifiers following FROM/JOIN. */
  private def catalogRefs(sql: String): Set[String] = {
    val re = "(?i)\\b(?:FROM|JOIN)\\s+([a-z_][a-z0-9_.]*)".r
    re.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
  }

  private val contractTables = Seq("table_name", "table_comment")
  private val contractColumns = Seq("table_name", "column_name", "ordinal",
    "data_type", "default_value", "is_nullable", "comment", "is_auto_increment")
  // pre-postProcessIndexes shape: columns_csv is split client-side
  private val contractIndexes = Seq("table_name", "index_name", "ordinal",
    "columns_csv", "predicate", "is_unique")
  private val contractFks = Seq("table_name", "constraint_name", "ordinal",
    "column_name", "ref_table", "ref_column")

  private def checkDialect(d: Dialect): Unit = {
    val all = Seq(
      "tables" -> d.tablesSql, "columns" -> d.columnsSql,
      "indexes" -> d.indexesSql, "foreignKeys" -> d.foreignKeysSql,
      "ping" -> d.pingSql)
    all.foreach { case (n, sql) => lint(s"${d.name}.$n", sql) }
    assert(selectAliases(d.tablesSql) == contractTables, d.name)
    assert(selectAliases(d.columnsSql) == contractColumns, d.name)
    assert(selectAliases(d.indexesSql) == contractIndexes, d.name)
    assert(selectAliases(d.foreignKeysSql) == contractFks, d.name)
  }

  test("postgres SQL: lint + snapshot column contract") { checkDialect(Postgres) }
  test("mysql SQL: lint + snapshot column contract") { checkDialect(MySql) }

  test("postgres references exactly the reference's catalog objects") {
    // reference postgres.rs:50-148: information_schema +
    // pg_class/pg_description/pg_namespace/pg_index/pg_attribute
    assert(catalogRefs(Postgres.tablesSql) == Set(
      "information_schema.tables", "pg_catalog.pg_class",
      "pg_catalog.pg_namespace", "pg_catalog.pg_description"))
    assert(catalogRefs(Postgres.columnsSql) == Set(
      "information_schema.columns", "pg_catalog.pg_class",
      "pg_catalog.pg_namespace", "pg_catalog.pg_description"))
    assert(catalogRefs(Postgres.indexesSql) == Set(
      "pg_class", "pg_index", "pg_attribute", "pg_catalog.pg_namespace"))
    assert(catalogRefs(Postgres.foreignKeysSql) == Set(
      "information_schema.table_constraints",
      "information_schema.key_column_usage",
      "information_schema.constraint_column_usage"))
  }

  test("mysql references exactly the reference's catalog objects") {
    // reference mysql.rs:37-124: information_schema only
    assert(catalogRefs(MySql.tablesSql) == Set("information_schema.tables"))
    assert(catalogRefs(MySql.columnsSql) == Set("information_schema.columns"))
    assert(catalogRefs(MySql.indexesSql) == Set("information_schema.statistics"))
    assert(catalogRefs(MySql.foreignKeysSql) == Set(
      "information_schema.key_column_usage",
      "information_schema.referential_constraints"))
  }

  test("both dialects scope every catalog query to the connected schema") {
    Seq(Postgres.tablesSql, Postgres.columnsSql, Postgres.indexesSql).foreach(sql =>
      assert(sql.contains("'public'"), "pg queries scope to the public schema"))
    Seq(MySql.tablesSql, MySql.columnsSql, MySql.indexesSql, MySql.foreignKeysSql)
      .foreach(sql => assert(sql.contains("DATABASE()"),
        "mysql queries scope to the connected database"))
  }

  test("golden: the shipped SQL text is pinned (update consciously vs the reference)") {
    def norm(s: String) = s.replaceAll("\\s+", " ").trim
    // a cheap but exact fingerprint per query: (normalized length, hash)
    val got = Seq(
      Postgres.tablesSql, Postgres.columnsSql, Postgres.indexesSql,
      Postgres.foreignKeysSql, MySql.tablesSql, MySql.columnsSql,
      MySql.indexesSql, MySql.foreignKeysSql).map(s => {
        val n = norm(s); (n.length, n.hashCode)
      })
    val want = Seq(
      (363, -1929028485), (691, -1586955103), (641, -706724208), (523, -2064080176),
      (126, 1183176401), (343, 1993884563), (323, -566591616), (475, 117514231))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"dialect SQL #$i drifted: got $g want $w — " +
        "re-derive from reference postgres.rs/mysql.rs and update this golden")
    }
  }
}
