package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

import graft.diff.{Diff, DiffOptions, Messages, Report}
import graft.schema.Snapshot

/** SQL surface for the flagship pipeline (the syntax SURVEY.md §4.3
  * deferred in round 1) and its row-data twin:
  *
  * {{{
  * SCHEMA DIFF ('/path/to/base', '/path/to/target') [LANG ko|en]
  * DATA DIFF ('/path/to/base', '/path/to/target') TABLE t KEY (k1, k2)
  * }}}
  *
  * Both paths are parquet directories (schema-from-footer snapshots,
  * [[Snapshot.fromParquetDir]]); SCHEMA DIFF evaluates to the
  * per-table report frame [[Report.fromFindings]] produces, DATA DIFF
  * to the row-level [[graft.ext.DataDiff.rowDiff]] frame
  * (added/removed/changed rows with per-column change lists) for
  * `<path>/t.parquet` keyed by the listed columns — the same DAGs the
  * Dataset API builds, so Catalyst/AQE treatment is identical.
  * Injected via `spark.sql.extensions=graft.GraftSparkExtensions`;
  * every other statement falls through to the delegate parser
  * untouched.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val SchemaDiffStmt =
    """(?is)\s*SCHEMA\s+DIFF\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)(?:\s+LANG\s+([A-Za-z]+))?\s*;?\s*""".r
  private val DataDiffStmt =
    """(?is)\s*DATA\s+DIFF\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+KEY\s*\(\s*([^)]+?)\s*\)\s*;?\s*""".r

  /** Statement-construction failures (missing path, unreadable parquet,
    * empty KEY list) surface as a standard [[ParseException]] rather
    * than raw IllegalArgumentException/IO errors: these statements read
    * parquet footers at parse time (the snapshot IS the schema), so
    * without the wrap a bad path would fail with an error no SQL tool
    * recognizes as "your statement is wrong".
    */
  private def statement[T](sqlText: String)(body: => T): T =
    try body
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new org.apache.spark.sql.catalyst.parser.ParseException(
          Some(sqlText), org.apache.spark.sql.catalyst.trees.Origin(),
          "_LEGACY_ERROR_TEMP_0064",
          Map("msg" -> s"invalid GRAFT DIFF statement: ${e.getMessage}"))
    }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case SchemaDiffStmt(basePath, targetPath, lang) => statement(sqlText) {
      val language = Option(lang).map(_.toLowerCase) match {
        case Some("ko") | Some("korean") => Messages.Korean
        case _                           => Messages.English
      }
      val base = Snapshot.fromParquetDir(session, basePath)
      val target = Snapshot.fromParquetDir(session, targetPath)
      Report.fromFindings(Diff.diff(base, target, DiffOptions(language = language)))
        .queryExecution.logical
    }
    case DataDiffStmt(basePath, targetPath, table, keys) => statement(sqlText) {
      val keyCols = keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(keyCols.nonEmpty,
        s"DATA DIFF: KEY (...) must list at least one column, got '$keys'")
      graft.ext.DataDiff.rowDiff(
          session.read.parquet(s"$basePath/$table.parquet"),
          session.read.parquet(s"$targetPath/$table.parquet"),
          keyCols)
        .queryExecution.logical
    }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
