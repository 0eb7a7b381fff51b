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

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case SchemaDiffStmt(basePath, targetPath, lang) =>
      val language = Option(lang).map(_.toLowerCase) match {
        case Some("ko") | Some("korean") => Messages.Korean
        case _                           => Messages.English
      }
      val base = Snapshot.fromParquetDir(session, basePath)
      val target = Snapshot.fromParquetDir(session, targetPath)
      Report.fromFindings(Diff.diff(base, target, DiffOptions(language = language)))
        .queryExecution.logical
    case DataDiffStmt(basePath, targetPath, table, keys) =>
      val keyCols = keys.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(keyCols.nonEmpty,
        s"DATA DIFF: KEY (...) must list at least one column, got '$keys'")
      graft.ext.DataDiff.rowDiff(
          session.read.parquet(s"$basePath/$table.parquet"),
          session.read.parquet(s"$targetPath/$table.parquet"),
          keyCols)
        .queryExecution.logical
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
