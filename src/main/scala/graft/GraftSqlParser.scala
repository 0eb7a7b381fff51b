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
  * deferred in round 1):
  *
  * {{{
  * SCHEMA DIFF ('/path/to/base', '/path/to/target') [LANG ko|en]
  * }}}
  *
  * Both paths are parquet directories (schema-from-footer snapshots,
  * [[Snapshot.fromParquetDir]]); the statement evaluates to the
  * per-table report frame [[Report.fromFindings]] produces — the same
  * DAG the Dataset API builds, so Catalyst/AQE treatment is identical.
  * Injected via `spark.sql.extensions=graft.GraftSparkExtensions`;
  * every other statement falls through to the delegate parser
  * untouched.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val SchemaDiffStmt =
    """(?is)\s*SCHEMA\s+DIFF\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)(?:\s+LANG\s+([A-Za-z]+))?\s*;?\s*""".r

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
