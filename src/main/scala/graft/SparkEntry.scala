package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.diff.{Diff, DiffOptions, Report}
import graft.schema.Snapshot

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: schema-diff two "databases" (the sf0.001 parquet dir vs a
    * deterministically drifted copy of its own snapshot) and emit the
    * per-table report — the reference's `magiceye run` pipeline as one
    * Catalyst DAG. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val base = Snapshot.fromParquetDir(spark, "/root/testdata/sf0.001")
    // Synthetic drift: drop table `region`, drop column `l_comment`-like
    // (o_orderpriority), retype l_quantity — the three headline finding kinds.
    val target = base.copy(
      tables = base.tables.filter(col("table_name") =!= "region"),
      columns = base.columns
        .filter(!(col("table_name") === "orders" && col("column_name") === "o_orderpriority"))
        .withColumn("data_type",
          when(col("table_name") === "lineitem" && col("column_name") === "l_quantity",
            lit("decimal(12,2)")).otherwise(col("data_type"))))
    Report.fromFindings(Diff.diff(base, target, DiffOptions()))
  }

  /** One entry per implemented operator: SURVEY.md §2 parity keys
    * ([[Queries]]) + the dataset-scale extension layer ([[ExtQueries]]:
    * dedup, similarity search, text analysis, multimodal, events). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.all ++ Queries5.all ++ Queries6.all ++ Queries7.all ++ Queries8.all ++ Queries9.all ++ Queries11.all ++ Queries12.all ++ Queries13.all ++ Queries14.all ++ Queries15.all ++ Queries16.all ++ Queries17.all ++ ExtQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ Queries2.oracles ++ Queries3.oracles ++ Queries4.oracles ++ Queries5.oracles ++ Queries6.oracles ++ Queries7.oracles ++ Queries8.oracles ++ Queries9.oracles ++ Queries11.oracles ++ Queries12.oracles ++ Queries13.oracles ++ Queries14.oracles ++ Queries15.oracles ++ Queries16.oracles ++ Queries17.oracles ++ ExtQueries.oracles
}
