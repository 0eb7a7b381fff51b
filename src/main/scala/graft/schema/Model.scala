package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Relational encoding of a database schema snapshot.
  *
  * The reference (myyrakle/magiceye) models a snapshot as
  * `HashMap<String, Table>` with nested `Vec<Column/Index/Constraint>`
  * (reference `src/sql/mod.rs:10-59`, `src/action/run/steps/fetching.rs:27-49`).
  * Spark-natively we normalize that into four flat DataFrames — one per
  * entity kind — so every diff check becomes a declarative join/filter
  * that Catalyst can optimize, and so a snapshot of a million-table
  * catalog is just four (partitionable) tables rather than a driver-side
  * hash map.
  */

/** One column of one table (reference `src/sql/mod.rs:10-18`).
  *
  * @param ordinal 1-based position in the table; carries the reference's
  *                `Vec` ordering through shuffles so reports can be
  *                rendered in original column order deterministically.
  */
case class ColumnMeta(
    table_name: String,
    column_name: String,
    ordinal: Int,
    data_type: String,
    default_value: String,
    is_nullable: Boolean,
    comment: String,
    is_auto_increment: Boolean)

/** One index (reference `src/sql/mod.rs:20-26`). `columns` is ORDERED —
  * order is significant in comparison (reference check.rs:267-282);
  * Spark array equality is element- and order-sensitive, matching exactly.
  */
case class IndexMeta(
    table_name: String,
    index_name: String,
    ordinal: Int,
    columns: Seq[String],
    predicate: String,
    is_unique: Boolean)

/** One foreign key (reference `src/sql/mod.rs:28-33,46-50`). The
  * reference's `column: Vec<String>` always holds exactly one element
  * (both loaders push one column per catalog row, postgres.rs:176-188),
  * so we flatten to a single `column_name`.
  */
case class ForeignKeyMeta(
    table_name: String,
    constraint_name: String,
    ordinal: Int,
    column_name: String,
    ref_table: String,
    ref_column: String)

/** Table-level metadata (reference `src/sql/mod.rs:52-59`). */
case class TableMeta(table_name: String, table_comment: String)

/** A full schema snapshot: four normalized DataFrames.
  *
  * Construction helpers live in [[Snapshot]]. All four frames are tiny
  * relative to data (KB..MB even for huge catalogs), so diff joins
  * broadcast the target side by default — but nothing in the diff
  * algorithm assumes they fit in memory; with the broadcast hint off it
  * degrades gracefully to shuffled hash joins keyed on table_name.
  */
case class SchemaSnapshot(
    tables: DataFrame,
    columns: DataFrame,
    indexes: DataFrame,
    foreignKeys: DataFrame) {

  def typedColumns(implicit spark: SparkSession): Dataset[ColumnMeta] = {
    import spark.implicits._
    columns.as[ColumnMeta]
  }
  def typedIndexes(implicit spark: SparkSession): Dataset[IndexMeta] = {
    import spark.implicits._
    indexes.as[IndexMeta]
  }
  def typedForeignKeys(implicit spark: SparkSession): Dataset[ForeignKeyMeta] = {
    import spark.implicits._
    foreignKeys.as[ForeignKeyMeta]
  }
  def typedTables(implicit spark: SparkSession): Dataset[TableMeta] = {
    import spark.implicits._
    tables.as[TableMeta]
  }

  /** Cache all four frames (snapshots are re-joined ~4 times by Diff). */
  def cached(): SchemaSnapshot =
    SchemaSnapshot(tables.cache(), columns.cache(), indexes.cache(), foreignKeys.cache())
}
