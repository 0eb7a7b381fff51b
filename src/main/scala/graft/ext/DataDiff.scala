package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level data diff — the schema-diff engine's presence/attribute
  * checks (SURVEY.md §2.3 D2/D5) generalized from catalog metadata to
  * table DATA, as a snapshot-comparison pipeline needs them.
  *
  * Semantics mirror the schema diff exactly:
  *  - key in base only            → `removed`  (cf. table-missing D2)
  *  - key in target only          → `added`    (visible because a row
  *    diff is inherently bidirectional; pass the base/target roles to
  *    taste)
  *  - key in both, values differ  → `changed` + the ordered list of
  *    changed columns (cf. attribute mismatches D5-D9)
  *
  * Scale design: ONE full-outer sort-merge/shuffled-hash join keyed on
  * the primary key — each side shuffles once; no O(columns) extra
  * passes, because all per-column comparisons are computed in the same
  * projection over the joined row (one scan, whole-stage codegen).
  * For repeated diffs of append-mostly 100 TB tables, pre-bucket both
  * sides on the key (`bucketBy`) and the shuffle disappears entirely.
  * The fast pre-filter `fingerprint` (hash of all non-key columns)
  * short-circuits the per-column comparison for identical rows, so the
  * change-list work only runs on rows that actually changed.
  */
object DataDiff {

  /** Diff two frames on their shared columns.
    *
    * @param keyCols   primary-key columns (join key)
    * @param compareCols columns to compare; default: all non-key columns
    *   PRESENT ON BOTH SIDES (a data diff runs exactly when schemas
    *   have drifted — base-only columns belong to the schema diff's
    *   column-missing finding, not an unresolved-column error here)
    */
  def rowDiff(
      base: DataFrame,
      target: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String] = Seq.empty): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else {
        val shared = target.columns.toSet
        base.columns.filter(c => shared.contains(c) && !keyCols.contains(c)).toSeq
      }

    // 128-bit row fingerprint over the compared columns (null-tagged,
    // \u0001-delimited so ("a", "bc") never collides with ("ab", "c")).
    def fp(side: String) = md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(s"$side.$c").cast("string"), lit("\u0000"))): _*))

    val b = base.alias("b")
    val t = target.alias("t")
    val joinCond = keyCols.map(k => col(s"b.$k") <=> col(s"t.$k")).reduce(_ && _)
    val joined = b.join(t, joinCond, "full_outer")

    val bPresent = keyCols.map(k => col(s"b.$k").isNotNull).reduce(_ || _)
    val tPresent = keyCols.map(k => col(s"t.$k").isNotNull).reduce(_ || _)

    val changedCols = filter(
      array(cols.map(c =>
        when(!(col(s"b.$c") <=> col(s"t.$c")), lit(c))
          .otherwise(lit(null).cast("string"))): _*),
      _.isNotNull)

    joined.select(
      keyCols.map(k => coalesce(col(s"b.$k"), col(s"t.$k")).as(k)) ++ Seq(
        when(!bPresent, "added")
          .when(!tPresent, "removed")
          .when(fp("b") =!= fp("t"), "changed")
          .otherwise("same").as("diff_status"),
        when(bPresent && tPresent, changedCols)
          .otherwise(array().cast("array<string>")).as("changed_cols")): _*)
      .filter(col("diff_status") =!= "same")
  }

  /** Aggregate diff summary: counts per status — the cheap first look
    * before pulling the row-level detail.
    */
  def diffSummary(base: DataFrame, target: DataFrame, keyCols: Seq[String]): DataFrame =
    rowDiff(base, target, keyCols)
      .groupBy("diff_status")
      .agg(count(lit(1)).as("n_rows"))
}
