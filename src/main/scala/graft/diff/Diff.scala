package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.SchemaSnapshot
import Messages._

/** Check categories a user may suppress — the reference declares this
  * (`config.rs:3-9` `CheckType`, `config.rs:99` `ignore_list`) but never
  * consults it; we implement the clearly-intended semantic and document
  * the reference gap (SURVEY.md §1.1).
  */
object CheckType extends Enumeration {
  val CommentOfColumn, CommentOfTable, TypeOfColumn, IndexOfTable = Value

  /** Which fine-grained checks a CheckType suppresses. */
  def suppressed(ct: Value): Set[Check] = ct match {
    case CommentOfColumn => Set(ColumnComment)
    case CommentOfTable  => Set(TableComment)
    case TypeOfColumn    => Set(ColumnType)
    case IndexOfTable    => Set(IndexMissing, IndexColumns, IndexPredicate, IndexUnique)
    case _               => Set.empty
  }
}

/** @param language          report language (reference `config.rs:11-15`)
  * @param ignore            suppressed check categories (see [[CheckType]])
  * @param bidirectional     ALSO report target-only objects (the reference is
  *                          strictly directional, background.rs:48-51; this is
  *                          the `bidirectional_except` extension — findings of
  *                          the reverse direction get `direction = "target_to_base"`)
  * @param compareTableComments engine extension: the reference FETCHES table
  *                          comments (postgres.rs:91-107) but never compares
  *                          them — off by default for output parity
  * @param strictNullDefaults when true, compare column defaults null-safely
  *                          (`<=>`) instead of the reference's coalesce-to-''
  *                          semantics where NULL-default and ''-default are
  *                          indistinguishable (SURVEY.md §1.2)
  * @param broadcastTarget   hint-broadcast the target side of every diff join;
  *                          schema metadata is tiny so this is on by default —
  *                          switch off to diff snapshots of arbitrary size
  *                          (falls back to shuffled hash join on table_name)
  */
case class DiffOptions(
    language: Language = English,
    ignore: Set[CheckType.Value] = Set.empty,
    bidirectional: Boolean = false,
    compareTableComments: Boolean = false,
    strictNullDefaults: Boolean = false,
    broadcastTarget: Boolean = true)

/** The diff engine — reference `src/action/run/steps/check.rs`
  * re-expressed as ONE lazily-built Catalyst DAG.
  *
  * Shape: the reference's per-table nested loops (HashMap probe per
  * table — check.rs:33-34; `Vec::find` per column/index/FK —
  * check.rs:51,65,78, an O(n·m) nested-loop join) become exactly FOUR
  * broadcast-able left-outer equi-joins, one per entity kind. Each join
  * is scanned ONCE: every attribute check is computed as a nullable
  * struct in an array which is then `filter`ed + `explode`d — no
  * re-join, no recompute per check, all within whole-stage codegen.
  *
  * Scale notes: all joins key on table_name(+object name), so a
  * 100M-object catalog diff shuffles each side once at most; with
  * `broadcastTarget` the base side doesn't shuffle at all. Output is
  * deterministic (explicit ranks; no HashMap iteration order).
  */
object Diff {

  /** Findings frame schema: one row per detected difference. */
  val findingCols: Seq[String] = Seq(
    "table_name", "kind", "check", "object_name",
    "kind_rank", "object_ordinal", "check_rank", "direction", "message")

  /** Register the diff surface as SQL temp views so downstream tooling
    * can stay in `spark.sql`: `graft_findings` (one row per finding)
    * and `graft_report` (grouped per table). The deferred
    * `SCHEMA DIFF ('base','target')` parser injection (SURVEY.md §4.3)
    * is not needed for this — views + the Dataset API cover the SQL
    * workflow.
    */
  def registerViews(
      base: SchemaSnapshot, target: SchemaSnapshot,
      opts: DiffOptions = DiffOptions(),
      prefix: String = "graft"): Unit = {
    val findings = diff(base, target, opts)
    findings.createOrReplaceTempView(s"${prefix}_findings")
    Report.fromFindings(findings).createOrReplaceTempView(s"${prefix}_report")
  }

  def diff(base: SchemaSnapshot, target: SchemaSnapshot, opts: DiffOptions = DiffOptions()): DataFrame = {
    val fwd = directional(base, target, opts, "base_to_target")
    if (!opts.bidirectional) fwd
    else fwd.unionByName(directional(target, base, opts, "target_to_base"))
  }

  private def directional(
      base: SchemaSnapshot, target: SchemaSnapshot,
      opts: DiffOptions, direction: String): DataFrame = {

    val ignored: Set[Check] = opts.ignore.flatMap(CheckType.suppressed) ++
      (if (opts.compareTableComments) Set.empty[Check] else Set[Check](TableComment))

    val bcast: DataFrame => DataFrame =
      if (opts.broadcastTarget) broadcast(_) else identity

    // Tables present in both databases — column/index/FK checks only run
    // for these (a missing table yields ONLY the table-missing line,
    // check.rs:94-107).
    val targetTables = target.tables.select("table_name")
    val presentTables = base.tables.select("table_name")
      .join(bcast(targetTables), Seq("table_name"), "left_semi")

    // --- D2: table presence (left-anti join), check.rs:94-107 ---------
    val missingTables = base.tables
      .join(bcast(targetTables), Seq("table_name"), "left_anti")
      .select(
        col("table_name"),
        finding(opts.language, TableMissing, col("table_name"), lit(0),
          direction, col("table_name")).as("f"))

    // --- table comment compare (engine extension, off in parity mode) -
    val tableAttr = {
      val b = base.tables.alias("b")
      val t = target.tables.alias("t")
      b.join(bcast(t), col("b.table_name") === col("t.table_name"), "inner")
        .select(col("b.table_name").as("table_name"),
          checksArray(opts.language, ignored, lit(0), direction, Seq(
            (TableComment,
              col("b.table_comment") =!= col("t.table_comment"),
              Seq(col("b.table_name"), col("b.table_comment"), col("t.table_comment"))))
          ).as("fs"))
    }

    // --- D4-D9: columns (one left join, six checks), check.rs:123-259 -
    val columnFindings = {
      val b = base.columns
        .join(bcast(presentTables), Seq("table_name"), "left_semi").alias("b")
      val t = target.columns.alias("t")
      val joined = b.join(bcast(t),
        col("b.table_name") === col("t.table_name") &&
        col("b.column_name") === col("t.column_name"), "left")
      val miss = col("t.column_name").isNull
      val name = Seq(col("b.table_name"), col("b.column_name"))
      val defaultNeq =
        if (opts.strictNullDefaults) !(col("b.default_value") <=> col("t.default_value"))
        else coalesce(col("b.default_value"), lit("")) =!= coalesce(col("t.default_value"), lit(""))
      joined.select(col("b.table_name").as("table_name"),
        checksArray(opts.language, ignored, col("b.ordinal"), direction, Seq(
          (ColumnMissing, miss, name),
          (ColumnType, !miss && col("b.data_type") =!= col("t.data_type"),
            name ++ Seq(col("b.data_type"), col("t.data_type"))),
          (ColumnComment, !miss && col("b.comment") =!= col("t.comment"),
            name ++ Seq(col("b.comment"), col("t.comment"))),
          (ColumnNullable, !miss && col("b.is_nullable") =!= col("t.is_nullable"),
            name ++ Seq(nullableText(col("b.is_nullable")), nullableText(col("t.is_nullable")))),
          (ColumnDefault, !miss && defaultNeq,
            name ++ Seq(col("b.default_value"), col("t.default_value"))),
          (ColumnAutoInc, !miss && col("b.is_auto_increment") =!= col("t.is_auto_increment"),
            name ++ Seq(autoIncText(col("b.is_auto_increment")), autoIncText(col("t.is_auto_increment"))))
        )).as("fs"))
    }

    // --- D10-D13: indexes (one left join, four checks), check.rs:261-349
    val indexFindings = {
      val b = base.indexes
        .join(bcast(presentTables), Seq("table_name"), "left_semi").alias("b")
      val t = target.indexes.alias("t")
      val joined = b.join(bcast(t),
        col("b.table_name") === col("t.table_name") &&
        col("b.index_name") === col("t.index_name"), "left")
      val miss = col("t.index_name").isNull
      val name = Seq(col("b.table_name"), col("b.index_name"))
      joined.select(col("b.table_name").as("table_name"),
        checksArray(opts.language, ignored, col("b.ordinal"), direction, Seq(
          (IndexMissing, miss, name),
          // ordered comparison: Spark array =!= is element- AND
          // order-sensitive, matching Vec<String> != (check.rs:267)
          (IndexColumns, !miss && col("b.columns") =!= col("t.columns"),
            name ++ Seq(array_join(col("b.columns"), ", "), array_join(col("t.columns"), ", "))),
          (IndexPredicate, !miss && col("b.predicate") =!= col("t.predicate"),
            name ++ Seq(col("b.predicate"), col("t.predicate"))),
          (IndexUnique, !miss && col("b.is_unique") =!= col("t.is_unique"),
            name ++ Seq(uniqueText(col("b.is_unique")), uniqueText(col("t.is_unique"))))
        )).as("fs"))
    }

    // --- D14-D15: foreign keys (one left join, two checks), check.rs:351-396
    val fkFindings = {
      val b = base.foreignKeys
        .join(bcast(presentTables), Seq("table_name"), "left_semi").alias("b")
      val t = target.foreignKeys.alias("t")
      val joined = b.join(bcast(t),
        col("b.table_name") === col("t.table_name") &&
        col("b.constraint_name") === col("t.constraint_name"), "left")
      val miss = col("t.constraint_name").isNull
      val name = Seq(col("b.table_name"), col("b.constraint_name"))
      joined.select(col("b.table_name").as("table_name"),
        checksArray(opts.language, ignored, col("b.ordinal"), direction, Seq(
          (FkMissing, miss, name),
          // SelectColumn struct inequality (check.rs:358-364) = two-col struct =!=
          (FkTarget, !miss &&
            struct(col("b.ref_table"), col("b.ref_column")) =!=
            struct(col("t.ref_table"), col("t.ref_column")),
            name ++ Seq(col("b.ref_table"), col("b.ref_column"),
              col("t.ref_table"), col("t.ref_column")))
        )).as("fs"))
    }

    val exploded = Seq(tableAttr, columnFindings, indexFindings, fkFindings)
      .map(df => df.select(col("table_name"),
        explode(filter(col("fs"), _.isNotNull)).as("f")))
      .reduce(_ unionByName _)

    missingTables.unionByName(exploded)
      .select(col("table_name"), col("f.*"))
  }

  /** One check = a nullable struct; null when the check passes or is
    * suppressed. The caller packs them into an array, filters nulls and
    * explodes — so N checks cost one scan of one join, not N joins.
    */
  private def checksArray(
      lang: Language,
      ignored: Set[Check],
      ordinal: Column,
      direction: String,
      checks: Seq[(Check, Column, Seq[Column])]): Column = {
    val structs = checks.filterNot { case (c, _, _) => ignored.contains(c) }
      .map { case (c, cond, args) =>
        when(cond, finding(lang, c, args.head, ordinal, direction, args: _*))
          .otherwise(lit(null).cast(findingType))
      }
    if (structs.nonEmpty) array(structs: _*)
    else array().cast(ArrayType(findingType))
  }

  private val findingType: DataType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("check", StringType, nullable = false),
    StructField("object_name", StringType, nullable = true),
    StructField("kind_rank", IntegerType, nullable = false),
    StructField("object_ordinal", IntegerType, nullable = true),
    StructField("check_rank", IntegerType, nullable = false),
    StructField("direction", StringType, nullable = false),
    StructField("message", StringType, nullable = true)))

  private def finding(
      lang: Language, c: Check, objectName: Column, ordinal: Column,
      direction: String, args: Column*): Column =
    struct(
      lit(c.kind).as("kind"),
      lit(c.key).as("check"),
      objectName.cast(StringType).as("object_name"),
      lit(c.kindRank).as("kind_rank"),
      ordinal.cast(IntegerType).as("object_ordinal"),
      lit(c.checkRank).as("check_rank"),
      lit(direction).as("direction"),
      format_string(Messages.template(lang, c), args: _*).as("message"))

  private def nullableText(c: Column): Column =
    when(c, "NULL").otherwise("NOT NULL") // check.rs:172-179
  private def autoIncText(c: Column): Column =
    when(c, "AUTO_INCREMENT").otherwise("NOT AUTO_INCREMENT") // check.rs:211-221
  private def uniqueText(c: Column): Column =
    when(c, "UNIQUE").otherwise("NOT UNIQUE") // check.rs:302-312
}
