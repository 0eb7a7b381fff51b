package graft.diff

/** The 13 report-message templates of the reference, in both languages
  * (reference `src/action/run/steps/check.rs` — tables check.rs:95-102,
  * columns 141-148/158-165/180-187/197-204/222-229/236-243, indexes
  * 271-278/288-295/313-320/327-334, FKs 369-376/383-390).
  *
  * Rendered with Spark's codegen'd `format_string` — no UDF. `%s` holes
  * are filled positionally with the check's argument columns.
  */
object Messages {

  sealed abstract class Language(val key: String)
  case object English extends Language("English")
  case object Korean extends Language("Korean")
  object Language {
    def fromKey(k: String): Language = k match {
      case "Korean" => Korean
      case _        => English
    }
  }

  /** Check identities. `kindRank`/`checkRank` encode the reference's
    * deterministic-ized report ordering: per table, columns then indexes
    * then FKs (check.rs:50-92), and per object the attribute-check order
    * of check.rs (type, comment, nullable, default, auto_increment; ...).
    * The reference's TABLE order follows HashMap iteration — i.e. is
    * nondeterministic (check.rs:33); we sort by table_name instead
    * (SURVEY.md §7.3).
    */
  sealed abstract class Check(val key: String, val kind: String, val kindRank: Int, val checkRank: Int)
  case object TableMissing    extends Check("table_missing",    "table",  0, 0)
  case object TableComment    extends Check("table_comment",    "table",  0, 1) // engine extension; ref fetches but never compares
  case object ColumnMissing   extends Check("column_missing",   "column", 1, 0)
  case object ColumnType      extends Check("column_type",      "column", 1, 1)
  case object ColumnComment   extends Check("column_comment",   "column", 1, 2)
  case object ColumnNullable  extends Check("column_nullable",  "column", 1, 3)
  case object ColumnDefault   extends Check("column_default",   "column", 1, 4)
  case object ColumnAutoInc   extends Check("column_autoinc",   "column", 1, 5)
  case object IndexMissing    extends Check("index_missing",    "index",  2, 0)
  case object IndexColumns    extends Check("index_columns",    "index",  2, 1)
  case object IndexPredicate  extends Check("index_predicate",  "index",  2, 2)
  case object IndexUnique     extends Check("index_unique",     "index",  2, 3)
  case object FkMissing       extends Check("fk_missing",       "fk",     3, 0)
  case object FkTarget        extends Check("fk_target",        "fk",     3, 1)

  /** Template lookup. Placeholders are positional `%s`:
    *  - *Missing: (qualified object name parts...)
    *  - attribute checks: (name parts..., base value, target value)
    *  - FkTarget: (table, fk, base_ref_table, base_ref_col, target_ref_table, target_ref_col)
    */
  def template(lang: Language, check: Check): String = (lang, check) match {
    case (English, TableMissing)   => "Table: %s exists in the base database, but not in the target database."
    case (Korean, TableMissing)    => "Table: %s가 base 데이터베이스에는 있지만, target 데이터베이스에는 없습니다."
    case (English, TableComment)   => "Table: %s has different comment. => %s != %s"
    case (Korean, TableComment)    => "Table: %s의 코멘트가 다릅니다. => %s != %s"
    case (English, ColumnMissing)  => "Column: %s.%s exists in the base database, but not in the target database."
    case (Korean, ColumnMissing)   => "Column: %s.%s가 base 데이터베이스에는 있지만, target 데이터베이스에는 없습니다."
    case (English, ColumnType)     => "Column: %s.%s has different data type. => %s != %s"
    case (Korean, ColumnType)      => "Column: %s.%s의 데이터 타입이 다릅니다. => %s != %s"
    case (English, ColumnComment)  => "Column: %s.%s has different comment. => %s != %s"
    case (Korean, ColumnComment)   => "Column: %s.%s의 코멘트가 다릅니다. => %s != %s"
    case (English, ColumnNullable) => "Column: %s.%s has different nullable. => %s != %s"
    case (Korean, ColumnNullable)  => "Column: %s.%s의 NULLABLE이 다릅니다. => %s != %s"
    case (English, ColumnDefault)  => "Column: %s.%s has different default value. => %s != %s"
    case (Korean, ColumnDefault)   => "Column: %s.%s의 DEFAULT 값이 다릅니다. => %s != %s"
    case (English, ColumnAutoInc)  => "Column: %s.%s has different AUTO_INCREMENT. => %s != %s"
    case (Korean, ColumnAutoInc)   => "Column: %s.%s의 AUTO_INCREMENT 여부가 다릅니다. => %s != %s"
    case (English, IndexMissing)   => "Index: %s.%s exists in the base database, but not in the target database."
    case (Korean, IndexMissing)    => "Index: %s.%s가 base 데이터베이스에는 있지만, target 데이터베이스에는 없습니다."
    case (English, IndexColumns)   => "Index: %s.%s has different columns. Please check the order. => %s != %s"
    case (Korean, IndexColumns)    => "Index: %s.%s의 컬럼이 다릅니다. 순서까지 확인해주세요. => %s != %s"
    case (English, IndexPredicate) => "Index: %s.%s has different predicate. => %s != %s"
    case (Korean, IndexPredicate)  => "Index: %s.%s의 조건이 다릅니다. => %s != %s"
    case (English, IndexUnique)    => "Index: %s.%s has different uniqueness. => %s != %s"
    case (Korean, IndexUnique)     => "Index: %s.%s의 UNIQUE 여부가 다릅니다. => %s != %s"
    case (English, FkMissing)      => "Foreign Key: %s.%s exists in the base database, but not in the target database."
    case (Korean, FkMissing)       => "Foreign Key: %s.%s가 base 데이터베이스에는 있지만, target 데이터베이스에는 없습니다."
    case (English, FkTarget)       => "Foreign Key: %s.%s references different column. => %s.%s != %s.%s"
    case (Korean, FkTarget)        => "Foreign Key: %s.%s의 참조 컬럼이 다릅니다. => %s.%s != %s.%s"
  }
}
