package graft.diff

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report assembly + JSON sink (reference check.rs:6-15 `ReportSchema` /
  * `ReportTable`, background.rs:58-66).
  *
  * The reference accumulates `Vec<String>` per table while iterating;
  * we group the findings frame by table and collect messages — with an
  * explicit `sort_array` over (kind_rank, object_ordinal, check_rank)
  * so the per-table report order is deterministic under shuffle (never
  * rely on `collect_list` input order — SURVEY.md §7.3).
  */
object Report {

  /** findings → one row per table: (table_name, report_list). Tables
    * with no findings vanish naturally (`has_report`, check.rs:41,109-111).
    */
  def fromFindings(findings: DataFrame): DataFrame =
    findings
      .groupBy("table_name")
      .agg(
        transform(
          sort_array(collect_list(struct(
            col("kind_rank"), col("object_ordinal"), col("check_rank"),
            col("direction"), col("message")))),
          f => f.getField("message")).as("report_list"))
      .orderBy("table_name") // deterministic table order (ref is HashMap-ordered)

  /** Render the reference's exact JSON shape
    * (`{"report_table_list": [...]}`, pretty-printed like serde_json's
    * `to_string_pretty`, background.rs:64) as a single driver-side
    * string. Reports are human-read artifacts, small by construction.
    */
  def toJsonString(report: DataFrame): String = {
    val rows = report.select("table_name", "report_list").collect()
    val sb = new StringBuilder
    sb.append("{\n  \"report_table_list\": [")
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append(',')
      sb.append("\n    {\n      \"table_name\": ").append(jsonStr(r.getString(0)))
      sb.append(",\n      \"report_list\": [")
      val msgs = r.getSeq[String](1)
      msgs.zipWithIndex.foreach { case (m, j) =>
        if (j > 0) sb.append(',')
        sb.append("\n        ").append(jsonStr(m))
      }
      if (msgs.nonEmpty) sb.append("\n      ")
      sb.append("]\n    }")
    }
    if (rows.nonEmpty) sb.append("\n  ")
    sb.append("]\n}")
    sb.toString
  }

  /** Single pretty JSON file named like the reference's
    * `report_{YYYY-MM-DD HH:MM}.json` (background.rs:61-66).
    */
  def writeJsonFile(report: DataFrame, dir: String, now: java.time.LocalDateTime = java.time.LocalDateTime.now()): String = {
    val ts = now.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"))
    val path = Paths.get(dir, s"report_$ts.json")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(path, toJsonString(report))
    path.toString
  }

  /** Distributed sink for reports too large to collect (engine
    * extension — e.g. a data-level diff of a 100 TB table): newline-
    * delimited JSON, one object per table, written by executors.
    */
  def writeJsonDistributed(report: DataFrame, path: String): Unit =
    report.write.mode("overwrite").json(path)

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
