package graft.config

import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.diff.{CheckType, DiffOptions}
import graft.diff.Messages.Language

/** Driver-side configuration — the reference's `Config` model
  * (reference src/config.rs:94-100, platform_specific.rs:57-96)
  * re-expressed, with two deliberate deviations:
  *
  *  - `ignore_list` is ACTUALLY HONORED ([[GraftConfig.diffOptions]] →
  *    `DiffOptions.ignore`): the reference declares it (config.rs:99)
  *    but never consults it anywhere — a documented reference gap
  *    (SURVEY.md §1.1).
  *  - connections carry JDBC URLs (this engine speaks JDBC, not sqlx).
  *
  * JSON shape mirrors the reference field-for-field
  * (snake_case, `database_pairs` array, `default_database_pair`,
  * `current_language`, `ignore_list`), so a magiceye user's mental
  * model transfers directly.
  */
case class DatabasePair(
    name: String,
    database_type: String, // "postgres" | "mysql" (config.rs:43-47)
    base_connection: String,
    target_connection: String) {

  def dialect: graft.dialect.Dialect = database_type match {
    case "postgres" => graft.dialect.Postgres
    case "mysql" => graft.dialect.MySql
    case other =>
      throw new IllegalArgumentException(s"unknown database_type: $other (postgres|mysql)")
  }
}

case class GraftConfig(
    database_pairs: Seq[DatabasePair] = Seq.empty,
    default_database_pair: String = "",
    current_language: String = "English", // config.rs:11-15
    ignore_list: Seq[String] = Seq.empty) { // CheckType names, config.rs:3-9

  def pair(name: Option[String]): DatabasePair = {
    val wanted = name.getOrElse(default_database_pair)
    require(wanted.nonEmpty, "no database pair selected and no default configured")
    database_pairs.find(_.name == wanted).getOrElse(
      throw new IllegalArgumentException(
        s"database pair '$wanted' not found (have: ${database_pairs.map(_.name).mkString(", ")})"))
  }

  def ignoredChecks: Set[CheckType.Value] =
    ignore_list.map { n =>
      CheckType.values.find(_.toString.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"unknown ignore_list entry: $n (valid: ${CheckType.values.mkString(", ")})"))
    }.toSet

  def diffOptions: DiffOptions = DiffOptions(
    language = Language.fromKey(current_language),
    ignore = ignoredChecks)
}

object Config {

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    .enable(SerializationFeature.INDENT_OUTPUT)

  /** Default path, XDG-style (reference platform_specific.rs:23-55
    * resolves an OS config dir the same way).
    */
  def defaultPath: Path = Paths.get(
    sys.env.getOrElse("XDG_CONFIG_HOME", sys.props("user.home") + "/.config"),
    "magiceyespark", "config.json")

  def load(path: Path = defaultPath): GraftConfig =
    if (!Files.exists(path)) GraftConfig()
    else mapper.readValue(Files.readString(path), classOf[GraftConfig])

  def save(config: GraftConfig, path: Path = defaultPath): Path = {
    Files.createDirectories(path.getParent)
    Files.writeString(path, mapper.writeValueAsString(config) + "\n")
    path
  }
}
