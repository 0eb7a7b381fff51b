package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{Config, DatabasePair, GraftConfig}
import graft.diff.CheckType
import graft.diff.Messages.Korean

/** Config model round-trip + the reference-gap fix: ignore_list is
  * honored (reference declares it, config.rs:99, but never reads it).
  */
class ConfigSpec extends AnyFunSuite {

  private val cfg = GraftConfig(
    database_pairs = Seq(
      DatabasePair("prod-vs-dev", "postgres", "jdbc:postgresql://h/prod", "jdbc:postgresql://h/dev"),
      DatabasePair("my", "mysql", "jdbc:mysql://h/a", "jdbc:mysql://h/b")),
    default_database_pair = "prod-vs-dev",
    current_language = "Korean",
    ignore_list = Seq("TypeOfColumn", "IndexOfTable"))

  test("JSON round-trip preserves the reference field shape") {
    val path = Files.createTempDirectory("cfg").resolve("config.json")
    Config.save(cfg, path)
    val json = Files.readString(path)
    assert(json.contains("\"database_pairs\""))
    assert(json.contains("\"default_database_pair\""))
    assert(json.contains("\"current_language\""))
    assert(json.contains("\"ignore_list\""))
    assert(Config.load(path) == cfg)
  }

  test("missing config loads defaults") {
    val c = Config.load(Files.createTempDirectory("cfg").resolve("nope.json"))
    assert(c == GraftConfig())
    assert(c.diffOptions.ignore.isEmpty)
  }

  test("diffOptions honors ignore_list and language") {
    val o = cfg.diffOptions
    assert(o.language == Korean)
    assert(o.ignore == Set(CheckType.TypeOfColumn, CheckType.IndexOfTable))
  }

  test("pair selection: default, explicit, and errors") {
    assert(cfg.pair(None).name == "prod-vs-dev")
    assert(cfg.pair(Some("my")).database_type == "mysql")
    assert(intercept[IllegalArgumentException](cfg.pair(Some("nope")))
      .getMessage.contains("not found"))
    assert(intercept[IllegalArgumentException](
      GraftConfig().pair(None)).getMessage.contains("no database pair"))
    assert(intercept[IllegalArgumentException](
      cfg.copy(ignore_list = Seq("Bogus")).ignoredChecks).getMessage.contains("Bogus"))
  }
}
