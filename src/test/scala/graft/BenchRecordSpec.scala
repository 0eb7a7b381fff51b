package graft

import org.scalatest.funsuite.AnyFunSuite

/** The tripwire-can-never-silently-die spec: run [[BenchRecords]] —
  * the EXACT parser the bench's regression tripwire uses — over the
  * two committed record files and assert both resolve (sf present,
  * ≥300 per-key timings). Round 13's record re-base changed the
  * files' JSON whitespace and the then-brittle inline regexes matched
  * nothing, so the driver bench ran with the guard INACTIVE; this
  * spec turns any future record-format drift into a red suite instead
  * of a silent disarm.
  */
class BenchRecordSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"committed record $name is missing")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("BENCH_RECORD.json parses through the tripwire's own parser") {
    val rec = read("BENCH_RECORD.json")
    assert(BenchRecords.sfOf(rec).contains("/root/testdata/sf0.1"),
      s"sf lookup failed: got ${BenchRecords.sfOf(rec)}")
    val qs = BenchRecords.queriesOf(rec)
    assert(qs.size >= 300, s"expected >= 300 record keys, parsed ${qs.size}")
    assert(qs.values.forall(_ > 0), "record contains non-positive timings")
  }

  test("BENCH_RECORD_organic1.json parses through the tripwire's own parser") {
    val rec = read("BENCH_RECORD_organic1.json")
    val sf = BenchRecords.sfOf(rec)
    assert(sf.contains("/tmp/organic1.0"), s"sf lookup failed: got $sf")
    val qs = BenchRecords.queriesOf(rec)
    assert(qs.size >= 300, s"expected >= 300 record keys, parsed ${qs.size}")
  }

  test("parser tolerates both compact and pretty-printed JSON") {
    val compact = """{"metric":"total","queries":{"a_b":1.5,"c9":2},"sf":"/x"}"""
    val pretty = "{\n\"queries\": {\n\"a_b\": 1.5,\n\"c9\": 2\n},\n\"sf\": \"/x\",\n\"value\": 3.5\n}"
    for (rec <- Seq(compact, pretty)) {
      assert(BenchRecords.sfOf(rec).contains("/x"))
      val qs = BenchRecords.queriesOf(rec)
      assert(qs == Map("a_b" -> 1.5, "c9" -> 2.0), s"parsed $qs")
    }
    // "value" sits AFTER the queries object in sorted pretty records —
    // the bounded parse must not swallow it as a bench key
    assert(!BenchRecords.queriesOf(pretty).contains("value"))
  }

  test("parser survives nested values and brace-bearing strings inside queries") {
    // round-14 advisor: first-'}' truncated the map on any nested
    // value; the depth-aware close must keep reading past it
    val nested =
      """{"queries":{"a":1.5,"meta":{"x":9.9},"b":2.25,"s_key":3},"value":7}"""
    val qs = BenchRecords.queriesOf(nested)
    assert(qs("a") == 1.5 && qs("b") == 2.25 && qs("s_key") == 3.0, s"parsed $qs")
    assert(!qs.contains("value"), s"leaked past queries object: $qs")
    val braceStr =
      """{"queries":{"a":1,"note":"has } brace","b":2},"value":9}"""
    val qs2 = BenchRecords.queriesOf(braceStr)
    assert(qs2.get("a").contains(1.0) && qs2.get("b").contains(2.0) &&
      !qs2.contains("value"), s"parsed $qs2")
  }
}
