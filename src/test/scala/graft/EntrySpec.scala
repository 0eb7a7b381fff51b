package graft

class EntrySpec extends SparkSpec {
  test("flagship entry returns findings on sf0.001") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).contains("region")) // dropped table reported
  }

  test("every query key has an oracle and vice versa") {
    // the sketch keys are oracle-backed too: they emit exact answers
    // plus within-tolerance booleans, and DuckDB asserts TRUE
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == Set.empty)
  }

  test("all queries run non-empty on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
