package graft

class EntrySpec extends SparkSpec {
  test("flagship entry returns findings on sf0.001") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).contains("region")) // dropped table reported
  }

  test("every oracle key has a query; only the sketch keys lack oracles") {
    // approx sketches are rows-only by design: HLL/KLL internals are
    // engine-specific, so no DuckDB oracle can hash-match them
    val intentionallyOracleLess = Set("approx_distinct_hll", "approx_quantiles_kll")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == intentionallyOracleLess)
  }

  test("all queries run non-empty on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
