package graft

class EntrySpec extends SparkSpec {
  test("flagship entry returns findings on sf0.001") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).contains("region")) // dropped table reported
  }

  test("every oracle key has a query and vice versa") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("all queries run non-empty on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }
}
