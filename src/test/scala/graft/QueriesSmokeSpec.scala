package graft

/** Every registered query must run at sf0.001 and produce a stable schema.
  * (Exact value correctness is covered by the DuckDB oracle gate — this
  * catches analysis errors, unreadable fixtures, and empty registries early.)
  */
class QueriesSmokeSpec extends SparkSpec {

  test("registry is non-empty and every oracle key has a query") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { case (name, q) =>
    test(s"$name runs at sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // force execution
    }
  }
}
