package graft

/** Driver-contract smoke: entry() returns rows, every registry entry has a
  * runnable query, and oracle keys are a subset of query keys with matching
  * column discipline. */
class EntrySpec extends SparkSpec {

  test("entry() runs on sf0.001 and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("registry has no name collisions across modules and is non-trivial") {
    val total = graft.queries.Relational.defs.size +
      graft.queries.TextQueries.defs.size +
      graft.queries.EventQueries.defs.size +
      graft.queries.VectorQueries.defs.size +
      graft.queries.MlQueries.defs.size +
      graft.queries.GraphQueries.defs.size +
      graft.queries.FunctionQueries.defs.size +
      graft.queries.PipelineQueries.defs.size +
      graft.queries.AnalyticsQueries.defs.size
    assert(SparkEntry.queries.size == total,
      "a module reused a query name — merged map lost entries")
    assert(SparkEntry.queries.size >= 60)
  }
}
