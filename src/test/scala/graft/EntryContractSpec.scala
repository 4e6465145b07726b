package graft

/** Guards the driver contract on SparkEntry: every declared query must have
  * a DuckDB oracle (zero rows-only checks since round 5 closed q47), every
  * oracle must point at a declared query, and the flagship entry returns
  * rows on the smallest scale factor — the same smoke the driver runs. */
class EntryContractSpec extends SparkSpec {

  test("every query is oracle-checked and every oracle names a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries with NO oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles with no query: ${o.diff(q).toSeq.sorted}")
  }

  test("entry smoke: flagship query returns rows at sf0.001") {
    assert(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
