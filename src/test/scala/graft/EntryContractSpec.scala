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

  test("every query builds at sf0.001 with a non-empty, duplicate-free schema") {
    // analysis-time smoke across the whole surface: a query that throws
    // at build, loses its columns, or aliases two outputs to one name
    // (the driver's compare sorts columns BY NAME — duplicates hash
    // garbage) fails here before any round artifact does. Eager
    // operators (checkpointed graph/dedup builds) execute at sf0.001 —
    // small by design.
    val failures = graft.queries.Queries.all.flatMap { case (name, q) =>
      try {
        val schema = q.build(spark, "/root/testdata/sf0.001").schema
        if (schema.isEmpty) Some(s"$name: empty schema")
        else if (schema.map(_.name).distinct.size != schema.size)
          Some(s"$name: duplicate column names ${schema.map(_.name)}")
        else None
      } catch { case e: Throwable => Some(s"$name: build threw ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
