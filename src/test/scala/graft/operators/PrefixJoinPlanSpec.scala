package graft.operators

import graft.SparkSpec
import graft.queries.Queries

/** Plan-shape assertions for the PPJoin+ set-similarity join (q175): the
  * ranked per-doc hash-array frame is localCheckpoint'ed, so the corpus
  * scan → shingle explode → df window → collect subtree must run exactly
  * ONCE — the final plan reads the checkpoint (ExistingRDD), never the
  * parquet source. Guards the r7 regression where a comment claimed the
  * persist but the code re-evaluated the subtree per consumer (up to 4x:
  * the prefix self-join's two sides + the verify's two array-attach
  * joins). */
class PrefixJoinPlanSpec extends SparkSpec {

  test("q175 plans zero source scans: the ranked frame is checkpointed once") {
    val df = Queries.q175_setsim_join.build(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val parquetScans = "Scan parquet".r.findAllIn(plan).length
    assert(parquetScans === 0,
      s"expected the checkpointed subtree to replace all source scans, got $parquetScans:\n${plan.take(2000)}")
    val rddScans = "Scan ExistingRDD".r.findAllIn(plan).length
    assert(rddScans >= 2, s"expected >=2 checkpoint reads (self-join + verify), got $rddScans")
    df.count() // the checkpointed plan must still execute
  }
}
