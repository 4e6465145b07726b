package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** `Dedup.containment` on hand-built subset/overlap fixtures: a short doc
  * fully inside a long one scores c1 = 1.0 while its Jaccard is low —
  * the asymmetric case the resemblance measures miss. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d"),                      // subset of doc 2
    (2L, "a b c d e f g h i j k l"),      // superset
    (3L, "a b x y"),                      // half-overlap with doc 1
    (4L, "p q r s")                       // disjoint from doc 1
  ).toDF("doc_id", "text")

  private def pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("d1", "d2")

  test("containment flags subset pairs that Jaccard misses") {
    val out = Dedup.containment(docs, pairs, threshold = 0.5)
      .orderBy("d1", "d2").collect()
    val expected = Seq(
      // |{a,b,c,d}| / 4 = 1.0 contained; Jaccard would be 4/12 = 0.33
      Row(1L, 2L, 4L, 4L, 12L, 1.0, 4.0 / 12.0),
      Row(1L, 3L, 2L, 4L, 4L, 0.5, 0.5))
    assert(out.toSeq == expected)
    // the Jaccard operator at the same 0.5 bar misses the subset pair
    val jac = Dedup.ngramJaccard(
      docs.withColumn("blk", org.apache.spark.sql.functions.lit(1)),
      Seq("blk"), threshold = 0.5)
    assert(!jac.collect().map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
  }

  test("containment keeps the relational verify shape (no cartesian)") {
    val phys = Dedup.containment(docs, pairs).queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"))
  }
}
