package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Selection.bootstrapMeans`/`bootstrapSummary` properties: determinism
  * under partitioning, Poisson(1) draw-count concentration, exactness on
  * a constant metric, and interval sanity. */
class BootstrapSpec extends SparkSpec {

  private def docs = spark.range(2000)
    .selectExpr("id AS doc_id", "100 + (id % 50) AS n_chars")

  test("replica means are bit-identical under repartitioning") {
    val a = Selection.bootstrapMeans(docs, 8, col("n_chars"))
      .orderBy("replica").collect().toSeq
    val b = Selection.bootstrapMeans(docs.repartition(7), 8, col("n_chars"))
      .orderBy("replica").collect().toSeq
    assert(a == b)
    assert(a.size == 8)
  }

  test("Poisson(1) draw counts concentrate around n") {
    val draws = Selection.bootstrapMeans(docs, 16, col("n_chars"))
      .collect().map(_.getLong(1))
    // mean n_draws = 2000, sd ~ sqrt(2000) ~ 45: +-6 sd is a safe bound
    assert(draws.forall(d => d > 1730 && d < 2270),
      s"draw counts out of range: ${draws.mkString(",")}")
  }

  test("constant metric bootstraps to the constant with zero width") {
    val const = spark.range(500).selectExpr("id AS doc_id", "7 AS v")
    val s = Selection.bootstrapSummary(const, 8, col("v")).head()
    assert(s.getDouble(1) == 7.0 && s.getDouble(2) == 0.0)
    assert(s.getDouble(3) == 7.0 && s.getDouble(4) == 7.0)
  }

  test("summary interval brackets the replica spread") {
    val s = Selection.bootstrapSummary(docs, 16, col("n_chars")).head()
    val (m, se, lo, hi) = (s.getDouble(1), s.getDouble(2), s.getDouble(3), s.getDouble(4))
    assert(lo <= m && m <= hi)
    assert(se > 0.0 && se < 5.0) // sd(values)/sqrt(n) ~ 0.3; 5.0 is loose
    // true mean is 100 + mean(id % 50) = 124.5-ish; bootstrap must agree
    assert(math.abs(m - 124.475) < 3.0)
  }
}
