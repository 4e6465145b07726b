package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Selection.chiSquare` and `Selection.ksTest` exactness fixtures. */
class DriftStatsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquare: exact zero under independence, N under perfect association") {
    val indep = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 10)
      yield (a, b)).toDF("a", "b")
    val r0 = Selection.chiSquare(indep, "a", "b").head()
    assert(r0.getLong(0) == 40L && r0.getDouble(3) == 0.0 && r0.getLong(4) == 1L)
    val assoc = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    val r1 = Selection.chiSquare(assoc, "a", "b").head()
    assert(r1.getDouble(3) == 20.0) // chi2 == N for a perfect 2x2 association
  }

  test("ksTest: disjoint supports give D=1, identical give D=0") {
    val disj = (Seq.fill(3)(("a", 1L)) ++ Seq.fill(3)(("b", 9L))).toDF("g", "v")
    val d1 = Selection.ksTest(disj, "g", "a", "b", col("v")).head()
    assert(d1.getLong(0) == 3L && d1.getLong(1) == 3L && d1.getDouble(2) == 1.0)
    val same = (Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))).toDF("g", "v")
    assert(Selection.ksTest(same, "g", "a", "b", col("v")).head().getDouble(2) == 0.0)
    // hand case: a={1,2,3}, b={2,3,4}: max gap at v=1 -> |1*3-0|/9 = 1/3
    val mix = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    assert(Selection.ksTest(mix, "g", "a", "b", col("v")).head().getDouble(2) == 1.0 / 3.0)
  }
}
