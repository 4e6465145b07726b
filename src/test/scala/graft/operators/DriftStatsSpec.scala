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

  test("ksTest bins knob: binned D matches the hand-binned exact D (r13)") {
    // a = {0, .05, ..., .95}, b = {0.5, ..., 1.45}: with bins=2 over the
    // observed range [0, ~1.45], bin width ~0.725 — a lands 15/20 in bin
    // 0 (values < 0.725), b lands 5/20; D over the 2-bin CDFs =
    // |15·20 − 5·20| / 400 = 0.5 (exact integer cross-multiplication)
    val a = (0 until 20).map(i => ("a", i * 0.05))
    val b = (0 until 20).map(i => ("b", 0.5 + i * 0.05))
    val df = (a ++ b).toDF("g", "v")
    val binned = Selection.ksTest(df, "g", "a", "b", col("v"), bins = 2).head()
    assert(binned.getLong(0) == 20L && binned.getLong(1) == 20L)
    assert(binned.getDouble(2) == 0.5)
    // the binned D is an under-estimate of the exact D, never an over-estimate
    val exact = Selection.ksTest(df, "g", "a", "b", col("v")).head().getDouble(2)
    assert(binned.getDouble(2) <= exact)
  }

  test("ksTest maxDistinct guard: loud error on unbinned high-cardinality input (r13)") {
    // b concentrates on the low half so the binned D is clearly nonzero
    val many = (0 until 100).flatMap(i => Seq(("a", i * 1.0), ("b", i * 0.5 + 0.25)))
      .toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Selection.ksTest(many, "g", "a", "b", col("v"), maxDistinct = 50)
    }
    assert(e.getMessage.contains("pre-bin"))
    // the advertised fix works: binning the same input passes the guard
    val ok = Selection.ksTest(many, "g", "a", "b", col("v"), bins = 20, maxDistinct = 50)
    assert(ok.head().getDouble(2) > 0.0)
  }
}
