package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q165-q167 operator invariants vs independent plain-Scala replicas. */
class AcfBfsSpec extends SparkSpec {
  import spark.implicits._

  test("acf matches a direct Scala autocorrelation on a seasonal series") {
    // period-4 series: acf(4) must dominate acf(1..3)
    val xs = (0 until 24).map(i => 100L + (if (i % 4 == 0) 50L else 0L))
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("event_type", "day", "x")
    val out = Temporal.acf(df, maxLag = 5).collect()
      .map(r => r.getAs[Int]("lag_k") -> r).toMap
    val n = xs.length
    val s = xs.sum
    val ds = xs.map(x => BigInt(n) * x - s)
    val den = ds.map(d => d * d).sum
    for (l <- 1 to 5) {
      val num = (l until n).map(t => ds(t) * ds(t - l)).sum
      val expected = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(l).getAs[Long]("n_pairs") === (n - l).toLong)
      assert(approx(out(l).getAs[Double]("acf"), expected, 1e-9), s"lag $l")
    }
    assert(out(4).getAs[Double]("acf") > out(1).getAs[Double]("acf"))
    assert(out(4).getAs[Double]("acf") > out(3).getAs[Double]("acf"))
  }

  test("calibrationBins partitions counts and bounds rates") {
    val scored = Seq(
      (1L, 0.05, 0), (2L, 0.07, 0), (3L, 0.55, 1), (4L, 0.52, 0),
      (5L, 0.95, 1), (6L, 0.98, 1), (7L, 1.0, 1), (8L, 0.0, 0))
      .toDF("doc_id", "prob", "label")
    val out = Selection.calibrationBins(scored).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 8L)
    out.foreach { r =>
      val (n, pos) = (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))
      assert(pos >= 0 && pos <= n)
      assert(r.getAs[Double]("avg_pred") >= 0.0 && r.getAs[Double]("avg_pred") <= 1.0)
      assert(r.getAs[Double]("pos_rate") === pos.toDouble / n)
    }
    // prob=1.0 lands in the top bin via the least() cap
    val byBin = out.map(r => r.getAs[Int]("bin") -> r).toMap
    assert(byBin(9).getAs[Long]("n") === 3L) // 0.95, 0.98, 1.0
    assert(byBin(0).getAs[Long]("n") === 3L) // 0.05, 0.07, 0.0
  }

  test("covarianceMatrix equals plain-Scala exact covariance on a hand matrix") {
    val vecs = Seq(
      Array(0.1f, 0.2f, -0.3f), Array(0.4f, -0.1f, 0.2f),
      Array(-0.2f, 0.3f, 0.1f), Array(0.25f, 0.05f, -0.15f),
      Array(0.0f, -0.25f, 0.3f))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val out = Similarity.covarianceMatrix(df, k = 3).collect()
      .map(r => (r.getAs[Int]("dim_i"), r.getAs[Int]("dim_j")) -> r).toMap
    assert(out.size === 6)
    val micro = vecs.map(_.map(f => math.round(f.toDouble * 1e6)))
    val n = vecs.length
    for { i <- 0 until 3; j <- i until 3 } {
      val (si, sj) = (micro.map(_(i)).sum, micro.map(_(j)).sum)
      val cij = micro.map(v => v(i) * v(j)).sum
      val num = n.toLong * cij - si * sj
      val r = out((i, j))
      assert(r.getAs[Long]("num") === num, s"num($i,$j)")
      val cov = BigDecimal(num.toDouble / (n.toDouble * (n - 1) * 1e12))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("cov") === cov, s"cov($i,$j)")
    }
    // variances positive on non-constant dims
    for (i <- 0 until 3) assert(out((i, i)).getAs[Long]("num") > 0L)
  }

  test("bfsHops returns exact minimum hop distances on a hand graph") {
    // 1-2-3-4-5 path plus 10-11 island; seeds = {1, 10}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("d1", "d2")
    val seeds = Seq(1L, 10L).toDF("id")
    val out = Graph.bfsHops(pairs, seeds, maxDepth = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("dist")).toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 10L -> 0, 11L -> 1))
    // node 5 is 4 hops away: outside maxDepth=3
    assert(!out.contains(5L))
  }
}
