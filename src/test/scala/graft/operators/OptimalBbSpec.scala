package graft.operators

import graft.SparkSpec

/** compute_optimal_bb_area (geometry.py:1019) + IVF ANN. */
class OptimalBbSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("optimal bb area fits a tilted swath tightly") {
    val s = spark
    import s.implicits._
    // swath running SW->NE at ~45 degrees
    val sw = (for { y <- 0 until 40; x <- 0 until 10 } yield {
      val along = y * 0.5
      (y, x, 0.0 + along + x * 0.1, 30.0 + along - x * 0.1)
    }).toDF("y", "x", "lon", "lat")
    val area = GeometryOps.computeOptimalBbArea(sw, resolutionMetres = 20000)
    assert(area.crs.params("proj") == "omerc")
    // the fitted frame should be much tighter than an axis-aligned lonlat box:
    // swath is ~28 deg long but ~1.4 deg wide -> aspect ratio strongly anisotropic
    val aspect = math.max(area.width, area.height).toDouble / math.min(area.width, area.height)
    assert(aspect > 3.0, s"w=${area.width} h=${area.height}")
    // every swath point is inside the area
    val cells = sw.collect().map { r =>
      val (x, y) = (r.getDouble(2), r.getDouble(3))
      val (px, py) = area.crs.forward(x, y)
      area.contains(px, py)
    }
    assert(cells.forall(identity))
  }

  test("IVF top-k finds the exact match with high recall") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val cands = (0 until 300).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val candsDf = cands.toDF("cid", "embedding")
    val qs = Seq((900L, cands(123)._2), (901L, cands(7)._2)).toDF("qid", "embedding")
    val top = Similarity.ivfTopK(qs, candsDf, k = 5, nCentroids = 8, nProbe = 8)
    // nProbe = nCentroids -> exhaustive -> exact match must rank first
    val first = top.filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid")).toMap
    assert(first(900L) == 123L && first(901L) == 7L)
    val approxTop = Similarity.ivfTopK(qs, candsDf, k = 5, nCentroids = 8, nProbe = 2)
    assert(approxTop.filter(col("rank") === 1).count() == 2) // returns something per query

    // scale guard: the centroid pick must not force a single-partition global
    // sort (row_number over an unpartitioned window) — orderBy+limit compiles
    // to TakeOrderedAndProject and the only windows left are per-query ranks
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global exchange in ivfTopK plan:\n$plan")
  }
}
