package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}
import org.apache.spark.sql.functions._

/** Multi-channel uncertainty merge (kd_tree.py:821-859 across channels) and
  * dynamic-grid EWA (ewa/_ll2cr.pyx:66). */
class MultiChannelSpec extends SparkSpec {

  test("weightedMulti uncertainty matches the single-channel path per channel") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val src = (1 to 300).map(i =>
      (i.toLong, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10,
        rnd.nextInt(50).toDouble, rnd.nextInt(90).toDouble))
      .toDF("src_id", "lon", "lat", "va", "vb")
    val tgtDf = (1 to 40).map(i =>
      (i.toLong, rnd.nextDouble() * 16 - 8, rnd.nextDouble() * 16 - 8)).toDF("dst_id", "lon", "lat")
    val wf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      d2 => exp(-d2 / lit(4.0))

    val multi = KnnResample.weightedMulti(src, tgtDf, 3.0, 8, Seq("va", "vb"), wf,
      planar = true, uncertainty = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap

    val a = KnnResample.weighted(src.withColumnRenamed("va", "value"), tgtDf, 3.0, 8,
      "value", wf, uncertainty = true, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap
    val b = KnnResample.weighted(src.withColumnRenamed("vb", "value"), tgtDf, 3.0, 8,
      "value", wf, uncertainty = true, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap

    assert(multi.keySet == a.keySet && multi.keySet == b.keySet)
    multi.foreach { case (id, m) =>
      assert(approx(m.getAs[Double]("va"), a(id).getAs[Double]("value"), 1e-9))
      assert(approx(m.getAs[Double]("stddev_va"), a(id).getAs[Double]("stddev"), 1e-9))
      assert(approx(m.getAs[Double]("vb"), b(id).getAs[Double]("value"), 1e-9))
      assert(approx(m.getAs[Double]("stddev_vb"), b(id).getAs[Double]("stddev"), 1e-9))
      assert(m.getAs[Long]("n") == a(id).getAs[Long]("n"))
    }
  }

  test("dynamic-grid EWA fits the footprint and matches the static grid (ll2cr_dynamic)") {
    val s = spark
    import s.implicits._
    // 20x10 swath on a longlat grid: lon 10.05..19.55 (x), lat 49.9 down (y)
    val sw = (for { y <- 0 until 20; x <- 0 until 10 } yield
      (y, x, 10.05 + x * 1.0, 49.9 - y * 0.5, (y * 10 + x).toDouble)).toDF("y", "x", "lon", "lat", "value")
    val crs = Crs.fromProj4("+proj=longlat")
    val (area, result) = EwaResample.resampleDynamic(sw, crs, cellWidth = 0.5, cellHeight = 0.5,
      rowsPerScan = 10, quantizeWeights = Some(7))
    // reference fit: ox = xmin = 10.05, oy = ymax = 49.9,
    // w = int((19.05 - 10.05) / 0.5) = 18, h = int((49.9 - 40.4) / 0.5) = 19
    assert(area.width == 18, s"w=${area.width}")
    assert(area.height == 19, s"h=${area.height}")
    assert(approx(area.xLL, 10.05) && approx(area.yUR, 49.9))
    assert(approx(area.xUR, 10.05 + 18 * 0.5) && approx(area.yLL, 49.9 - 19 * 0.5))
    // identical to running the static pipeline on the fitted area
    val static = EwaResample.resample(sw, area, rowsPerScan = 10, quantizeWeights = Some(7))
    val dyn = result.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val st = static.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dyn == st)
    assert(dyn.nonEmpty)
  }
}
