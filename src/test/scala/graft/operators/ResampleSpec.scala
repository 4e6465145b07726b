package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** Bilinear (J5), EWA (J6/J7/A8), gradient (J8) semantics. */
class ResampleSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("bilinear fracDistances: unit square recovers (t, s) = offsets") {
    // corners UL(0,1) UR(1,1) LL(0,0) LR(1,0); target (0.25, 0.75)
    // reference order: p1=UL p2=UR p3=LL p4=LR; t measured downward from top
    val (t, s) = BilinearResample.fracDistances(
      0, 1, 1, 1, 0, 0, 1, 0, 0.25, 0.75)
    assert(approx(s, 0.25, 1e-12), s"s=$s")
    assert(approx(t, 0.25, 1e-12), s"t=$t")
  }

  test("bilinear fracDistances goldens (test_bilinear.py:179-207)") {
    // pts_irregular: p1(-1,1) p2(1,2) p3(-2,-1) p4(2,-4), target (0,0) -> (t,s)=(0.375, 0.5)
    val (tI, sI) = BilinearResample.fracDistances(-1, 1, 1, 2, -2, -1, 2, -4, 0, 0)
    assert(approx(tI, 0.375, 1e-10) && approx(sI, 0.5, 1e-10), s"($tI, $sI)")
    // pts_both_parallel: -> (0.5, 0.5)
    val (tB, sB) = BilinearResample.fracDistances(-1, 1, 1, 1, -1, -1, 1, -1, 0, 0)
    assert(approx(tB, 0.5, 1e-10) && approx(sB, 0.5, 1e-10), s"($tB, $sB)")
    // pts_vert_parallel: -> (0.5, 0.5)
    val (tV, sV) = BilinearResample.fracDistances(-1, 1, 1, 2, -1, -1, 1, -2, 0, 0)
    assert(approx(tV, 0.5, 1e-10) && approx(sV, 0.5, 1e-10), s"($tV, $sV)")
    // division-by-zero regression corners (test_bilinear.py:195-207)
    val (tD, sD) = BilinearResample.fracDistances(
      -64.9936752319336, -5.140199184417725, -64.98487091064453, -5.142156600952148,
      -64.98683166503906, -5.151054859161377, -64.97802734375, -5.153012275695801,
      -64.985, -5.145)
    assert(approx(tD, 0.30769689, 1e-6) && approx(sD, 0.74616628, 1e-6), s"($tD, $sD)")
  }

  test("bilinear fracDistances: outside quad -> NaN") {
    val (t, s) = BilinearResample.fracDistances(0, 1, 1, 1, 0, 0, 1, 0, 2.5, 0.5)
    assert(t.isNaN && s.isNaN)
  }

  test("bilinear resample on a tilted lattice reproduces a linear field") {
    val s = spark
    import s.implicits._
    // source: rotated regular lattice of a linear function f(x,y)=2x+3y
    val area = AreaDef("b", Crs.fromProj4("+proj=longlat"), 20, 20, 0, 0, 20, 20)
    val rot = 0.3
    val pts = for { i <- 0 until 30; j <- 0 until 30 } yield {
      val gx = i * 0.9 - 3 + 0.13 * j
      val gy = j * 0.9 - 3 + 0.07 * i
      (i.toLong * 100 + j, gx, gy, 2.0 * gx + 3.0 * gy)
    }
    val src = pts.toDF("src_id", "lon", "lat", "value")
    val out = BilinearResample.resample(src, area, radius = 3.0 * 111320)
    // bilinear interpolation of a (bi)linear field is exact on interior pixels
    val rows = out.collect()
    assert(rows.length > 200, s"only ${rows.length} interpolated pixels")
    var worstInterior = 0.0
    rows.foreach { r =>
      val cell = r.getAs[Long]("dst_id")
      val xc = cell % 20; val yc = cell / 20
      val cx = xc + 0.5; val cy = 19 - yc + 0.5
      val expected = 2.0 * cx + 3.0 * cy
      val got = r.getAs[Double]("value")
      val interior = xc >= 2 && xc <= 17 && yc >= 2 && yc <= 17
      if (interior) worstInterior = math.max(worstInterior, math.abs(got - expected))
    }
    assert(worstInterior < 0.05, s"worst interior error $worstInterior")
  }

  test("ewa ll2cr fractional coordinates (J6)") {
    val s = spark
    import s.implicits._
    val area = AreaDef("e", Crs.fromProj4("+proj=longlat"), 10, 10, 0, 0, 10, 10)
    val sw = Seq((0, 0, 2.5, 7.5, 1.0)).toDF("y", "x", "lon", "lat", "value")
    val r = EwaResample.ll2cr(sw, area).collect()(0)
    assert(r.getAs[Double]("u") == 2.5 && r.getAs[Double]("v") == 2.5)
  }

  test("ewa resample of a constant field is constant (A8)") {
    val s = spark
    import s.implicits._
    val area = AreaDef("e", Crs.fromProj4("+proj=longlat"), 12, 12, 0, 0, 12, 12)
    val sw = (for { y <- 0 until 24; x <- 0 until 24 } yield
      (y, x, x * 0.5 + 0.25, 11.75 - y * 0.5, 5.0)).toDF("y", "x", "lon", "lat", "value")
    val out = EwaResample.resample(sw, area, rowsPerScan = 8)
    val vals = out.collect().map(_.getAs[Double]("value"))
    assert(vals.length > 100)
    vals.foreach(v => assert(approx(v, 5.0, 1e-9), s"got $v"))
  }

  test("ewa multi-channel shares weights; per-channel validity") {
    val s = spark
    import s.implicits._
    val area = AreaDef("e", Crs.fromProj4("+proj=longlat"), 12, 12, 0, 0, 12, 12)
    val sw = (for { y <- 0 until 24; x <- 0 until 24 } yield
      (y, x, x * 0.5 + 0.25, 11.75 - y * 0.5, 5.0,
        if ((y + x) % 2 == 0) 7.0 else Double.NaN)).toDF("y", "x", "lon", "lat", "c1", "c2")
    val out = EwaResample.resampleMulti(sw, area, rowsPerScan = 8, Seq("c1", "c2"))
    val rows = out.collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      assert(approx(r.getAs[Double]("c1"), 5.0, 1e-9))
      val c2 = r.getAs[Double]("c2")
      assert(c2.isNaN || approx(c2, 7.0, 1e-9)) // NaN only where every contributor was invalid
    }
    assert(rows.count(r => !r.getAs[Double]("c2").isNaN) > 50)
  }

  test("ewa maximum_weight_mode keeps a single observed value") {
    val s = spark
    import s.implicits._
    val area = AreaDef("e", Crs.fromProj4("+proj=longlat"), 6, 6, 0, 0, 6, 6)
    val sw = (for { y <- 0 until 12; x <- 0 until 12 } yield
      (y, x, x * 0.5 + 0.25, 5.75 - y * 0.5, (y * 12 + x).toDouble)).toDF("y", "x", "lon", "lat", "value")
    val out = EwaResample.resample(sw, area, rowsPerScan = 4, maximumWeightMode = true)
    val inVals = (0 until 144).map(_.toDouble).toSet
    out.collect().foreach(r => assert(inVals.contains(r.getAs[Double]("value"))))
  }

  test("gradient nearest + bilinear area->area (J8)") {
    val s = spark
    import s.implicits._
    val src = AreaDef("src", Crs.fromProj4("+proj=longlat"), 20, 20, 0, 0, 20, 20)
    val dst = AreaDef("dst", Crs.fromProj4("+proj=longlat"), 10, 10, 2, 2, 12, 12)
    // source value = linear field of the pixel centre coords
    val cells = (0 until 400).map { c =>
      val x = src.projX((c % 20).toInt); val y = src.projY((c / 20).toInt)
      (c.toLong, 2.0 * x + 3.0 * y)
    }.toDF("cell", "value")

    val nn = GradientResample.nearest(cells, src, dst)
    assert(nn.count() == 100)
    val bl = GradientResample.bilinear(cells, src, dst)
    val rows = bl.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val cell = r.getAs[Long]("dst_id")
      val cx = dst.projX((cell % 10).toInt); val cy = dst.projY((cell / 10).toInt)
      assert(approx(r.getAs[Double]("value"), 2.0 * cx + 3.0 * cy, 1e-9),
        s"cell $cell: ${r.getAs[Double]("value")} vs ${2.0 * cx + 3.0 * cy}")
    }
  }
}
