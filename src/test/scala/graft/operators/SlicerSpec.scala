package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs, GeosGeometry}

/** SwathSlicer + geostationary disk geometry, mirroring
  * `pyresample/test/test_slicer.py` (TestSwathSlicer.setUp geometry and the
  * geos-domain AreaSlicer cases) and `geometry.py:2793-2877`. */
class SlicerSpec extends SparkSpec {

  // a 100x50 gridded swath running diagonally across Europe (the
  // test_slicer.py:222-236 shape; built arithmetically because our omerc
  // uses Snyder's axis convention, not PROJ's offset u-v — see OmercSpec)
  private def euroSwath = {
    val s = spark
    import s.implicits._
    (for { y <- 0 until 100; x <- 0 until 50 } yield
      (y, x, x * 0.5 - 5.0 + y * 0.05, 30.0 + y * 0.4 - x * 0.02)).toDF("y", "x", "lon", "lat")
  }

  // euro40 polar stere target (test_slicer.py:215-221; bessel ellipsoid)
  private val dstEuro40 = AreaDef("euro40",
    Crs.fromProj4("+proj=stere +lon_0=14 +lat_0=90 +lat_ts=60 +a=6377397.155 +b=6356078.963"),
    102, 102, -2717181.7304994687, -5571048.14031214, 1378818.2695005313, -1475048.1403121399)

  test("swath slicing crops to the target and not the full dataset (test_slicer.py:246-263)") {
    val sw = euroSwath
    val bounds = SwathSlicer.sliceBounds(sw, dstEuro40, blockRows = 10, blockCols = 10)
    assert(bounds.isDefined)
    val (r0, r1, c0, c1) = bounds.get
    info(s"assembled slice rows [$r0,$r1] cols [$c0,$c1]")
    val n = SwathSlicer.slice(sw, dstEuro40, 10, 10).count()
    assert(n > 0 && n < 5000, s"crop kept $n of 5000 rows") // proper subset
    // completeness invariant: every swath point whose projection falls
    // inside the target area must survive the crop
    euroSwath.collect().foreach { r =>
      val (y, x) = (r.getInt(0), r.getInt(1))
      val (lo, la) = (r.getDouble(2), r.getDouble(3))
      val (px, py) = dstEuro40.crs.forward(lo, la)
      if (!px.isNaN && dstEuro40.contains(px, py))
        assert(y >= r0 && y <= r1 && x >= c0 && x <= c1,
          s"in-target point ($y,$x) at ($lo,$la) was cropped away")
    }
  }

  test("swath slicing of a disjoint target returns empty") {
    val far = AreaDef("far", Crs.fromProj4("+proj=longlat"), 10, 10, -170, -60, -160, -50)
    assert(SwathSlicer.sliceBounds(euroSwath, far, 10, 10).isEmpty)
    assert(SwathSlicer.slice(euroSwath, far, 10, 10).count() == 0)
  }

  // full-disk geos source (normal orientation; WGS84 + default height)
  private val geosFd = AreaDef("geos_fd",
    Crs.fromProj4("+proj=geos +h=35785831 +a=6378137.0 +b=6356752.314245179"),
    100, 100, -5550000.0, -5550000.0, 5550000.0, 5550000.0)

  test("geostationary angle extent and disk boundary (geometry.py:2793-2851)") {
    val (xa, ya) = GeosGeometry.angleExtent(geosFd.crs)
    // ~8.7 degrees from geostationary orbit
    assert(approx(math.toDegrees(xa), 8.71, 0.05), s"x angle ${math.toDegrees(xa)}")
    assert(ya < xa) // polar flattening narrows the y angle
    val disk = GeosGeometry.fullDiskBoundary(geosFd.crs, 100)
    assert(disk.size == 100)
    // boundary stays on-earth: every point inverse-projects to real lon/lat
    val ll = disk.map { case (x, y) => geosFd.crs.inverse(x, y) }
    assert(ll.forall { case (lo, la) => !lo.isNaN && !la.isNaN })
    val lats = ll.map(_._2)
    assert(lats.max > 75 && lats.min < -75)
  }

  test("disk polygon clipped to a sub-extent") {
    val upperRight = geosFd.slice(0, 50, 50, 100) // NE quadrant
    val poly = GeosGeometry.diskPolygonInExtent(upperRight, 360)
    assert(poly.nonEmpty)
    assert(poly.forall { case (x, y) =>
      x >= upperRight.xLL - 1 && x <= upperRight.xUR + 1 &&
        y >= upperRight.yLL - 1 && y <= upperRight.yUR + 1
    })
  }

  test("Sutherland-Hodgman clip: square by triangle") {
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val clipped = GeosGeometry.clipPolygon(square, Seq((0.0, 0.0), (8.0, 0.0), (0.0, 8.0)))
    // area of square inside the triangle x+y<=8: the whole square (corner at (4,4) on the edge)
    def area(p: Seq[(Double, Double)]): Double =
      math.abs(p.indices.map { i =>
        val (x1, y1) = p(i); val (x2, y2) = p((i + 1) % p.size); x1 * y2 - x2 * y1
      }.sum) / 2
    assert(approx(area(clipped), 16.0, 1e-9))
    val clipped2 = GeosGeometry.clipPolygon(square, Seq((0.0, 0.0), (4.0, 0.0), (0.0, 4.0)))
    assert(approx(area(clipped2), 8.0, 1e-9)) // half the square
  }

  test("sub-disk geos extent keeps mid-edge lon/lat extrema (densified clip)") {
    // MSG-Europe-style cut-out, fully on-disk: every rectangle corner is
    // on-earth, so the Sutherland-Hodgman clip degenerates to the 4 corners.
    // The true min latitude is at the BOTTOM-EDGE CENTRE (nadir column),
    // which only a densified boundary can see.
    val msgEu = geosFd.copy(id = "msg_eu",
      xLL = -3400000.0, yLL = 2300000.0, xUR = 3400000.0, yUR = 3900000.0)
    val (lonMin, latMin, lonMax, latMax) = msgEu.lonLatBBox()

    // brute-force truth: dense sweep of the extent rectangle boundary
    var bfLonMin = Double.MaxValue; var bfLonMax = Double.MinValue
    var bfLatMin = Double.MaxValue; var bfLatMax = Double.MinValue
    val n = 2000
    (0 to n).foreach { i =>
      val fx = msgEu.xLL + (msgEu.xUR - msgEu.xLL) * i / n
      val fy = msgEu.yLL + (msgEu.yUR - msgEu.yLL) * i / n
      Seq((fx, msgEu.yLL), (fx, msgEu.yUR), (msgEu.xLL, fy), (msgEu.xUR, fy)).foreach {
        case (x, y) =>
          val (lo, la) = msgEu.crs.inverse(x, y)
          if (!lo.isNaN && !la.isNaN) {
            bfLonMin = math.min(bfLonMin, lo); bfLonMax = math.max(bfLonMax, lo)
            bfLatMin = math.min(bfLatMin, la); bfLatMax = math.max(bfLatMax, la)
          }
      }
    }
    // the corner-only bbox would sit well above the true min latitude
    val cornerLatMin = Seq(
      (msgEu.xLL, msgEu.yLL), (msgEu.xUR, msgEu.yLL)).map { case (x, y) =>
      msgEu.crs.inverse(x, y)._2
    }.min
    assert(cornerLatMin - bfLatMin > 0.5,
      s"fixture too easy: corners alone already capture latMin ($cornerLatMin vs $bfLatMin)")
    assert(math.abs(latMin - bfLatMin) < 0.1, s"latMin $latMin vs brute-force $bfLatMin")
    assert(math.abs(latMax - bfLatMax) < 0.1, s"latMax $latMax vs brute-force $bfLatMax")
    assert(math.abs(lonMin - bfLonMin) < 0.1, s"lonMin $lonMin vs brute-force $bfLonMin")
    assert(math.abs(lonMax - bfLonMax) < 0.1, s"lonMax $lonMax vs brute-force $bfLonMax")
  }

  test("clipPolygon: collinear subject/clip edges produce no NaN vertices") {
    val clip = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    // subject shares part of the clip's bottom edge (collinear segment)
    val subject = Seq((1.0, 0.0), (3.0, 0.0), (3.0, 2.0), (1.0, 2.0))
    val out = GeosGeometry.clipPolygon(subject, clip)
    assert(out.nonEmpty)
    assert(out.forall { case (x, y) =>
      java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)
    }, s"non-finite vertex in $out")
    // and a subject poking below, with the crossing segment collinear
    val subject2 = Seq((0.0, -1.0), (4.0, -1.0), (4.0, 1.0), (0.0, 1.0))
    val out2 = GeosGeometry.clipPolygon(subject2, clip)
    assert(out2.nonEmpty && out2.forall { case (x, y) =>
      java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)
    })
  }

  test("geos cropAround: target fully off-disk -> None (test_slicer.py:95-110)") {
    // Kasimbar, Indonesia (lon_0=120) is past the limb for a 0-deg geos sat
    val merc = AreaDef("kasimbar",
      Crs.fromProj4("+proj=merc +lon_0=120 +a=6378137.0 +b=6356752.314245179"),
      102, 102, -100000, -100000, 100000, 100000)
    assert(geosFd.cropAround(merc).isEmpty)
  }

  test("geos cropAround: target partly off-disk is clipped, not dropped (test_slicer.py:112-126)") {
    // Afghanistan-like merc area at lon_0=67.5 reaches past the limb's edge
    val merc = AreaDef("afgh",
      Crs.fromProj4("+proj=merc +lon_0=67.5 +a=6378137.0 +b=6356752.314245179"),
      102, 102, -1600000.0, 1600000.0, 1600000.0, 4800000.0)
    val res = geosFd.cropAround(merc)
    assert(res.isDefined)
    val (sub, r0, c0) = res.get
    info(s"geos crop: ${sub.width}x${sub.height} at row $r0 col $c0")
    assert(sub.width < geosFd.width && sub.height < geosFd.height)
    assert(sub.width > 1 && sub.height > 1)
  }
}
