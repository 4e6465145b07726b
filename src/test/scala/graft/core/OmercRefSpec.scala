package graft.core

import graft.SparkSpec
import graft.operators.GeometryOps

/** Reference-parity checks for the ellipsoidal (Hotine/PROJ-convention)
  * omerc and the reference's omerc fit, against pyresample's own golden
  * values in `test_geometry/test_swath.py:252-283`. */
class OmercRefSpec extends SparkSpec {

  test("two-point omerc fit matches the reference goldens (test_swath.py:252-266)") {
    // middle column of the reference's 3x3 test swath (transposed arrays):
    // lons [79.11, 7.284, -5.107], lats [80.84, 60.742, 34.085]
    val (lonc, lat0, alpha) = GeometryOps.computeOmercParametersRef(
      lon1 = 79.11000061035156, lat1 = 80.84000396728516,
      latMid = 60.74200439453125,
      lon2 = -5.107000350952148, lat2 = 34.08500289916992)
    assert(approx(lonc, -11.391744043133668, 1e-6), s"lonc=$lonc")
    assert(approx(lat0, -0.2821013754097188, 1e-6), s"lat0=$lat0")
    assert(approx(alpha, 9.185764390923012, 1e-6), s"alpha=$alpha")
  }

  test("Vincenty inverse against known geodesics") {
    // equatorial arc: 1 degree of longitude at the equator on WGS84
    val (s, az1, az2) = Geodesic.inverse(0, 0, 1, 0)
    assert(approx(s, 111319.4908, 0.01), s"s=$s")
    assert(approx(az1, 90.0, 1e-9) && approx(az2, -90.0, 1e-9))
    // meridian arc: equator to 1 deg north
    val (sm, azm, _) = Geodesic.inverse(0, 0, 0, 1)
    assert(approx(sm, 110574.3886, 0.01), s"sm=$sm")
    assert(approx(azm, 0.0, 1e-9))
  }

  test("Hotine omerc round-trips on WGS84") {
    val c = Crs.fromProj4("+proj=omerc +lonc=-11.391744043133668 +lat_0=-0.2821013754097188 +alpha=9.185764390923012 +ellps=WGS84")
    assert(c.proj.isInstanceOf[HotineOmercProj])
    for {
      lon <- Seq(-21.0, -11.39, -5.1, 10.0, 30.0, 79.0)
      lat <- Seq(-10.0, 0.0, 30.55, 60.74, 80.84)
    } {
      val (x, y) = c.forward(lon, lat)
      assert(!x.isNaN && !y.isNaN, s"NaN at $lon, $lat")
      val (lo, la) = c.inverse(x, y)
      assert(approx(lo, lon, 1e-8) && approx(la, lat, 1e-8),
        s"round-trip ($lon, $lat) -> ($x, $y) -> ($lo, $la)")
    }
  }

  // the 3x3 reference swath (transposed arrays, as the test constructs
  // them): lons(r)(c) is the (row, col) entry of the reference's lons.T
  private val refLons = Array(
    Array(-90.67900085449219, 79.11000061035156, 81.26400756835938),
    Array(-21.565000534057617, 7.284000396728516, 29.672000885009766),
    Array(-21.525001525878906, -5.107000350952148, 10.260000228881836))
  private val refLats = Array(
    Array(85.23900604248047, 80.84000396728516, 67.07600402832031),
    Array(62.256004333496094, 60.74200439453125, 54.147003173828125),
    Array(35.58000183105469, 34.08500289916992, 30.547003173828125))
  private val goldenExtent = (-2348379.728104, 3228086.496211, 2432121.058435, 10775774.254169)

  test("compute_optimal_bb extent + shape goldens (test_swath.py:316-341)") {
    def lon(r: Int, c: Int) = refLons(r)(c)
    def lat(r: Int, c: Int) = refLats(r)(c)

    // fit from the middle column (same as test above)
    val (lonc, lat0, alpha) = GeometryOps.computeOmercParametersRef(
      lon(0, 1), lat(0, 1), lat(1, 1), lon(2, 1), lat(2, 1))
    val crs = Crs.fromProj4(
      s"+proj=omerc +lonc=$lonc +lat_0=$lat0 +alpha=$alpha +ellps=WGS84")

    // _compute_uniform_shape (geometry.py:977-1017): geodesic row widths and
    // middle-column height, min-resolution, 1.1x margin, int() truncation
    val (_, _, w1) = (Geodesic.inverse(lon(0, 0), lat(0, 0), lon(0, 2), lat(0, 2)), 0, 0)
    val width1 = Geodesic.inverse(lon(0, 0), lat(0, 0), lon(0, 2), lat(0, 2))._1
    val width2 = Geodesic.inverse(lon(2, 0), lat(2, 0), lon(2, 2), lat(2, 2))._1
    val height = Geodesic.inverse(lon(0, 1), lat(0, 1), lon(2, 1), lat(2, 1))._1
    val width = math.min(width1, width2)
    val res = math.min(height / 3, width / 3)
    val wPix = (width * 1.1 / res).toInt
    val hPix = (height * 1.1 / res).toInt
    assert((hPix, wPix) == (6, 3), s"shape ($hPix, $wPix)")

    // freeze over the edge lon/lats (get_edge_lonlats golden list,
    // test_swath.py:285-300): projected min/max -> extent
    val edgeLons = Seq(-90.67900085, 79.11000061, 81.26400757, 81.26400757,
      29.67200089, 10.26000023, 10.26000023, -5.10700035, -21.52500153,
      -21.52500153, -21.56500053, -90.67900085)
    val edgeLats = Seq(85.23900604, 80.84000397, 67.07600403, 67.07600403,
      54.14700317, 30.54700089, 30.54700089, 34.0850029, 35.58000183,
      35.58000183, 62.25600433, 85.23900604)
    val pts = edgeLons.zip(edgeLats).map { case (lo, la) => crs.forward(lo, la) }
    assert(pts.forall(p => !p._1.isNaN && !p._2.isNaN))
    val (xs, ys) = (pts.map(_._1), pts.map(_._2))
    // compute_domain with shape (geometry.py:1168-1177): the projected
    // min/max are pixel CENTRES; resolution = span/(n-1), extent = ±res/2
    val xres = (xs.max - xs.min) / (wPix - 1)
    val yres = (ys.max - ys.min) / (hPix - 1)
    val extent = (xs.min - xres / 2, ys.min - yres / 2, xs.max + xres / 2, ys.max + yres / 2)
    info(s"extent = $extent")
    assert(approx(extent._1, goldenExtent._1, math.abs(goldenExtent._1) * 1e-5), s"x0 ${extent._1}")
    assert(approx(extent._2, goldenExtent._2, math.abs(goldenExtent._2) * 1e-5), s"y0 ${extent._2}")
    assert(approx(extent._3, goldenExtent._3, math.abs(goldenExtent._3) * 1e-5), s"x1 ${extent._3}")
    assert(approx(extent._4, goldenExtent._4, math.abs(goldenExtent._4) * 1e-5), s"y1 ${extent._4}")
  }

  test("computeOptimalBbAreaRef reproduces the reference area end-to-end") {
    val s = spark
    import s.implicits._
    val rows = for { r <- 0 until 3; c <- 0 until 3 }
      yield (r, c, refLons(r)(c), refLats(r)(c))
    val df = rows.toDF("y", "x", "lon", "lat")
    val area = GeometryOps.computeOptimalBbAreaRef(df)
    assert(area.height == 6 && area.width == 3, s"${area.width}x${area.height}")
    assert(approx(area.xLL, goldenExtent._1, math.abs(goldenExtent._1) * 1e-5), s"x0 ${area.xLL}")
    assert(approx(area.yLL, goldenExtent._2, math.abs(goldenExtent._2) * 1e-5), s"y0 ${area.yLL}")
    assert(approx(area.xUR, goldenExtent._3, math.abs(goldenExtent._3) * 1e-5), s"x1 ${area.xUR}")
    assert(approx(area.yUR, goldenExtent._4, math.abs(goldenExtent._4) * 1e-5), s"y1 ${area.yUR}")
  }

  test("reference-fit optimal bb area covers the swath (compute_optimal_bb, WGS84)") {
    val s = spark
    import s.implicits._
    val sw = (for { y <- 0 until 40; x <- 0 until 10 } yield {
      val along = y * 0.5
      (y, x, 0.0 + along + x * 0.1, 30.0 + along - x * 0.1)
    }).toDF("y", "x", "lon", "lat")
    val area = GeometryOps.computeOptimalBbAreaRef(sw, resolutionMetres = Some(20000.0))
    assert(area.crs.proj.isInstanceOf[HotineOmercProj])
    val inside = sw.collect().map { r =>
      val (px, py) = area.crs.forward(r.getDouble(2), r.getDouble(3))
      area.contains(px, py)
    }
    assert(inside.forall(identity))
    // anisotropic frame, like the spherical fit
    val aspect = math.max(area.width, area.height).toDouble / math.min(area.width, area.height)
    assert(aspect > 3.0, s"w=${area.width} h=${area.height}")
  }
}
