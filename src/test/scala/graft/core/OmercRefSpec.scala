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

  test("reference-fit optimal bb area covers the swath (compute_optimal_bb, WGS84)") {
    val s = spark
    import s.implicits._
    val sw = (for { y <- 0 until 40; x <- 0 until 10 } yield {
      val along = y * 0.5
      (y, x, 0.0 + along + x * 0.1, 30.0 + along - x * 0.1)
    }).toDF("y", "x", "lon", "lat")
    val area = GeometryOps.computeOptimalBbAreaRef(sw, resolutionMetres = 20000)
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
