package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Transverse Mercator / UTM and the CF-completing projections (aea, sinu,
  * ortho, nsper) — golden anchors from published sources (Snyder PP 1395
  * worked examples; the classic UTM 31N equator anchor) plus tight
  * round-trip and equal-area invariants. The reference reaches all of
  * these through pyproj (`utils/cf.py:31`, `utils/rasterio.py:77`). */
class TmercSpec extends AnyFunSuite {

  private val clarke1866 = Ellipsoid(6378206.4, 6356583.8)

  test("tmerc matches Snyder's worked example (PP 1395 p. 269)") {
    // Clarke 1866, lat_0=0, lon_0=-75, k_0=0.9996; point (40.5 N, 73.5 W)
    val p = TmercProj(-75.0, 0.0, 0.9996, clarke1866)
    val (x, y) = p.forward(-73.5, 40.5)
    // published: x = 127,106.5 m east, y = 4,484,124.4 m north
    assert(math.abs(x - 127106.5) < 0.5, s"x=$x")
    assert(math.abs(y - 4484124.4) < 0.5, s"y=$y")
    val (lon, lat) = p.inverse(x, y)
    assert(math.abs(lon - -73.5) < 1e-9 && math.abs(lat - 40.5) < 1e-9)
  }

  test("UTM 31N: equator/prime-meridian anchor and central-meridian identity") {
    val crs = Crs.fromProj4("+proj=utm +zone=31 +ellps=WGS84")
    // proj=utm rewrites to explicit tmerc params
    assert(crs.params("proj") == "tmerc")
    assert(crs.params("lon_0") == "3" && crs.params("x_0") == "500000")
    // the classic anchor: (0 N, 0 E) in UTM 31N = easting 166,021.44 m
    val (x0, y0) = crs.forward(0.0, 0.0)
    assert(math.abs(x0 - 166021.44) < 0.02, s"x=$x0")
    assert(math.abs(y0) < 1e-6, s"y=$y0")
    // on the central meridian: easting exactly 500000, northing = scaled arc
    val (xc, yc) = crs.forward(3.0, 45.0)
    assert(math.abs(xc - 500000.0) < 1e-6)
    assert(yc > 4980000 && yc < 4990000) // ~4,983,437 m (0.9996 x arc to 45N)
  }

  test("UTM south: false northing 10,000,000") {
    val crs = Crs.fromProj4("+proj=utm +zone=33 +south +ellps=WGS84")
    val (lon, lat) = crs.inverse(500000.0, 10000000.0)
    assert(math.abs(lon - 15.0) < 1e-9 && math.abs(lat) < 1e-9)
    val (_, y) = crs.forward(15.0, -30.0)
    assert(y < 10000000 && y > 6000000)
  }

  test("tmerc round-trip < 1e-9 deg across a UTM zone (and beyond), WGS84") {
    val p = TmercProj(9.0, 0.0, 0.9996, Ellipsoid.WGS84)
    for (dLon <- Seq(-9.0, -3.0, -1.5, -0.01, 0.0, 0.8, 2.99, 6.0, 9.0);
         lat <- Seq(-84.0, -60.0, -33.3, -1e-4, 0.0, 12.7, 45.0, 71.2, 84.0)) {
      val (x, y) = p.forward(9.0 + dLon, lat)
      assert(!x.isNaN && !y.isNaN, s"NaN at dLon=$dLon lat=$lat")
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(Projection.wrapLonDeg(lon2 - (9.0 + dLon))) < 1e-9,
        s"lon roundtrip at dLon=$dLon lat=$lat: $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat roundtrip at dLon=$dLon lat=$lat: $lat2")
    }
  }

  test("tmerc with lat_0: y = 0 at the origin latitude") {
    val p = TmercProj(-75.0, 40.0, 1.0, Ellipsoid.WGS84)
    val (x, y) = p.forward(-75.0, 40.0)
    assert(math.abs(x) < 1e-9 && math.abs(y) < 1e-9)
    val (lon, lat) = p.inverse(0.0, 0.0)
    assert(math.abs(lon - -75.0) < 1e-9 && math.abs(lat - 40.0) < 1e-9)
  }

  test("tmerc domain: far from the central meridian maps to NaN") {
    val p = TmercProj(0.0, 0.0, 0.9996, Ellipsoid.WGS84)
    val (x, _) = p.forward(90.0, 10.0)
    assert(x.isNaN)
  }

  test("meridian arc: WGS84 quadrant is 10,001,965.73 m") {
    val arc = ProjMath.meridianArc(math.Pi / 2, Ellipsoid.WGS84)
    assert(math.abs(arc - 10001965.729) < 0.05, s"arc=$arc")
    // footpoint inversion round-trips
    for (lat <- Seq(-80.0, -45.0, 0.0, 10.0, 52.5, 89.0)) {
      val phi = lat * Projection.Deg2Rad
      val back = ProjMath.phiFromArc(ProjMath.meridianArc(phi, Ellipsoid.WGS84), Ellipsoid.WGS84)
      assert(math.abs(back - phi) < 1e-10, s"lat=$lat")
    }
  }

  test("aea matches Snyder's worked example (PP 1395 p. 292)") {
    // Clarke 1866; lat_1=29.5, lat_2=45.5, lat_0=23, lon_0=-96; point (35 N, 75 W)
    val p = AeaProj(-96.0, 23.0, 29.5, 45.5, clarke1866)
    val (x, y) = p.forward(-75.0, 35.0)
    assert(math.abs(x - 1885472.7) < 1.0, s"x=$x")
    assert(math.abs(y - 1535925.0) < 1.0, s"y=$y")
    val (lon, lat) = p.inverse(x, y)
    assert(math.abs(lon - -75.0) < 1e-8 && math.abs(lat - 35.0) < 1e-8)
  }

  test("aea is equal-area: numeric Jacobian = ellipsoidal area element") {
    val ell = Ellipsoid.WGS84
    val p = AeaProj(-96.0, 23.0, 29.5, 45.5, ell)
    for ((lon, lat) <- Seq((-96.0, 37.0), (-120.0, 30.0), (-75.0, 48.0), (-96.0, 5.0))) {
      val hDeg = 1e-5
      val (x0, y0) = p.forward(lon - hDeg, lat); val (x1, y1) = p.forward(lon + hDeg, lat)
      val (x2, y2) = p.forward(lon, lat - hDeg); val (x3, y3) = p.forward(lon, lat + hDeg)
      val jac = math.abs(((x1 - x0) * (y3 - y2) - (x3 - x2) * (y1 - y0))) /
        math.pow(2 * hDeg * Projection.Deg2Rad, 2)
      val s = math.sin(lat * Projection.Deg2Rad)
      val trueEl = ell.a * ell.a * (1 - ell.e2) * math.cos(lat * Projection.Deg2Rad) /
        math.pow(1 - ell.e2 * s * s, 2)
      assert(math.abs(jac / trueEl - 1.0) < 1e-4, s"($lon,$lat): jac/el=${jac / trueEl}")
    }
  }

  test("sinu: MODIS sphere anchors (R=6371007.181)") {
    val p = SinuProj(0.0, Ellipsoid.sphere(6371007.181))
    val (x, _) = p.forward(-180.0, 0.0)
    assert(math.abs(x + math.Pi * 6371007.181) < 1e-6) // west edge of the MODIS grid
    val (_, yP) = p.forward(0.0, 90.0)
    assert(math.abs(yP - math.Pi / 2 * 6371007.181) < 1e-6)
    for ((lon, lat) <- Seq((-65.3, 44.1), (120.0, -33.0), (0.0, 0.0), (179.0, 80.0))) {
      val (fx, fy) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(fx, fy)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("sinu ellipsoidal: equal-area Jacobian + round-trip") {
    val ell = Ellipsoid.WGS84
    val p = SinuProj(10.0, ell)
    for ((lon, lat) <- Seq((10.0, 0.0), (40.0, 55.0), (-120.0, -70.0))) {
      val hDeg = 1e-5
      val (x0, y0) = p.forward(lon - hDeg, lat); val (x1, y1) = p.forward(lon + hDeg, lat)
      val (x2, y2) = p.forward(lon, lat - hDeg); val (x3, y3) = p.forward(lon, lat + hDeg)
      val jac = math.abs(((x1 - x0) * (y3 - y2) - (x3 - x2) * (y1 - y0))) /
        math.pow(2 * hDeg * Projection.Deg2Rad, 2)
      val s = math.sin(lat * Projection.Deg2Rad)
      val trueEl = ell.a * ell.a * (1 - ell.e2) * math.cos(lat * Projection.Deg2Rad) /
        math.pow(1 - ell.e2 * s * s, 2)
      assert(math.abs(jac / trueEl - 1.0) < 1e-4, s"($lon,$lat)")
      val (lon2, lat2) = p.inverse(p.forward(lon, lat)._1, p.forward(lon, lat)._2)
      assert(math.abs(Projection.wrapLonDeg(lon2 - lon)) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
    }
  }

  test("ortho matches Snyder's spherical example (PP 1395 p. 311) and masks the far side") {
    // R=1 sphere, centre (40 N, 100 W); point (30 N, 110 W)
    val p = OrthoProj(-100.0, 40.0, Ellipsoid.sphere(1.0))
    val (x, y) = p.forward(-110.0, 30.0)
    assert(math.abs(x - -0.1503837) < 1e-6, s"x=$x")
    assert(math.abs(y - -0.1651911) < 1e-6, s"y=$y")
    val (bx, _) = p.forward(80.0, -40.0) // antipode: far side
    assert(bx.isNaN)
    for ((lon, lat) <- Seq((-100.0, 40.0), (-130.0, 20.0), (-60.0, 60.0))) {
      val (fx, fy) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(fx, fy)
      assert(math.abs(Projection.wrapLonDeg(lon2 - lon)) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("nsper: converges to ortho as h grows; horizon masks; round-trips") {
    val r = 6371007.181
    val ortho = OrthoProj(10.0, 30.0, Ellipsoid.sphere(r))
    val far = NsperProj(10.0, 30.0, 1e15, Ellipsoid.sphere(r))
    val (ox, oy) = ortho.forward(20.0, 40.0)
    val (nx, ny) = far.forward(20.0, 40.0)
    assert(math.abs(ox - nx) < 1.0 && math.abs(oy - ny) < 1.0)
    // geostationary-height viewpoint: ~81 deg of arc visible, 90 is not
    val geo = NsperProj(0.0, 0.0, 35785831.0, Ellipsoid.sphere(r))
    assert(!geo.forward(80.0, 0.0)._1.isNaN)
    assert(geo.forward(90.0, 0.0)._1.isNaN)
    for ((lon, lat) <- Seq((0.0, 0.0), (30.0, 20.0), (-50.0, -12.0), (70.0, 40.0))) {
      val (fx, fy) = geo.forward(lon, lat)
      val (lon2, lat2) = geo.inverse(fx, fy)
      assert(math.abs(Projection.wrapLonDeg(lon2 - lon)) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("x_0/y_0 false easting/northing: UPS North (EPSG:5041 shape)") {
    // UPS: polar stere variant A, k_0=0.994, FE=FN=2,000,000
    val crs = Crs.fromProj4(
      "+proj=stere +lat_0=90 +k_0=0.994 +lon_0=0 +x_0=2000000 +y_0=2000000 +ellps=WGS84")
    val (x, y) = crs.forward(0.0, 90.0)
    assert(math.abs(x - 2000000) < 1e-6 && math.abs(y - 2000000) < 1e-6)
    val (lon, lat) = crs.inverse(2000000.0, 1000000.0) // due south along 180W/0E axis
    assert(math.abs(lat - 81.01) < 0.05, s"lat=$lat") // ~1000 km from the pole
    assert(math.abs(Projection.wrapLonDeg(lon - 180.0)) < 1e-6 || math.abs(lon) < 1e-6)
  }

  test("merc k_0 variant: k_0=0.7 equals lat_ts at acos-equivalent scale (sphere)") {
    val a = 6371000.0
    val viaK = Crs.fromProj4(s"+proj=merc +k_0=0.7 +a=$a")
    val latTs = math.acos(0.7) * Projection.Rad2Deg
    val viaTs = Crs.fromProj4(s"+proj=merc +lat_ts=$latTs +a=$a")
    val (x1, y1) = viaK.forward(45.0, 30.0)
    val (x2, y2) = viaTs.forward(45.0, 30.0)
    assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6)
    intercept[IllegalArgumentException](Crs.fromProj4("+proj=merc +k_0=0.7 +lat_ts=30"))
  }
}
