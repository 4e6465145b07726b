package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Projection kernel: forward/inverse round-trips over dense deterministic
  * lon/lat lattices (the property layer the reference lacks, SURVEY §5)
  * plus anchor values derivable by hand. */
class CrsSpec extends AnyFunSuite {

  private def roundTrip(crs: Crs, lon: Double, lat: Double, tolDeg: Double = 1e-6): Unit = {
    val (x, y) = crs.forward(lon, lat)
    assert(!x.isNaN && !y.isNaN, s"forward($lon,$lat) NaN for ${crs.proj4}")
    val (lon2, lat2) = crs.inverse(x, y)
    val dLon = math.abs(Projection.wrapLonDeg(lon2 - lon))
    assert(dLon < tolDeg || math.abs(dLon - 360) < tolDeg, s"lon $lon -> $lon2 (${crs.proj4})")
    assert(math.abs(lat2 - lat) < tolDeg, s"lat $lat -> $lat2 (${crs.proj4})")
  }

  /** Deterministic lattice sweep (steps chosen to avoid exact poles/dateline). */
  private def sweep(crs: Crs, lonMin: Double, lonMax: Double, latMin: Double, latMax: Double,
      tol: Double = 1e-6, n: Int = 23): Unit = {
    var i = 0
    while (i <= n) {
      var j = 0
      while (j <= n) {
        val lon = lonMin + (lonMax - lonMin) * i / n
        val lat = latMin + (latMax - latMin) * j / n
        roundTrip(crs, lon, lat, tol)
        j += 1
      }
      i += 1
    }
  }

  test("merc sphere + ellipsoid round-trip") {
    sweep(Crs.fromProj4("+proj=merc +a=6371000"), -179.9, 179.9, -85, 85)
    sweep(Crs.fromProj4("+proj=merc +a=6378137 +b=6356752.314245179 +lat_ts=20"), -179.9, 179.9, -85, 85)
  }

  test("merc anchors: equator scale") {
    val c = Crs.fromProj4("+proj=merc +a=6371000")
    val (x, y) = c.forward(90, 0)
    assert(math.abs(x - 6371000 * math.Pi / 2) < 1e-6)
    assert(math.abs(y) < 1e-9)
  }

  test("laea polar (ease_sh-style) round-trip and anchors") {
    val c = Crs.fromProj4("+proj=laea +lat_0=-90 +lon_0=0 +a=6371228")
    val (x0, y0) = c.forward(0, -90)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    // equator circle at rho = R*sqrt(2) (Snyder 24-8 with phi=0)
    val (xe, ye) = c.forward(0, 0)
    assert(math.abs(math.hypot(xe, ye) - 6371228 * math.sqrt(2.0)) < 1e-3)
    sweep(c, -179.9, 179.9, -89.9, 20, 1e-5)
  }

  test("laea polar ellipsoid round-trip") {
    val c = Crs.fromProj4("+proj=laea +lat_0=90 +lon_0=0 +a=6378137 +b=6356752.314245179")
    sweep(c, -179.9, 179.9, 10, 89.9, 1e-5)
  }

  test("laea oblique sphere + ellipsoid round-trip") {
    sweep(Crs.fromProj4("+proj=laea +lat_0=45 +lon_0=10 +a=6370997"), -60, 80, -20, 84, 1e-5)
    sweep(Crs.fromProj4("+proj=laea +lat_0=52 +lon_0=10 +a=6378137 +b=6356752.314245179"),
      -60, 80, -20, 84, 1e-5)
  }

  test("stere oblique ellipsoid (kd-tree golden test CRS) round-trip") {
    val c = Crs.fromProj4("+proj=stere +a=6378144 +b=6356759 +lat_0=50 +lat_ts=50 +lon_0=8")
    sweep(c, -40, 60, 20, 80, 1e-5)
    val (x, y) = c.forward(8, 50)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
  }

  test("stere polar round-trip") {
    sweep(Crs.fromProj4("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +a=6378137 +b=6356752.314245179"),
      -179.9, 179.9, 30, 89.9, 1e-5)
    sweep(Crs.fromProj4("+proj=stere +lat_0=-90 +a=6371000"), -179.9, 179.9, -89.9, -30, 1e-5)
  }

  test("aeqd round-trip") {
    sweep(Crs.fromProj4("+proj=aeqd +lat_0=40 +lon_0=-100 +a=6371000"), -179.9, 179.9, -85, 85, 1e-5)
  }

  test("eqc + longlat round-trip") {
    sweep(Crs.fromProj4("+proj=eqc +a=6371000 +lat_ts=30"), -179.9, 179.9, -85, 85)
    val ll = Crs.fromProj4("+proj=longlat")
    assert(ll.isLonLat && ll.forward(12.5, -33.25) == ((12.5, -33.25)))
  }

  test("geos: sub-satellite point at origin; visible disk round-trips; off-disk NaN") {
    val c = Crs.fromProj4("+proj=geos +lon_0=0 +h=35785831 +a=6378169 +b=6356583.8")
    val (x0, y0) = c.forward(0, 0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    sweep(c, -55, 55, -55, 55, 1e-4)
    val (xn, yn) = c.forward(180, 0)
    assert(xn.isNaN && yn.isNaN)
  }

  test("geos sweep=x variant round-trips") {
    val c = Crs.fromProj4("+proj=geos +lon_0=-75 +h=35786023 +a=6378137 +b=6356752.31414 +sweep=x")
    sweep(c, -125, -25, -55, 55, 1e-4)
  }

  test("lcc 1- and 2-parallel round-trip, sphere + ellipsoid") {
    sweep(Crs.fromProj4("+proj=lcc +lat_0=40 +lat_1=33 +lat_2=45 +lon_0=-96 +a=6378137 +b=6356752.314245179"),
      -150, -40, 5, 75, 1e-5)
    sweep(Crs.fromProj4("+proj=lcc +lat_0=-30 +lat_1=-30 +lon_0=140 +a=6371000"),
      100, 179, -70, 5, 1e-5)
    // centre maps to (0, 0)
    val c = Crs.fromProj4("+proj=lcc +lat_0=40 +lat_1=33 +lat_2=45 +lon_0=-96 +a=6378137 +b=6356752.314245179")
    val (x0, y0) = c.forward(-96, 40)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
    // cone pole maps to rho=0
    val (xp, yp) = c.forward(0, 90)
    assert(math.abs(xp) < 1e-6)
  }

  test("proj4 parser: params, ellipsoid resolution, errors") {
    val c = Crs.fromProj4("+proj=laea +lat_0=-90 +lon_0=0 +a=6371228 +units=m")
    assert(c.params("proj") == "laea" && c.params("a") == "6371228")
    assert(Crs.fromProj4("+proj=merc +ellps=sphere").proj.ell.isSphere)
    assertThrows[IllegalArgumentException](Crs.fromProj4("+proj=unknownproj"))
  }

  test("wrap_longitudes contract (utils/__init__.py:186)") {
    assert(Projection.wrapLonDeg(190.0) == -170.0)
    assert(Projection.wrapLonDeg(-190.0) == 170.0)
    assert(Projection.wrapLonDeg(540.0) == 180.0 || Projection.wrapLonDeg(540.0) == -180.0)
    assert(Projection.wrapLonDeg(0.0) == 0.0)
  }

  test("hotine omerc: antipodal aliasing band is outside the domain (NaN)") {
    // Regression for a ScalaCheck falsification: with ellipsoidal B > 1 the
    // inverse atan2 only recovers B*dLam in (-pi, pi], so the ~0.6 deg band
    // at the antipodal meridian aliased by 2*pi/B (168.91 -> 167.70). The
    // forward must declare it out-of-domain instead of round-tripping wrong.
    val c = Crs.fromProj4("+proj=omerc +lonc=-11.39 +lat_0=-0.28 +alpha=9.19 +ellps=WGS84")
    val (xa, ya) = c.forward(168.91018286062754, -75.00713947450184)
    assert(xa.isNaN && ya.isNaN)
    // just inside the band on either side still round-trips
    for (lon <- Seq(167.5, 170.2); lat <- Seq(-75.0, 0.0, 40.0)) {
      val (x, y) = c.forward(lon, lat)
      assert(!x.isNaN && !y.isNaN, s"($lon,$lat) unexpectedly out of domain")
      val (lon2, lat2) = c.inverse(x, y)
      assert(math.abs(Projection.wrapLonDeg(lon2 - lon)) < 1e-4 && math.abs(lat2 - lat) < 1e-4,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("cea (r10): sphere anchors, ellipsoid round-trip, equal-area property") {
    // sphere, lat_ts = 0: x = R*lam, y = R*sin(phi) (Snyder 10-1/10-2)
    val r = 6371000.0
    val s = Crs.fromProj4(s"+proj=cea +lon_0=0 +a=$r")
    val (x90, _) = s.forward(90.0, 0.0)
    assert(math.abs(x90 - r * math.Pi / 2) < 1e-6)
    val (_, y30) = s.forward(0.0, 30.0)
    assert(math.abs(y30 - r * 0.5) < 1e-6)
    val (_, yPole) = s.forward(0.0, 90.0)
    assert(math.abs(yPole - r) < 1e-6, "sphere pole maps to y = R")
    sweep(s, -179, 179, -89, 89)
    // lat_ts = 30 rescales: x shrinks by cos(30), y grows by 1/cos(30)
    val s30 = Crs.fromProj4(s"+proj=cea +lat_ts=30 +lon_0=0 +a=$r")
    val (x30, _) = s30.forward(90.0, 0.0)
    assert(math.abs(x30 - r * (math.Pi / 2) * math.cos(30 * math.Pi / 180)) < 1e-6)
    sweep(s30, -179, 179, -89, 89)
    // equal-area property on the sphere, against INDEPENDENT trig: the
    // projected area of a 1x1-degree quad starting at lat phi equals the
    // true spherical area R^2 * dLam * (sin(phi+1) - sin(phi))
    def quadArea(c: Crs, lat: Double): Double = {
      val (x0, y0) = c.forward(10.0, lat); val (x1, y1) = c.forward(11.0, lat + 1.0)
      math.abs((x1 - x0) * (y1 - y0))
    }
    for (lat <- Seq(0.0, 30.0, 60.0, 85.0)) {
      val truth = r * r * (math.Pi / 180.0) *
        (math.sin((lat + 1) * math.Pi / 180) - math.sin(lat * math.Pi / 180))
      assert(math.abs(quadArea(s30, lat) / truth - 1.0) < 1e-12,
        s"projected quad area at $lat must equal the true spherical area")
    }
    // WGS84 ellipsoid: round-trip across the full sweep
    val e = Crs.fromProj4("+proj=cea +lat_ts=30 +lon_0=0 +a=6378137 +rf=298.257223563")
    sweep(e, -179, 179, -89, 89)
    // out-of-domain y (beyond the pole line) is NaN, not a wrong latitude
    val (lonN, latN) = e.inverse(0.0, 1.2e7)
    assert(lonN.isNaN && latN.isNaN)
  }

  test("rotated pole (r10): CF anchors, round-trip, isometry of the rotation") {
    // CORDEX-EUR-style pole: grid_north_pole (lon -162, lat 39.25) ->
    // PROJ ob_tran o_lat_p=39.25 lon_0=18
    val c = Crs.fromProj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +o_lon_p=0 +lon_0=18 +a=6371000")
    // the grid center: true (pole_lon+180, 90-pole_lat) -> rotated (0, 0)
    val (gx, gy) = c.forward(18.0, 50.75)
    assert(math.abs(gx) < 1e-9 && math.abs(gy) < 1e-9, s"grid centre ($gx,$gy)")
    // the true north pole appears at rotated (north_pole_grid_longitude, pole_lat)
    val (px, py) = c.forward(77.0, 90.0) // any longitude at the pole
    assert(math.abs(px) < 1e-9 && math.abs(py - 39.25) < 1e-9, s"true pole ($px,$py)")
    sweep(c, -179, 179, -89, 89)
    // identity pole: grid_north_pole_latitude = 90, longitude -180 (lon_0=0)
    val id = Crs.fromProj4("+proj=ob_tran +o_proj=longlat +o_lat_p=90 +o_lon_p=0 +lon_0=0 +a=6371000")
    for ((lon, lat) <- Seq((0.0, 0.0), (10.0, 50.0), (-120.0, -33.0))) {
      val (x, y) = id.forward(lon, lat)
      assert(math.abs(x - lon) < 1e-9 && math.abs(y - lat) < 1e-9, s"identity ($lon,$lat)->($x,$y)")
    }
    // north_pole_grid_longitude spins the rotated grid about its own pole
    val spun = Crs.fromProj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +o_lon_p=25 +lon_0=18 +a=6371000")
    val (sx, sy) = spun.forward(18.0, 50.75)
    assert(math.abs(sx - 25.0) < 1e-9 && math.abs(sy) < 1e-9)
    sweep(spun, -179, 179, -89, 89)
    // the transform is a pure rotation: great-circle distances are invariant
    def gc(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val (l1, p1, l2, p2) = (lon1 * math.Pi / 180, lat1 * math.Pi / 180,
        lon2 * math.Pi / 180, lat2 * math.Pi / 180)
      val h = math.pow(math.sin((p2 - p1) / 2), 2) +
        math.cos(p1) * math.cos(p2) * math.pow(math.sin((l2 - l1) / 2), 2)
      2 * math.asin(math.min(1.0, math.sqrt(h)))
    }
    for ((a, b) <- Seq(((10.0, 45.0), (25.0, 60.0)), ((-70.0, -10.0), (140.0, 35.0)))) {
      val ra = c.forward(a._1, a._2); val rb = c.forward(b._1, b._2)
      assert(math.abs(gc(a._1, a._2, b._1, b._2) - gc(ra._1, ra._2, rb._1, rb._2)) < 1e-12,
        s"rotation must preserve angular distance for $a-$b")
    }
  }
}
