package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property layer (SURVEY §5: the reference has no
  * property-based tests; we add round-trip and algebraic invariants). */
object CrsProperties extends Properties("graft.core") {

  private val lonGen = Gen.choose(-179.9, 179.9)
  private val latGen = Gen.choose(-84.9, 84.9)

  private def roundTrips(crs: Crs, tol: Double): Prop =
    Prop.forAll(lonGen, latGen) { (lon, lat) =>
      val (x, y) = crs.forward(lon, lat)
      if (x.isNaN || y.isNaN) Prop.passed // outside projection domain
      else {
        val (lon2, lat2) = crs.inverse(x, y)
        val dLon = math.abs(Projection.wrapLonDeg(lon2 - lon))
        Prop(dLon < tol && math.abs(lat2 - lat) < tol) :|
          f"($lon%.4f,$lat%.4f) -> ($lon2%.4f,$lat2%.4f)"
      }
    }

  property("merc round-trip") =
    roundTrips(Crs.fromProj4("+proj=merc +a=6378137 +b=6356752.314245179 +lat_ts=15"), 1e-5)
  property("laea round-trip") =
    roundTrips(Crs.fromProj4("+proj=laea +lat_0=30 +lon_0=-20 +a=6371000"), 1e-5)
  property("stere round-trip") =
    roundTrips(Crs.fromProj4("+proj=stere +lat_0=52 +lat_ts=52 +lon_0=5 +a=6378144 +b=6356759"), 1e-4)
  property("lcc round-trip") =
    roundTrips(Crs.fromProj4("+proj=lcc +lat_0=40 +lat_1=33 +lat_2=45 +lon_0=-96 +a=6378137 +b=6356752.314245179"), 1e-4)
  property("aeqd round-trip") =
    roundTrips(Crs.fromProj4("+proj=aeqd +lat_0=10 +lon_0=60 +a=6371000"), 1e-5)
  property("hotine omerc (ellipsoidal) round-trip") =
    roundTrips(Crs.fromProj4("+proj=omerc +lonc=-11.39 +lat_0=-0.28 +alpha=9.19 +ellps=WGS84"), 1e-4)
  property("tmerc/UTM round-trip (ellipsoid, false easting)") =
    roundTrips(Crs.fromProj4("+proj=utm +zone=33 +a=6378137 +rf=298.257223563"), 1e-7)
  property("aea round-trip (ellipsoid, 2 parallels)") =
    roundTrips(Crs.fromProj4("+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +a=6378137 +rf=298.257223563"), 1e-6)
  property("sinu round-trip (ellipsoid)") =
    roundTrips(Crs.fromProj4("+proj=sinu +lon_0=10 +a=6378137 +rf=298.257223563"), 1e-6)
  property("ortho round-trip (near side)") =
    roundTrips(Crs.fromProj4("+proj=ortho +lat_0=45 +lon_0=10 +a=6371000"), 1e-6)
  property("nsper round-trip (visible disk)") =
    roundTrips(Crs.fromProj4("+proj=nsper +lat_0=0 +lon_0=-60 +h=35785831 +a=6371000"), 1e-6)
  property("cea round-trip (ellipsoid, lat_ts)") =
    roundTrips(Crs.fromProj4("+proj=cea +lat_ts=30 +lon_0=15 +a=6378137 +rf=298.257223563"), 1e-6)
  property("rotated pole round-trip") =
    roundTrips(Crs.fromProj4("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +o_lon_p=7 +lon_0=18 +a=6371000"), 1e-7)

  property("wrapLon lands in [-180, 180) and is idempotent") =
    Prop.forAll(Gen.choose(-2000.0, 2000.0)) { lon =>
      val w = Projection.wrapLonDeg(lon)
      w >= -180.0 && w < 180.0 && Projection.wrapLonDeg(w) == w
    }

  property("cell ids are within the grid and invert to the right pixel") = {
    val area = AreaDef("p", Crs.fromProj4("+proj=longlat"), 360, 180, -180, -90, 180, 90)
    Prop.forAll(lonGen, latGen) { (lon, lat) =>
      val cell = area.cellOf(lon, lat)
      val r = cell / 360; val c = cell % 360
      cell >= 0 && cell < area.size &&
        math.abs(area.projX(c.toInt) - lon) <= area.pixelSizeX &&
        math.abs(area.projY(r.toInt) - lat) <= area.pixelSizeY
    }
  }

  property("spherical square area grows monotonically with size") =
    Prop.forAll(Gen.choose(1.0, 30.0), Gen.choose(1.0, 25.0)) { (size, size2) =>
      def sq(s: Double) = Spherical.SphPolygon.fromDegrees(
        Seq((0.0, 0.0), (0.0, s), (s, s), (s, 0.0))).area
      (size >= size2) == (sq(size) >= sq(size2))
    }
}
