package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** WKT2 export/import (S10's feasible half): every engine projection
  * round-trips through toWkt/fromWkt to a CRS that projects IDENTICALLY
  * (forward() equality on test points beats comparing parameter maps —
  * it proves the semantics survived, not just the strings). */
class WktSpec extends AnyFunSuite {

  private val testPoints = Seq((12.3, 55.7), (-45.0, -30.5), (101.0, 8.25))

  /** bit-equality that treats NaN == NaN (off-disk geos points are NaN on
    * BOTH sides — that is agreement, not drift). */
  private def same(a: (Double, Double), b: (Double, Double)): Boolean =
    java.lang.Double.compare(a._1, b._1) == 0 && java.lang.Double.compare(a._2, b._2) == 0

  private val crss = Seq(
    "+proj=longlat",
    "+proj=longlat +a=6378137 +rf=298.257223563",
    "+proj=eqc +lat_ts=30 +lon_0=15 +R=6371000",
    "+proj=merc +lat_ts=20 +lon_0=-40 +a=6378137 +b=6356752.314245",
    "+proj=laea +lat_0=-90 +lon_0=0 +a=6371228",
    "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +a=6378273 +b=6356889.44891",
    "+proj=aeqd +lat_0=50 +lon_0=8 +a=6370997",
    "+proj=geos +lon_0=-75 +h=35786023 +sweep=x +a=6378137 +b=6356752.31414",
    "+proj=geos +lon_0=140 +h=35785831 +a=6378169 +b=6356583.8",
    "+proj=lcc +lat_0=40 +lon_0=-96 +lat_1=33 +lat_2=45 +a=6378137 +rf=298.257223563",
    "+proj=omerc +lat_0=12 +lonc=100 +alpha=40 +a=6371228",
    "+proj=tmerc +lat_0=0 +lon_0=9 +k_0=0.9996 +x_0=500000 +y_0=0 +a=6378137 +rf=298.257223563",
    "+proj=utm +zone=33 +south +a=6378137 +rf=298.257223563",
    "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +x_0=100000 +a=6378137 +rf=298.257223563",
    "+proj=sinu +lon_0=0 +a=6371007.181",
    "+proj=ortho +lat_0=40 +lon_0=-100 +a=6371000",
    "+proj=nsper +lat_0=30 +lon_0=10 +h=35785831 +a=6371000",
    "+proj=merc +k_0=0.9996 +lon_0=110 +a=6378137 +rf=298.257223563",
    "+proj=stere +lat_0=90 +k_0=0.994 +lon_0=0 +x_0=2000000 +y_0=2000000 +a=6378137 +rf=298.257223563",
    "+proj=cea +lat_ts=30 +lon_0=10 +a=6378137 +rf=298.257223563",
    "+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +o_lon_p=5 +lon_0=18 +a=6371000")

  test("every projection round-trips WKT with identical forward projection") {
    for (p4 <- crss) {
      val crs = Crs.fromProj4(p4)
      val wkt = Wkt.toWkt(crs, name = "rt")
      val back = Wkt.fromWkt(wkt)
      for ((lon, lat) <- testPoints) {
        val a = crs.forward(lon, lat)
        val b = back.forward(lon, lat)
        assert(same(a, b), s"forward($lon,$lat) drifted through WKT for $p4: $a vs $b\n$wkt")
      }
      // and inverses agree where the point is on the globe/disk
      val (x, y) = crs.forward(testPoints.head._1, testPoints.head._2)
      if (!x.isNaN && !y.isNaN)
        assert(same(crs.inverse(x, y), back.inverse(x, y)), s"inverse drifted for $p4")
    }
  }

  test("WKT structure: node types, method names, ellipsoid encoding") {
    val stere = Wkt.toWkt(Crs.fromProj4(
      "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +a=6378273 +b=6356889.44891"))
    assert(stere.startsWith("PROJCRS["))
    assert(stere.contains("""METHOD["Polar Stereographic (variant B)"]"""))
    assert(stere.contains("""PARAMETER["Latitude of standard parallel",70"""))
    assert(stere.contains("""PARAMETER["Longitude of origin",-45"""))
    assert(stere.contains("ELLIPSOID[\"unknown\",6378273,"))
    val ll = Wkt.toWkt(Crs.fromProj4("+proj=longlat"))
    assert(ll.startsWith("GEOGCRS[") && ll.contains("AXIS[\"geodetic latitude (Lat)\",north"))
    // sphere encodes inverse flattening 0
    val sph = Wkt.toWkt(Crs.fromProj4("+proj=laea +lat_0=-90 +lon_0=0 +a=6371228"))
    assert(sph.contains("ELLIPSOID[\"unknown\",6371228,0,"))
    // geos sweep axis is part of the method name, both ways
    val geosY = Wkt.toWkt(Crs.fromProj4("+proj=geos +lon_0=140 +h=35785831 +a=6378169 +b=6356583.8"))
    assert(geosY.contains("Sweep Y"))
    assert(Wkt.fromWkt(geosY).params.get("sweep") === None)
  }

  test("Mercator variant A reads its scale factor (merc k_0, r9)") {
    val wkt = """PROJCRS["x",BASEGEOGCRS["u",DATUM["u",ELLIPSOID["u",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["u",METHOD["Mercator (variant A)"],PARAMETER["Latitude of natural origin",0],PARAMETER["Scale factor at natural origin",0.9996]],CS[Cartesian,2]]"""
    val crs = Wkt.fromWkt(wkt)
    assert(crs.params("proj") === "merc" && crs.params("k_0").toDouble === 0.9996)
    // k_0 actually scales the projection (equator scale = k_0 exactly)
    val (x1, _) = crs.forward(1.0, 0.0)
    val (x2, _) = Wkt.fromWkt(wkt.replace("0.9996", "1.0")).forward(1.0, 0.0)
    assert(math.abs(x1 / x2 - 0.9996) < 1e-12)
  }

  test("Polar Stereographic variant A: central meridian is not dropped") {
    // EPSG 9810 names the central meridian "Longitude of natural origin";
    // without the read alias this parsed to lon_0=0 and rotated the grid
    val wkt = """PROJCRS["x",BASEGEOGCRS["u",DATUM["u",ELLIPSOID["u",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["u",METHOD["Polar Stereographic (variant A)"],PARAMETER["Latitude of natural origin",90],PARAMETER["Longitude of natural origin",-45],PARAMETER["Scale factor at natural origin",0.994]],CS[Cartesian,2]]"""
    val crs = Wkt.fromWkt(wkt)
    assert(crs.params("lon_0").toDouble === -45.0)
    assert(crs.params("k_0").toDouble === 0.994)
    // a point ON the central meridian lands on the -y axis (x = 0)
    val (x, y) = crs.forward(-45.0, 80.0)
    assert(math.abs(x) < 1e-6 && y < 0)
  }

  test("unmapped nonzero parameters throw; zero-valued defaults pass") {
    // UPS-style false easting on a method whose mapping lacked x_0 would
    // silently shift coordinates by 2000 km — must fail loudly instead
    val bad = """PROJCRS["x",BASEGEOGCRS["u",DATUM["u",ELLIPSOID["u",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["u",METHOD["Lambert Azimuthal Equal Area"],PARAMETER["Latitude of natural origin",52],PARAMETER["Longitude of natural origin",10],PARAMETER["Not a real parameter",4321000]],CS[Cartesian,2]]"""
    val e = intercept[IllegalArgumentException](Wkt.fromWkt(bad))
    assert(e.getMessage.contains("Not a real parameter"))
    val ok = Wkt.fromWkt(bad.replace("4321000", "0"))
    assert(ok.params("proj") === "laea")
    // false easting/northing now have slots and round-trip (EPSG:3035 shape)
    val etrs = Wkt.fromWkt(bad.replace("""PARAMETER["Not a real parameter",4321000]""",
      """PARAMETER["False easting",4321000],PARAMETER["False northing",3210000]"""))
    val (x, y) = etrs.forward(10.0, 52.0)
    assert(math.abs(x - 4321000) < 1e-6 && math.abs(y - 3210000) < 1e-6)
  }

  test("lenient read: pyproj/GDAL-shaped WKT with mapped methods loads") {
    // hand-shaped external WKT (extra nodes, IDs, different formatting)
    val external =
      """PROJCRS["NSIDC Sea Ice Polar Stereographic North",
        |  BASEGEOGCRS["Unspecified datum",
        |    DATUM["Not specified",
        |      ELLIPSOID["Hughes 1980",6378273,298.279411123064,LENGTHUNIT["metre",1]]],
        |    PRIMEM["Greenwich",0]],
        |  CONVERSION["US NSIDC Sea Ice polar stereographic north",
        |    METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]],
        |    PARAMETER["Latitude of standard parallel",70,ANGLEUNIT["degree",0.0174532925199433]],
        |    PARAMETER["Longitude of origin",-45,ANGLEUNIT["degree",0.0174532925199433]]],
        |  CS[Cartesian,2]]""".stripMargin
    val crs = Wkt.fromWkt(external)
    assert(crs.params("proj") === "stere")
    assert(crs.params("lat_ts").toDouble === 70.0)
    assert(crs.params("lon_0").toDouble === -45.0)
    assert(math.abs(crs.params("a").toDouble - 6378273.0) < 1e-6)
    // projects sanely (north polar grid: Copenhagen lands north-east of pole origin)
    val (x, y) = crs.forward(12.3, 55.7)
    assert(!x.isNaN && !y.isNaN && math.hypot(x, y) > 1e6)
  }
}
