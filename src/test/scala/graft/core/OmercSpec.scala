package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Oblique Mercator + CF/geotransform constructors + boundary polygon. */
class OmercSpec extends AnyFunSuite {

  test("omerc round-trips around its centre line") {
    val c = Crs.fromProj4("+proj=omerc +lonc=10 +lat_0=50 +alpha=30 +a=6370997")
    for (dlon <- -20 to 20 by 4; dlat <- -20 to 20 by 4) {
      val lon = 10.0 + dlon; val lat = 50.0 + dlat
      val (x, y) = c.forward(lon, lat)
      assert(!x.isNaN, s"NaN at $lon,$lat")
      val (lon2, lat2) = c.inverse(x, y)
      assert(math.abs(Projection.wrapLonDeg(lon2 - lon)) < 1e-6 && math.abs(lat2 - lat) < 1e-6,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("omerc centre line runs along the x axis") {
    // points along the azimuth-30 great circle from the centre stay near y=0
    val c = Crs.fromProj4("+proj=omerc +lonc=0 +lat_0=0 +alpha=90 +a=6370997")
    // alpha=90: centre line is the equator; equator points map to y ~ 0
    val (x1, y1) = c.forward(20, 0)
    assert(math.abs(y1) < 1.0, s"y=$y1")
    assert(math.abs(x1) > 1e6)
  }

  test("CF grid_mapping inference: laea (utils/cf.py:413 semantics)") {
    val a = AreaConfig.fromCfGridMapping(
      "cf_laea",
      Map("latitude_of_projection_origin" -> -90.0,
        "longitude_of_projection_origin" -> 0.0,
        "earth_radius" -> 6371228.0),
      "lambert_azimuthal_equal_area",
      width = 425, height = 425,
      xFirst = -5314315.3, xLast = 5314315.3,
      yFirst = 5314315.3, yLast = -5314315.3)
    assert(a.crs.params("proj") == "laea")
    assert(math.abs(a.pixelSizeX - 25067.525) < 1.0)
    assert(math.abs(a.xLL - -5326849.0) < 100)
  }

  test("CF grid_mapping: geostationary and unsupported name") {
    val g = AreaConfig.fromCfGridMapping("cf_geos",
      Map("longitude_of_projection_origin" -> 0.0, "perspective_point_height" -> 35785831.0,
        "semi_major_axis" -> 6378169.0, "semi_minor_axis" -> 6356583.8),
      "geostationary", 100, 100, -5e6, 5e6, 5e6, -5e6)
    assert(g.crs.params("proj") == "geos")
    // transverse_mercator builds since r9; rotated pole builds since r10
    // (the ob_tran kernel) — a genuinely unknown name still throws
    val tm = AreaConfig.fromCfGridMapping("utm",
      Map("latitude_of_projection_origin" -> 0.0, "longitude_of_central_meridian" -> 15.0,
        "scale_factor_at_central_meridian" -> 0.9996, "false_easting" -> 500000.0),
      "transverse_mercator", 2, 2, 400000, 600000, 6300000, 6100000)
    assert(tm.crs.params("proj") == "tmerc" && tm.crs.params("x_0") == "500000.0")
    val rot = AreaConfig.fromCfGridMapping("rot",
      Map("grid_north_pole_latitude" -> 39.25, "grid_north_pole_longitude" -> -162.0),
      "rotated_latitude_longitude", 2, 2, -10, 10, 7.5, -7.5)
    assert(rot.crs.params("proj") == "ob_tran")
    assertThrows[IllegalArgumentException](
      AreaConfig.fromCfGridMapping("x", Map.empty, "not_a_real_mapping", 2, 2, 0, 1, 1, 0))
  }

  test("geotransform constructor (utils/rasterio.py:77 semantics)") {
    val a = AreaConfig.fromGeoTransform("tif", "+proj=merc +a=6371000",
      Seq(-100000.0, 1000.0, 0.0, 200000.0, 0.0, -2000.0), 50, 40)
    assert(a.xLL == -100000 && a.yUR == 200000)
    assert(a.pixelSizeX == 1000 && a.pixelSizeY == 2000)
    assert(a.xUR == -50000 && a.yLL == 120000)
  }

  test("boundary polygon + area overlap predicates (J11)") {
    val a1 = AreaDef("a1", Crs.fromProj4("+proj=longlat"), 10, 10, 0, 0, 20, 20)
    val a2 = AreaDef("a2", Crs.fromProj4("+proj=longlat"), 10, 10, 10, 0, 30, 20)
    val a3 = AreaDef("a3", Crs.fromProj4("+proj=longlat"), 10, 10, 100, 40, 120, 60)
    assert(a1.overlaps(a2))
    assert(!a1.overlaps(a3))
    val rate = a1.overlapRate(a2)
    assert(rate > 0.4 && rate < 0.6, s"rate $rate")
    assert(a1.boundaryPolygon(5).vertices.length == 20)
  }
}
