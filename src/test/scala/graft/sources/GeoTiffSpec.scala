package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S7 end-to-end over real GeoTIFF bytes: user-defined projection keys,
  * an EPSG geographic grid, a baked-EPSG projected grid with a shifted
  * tiepoint. Fixtures are written byte-level by tools/make_tiff_fixture.py
  * from the public TIFF/GeoTIFF specs, independently of the reader. */
class GeoTiffSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/geotiff/$name")
    assert(url != null, s"missing fixture /geotiff/$name (run tools/make_tiff_fixture.py)")
    url.getPath
  }

  test("user-defined polar stereographic: CT code + param + ellipsoid keys") {
    val a = GeoTiff.areaFromGeoTiff(fixture("psn.tif"), "psn")
    assert((a.width, a.height) === (76, 112))
    assert(a.crs.params("proj") === "stere")
    assert(a.crs.params("lat_ts").toDouble === 70.0)
    assert(a.crs.params("lon_0").toDouble === -45.0)
    assert(a.crs.params("a").toDouble === 6378273.0)
    assert(a.crs.params("b").toDouble === 6356889.44891)
    // extent from the geotransform: origin UL (-3850000, 5850000), 100km px
    assert(a.xLL === -3850000.0 && a.yUR === 5850000.0)
    assert(a.xUR === -3850000.0 + 76 * 100000.0)
    assert(a.yLL === 5850000.0 - 112 * 100000.0)
    // the CRS actually projects (north pole near origin on a polar grid)
    val (x, y) = a.crs.forward(-45.0, 89.999)
    assert(math.hypot(x, y) < 1000.0)
  }

  test("EPSG:4326 geographic grid in degrees") {
    val a = GeoTiff.areaFromGeoTiff(fixture("ll.tif"), "ll")
    assert((a.width, a.height) === (37, 19))
    assert(a.crs.isLonLat)
    assert(a.xLL === -185.0 && a.xUR === 185.0)
    assert(a.yUR === 95.0 && a.yLL === -95.0)
  }

  test("baked EPSG:3413 + non-zero tiepoint raster index shifts the origin back") {
    val info = GeoTiff.readInfo(fixture("epsg3413.tif"))
    assert(info.geoTransform === Seq(-3850000.0, 25000.0, 0.0, 5850000.0, 0.0, -25000.0))
    val a = GeoTiff.areaFromGeoTiff(fixture("epsg3413.tif"))
    assert(a.crs.params("proj") === "stere")
    assert(a.crs.params("lat_ts").toDouble === 70.0)
    assert(a.crs.params("lon_0").toDouble === -45.0)
    assert(a.xLL === -3850000.0 && a.yUR === 5850000.0)
    // EPSG:3413 and the user-defined psn grid share lat_ts/lon_0 but not
    // the ellipsoid (WGS84 vs Hughes) — forward projections must differ
    val b = GeoTiff.areaFromGeoTiff(fixture("psn.tif"))
    val pa = a.crs.forward(12.0, 75.0); val pb = b.crs.forward(12.0, 75.0)
    assert(pa !== pb)
    assert(math.abs(pa._1 - pb._1) < 2000, "same grid family, sub-km ellipsoid shift")
  }

  test("EPSG:32633 (WGS84 / UTM 33N) loads via the formulaic UTM family") {
    val a = GeoTiff.areaFromGeoTiff(fixture("utm33.tif"), "utm33")
    assert((a.width, a.height) === (120, 100))
    assert(a.crs.params("proj") === "tmerc") // +proj=utm rewrites to tmerc
    assert(a.crs.params("lon_0").toDouble === 15.0)
    assert(a.crs.params("k_0").toDouble === 0.9996)
    assert(a.crs.params("x_0").toDouble === 500000.0)
    assert(a.xLL === 400000.0 && a.yUR === 6200000.0)
    // central meridian maps to easting exactly 500000
    val (x, _) = a.crs.forward(15.0, 56.0)
    assert(math.abs(x - 500000.0) < 1e-6)
    // grid centre is inside the area and inside zone 33 (12E..18E)
    val (lonC, latC) = a.crs.inverse((a.xLL + a.xUR) / 2, (a.yLL + a.yUR) / 2)
    assert(lonC > 12.0 && lonC < 18.0 && latC > 54.0 && latC < 58.0)
  }

  test("user-defined tmerc keys (CT=1 + scale + false easting) equal EPSG:32633") {
    val user = GeoTiff.areaFromGeoTiff(fixture("utm_user.tif"), "utm_user")
    val epsg = GeoTiff.areaFromGeoTiff(fixture("utm33.tif"), "utm33")
    assert(user.crs.params("proj") === "tmerc")
    for ((lon, lat) <- Seq((15.0, 56.0), (12.3, 55.7), (17.9, 54.1))) {
      val pu = user.crs.forward(lon, lat); val pe = epsg.crs.forward(lon, lat)
      assert(math.abs(pu._1 - pe._1) < 1e-9 && math.abs(pu._2 - pe._2) < 1e-9,
        s"user vs EPSG drifted at ($lon,$lat): $pu vs $pe")
    }
  }

  test("user-defined sinusoidal on the MODIS sphere (CT=24): a real tile georeferences") {
    val a = GeoTiff.areaFromGeoTiff(fixture("sinu_modis.tif"), "h18v04")
    assert((a.width, a.height) === (1200, 1200))
    assert(a.crs.params("proj") === "sinu")
    assert(a.crs.params("a").toDouble === 6371007.181)
    // tile (h18, v04) spans 0..10 deg lon at its top (50N) edge region
    val (lon0, lat0) = a.crs.inverse(a.xLL + 0.5 * a.pixelSizeX, a.yUR - 0.5 * a.pixelSizeY)
    assert(math.abs(lat0 - 50.0) < 0.01, s"top-row lat $lat0")
    assert(math.abs(lon0 - 0.0) < 0.02, s"left-col lon $lon0")
  }

  test("EASE-Grid 2.0 (r10): baked EPSG:6933 == user-defined CT_CylindricalEqualArea (28)") {
    val epsg = GeoTiff.areaFromGeoTiff(fixture("ease2.tif"), "ease2")
    val user = GeoTiff.areaFromGeoTiff(fixture("cea_user.tif"), "cea_user")
    assert((epsg.width, epsg.height) === (484, 202))
    assert(epsg.crs.params("proj") === "cea" && user.crs.params("proj") === "cea")
    assert(epsg.crs.params("lat_ts").toDouble === 30.0)
    for ((lon, lat) <- Seq((0.0, 0.0), (100.0, 45.0), (-60.0, -30.0))) {
      val pe = epsg.crs.forward(lon, lat); val pu = user.crs.forward(lon, lat)
      assert(math.abs(pe._1 - pu._1) < 1e-9 && math.abs(pe._2 - pu._2) < 1e-9,
        s"EPSG vs user-defined drifted at ($lon,$lat)")
    }
    // the EASE-2 global grid's x extent spans the full longitude range:
    // the dateline maps to a*k0*pi ~ 17367530.45 m in magnitude (the
    // published EASE-2 global extent; +180 wraps to -180 by contract)
    val (xE, _) = epsg.crs.forward(180.0, 0.0)
    assert(math.abs(math.abs(xE) - 17367530.44) < 1.0, s"dateline edge $xE")
  }
}
