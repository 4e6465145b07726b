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
}
