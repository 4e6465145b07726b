package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Area registry loading — YAML variants from
  * `test/test_files/areas.yaml` grammar (FIXTURES.md §1), legacy cfg
  * (`area_config.py:298-383`), create_area_def combos (`:426-549`). */
class AreaConfigSpec extends AnyFunSuite {

  private val yaml =
    """ease_sh:
      |  description: Antarctic EASE grid
      |  projection: {proj: laea, lat_0: -90, lon_0: 0, a: 6371228.0, units: m}
      |  shape: [425, 425]
      |  area_extent: [-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625]
      |shape_dict:
      |  projection: {proj: merc, a: 6371000}
      |  shape: {height: 30, width: 40}
      |  area_extent: [-100000, -100000, 100000, 100000]
      |resolution_area:
      |  projection: {proj: laea, lat_0: 50, lon_0: 10, a: 6371000}
      |  resolution: [1000, 2000]
      |  area_extent: [-400000, -400000, 400000, 400000]
      |ul_area:
      |  projection: {proj: merc, a: 6371000}
      |  shape: [100, 200]
      |  upper_left_extent: [-100000, 50000]
      |  resolution: 500
      |center_area:
      |  projection: {proj: merc, a: 6371000}
      |  shape: [100, 100]
      |  center: [0, 0]
      |  resolution: 1000
      |degree_extent:
      |  projection: {proj: longlat}
      |  shape: [180, 360]
      |  area_extent:
      |    lower_left_xy: [-180, -90]
      |    upper_right_xy: [180, 90]
      |""".stripMargin

  test("canonical ease_sh loads with correct pixel sizes") {
    val a = AreaConfig.loadFromString(yaml, "ease_sh").head
    assert(a.width == 425 && a.height == 425)
    assert(math.abs(a.pixelSizeX - 25067.525) < 1e-3)
    assert(a.crs.params("proj") == "laea")
  }

  test("shape as dict") {
    val a = AreaConfig.loadFromString(yaml, "shape_dict").head
    assert(a.width == 40 && a.height == 30)
  }

  test("resolution-only derives shape") {
    val a = AreaConfig.loadFromString(yaml, "resolution_area").head
    assert(a.width == 800 && a.height == 400)
  }

  test("upper_left_extent + resolution") {
    val a = AreaConfig.loadFromString(yaml, "ul_area").head
    assert(a.xLL == -100000 && a.yUR == 50000)
    assert(a.xUR == -100000 + 200 * 500 && a.yLL == 50000 - 100 * 500)
  }

  test("center + resolution") {
    val a = AreaConfig.loadFromString(yaml, "center_area").head
    assert(a.xLL == -50000 && a.xUR == 50000 && a.yLL == -50000 && a.yUR == 50000)
  }

  test("area_extent as lower_left_xy/upper_right_xy dict") {
    val a = AreaConfig.loadFromString(yaml, "degree_extent").head
    assert(a.extent == ((-180.0, -90.0, 180.0, 90.0)))
    assert(a.crs.isLonLat)
  }

  test("load all areas; missing region raises") {
    assert(AreaConfig.loadFromString(yaml).size == 6)
    assertThrows[IllegalArgumentException](AreaConfig.loadFromString(yaml, "nope"))
  }

  test("incomplete spec (DynamicArea) raises with freeze hint") {
    val bad = "dyn:\n  projection: {proj: merc, a: 6371000}\n  shape: [10, 10]\n"
    val e = intercept[IllegalArgumentException](AreaConfig.loadFromString(bad, "dyn"))
    assert(e.getMessage.contains("freeze"))
  }

  test("legacy .cfg format (area_config.py:298-383)") {
    val cfg =
      """REGION: ease_sh {
        |    NAME: Antarctic EASE grid
        |    PCS_ID: ease_sh
        |    PCS_DEF: proj=laea,lat_0=-90,lon_0=0,a=6371228.0
        |    XSIZE: 425
        |    YSIZE: 425
        |    AREA_EXTENT: (-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625)
        |};
        |""".stripMargin
    val a = AreaConfig.parseLegacy(cfg).head
    assert(a.id == "ease_sh" && a.width == 425 && math.abs(a.pixelSizeX - 25067.525) < 1e-3)
  }

  test("toYaml round-trips through the parser (geometry.py:2045)") {
    val a = AreaConfig.loadFromString(yaml, "ease_sh").head
    val b = AreaConfig.loadFromString(AreaConfig.toYaml(a), "ease_sh").head
    assert(b.width == a.width && b.extent == a.extent && b.crs.params("proj") == "laea")
  }
}
