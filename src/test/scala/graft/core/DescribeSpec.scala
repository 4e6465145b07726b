package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** `AreaDef.describe` / `describeHtml` (r13 — the reference repr
  * surface's lib-independent core): field-for-field against the
  * reference's own golden strings for the areas.yaml fixtures
  * (`test/test_area_config.py:44-75` `ease_sh`/`ease_nh`). The
  * non-projection lines are BYTE-identical to the reference goldens;
  * the projection dict is compared key-by-key because pyproj's CRS
  * expansion injects version artifacts (`'type': 'crs'`,
  * `'no_defs': 'None'`, sphere a → R) that are not area semantics. */
class DescribeSpec extends AnyFunSuite {

  private val yaml =
    """ease_sh:
      |  description: Antarctic EASE grid
      |  projection: {proj: laea, lat_0: -90, lon_0: 0, a: 6371228.0, units: m}
      |  shape: [425, 425]
      |  area_extent: [-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625]
      |""".stripMargin

  private lazy val easeSh = AreaConfig.loadFromString(yaml, "ease_sh").head

  test("describe: non-projection lines byte-match the reference golden") {
    val lines = easeSh.describe(description = "Antarctic EASE grid").split("\n")
    // reference golden (test_area_config.py:57-63), pyproj artifacts aside
    assert(lines(0) == "Area ID: ease_sh")
    assert(lines(1) == "Description: Antarctic EASE grid")
    assert(lines(2).startsWith("Projection: {"))
    assert(lines(3) == "Number of columns: 425")
    assert(lines(4) == "Number of rows: 425")
    assert(lines(5) ==
      "Area extent: (-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625)")
  }

  test("describe: projection dict prints sorted canonical params matching the golden's values") {
    val proj = easeSh.describe().split("\n")(2).stripPrefix("Projection: ")
    // golden: {'R': '6371228', 'lat_0': '-90', 'lon_0': '0', ..., 'proj':
    // 'laea', ..., 'units': 'm', ...} — same values on the shared keys,
    // with the sphere radius under its source key 'a' instead of pyproj's
    // rewritten 'R'
    assert(proj == "{'a': '6371228', 'lat_0': '-90', 'lon_0': '0', 'proj': 'laea', 'units': 'm'}")
  }

  test("describe: Projection ID line appears exactly when requested (legacy cfg form)") {
    val withId = easeSh.describe(description = "Antarctic EASE grid", projId = "ease_sh")
    assert(withId.split("\n")(2) == "Projection ID: ease_sh")
    assert(!easeSh.describe().contains("Projection ID:"))
  }

  test("describeHtml: attrs section carries name/projection/shape/resolution/extent") {
    val html = easeSh.describeHtml(description = "Antarctic EASE grid")
    assert(html.startsWith("<dl>") && html.endsWith("</dl>"))
    assert(html.contains("<dt>Area name</dt><dd>ease_sh</dd>"))
    assert(html.contains("<dt>Description</dt><dd>Antarctic EASE grid</dd>"))
    assert(html.contains("<dt>Width/Height</dt><dd>425/425 Pixel</dd>"))
    // 10653698.125 / 425 = 25067.5250 -> 1-dp 25067.5, in projection units
    assert(html.contains("<dt>Resolution x/y</dt><dd>25067.5/25067.5 m</dd>"))
    assert(html.contains(
      "<dt>Extent (ll_x, ll_y, ur_x, ur_y)</dt>" +
        "<dd>(-5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625)</dd>"))
  }

  test("canonNum: integral floats print bare, non-numerics verbatim") {
    assert(AreaDef.canonNum("6371228.0") == "6371228")
    assert(AreaDef.canonNum("-90") == "-90")
    assert(AreaDef.canonNum("0.9996") == "0.9996")
    assert(AreaDef.canonNum("m") == "m")
  }

  test("pyFloat mirrors Python repr at both thresholds (r14 advice): plain only in [1e-4, 1e16)") {
    // inside the plain-decimal window — unchanged behavior
    assert(AreaDef.pyFloat(20037508.34) == "20037508.34")
    assert(AreaDef.pyFloat(0.0001) == "0.0001")  // repr(1e-4) = '0.0001'
    assert(AreaDef.pyFloat(0.0) == "0.0")
    assert(AreaDef.pyFloat(-5326849.0625) == "-5326849.0625")
    // below 1e-4: Python switches to exponent notation, two-digit pad
    assert(AreaDef.pyFloat(1e-10) == "1e-10")    // repr(1e-10)
    assert(AreaDef.pyFloat(1e-5) == "1e-05")     // repr(1e-5) pads: '1e-05'
    assert(AreaDef.pyFloat(9.999e-5) == "9.999e-05")
    assert(AreaDef.pyFloat(-2.5e-7) == "-2.5e-07")
    // at/above 1e16: positive exponent carries '+'
    assert(AreaDef.pyFloat(2e16) == "2e+16")     // repr(2e16)
    assert(AreaDef.pyFloat(1e16) == "1e+16")
    assert(AreaDef.pyFloat(1.5e23) == "1.5e+23")
    // the scientific-INPUT normalization path agrees end-to-end
    assert(AreaDef.canonNum("1e-10") == "1e-10")
    assert(AreaDef.canonNum("2E16") == "2e+16")
    assert(AreaDef.canonNum("1.25e-3") == "0.00125")
  }
}
