package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** AreaDef metadata algebra — mirrors `geometry.py:1593-1614` pixel
  * arithmetic, slicing (`:2664`), aggregate (`:1708`), enclose (`:3106`),
  * stacking (`:2879`). Fixture: the ease_sh area from
  * `test/test_files/areas.yaml` (FIXTURES.md §1). */
class AreaSpec extends AnyFunSuite {

  private val easeSh = AreaDef("ease_sh",
    Crs.fromProj4("+proj=laea +lat_0=-90 +lon_0=0 +a=6371228"),
    425, 425, -5326849.0625, -5326849.0625, 5326849.0625, 5326849.0625)

  test("pixel sizes (geometry.py:1593-1595)") {
    assert(math.abs(easeSh.pixelSizeX - 25067.525) < 1e-3)
    assert(math.abs(easeSh.pixelSizeY - 25067.525) < 1e-3)
  }

  test("projX/projY pixel centres and cell round-trip") {
    val x = easeSh.projX(0)
    assert(math.abs(x - (-5326849.0625 + 25067.525 / 2)) < 1e-2)
    // cell arithmetic inverts the centre coordinates
    var r = 0
    while (r < 425) {
      val c = (r * 7) % 425
      assert(easeSh.cellOf(easeSh.projX(c), easeSh.projY(r)) == r.toLong * 425 + c)
      r += 37
    }
  }

  test("out-of-grid cell is -1 (bucket/__init__.py:192-203)") {
    assert(easeSh.cellOf(1e9, 0) == -1L)
    assert(easeSh.cellOf(0, -1e9) == -1L)
  }

  test("lonLatOf: centre pixel is near the pole") {
    val (_, lat) = easeSh.lonLatOf(212, 212)
    assert(lat < -89.5, s"centre pixel lat=$lat")
  }

  test("slice arithmetic (geometry.py:2664-2689)") {
    val s = easeSh.slice(100, 200, 50, 150)
    assert(s.width == 100 && s.height == 100)
    assert(math.abs(s.xLL - (easeSh.xLL + 50 * easeSh.pixelSizeX)) < 1e-6)
    assert(math.abs(s.yUR - (easeSh.yUR - 100 * easeSh.pixelSizeY)) < 1e-6)
    // slice pixel (0,0) == original pixel (100, 50)
    assert(math.abs(s.projX(0) - easeSh.projX(50)) < 1e-6)
    assert(math.abs(s.projY(0) - easeSh.projY(100)) < 1e-6)
  }

  test("aggregate shrinks shape, keeps extent (geometry.py:1708)") {
    val a = easeSh.aggregate(5, 5)
    assert(a.width == 85 && a.height == 85)
    assert(a.xLL == easeSh.xLL && a.yUR == easeSh.yUR)
    assert(math.abs(a.pixelSizeX - easeSh.pixelSizeX * 5) < 1e-6)
  }

  test("enclose covers all inputs (geometry.py:3106)") {
    val a = easeSh.slice(0, 100, 0, 100)
    val b = easeSh.slice(200, 425, 200, 425)
    val e = AreaDef.enclose(Seq(a, b))
    assert(e.xLL == a.xLL && e.yUR == a.yUR && e.xUR == b.xUR && e.yLL == b.yLL)
    assert(e.width == 425 && e.height == 425)
  }

  test("concatVertical stacks row-adjacent areas (geometry.py:2879)") {
    val top = easeSh.slice(0, 200, 0, 425)
    val bottom = easeSh.slice(200, 425, 0, 425)
    val full = AreaDef.concatVertical(top, bottom)
    assert(full.height == 425 && full.extent == easeSh.extent)
    assertThrows[IllegalArgumentException](AreaDef.concatVertical(bottom, top))
  }

  test("cropAround slices the source to the target footprint (slicer.py:38-248)") {
    val src = AreaDef("src", Crs.fromProj4("+proj=longlat"), 360, 180, -180, -90, 180, 90)
    val dst = AreaDef("dst", Crs.fromProj4("+proj=laea +lat_0=50 +lon_0=10 +a=6371000"),
      100, 100, -500000, -500000, 500000, 500000)
    val Some((cropped, r0, c0)) = src.cropAround(dst)
    // the laea window spans roughly lon 3..17, lat 45..55
    assert(cropped.width < 30 && cropped.height < 20, s"${cropped.width}x${cropped.height}")
    val (lonMin, latMin, lonMax, latMax) = (cropped.xLL, cropped.yLL, cropped.xUR, cropped.yUR)
    assert(lonMin < 3 && lonMax > 17 && latMin < 46 && latMax > 54,
      s"($lonMin,$latMin,$lonMax,$latMax)")
    assert(c0 == math.round((lonMin + 180) / 1.0))
    // disjoint target -> None
    val far = AreaDef("far", Crs.fromProj4("+proj=laea +lat_0=-60 +lon_0=-150 +a=6371000"),
      10, 10, -100000, -100000, 100000, 100000)
    val crop2 = src.cropAround(far)
    assert(crop2.isDefined) // longlat source covers the globe: still a slice
    assert(crop2.get._1.width <= 6)
  }

  test("lonLatBBox covers the southern cap") {
    val (lonMin, latMin, lonMax, latMax) = easeSh.lonLatBBox()
    assert(latMin < -89 || latMin == -90)
    assert(latMax > -40 && lonMin < -170 && lonMax > 170)
  }

  test("semanticHash stable and sensitive") {
    assert(easeSh.semanticHash == easeSh.copy().semanticHash)
    assert(easeSh.semanticHash != easeSh.aggregate(5, 5).semanticHash)
  }
}
