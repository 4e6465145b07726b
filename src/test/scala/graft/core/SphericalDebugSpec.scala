package graft.core

import org.scalatest.funsuite.AnyFunSuite
import Spherical._

class SphericalDebugSpec extends AnyFunSuite {
  test("debug: two-square intersection traversal") {
    def square(lon0: Double, lat0: Double, size: Double): SphPolygon =
      SphPolygon.fromDegrees(Seq(
        (lon0, lat0), (lon0, lat0 + size), (lon0 + size, lat0 + size), (lon0 + size, lat0)))
    val p1 = square(0, 0, 10)
    val p2 = square(5, 0, 10)
    val inter = p1.intersection(p2)
    assert(inter.isDefined)
    // exact boundary: (7.5, 10.03) top-arc crossing, the two inner corners,
    // and the shared equator span
    assert(inter.get.vertices.length == 5)
    val lons = inter.get.vertices.map(v => math.toDegrees(v.lon)).sorted
    assert(math.abs(lons.head - 5.0) < 1e-6 && math.abs(lons.last - 10.0) < 1e-6)
  }
}
