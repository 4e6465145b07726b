package graft.core

import org.scalatest.funsuite.AnyFunSuite
import Spherical._

/** Spherical polygon ops (U1/U2, A13, F4) — anchor values with known
  * closed-form answers plus the reference's own doc example
  * (`spherical.py:599-607`). */
class SphericalSpec extends AnyFunSuite {

  // vertices CLOCKWISE around the inside (spherical.py:526)
  private def square(lon0: Double, lat0: Double, size: Double): SphPolygon =
    SphPolygon.fromDegrees(Seq(
      (lon0, lat0), (lon0, lat0 + size), (lon0 + size, lat0 + size), (lon0 + size, lat0)))

  test("area doc example: 1-degree equatorial square on r=6371 km earth") {
    // `spherical.py:599-607`: area = 12363.997753690213 km^2
    val pol = square(0, 0, 1)
    assert(math.abs(pol.area * 6371.0 * 6371.0 - 12363.997753690213) < 1e-6)
  }

  test("area: octant of the sphere is pi/2 steradians") {
    val octant = SphPolygon.fromDegrees(Seq((0, 0), (0, 90), (90, 0)))
    assert(math.abs(octant.area - math.Pi / 2) < 1e-9)
  }

  test("hdistance and arc intersection basics") {
    val a = SPoint(0, 0); val b = SPoint(math.toRadians(90), 0)
    assert(math.abs(a.hdistance(b) - math.Pi / 2) < 1e-12)
    // meridian arc crosses equator arc at (45, 0)
    val eq = Arc(SPoint(0, 0), SPoint(math.toRadians(90), 0))
    val mer = Arc(SPoint(math.toRadians(45), math.toRadians(-10)),
      SPoint(math.toRadians(45), math.toRadians(10)))
    val i = eq.intersection(mer)
    assert(i.isDefined)
    assert(math.abs(math.toDegrees(i.get.lon) - 45) < 1e-6 && math.abs(i.get.lat) < 1e-9)
  }

  test("disjoint arcs do not intersect") {
    val a1 = Arc(SPoint(0, 0), SPoint(math.toRadians(10), 0))
    val a2 = Arc(SPoint(math.toRadians(20), math.toRadians(5)), SPoint(math.toRadians(30), math.toRadians(5)))
    assert(a1.intersection(a2).isEmpty)
  }

  test("intersection of overlapping squares has the overlap area") {
    val p1 = square(0, 0, 10)
    val p2 = square(5, 0, 10)
    val inter = p1.intersection(p2)
    assert(inter.isDefined)
    val expected = square(5, 0, 10).area / 2 // 5x10 degree box ~ half of 10x10
    assert(math.abs(inter.get.area - square(5, 0, 5).area * 2) / inter.get.area < 0.02,
      s"area ${inter.get.area}")
    // overlap rate is ~half
    val rate = p1.overlapRate(p2)
    assert(rate > 0.45 && rate < 0.55, s"rate $rate")
  }

  test("containment: small square inside big square") {
    val big = square(0, 0, 20)
    val small = square(5, 5, 2)
    assert(small.isInside(big))
    assert(!big.isInside(small))
    // intersection of nested polygons is the small one
    val inter = big.intersection(small)
    assert(inter.isDefined && math.abs(inter.get.area - small.area) < 1e-9)
    // union is the big one
    val uni = big.union(small)
    assert(uni.isDefined && math.abs(uni.get.area - big.area) < 1e-9)
  }

  test("disjoint polygons: no intersection; union returns None") {
    val p1 = square(0, 0, 5)
    val p2 = square(60, 20, 5)
    assert(p1.intersection(p2).isEmpty)
    assert(p1.union(p2).isEmpty)
    assert(!p1.overlaps(p2) && p1.overlapRate(p2) == 0.0)
  }

  test("nonOverlapUnions groups by connectivity (spherical_utils.py:28-131)") {
    val polys = Seq(
      square(0, 0, 10), square(5, 0, 10), // overlap each other
      square(60, 20, 5), // alone
      square(100, -30, 8), square(104, -30, 8)) // overlap each other
    val groups = nonOverlapUnions(polys)
    assert(groups.map(_.toSet).toSet == Set(Set(0, 1), Set(2), Set(3, 4)))
  }
}
