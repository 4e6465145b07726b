package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM check: on any quadrilateral, the solved (t, s) must reproduce
  * the target point through the bilinear map B(s,t) — and hence interpolate
  * affine fields exactly. */
class BilinearDebugSpec extends AnyFunSuite {

  private def bmap(p1: (Double, Double), p2: (Double, Double), p3: (Double, Double),
      p4: (Double, Double), s: Double, t: Double): (Double, Double) = {
    val x = p1._1 * (1 - s) * (1 - t) + p2._1 * s * (1 - t) + p3._1 * (1 - s) * t + p4._1 * s * t
    val y = p1._2 * (1 - s) * (1 - t) + p2._2 * s * (1 - t) + p3._2 * (1 - s) * t + p4._2 * s * t
    (x, y)
  }

  test("solved (t,s) inverts the bilinear map on sheared lattice quads") {
    def pt(i: Int, j: Int): (Double, Double) =
      (i * 0.9 - 3 + 0.13 * j, j * 0.9 - 3 + 0.07 * i)
    var worst = 0.0
    for (i <- 1 until 25; j <- 1 until 25) {
      // a parallelogram cell: UL=(i,j+1) UR=(i+1,j+1) LL=(i,j) LR=(i+1,j)
      val p1 = pt(i, j + 1); val p2 = pt(i + 1, j + 1); val p3 = pt(i, j); val p4 = pt(i + 1, j)
      val target = bmap(p1, p2, p3, p4, 0.3, 0.6)
      val (t, s) = BilinearResample.fracDistances(
        p1._1, p1._2, p2._1, p2._2, p3._1, p3._2, p4._1, p4._2, target._1, target._2)
      assert(!t.isNaN, s"($i,$j) NaN")
      val back = bmap(p1, p2, p3, p4, s, t)
      val err = math.hypot(back._1 - target._1, back._2 - target._2)
      if (err > 1e-9) info(s"($i,$j): t=$t s=$s err=$err")
      worst = math.max(worst, err)
    }
    assert(worst < 1e-9, s"worst inversion error $worst")
  }
}
