package graft.core

/** Geostationary disk geometry — the Spark-native home of
  * `pyresample/geometry.py:2793-2877` (get_geostationary_angle_extent /
  * get_*_bounding_box_*). All of this is driver-side metadata math: it
  * produces polygons that become pushed-down predicates and index slices,
  * never a data-plane operation.
  */
object GeosGeometry {

  def isGeostationary(crs: Crs): Boolean = crs.params.get("proj").contains("geos")

  private def heightOf(crs: Crs): Double =
    crs.params.get("h").map(_.toDouble).getOrElse(35785831.0)

  /** Max earth-vs-space viewing angles in x and y (radians) —
    * `get_geostationary_angle_extent` (`geometry.py:2793-2808`). */
  def angleExtent(crs: Crs): (Double, Double) = {
    val ell = crs.proj.ell
    val req = ell.a / 1000.0
    val rp = ell.b / 1000.0
    val h = heightOf(crs) / 1000.0 + req
    val aeq = 1 - req * req / (h * h)
    val ap = 1 - rp * rp / (h * h)
    (math.acos(math.sqrt(aeq)), math.acos(math.sqrt(ap)))
  }

  /** Full-disk boundary in geos projection coordinates, slightly shrunk to
    * stay strictly on-earth — `get_full_geostationary_bounding_box_in_proj_
    * coords` (`geometry.py:2833-2851`). Counter-clockwise in proj space. */
  def fullDiskBoundary(crs: Crs, nbPoints: Int = 50): Seq[(Double, Double)] = {
    val (xa, ya) = angleExtent(crs)
    val h = heightOf(crs)
    (0 until nbPoints).map { i =>
      val t = -math.Pi + 2 * math.Pi * i / nbPoints // linspace, endpoint=False
      (math.cos(t) * (xa - 0.0001) * h, -math.sin(t) * (ya - 0.0001) * h)
    }
  }

  /** Sutherland–Hodgman clip of `subject` by a CONVEX polygon `clip`
    * (any orientation; any subject shape). Planar, driver-side. */
  def clipPolygon(
      subject: Seq[(Double, Double)],
      clip: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    if (subject.isEmpty || clip.size < 3) return Seq.empty
    // orient the clip polygon counter-clockwise so "inside" = left of edge
    val signedArea = clip.indices.map { i =>
      val (x1, y1) = clip(i); val (x2, y2) = clip((i + 1) % clip.size)
      x1 * y2 - x2 * y1
    }.sum
    val ccw = if (signedArea >= 0) clip else clip.reverse
    var out = subject
    var i = 0
    while (i < ccw.size && out.nonEmpty) {
      val (ax, ay) = ccw(i)
      val (bx, by) = ccw((i + 1) % ccw.size)
      def inside(p: (Double, Double)): Boolean =
        (bx - ax) * (p._2 - ay) - (by - ay) * (p._1 - ax) >= 0
      def intersect(p: (Double, Double), q: (Double, Double)): (Double, Double) = {
        val dx = q._1 - p._1; val dy = q._2 - p._2
        // solve cross(b-a, p + t*d - a) = 0 for t
        val denom = (bx - ax) * dy - (by - ay) * dx
        val t = ((bx - ax) * (ay - p._2) - (by - ay) * (ax - p._1)) / denom
        (p._1 + t * dx, p._2 + t * dy)
      }
      val in = out
      out = in.indices.flatMap { j =>
        val cur = in(j); val prev = in((j + in.size - 1) % in.size)
        (inside(prev), inside(cur)) match {
          case (true, true)   => Seq(cur)
          case (true, false)  => Seq(intersect(prev, cur))
          case (false, true)  => Seq(intersect(prev, cur), cur)
          case (false, false) => Seq.empty
        }
      }
      i += 1
    }
    out
  }

  /** Disk boundary clipped to the area's extent rectangle —
    * `get_geostationary_bounding_box_in_proj_coords` (`:2811-2830`).
    * Empty when the extent is entirely off-disk. */
  def diskPolygonInExtent(area: AreaDef, nbPoints: Int = 50): Seq[(Double, Double)] = {
    val disk = fullDiskBoundary(area.crs, nbPoints)
    val rect = Seq(
      (area.xLL, area.yLL), (area.xUR, area.yLL),
      (area.xUR, area.yUR), (area.xLL, area.yUR))
    clipPolygon(disk, rect)
  }

  /** Visible-disk boundary in lon/lat — `get_geostationary_bounding_box_in_
    * lonlats` (`:2854-2863`). */
  def diskBoundaryLonLats(area: AreaDef, nbPoints: Int = 50): Seq[(Double, Double)] =
    diskPolygonInExtent(area, nbPoints)
      .map { case (x, y) => area.crs.inverse(x, y) }
      .filterNot { case (lo, la) => lo.isNaN || la.isNaN }
}
