package graft.core

import scala.collection.mutable.ArrayBuffer

/** Spherical geometry (driver-side): points, great-circle arcs and polygons
  * on the unit sphere, with area / containment / boolean operations —
  * the engine's counterpart of `pyresample/spherical.py` (U1/U2, A13, F4).
  * Vertices are (lon, lat) in radians; a polygon's inside is to the
  * right of the edges, i.e. vertices enumerated CLOCKWISE (`spherical.py:526`).
  * These objects are small (satellite footprints, area boundaries), so this
  * runs on the driver and feeds predicates/pruning for the data plane.
  */
object Spherical {

  val Epsilon = 1e-7

  final case class Vec3(x: Double, y: Double, z: Double) {
    def cross(o: Vec3): Vec3 = Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
    def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
    def norm: Double = math.sqrt(this.dot(this))
    def normalized: Vec3 = { val n = norm; Vec3(x / n, y / n, z / n) }
  }

  final case class SPoint(lon: Double, lat: Double) {
    def xyz: Vec3 = Vec3(math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
    /** cross product of position vectors (`spherical.py` cross2cart). */
    def cross2cart(o: SPoint): Vec3 = xyz.cross(o.xyz)
    /** Haversine central angle (`spherical.py:57-78`). */
    def hdistance(o: SPoint): Double = {
      val dlat = (lat - o.lat) / 2; val dlon = (lon - o.lon) / 2
      2 * math.asin(math.min(1.0, math.sqrt(
        math.sin(dlat) * math.sin(dlat) +
          math.cos(lat) * math.cos(o.lat) * math.sin(dlon) * math.sin(dlon))))
    }
    def approxEq(o: SPoint): Boolean =
      math.abs(wrapRad(lon - o.lon)) < Epsilon && math.abs(lat - o.lat) < Epsilon
    def antipode: SPoint = SPoint(wrapRad(lon + math.Pi), -lat)
  }

  def wrapRad(a: Double): Double = {
    var r = a % (2 * math.Pi)
    if (r > math.Pi) r -= 2 * math.Pi
    if (r <= -math.Pi) r += 2 * math.Pi
    r
  }

  final case class Arc(start: SPoint, end: SPoint) {

    /** Oriented angle at the common point of two arcs: negative=clockwise
      * (`spherical.py:384-431`). */
    def angle(other: Arc): Double = {
      val (a, b, c) =
        if (start.approxEq(other.start)) (start, end, other.end)
        else if (start.approxEq(other.end)) (start, end, other.start)
        else if (end.approxEq(other.end)) (end, start, other.start)
        else if (end.approxEq(other.start)) (end, start, other.end)
        else throw new IllegalArgumentException("No common point in angle computation")
      val ua = a.cross2cart(b)
      val ub = a.cross2cart(c)
      val v = ua.dot(ub) / (ua.norm * ub.norm)
      val ang =
        if (math.abs(v - 1) < Epsilon) 0.0
        else if (math.abs(v + 1) < Epsilon) math.Pi
        else math.acos(math.max(-1, math.min(1, v)))
      if (ua.normalized.dot(c.xyz) > 0) -ang else ang
    }

    /** The two antipodal great-circle intersection points
      * (`spherical.py:429-462`, after Williams' aviation formulary). */
    def greatCircleIntersections(other: Arc): (SPoint, SPoint) = {
      def adjEndLon(a: Arc): Double = {
        var e = a.end.lon
        if (e - a.start.lon > math.Pi) e -= 2 * math.Pi
        if (e - a.start.lon < -math.Pi) e += 2 * math.Pi
        e
      }
      val ea = start.cross2cart(SPoint(adjEndLon(this), end.lat)).normalized
      val eb = other.start.cross2cart(SPoint(adjEndLon(other), other.end.lat)).normalized
      val cr = ea.cross(eb)
      val lat = math.atan2(cr.z, math.hypot(cr.x, cr.y))
      val lon = math.atan2(cr.y, cr.x)
      (SPoint(lon, lat), SPoint(wrapRad(lon + math.Pi), -lat))
    }

    /** Intersection point of two (shortest-track) arcs, if any
      * (`spherical.py:488-511`). */
    def intersection(other: Arc): Option[SPoint] = {
      if (start.approxEq(other.start) && end.approxEq(other.end)) return None
      val (i1, i2) = greatCircleIntersections(other)
      val ab = start.hdistance(end)
      val cd = other.start.hdistance(other.end)
      def onBoth(i: SPoint): Boolean = {
        val on1 = i.approxEq(start) || i.approxEq(end) ||
          math.abs(start.hdistance(i) + end.hdistance(i) - ab) < Epsilon
        val on2 = i.approxEq(other.start) || i.approxEq(other.end) ||
          math.abs(other.start.hdistance(i) + other.end.hdistance(i) - cd) < Epsilon
        on1 && on2
      }
      if (onBoth(i1)) Some(i1) else if (onBoth(i2)) Some(i2) else None
    }

    /** Nearest (to this arc's start) intersection with any of *arcs*,
      * optionally the one after *known* (`spherical.py:513-538`). */
    def nextIntersection(arcs: Seq[Arc], known: Option[SPoint] = None): Option[(SPoint, Arc)] = {
      val res = arcs.flatMap { arc =>
        intersection(arc).filter(i => !i.approxEq(arc.end) && !i.approxEq(end)).map(i => (i, arc))
      }.sortBy { case (i, _) => start.hdistance(i) }
      known match {
        case None => res.headOption
        case Some(k) =>
          // skip every duplicate of the known point (the rotated arc list
          // contains its anchor edge twice — `spherical.py:513-538` skips
          // all equal entries before taking the next)
          val idx = res.indexWhere(_._1.approxEq(k))
          if (idx < 0) None
          else res.drop(idx).find(!_._1.approxEq(k))
      }
    }
  }

  final class SphPolygon(val vertices: Array[SPoint]) {

    def edges: Seq[Arc] =
      vertices.indices.map(i => Arc(vertices(i), vertices((i + 1) % vertices.length)))

    /** Spherical polygon area in steradians (x R^2 for physical units) via
      * the Bevis & Cambareri (1987) angle-sum algorithm — the same
      * formulation as `spherical.py:581-628`. */
    def area: Double = {
      val n = vertices.length
      var sum = 0.0
      var i = 0
      while (i < n) {
        val a = vertices(i)
        val p = vertices((i + 1) % n)
        val b = vertices((i + 2) % n)
        def newLon(t: SPoint): Double =
          math.atan2(
            math.sin(t.lon - p.lon) * math.cos(t.lat),
            math.sin(t.lat) * math.cos(p.lat) -
              math.cos(t.lat) * math.sin(p.lat) * math.cos(t.lon - p.lon))
        var alpha = newLon(a) - newLon(b)
        if (alpha < 0) alpha += 2 * math.Pi
        sum += alpha
        i += 1
      }
      sum - (n - 2) * math.Pi
    }

    def invert: SphPolygon = new SphPolygon(vertices.reverse)

    /** Whether this polygon lies entirely inside *other*
      * (`spherical.py:720-753`): follow an arc towards the antipodes of the
      * first two vertices; the sign of the turn at the first crossing of
      * other's boundary tells inside vs outside. */
    def isInside(other: SphPolygon): Boolean = {
      val anti0 = vertices(0).antipode
      val anti1 = vertices(1).antipode
      val probes = Seq(
        Arc(vertices(1), anti0),
        Arc(anti0, anti1),
        Arc(anti1, vertices(0)))
      val otherArcs = other.edges
      probes.foreach { arc =>
        arc.nextIntersection(otherArcs) match {
          case Some((inter, otherArc)) =>
            return Arc(arc.start, inter).angle(Arc(inter, otherArc.end)) < 0
          case None =>
        }
      }
      other.area > 2 * math.Pi
    }

    /** Weiler-Atherton-style traversal (`spherical.py:655-706`):
      * sign=+1 union, sign=-1 intersection. None when disjoint (union of
      * disjoint or intersection of disjoint). */
    private def boolOper(other: SphPolygon, sign: Int): Option[SphPolygon] = {
      var arcs1 = edges.toList
      var arcs2 = other.edges.toList

      var inter: Option[SPoint] = None
      var edge1: Arc = null
      var edge2: Arc = null
      val it = arcs1.iterator
      while (inter.isEmpty && it.hasNext) {
        val e1 = it.next()
        e1.nextIntersection(arcs2) match {
          case Some((i, e2)) if !i.approxEq(e1.end) && !i.approxEq(e2.end) =>
            inter = Some(i); edge1 = e1; edge2 = e2
          case _ =>
        }
      }

      if (inter.isEmpty) {
        if (isInside(other)) return if (sign == 1) Some(other) else Some(this)
        if (other.isInside(this)) return if (sign == 1) Some(this) else Some(other)
        return None
      }

      def rotate(startArc: Arc, arcs: List[Arc]): List[Arc] = {
        val idx = arcs.indexWhere(a => a.start.approxEq(startArc.start) && a.end.approxEq(startArc.end))
        arcs.drop(idx) ++ arcs.take(idx)
      }

      val nodes = ArrayBuffer.empty[SPoint]
      var curInter = inter.get
      var guard = 0
      var done = false
      while (!done && guard < 10000) {
        guard += 1
        arcs1 = rotate(edge1, arcs1)
        arcs2 = rotate(edge2, arcs2)
        var narcs1 = arcs1 :+ edge1
        var narcs2 = arcs2 :+ edge2

        val a1 = Arc(curInter, edge1.end)
        val a2 = Arc(curInter, edge2.end)
        if (math.signum(a1.angle(a2)).toInt != sign) {
          val t = arcs1; arcs1 = arcs2; arcs2 = t
          val tn = narcs1; narcs1 = narcs2; narcs2 = tn
          val te = edge1; edge1 = edge2; edge2 = te
        }

        nodes.append(curInter)

        var found: Option[(SPoint, Arc)] = None
        var known: Option[SPoint] = Some(curInter)
        val itn = narcs1.iterator
        while (found.isEmpty && itn.hasNext) {
          edge1 = itn.next()
          found = edge1.nextIntersection(narcs2, known)
          known = None
          if (found.isEmpty && nodes.nonEmpty &&
            !edge1.end.approxEq(nodes.last) && !edge1.end.approxEq(nodes.head)) {
            nodes.append(edge1.end)
          }
        }

        found match {
          case None =>
            if (nodes.length > 2 && nodes.last.approxEq(nodes.head)) nodes.remove(nodes.length - 1)
            done = true
          case Some((i, e2)) =>
            if (i.approxEq(nodes.head)) done = true
            else { curInter = i; edge2 = e2 }
        }
      }
      Some(new SphPolygon(nodes.toArray))
    }

    def union(other: SphPolygon): Option[SphPolygon] = boolOper(other, 1)
    def intersection(other: SphPolygon): Option[SphPolygon] = boolOper(other, -1)

    def overlaps(other: SphPolygon): Boolean = intersection(other).isDefined

    /** intersection area / own area (`geometry.py:605-620`). */
    def overlapRate(other: SphPolygon): Double =
      intersection(other).map(_.area / area).getOrElse(0.0)
  }

  object SphPolygon {
    /** Build from (lon, lat) DEGREE pairs, clockwise around the inside. */
    def fromDegrees(pts: Seq[(Double, Double)]): SphPolygon =
      new SphPolygon(pts.map { case (lo, la) =>
        SPoint(math.toRadians(lo), math.toRadians(la))
      }.toArray)
  }

  /** Partition polygons into non-overlapping union groups —
    * `pyresample/spherical_utils.py:28-131` (GetNonOverlapUnions): connected
    * components under pairwise overlap. Returns groups of input indices. */
  def nonOverlapUnions(polys: Seq[SphPolygon]): Seq[Seq[Int]] = {
    val n = polys.length
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r); r }
    def uni(i: Int, j: Int): Unit = { val (a, b) = (find(i), find(j)); if (a != b) parent(a) = b }
    for (i <- 0 until n; j <- i + 1 until n)
      if (polys(i).overlaps(polys(j))) uni(i, j)
    (0 until n).groupBy(find).values.map(_.toSeq.sorted).toSeq.sortBy(_.head)
  }
}
