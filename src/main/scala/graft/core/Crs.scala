package graft.core

/** Coordinate reference systems and projection math.
  *
  * The reference (pyresample) delegates all projection work to PROJ via
  * pyproj (e.g. `pyresample/geometry.py:2616-2636`). No JVM PROJ binding is
  * available offline, so the forward/inverse kernels for the projection
  * families the reference exercises (longlat, merc, laea, stere, geos, aeqd
  * — see `pyresample/test/test_files/areas.yaml`, `test_kd_tree.py:38-44`,
  * `geometry.py:2793`) are implemented here from the published formulas in
  * J.P. Snyder, "Map Projections — A Working Manual" (USGS PP 1395, 1987).
  *
  * All angles at the API boundary are degrees (matching PROJ conventions);
  * projected coordinates are metres.
  */
final case class Ellipsoid(a: Double, b: Double) {
  val f: Double = if (a == b) 0.0 else (a - b) / a
  val e2: Double = 2 * f - f * f // first eccentricity squared
  val e: Double = math.sqrt(e2)
  val isSphere: Boolean = e2 == 0.0
  /** Authalic (equal-area) radius — used to fall back to spherical formulas. */
  lazy val authalicRadius: Double =
    if (isSphere) a
    else math.sqrt((a * a / 2) * (1 + ((1 - e2) / e) * 0.5 * math.log((1 + e) / (1 - e))))
}

object Ellipsoid {
  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 6356752.314245179)
  def sphere(r: Double): Ellipsoid = Ellipsoid(r, r)
  /** Mean earth radius used by pyresample for geocentric XYZ
    * (`pyresample/_spatial_mp.py:149`). */
  val R: Double = 6370997.0
}

/** A projection: forward (lon,lat deg -> x,y m) and inverse. Implementations
  * must be total: out-of-domain points map to NaN (mirrors PROJ's inf
  * convention relied on by `pyresample/geometry.py:2811-2877`). */
sealed trait Projection extends Serializable {
  def ell: Ellipsoid
  def forward(lonDeg: Double, latDeg: Double): (Double, Double)
  def inverse(x: Double, y: Double): (Double, Double)
  /** True when x == lon, y == lat (degrees). */
  def isLonLat: Boolean = false
}

object Projection {
  val Deg2Rad: Double = math.Pi / 180.0
  val Rad2Deg: Double = 180.0 / math.Pi
  @inline def wrapLonDeg(lon: Double): Double = {
    // normalize to [-180, 180) — same contract as
    // `pyresample/utils/__init__.py:186` (wrap_longitudes)
    val w = lon - 360.0 * math.floor((lon + 180.0) / 360.0)
    w
  }
}

import Projection._

/** Shared ellipsoidal series/special functions (Snyder PP 1395 §3). */
object ProjMath {
  /** Snyder 3-12: q, the equal-area auxiliary (sphere: 2 sin phi). */
  def qOf(phi: Double, ell: Ellipsoid): Double = {
    val s = math.sin(phi)
    if (ell.isSphere) 2 * s
    else {
      val e = ell.e
      (1 - ell.e2) * (s / (1 - ell.e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
  }
  /** Snyder 3-16 fixed point: latitude from q. */
  def phiFromQ(q: Double, ell: Ellipsoid): Double = {
    if (ell.isSphere) return math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    val e = ell.e
    val qp = qOf(math.Pi / 2, ell)
    if (math.abs(math.abs(q) - math.abs(qp)) < 1e-12) return if (q >= 0) math.Pi / 2 else -math.Pi / 2
    var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    var i = 0
    while (i < 15) {
      val s = math.sin(phi); val c = math.cos(phi)
      val esin = e * s
      val corr = (math.pow(1 - esin * esin, 2) / (2 * c)) *
        (q / (1 - ell.e2) - s / (1 - esin * esin) + (1 / (2 * e)) * math.log((1 - esin) / (1 + esin)))
      phi += corr
      if (math.abs(corr) < 1e-12) i = 15 else i += 1
    }
    phi
  }
  /** Snyder 14-15: m = cos(phi)/sqrt(1 - e^2 sin^2 phi). */
  def msfn(phi: Double, ell: Ellipsoid): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
  }
  /** Meridian arc from the equator, Snyder 3-21. */
  def meridianArc(phi: Double, ell: Ellipsoid): Double = {
    if (ell.isSphere) return ell.a * phi
    val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2
    ell.a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
      (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
      (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
      (35 * e6 / 3072) * math.sin(6 * phi))
  }
  /** Footpoint latitude from a meridian arc, Snyder 3-26 (7-19 e1 series). */
  def phiFromArc(m: Double, ell: Ellipsoid): Double = {
    if (ell.isSphere) return m / ell.a
    val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2
    val mu = m / (ell.a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_3 * e1
    var phi = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
      (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
      (151 * e1_3 / 96) * math.sin(6 * mu) +
      (1097 * e1_4 / 512) * math.sin(8 * mu)
    // Newton polish (dM/dphi = a(1-e^2)/(1-e^2 sin^2)^{3/2}): the series
    // alone truncates at ~5e-8 deg, visible in tight round-trip specs
    var i = 0
    while (i < 3) {
      val s = math.sin(phi)
      val dM = ell.a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
      val corr = (m - meridianArc(phi, ell)) / dM
      phi += corr
      if (math.abs(corr) < 1e-14) i = 3 else i += 1
    }
    phi
  }
  @inline def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  @inline def asinh(x: Double): Double = {
    val ax = math.abs(x)
    math.signum(x) * math.log(ax + math.hypot(1.0, ax))
  }
}

/** proj=longlat / latlong: identity in degrees. */
final case class LonLatProj(ell: Ellipsoid) extends Projection {
  override def isLonLat: Boolean = true
  def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
  def inverse(x: Double, y: Double): (Double, Double) = (x, y)
}

/** False easting/northing wrapper: PROJ's `+x_0`/`+y_0` applied on top of
  * any projection (pyresample passes them through untouched inside the
  * proj dict, e.g. `utils/proj4.py:29-99`). */
final case class OffsetProj(inner: Projection, x0: Double, y0: Double) extends Projection {
  def ell: Ellipsoid = inner.ell
  override def isLonLat: Boolean = inner.isLonLat
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val (x, y) = inner.forward(lon, lat); (x + x0, y + y0)
  }
  def inverse(x: Double, y: Double): (Double, Double) = inner.inverse(x - x0, y - y0)
}

/** proj=eqc (equirectangular / plate carrée), x = a·λ·cosφts, y = a·φ. */
final case class EquirectProj(lon0: Double, latTs: Double, ell: Ellipsoid) extends Projection {
  private val cosTs = math.cos(latTs * Deg2Rad)
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    (ell.a * lam * cosTs, ell.a * lat * Deg2Rad)
  }
  def inverse(x: Double, y: Double): (Double, Double) =
    (wrapLonDeg(lon0 + (x / (ell.a * cosTs)) * Rad2Deg), (y / ell.a) * Rad2Deg)
}

/** proj=merc — Mercator (Snyder 7-2/7-4 sphere; 7-7/7-8 ellipsoid).
  * Scale: EITHER from the standard parallel `latTs` (variant B, the
  * default) OR an explicit `k0In` (variant A — pass latTs = 0 and a
  * non-NaN k0In; CF's `scale_factor_at_projection_origin`). */
final case class MercatorProj(lon0: Double, latTs: Double, ell: Ellipsoid,
    k0In: Double = Double.NaN) extends Projection {
  private val e = ell.e
  // k0 from standard parallel (Snyder 7-5 / 14-15) unless given directly
  private val k0 = if (!k0In.isNaN) k0In else {
    val ts = latTs * Deg2Rad
    if (ell.isSphere) math.cos(ts)
    else math.cos(ts) / math.sqrt(1 - ell.e2 * math.sin(ts) * math.sin(ts))
  }
  def forward(lon: Double, lat: Double): (Double, Double) = {
    if (math.abs(lat) >= 90.0) return (Double.NaN, Double.NaN)
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    val x = ell.a * k0 * lam
    val y =
      if (ell.isSphere) ell.a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2))
      else {
        val esin = e * math.sin(phi)
        ell.a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2) * math.pow((1 - esin) / (1 + esin), e / 2))
      }
    (x, y)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val lam = x / (ell.a * k0)
    val phi =
      if (ell.isSphere) math.Pi / 2 - 2 * math.atan(math.exp(-y / (ell.a * k0)))
      else {
        val t = math.exp(-y / (ell.a * k0))
        var p = math.Pi / 2 - 2 * math.atan(t)
        var i = 0
        while (i < 15) { // Snyder 7-9 fixed point
          val esin = e * math.sin(p)
          val pNew = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
          if (math.abs(pNew - p) < 1e-12) { p = pNew; i = 15 } else { p = pNew; i += 1 }
        }
        p
      }
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=laea — Lambert azimuthal equal-area.
  * Sphere: Snyder 24-2..24-14. Ellipsoid: authalic-latitude formulation
  * (Snyder 24-16..24-34, 3-11/3-12), incl. polar aspects. */
final case class LaeaProj(lon0: Double, lat0: Double, ell: Ellipsoid) extends Projection {
  private val e = ell.e
  private val phi0 = lat0 * Deg2Rad
  private val northPolar = lat0 >= 89.999999
  private val southPolar = lat0 <= -89.999999

  private def qOf(phi: Double): Double = {
    // Snyder 3-12
    val s = math.sin(phi)
    if (ell.isSphere) 2 * s
    else (1 - ell.e2) * (s / (1 - ell.e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
  }
  private val qp = qOf(math.Pi / 2)
  private val rq = ell.a * math.sqrt(qp / 2)
  private def beta(phi: Double): Double = {
    val r = qOf(phi) / qp
    math.asin(math.max(-1.0, math.min(1.0, r)))
  }
  private val beta1 = beta(phi0)
  private val sinB1 = math.sin(beta1)
  private val cosB1 = math.cos(beta1)
  private val m1 = {
    val s = math.sin(phi0); val c = math.cos(phi0)
    c / math.sqrt(1 - ell.e2 * s * s)
  }
  private val d = if (northPolar || southPolar || cosB1 == 0) 1.0 else ell.a * m1 / (rq * cosB1)

  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    if (northPolar || southPolar) {
      val q = qOf(phi)
      val rho =
        if (northPolar) ell.a * math.sqrt(math.max(0.0, qp - q))
        else ell.a * math.sqrt(math.max(0.0, qp + q))
      val x = rho * math.sin(lam)
      val y = if (northPolar) -rho * math.cos(lam) else rho * math.cos(lam)
      (x, y)
    } else {
      val b = beta(phi)
      val sinB = math.sin(b); val cosB = math.cos(b)
      val denom = 1 + sinB1 * sinB + cosB1 * cosB * math.cos(lam)
      if (denom <= 1e-14) return (Double.NaN, Double.NaN) // antipode
      val bFac = rq * math.sqrt(2 / denom)
      val x = bFac * d * cosB * math.sin(lam)
      val y = (bFac / d) * (cosB1 * sinB - sinB1 * cosB * math.cos(lam))
      (x, y)
    }
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    if (northPolar || southPolar) {
      val rho = math.hypot(x, y)
      if (rho > ell.a * math.sqrt(2 * qp / 2) * 2) return (Double.NaN, Double.NaN)
      val qVal = {
        val r = rho / ell.a
        if (northPolar) qp - r * r else -(qp - r * r)
      }
      val phi = phiFromQ(qVal)
      val lam = if (northPolar) math.atan2(x, -y) else math.atan2(x, y)
      (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
    } else {
      val xs = x / d
      val ys = y * d
      val rho = math.hypot(xs, ys)
      if (rho < 1e-12) return (wrapLonDeg(lon0), lat0)
      val arg = rho / (2 * rq)
      if (arg > 1) return (Double.NaN, Double.NaN)
      val ce = 2 * math.asin(arg)
      val sinCe = math.sin(ce); val cosCe = math.cos(ce)
      val sinB = cosCe * sinB1 + (ys * sinCe * cosB1) / rho
      val q = qp * math.max(-1.0, math.min(1.0, sinB))
      val phi = phiFromQ(q)
      val lam = math.atan2(xs * sinCe, rho * cosB1 * cosCe - ys * sinB1 * sinCe)
      (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
    }
  }
  private def phiFromQ(q: Double): Double = {
    if (ell.isSphere) return math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    if (math.abs(math.abs(q) - math.abs(qp)) < 1e-12) return if (q >= 0) math.Pi / 2 else -math.Pi / 2
    var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    var i = 0
    while (i < 15) { // Snyder 3-16
      val s = math.sin(phi); val c = math.cos(phi)
      val esin = e * s
      val corr = (math.pow(1 - esin * esin, 2) / (2 * c)) *
        (q / (1 - ell.e2) - s / (1 - esin * esin) + (1 / (2 * e)) * math.log((1 - esin) / (1 + esin)))
      phi += corr
      if (math.abs(corr) < 1e-12) i = 15 else i += 1
    }
    phi
  }
}

/** proj=stere — stereographic. Sphere: Snyder 21-2..21-4, 20-14..20-18.
  * Ellipsoid: polar (21-33..21-41) and oblique via conformal latitude
  * (21-27..21-32, 3-1). lat_ts sets true-scale parallel for polar aspects. */
final case class StereProj(lon0: Double, lat0: Double, latTs: Double, k0In: Double, ell: Ellipsoid)
    extends Projection {
  private val e = ell.e
  private val phi0 = lat0 * Deg2Rad
  private val northPolar = lat0 >= 89.999999
  private val southPolar = lat0 <= -89.999999

  private def tsfn(phi: Double): Double = {
    // Snyder 15-9: t = tan(pi/4 - phi/2) / ((1-e sin phi)/(1+e sin phi))^(e/2)
    val esin = e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
  }
  private def msfn(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
  }
  /** conformal latitude chi (Snyder 3-1). */
  private def chiOf(phi: Double): Double = {
    if (ell.isSphere) phi
    else {
      val esin = e * math.sin(phi)
      2 * math.atan(math.tan(math.Pi / 4 + phi / 2) * math.pow((1 - esin) / (1 + esin), e / 2)) - math.Pi / 2
    }
  }
  /** inverse of conformal latitude (Snyder 3-4 iteration). */
  private def phiFromChi(chi: Double): Double = {
    if (ell.isSphere) return chi
    var phi = chi
    var i = 0
    while (i < 15) {
      val esin = e * math.sin(phi)
      val next = 2 * math.atan(math.tan(math.Pi / 4 + chi / 2) * math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 2
      if (math.abs(next - phi) < 1e-12) { phi = next; i = 15 } else { phi = next; i += 1 }
    }
    phi
  }

  // scale: for polar with lat_ts, true at lat_ts; else k0 (default 1).
  private val tsAbs = math.abs(latTs) * Deg2Rad
  private val polarTs = (northPolar || southPolar) && math.abs(latTs) < 89.999999

  private val chi1 = chiOf(if (math.abs(latTs) < 89.999999 && !northPolar && !southPolar) phi0 else phi0)
  private val sinChi1 = math.sin(chiOf(phi0))
  private val cosChi1 = math.cos(chiOf(phi0))
  private val k0 = k0In

  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    if (northPolar || southPolar) {
      val sign = if (southPolar) -1.0 else 1.0
      val phiS = sign * phi
      val t = if (ell.isSphere) math.tan(math.Pi / 4 - phiS / 2) else tsfn(phiS)
      val rho =
        if (polarTs) {
          val tc = if (ell.isSphere) math.tan(math.Pi / 4 - tsAbs / 2) else tsfn(tsAbs)
          val mc = if (ell.isSphere) math.cos(tsAbs) else msfn(tsAbs)
          ell.a * mc * t / tc
        } else {
          // Snyder 21-33 with k0
          if (ell.isSphere) 2 * ell.a * k0 * t
          else 2 * ell.a * k0 * t / math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
        }
      val x = rho * math.sin(lam)
      val y = -sign * rho * math.cos(lam)
      (x, y)
    } else if (ell.isSphere) {
      val sinP = math.sin(phi); val cosP = math.cos(phi)
      val sinP0 = math.sin(phi0); val cosP0 = math.cos(phi0)
      val denom = 1 + sinP0 * sinP + cosP0 * cosP * math.cos(lam)
      if (denom <= 1e-14) return (Double.NaN, Double.NaN)
      val k = 2 * k0 / denom
      (ell.a * k * cosP * math.sin(lam), ell.a * k * (cosP0 * sinP - sinP0 * cosP * math.cos(lam)))
    } else {
      // oblique ellipsoidal, conformal sphere (Snyder 21-27..21-32)
      val chi = chiOf(phi)
      val sinChi = math.sin(chi); val cosChi = math.cos(chi)
      val m1v = msfn(phi0)
      val aFac = 2 * ell.a * k0 * m1v / (cosChi1 * (1 + sinChi1 * sinChi + cosChi1 * cosChi * math.cos(lam)))
      (aFac * cosChi * math.sin(lam), aFac * (cosChi1 * sinChi - sinChi1 * cosChi * math.cos(lam)))
    }
  }

  def inverse(x: Double, y: Double): (Double, Double) = {
    if (northPolar || southPolar) {
      val sign = if (southPolar) -1.0 else 1.0
      val rho = math.hypot(x, y)
      val t =
        if (polarTs) {
          val tc = if (ell.isSphere) math.tan(math.Pi / 4 - tsAbs / 2) else tsfn(tsAbs)
          val mc = if (ell.isSphere) math.cos(tsAbs) else msfn(tsAbs)
          rho * tc / (ell.a * mc)
        } else {
          if (ell.isSphere) rho / (2 * ell.a * k0)
          else rho * math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e)) / (2 * ell.a * k0)
        }
      val chi = math.Pi / 2 - 2 * math.atan(t)
      val phi = sign * phiFromChi(chi)
      // forward wrote x = rho sin(lam), y = -sign rho cos(lam)
      val lam = math.atan2(x, -sign * y)
      (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
    } else {
      val rho = math.hypot(x, y)
      if (rho < 1e-12) return (wrapLonDeg(lon0), lat0)
      val (sc, cc) = (sinChi1, cosChi1)
      val ce =
        if (ell.isSphere) 2 * math.atan2(rho, 2 * ell.a * k0)
        else 2 * math.atan2(rho * cosChi1, 2 * ell.a * k0 * msfn(phi0))
      val sinCe = math.sin(ce); val cosCe = math.cos(ce)
      val chi = math.asin(math.max(-1.0, math.min(1.0, cosCe * sc + (y * sinCe * cc) / rho)))
      val lam = math.atan2(x * sinCe, rho * cc * cosCe - y * sc * sinCe)
      (wrapLonDeg(lon0 + lam * Rad2Deg), phiFromChi(chi) * Rad2Deg)
    }
  }
}

/** proj=lcc — Lambert conformal conic, 1 or 2 standard parallels
  * (Snyder 15-1..15-11 ellipsoid; the sphere falls out at e=0). */
final case class LccProj(lon0: Double, lat0: Double, lat1: Double, lat2: Double, ell: Ellipsoid)
    extends Projection {
  private val e = ell.e
  private def tsfn(phi: Double): Double = {
    val esin = e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
  }
  private def msfn(phi: Double): Double = {
    val s = math.sin(phi); math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
  }
  private val p1 = lat1 * Deg2Rad
  private val p2 = lat2 * Deg2Rad
  private val p0 = lat0 * Deg2Rad
  private val n =
    if (math.abs(lat1 - lat2) < 1e-10) math.sin(p1)
    else math.log(msfn(p1) / msfn(p2)) / math.log(tsfn(p1) / tsfn(p2))
  private val f = msfn(p1) / (n * math.pow(tsfn(p1), n))
  private val rho0 = ell.a * f * math.pow(tsfn(p0), n)

  def forward(lon: Double, lat: Double): (Double, Double) = {
    val phi = lat * Deg2Rad
    // the pole opposite the cone is at infinity
    if (n > 0 && lat <= -89.999999) return (Double.NaN, Double.NaN)
    if (n < 0 && lat >= 89.999999) return (Double.NaN, Double.NaN)
    val rho =
      if (math.abs(math.abs(phi) - math.Pi / 2) < 1e-10) 0.0
      else ell.a * f * math.pow(tsfn(phi), n)
    val th = n * wrapLonDeg(lon - lon0) * Deg2Rad
    (rho * math.sin(th), rho0 - rho * math.cos(th))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val rho = math.signum(n) * math.hypot(x, rho0 - y)
    val th = math.atan2(math.signum(n) * x, math.signum(n) * (rho0 - y))
    val lam = th / n + lon0 * Deg2Rad
    if (rho == 0.0) return (wrapLonDeg(lam * Rad2Deg), if (n > 0) 90.0 else -90.0)
    val t = math.pow(rho / (ell.a * f), 1 / n)
    // invert tsfn (Snyder 7-9 iteration)
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 15) {
      val esin = e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
      if (math.abs(next - phi) < 1e-12) { phi = next; i = 15 } else { phi = next; i += 1 }
    }
    (wrapLonDeg(lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=aeqd — azimuthal equidistant, spherical formulas (Snyder 25-1..25-15)
  * on the authalic radius when an ellipsoid is given. */
final case class AeqdProj(lon0: Double, lat0: Double, ell: Ellipsoid) extends Projection {
  private val r = if (ell.isSphere) ell.a else ell.authalicRadius
  private val phi0 = lat0 * Deg2Rad
  private val sinP0 = math.sin(phi0)
  private val cosP0 = math.cos(phi0)
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    val sinP = math.sin(phi); val cosP = math.cos(phi)
    val cosC = sinP0 * sinP + cosP0 * cosP * math.cos(lam)
    val c = math.acos(math.max(-1.0, math.min(1.0, cosC)))
    val k = if (c < 1e-12) 1.0 else c / math.sin(c)
    (r * k * cosP * math.sin(lam), r * k * (cosP0 * sinP - sinP0 * cosP * math.cos(lam)))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val rho = math.hypot(x, y)
    if (rho < 1e-12) return (wrapLonDeg(lon0), lat0)
    val c = rho / r
    if (c > math.Pi) return (Double.NaN, Double.NaN)
    val sinC = math.sin(c); val cosC = math.cos(c)
    val phi = math.asin(math.max(-1.0, math.min(1.0, cosC * sinP0 + (y * sinC * cosP0) / rho)))
    val lam = math.atan2(x * sinC, rho * cosP0 * cosC - y * sinP0 * sinC)
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=geos — geostationary satellite view (CGMS LRIT/HRIT global spec;
  * same model as PROJ's geos). `h` = satellite height above ellipsoid;
  * sweep axis 'y' (default, GOES uses 'x'). Off-disk points map to NaN —
  * the convention `pyresample/geometry.py:2811-2877` depends on. */
final case class GeosProj(lon0: Double, h: Double, sweepX: Boolean, ell: Ellipsoid) extends Projection {
  private val radiusG1 = h / ell.a
  private val radiusG = 1.0 + radiusG1 // distance sat from centre, in units of a
  private val c = radiusG * radiusG - 1.0
  private val flat = ell.e2
  private val oneE2 = 1 - ell.e2
  private val radiusP = math.sqrt(oneE2) // polar radius in units of a
  private val radiusP2 = oneE2
  private val radiusPInv2 = 1 / radiusP2
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    // geocentric latitude (spec: tan(psi) = (b^2/a^2) tan(phi))
    val phiC = math.atan(radiusP2 * math.tan(lat * Deg2Rad))
    // geocentric radius in units of a: r = rp / sqrt(rp^2 cos^2 + sin^2)
    val rr = radiusP / math.hypot(radiusP * math.cos(phiC), math.sin(phiC))
    val vx = rr * math.cos(phiC) * math.cos(lam)
    val vy = rr * math.cos(phiC) * math.sin(lam)
    val vz = rr * math.sin(phiC)
    val tmp = radiusG - vx
    // visibility from the satellite (same predicate as the LRIT spec)
    if (((radiusG - vx) * vx - vy * vy - vz * vz * radiusPInv2) < 0.0)
      return (Double.NaN, Double.NaN)
    val (xr, yr) =
      if (sweepX) (math.atan(vy / math.hypot(vz, tmp)), math.atan(vz / tmp))
      else (math.atan(vy / tmp), math.atan(vz / math.hypot(vy, tmp)))
    (h * xr, h * yr)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    // viewing-direction vector from the satellite (vx toward earth centre)
    val vx0 = -1.0
    var vy0 = 0.0; var vz0 = 0.0
    if (sweepX) {
      vz0 = math.tan(y / h)
      vy0 = math.tan(x / h) * math.hypot(1.0, vz0)
    } else {
      vy0 = math.tan(x / h)
      vz0 = math.tan(y / h) * math.hypot(1.0, vy0)
    }
    val aq = vy0 * vy0 + (vz0 / radiusP) * (vz0 / radiusP) + vx0 * vx0
    val bq = 2 * radiusG * vx0
    val disc = bq * bq - 4 * aq * c
    if (disc < 0) return (Double.NaN, Double.NaN)
    val k = (-bq - math.sqrt(disc)) / (2 * aq)
    val sx = radiusG + k * vx0
    val sy = k * vy0
    val sz = k * vz0
    val lam = math.atan2(sy, sx)
    val phiC = math.atan(sz * math.cos(lam) / sx)
    val phi = math.atan(radiusPInv2 * math.tan(phiC))
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=omerc — oblique Mercator, spherical formulation (Snyder 9-1..9-10)
  * on the authalic radius. Parameterised PROJ-style by the centre
  * (lonc, lat_0) and the azimuth `alpha` of the centre line — the form
  * pyresample's `compute_optimal_bb_area` produces (`geometry.py:946-951`).
  * gamma=0, no_rot semantics. */
final case class OmercProj(lonc: Double, lat0: Double, alphaDeg: Double, ell: Ellipsoid)
    extends Projection {
  private val r = if (ell.isSphere) ell.a else ell.authalicRadius
  private val phiC = lat0 * Deg2Rad
  private val alpha = alphaDeg * Deg2Rad
  // pole of the oblique graticule (Snyder 9-1, 9-2)
  private val phiP = math.asin(math.cos(phiC) * math.sin(alpha))
  private val lamP = math.atan2(-math.cos(alpha), -math.sin(phiC) * math.sin(alpha)) + lonc * Deg2Rad
  private val lam0 = lamP + math.Pi / 2
  private val sinPp = math.sin(phiP)
  private val cosPp = math.cos(phiP)

  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon) * Deg2Rad - lam0
    val phi = lat * Deg2Rad
    val a = sinPp * math.sin(phi) - cosPp * math.cos(phi) * math.sin(lam)
    if (math.abs(a) >= 1.0 - 1e-12) return (Double.NaN, Double.NaN)
    val x = r * math.atan2(math.tan(phi) * cosPp + sinPp * math.sin(lam), math.cos(lam))
    val y = (r / 2) * math.log((1 + a) / (1 - a))
    (x, y)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val xr = x / r; val yr = y / r
    val phi = math.asin(math.max(-1, math.min(1,
      sinPp * math.tanh(yr) + cosPp * math.sin(xr) / math.cosh(yr))))
    val lam = lam0 + math.atan2(
      sinPp * math.sin(xr) - cosPp * math.sinh(yr), math.cos(xr))
    (wrapLonDeg(lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=omerc on an ellipsoid — Hotine oblique Mercator, Snyder
  * 9-11..9-49 ("Alternative B" / PROJ conventions: alpha at the centre
  * point, gamma = 0 rotation, u_0 offset subtracted as PROJ does by
  * default). The spherical [[OmercProj]] keeps Snyder's unrotated axis
  * convention; this class matches PROJ, which the reference drives through
  * pyproj (`geometry.py:946-951`). */
final case class HotineOmercProj(lonc: Double, lat0: Double, alphaDeg: Double, ell: Ellipsoid)
    extends Projection {
  private val e = ell.e
  private val e2 = ell.e2
  private val k0 = 1.0
  private val phi0 = lat0 * Deg2Rad
  private val lamC = lonc * Deg2Rad
  private val alphaC = alphaDeg * Deg2Rad

  private def tsfn(phi: Double): Double = {
    val esin = e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
  }
  private def phiFromT(t: Double): Double = {
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 15) {
      val esin = e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
      if (math.abs(next - phi) < 1e-13) { phi = next; i = 15 } else { phi = next; i += 1 }
    }
    phi
  }

  // Snyder 9-11..9-16 at the centre latitude
  private val cosPhi0 = math.cos(phi0)
  private val sinPhi0 = math.sin(phi0)
  private val bB = math.sqrt(1 + e2 * math.pow(cosPhi0, 4) / (1 - e2))
  private val aA = ell.a * bB * k0 * math.sqrt(1 - e2) / (1 - e2 * sinPhi0 * sinPhi0)
  private val t0 = tsfn(phi0)
  private val dD = math.max(bB * math.sqrt(1 - e2) / (cosPhi0 * math.sqrt(1 - e2 * sinPhi0 * sinPhi0)), 1.0)
  private val fF = dD + math.sqrt(dD * dD - 1) * (if (phi0 < 0) -1.0 else 1.0)
  private val eE = fF * math.pow(t0, bB)
  private val gG = (fF - 1 / fF) / 2
  // 9-26..9-27 + PROJ's u_0 centre offset
  private val gamma0 = math.asin(math.sin(alphaC) / dD)
  private val lam0 = lamC - math.asin(gG * math.tan(gamma0)) / bB
  private val sinG0 = math.sin(gamma0)
  private val cosG0 = math.cos(gamma0)
  private val u0 =
    math.abs(aA / bB * math.atan2(math.sqrt(dD * dD - 1), math.cos(alphaC))) *
      (if (phi0 < 0) -1.0 else 1.0)

  def forward(lon: Double, lat: Double): (Double, Double) = {
    val phi = lat * Deg2Rad
    if (math.abs(math.abs(phi) - math.Pi / 2) < 1e-12) return (Double.NaN, Double.NaN)
    val dLam = wrapLonDeg((lon * Deg2Rad - lam0) * Rad2Deg) * Deg2Rad
    // B > 1 on an ellipsoid, so the atan2 the inverse relies on only
    // recovers B*dLam within (-pi, pi]: the ~(B-1)*180 deg band at the
    // antipodal meridian aliases by 2*pi/B (PROJ wraps the same way and is
    // equally non-injective there) — declare it outside the domain
    if (math.abs(bB * dLam) > math.Pi) return (Double.NaN, Double.NaN)
    val q = eE / math.pow(tsfn(phi), bB)
    val s = (q - 1 / q) / 2
    val t = (q + 1 / q) / 2
    val v = math.sin(bB * dLam)
    val u = (-v * cosG0 + s * sinG0) / t
    if (math.abs(u) >= 1.0 - 1e-15) return (Double.NaN, Double.NaN)
    val vOut = aA * math.log((1 - u) / (1 + u)) / (2 * bB)
    val uOut = aA / bB * math.atan2(s * cosG0 + v * sinG0, math.cos(bB * dLam)) - u0
    // gamma = 0 rotation: x = cross-track v, y = along-track u (PROJ)
    (vOut, uOut)
  }

  def inverse(x: Double, y: Double): (Double, Double) = {
    val v = x
    val u = y + u0
    val qp = math.exp(-bB * v / aA)
    val sp = (qp - 1 / qp) / 2
    val tp = (qp + 1 / qp) / 2
    val vp = math.sin(bB * u / aA)
    val up = (vp * cosG0 + sp * sinG0) / tp
    if (math.abs(up) >= 1.0) return (wrapLonDeg(lam0 * Rad2Deg), if (up >= 0) 90.0 else -90.0)
    val t = math.pow(eE / math.sqrt((1 + up) / (1 - up)), 1 / bB)
    val phi = phiFromT(t)
    val lam = lam0 - math.atan2(sp * cosG0 - vp * sinG0, math.cos(bB * u / aA)) / bB
    (wrapLonDeg(lam * Rad2Deg), phi * Rad2Deg)
  }
}

object HotineOmercProj {
  /** Natural origin of the TWO-POINT oblique Mercator (Snyder 9-17..9-24):
    * the (lonc, lat_0) that PROJ's `omerc +lat_1 +lon_1 +lat_2 +lon_2`
    * returns for `inverse(0, 0)` — the first step of the reference's
    * `_compute_omerc_parameters` (`geometry.py:928-932`). Closed form: at
    * (u, v) = (0, 0) the inverse reduces to (lambda_0, phi(E^(1/B))). */
  def twoPointNaturalOrigin(
      lat0Mid: Double, lon1: Double, lat1: Double, lon2: Double, lat2: Double,
      ell: Ellipsoid): (Double, Double) = {
    val e = ell.e; val e2 = ell.e2
    val phi0 = lat0Mid * Projection.Deg2Rad
    def tsfn(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), e / 2)
    }
    val cosPhi0 = math.cos(phi0); val sinPhi0 = math.sin(phi0)
    val bB = math.sqrt(1 + e2 * math.pow(cosPhi0, 4) / (1 - e2))
    val t0 = tsfn(phi0)
    val dD = math.max(bB * math.sqrt(1 - e2) / (cosPhi0 * math.sqrt(1 - e2 * sinPhi0 * sinPhi0)), 1.0)
    val fF = dD + math.sqrt(dD * dD - 1) * (if (phi0 < 0) -1.0 else 1.0)
    val eE = fF * math.pow(t0, bB)
    val phi1 = lat1 * Projection.Deg2Rad; val phi2 = lat2 * Projection.Deg2Rad
    val lam1 = lon1 * Projection.Deg2Rad; val lam2 = lon2 * Projection.Deg2Rad
    val hH = math.pow(tsfn(phi1), bB)
    val lL = math.pow(tsfn(phi2), bB)
    val f9 = eE / hH
    val gG = (f9 - 1 / f9) / 2
    val jJ = (eE * eE - lL * hH) / (eE * eE + lL * hH)
    val pP = (lL - hH) / (lL + hH)
    val lam12 = {
      // keep the mid-longitude branch consistent when crossing the date line
      var d = lam1 - lam2
      if (d > math.Pi) d -= 2 * math.Pi
      if (d < -math.Pi) d += 2 * math.Pi
      d
    }
    val lam0 = (lam1 + lam2) / 2 - math.atan(jJ * math.tan(bB * lam12 / 2) / pP) / bB
    // phi at the natural origin from t = E^(1/B)
    val tOrigin = math.pow(eE, 1 / bB)
    var phi = math.Pi / 2 - 2 * math.atan(tOrigin)
    var i = 0
    while (i < 15) {
      val esin = e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(tOrigin * math.pow((1 - esin) / (1 + esin), e / 2))
      if (math.abs(next - phi) < 1e-13) { phi = next; i = 15 } else { phi = next; i += 1 }
    }
    (Projection.wrapLonDeg(lam0 * Projection.Rad2Deg), phi * Projection.Rad2Deg)
  }
}

/** proj=tmerc — transverse Mercator, Krüger series in the third flattening
  * n to order n^6 (Karney 2011, "Transverse Mercator with an accuracy of a
  * few nanometers", arXiv:1002.1417 — the same series PROJ's default tmerc
  * uses). Sub-µm agreement with the exact mapping within ~3900 km of the
  * central meridian, which covers every UTM zone many times over; beyond
  * |lon - lon_0| = 60° points map to NaN (outside the series' accurate
  * domain). The reference reaches this projection through pyproj whenever
  * a UTM-georeferenced raster or a CF `transverse_mercator` mapping is
  * loaded (`utils/rasterio.py:77`, `utils/cf.py:31`). */
final case class TmercProj(lon0: Double, lat0: Double, k0: Double, ell: Ellipsoid)
    extends Projection {
  import ProjMath.{asinh, atanh}
  private val e = ell.e
  private val n = { val f = ell.f; f / (2 - f) } // third flattening
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val n5 = n4 * n; private val n6 = n5 * n
  /** Rectifying radius (Karney eq. 14, order n^6). */
  private val aCap = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
  /** Karney eq. 35 coefficients (forward). */
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
    13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
    61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
    49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
    34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
    212378941.0 / 319334400 * n6)
  /** Karney eq. 36 coefficients (inverse). */
  private val beta = Array(
    n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
    n2 / 48 + n3 / 15 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
    17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
    4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
    4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
    20648693.0 / 638668800 * n6)

  /** tan of the conformal latitude (Karney eq. 7-8). */
  private def tauPrime(phi: Double): Double = {
    val tau = math.tan(phi)
    if (ell.isSphere) tau
    else {
      val sig = math.sinh(e * atanh(e * tau / math.hypot(1.0, tau)))
      tau * math.hypot(1.0, sig) - sig * math.hypot(1.0, tau)
    }
  }
  /** xi on the central meridian (cosh terms = 1) — the lat_0 arc offset. */
  private def xiOf(phi: Double): Double = {
    val xiP = math.atan2(tauPrime(phi), 1.0)
    var xi = xiP
    var j = 0
    while (j < 6) { xi += alpha(j) * math.sin(2.0 * (j + 1) * xiP); j += 1 }
    xi
  }
  private val y0Arc = if (lat0 == 0.0) 0.0 else k0 * aCap * xiOf(lat0 * Deg2Rad)

  def forward(lon: Double, lat: Double): (Double, Double) = {
    if (math.abs(lat) > 90.0) return (Double.NaN, Double.NaN)
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    if (math.abs(lam) > 60.0 * Deg2Rad) return (Double.NaN, Double.NaN)
    val phi = lat * Deg2Rad
    val tp = tauPrime(phi)
    val cosLam = math.cos(lam)
    val xiP = math.atan2(tp, cosLam)
    val etaP = asinh(math.sin(lam) / math.hypot(tp, cosLam))
    var xi = xiP; var eta = etaP
    var j = 0
    while (j < 6) {
      val k2 = 2.0 * (j + 1)
      xi += alpha(j) * math.sin(k2 * xiP) * math.cosh(k2 * etaP)
      eta += alpha(j) * math.cos(k2 * xiP) * math.sinh(k2 * etaP)
      j += 1
    }
    (k0 * aCap * eta, k0 * aCap * xi - y0Arc)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val eta = x / (k0 * aCap)
    val xi = (y + y0Arc) / (k0 * aCap)
    var xiP = xi; var etaP = eta
    var j = 0
    while (j < 6) {
      val k2 = 2.0 * (j + 1)
      xiP -= beta(j) * math.sin(k2 * xi) * math.cosh(k2 * eta)
      etaP -= beta(j) * math.cos(k2 * xi) * math.sinh(k2 * eta)
      j += 1
    }
    val sh = math.sinh(etaP)
    val cosXiP = math.cos(xiP)
    val tp = math.sin(xiP) / math.sqrt(sh * sh + cosXiP * cosXiP)
    val lam = math.atan2(sh, cosXiP)
    // geodetic from conformal: Newton on tau (Karney eq. 19-21)
    var tau = tp
    if (!ell.isSphere) {
      var i = 0
      while (i < 10) {
        val sig = math.sinh(e * atanh(e * tau / math.hypot(1.0, tau)))
        val tpi = tau * math.hypot(1.0, sig) - sig * math.hypot(1.0, tau)
        val dtau = (tp - tpi) * (1 + (1 - ell.e2) * tau * tau) /
          ((1 - ell.e2) * math.hypot(1.0, tpi) * math.hypot(1.0, tau))
        tau += dtau
        if (math.abs(dtau) < 1e-14 * math.max(1.0, math.abs(tau))) i = 10 else i += 1
      }
    }
    (wrapLonDeg(lon0 + lam * Rad2Deg), math.atan(tau) * Rad2Deg)
  }
}

/** proj=aea — Albers equal-area conic, 1 or 2 standard parallels
  * (Snyder 14-1..14-11 ellipsoid; sphere falls out of the same q algebra).
  * CF grid mapping `albers_conical_equal_area` (`utils/cf.py:31`). */
final case class AeaProj(lon0: Double, lat0: Double, lat1: Double, lat2: Double, ell: Ellipsoid)
    extends Projection {
  import ProjMath.{msfn, phiFromQ, qOf}
  private val p0 = lat0 * Deg2Rad
  private val p1 = lat1 * Deg2Rad
  private val p2 = lat2 * Deg2Rad
  private val m1 = msfn(p1, ell)
  private val q1 = qOf(p1, ell)
  private val n =
    if (math.abs(lat1 - lat2) < 1e-10) math.sin(p1)
    else {
      val m2 = msfn(p2, ell)
      (m1 * m1 - m2 * m2) / (qOf(p2, ell) - q1)
    }
  require(math.abs(n) > 1e-12, "aea standard parallels must not straddle the equator symmetrically")
  private val cBig = m1 * m1 + n * q1
  private val rho0 = ell.a * math.sqrt(math.max(0.0, cBig - n * qOf(p0, ell))) / n

  def forward(lon: Double, lat: Double): (Double, Double) = {
    val phi = lat * Deg2Rad
    val rho = ell.a * math.sqrt(math.max(0.0, cBig - n * qOf(phi, ell))) / n
    val th = n * wrapLonDeg(lon - lon0) * Deg2Rad
    (rho * math.sin(th), rho0 - rho * math.cos(th))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val rho = math.signum(n) * math.hypot(x, rho0 - y)
    val th = math.atan2(math.signum(n) * x, math.signum(n) * (rho0 - y))
    val q = (cBig - math.pow(rho * n / ell.a, 2)) / n
    val qp = qOf(math.Pi / 2, ell)
    if (math.abs(q) > math.abs(qp) * (1 + 1e-9)) return (Double.NaN, Double.NaN)
    val phi = phiFromQ(math.max(-qp, math.min(qp, q)), ell)
    (wrapLonDeg(lon0 + (th / n) * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=sinu — sinusoidal (Snyder 30-1..30-8 ellipsoid; sphere trivially).
  * The MODIS tiling grid's projection (sphere R=6371007.181); CF mapping
  * `sinusoidal` (`utils/cf.py:31`). */
final case class SinuProj(lon0: Double, ell: Ellipsoid) extends Projection {
  import ProjMath.{meridianArc, phiFromArc}
  def forward(lon: Double, lat: Double): (Double, Double) = {
    if (math.abs(lat) > 90.0) return (Double.NaN, Double.NaN)
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    val s = math.sin(phi)
    val x =
      if (ell.isSphere) ell.a * lam * math.cos(phi)
      else ell.a * lam * math.cos(phi) / math.sqrt(1 - ell.e2 * s * s)
    (x, meridianArc(phi, ell))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val phi = phiFromArc(y, ell)
    if (math.abs(phi) > math.Pi / 2 * (1 + 1e-9)) return (Double.NaN, Double.NaN)
    if (math.abs(math.abs(phi) - math.Pi / 2) < 1e-9) return (wrapLonDeg(lon0), math.signum(phi) * 90.0)
    val s = math.sin(phi)
    val lam =
      if (ell.isSphere) x / (ell.a * math.cos(phi))
      else x * math.sqrt(1 - ell.e2 * s * s) / (ell.a * math.cos(phi))
    if (math.abs(lam) > math.Pi * (1 + 1e-9)) return (Double.NaN, Double.NaN)
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=ortho — orthographic, spherical formulas (Snyder 20-3..20-19) on
  * the authalic radius for an ellipsoid (same convention as [[AeqdProj]]).
  * Far-side points map to NaN. CF mapping `orthographic`. */
final case class OrthoProj(lon0: Double, lat0: Double, ell: Ellipsoid) extends Projection {
  private val r = if (ell.isSphere) ell.a else ell.authalicRadius
  private val phi0 = lat0 * Deg2Rad
  private val sinP0 = math.sin(phi0)
  private val cosP0 = math.cos(phi0)
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    val sinP = math.sin(phi); val cosP = math.cos(phi)
    val cosC = sinP0 * sinP + cosP0 * cosP * math.cos(lam)
    if (cosC < 0) return (Double.NaN, Double.NaN)
    (r * cosP * math.sin(lam), r * (cosP0 * sinP - sinP0 * cosP * math.cos(lam)))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val rho = math.hypot(x, y)
    if (rho < 1e-12) return (wrapLonDeg(lon0), lat0)
    if (rho > r * (1 + 1e-12)) return (Double.NaN, Double.NaN)
    val c = math.asin(math.min(1.0, rho / r))
    val sinC = math.sin(c); val cosC = math.cos(c)
    val phi = math.asin(math.max(-1.0, math.min(1.0, cosC * sinP0 + y * sinC * cosP0 / rho)))
    val lam = math.atan2(x * sinC, rho * cosP0 * cosC - y * sinP0 * sinC)
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=nsper — near-sided (vertical) perspective, spherical (Snyder
  * 23-1..23-5) on the authalic radius. `h` = viewpoint height above the
  * surface. Points beyond the visible horizon map to NaN. CF mapping
  * `vertical_perspective`. */
final case class NsperProj(lon0: Double, lat0: Double, h: Double, ell: Ellipsoid)
    extends Projection {
  private val r = if (ell.isSphere) ell.a else ell.authalicRadius
  private val pBig = 1.0 + h / r // viewpoint distance from centre, in radii
  private val phi0 = lat0 * Deg2Rad
  private val sinP0 = math.sin(phi0)
  private val cosP0 = math.cos(phi0)
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    val sinP = math.sin(phi); val cosP = math.cos(phi)
    val cosC = sinP0 * sinP + cosP0 * cosP * math.cos(lam)
    if (cosC < 1.0 / pBig) return (Double.NaN, Double.NaN) // beyond horizon
    val kp = (pBig - 1.0) / (pBig - cosC)
    (r * kp * cosP * math.sin(lam), r * kp * (cosP0 * sinP - sinP0 * cosP * math.cos(lam)))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val rho = math.hypot(x, y)
    if (rho < 1e-12) return (wrapLonDeg(lon0), lat0)
    // cos c from rho (P - cos c) = R (P - 1) sin c, near-side quadratic root
    val rr = rho / r
    val a2 = rr * rr + (pBig - 1.0) * (pBig - 1.0)
    val disc = rr * rr * rr * rr * pBig * pBig - a2 * (rr * rr * pBig * pBig - (pBig - 1.0) * (pBig - 1.0))
    if (disc < 0) return (Double.NaN, Double.NaN)
    val cosC = (rr * rr * pBig + math.sqrt(disc)) / a2
    if (cosC > 1.0 + 1e-12) return (Double.NaN, Double.NaN)
    val c = math.acos(math.min(1.0, cosC))
    val sinC = math.sin(c)
    val phi = math.asin(math.max(-1.0, math.min(1.0, cosC * sinP0 + y * sinC * cosP0 / rho)))
    val lam = math.atan2(x * sinC, rho * cosP0 * cosC - y * sinP0 * sinC)
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

/** proj=cea — (Lambert) cylindrical equal-area, Snyder §10: sphere
  * 10-1/10-2, ellipsoid 10-7/10-8 with the inverse through the authalic
  * q (10-11, shared [[ProjMath.phiFromQ]]). `lat_ts` (or an explicit
  * `k_0`) sets the standard parallel where scale is true. CF mapping
  * `lambert_cylindrical_equal_area` (`utils/cf.py:31`) — the last
  * `validGridMappings` entry without a kernel before r10. */
final case class CeaProj(lon0: Double, k0: Double, ell: Ellipsoid) extends Projection {
  import ProjMath.{qOf, phiFromQ}
  require(k0 > 0, "cea standard parallel must be below the pole")
  private val qp = qOf(math.Pi / 2, ell)
  def forward(lon: Double, lat: Double): (Double, Double) = {
    if (math.abs(lat) > 90.0) return (Double.NaN, Double.NaN)
    val lam = wrapLonDeg(lon - lon0) * Deg2Rad
    val phi = lat * Deg2Rad
    (ell.a * k0 * lam, ell.a * qOf(phi, ell) / (2 * k0))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val q = 2 * y * k0 / ell.a
    if (math.abs(q) > math.abs(qp) * (1 + 1e-9)) return (Double.NaN, Double.NaN)
    val phi = phiFromQ(math.max(-qp, math.min(qp, q)), ell)
    val lam = x / (ell.a * k0)
    if (math.abs(lam) > math.Pi * (1 + 1e-9)) return (Double.NaN, Double.NaN)
    (wrapLonDeg(lon0 + lam * Rad2Deg), phi * Rad2Deg)
  }
}

object CeaProj {
  /** Snyder 10-13: k0 = cos(lat_ts)/sqrt(1 − e² sin²(lat_ts)) — cos on a
    * sphere. */
  def k0Of(latTs: Double, ell: Ellipsoid): Double =
    ProjMath.msfn(latTs * Projection.Deg2Rad, ell)
}

/** proj=ob_tran +o_proj=longlat — the CF `rotated_latitude_longitude`
  * grid mapping (`utils/cf.py:31`; every COSMO/HIRLAM/RACMO/CORDEX
  * regional-climate file): a latlon grid whose north pole is moved to
  * true (`poleLon`, `poleLat`), optionally spun by `gridLon`
  * (north_pole_grid_longitude: the rotated longitude at which the TRUE
  * pole appears). Pure spherical rotation — composition of Rz(poleLon)
  * then the y-axis tilt taking the new pole to +z; the rotated prime
  * meridian points away from the pole meridian (the COSMO/CF
  * convention: rotated (0,0) is true (poleLon+180, 90−poleLat)).
  *
  * Units deviation from PROJ (documented): PROJ's `ob_tran o_proj=
  * longlat` emits radians unless `to_meter` rescales; this kernel emits
  * rotated-grid DEGREES directly, matching the CF `grid_longitude`/
  * `grid_latitude` axis units the loader hands it — the same
  * degrees-at-the-boundary convention as [[LonLatProj]]. The rotation is
  * shape-preserving, so the ellipsoid only labels the datum. */
final case class RotatedPoleProj(poleLat: Double, poleLon: Double, gridLon: Double,
    ell: Ellipsoid) extends Projection {
  private val sp = math.sin(poleLat * Deg2Rad)
  private val cp = math.cos(poleLat * Deg2Rad)
  @inline private def clamp1(v: Double): Double = math.max(-1.0, math.min(1.0, v))
  def forward(lon: Double, lat: Double): (Double, Double) = {
    if (math.abs(lat) > 90.0) return (Double.NaN, Double.NaN)
    val dl = (lon - poleLon) * Deg2Rad
    val phi = lat * Deg2Rad
    val cf = math.cos(phi); val sf = math.sin(phi)
    val cd = math.cos(dl); val sd = math.sin(dl)
    val x2 = cf * cd * sp - sf * cp
    val y2 = cf * sd
    val z2 = cf * cd * cp + sf * sp
    val lonR = if (x2 == 0.0 && y2 == 0.0) 0.0 else math.atan2(-y2, -x2) * Rad2Deg
    (wrapLonDeg(lonR + gridLon), math.asin(clamp1(z2)) * Rad2Deg)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    if (math.abs(y) > 90.0) return (Double.NaN, Double.NaN)
    val lonR = (x - gridLon) * Deg2Rad
    val latR = y * Deg2Rad
    val cR = math.cos(latR)
    val x2 = -cR * math.cos(lonR)
    val y2 = -cR * math.sin(lonR)
    val z2 = math.sin(latR)
    val x1 = x2 * sp + z2 * cp
    val z1 = -x2 * cp + z2 * sp
    val lon = if (x1 == 0.0 && y2 == 0.0) 0.0 else math.atan2(y2, x1) * Rad2Deg
    (wrapLonDeg(poleLon + lon), math.asin(clamp1(z1)) * Rad2Deg)
  }
}

/** A parsed CRS: projection + raw proj4 params (mirrors what
  * `pyresample/utils/proj4.py:29-99` keeps around). */
final case class Crs(proj: Projection, proj4: String, params: Map[String, String]) {
  def isLonLat: Boolean = proj.isLonLat
  def forward(lon: Double, lat: Double): (Double, Double) = proj.forward(lon, lat)
  def inverse(x: Double, y: Double): (Double, Double) = proj.inverse(x, y)
  // primitive-array forms for codegen call sites (functions/ProjectExpr.scala)
  def forwardArray(lon: Double, lat: Double): Array[Double] = {
    val (x, y) = proj.forward(lon, lat); Array(x, y)
  }
  def inverseArray(x: Double, y: Double): Array[Double] = {
    val (lo, la) = proj.inverse(x, y); Array(lo, la)
  }
}

object Crs {
  /** Parse a proj4 string ("+proj=laea +lat_0=-90 +lon_0=0 +a=6371228")
    * — grammar per `pyresample/utils/proj4.py:45` (proj4_str_to_dict). */
  def fromProj4(s: String): Crs = {
    val params: Map[String, String] = s.trim
      .split("\\s+")
      .iterator
      .filter(_.nonEmpty)
      .map(_.stripPrefix("+"))
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k)    => k -> "true"
        }
      }
      .toMap
    fromParams(params, s)
  }

  def fromParams(params0: Map[String, String], raw: String = ""): Crs = {
    // +proj=utm is sugar for a zone of tmerc (PROJ semantics): rewrite the
    // param surface so everything downstream (WKT export, YAML dump) sees
    // the explicit tmerc form
    val params: Map[String, String] =
      if (params0.get("proj").contains("utm")) {
        val zone = params0.getOrElse("zone",
          throw new IllegalArgumentException("+proj=utm requires +zone=")).toDouble.toInt
        require(zone >= 1 && zone <= 60, s"UTM zone $zone out of [1, 60]")
        val south = params0.contains("south")
        (params0 - "zone" - "south") ++ Map(
          "proj" -> "tmerc",
          "lon_0" -> (6 * zone - 183).toString, "lat_0" -> "0",
          "k_0" -> "0.9996", "x_0" -> "500000",
          "y_0" -> (if (south) "10000000" else "0"))
      } else params0
    def d(k: String, default: Double): Double = params.get(k).map(_.toDouble).getOrElse(default)
    val ell: Ellipsoid = (params.get("a"), params.get("b"), params.get("rf"), params.get("ellps"), params.get("R")) match {
      case (_, _, _, _, Some(r))     => Ellipsoid.sphere(r.toDouble)
      case (Some(a), Some(b), _, _, _) => Ellipsoid(a.toDouble, b.toDouble)
      case (Some(a), None, Some(rf), _, _) =>
        val av = a.toDouble; Ellipsoid(av, av * (1 - 1 / rf.toDouble))
      case (Some(a), None, None, _, _) => Ellipsoid.sphere(a.toDouble)
      case (None, _, _, Some("sphere"), _) => Ellipsoid.sphere(6370997.0)
      case _ => Ellipsoid.WGS84
    }
    val lon0 = d("lon_0", 0.0)
    val lat0 = d("lat_0", 0.0)
    val latTs = d("lat_ts", 0.0)
    val k0 = d("k_0", d("k", 1.0))
    val projName = params.getOrElse("proj", "longlat")
    val base: Projection = projName match {
      case "longlat" | "latlong" | "lonlat" | "latlon" => LonLatProj(ell)
      case "eqc"   => EquirectProj(lon0, latTs, ell)
      case "merc"  =>
        // PROJ: EITHER lat_ts OR k_0 defines the scale (variant B / A)
        require(!(params.contains("lat_ts") && (params.contains("k_0") || params.contains("k"))),
          "merc takes lat_ts or k_0, not both")
        MercatorProj(lon0, latTs, ell, if (params.contains("lat_ts")) Double.NaN else k0)
      case "laea"  => LaeaProj(lon0, lat0, ell)
      case "stere" => StereProj(lon0, lat0, if (params.contains("lat_ts")) latTs else 90.0 * math.signum(if (lat0 == 0) 1 else lat0), k0, ell)
      case "aeqd"  => AeqdProj(lon0, lat0, ell)
      case "geos"  => GeosProj(lon0, d("h", 35785831.0), params.get("sweep").contains("x"), ell)
      case "omerc" =>
        // sphere: Snyder's unrotated spherical form (the optimal-bb fit
        // path); ellipsoid: the Hotine/PROJ-convention form
        if (ell.isSphere) OmercProj(d("lonc", lon0), lat0, d("alpha", 0.0), ell)
        else HotineOmercProj(d("lonc", lon0), lat0, d("alpha", 0.0), ell)
      case "lcc"   => LccProj(lon0, lat0, d("lat_1", lat0), d("lat_2", d("lat_1", lat0)), ell)
      case "tmerc" => TmercProj(lon0, lat0, k0, ell)
      case "aea"   => AeaProj(lon0, lat0, d("lat_1", lat0), d("lat_2", d("lat_1", lat0)), ell)
      case "sinu"  => SinuProj(lon0, ell)
      case "ortho" => OrthoProj(lon0, lat0, ell)
      case "nsper" => NsperProj(lon0, lat0, d("h", 35785831.0), ell)
      case "cea"   =>
        // PROJ: lat_ts or an explicit k_0 sets the standard parallel
        CeaProj(lon0, if (params.contains("k_0") || params.contains("k")) k0
          else CeaProj.k0Of(latTs, ell), ell)
      case "ob_tran" =>
        // only the rotated-pole latlon family (o_proj=longlat) — the one
        // form CF's rotated_latitude_longitude produces
        require(params.get("o_proj").forall(
          Set("longlat", "latlong", "lonlat", "latlon")),
          s"ob_tran supports o_proj=longlat, got ${params.getOrElse("o_proj", "?")}")
        // CF -> PROJ puts the true pole meridian at lon_0 = 180 + pole_lon
        RotatedPoleProj(d("o_lat_p", 90.0), wrapLonDeg(lon0 - 180.0), d("o_lon_p", 0.0), ell)
      case other   => throw new IllegalArgumentException(s"unsupported projection: $other (supported: longlat, eqc, merc, laea, stere, aeqd, geos, omerc, lcc, tmerc, utm, aea, sinu, ortho, nsper, cea, ob_tran)")
    }
    // +x_0/+y_0 false easting/northing apply to any projected CRS
    val x0 = d("x_0", 0.0); val y0 = d("y_0", 0.0)
    val proj = if ((x0 != 0.0 || y0 != 0.0) && !base.isLonLat) OffsetProj(base, x0, y0) else base
    Crs(proj, if (raw.nonEmpty) raw else params.map { case (k, v) => s"+$k=$v" }.mkString(" "), params)
  }
}
