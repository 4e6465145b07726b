package graft.core

/** Ellipsoidal geodesics — Vincenty (1975) inverse formulas. The reference
  * uses pyproj's Geod (Karney) for centreline azimuths in
  * `geometry.py:934-940` (_compute_omerc_parameters); Vincenty agrees with
  * Karney to well below 1e-9 degrees for non-antipodal pairs, which is far
  * inside the reference test tolerance (`test_swath.py:252-283`).
  */
object Geodesic {

  /** Inverse problem: (distance metres, forward azimuth at P1, back azimuth
    * at P2) in degrees, pyproj `Geod.inv` conventions (azimuths clockwise
    * from north in (-180, 180]; back azimuth points from P2 towards P1). */
  def inverse(lon1Deg: Double, lat1Deg: Double, lon2Deg: Double, lat2Deg: Double,
      ell: Ellipsoid = Ellipsoid.WGS84): (Double, Double, Double) = {
    val a = ell.a; val b = ell.b; val f = ell.f
    val L = math.toRadians(lon2Deg - lon1Deg)
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(lat1Deg)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(lat2Deg)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lam = L
    var lamPrev = 0.0
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cos2Alpha = 0.0; var cos2SigmaM = 0.0
    do {
      lamPrev = lam
      val sinLam = math.sin(lam); val cosLam = math.cos(lam)
      sinSigma = math.hypot(
        cosU2 * sinLam,
        cosU1 * sinU2 - sinU1 * cosU2 * cosLam)
      if (sinSigma == 0.0) return (0.0, 0.0, 180.0) // coincident points
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLam / sinSigma
      cos2Alpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cos2Alpha == 0.0) 0.0 else cosSigma - 2 * sinU1 * sinU2 / cos2Alpha
      val c = f / 16 * cos2Alpha * (4 + f * (4 - 3 * cos2Alpha))
      lam = L + (1 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      iter += 1
    } while (math.abs(lam - lamPrev) > 1e-13 && iter < 200)

    val uSq = cos2Alpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    val s = b * bigA * (sigma - deltaSigma)

    val sinLam = math.sin(lam); val cosLam = math.cos(lam)
    val az1 = math.atan2(cosU2 * sinLam, cosU1 * sinU2 - sinU1 * cosU2 * cosLam)
    val az2Fwd = math.atan2(cosU1 * sinLam, -sinU1 * cosU2 + cosU1 * sinU2 * cosLam)
    // pyproj back azimuth: direction at P2 facing P1 = forward at P2 + 180
    (s, normAz(math.toDegrees(az1)), normAz(math.toDegrees(az2Fwd) + 180.0))
  }

  /** Normalize an azimuth to (-180, 180]. */
  def normAz(az: Double): Double = {
    var v = az % 360.0
    if (v > 180.0) v -= 360.0
    if (v <= -180.0) v += 360.0
    v
  }
}
