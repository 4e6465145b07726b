package graft.queries

import graft.core.AreaDef
import graft.operators.DataReduce

/** Generators for DuckDB oracle SQL that replays the engine's
  * real-projection pipelines (q40-q48) bit-for-bit.
  *
  * Strategy (the "quantized projection" discipline, an extension of the
  * `round(exp(...), 7)` trick used by q16/q33):
  *   - projection constants (eccentricity, conformal-latitude terms, grid
  *     extents) are computed HERE with op-for-op the same JVM arithmetic as
  *     `graft.core.StereProj` / `AreaDef`, then baked into the SQL as
  *     literals — bit-identical to the values inside the Spark plan;
  *   - per-row transcendentals (trig of data-dependent values) can differ
  *     by ~1 ulp between JVM libm and DuckDB libm, so every trig-derived
  *     quantity that feeds a comparison or an output is quantized (ROUND)
  *     at a scale that makes those ulps invisible, on BOTH sides;
  *   - everything downstream of the quantization is pure IEEE +,-,*,/,sqrt
  *     transcribed in the same association order — exact in any engine;
  *   - iterative kernels (inverse conformal latitude) are unrolled to a
  *     fixed depth: past convergence (~5 iterations at e^2 ~ 0.0067) extra
  *     iterations are stationary to 1e-15, absorbed by the quantization.
  *
  * Literals are emitted in scientific notation: DuckDB parses plain decimal
  * literals as DECIMAL (different arithmetic!), but E-notation as DOUBLE.
  */
object OracleSql {

  /** A double literal DuckDB parses as DOUBLE, round-trip asserted. */
  def slit(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite literal $d")
    val s = f"$d%.17E"
    require(s.toDouble == d, s"literal does not round-trip: $d -> $s")
    s"($s)"
  }

  /** `Projection.wrapLonDeg` twin: normalize to [-180, 180). */
  def wrapSql(v: String): String =
    s"(($v) - 360.0 * FLOOR((($v) + 180.0) / 360.0))"

  /** Geocentric XYZ expressions (mirrors `GeoFunctions.lonlat2x/y/z`),
    * rounded to `decimals` so libm ulps cannot flip any comparison. */
  def xyzSql(lon: String, lat: String, decimals: Int): (String, String, String) = (
    s"ROUND(COS(RADIANS($lat)) * COS(RADIANS($lon)) * 6370997.0, $decimals)",
    s"ROUND(COS(RADIANS($lat)) * SIN(RADIANS($lon)) * 6370997.0, $decimals)",
    s"ROUND(SIN(RADIANS($lat)) * 6370997.0, $decimals)")

  /** SQL twin of `DataReduce.reduceToArea`'s predicate — identical baked
    * bounds via `DataReduce.reducedBounds`. */
  def reducePredSql(area: AreaDef, radius: Double,
      lon: String = "lon", lat: String = "lat"): String =
    DataReduce.reducedBounds(area, radius) match {
      case Left((lo, hi)) =>
        s"($lat >= ${slit(lo)} AND $lat <= ${slit(hi)})"
      case Right((w, lo, e, hi)) =>
        val lonPred =
          if (w <= e) s"($lon >= ${slit(w)} AND $lon <= ${slit(e)})"
          else s"($lon >= ${slit(w)} OR $lon <= ${slit(e)})"
        s"($lat >= ${slit(lo)} AND $lat <= ${slit(hi)} AND $lonPred)"
    }

  /** Pixel-centre grid CTE — twin of `AreaDef.grid` (cell, px, py). */
  def gridCte(name: String, area: AreaDef): String =
    s"""$name AS (SELECT cell,
       ${slit(area.xLL)} + (CAST(cell % ${area.width} AS DOUBLE) + 0.5) * ${slit(area.pixelSizeX)} AS px,
       ${slit(area.yUR)} - (CAST(FLOOR(cell / ${area.width}) AS DOUBLE) + 0.5) * ${slit(area.pixelSizeY)} AS py
       FROM range(0, ${area.size}) t(cell))"""

  /** Flat-cell-id expression — twin of `GeoFunctions.cellIndex` minus the
    * -1 branch (callers filter the bounds instead). */
  def fracColSql(area: AreaDef, x: String): String =
    s"CAST(FLOOR(($x - ${slit(area.xLL)}) / ${slit(area.pixelSizeX)}) AS BIGINT)"
  def fracRowSql(area: AreaDef, y: String): String =
    s"CAST(FLOOR((${slit(area.yUR)} - $y) / ${slit(area.pixelSizeY)}) AS BIGINT)"

  /** Stereographic projection SQL twin — the oblique ellipsoidal branch of
    * `graft.core.StereProj` (the only branch the oracle queries use:
    * `+proj=stere +lat_0=50 +lon_0=8`, reference `test_kd_tree.py:35-48`).
    * All initializer constants replicate StereProj's arithmetic op-for-op.
    */
  final case class StereSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "stere", s"not a stere area: ${p("proj")}")
    require(!p.contains("k_0") && !p.contains("k"), "k0 != 1 not supported by the oracle twin")
    val a: Double = p("a").toDouble
    val b: Double = p("b").toDouble
    val lon0: Double = p.get("lon_0").map(_.toDouble).getOrElse(0.0)
    val lat0: Double = p.get("lat_0").map(_.toDouble).getOrElse(0.0)
    require(math.abs(lat0) < 89.999999, "polar stere not needed by the oracle set")
    require(a != b, "spherical stere not needed by the oracle set")

    // ---- constants: op-for-op the initializers of Ellipsoid + StereProj
    private val fEll = (a - b) / a
    private val e2 = 2 * fEll - fEll * fEll
    private val e = math.sqrt(e2)
    private val k0 = 1.0
    private val D2R = math.Pi / 180.0
    private val R2D = 180.0 / math.Pi
    private val phi0 = lat0 * D2R
    private def chiOf(phi: Double): Double = {
      val esin = e * math.sin(phi)
      2 * math.atan(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), e / 2)) - math.Pi / 2
    }
    private val sinChi1 = math.sin(chiOf(phi0))
    private val cosChi1 = math.cos(chiOf(phi0))
    private val m1v = math.cos(phi0) / math.sqrt(1 - e2 * math.sin(phi0) * math.sin(phi0))
    private val num = 2 * a * k0 * m1v // numerator of aFac; also inverse's atan2 denominator

    private val E = slit(e); private val EH = slit(e / 2)
    private val PI4 = slit(math.Pi / 4); private val PI2 = slit(math.Pi / 2)
    private val SC1 = slit(sinChi1); private val CC1 = slit(cosChi1)
    private val NUM = slit(num)
    private val D2RL = slit(D2R); private val R2DL = slit(R2D)
    private val LON0 = slit(lon0)

    private def wrap(v: String): String = wrapSql(v)

    /** CTE chain `{pfx}a`..`{pfx}` adding forward-projected coordinates.
      * Final CTE selects `keep` columns plus `$outX`, `$outY` (optionally
      * ROUNDed to `quantize` decimals — pass None only when downstream use
      * is floor-binning with cells >> 1e-9 m).
      *
      * Every chain's final CTE is `AS MATERIALIZED`: the intermediate
      * steps reference their predecessors' columns more than once (the
      * inverse chain's fixed-point iterations reference `_it{k-1}` twice
      * per step), so letting DuckDB inline the chain into downstream
      * consumers grows the expression tree exponentially — the r10 driver
      * checker's multi-GB allocation spikes on q45/q199 came from exactly
      * that, not from data volume. A materialization barrier at the narrow
      * cut (keep + 2 coords) caps planner + executor memory and changes no
      * values. */
    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y",
        quantize: Option[Int] = None): String = {
      val xRaw = "_afac * _cchi * _slam"
      val yRaw = s"_afac * ($CC1 * _schi - $SC1 * _cchi * _clam)"
      val (xE, yE) = quantize match {
        case Some(n) => (s"ROUND($xRaw, $n)", s"ROUND($yRaw, $n)")
        case None    => (xRaw, yRaw)
      }
      s"""${pfx}a AS (SELECT *, ${wrap(s"$lonC - $LON0")} * $D2RL AS _lam, $latC * $D2RL AS _phi FROM $src),
      ${pfx}b AS (SELECT *, $E * SIN(_phi) AS _esin FROM ${pfx}a),
      ${pfx}c AS (SELECT *, 2 * ATAN(TAN($PI4 + _phi / 2) * POW((1 - _esin) / (1 + _esin), $EH)) - $PI2 AS _chi FROM ${pfx}b),
      ${pfx}d AS (SELECT *, SIN(_chi) AS _schi, COS(_chi) AS _cchi, SIN(_lam) AS _slam, COS(_lam) AS _clam FROM ${pfx}c),
      ${pfx}e AS (SELECT *, $NUM / ($CC1 * (1 + $SC1 * _schi + $CC1 * _cchi * _clam)) AS _afac FROM ${pfx}d),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")}, $xE AS $outX, $yE AS $outY FROM ${pfx}e)"""
    }

    /** CTE chain adding inverse-projected lon/lat from projected x/y, with
      * the conformal-latitude fixed point unrolled to `iters` iterations
      * (StereProj.phiFromChi converges in <=5 at this eccentricity; its
      * early exit leaves it within 1e-15 rad of the unrolled value —
      * absorbed by any downstream quantization). */
    def invCtes(pfx: String, src: String, keep: Seq[String],
        xC: String, yC: String,
        outLon: String = "lon", outLat: String = "lat",
        iters: Int = 8): String = {
      val it = (1 to iters).map { k =>
        s"${pfx}i$k AS (SELECT *, 2 * ATAN(_tc * POW((1 + $E * SIN(_it${k - 1})) / (1 - $E * SIN(_it${k - 1})), $EH)) - $PI2 AS _it$k FROM ${pfx}${if (k == 1) "e" else s"i${k - 1}"})"
      }.mkString(",\n      ")
      s"""${pfx}a AS (SELECT *, SQRT($xC * $xC + $yC * $yC) AS _rho FROM $src),
      ${pfx}b AS (SELECT *, 2 * ATAN2(_rho * $CC1, $NUM) AS _ce FROM ${pfx}a),
      ${pfx}c AS (SELECT *, SIN(_ce) AS _sce, COS(_ce) AS _cce FROM ${pfx}b),
      ${pfx}d AS (SELECT *, ASIN(GREATEST(-1.0, LEAST(1.0, _cce * $SC1 + ($yC * _sce * $CC1) / _rho))) AS _chi,
                 ATAN2($xC * _sce, _rho * $CC1 * _cce - $yC * $SC1 * _sce) AS _lamv FROM ${pfx}c),
      ${pfx}e AS (SELECT *, TAN($PI4 + _chi / 2) AS _tc, _chi AS _it0 FROM ${pfx}d),
      $it,
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")}, ${wrap(s"$LON0 + _lamv * $R2DL")} AS $outLon, _it$iters * $R2DL AS $outLat FROM ${pfx}i$iters)"""
    }
  }

  /** Transverse Mercator forward twin — `graft.core.TmercProj` (Krüger
    * n^6 series) with lat_0 = 0 (the UTM case). DuckDB has no hyperbolic
    * functions, so sinh/cosh/asinh/atanh are composed from EXP/LN; those
    * compositions differ from JVM libm by ulps only — invisible to the
    * floor-binning the bucket queries feed this into (cells are km-scale;
    * the drift is ~1e-6 m). All series constants are baked op-for-op from
    * the same arithmetic as TmercProj's initializers. */
  final case class TmercSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "tmerc", s"not a tmerc area: ${p("proj")}")
    require(p.getOrElse("lat_0", "0").toDouble == 0.0, "oracle twin covers lat_0 = 0 (UTM)")
    private val a = p("a").toDouble
    private val ellB = (p.get("b"), p.get("rf")) match {
      case (Some(b), _) => b.toDouble
      case (None, Some(rf)) => a * (1 - 1 / rf.toDouble)
      case _ => a
    }
    private val f = (a - ellB) / a
    private val e2 = 2 * f - f * f
    private val e = math.sqrt(e2)
    private val k0 = p.get("k_0").orElse(p.get("k")).map(_.toDouble).getOrElse(1.0)
    private val lon0 = p.get("lon_0").map(_.toDouble).getOrElse(0.0)
    private val x0 = p.get("x_0").map(_.toDouble).getOrElse(0.0)
    private val y0 = p.get("y_0").map(_.toDouble).getOrElse(0.0)
    // ---- op-for-op the initializers of TmercProj
    private val n = f / (2 - f)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val aCap = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val alpha = Array(
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    private val E = slit(e)
    private val KA = slit(k0 * aCap)
    private val D2RL = slit(math.Pi / 180.0)
    private val LON0 = slit(lon0)
    private val X0 = slit(x0); private val Y0 = slit(y0)

    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y"): String = {
      // cosh(2k eta') = (E2^k + E2^-k)/2 with E2 = exp(2 eta'); one EXP
      def ch(k: Int) = if (k == 1) "((_e2p + 1 / _e2p) / 2)"
        else s"((POW(_e2p, $k) + 1 / POW(_e2p, $k)) / 2)"
      def sh(k: Int) = if (k == 1) "((_e2p - 1 / _e2p) / 2)"
        else s"((POW(_e2p, $k) - 1 / POW(_e2p, $k)) / 2)"
      val xiTerms = (0 until 6).map { j =>
        s" + ${slit(alpha(j))} * SIN(${2 * (j + 1)} * _xip) * ${ch(j + 1)}"
      }.mkString
      val etaTerms = (0 until 6).map { j =>
        s" + ${slit(alpha(j))} * COS(${2 * (j + 1)} * _xip) * ${sh(j + 1)}"
      }.mkString
      s"""${pfx}a AS (SELECT *, ${wrapSql(s"$lonC - $LON0")} * $D2RL AS _lam, $latC * $D2RL AS _phi FROM $src),
      ${pfx}b AS (SELECT *, TAN(_phi) AS _tau, SIN(_lam) AS _slam, COS(_lam) AS _clam FROM ${pfx}a),
      ${pfx}c AS (SELECT *, SQRT(1 + _tau * _tau) AS _t1 FROM ${pfx}b),
      ${pfx}d AS (SELECT *, $E * ((LN((1 + ($E * _tau / _t1)) / (1 - ($E * _tau / _t1)))) / 2) AS _ath FROM ${pfx}c),
      ${pfx}e AS (SELECT *, (EXP(_ath) - EXP(-_ath)) / 2 AS _sig FROM ${pfx}d),
      ${pfx}f AS (SELECT *, _tau * SQRT(1 + _sig * _sig) - _sig * _t1 AS _tp FROM ${pfx}e),
      ${pfx}g AS (SELECT *, _slam / SQRT(_tp * _tp + _clam * _clam) AS _sl1 FROM ${pfx}f),
      ${pfx}g2 AS (SELECT *, ATAN2(_tp, _clam) AS _xip,
                  SIGN(_sl1) * LN(ABS(_sl1) + SQRT(1 + _sl1 * _sl1)) AS _etap FROM ${pfx}g),
      ${pfx}h AS (SELECT *, EXP(2 * _etap) AS _e2p FROM ${pfx}g2),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")},
               $KA * (_etap$etaTerms) + $X0 AS $outX,
               $KA * (_xip$xiTerms) + $Y0 AS $outY FROM ${pfx}h)"""
    }
  }

  /** Albers equal-area conic forward twin — `graft.core.AeaProj` (Snyder
    * 14-1..14-11 ellipsoid), constants baked op-for-op. */
  final case class AeaSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "aea", s"not an aea area: ${p("proj")}")
    private val a = p("a").toDouble
    private val ellB = (p.get("b"), p.get("rf")) match {
      case (Some(b), _) => b.toDouble
      case (None, Some(rf)) => a * (1 - 1 / rf.toDouble)
      case _ => a
    }
    private val f = (a - ellB) / a
    private val e2 = 2 * f - f * f
    private val e = math.sqrt(e2)
    private val lon0 = p.get("lon_0").map(_.toDouble).getOrElse(0.0)
    private val lat0 = p.get("lat_0").map(_.toDouble).getOrElse(0.0)
    private val lat1 = p.get("lat_1").map(_.toDouble).getOrElse(lat0)
    private val lat2 = p.get("lat_2").map(_.toDouble).getOrElse(lat1)
    require(e > 0, "spherical aea not needed by the oracle set")
    private val D2R = math.Pi / 180.0
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def msfn(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }
    private val p1 = lat1 * D2R; private val p2 = lat2 * D2R; private val p0 = lat0 * D2R
    private val m1 = msfn(p1)
    private val q1 = qOf(p1)
    private val nN =
      if (math.abs(lat1 - lat2) < 1e-10) math.sin(p1)
      else { val m2 = msfn(p2); (m1 * m1 - m2 * m2) / (qOf(p2) - q1) }
    private val cBig = m1 * m1 + nN * q1
    private val rho0 = a * math.sqrt(math.max(0.0, cBig - nN * qOf(p0))) / nN

    private val E = slit(e); private val E2 = slit(e2)
    private val OneME2 = slit(1 - e2); private val Inv2E = slit(1 / (2 * e))
    private val NL = slit(nN); private val CL = slit(cBig)
    private val RHO0 = slit(rho0); private val AL = slit(a)
    private val D2RL = slit(D2R); private val LON0 = slit(lon0)

    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y"): String =
      s"""${pfx}a AS (SELECT *, SIN($latC * $D2RL) AS _s,
                   $NL * ${wrapSql(s"$lonC - $LON0")} * $D2RL AS _th FROM $src),
      ${pfx}b AS (SELECT *, $OneME2 * (_s / (1 - $E2 * _s * _s) - $Inv2E * LN((1 - $E * _s) / (1 + $E * _s))) AS _q FROM ${pfx}a),
      ${pfx}c AS (SELECT *, $AL * SQRT(GREATEST(CAST(0 AS DOUBLE), $CL - $NL * _q)) / $NL AS _rho FROM ${pfx}b),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")}, _rho * SIN(_th) AS $outX,
               $RHO0 - _rho * COS(_th) AS $outY FROM ${pfx}c)"""
  }

  /** Sinusoidal forward twin — `graft.core.SinuProj`, SPHERE only (the
    * MODIS grid case): x = (a·λ)·cosφ, y = a·φ — pure trig, transcribed
    * in the same association order. */
  final case class SinuSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "sinu", s"not a sinu area: ${p("proj")}")
    require(!p.contains("b") && !p.contains("rf"), "oracle twin covers the MODIS sphere")
    private val a = p("a").toDouble
    private val lon0 = p.get("lon_0").map(_.toDouble).getOrElse(0.0)
    private val AL = slit(a)
    private val D2RL = slit(math.Pi / 180.0)
    private val LON0 = slit(lon0)
    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y"): String =
      s"""${pfx}a AS (SELECT *, ${wrapSql(s"$lonC - $LON0")} * $D2RL AS _lam, $latC * $D2RL AS _phi FROM $src),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")}, ($AL * _lam) * COS(_phi) AS $outX,
               $AL * _phi AS $outY FROM ${pfx}a)"""
  }

  /** Cylindrical equal-area forward twin — `graft.core.CeaProj` (Snyder
    * §10, r10): x is pure arithmetic (k0 JVM-baked), y goes through the
    * ellipsoidal q of the data latitude — SIN/LN libm drift is ~1e-9 m
    * against ~100 km cells. */
  final case class CeaSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "cea", s"not a cea area: ${p("proj")}")
    private val crsEll = {
      val a = p("a").toDouble
      (p.get("b"), p.get("rf")) match {
        case (Some(b), _) => graft.core.Ellipsoid(a, b.toDouble)
        case (None, Some(rf)) => graft.core.Ellipsoid(a, a * (1 - 1 / rf.toDouble))
        case _ => graft.core.Ellipsoid.sphere(a)
      }
    }
    private val k0 =
      if (p.contains("k_0") || p.contains("k")) p.getOrElse("k_0", p("k")).toDouble
      else graft.core.CeaProj.k0Of(p.get("lat_ts").map(_.toDouble).getOrElse(0.0), crsEll)
    private val lon0 = p.get("lon_0").map(_.toDouble).getOrElse(0.0)
    private val AL = slit(crsEll.a)
    private val K0L = slit(k0)
    private val E2L = slit(crsEll.e2)
    private val EL = slit(crsEll.e)
    private val D2RL = slit(math.Pi / 180.0)
    private val LON0 = slit(lon0)
    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y"): String = {
      // q = (1-e^2) * (s/(1-e^2 s^2) - ln((1-e s)/(1+e s)) / (2 e)),
      // transcribed in ProjMath.qOf's association order
      val q = if (crsEll.isSphere) "2.0 * _s"
      else s"(1.0 - $E2L) * (_s / (1.0 - $E2L * _s * _s) - (1.0 / (2.0 * $EL)) * LN((1.0 - $EL * _s) / (1.0 + $EL * _s)))"
      s"""${pfx}a AS (SELECT *, ${wrapSql(s"$lonC - $LON0")} * $D2RL AS _lam, SIN($latC * $D2RL) AS _s FROM $src),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")}, $AL * $K0L * _lam AS $outX,
               $AL * ($q) / (2.0 * $K0L) AS $outY FROM ${pfx}a)"""
    }
  }

  /** Rotated-pole forward twin — `graft.core.RotatedPoleProj` (the CF
    * `rotated_latitude_longitude` mapping, r10): pure spherical rotation,
    * trig of data-dependent values only — the sin/cos of the pole
    * latitude are JVM-baked literals, the atan2/asin drift is ~1 ulp of a
    * degree against half-degree cells. */
  final case class ObTranSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "ob_tran", s"not an ob_tran area: ${p("proj")}")
    private val poleLat = p("o_lat_p").toDouble
    private val poleLon = graft.core.Projection.wrapLonDeg(
      p.get("lon_0").map(_.toDouble).getOrElse(0.0) - 180.0)
    private val gridLon = p.get("o_lon_p").map(_.toDouble).getOrElse(0.0)
    private val SP = slit(math.sin(poleLat * math.Pi / 180.0))
    private val CP = slit(math.cos(poleLat * math.Pi / 180.0))
    private val D2RL = slit(math.Pi / 180.0)
    private val R2DL = slit(180.0 / math.Pi)
    private val PLON = slit(poleLon)
    private val GLON = slit(gridLon)
    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y"): String =
      s"""${pfx}a AS (SELECT *, ($lonC - $PLON) * $D2RL AS _dl, $latC * $D2RL AS _phi FROM $src),
      ${pfx}b AS (SELECT *, COS(_phi) AS _cf, SIN(_phi) AS _sf, COS(_dl) AS _cd, SIN(_dl) AS _sd FROM ${pfx}a),
      ${pfx}c AS (SELECT *, _cf * _cd * $SP - _sf * $CP AS _x2, _cf * _sd AS _y2,
                  _cf * _cd * $CP + _sf * $SP AS _z2 FROM ${pfx}b),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")},
               ${wrapSql(s"ATAN2(-_y2, -_x2) * $R2DL + $GLON")} AS $outX,
               ASIN(LEAST(1.0, GREATEST(-1.0, _z2))) * $R2DL AS $outY FROM ${pfx}c)"""
  }

  /** Orthographic forward twin — `graft.core.OrthoProj` (spherical). The
    * caller must keep the source inside the near hemisphere (the bucket
    * query's area reduction does); far-side rows would be NaN in the
    * engine and unprojected junk here. */
  final case class OrthoSql(area: AreaDef) {
    private val p = area.crs.params
    require(p("proj") == "ortho", s"not an ortho area: ${p("proj")}")
    private val r = (p.get("R"), p.get("a")) match {
      case (Some(rr), _) => rr.toDouble
      case (None, Some(a)) if !p.contains("b") && !p.contains("rf") => a.toDouble
      case _ => throw new IllegalArgumentException("oracle twin covers the sphere")
    }
    private val lon0 = p.get("lon_0").map(_.toDouble).getOrElse(0.0)
    private val lat0 = p.get("lat_0").map(_.toDouble).getOrElse(0.0)
    private val phi0 = lat0 * (math.Pi / 180.0)
    private val RL = slit(r)
    private val SP0 = slit(math.sin(phi0)); private val CP0 = slit(math.cos(phi0))
    private val D2RL = slit(math.Pi / 180.0)
    private val LON0 = slit(lon0)
    def fwdCtes(pfx: String, src: String, keep: Seq[String],
        lonC: String = "lon", latC: String = "lat",
        outX: String = "proj_x", outY: String = "proj_y"): String =
      s"""${pfx}a AS (SELECT *, ${wrapSql(s"$lonC - $LON0")} * $D2RL AS _lam, $latC * $D2RL AS _phi FROM $src),
      ${pfx}b AS (SELECT *, SIN(_phi) AS _sp, COS(_phi) AS _cp, SIN(_lam) AS _sl, COS(_lam) AS _cl FROM ${pfx}a),
      ${pfx}c AS (SELECT * FROM ${pfx}b WHERE $SP0 * _sp + $CP0 * _cp * _cl >= 0),
      $pfx AS MATERIALIZED (SELECT ${keep.mkString(", ")}, ($RL * _cp) * _sl AS $outX,
               $RL * ($CP0 * _sp - $SP0 * _cp * _cl) AS $outY FROM ${pfx}c)"""
  }
}
