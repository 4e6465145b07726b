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
      * is floor-binning with cells >> 1e-9 m). */
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
      $pfx AS (SELECT ${keep.mkString(", ")}, $xE AS $outX, $yE AS $outY FROM ${pfx}e)"""
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
      $pfx AS (SELECT ${keep.mkString(", ")}, ${wrap(s"$LON0 + _lamv * $R2DL")} AS $outLon, _it$iters * $R2DL AS $outLat FROM ${pfx}i$iters)"""
    }
  }
}
