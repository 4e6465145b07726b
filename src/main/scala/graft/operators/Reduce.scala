package graft.operators

import graft.core.AreaDef
import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarse data reduction — predicate pushdown of the target's footprint onto
  * the source swath, the Spark form of `pyresample/data_reduce.py:224-307`
  * (swath_from_lonlat_grid + the bbox filters at `:276-305`).
  *
  * The predicate is computed on the driver from the target AreaDef and
  * injected as a plain `filter`, so Catalyst pushes it into the Parquet scan
  * (row-group skipping) — this is the single most important scan-side
  * optimization at 100 TB: source rows outside the (buffered) target bbox
  * never leave the scan.
  */
object DataReduce {

  /** Buffered lat/lon bbox predicate with date-line split — the OR of
    * `data_reduce.py:296-300`. `lonWest > lonEast` means the box crosses the
    * antimeridian. */
  def bboxPredicate(
      lon: Column, lat: Column,
      lonWest: Double, latMin: Double, lonEast: Double, latMax: Double): Column = {
    val latOk = lat.between(latMin, latMax)
    val lonOk =
      if (lonWest <= lonEast) lon.between(lonWest, lonEast)
      else (lon >= lonWest) || (lon <= lonEast)
    latOk && lonOk
  }

  /** Driver-side bounds of [[reduceToArea]]'s predicate, exposed so an
    * external SQL oracle can bake the *identical* constants.
    * Left((latLo, latHi)) = pole/wide case, a latitude band only;
    * Right((lonW, latLo, lonE, latHi)) = the buffered bbox. */
  def reducedBounds(area: AreaDef, radiusMetres: Double)
      : Either[(Double, Double), (Double, Double, Double, Double)] = {
    val (lonMin, latMin, lonMax, latMax) = area.lonLatBBox()
    val latBuf = radiusMetres / 111320.0
    val maxAbsLat = math.min(89.0, math.max(math.abs(latMin), math.abs(latMax)) + latBuf)
    val lonBuf = latBuf / math.cos(maxAbsLat * math.Pi / 180)
    // pole-covering targets degrade to a latitude band (pole case of
    // `data_reduce.py:289-295`)
    if (latMax + latBuf >= 89.5 || latMin - latBuf <= -89.5 || (lonMax - lonMin) > 330)
      Left((math.max(-90, latMin - latBuf), math.min(90, latMax + latBuf)))
    else
      Right((Projection2.wrap(lonMin - lonBuf), math.max(-90, latMin - latBuf),
        Projection2.wrap(lonMax + lonBuf), math.min(90, latMax + latBuf)))
  }

  /** Reduce a swath to points that can influence the target area, with
    * `radius` metres of buffer converted to degrees at the worst-case
    * latitude (mirrors the buffering in `data_reduce.py:264-275`). */
  def reduceToArea(swath: DataFrame, area: AreaDef, radiusMetres: Double,
      lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    reducedBounds(area, radiusMetres) match {
      case Left((latLo, latHi)) =>
        swath.filter(col(latCol).between(latLo, latHi))
      case Right((w, latLo, e, latHi)) =>
        swath.filter(bboxPredicate(col(lonCol), col(latCol), w, latLo, e, latHi))
    }

  private object Projection2 {
    def wrap(lon: Double): Double = lon - 360.0 * math.floor((lon + 180.0) / 360.0)
  }

  /** GridFilter (`pyresample/geo_filter.py:50-105`): keep swath points whose
    * cell in `area` is present in the boolean mask table `maskCells(cell)`.
    * A left-semi join — broadcast when the mask is small. */
  def gridFilter(swath: DataFrame, area: AreaDef, maskCells: DataFrame): DataFrame = {
    val withCell = BucketResampler(area).withCell(swath)
    withCell.join(maskCells.select("cell"), Seq("cell"), "left_semi")
  }
}
