package graft.operators

import graft.core.{AreaDef, Spherical}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SwathSlicer — the Spark form of `pyresample/slicer.py:94-160`
  * (SwathSlicer + _get_chunk_bboxes_for_swath_to_crop + _assemble_slices).
  *
  * The reference walks the swath's dask chunks, builds each chunk's edge
  * polygon, keeps chunks whose polygon intersects the target's polygon, and
  * assembles one (row, col) slice. Spark-native form: one aggregation
  * computes every block's (y, x, lon, lat) bounds; the (tiny) block table is
  * collected and intersected with the target polygon on the driver; the
  * assembled rectangle comes back as a plain range predicate — exactly the
  * shape Catalyst pushes into a Parquet scan (row-group pruning on the y/x
  * column statistics), so at 100 TB the cropped-away blocks are never read.
  */
object SwathSlicer {

  /** Per-block bounds of a gridded swath: one row per (blockRows x
    * blockCols) tile with index and lon/lat extents. One shuffle on the
    * (tiny) block key. */
  def blockBounds(swath: DataFrame, blockRows: Int, blockCols: Int,
      yCol: String = "y", xCol: String = "x",
      lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    swath
      .groupBy(
        floor(col(yCol) / lit(blockRows)).cast("long").as("by"),
        floor(col(xCol) / lit(blockCols)).cast("long").as("bx"))
      .agg(
        min(col(yCol)).cast("long").as("y0"), max(col(yCol)).cast("long").as("y1"),
        min(col(xCol)).cast("long").as("x0"), max(col(xCol)).cast("long").as("x1"),
        min(col(lonCol).cast("double")).as("lon_min"), max(col(lonCol).cast("double")).as("lon_max"),
        min(col(latCol).cast("double")).as("lat_min"), max(col(latCol).cast("double")).as("lat_max"))

  /** Does a lon/lat bounding box intersect the target's footprint?
    * Lon/lat targets: exact planar bbox overlap against the extent.
    * Projected targets: spherical polygon intersection of the bbox outline
    * with the target's boundary polygon (`slicer.py:115-117`). */
  private def bboxIntersectsTarget(
      target: AreaDef,
      lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
      targetPoly: => Spherical.SphPolygon): Boolean =
    if (target.crs.isLonLat)
      lonMin <= target.xUR && lonMax >= target.xLL &&
        latMin <= target.yUR && latMax >= target.yLL
    else {
      // clockwise outline, matching AreaDef.boundaryPolygon's convention
      val box = Spherical.SphPolygon.fromDegrees(Seq(
        (lonMin, latMax), (lonMax, latMax), (lonMax, latMin), (lonMin, latMin)))
      box.overlaps(targetPoly)
    }

  /** The assembled (rowStart, rowEnd, colStart, colEnd) — inclusive — of
    * blocks whose bbox intersects the target, expanded by one pixel
    * (`slicer.py:157-159` expand_slice + `:122-128` _assemble_slices).
    * None when nothing intersects (`IncompatibleAreas`).
    *
    * Lon/lat targets run fully distributed (the planar overlap test is a
    * filter + one min/max aggregation — no block collect, any swath size).
    * Projected targets need the spherical polygon test per block, so the
    * block table is collected — bounded by (grid size / block size)²;
    * raise blockRows/blockCols for very large swaths. */
  def sliceBounds(swath: DataFrame, target: AreaDef,
      blockRows: Int = 32, blockCols: Int = 32,
      yCol: String = "y", xCol: String = "x",
      lonCol: String = "lon", latCol: String = "lat"): Option[(Long, Long, Long, Long)] = {
    val blocks = blockBounds(swath, blockRows, blockCols, yCol, xCol, lonCol, latCol)
    if (target.crs.isLonLat) {
      val hit = blocks.filter(
        col("lon_min") <= target.xUR && col("lon_max") >= target.xLL &&
          col("lat_min") <= target.yUR && col("lat_max") >= target.yLL)
      val r = hit.agg(min("y0"), max("y1"), min("x0"), max("x1")).head()
      if (r.isNullAt(0)) None
      else Some((r.getLong(0) - 1, r.getLong(1) + 1, r.getLong(2) - 1, r.getLong(3) + 1))
    } else {
      val collected = blocks.collect()
      lazy val targetPoly = target.boundaryPolygon()
      val hits = collected.filter { r =>
        bboxIntersectsTarget(target,
          r.getAs[Double]("lon_min"), r.getAs[Double]("lat_min"),
          r.getAs[Double]("lon_max"), r.getAs[Double]("lat_max"), targetPoly)
      }
      if (hits.isEmpty) None
      else Some((
        hits.map(_.getAs[Long]("y0")).min - 1, hits.map(_.getAs[Long]("y1")).max + 1,
        hits.map(_.getAs[Long]("x0")).min - 1, hits.map(_.getAs[Long]("x1")).max + 1))
    }
  }

  /** Crop the swath to the assembled slice — a pushdown-friendly range
    * filter on the grid indices; empty frame when footprints are disjoint. */
  def slice(swath: DataFrame, target: AreaDef,
      blockRows: Int = 32, blockCols: Int = 32,
      yCol: String = "y", xCol: String = "x",
      lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    sliceBounds(swath, target, blockRows, blockCols, yCol, xCol, lonCol, latCol) match {
      case None => swath.limit(0)
      case Some((r0, r1, c0, c1)) =>
        swath.filter(col(yCol).between(r0, r1) && col(xCol).between(c0, c1))
    }
}
