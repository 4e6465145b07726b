package graft.operators

import graft.core.AreaDef
import graft.functions.GeoFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quick linesample (`pyresample/grid.py:91-128` + `utils/__init__.py:71`):
  * nearest-neighbour gather by *projection*, not search — each target point
  * is forward-projected into the source grid's (row, col) space and the
  * covering source pixel is taken by equi-join. No radius, no kd-tree: a
  * plain hash join keyed by cell id (broadcast when the source grid is
  * small). This is the fastest resampler and the model for J9.
  */
object Linesample {

  /** Gather from a source grid table `sourceCells(cell, value...)` defined on
    * `area`, for each target point (dst_id, lon, lat). Left join: targets
    * whose pixel is empty/outside keep NULL values
    * (`grid.py:60-73` fill behaviour). */
  def sample(
      targets: DataFrame,
      area: AreaDef,
      sourceCells: DataFrame): DataFrame = {
    val projected = withProjected(
      targets.filter(legalLonLat(col("lon"), col("lat"))), area.crs)
    projected
      .withColumn("cell", cellIndex(area, col("proj_x"), col("proj_y")))
      .join(sourceCells, Seq("cell"), "left")
      .drop("proj_x", "proj_y")
  }
}
