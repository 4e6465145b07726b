package graft.operators

import graft.core.AreaDef
import graft.functions.GeoFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gradient-search resampling, Spark-native formulation (J8).
  *
  * The reference walks the source grid with Newton iterations on the local
  * Jacobian to find fractional (line, pixel) indices per target pixel
  * (`gradient/_gradient_search.pyx:104-231`). That trick approximates the
  * inverse projection for topologically regular grids; with an exact
  * CRS kernel we compute the fractional indices directly:
  * target pixel -> lon/lat -> forward-project into the SOURCE area ->
  * fractional (row, col) -> 4-corner equi-join gather + bilinear blend
  * (`block_bilinear_interpolator`, `gradient/__init__.py:362-382`) or
  * nearest rounding (`block_nn_interpolator:385-393`).
  *
  * Documented deviation (SURVEY §7.4): at pixels where the reference's
  * Newton walk fails to converge in 5 steps it yields fill; the exact
  * inverse has no such failure mode.
  *
  * Scale: the only data-plane operation is an equi-join of target rows
  * against the source grid keyed by cell id — broadcastable when the source
  * tile is small, hash join otherwise. No radius search at all.
  */
object GradientResample {

  /** Add fractional source-grid coordinates (src_col, src_row) to target
    * pixel rows carrying lon/lat. */
  def withFractionalIndices(targets: DataFrame, srcArea: AreaDef): DataFrame = {
    val projected = withProjected(targets, srcArea.crs)
    projected
      .withColumn("src_col", fracCol(srcArea, col("proj_x")))
      .withColumn("src_row", fracRow(srcArea, col("proj_y")))
      .drop("proj_x", "proj_y")
  }

  /** Area -> area nearest: round fractional indices to the covering source
    * pixel and gather by equi-join. */
  def nearest(
      sourceCells: DataFrame, // (cell, value...)
      srcArea: AreaDef,
      dstArea: AreaDef): DataFrame = {
    val spark = sourceCells.sparkSession
    val tgt = withFractionalIndices(
      dstArea.grid(spark, withLonLat = true).select(col("cell").as("dst_id"), col("lon"), col("lat")),
      srcArea)
    tgt
      .withColumn("_c", floor(col("src_col")).cast("long"))
      .withColumn("_r", floor(col("src_row")).cast("long"))
      .filter(col("_c") >= 0 && col("_c") < srcArea.width && col("_r") >= 0 && col("_r") < srcArea.height)
      .withColumn("cell", col("_r") * srcArea.width + col("_c"))
      .join(sourceCells, Seq("cell"), "left")
      .drop("_c", "_r", "src_col", "src_row")
  }

  /** Area -> area bilinear: blend the 4 surrounding source pixels with
    * weights from the fractional offsets. Pixel centres sit at
    * (i + 0.5), so the west/north neighbour is floor(frac - 0.5). */
  def bilinear(
      sourceCells: DataFrame, // (cell, value)
      srcArea: AreaDef,
      dstArea: AreaDef,
      valueCol: String = "value"): DataFrame = {
    val spark = sourceCells.sparkSession
    val tgt = withFractionalIndices(
      dstArea.grid(spark, withLonLat = true).select(col("cell").as("dst_id"), col("lon"), col("lat")),
      srcArea)
      .withColumn("c0", floor(col("src_col") - lit(0.5)).cast("long"))
      .withColumn("r0", floor(col("src_row") - lit(0.5)).cast("long"))
      .withColumn("fc", col("src_col") - lit(0.5) - col("c0"))
      .withColumn("fr", col("src_row") - lit(0.5) - col("r0"))
      // interior targets only: all 4 neighbours must exist
      .filter(col("c0") >= 0 && col("c0") < srcArea.width - 1 &&
        col("r0") >= 0 && col("r0") < srcArea.height - 1)

    val v = sourceCells.select(col("cell"), col(valueCol).as("_v"))
    val w = srcArea.width
    tgt
      .withColumn("cell00", col("r0") * w + col("c0"))
      .withColumn("cell01", col("r0") * w + col("c0") + 1)
      .withColumn("cell10", (col("r0") + 1) * w + col("c0"))
      .withColumn("cell11", (col("r0") + 1) * w + col("c0") + 1)
      .join(v.withColumnRenamed("cell", "cell00").withColumnRenamed("_v", "v00"), "cell00")
      .join(v.withColumnRenamed("cell", "cell01").withColumnRenamed("_v", "v01"), "cell01")
      .join(v.withColumnRenamed("cell", "cell10").withColumnRenamed("_v", "v10"), "cell10")
      .join(v.withColumnRenamed("cell", "cell11").withColumnRenamed("_v", "v11"), "cell11")
      .select(col("dst_id"),
        (col("v00") * (lit(1.0) - col("fc")) * (lit(1.0) - col("fr")) +
          col("v01") * col("fc") * (lit(1.0) - col("fr")) +
          col("v10") * (lit(1.0) - col("fc")) * col("fr") +
          col("v11") * col("fc") * col("fr")).as(valueCol))
  }
}
