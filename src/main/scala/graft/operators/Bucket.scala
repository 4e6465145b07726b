package graft.operators

import graft.core.AreaDef
import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket resampling — the Spark-native form of
  * `pyresample/bucket/__init__.py` (BucketResampler). Each statistic is one
  * `groupBy(cell)` hash aggregation: partial (map-side) + final combine, so
  * the only shuffle is on the cell id and it scales linearly with source
  * rows. The target grid is *generated*, never stored; empty buckets are
  * filled by a right join against the generated grid (broadcast the agg side
  * when small — Spark AQE handles that choice).
  *
  * Null handling mirrors the reference: NaN/null are "invalid"
  * (`bucket/__init__.py:472-477`); with `skipna=true` (default) invalid
  * values are ignored per-bucket; with `skipna=false` any invalid value
  * poisons its whole bucket (`:261-267`).
  */
final case class BucketResampler(area: AreaDef) {

  /** A1 (`bucket/__init__.py:168-203`): project + legal filter + flat cell
    * id; rows outside the grid are dropped (reference masks them to -1). */
  def withCell(swath: DataFrame, lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val projected = withProjected(
      swath.filter(legalLonLat(col(lonCol), col(latCol))), area.crs, lonCol, latCol)
    projected
      .withColumn("cell", cellIndex(area, col("proj_x"), col("proj_y")))
      .filter(col("cell") >= 0)
  }

  private def invalid(v: Column): Column = v.isNull || isnan(v)

  /** A2: hits per cell (`:374-392`). */
  def count(swath: DataFrame, lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    withCell(swath, lonCol, latCol).groupBy("cell").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))

  /** A3: per-cell sum (`:205-259`). */
  def sum(swath: DataFrame, valueCol: String, skipna: Boolean = true): DataFrame = {
    val df = withCell(swath)
    val v = col(valueCol)
    if (skipna)
      df.groupBy("cell").agg(org.apache.spark.sql.functions.sum(when(invalid(v), lit(0.0)).otherwise(v)).as("sum"))
    else
      df.groupBy("cell")
        .agg(
          org.apache.spark.sql.functions.sum(when(invalid(v), lit(0.0)).otherwise(v)).as("_s"),
          max(when(invalid(v), 1).otherwise(0)).as("_bad"))
        .withColumn("sum", when(col("_bad") === 1, lit(Double.NaN)).otherwise(col("_s")))
        .drop("_s", "_bad")
  }

  /** A4: per-cell mean of valid values (`:394-429`). */
  def average(swath: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val clean = when(invalid(v), lit(null)).otherwise(v)
    withCell(swath)
      .groupBy("cell")
      .agg(
        org.apache.spark.sql.functions.sum(clean).as("_s"),
        org.apache.spark.sql.functions.count(clean).as("_n"))
      .withColumn("avg", col("_s") / col("_n"))
      .drop("_s", "_n")
  }

  /** A5: per-cell min/max (`:269-332`). */
  def minMax(swath: DataFrame, valueCol: String, skipna: Boolean = true): DataFrame = {
    val v = col(valueCol)
    val clean = when(invalid(v), lit(null)).otherwise(v)
    val base = withCell(swath)
      .groupBy("cell")
      .agg(
        org.apache.spark.sql.functions.min(clean).as("_min"),
        org.apache.spark.sql.functions.max(clean).as("_max"),
        max(when(invalid(v), 1).otherwise(0)).as("_bad"))
    val (mn, mx) =
      if (skipna) (col("_min"), col("_max"))
      else (
        when(col("_bad") === 1, lit(Double.NaN)).otherwise(col("_min")),
        when(col("_bad") === 1, lit(Double.NaN)).otherwise(col("_max")))
    base.withColumn("min", mn).withColumn("max", mx).drop("_min", "_max", "_bad")
  }

  /** A6: signed value of the largest |v| per cell (`:334-372`). */
  def absMax(swath: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    withCell(swath)
      .filter(!invalid(v))
      .groupBy("cell")
      .agg(max_by(v, abs(v)).as("abs_max"))
  }

  /** A7: per-cell fraction of each category (`:431-469`). Output long form
    * (cell, category, fraction) — a pivot would bake categories into the
    * schema; long form scales to any category count. */
  def fractions(swath: DataFrame, catCol: String): DataFrame = {
    val withC = withCell(swath)
    val totals = withC.groupBy("cell").agg(org.apache.spark.sql.functions.count(lit(1)).as("_tot"))
    withC
      .groupBy("cell", catCol)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("_n"))
      .join(totals, "cell")
      .withColumn("fraction", col("_n").cast("double") / col("_tot").cast("double"))
      .drop("_n", "_tot")
  }

  /** Expand an aggregated (cell, stat...) table onto the full target grid,
    * filling empty buckets — the `full_result` scatter of the reference
    * (`kd_tree.py:721-722` analog). Right join on the generated grid: no
    * shuffle on the grid side beyond the join's own exchange. */
  def toGrid(agg: DataFrame, fill: Column = lit(null)): DataFrame = {
    val spark = agg.sparkSession
    val grid = area.grid(spark).select("cell", "y", "x")
    val statCols = agg.columns.filterNot(_ == "cell")
    val joined = grid.join(agg, Seq("cell"), "left")
    statCols.foldLeft(joined) { (df, c) => df.withColumn(c, coalesce(col(c), fill)) }
  }
}
