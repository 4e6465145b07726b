package graft.operators

import graft.core.AreaDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ImageContainer facade — the Spark form of `pyresample/image.py`: couple
  * a pixel table with its geometry and expose `resample(target)` in the
  * reference's three flavours (Quick / Nearest / Bilinear). The containers
  * are thin, immutable wrappers over the existing operators; resampling
  * returns a new area-based container on the target geometry, so calls
  * chain like the reference's (`image.py:98-101` resample contract).
  *
  * Data model: area images are (cell, channels...); swath images are
  * (src_id, lon, lat, channels...). `fillValue` mirrors the reference's
  * `fill_value` (None keeps empty cells absent; Some(v) scatters onto the
  * full grid with v in the holes — `image.py:57` / `grid.py:60-73`).
  */
final case class AreaImage(data: DataFrame, area: AreaDef, channels: Seq[String]) {
  /** Expand onto the full target grid, filling empty cells (`fill_value`). */
  def filled(fillValue: Column): DataFrame =
    BucketResampler(area).toGrid(data.select(("cell" +: channels).map(col): _*), fillValue)
}

final case class SwathImage(data: DataFrame, channels: Seq[String])

/** `image.py:133-200` (ImageContainerQuick): area->area nearest by
  * projection arithmetic (J9 linesample), no search. */
final class ImageContainerQuick(val image: AreaImage) {
  def resample(target: AreaDef): AreaImage = {
    val spark = image.data.sparkSession
    val tgt = target.grid(spark, withLonLat = true)
      .select(col("cell").as("dst_id"), col("lon"), col("lat"))
    val out = Linesample.sample(tgt, image.area, image.data)
      .select(("dst_id" +: image.channels).map(col): _*)
      .withColumnRenamed("dst_id", "cell")
    AreaImage(out, target, image.channels)
  }
}

/** `image.py:203-280` (ImageContainerNearest): swath->area kd-tree nearest
  * within `radius`, with the reference's `reduce_data` pre-crop. */
final class ImageContainerNearest(
    val image: SwathImage,
    radiusOfInfluence: Double,
    reduceData: Boolean = true) {
  def resample(target: AreaDef): AreaImage = {
    val spark = image.data.sparkSession
    val src =
      if (reduceData) DataReduce.reduceToArea(image.data, target, radiusOfInfluence)
      else image.data
    val tgt = target.grid(spark, withLonLat = true)
      .select(col("cell").as("dst_id"), col("lon"), col("lat"))
    val out = KnnResample.nearest(src, tgt, radiusOfInfluence, image.channels)
      .withColumnRenamed("dst_id", "cell")
    AreaImage(out, target, image.channels)
  }
}

/** `image.py:283-342` (ImageContainerBilinear): swath->area bilinear. */
final class ImageContainerBilinear(
    val image: SwathImage,
    radiusOfInfluence: Double,
    reduceData: Boolean = true) {
  def resample(target: AreaDef): AreaImage = {
    require(image.channels.size == 1,
      "bilinear container resamples one channel (reference semantics: per-band)")
    val src =
      if (reduceData) DataReduce.reduceToArea(image.data, target, radiusOfInfluence)
      else image.data
    val out = BilinearResample
      .resample(src, target, radiusOfInfluence, valueCol = image.channels.head)
      .withColumnRenamed("dst_id", "cell")
    AreaImage(out, target, image.channels)
  }
}
