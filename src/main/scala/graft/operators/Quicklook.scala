package graft.operators

import java.awt.image.BufferedImage

/** `save_quicklook` (`pyresample/plot.py:308`) minus the cartopy map
  * underlay (out of scope offline — S10): render a resampled area image
  * to PNG with the reference's luminance contract — `vmin`/`vmax`
  * scaling, masked (absent) cells transparent, `RdBu_r` default
  * colormap — via `javax.imageio`, no native deps.
  *
  * Driver-side BY DESIGN: a quicklook is a bounded visualization of an
  * area grid (the reference materializes the same full ndarray into
  * matplotlib). The distributed part — resampling 100 TB of swath onto
  * the grid — happens upstream in the containers/operators; this sink
  * collects exactly width*height pixels. Oversized grids should
  * `AreaDef.aggregate` first. */
object Quicklook {

  /** Driver-side pixel budget: render collects width*height cells BY
    * DESIGN (it is a visualization sink), so a 100x-scale caller must
    * hit a one-line error, not a driver OOM. 64 MPx ~ 0.5-1 GB of
    * collected rows — generous for any screen, far under driver heap. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** The full 11-class ColorBrewer RdBu palette (public), reversed:
    * `RdBu_r` runs dark blue (low) -> near-white -> dark red (high),
    * matching the reference's default `cmap='RdBu_r'` family. */
  private val RdBuR = Seq(
    (5, 48, 97), (33, 102, 172), (67, 147, 195), (146, 197, 222),
    (209, 229, 240), (247, 247, 247), (253, 219, 199), (244, 165, 130),
    (214, 96, 77), (178, 24, 43), (103, 0, 31))
  private val Gray = Seq((0, 0, 0), (255, 255, 255))

  private def ramp(anchors: Seq[(Int, Int, Int)], t: Double): Int = {
    val tt = math.max(0.0, math.min(1.0, t))
    val seg = tt * (anchors.length - 1)
    val i = math.min(anchors.length - 2, seg.toInt)
    val f = seg - i
    val (r0, g0, b0) = anchors(i); val (r1, g1, b1) = anchors(i + 1)
    def mix(a: Int, b: Int): Int = math.round(a + (b - a) * f).toInt
    0xFF000000 | (mix(r0, r1) << 16) | (mix(g0, g1) << 8) | mix(b0, b1)
  }

  /** Render one channel of an area image. Cells absent from the data are
    * transparent (the masked-array contract); `vmin`/`vmax` default to
    * the data extrema like matplotlib's imshow. */
  def render(
      image: AreaImage,
      channel: String,
      vmin: Option[Double] = None,
      vmax: Option[Double] = None,
      cmap: String = "RdBu_r"): BufferedImage = {
    require(image.channels.contains(channel), s"no channel '$channel' in ${image.channels}")
    require(image.area.size <= MaxPixels,
      s"quicklook of ${image.area.width}x${image.area.height} = ${image.area.size} px exceeds " +
        s"the $MaxPixels-px driver-side render budget; aggregate the area first " +
        s"(AreaDef.aggregate / GeometryOps.aggregate) or render a slice (Slicer)")
    val anchors = cmap match {
      case "RdBu_r" => RdBuR
      case "gray" | "grey" => Gray
      case other => throw new IllegalArgumentException(
        s"unsupported cmap '$other' (RdBu_r, gray)")
    }
    val area = image.area
    val rows = image.data
      .select(org.apache.spark.sql.functions.col("cell").cast("long"),
        org.apache.spark.sql.functions.col(channel).cast("double"))
      .collect()
    val lo = vmin.getOrElse(rows.iterator.filterNot(_.isNullAt(1)).map(_.getDouble(1))
      .foldLeft(Double.PositiveInfinity)(math.min))
    val hi = vmax.getOrElse(rows.iterator.filterNot(_.isNullAt(1)).map(_.getDouble(1))
      .foldLeft(Double.NegativeInfinity)(math.max))
    val span = if (hi > lo) hi - lo else 1.0
    val img = new BufferedImage(area.width, area.height, BufferedImage.TYPE_INT_ARGB)
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        val cell = r.getLong(0)
        val xPix = (cell % area.width).toInt
        val yPix = (cell / area.width).toInt
        if (yPix >= 0 && yPix < area.height && xPix >= 0)
          img.setRGB(xPix, yPix, ramp(anchors, (r.getDouble(1) - lo) / span))
      }
    }
    img
  }

  /** Graticule overlay — the offline-feasible analog of the reference's
    * cartopy map underlay (`plot.py:308` draws coastlines via cartopy,
    * which needs that library and its shapefiles; meridians/parallels
    * are pure projection math). Forward-projects each meridian/parallel
    * polyline into pixel space and alpha-blends it over the rendered
    * raster. Off-domain vertices (geos off-disk, ortho far side) and
    * projection discontinuities (date-line wraps) break the polyline
    * instead of drawing artifacts. */
  def drawGraticule(
      img: BufferedImage,
      area: graft.core.AreaDef,
      stepDeg: Double = 30.0,
      argb: Int = 0x50000000): Unit = {
    require(stepDeg > 0, "stepDeg must be positive")
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(argb, true))
      val maxJump = math.max(img.getWidth, img.getHeight) / 2.0
      def toPix(lon: Double, lat: Double): Option[(Double, Double)] = {
        val (x, y) = area.crs.forward(lon, lat)
        if (x.isNaN || y.isNaN) None
        else Some(((x - area.xLL) / area.pixelSizeX, (area.yUR - y) / area.pixelSizeY))
      }
      def polyline(pts: Iterator[(Double, Double)]): Unit = {
        var prev: Option[(Double, Double)] = None
        pts.foreach { ll =>
          val cur = toPix(ll._1, ll._2)
          (prev, cur) match {
            case (Some((x0, y0)), Some((x1, y1)))
                if math.hypot(x1 - x0, y1 - y0) <= maxJump =>
              g.drawLine(math.round(x0).toInt, math.round(y0).toInt,
                math.round(x1).toInt, math.round(y1).toInt)
            case _ => // domain break or wrap: lift the pen
          }
          prev = cur
        }
      }
      val fine = math.min(stepDeg / 10.0, 1.0)
      var lon = -180.0
      while (lon <= 180.0 + 1e-9) { // meridians
        polyline(Iterator.iterate(-90.0)(_ + fine).takeWhile(_ <= 90.0 + 1e-9).map((lon, _)))
        lon += stepDeg
      }
      var lat = -90.0 + stepDeg
      while (lat <= 90.0 - stepDeg + 1e-9) { // parallels (poles are points)
        polyline(Iterator.iterate(-180.0)(_ + fine).takeWhile(_ <= 180.0 + 1e-9).map((_, lat)))
        lat += stepDeg
      }
    } finally g.dispose()
  }

  /** [[render]] + [[drawGraticule]] in one call. */
  def renderWithGraticule(
      image: AreaImage,
      channel: String,
      stepDeg: Double = 30.0,
      vmin: Option[Double] = None,
      vmax: Option[Double] = None,
      cmap: String = "RdBu_r"): BufferedImage = {
    val img = render(image, channel, vmin, vmax, cmap)
    drawGraticule(img, image.area, stepDeg)
    img
  }

  /** save_quicklook: render + PNG-encode to `path`. */
  def save(
      path: String,
      image: AreaImage,
      channel: String,
      vmin: Option[Double] = None,
      vmax: Option[Double] = None,
      cmap: String = "RdBu_r"): Unit = {
    val img = render(image, channel, vmin, vmax, cmap)
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    require(javax.imageio.ImageIO.write(img, "png", f), s"no PNG writer for $path")
  }
}
