package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform projected grid — the Spark-native analog of
  * `pyresample/geometry.py:1510` (AreaDefinition). Pure metadata: the pixel
  * table is *generated* on demand (`spark.range`), never stored, mirroring
  * the lazy lon/lat derivation at `geometry.py:2558-2645`.
  *
  * extent = (xLL, yLL, xUR, yUR) in projection metres
  * (`geometry.py:1593-1595`); pixel (0,0) is the upper-left cell, row-major.
  */
final case class AreaDef(
    id: String,
    crs: Crs,
    width: Int,
    height: Int,
    xLL: Double,
    yLL: Double,
    xUR: Double,
    yUR: Double) {

  require(width > 0 && height > 0, s"bad shape ${width}x$height")

  val pixelSizeX: Double = (xUR - xLL) / width
  val pixelSizeY: Double = (yUR - yLL) / height
  def size: Long = width.toLong * height.toLong
  def extent: (Double, Double, Double, Double) = (xLL, yLL, xUR, yUR)

  /** Projected x of pixel-centre column c (`geometry.py:2407-2488`). */
  def projX(cIdx: Int): Double = xLL + (cIdx + 0.5) * pixelSizeX
  /** Projected y of pixel-centre row r (row 0 at the top). */
  def projY(rIdx: Int): Double = yUR - (rIdx + 0.5) * pixelSizeY

  def lonLatOf(rIdx: Int, cIdx: Int): (Double, Double) =
    crs.inverse(projX(cIdx), projY(rIdx))

  /** Column/row (fractional) of a projected point; floor() gives the cell —
    * the exact arithmetic of `pyresample/bucket/__init__.py:168-203` and
    * EWA ll2cr (`ewa/_ll2cr.pyx:208-272`). */
  def fracCol(x: Double): Double = (x - xLL) / pixelSizeX
  def fracRow(y: Double): Double = (yUR - y) / pixelSizeY

  def contains(x: Double, y: Double): Boolean =
    x >= xLL && x < xUR && y > yLL && y <= yUR

  /** Flat cell id = row * width + col (`bucket/__init__.py:200`: ravel). */
  def cellOf(x: Double, y: Double): Long = {
    val cIdx = math.floor(fracCol(x)).toLong
    val rIdx = math.floor(fracRow(y)).toLong
    if (cIdx < 0 || cIdx >= width || rIdx < 0 || rIdx >= height) -1L
    else rIdx * width + cIdx
  }

  /** Materialize the pixel grid as rows (y, x, proj_x, proj_y, cell
    * [, lon, lat]). Generated arithmetically from `spark.range` — no data
    * movement, partitions evenly, scales to any grid size. */
  def grid(spark: SparkSession, withLonLat: Boolean = false): DataFrame = {
    val base = spark
      .range(size)
      .withColumn("y", (col("id") / width).cast("int"))
      .withColumn("x", (col("id") % width).cast("int"))
      .withColumn("proj_x", lit(xLL) + (col("x") + lit(0.5)) * lit(pixelSizeX))
      .withColumn("proj_y", lit(yUR) - (col("y") + lit(0.5)) * lit(pixelSizeY))
      .withColumnRenamed("id", "cell")
    if (!withLonLat) base
    else if (crs.isLonLat)
      base.withColumn("lon", col("proj_x")).withColumn("lat", col("proj_y"))
    else
      base
        .withColumn("_ll", graft.functions.ProjectExpr.projectInv(crs, col("proj_x"), col("proj_y")))
        .withColumn("lon", col("_ll.x"))
        .withColumn("lat", col("_ll.y"))
        .drop("_ll")
  }

  /** Shrink by integer factor — `geometry.py:1708-1712` (aggregate). */
  def aggregate(kx: Int, ky: Int): AreaDef =
    copy(id = s"$id/agg${kx}x$ky", width = width / kx, height = height / ky)

  /** Row/col slice — extent arithmetic of `geometry.py:2664-2689`. */
  def slice(rowStart: Int, rowEnd: Int, colStart: Int, colEnd: Int): AreaDef = {
    val r0 = math.max(0, rowStart); val r1 = math.min(height, rowEnd)
    val c0 = math.max(0, colStart); val c1 = math.min(width, colEnd)
    AreaDef(
      s"$id/slice",
      crs,
      c1 - c0,
      r1 - r0,
      xLL + c0 * pixelSizeX,
      yUR - r1 * pixelSizeY,
      xLL + c1 * pixelSizeX,
      yUR - r0 * pixelSizeY)
  }

  /** Lon/lat bounding box of the area outline (sampled boundary), with a
    * buffer in degrees — drives the coarse data-reduction predicate
    * (`pyresample/data_reduce.py:224-307`). */
  def lonLatBBox(samplesPerSide: Int = 50): (Double, Double, Double, Double) = {
    var lonMin = Double.MaxValue; var lonMax = Double.MinValue
    var latMin = Double.MaxValue; var latMax = Double.MinValue
    val n = samplesPerSide
    def visit(x: Double, y: Double): Unit = {
      val (lo, la) = crs.inverse(x, y)
      if (!lo.isNaN && !la.isNaN) {
        if (lo < lonMin) lonMin = lo
        if (lo > lonMax) lonMax = lo
        if (la < latMin) latMin = la
        if (la > latMax) latMax = la
      }
    }
    if (GeosGeometry.isGeostationary(crs)) {
      // a (near-)full-disk geos extent has its entire rectangle boundary
      // off-earth: the footprint outline is the visible disk clipped to the
      // extent (`geometry.py:2811-2863`), not the extent rectangle
      GeosGeometry.diskPolygonInExtent(this, 4 * n)
        .foreach { case (x, y) => visit(x, y) }
    } else {
      var i = 0
      while (i <= n) {
        val fx = xLL + (xUR - xLL) * i / n
        val fy = yLL + (yUR - yLL) * i / n
        visit(fx, yLL); visit(fx, yUR); visit(xLL, fy); visit(xUR, fy)
        i += 1
      }
    }
    // A pole inside the extent never shows on the boundary sweep: the min/max
    // latitude is then at the grid interior and every longitude occurs
    // (the pole case of `data_reduce.py:289-295`).
    Seq(90.0, -90.0).foreach { pole =>
      val (px, py) = crs.forward(0.0, pole)
      if (!px.isNaN && !py.isNaN && contains(px, py)) {
        if (pole > 0) latMax = 90.0 else latMin = -90.0
        lonMin = -180.0; lonMax = 180.0
      }
    }
    (lonMin, latMin, lonMax, latMax)
  }

  /** Crop this (source) area to the part that can influence `target`, with
    * `bufferCells` rows/cols of margin — `pyresample/slicer.py:38-248`
    * (AreaSlicer: target polygon projected into source coordinates, bounds
    * converted to index slices, buffered by one resolution). Returns the
    * sliced AreaDef plus the (rowStart, colStart) offsets into this grid;
    * None when the footprints don't overlap. */
  def cropAround(target: AreaDef, bufferCells: Int = 1): Option[(AreaDef, Int, Int)] = {
    // densified target boundary in the target's own projected space; a
    // geostationary target's real outline is its visible disk
    val n = 25
    val boundaryPts: Seq[(Double, Double)] =
      if (GeosGeometry.isGeostationary(target.crs))
        GeosGeometry.diskPolygonInExtent(target, 4 * n)
      else (0 to 4 * n).map { i =>
        val t = i % n
        (i / n) match {
          case 0 => (target.xLL + (target.xUR - target.xLL) * t / n, target.yUR)
          case 1 => (target.xUR, target.yUR - (target.yUR - target.yLL) * t / n)
          case 2 => (target.xUR - (target.xUR - target.xLL) * t / n, target.yLL)
          case _ => (target.xLL, target.yLL + (target.yUR - target.yLL) * t / n)
        }
      }
    // geostationary source: intersect the target outline with the visible
    // disk IN TARGET COORDINATES before mapping into the source grid
    // (`slicer.py:176-184`). Without this, a target that pokes past the
    // disk edge maps its off-disk corners to NaN and the crop collapses.
    // The disk outline is convex in geos coordinates; after reprojection it
    // is treated as convex by the Sutherland-Hodgman clip — mild
    // reprojection concavity can over-clip by a fraction of a sample step,
    // absorbed by `bufferCells` (the reference's shapely intersection is
    // exact but serves the same +-1-cell slice).
    val effectivePts: Seq[(Double, Double)] =
      if (!GeosGeometry.isGeostationary(crs)) boundaryPts
      else {
        val diskInTarget = GeosGeometry.diskPolygonInExtent(this, 360)
          .map { case (sx, sy) =>
            val (lo, la) = crs.inverse(sx, sy)
            target.crs.forward(lo, la)
          }
          .filterNot(p => p._1.isNaN || p._2.isNaN)
        if (diskInTarget.size < 3) return None // extent entirely off-disk
        GeosGeometry.clipPolygon(boundaryPts, diskInTarget)
      }

    var cMin = Double.MaxValue; var cMax = Double.MinValue
    var rMin = Double.MaxValue; var rMax = Double.MinValue
    effectivePts.foreach { case (tx, ty) =>
      val (lo, la) = target.crs.inverse(tx, ty)
      if (!lo.isNaN && !la.isNaN) {
        val (sx, sy) = crs.forward(lo, la)
        if (!sx.isNaN && !sy.isNaN) {
          val c = fracCol(sx); val r = fracRow(sy)
          if (c < cMin) cMin = c; if (c > cMax) cMax = c
          if (r < rMin) rMin = r; if (r > rMax) rMax = r
        }
      }
    }
    if (cMin > cMax || rMin > rMax) return None
    val c0 = math.max(0, math.floor(cMin).toInt - bufferCells)
    val c1 = math.min(width, math.ceil(cMax).toInt + bufferCells)
    val r0 = math.max(0, math.floor(rMin).toInt - bufferCells)
    val r1 = math.min(height, math.ceil(rMax).toInt + bufferCells)
    if (c0 >= c1 || r0 >= r1) None
    else Some((slice(r0, r1, c0, c1), r0, c0))
  }

  /** Clockwise boundary polygon of the area outline on the sphere, with
    * stride decimation (`boundary/legacy_boundary.py:30-135` + decimate
    * `:105`). Feeds overlap predicates and slicing (J11/U1). */
  def boundaryPolygon(samplesPerSide: Int = 20): Spherical.SphPolygon = {
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val n = math.max(1, samplesPerSide)
    def push(x: Double, y: Double): Unit = {
      val (lo, la) = crs.inverse(x, y)
      if (!lo.isNaN && !la.isNaN) pts += ((lo, la))
    }
    if (GeosGeometry.isGeostationary(crs))
      // visible-disk outline (clipped to the extent); reverse for the
      // clockwise convention (the disk polygon is CCW in proj space)
      GeosGeometry.diskPolygonInExtent(this, 4 * n).reverse
        .foreach { case (x, y) => push(x, y) }
    else {
      // clockwise in projected space: top edge L->R, right T->B, bottom R->L, left B->T
      (0 until n).foreach(i => push(xLL + (xUR - xLL) * i / n, yUR))
      (0 until n).foreach(i => push(xUR, yUR - (yUR - yLL) * i / n))
      (0 until n).foreach(i => push(xUR - (xUR - xLL) * i / n, yLL))
      (0 until n).foreach(i => push(xLL, yLL + (yUR - yLL) * i / n))
    }
    Spherical.SphPolygon.fromDegrees(pts.toSeq)
  }

  /** Spherical overlap test with another area (`geometry.py:540-582`). */
  def overlaps(other: AreaDef): Boolean =
    boundaryPolygon().overlaps(other.boundaryPolygon())

  /** Fraction of this area covered by `other` (`geometry.py:605-620`). */
  def overlapRate(other: AreaDef): Double =
    boundaryPolygon().overlapRate(other.boundaryPolygon())

  /** Plain-text repr in the reference `AreaDefinition.__str__` layout
    * (`geometry.py:1987-2003`; golden strings in
    * `test/test_area_config.py:44-63`): Area ID, Description, optional
    * Projection ID, Projection as the SORTED quoted param dict, Number
    * of columns/rows, Area extent rounded to 4 decimals. r13 — the
    * lib-independent core of the reference's repr surface ("What's
    * missing #2"); the HTML attrs flavour is [[describeHtml]].
    *
    * The Projection line prints THIS engine's parsed params with
    * numeric values canonicalized the way pyproj round-trips them
    * (integral floats print bare: '6371228.0' → '6371228', '-90' stays
    * '-90'); pyproj's CRS-expansion artifacts (`'type': 'crs'`,
    * `'no_defs': 'None'`, a=b → R) are deliberately not synthesized —
    * they are pyproj version quirks, not area semantics. */
  def describe(description: String = "", projId: String = ""): String = {
    val desc = if (description.isEmpty) id else description
    val third = if (projId.isEmpty) "" else s"Projection ID: $projId\n"
    s"Area ID: $id\nDescription: $desc\n$third" +
      s"Projection: $projDictStr\nNumber of columns: $width\nNumber of rows: $height\n" +
      s"Area extent: $extentStr"
  }

  /** HTML attrs section in the reference `_formatting_html.py:176-211`
    * (proj_area_attrs_section) layout — the xarray/cartopy-independent
    * core: a definition list of name, description, projection dict,
    * width/height, x/y resolution (1-dp, in projection units), extent. */
  def describeHtml(description: String = ""): String = {
    val desc = if (description.isEmpty) id else description
    val units = crs.params.getOrElse("units", if (crs.isLonLat) "degrees" else "")
    val res = s"${round1(math.abs(pixelSizeX))}/${round1(math.abs(pixelSizeY))}"
    val resName = if (crs.params.get("proj").contains("geos")) "Resolution x/y (SSP)"
      else "Resolution x/y"
    "<dl>" +
      s"<dt>Area name</dt><dd>$id</dd>" +
      s"<dt>Description</dt><dd>$desc</dd>" +
      s"<dt>Projection</dt><dd>$projDictStr</dd>" +
      s"<dt>Width/Height</dt><dd>$width/$height Pixel</dd>" +
      s"<dt>$resName</dt><dd>$res $units</dd>" +
      s"<dt>Extent (ll_x, ll_y, ur_x, ur_y)</dt><dd>$extentStr</dd>" +
      "</dl>"
  }

  private def projDictStr: String =
    crs.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k': '${AreaDef.canonNum(v)}'" }
      .mkString("{", ", ", "}")

  private def extentStr: String =
    Seq(xLL, yLL, xUR, yUR).map(v => AreaDef.pyFloat(round4(v))).mkString("(", ", ", ")")

  private def round4(v: Double): Double = math.rint(v * 10000.0) / 10000.0
  private def round1(v: Double): Double = math.rint(v * 10.0) / 10.0

  /** Semantic hash for LUT cache keys (`geometry.py:129-140`). */
  def semanticHash: String = {
    val s = s"${crs.proj4}|$width|$height|$xLL|$yLL|$xUR|$yUR"
    java.security.MessageDigest
      .getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
  }
}

object AreaDef {
  /** pyproj-style canonical print of a param value: integral numerics
    * print bare ('6371228.0' → '6371228'), everything else verbatim. */
  private[core] def canonNum(v: String): String =
    try {
      val d = v.toDouble
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      // scientific-notation input would print verbatim and diverge from
      // Python's plain-decimal float repr — normalize it; plain-decimal
      // input passes through untouched (no repr normalization)
      else if (v.exists(c => c == 'E' || c == 'e')) pyFloat(d)
      else v
    } catch { case _: NumberFormatException => v }

  /** Python-float-repr formatting: `Double.toString` switches to
    * scientific notation at |v| ≥ 1e7 — a web-mercator extent
    * (±20037508.34) would print as '-2.003750834E7' where the
    * reference's `__str__` (Python float repr, `geometry.py`) stays
    * plain-decimal until 1e16. Mirror Python's BOTH thresholds (r14
    * advice): plain decimal exactly for 1e-4 ≤ |v| < 1e16 (and 0.0),
    * Python-style exponent notation outside ('1e-05', '2e+16' — no
    * trailing '.0' on the mantissa, signed exponent padded to two
    * digits), so '1e-10' never expands to '0.0000000001' and 2e16 never
    * prints '20000000000000000.0'. */
  private[core] def pyFloat(v: Double): String = {
    val a = math.abs(v)
    if (v != 0.0 && (a < 1e-4 || a >= 1e16)) {
      // Java prints scientific for this whole range (its own switch
      // points are 1e-3 / 1e7), mantissa normalized to [1, 10) — same
      // exponent Python uses
      val s = java.lang.Double.toString(v)
      val i = s.indexOf('E')
      val mRaw = s.substring(0, i)
      val e = s.substring(i + 1).toInt
      val m = if (mRaw.endsWith(".0")) mRaw.dropRight(2) else mRaw
      val sign = if (e < 0) "-" else "+"
      f"${m}e$sign${math.abs(e)}%02d"
    } else {
      val s = java.lang.Double.toString(v)
      if (!s.contains("E")) s
      else {
        val plain = new java.math.BigDecimal(s).toPlainString
        val stripped =
          if (plain.contains('.'))
            plain.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
          else plain
        if (stripped.contains('.')) stripped else stripped + ".0"
      }
    }
  }

  /** Smallest area covering several same-CRS areas —
    * `geometry.py:3106-3143` (enclose_areas). */
  def enclose(areas: Seq[AreaDef]): AreaDef = {
    require(areas.nonEmpty, "enclose of empty set")
    val h = areas.head
    require(areas.forall(_.crs.proj4 == h.crs.proj4), "mixed CRS in enclose")
    require(
      areas.forall(a => math.abs(a.pixelSizeX - h.pixelSizeX) < 1e-9 &&
        math.abs(a.pixelSizeY - h.pixelSizeY) < 1e-9),
      "mixed resolution in enclose")
    val xll = areas.map(_.xLL).min; val yll = areas.map(_.yLL).min
    val xur = areas.map(_.xUR).max; val yur = areas.map(_.yUR).max
    AreaDef(
      "enclosed",
      h.crs,
      math.round((xur - xll) / h.pixelSizeX).toInt,
      math.round((yur - yll) / h.pixelSizeY).toInt,
      xll, yll, xur, yur)
  }

  /** Vertical concatenation of row-adjacent areas —
    * `geometry.py:2879-2965` (StackedAreaDefinition squeezed). */
  def concatVertical(top: AreaDef, bottom: AreaDef): AreaDef = {
    require(top.width == bottom.width && top.xLL == bottom.xLL && top.xUR == bottom.xUR,
      "areas not column-aligned")
    require(math.abs(top.yLL - bottom.yUR) < 1e-6, "areas not row-adjacent")
    AreaDef(s"${top.id}+${bottom.id}", top.crs, top.width, top.height + bottom.height,
      top.xLL, bottom.yLL, top.xUR, top.yUR)
  }
}
