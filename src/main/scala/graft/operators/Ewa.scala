package graft.operators

import graft.core.AreaDef
import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Elliptical Weighted Averaging — the Spark form of `pyresample/ewa`
  * (J6 ll2cr + J7 fornav scatter + A8 accumulate).
  *
  * Semantics follow `ewa/_fornav_templates.cpp`:
  *  - per scan (block of `rowsPerScan` swath rows) and per column, ellipse
  *    coefficients from the local Jacobian of grid (col,row) w.r.t. swath
  *    (pixel,line): ux/vx from central differences along the scan's middle
  *    row, uy/vy from the first-to-last row difference (`:109-190`);
  *  - each swath pixel scatters onto every grid cell whose centre lies
  *    within its ellipse q = a du^2 + b du dv + c dv^2 < qmax, with
  *    weight exp(-alpha q) (`:243-313`; we evaluate exp exactly instead of
  *    the reference's 10k-entry lookup table — BASELINE.md notes the table
  *    is a CPU-era optimization, not semantics);
  *  - per-cell combine: sum(w), sum(w v) then v = sum(wv)/sum(w) with the
  *    `weight_sum_min` threshold, or max-weight mode keeping the
  *    single best-weighted value (`ewa/dask_ewa.py:110-167`).
  *
  * Plan shape: two window passes over the swath (no shuffle beyond the
  * (scan, x) repartition), one explode bounded by the ellipse extents
  * (u_del/v_del are clamped by `weight_delta_max`), one hash aggregation on
  * the cell id. The explode emits (cell, w, value...) rows — Spark's
  * partial/final aggregation is exactly the reference's dask tree-combine.
  */
object EwaResample {

  /** J6: ll2cr — fractional target-grid coordinates for each swath pixel
    * (`ewa/_ll2cr.pyx:208-272`): u = fractional col, v = fractional row.
    * Off-area or off-earth pixels (NaN projections) keep NaN u/v. */
  def ll2cr(swath: DataFrame, area: AreaDef,
      lonCol: String = "lon", latCol: String = "lat",
      quantize: Option[Int] = None): DataFrame = {
    val projected = withProjected(swath, area.crs, lonCol, latCol)
    val u0 = fracCol(area, col("proj_x"))
    val v0 = fracRow(area, col("proj_y"))
    // quantized mode: round the fractional grid coordinates so that libm
    // 1-ulp projection differences cannot reach any downstream comparison —
    // everything after this point is pure IEEE arithmetic a SQL oracle
    // replays exactly. 1e-6 of a cell is metres-level; harmless.
    val (u, v) = quantize match {
      case Some(n) => (round(u0, n), round(v0, n))
      case None    => (u0, v0)
    }
    projected
      .withColumn("u", u)
      .withColumn("v", v)
      .drop("proj_x", "proj_y")
  }

  /** The scatter pipeline shared by all EWA variants: per-scan ellipse
    * parameters + footprint explode. Emits (cell, w, carryCols...). */
  private def scatter(
      swath: DataFrame,
      area: AreaDef,
      rowsPerScan: Int,
      carryCols: Seq[String],
      weightMin: Double,
      weightDistanceMax: Double,
      weightDeltaMax: Double,
      validity: Column,
      quantizeCr: Option[Int]): DataFrame = {

    val qmax = weightDistanceMax * weightDistanceMax
    val alpha = -math.log(weightMin) / qmax

    val cr = ll2cr(swath, area, quantize = quantizeCr)
    val rps = if (rowsPerScan <= 0) Int.MaxValue else rowsPerScan
    // Persist the ll2cr output: it feeds FOUR consumers (scan-row bounds,
    // the mid-row window, the first/last-row gradient agg, and the
    // footprint explode itself) — without it each consumer re-runs the
    // upstream swath scan + the projection trig. One row per swath pixel;
    // the reference materializes this same intermediate as its separate
    // ll2cr step (`ewa/_ll2cr.pyx`). MEMORY_AND_DISK so a 100 TB swath
    // spills instead of OOMing (at that scale, write it to parquet as the
    // reference does and read it back for fornav).
    val withScan = cr
      .withColumn("scan", if (rowsPerScan <= 0) lit(0L) else floor(col("y") / lit(rps)).cast("long"))
      .withColumn("y_in", if (rowsPerScan <= 0) col("y").cast("long") else col("y") % lit(rps))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val scanRows = withScan.groupBy("scan")
      .agg(min("y_in").as("_y0"), max("y_in").as("_y1"))
      .withColumn("_ymid", ((col("_y0") + col("_y1") + 1) / 2).cast("long"))

    val ws = withScan.join(scanRows, "scan")

    // ux/vx: central difference along the scan's middle row (cpp :142-143)
    val byX = Window.partitionBy("scan").orderBy("x")
    val mid = ws.filter(col("y_in") === col("_ymid"))
      .withColumn("ux_", (lead("u", 1).over(byX) - lag("u", 1).over(byX)) / lit(2.0) * lit(weightDistanceMax))
      .withColumn("vx_", (lead("v", 1).over(byX) - lag("v", 1).over(byX)) / lit(2.0) * lit(weightDistanceMax))
      .select(col("scan"), col("x"), col("ux_"), col("vx_"))

    // uy/vy: first-to-last row difference per column (cpp :144-145)
    val firstLast = ws.filter(col("y_in") === col("_y0") || col("y_in") === col("_y1"))
      .groupBy("scan", "x")
      .agg(
        (max(when(col("y_in") === col("_y1"), col("u"))) -
          max(when(col("y_in") === col("_y0"), col("u")))).as("_du"),
        (max(when(col("y_in") === col("_y1"), col("v"))) -
          max(when(col("y_in") === col("_y0"), col("v")))).as("_dv"),
        max(col("_y1") - col("_y0")).as("_dy"))
      .withColumn("uy_", when(col("_dy") > 0, col("_du") / col("_dy") * lit(weightDistanceMax)).otherwise(lit(0.0)))
      .withColumn("vy_", when(col("_dy") > 0, col("_dv") / col("_dy") * lit(weightDistanceMax)).otherwise(lit(0.0)))
      .select(col("scan"), col("x"), col("uy_"), col("vy_"))

    val eps = 1e-16
    // edge columns fall back to the neighbouring column's params in the
    // reference (cpp :186-190); NaN gradients degrade to circular footprint
    // (cpp :148-156) — we apply the circular fallback for both cases.
    val params = mid.join(firstLast, Seq("scan", "x"), "full")
      .withColumn("_bad",
        col("ux_").isNull || col("vx_").isNull || col("uy_").isNull || col("vy_").isNull ||
          isnan(col("ux_")) || isnan(col("vx_")) || isnan(col("uy_")) || isnan(col("vy_")))
      .withColumn("_fs0", col("ux_") * col("vy_") - col("uy_") * col("vx_"))
      .withColumn("_fs", greatest(col("_fs0") * col("_fs0"), lit(eps)))
      .withColumn("_fq", lit(qmax) / col("_fs"))
      .withColumn("ea", when(col("_bad"), lit(0.0)).otherwise((col("vx_") * col("vx_") + col("vy_") * col("vy_")) * col("_fq")))
      .withColumn("eb", when(col("_bad"), lit(0.0)).otherwise(lit(-2.0) * (col("ux_") * col("vx_") + col("uy_") * col("vy_")) * col("_fq")))
      .withColumn("ec", when(col("_bad"), lit(0.0)).otherwise((col("ux_") * col("ux_") + col("uy_") * col("uy_")) * col("_fq")))
      .withColumn("_d", greatest(lit(4.0) * col("ea") * col("ec") - col("eb") * col("eb"), lit(eps)))
      .withColumn("_d4", lit(4.0 * qmax) / col("_d"))
      .withColumn("u_del",
        when(col("_bad"), lit(weightDistanceMax))
          .otherwise(least(sqrt(col("ec") * col("_d4")), lit(weightDeltaMax))))
      .withColumn("v_del",
        when(col("_bad"), lit(weightDistanceMax))
          .otherwise(least(sqrt(col("ea") * col("_d4")), lit(weightDeltaMax))))
      .select("scan", "x", "ea", "eb", "ec", "u_del", "v_del")

    val px = withScan
      .filter(!isnan(col("u")) && !isnan(col("v")) && validity)
      .join(params, Seq("scan", "x"))
      // early reject (cpp :248-250) + clamp footprint to the grid
      .filter(col("u") >= -col("u_del") && col("v") >= -col("v_del"))
      .withColumn("iu1", greatest(floor(col("u") - col("u_del")).cast("int"), lit(0)))
      .withColumn("iu2", least(floor(col("u") + col("u_del")).cast("int"), lit(area.width - 1)))
      .withColumn("iv1", greatest(floor(col("v") - col("v_del")).cast("int"), lit(0)))
      .withColumn("iv2", least(floor(col("v") + col("v_del")).cast("int"), lit(area.height - 1)))
      .filter(col("iu1") <= col("iu2") && col("iv1") <= col("iv2"))

    px
      .withColumn("iu", explode(sequence(col("iu1"), col("iu2"))))
      .withColumn("iv", explode(sequence(col("iv1"), col("iv2"))))
      .withColumn("du", col("iu") + lit(0.5) - col("u"))
      .withColumn("dv", col("iv") + lit(0.5) - col("v"))
      .withColumn("q",
        col("ea") * col("du") * col("du") + col("eb") * col("du") * col("dv") +
          col("ec") * col("dv") * col("dv"))
      .filter(col("q") >= 0 && col("q") < lit(qmax))
      .withColumn("w", exp(lit(-alpha) * col("q")))
      .withColumn("cell", col("iv").cast("long") * area.width + col("iu"))
      .select((Seq("cell", "w") ++ carryCols).map(col): _*)
  }

  /** Full EWA resample of a gridded swath (y, x, lon, lat, value) onto an
    * area. `rowsPerScan` <= 0 treats the whole swath as one scan
    * (`ewa/ewa.py:105-107`). */
  def resample(
      swath: DataFrame, // (y, x, lon, lat, value)
      area: AreaDef,
      rowsPerScan: Int,
      valueCol: String = "value",
      weightMin: Double = 0.01,
      weightDistanceMax: Double = 1.0,
      weightDeltaMax: Double = 10.0,
      weightSumMin: Double = -1.0,
      maximumWeightMode: Boolean = false,
      quantizeWeights: Option[Int] = None,
      quantizeCr: Option[Int] = None): DataFrame = {

    val wsMin = if (weightSumMin == -1.0) weightMin else weightSumMin
    val scattered = scatter(swath, area, rowsPerScan, Seq(valueCol),
      weightMin, weightDistanceMax, weightDeltaMax,
      col(valueCol).isNotNull && !isnan(col(valueCol)), quantizeCr)

    if (maximumWeightMode) {
      scattered
        .groupBy("cell")
        .agg(max_by(col(valueCol), col("w")).as(valueCol), max("w").as("weight_sum"))
        .filter(col("weight_sum") >= wsMin)
        .select("cell", valueCol)
    } else quantizeWeights match {
      case None =>
        scattered
          .groupBy("cell")
          .agg(sum(col("w") * col(valueCol)).as("_swv"), sum("w").as("_sw"))
          .filter(col("_sw") >= wsMin)
          .select(col("cell"), (col("_swv") / col("_sw")).as(valueCol))
      case Some(scale) =>
        // exactly-reproducible mode: weights quantized to `scale` decimals
        // and summed as DECIMAL (exact, order-free) — a SQL oracle running
        // the identical arithmetic produces bit-equal results even though
        // the per-cell contribution count is unbounded
        import org.apache.spark.sql.types.DecimalType
        scattered
          .withColumn("_wq", round(col("w"), scale).cast(DecimalType(16, scale)))
          .withColumn("_vq", col(valueCol).cast(DecimalType(18, 6)))
          .groupBy("cell")
          .agg(sum(col("_wq") * col("_vq")).as("_swv"), sum(col("_wq")).as("_sw"))
          .filter(col("_sw").cast("double") >= wsMin)
          .select(col("cell"),
            (col("_swv").cast("double") / col("_sw").cast("double")).as(valueCol))
    }
  }

  /** Dynamic-grid EWA — `ewa/_ll2cr.pyx:66` (ll2cr_dynamic) + fornav: the
    * grid origin and shape are derived from the swath's projected footprint
    * (one aggregation pass — the Spark form of the reference's min/max
    * sweep), then the static pipeline runs on the frozen area. Mirrors the
    * reference's fit: origin = (xmin, ymax) upper-left, width/height =
    * truncated extent / cell size (`_ll2cr.pyx:178-182` int() semantics,
    * floored at 1 cell). The reference's projected-antimeridian shift
    * (`:151-169`) is not applied — wrap-crossing swaths should go through
    * `GeometryOps.freeze` on a lonlat grid instead. Returns the fitted
    * area with the resampled frame. */
  def resampleDynamic(
      swath: DataFrame, // (y, x, lon, lat, value)
      crs: graft.core.Crs,
      cellWidth: Double,
      cellHeight: Double,
      rowsPerScan: Int,
      id: String = "ewa_dynamic",
      valueCol: String = "value",
      weightMin: Double = 0.01,
      weightDistanceMax: Double = 1.0,
      weightDeltaMax: Double = 10.0,
      weightSumMin: Double = -1.0,
      quantizeWeights: Option[Int] = None,
      quantizeCr: Option[Int] = None): (AreaDef, DataFrame) = {
    import org.apache.spark.sql.Row
    val proj = withProjected(
      swath.filter(legalLonLat(col("lon"), col("lat"))), crs)
      .filter(!isnan(col("proj_x")) && !isnan(col("proj_y")))
    val Row(xmin: Double, xmax: Double, ymin: Double, ymax: Double) = proj
      .agg(min("proj_x"), max("proj_x"), min("proj_y"), max("proj_y"))
      .head()
    val w = math.max(1, math.abs((xmax - xmin) / cellWidth).toInt)
    val h = math.max(1, math.abs((ymax - ymin) / cellHeight).toInt)
    val area = AreaDef(id, crs, w, h,
      xmin, ymax - h * cellHeight, xmin + w * cellWidth, ymax)
    (area, resample(swath, area, rowsPerScan, valueCol, weightMin,
      weightDistanceMax, weightDeltaMax, weightSumMin,
      maximumWeightMode = false, quantizeWeights, quantizeCr))
  }

  /** Pure-Scala per-scan scatter kernel: the same semantics as [[scatter]]
    * restricted to ONE scan's pixels, for call sites that hold a complete
    * scan in memory — the streaming path's state-timeout flush
    * (`streaming/StreamingOps.ewaStream`). Emits (cell, w, w*value).
    * Mirrors the DataFrame pipeline exactly: lead/lag over the PRESENT
    * mid-row columns, first/last-row column gradients, circular fallback
    * on missing/NaN params, pixels whose column has no params are dropped. */
  private[graft] def scatterScan(
      pts: Seq[(Int, Int, Double, Double, Double)], // (y, x, lon, lat, value)
      area: AreaDef,
      rowsPerScan: Int,
      weightMin: Double = 0.01,
      weightDistanceMax: Double = 1.0,
      weightDeltaMax: Double = 10.0): Iterator[(Long, Double, Double)] = {
    if (pts.isEmpty) return Iterator.empty
    val qmax = weightDistanceMax * weightDistanceMax
    val alpha = -math.log(weightMin) / qmax
    val rps = if (rowsPerScan <= 0) Int.MaxValue else rowsPerScan

    final case class P(yIn: Long, x: Int, u: Double, v: Double, value: Double)
    val ps = pts.map { case (y, x, lon, lat, value) =>
      val (px, py) = area.crs.forward(lon, lat)
      val legal = lon >= -180 && lon <= 180 && lat >= -90 && lat <= 90
      P(if (rowsPerScan <= 0) y.toLong else (y % rps).toLong, x,
        if (legal) area.fracCol(px) else Double.NaN,
        if (legal) area.fracRow(py) else Double.NaN, value)
    }
    val y0 = ps.map(_.yIn).min
    val y1 = ps.map(_.yIn).max
    val ymid = (y0 + y1 + 1) / 2

    // ux/vx: central differences over the present mid-row columns
    val mid = ps.filter(_.yIn == ymid).sortBy(_.x)
    val midParams: Map[Int, (Option[Double], Option[Double])] =
      mid.indices.map { i =>
        val uxvx =
          if (i == 0 || i == mid.size - 1) (None, None)
          else (Some((mid(i + 1).u - mid(i - 1).u) / 2.0 * weightDistanceMax),
            Some((mid(i + 1).v - mid(i - 1).v) / 2.0 * weightDistanceMax))
        mid(i).x -> uxvx
      }.toMap

    // uy/vy: first-to-last row difference per column
    val flParams: Map[Int, (Option[Double], Option[Double])] = ps
      .filter(p => p.yIn == y0 || p.yIn == y1)
      .groupBy(_.x)
      .map { case (x, rows) =>
        val uF = rows.find(_.yIn == y0).map(_.u)
        val uL = rows.find(_.yIn == y1).map(_.u)
        val vF = rows.find(_.yIn == y0).map(_.v)
        val vL = rows.find(_.yIn == y1).map(_.v)
        val dy = y1 - y0
        val du = for { a <- uL; b <- uF } yield a - b
        val dv = for { a <- vL; b <- vF } yield a - b
        x -> (
          du.map(d => if (dy > 0) d / dy * weightDistanceMax else 0.0),
          dv.map(d => if (dy > 0) d / dy * weightDistanceMax else 0.0))
      }

    val eps = 1e-16
    val paramXs = midParams.keySet ++ flParams.keySet
    val params: Map[Int, (Double, Double, Double, Double, Double)] = paramXs.map { x =>
      val (uxO, vxO) = midParams.getOrElse(x, (None, None))
      val (uyO, vyO) = flParams.getOrElse(x, (None, None))
      val bad = uxO.isEmpty || vxO.isEmpty || uyO.isEmpty || vyO.isEmpty ||
        (uxO ++ vxO ++ uyO ++ vyO).exists(_.isNaN)
      if (bad) x -> (0.0, 0.0, 0.0, weightDistanceMax, weightDistanceMax)
      else {
        val ux = uxO.get; val vx = vxO.get; val uy = uyO.get; val vy = vyO.get
        val fs0 = ux * vy - uy * vx
        val fs = math.max(fs0 * fs0, eps)
        val fq = qmax / fs
        val ea = (vx * vx + vy * vy) * fq
        val eb = -2.0 * (ux * vx + uy * vy) * fq
        val ec = (ux * ux + uy * uy) * fq
        val d = math.max(4.0 * ea * ec - eb * eb, eps)
        val d4 = 4.0 * qmax / d
        x -> (ea, eb, ec,
          math.min(math.sqrt(ec * d4), weightDeltaMax),
          math.min(math.sqrt(ea * d4), weightDeltaMax))
      }
    }.toMap

    ps.iterator
      .filter(p => !p.u.isNaN && !p.v.isNaN && !p.value.isNaN && params.contains(p.x))
      .flatMap { p =>
        val (ea, eb, ec, uDel, vDel) = params(p.x)
        if (p.u < -uDel || p.v < -vDel) Iterator.empty
        else {
          val iu1 = math.max(math.floor(p.u - uDel).toInt, 0)
          val iu2 = math.min(math.floor(p.u + uDel).toInt, area.width - 1)
          val iv1 = math.max(math.floor(p.v - vDel).toInt, 0)
          val iv2 = math.min(math.floor(p.v + vDel).toInt, area.height - 1)
          for {
            iu <- (iu1 to iu2).iterator
            iv <- (iv1 to iv2).iterator
            du = iu + 0.5 - p.u
            dv = iv + 0.5 - p.v
            q = ea * du * du + eb * du * dv + ec * dv * dv
            if q >= 0 && q < qmax
          } yield {
            val w = math.exp(-alpha * q)
            (iv.toLong * area.width + iu, w, w * p.value)
          }
        }
      }
  }

  /** Multi-channel EWA (`ewa/_fornav.pyx` chan_count): all channels share
    * the scan geometry, footprints and weights; one aggregation computes
    * every channel's weighted mean with per-channel validity (fill pixels
    * skip only their own channel's accumulators, cpp :300-303). */
  def resampleMulti(
      swath: DataFrame, // (y, x, lon, lat, ch...)
      area: AreaDef,
      rowsPerScan: Int,
      valueCols: Seq[String],
      weightMin: Double = 0.01,
      weightDistanceMax: Double = 1.0,
      weightDeltaMax: Double = 10.0,
      weightSumMin: Double = -1.0): DataFrame = {
    require(valueCols.nonEmpty)
    val wsMin = if (weightSumMin == -1.0) weightMin else weightSumMin
    val scattered = scatter(swath, area, rowsPerScan, valueCols,
      weightMin, weightDistanceMax, weightDeltaMax, lit(true), None)
    val aggs = valueCols.map { c =>
      (sum(when(col(c).isNotNull && !isnan(col(c)), col("w") * col(c))) /
        sum(when(col(c).isNotNull && !isnan(col(c)), col("w")))).as(c)
    } :+ sum("w").as("_sw")
    scattered
      .groupBy("cell")
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("_sw") >= wsMin)
      .drop("_sw")
  }
}
