package graft.sources

import graft.core.{AreaConfig, AreaDef, Crs}
import graft.sources.NetCdf3.{NcFile, NcVar}

/** `load_cf_area` (`pyresample/utils/cf.py:413`): discover an
  * [[AreaDef]] inside a NetCDF/CF file — find the grid-mapping variable
  * (explicit `grid_mapping` attribute, the variable itself as a
  * grid-mapping container, or the CF latlon default), guess the x/y
  * coordinate axes from the variable's dimensions by CF standard_name,
  * and derive the area extent from the axis first/last values with the
  * half-pixel centre-to-corner offset.
  *
  * File IO is [[NetCdf3]] (classic formats, pure JVM); the CF attribute
  * -> projection mapping is shared with the IO-free surface
  * (`AreaConfig.cfProjParams`). This runs driver-side on grid/metadata
  * files — bulk data enters Spark through parquet, not NetCDF. */
object CfArea {

  /** Valid `grid_mapping_name`s per CF (`cf.py:31`). Names outside the
    * engine's projection surface still VALIDATE here (a variable can be
    * recognized as a grid-mapping container) but fail CRS construction. */
  private val validGridMappings = Set(
    "albers_conical_equal_area", "azimuthal_equidistant", "geostationary",
    "lambert_azimuthal_equal_area", "lambert_conformal_conic",
    "lambert_cylindrical_equal_area", "latitude_longitude", "mercator",
    "oblique_mercator", "orthographic", "polar_stereographic",
    "rotated_latitude_longitude", "sinusoidal", "stereographic",
    "transverse_mercator", "vertical_perspective")

  /** Accepted coordinate standard_names per grid-mapping type
    * (`cf.py:49`): projection_x/y_coordinate by default, lon/lat names
    * for the two latlon mappings, plus the angular flavor for
    * geostationary. */
  private def validStandardNames(typeOfGridMapping: String, axis: String): Seq[String] =
    (typeOfGridMapping, axis) match {
      case ("latitude_longitude", "x") => Seq("longitude")
      case ("latitude_longitude", "y") => Seq("latitude")
      case ("rotated_latitude_longitude", "x") => Seq("grid_longitude")
      case ("rotated_latitude_longitude", "y") => Seq("grid_latitude")
      case ("geostationary", "x") =>
        Seq("projection_x_angular_coordinate", "projection_x_coordinate")
      case ("geostationary", "y") =>
        Seq("projection_y_angular_coordinate", "projection_y_coordinate")
      case (_, "x") => Seq("projection_x_coordinate")
      case (_, "y") => Seq("projection_y_coordinate")
      case (_, other) => throw new IllegalArgumentException(s"axis must be x or y, got $other")
    }

  /** One coordinate axis, decoded (`cf.py:151` `_load_cf_axis_info`):
    * first/last cell-centre values, spacing, count, direction sign, and
    * the unit when it is a proj-meaningful length unit (rad/deg units
    * read as None, like upstream). */
  final case class AxisInfo(
      varname: String, first: Double, last: Double,
      spacing: Double, nb: Int, sign: Double, unit: Option[String])

  /** What the reference returns as `cf_info`. */
  final case class CfInfo(
      variable: String,
      gridMappingVariable: String,
      typeOfGridMapping: String,
      x: AxisInfo,
      y: AxisInfo,
      lon: Option[String],
      lat: Option[String])

  def loadCfArea(path: String): (AreaDef, CfInfo) = loadCfArea(NetCdf3.read(path))

  def loadCfArea(
      nc: NcFile,
      variable: Option[String] = None,
      y: Option[String] = None,
      x: Option[String] = None): (AreaDef, CfInfo) = {
    require(x.isDefined == y.isDefined, "specify both or neither of x= and y=")
    val (adef, info0) = variable match {
      case Some(v) => loadOneVariable(nc, v, y, x)
      case None =>
        // search every >=2-D variable; areas must agree (cf.py:380).
        // Upstream's loop `break`s on the FIRST loadable variable, which
        // makes its own several-areas error dead code — we implement the
        // documented contract instead (scan all, error on disagreement),
        // so a multi-grid file fails loudly rather than silently
        // returning whichever variable happened to serialize first.
        val found = nc.varList.filter(_.dimIds.length >= 2).flatMap { v =>
          try Some(loadOneVariable(nc, v.name, None, None))
          catch { case _: IllegalArgumentException | _: NoSuchElementException => None }
        }
        require(found.nonEmpty, s"found no AreaDefinitions in ${nc.path}")
        val uniq = found.map(_._1).distinct
        require(uniq.length == 1,
          s"${nc.path} holds ${uniq.length} different AreaDefinitions; pass variable=")
        found.head
    }
    // lon/lat variable guess (cf.py:215): the variable's dims plus its
    // :coordinates tokens, matched on standard_name CONTAINING
    // latitude/longitude (so rotated_latitude also matches, as upstream)
    def guessLonLat(varName: String, which: String): Option[String] = {
      val v = nc.vars(varName)
      val searchList = nc.dimNames(v) ++
        v.strAttr("coordinates").toSeq.flatMap(_.split("\\s+"))
      searchList.distinct.flatMap(nc.vars.get).find(
        _.strAttr("standard_name").exists(_.contains(which))).map(_.name)
    }
    val info = info0.copy(
      lon = guessLonLat(info0.variable, "longitude"),
      lat = guessLonLat(info0.variable, "latitude"))
    (adef, info)
  }

  /** Materialize a 2-D (or trailing-2-D) CF variable as a DataFrame of
    * `(cell, <variable>)` rows aligned to the discovered area's row-major
    * cell ids — the bridge from file to the engine's resampling operators
    * (compose with `AreaDef.grid` / the Image containers; see
    * CfNetcdfSpec's end-to-end case). Driver-side materialization BY
    * DESIGN: classic NetCDF caps files at a few GB — bulk data belongs
    * in parquet; this is the convenience path for grid-sized inputs,
    * parallelized immediately so everything downstream is distributed. */
  def readGrid(
      spark: org.apache.spark.sql.SparkSession,
      nc: NcFile,
      variable: String): (org.apache.spark.sql.DataFrame, AreaDef) = {
    val (adef, info) = loadCfArea(nc, Some(variable), None, None)
    val v = nc.vars(variable)
    val data = nc.readDoubles(variable)
    val w = adef.width; val h = adef.height
    require(data.length % (w.toLong * h) == 0,
      s"$variable: ${data.length} values do not tile the ${h}x$w grid")
    // trailing-2-D contract: (…, y, x) row-major — take the LAST slab
    // (e.g. the latest record of a (time, y, x) variable). A (…, x, y)
    // layout is transposed into row-major; anything else is an error —
    // zipping a mis-ordered slab to cell ids would silently transpose
    // the raster.
    val raw = data.takeRight(w * h)
    val dims = nc.dimNames(v)
    val slab: Array[Double] = dims.takeRight(2) match {
      case Seq(yd, xd) if yd == info.y.varname && xd == info.x.varname => raw
      case Seq(xd, yd) if xd == info.x.varname && yd == info.y.varname =>
        Array.tabulate(w * h)(i => raw((i % w) * h + i / w)) // (x, y) -> row-major (y, x)
      case other => throw new IllegalArgumentException(
        s"$variable: trailing dims $other are not (${info.y.varname}, ${info.x.varname})")
    }
    import spark.implicits._
    val df = spark.sparkContext
      .parallelize(slab.toIndexedSeq.zipWithIndex, spark.sparkContext.defaultParallelism)
      .map { case (value, i) => (i.toLong, value) }
      .toDF("cell", variable)
    (df, adef)
  }

  private def loadOneVariable(
      nc: NcFile, variable: String,
      y: Option[String], x: Option[String]): (AreaDef, CfInfo) = {
    val v = nc.vars.getOrElse(variable,
      throw new NoSuchElementException(s"variable '$variable' not in ${nc.path}"))

    // CRS resolution (cf.py:243): grid_mapping attr -> container var;
    // the variable itself as container; else the CF latlon default (no
    // default CRS exists in CF — WGS84 is the documented choice).
    val (gmVar, isItselfGm): (Option[NcVar], Boolean) = v.strAttr("grid_mapping") match {
      case Some(gmName) =>
        val gm = nc.vars.getOrElse(gmName, throw new NoSuchElementException(
          s"grid mapping variable '$gmName' not in ${nc.path}"))
        require(gm.strAttr("grid_mapping_name").exists(validGridMappings),
          s"not a valid CF grid_mapping variable ($gmName)")
        (Some(gm), false)
      case None if v.strAttr("grid_mapping_name").exists(validGridMappings) =>
        (Some(v), true)
      case None => (None, false)
    }
    val typeOfGridMapping =
      gmVar.flatMap(_.strAttr("grid_mapping_name")).getOrElse("latitude_longitude")
    val gridMappingVariable = gmVar.map(_.name).getOrElse("latlon_default")
    require(!isItselfGm || (y.isDefined && x.isDefined),
      "when variable= is the grid_mapping variable itself, y= and x= must be provided")

    val crs: Crs = gmVar match {
      case Some(gm) => Crs.fromParams(AreaConfig.cfProjParams(typeOfGridMapping,
        num = {
          // CF stores dual standard parallels as a 2-element attribute
          case "standard_parallel_2" =>
            gm.attrs.get("standard_parallel").flatMap(_.toOption).flatMap(_.lift(1))
          case k => gm.numAttr(k)
        },
        str = gm.strAttr))
      case None => Crs.fromParams(Map("proj" -> "longlat")) // WGS84 default
    }

    // axis discovery (cf.py:197/270): explicit names validate; otherwise
    // each dim of the variable is tested as a coordinate variable with a
    // matching standard_name
    def isValidAxis(name: String, axis: String): Boolean =
      nc.vars.get(name).exists(_.strAttr("standard_name")
        .exists(validStandardNames(typeOfGridMapping, axis).contains))
    def axisVar(axis: String, explicit: Option[String]): String = explicit match {
      case Some(n) =>
        require(isValidAxis(n, axis),
          s"'$n' is not a valid CF coordinate variable for the $axis axis")
        n
      case None => nc.dimNames(v).find(isValidAxis(_, axis)).getOrElse(
        throw new IllegalArgumentException(
          s"could not guess the name of the '$axis' axis for $variable"))
    }
    val xName = axisVar("x", x)
    val yName = axisVar("y", y)

    def axisInfo(name: String): AxisInfo = {
      val av = nc.vars(name)
      val data = nc.readDoubles(name)
      require(data.length >= 2, s"axis $name needs >=2 points")
      // packed axes (cf.py reads through xarray's CF decoding)
      val scale = av.numAttr("scale_factor").getOrElse(1.0)
      val offset = av.numAttr("add_offset").getOrElse(0.0)
      val first = data.head * scale + offset
      val last = data.last * scale + offset
      val delta = (last - first) / (data.length - 1)
      val spacing = math.abs(delta)
      // a constant axis would give sign = 0/0 = NaN and silently poison
      // the area extent (upstream shares the flaw; one cheap check here)
      require(spacing > 0, s"axis $name has zero spacing (constant coordinate values)")
      val rawUnit = av.strAttr("units")
      // rad/deg (and absent) units are not proj length units (cf.py:170)
      val unit = rawUnit.filterNot(u => u.startsWith("rad") || u.startsWith("deg"))
      AxisInfo(name, first, last, spacing, data.length, delta / spacing, unit)
    }
    // geostationary radians -> metres: scale by satellite height
    // (cf.py:72 _convert_XY_CF_to_Proj); a None unit means rad/deg/absent
    def convert(ai: AxisInfo): AxisInfo =
      if (typeOfGridMapping == "geostationary" && ai.unit.isEmpty) {
        val h = gmVar.flatMap(_.numAttr("perspective_point_height")).getOrElse(35785831.0)
        ai.copy(first = ai.first * h, last = ai.last * h,
          spacing = ai.spacing * h, unit = Some("m"))
      } else ai
    val xi = convert(axisInfo(xName))
    val yi = convert(axisInfo(yName))
    require(xi.unit == yi.unit, s"different units for x (${xi.unit}) and y (${yi.unit})")

    // extent from cell centres +- half a pixel (cf.py:178), then the
    // create_area_def units= conversion into projection metres
    val toM: Double = xi.unit match {
      case Some("km") => 1000.0
      case Some("m") | Some("meters") | Some("metres") | None => 1.0
      case Some(other) => throw new IllegalArgumentException(s"unsupported axis unit '$other'")
    }
    val llX = (xi.first - xi.sign * 0.5 * xi.spacing) * toM
    val urX = (xi.last + xi.sign * 0.5 * xi.spacing) * toM
    val llY = (yi.last + yi.sign * 0.5 * yi.spacing) * toM
    val urY = (yi.first - yi.sign * 0.5 * yi.spacing) * toM

    val adef = AreaDef(gridMappingVariable, crs, xi.nb, yi.nb, llX, llY, urX, urY)
    (adef, CfInfo(variable, gridMappingVariable, typeOfGridMapping, xi, yi, None, None))
  }
}
