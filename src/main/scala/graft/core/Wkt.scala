package graft.core

/** WKT2 (ISO 19162 / OGC 18-010r7) export-import for the CRS layer —
  * the feasible half of the reference's plotting/ODC interop surface
  * (`geometry.py:2009` `to_cartopy_crs` / `:2033` `to_odc_geobox`, which
  * delegate to pyproj's WKT): downstream GIS tooling takes the WKT
  * string; the cartopy/ODC object construction itself needs those
  * libraries and stays out of scope.
  *
  * The writer emits standard EPSG method/parameter names for the
  * engine's projections; any engine parameter without a standard slot in
  * that method is carried as a `PARAMETER["graft:<key>", v]` so the
  * round-trip is lossless. The reader is deliberately lenient: it reads
  * METHOD/PARAMETER/ELLIPSOID nodes positionally and ignores the rest,
  * so WKT from other producers (pyproj, GDAL) with matching method
  * names also loads. */
object Wkt {

  private val methodOf: Map[String, String] = Map(
    "laea" -> "Lambert Azimuthal Equal Area",
    "stere" -> "Polar Stereographic (variant B)",
    "merc" -> "Mercator (variant B)",
    "eqc" -> "Equidistant Cylindrical",
    "aeqd" -> "Azimuthal Equidistant",
    "geos" -> "Geostationary Satellite (Sweep X)",
    "lcc" -> "Lambert Conic Conformal (2SP)",
    "omerc" -> "Hotine Oblique Mercator (variant B)",
    "tmerc" -> "Transverse Mercator",
    "aea" -> "Albers Equal Area",
    "sinu" -> "Sinusoidal",
    "ortho" -> "Orthographic",
    "nsper" -> "Vertical Perspective",
    "cea" -> "Lambert Cylindrical Equal Area")
  private val projOfMethod: Map[String, String] =
    methodOf.map(_.swap) ++ Map(
      "Geostationary Satellite (Sweep Y)" -> "geos",
      // variant A = origin lat + scale factor, both of which stere maps
      "Polar Stereographic (variant A)" -> "stere",
      // Mercator variant A = scale factor at the natural origin — the
      // engine's merc takes an explicit k_0 since r9, so this parses
      "Mercator (variant A)" -> "merc")

  /** (standard EPSG parameter name, engine proj4 key) per projection —
    * written in this order; keys of the projection not listed here ride
    * as graft:-prefixed parameters. */
  private val paramNames: Map[String, Seq[(String, String)]] = Map(
    "laea" -> Seq(
      "Latitude of natural origin" -> "lat_0",
      "Longitude of natural origin" -> "lon_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "stere" -> Seq(
      "Latitude of standard parallel" -> "lat_ts",
      "Longitude of origin" -> "lon_0",
      "Latitude of natural origin" -> "lat_0",
      "Scale factor at natural origin" -> "k_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "merc" -> Seq(
      "Latitude of 1st standard parallel" -> "lat_ts",
      "Longitude of natural origin" -> "lon_0",
      "Scale factor at natural origin" -> "k_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "eqc" -> Seq(
      "Latitude of 1st standard parallel" -> "lat_ts",
      "Longitude of natural origin" -> "lon_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "aeqd" -> Seq(
      "Latitude of natural origin" -> "lat_0",
      "Longitude of natural origin" -> "lon_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "geos" -> Seq(
      "Longitude of natural origin" -> "lon_0",
      "Satellite Height" -> "h",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "lcc" -> Seq(
      "Latitude of false origin" -> "lat_0",
      "Longitude of false origin" -> "lon_0",
      "Latitude of 1st standard parallel" -> "lat_1",
      "Latitude of 2nd standard parallel" -> "lat_2",
      "Easting at false origin" -> "x_0",
      "Northing at false origin" -> "y_0"),
    "omerc" -> Seq(
      "Latitude of projection centre" -> "lat_0",
      "Longitude of projection centre" -> "lonc",
      "Azimuth at projection centre" -> "alpha",
      "Angle from Rectified to Skew Grid" -> "gamma",
      "Scale factor at projection centre" -> "k_0",
      "Easting at projection centre" -> "x_0",
      "Northing at projection centre" -> "y_0"),
    "tmerc" -> Seq(
      "Latitude of natural origin" -> "lat_0",
      "Longitude of natural origin" -> "lon_0",
      "Scale factor at natural origin" -> "k_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "aea" -> Seq(
      "Latitude of false origin" -> "lat_0",
      "Longitude of false origin" -> "lon_0",
      "Latitude of 1st standard parallel" -> "lat_1",
      "Latitude of 2nd standard parallel" -> "lat_2",
      "Easting at false origin" -> "x_0",
      "Northing at false origin" -> "y_0"),
    "sinu" -> Seq(
      "Longitude of natural origin" -> "lon_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "ortho" -> Seq(
      "Latitude of natural origin" -> "lat_0",
      "Longitude of natural origin" -> "lon_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "nsper" -> Seq(
      "Latitude of topocentric origin" -> "lat_0",
      "Longitude of topocentric origin" -> "lon_0",
      "Viewpoint height" -> "h",
      "False easting" -> "x_0",
      "False northing" -> "y_0"),
    "cea" -> Seq(
      "Latitude of 1st standard parallel" -> "lat_ts",
      "Longitude of natural origin" -> "lon_0",
      "False easting" -> "x_0",
      "False northing" -> "y_0"))

  /** The CF-convention pole-rotation method and parameter names (what
    * PROJ >= 8 writes for `ob_tran o_proj=longlat`): a rotated-pole grid
    * is a DERIVED GEOGRAPHIC CRS in WKT2, not a PROJCRS — axes stay
    * ellipsoidal degrees. */
  private val PoleRotationMethod = "Pole rotation (netCDF CF convention)"

  /** Read-only aliases: producer variants that map onto the same engine
    * key but must never be WRITTEN (the writer keeps one canonical name
    * per key). Covers Polar Stereographic variant A's central meridian
    * (EPSG 9810 names it "Longitude of natural origin") and the
    * false-easting/northing name family across methods. */
  private val readAliases: Map[String, Map[String, String]] = Map(
    "stere" -> Map("Longitude of natural origin" -> "lon_0"),
    "lcc" -> Map("False easting" -> "x_0", "False northing" -> "y_0"),
    "aea" -> Map("False easting" -> "x_0", "False northing" -> "y_0"),
    "omerc" -> Map("False easting" -> "x_0", "False northing" -> "y_0"))

  private def num(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString

  /** Serialize to a WKT2 string: GEOGCRS for lon/lat, PROJCRS otherwise. */
  def toWkt(crs: Crs, name: String = "undefined"): String = {
    val ell = ellipsoidOf(crs)
    val rf = if (ell.a == ell.b) 0.0 else ell.a / (ell.a - ell.b)
    val ellWkt =
      s"""ELLIPSOID["unknown",${num(ell.a)},${num(rf)},LENGTHUNIT["metre",1]]"""
    val geog =
      s"""BASEGEOGCRS["unknown",DATUM["unknown",$ellWkt],PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]]"""
    val projName = crs.params.getOrElse("proj", "longlat")
    if (projName == "ob_tran") {
      // rotated-pole latlon: a derived geographic CRS with the CF-named
      // pole-rotation conversion (pyproj/PROJ >= 8 emit this same shape)
      val pLat = crs.params.getOrElse("o_lat_p", "90")
      val pLon = num(Projection.wrapLonDeg(
        crs.params.get("lon_0").map(_.toDouble).getOrElse(0.0) - 180.0))
      val gLon = crs.params.getOrElse("o_lon_p", "0")
      return s"""GEOGCRS["$name",$geog,DERIVINGCONVERSION["Pole rotation",METHOD["$PoleRotationMethod"],PARAMETER["Grid north pole latitude (netCDF CF convention)",$pLat],PARAMETER["Grid north pole longitude (netCDF CF convention)",$pLon],PARAMETER["North pole grid longitude (netCDF CF convention)",$gLon]],CS[ellipsoidal,2],AXIS["latitude",north,ANGLEUNIT["degree",0.0174532925199433]],AXIS["longitude",east,ANGLEUNIT["degree",0.0174532925199433]]]"""
    }
    if (crs.isLonLat)
      s"""GEOGCRS["$name",DATUM["unknown",$ellWkt],PRIMEM["Greenwich",0],CS[ellipsoidal,2],AXIS["geodetic latitude (Lat)",north,ANGLEUNIT["degree",0.0174532925199433]],AXIS["geodetic longitude (Lon)",east,ANGLEUNIT["degree",0.0174532925199433]]]"""
    else {
      val method = methodOf.getOrElse(projName,
        throw new IllegalArgumentException(s"no WKT method mapping for proj=$projName"))
      val sweep = crs.params.get("sweep")
      val methodFinal =
        if (projName == "geos" && !sweep.contains("x")) "Geostationary Satellite (Sweep Y)"
        else if (projName == "merc" && (crs.params.contains("k_0") || crs.params.contains("k")))
          "Mercator (variant A)" // scale given directly, not via lat_ts
        else method
      val named = paramNames(projName)
      val namedKeys = named.map(_._2).toSet
      val stdParams = named.flatMap { case (std, key) =>
        crs.params.get(key).map(v => s"""PARAMETER["$std",$v]""")
      }
      // lossless remainder: engine keys without a standard slot (skip the
      // ellipsoid/bookkeeping keys — they live in the ELLIPSOID node)
      val skip = namedKeys ++ Set("proj", "a", "b", "rf", "R", "ellps", "sweep",
        "units", "no_defs", "type", "wktext", "over")
      val extras = crs.params.toSeq.sortBy(_._1).collect {
        case (k, v) if !skip(k) => s"""PARAMETER["graft:$k",$v]"""
      }
      val conv = (stdParams ++ extras).mkString(",")
      s"""PROJCRS["$name",$geog,CONVERSION["unknown",METHOD["$methodFinal"]${if (conv.nonEmpty) "," + conv else ""}],CS[Cartesian,2],AXIS["(E)",east,LENGTHUNIT["metre",1]],AXIS["(N)",north,LENGTHUNIT["metre",1]]]"""
    }
  }

  /** Parse WKT (lenient): METHOD → proj, PARAMETERs → proj params,
    * first ELLIPSOID → a/b. Accepts this writer's output and, for the
    * mapped method names, pyproj/GDAL-shaped WKT2. */
  def fromWkt(wkt: String): Crs = {
    def quoted(after: String): Option[String] = {
      val i = wkt.indexOf(after)
      if (i < 0) None
      else {
        val q0 = wkt.indexOf('"', i + after.length)
        val q1 = wkt.indexOf('"', q0 + 1)
        if (q0 < 0 || q1 < 0) None else Some(wkt.substring(q0 + 1, q1))
      }
    }
    // ELLIPSOID["name", a, rf, ...]
    val ellRe = """ELLIPSOID\["[^"]*",\s*([-0-9.Ee+]+),\s*([-0-9.Ee+]+)""".r
    val ellParams: Map[String, String] = ellRe.findFirstMatchIn(wkt) match {
      case Some(m) =>
        val a = m.group(1).toDouble; val rf = m.group(2).toDouble
        if (rf == 0.0) Map("a" -> a.toString, "b" -> a.toString)
        else Map("a" -> a.toString, "rf" -> rf.toString)
      case None => Map.empty
    }
    if (wkt.contains(PoleRotationMethod)) {
      val cfRe = """PARAMETER\["([^"]+) \(netCDF CF convention\)",\s*([-0-9.Ee+]+)""".r
      val cf = cfRe.findAllMatchIn(wkt).map(m => m.group(1) -> m.group(2).toDouble).toMap
      return Crs.fromParams(Map(
        "proj" -> "ob_tran", "o_proj" -> "longlat",
        "o_lat_p" -> cf.getOrElse("Grid north pole latitude", 90.0).toString,
        "o_lon_p" -> cf.getOrElse("North pole grid longitude", 0.0).toString,
        "lon_0" -> (180.0 + cf.getOrElse("Grid north pole longitude", 0.0)).toString)
        ++ ellParams, raw = wkt)
    }
    if (wkt.trim.startsWith("GEOGCRS") || wkt.trim.startsWith("GEOGCS"))
      return Crs.fromParams(Map("proj" -> "longlat") ++ ellParams, raw = wkt)
    val method = quoted("METHOD[").getOrElse(
      throw new IllegalArgumentException("WKT has no METHOD node"))
    val proj = projOfMethod.getOrElse(method,
      throw new IllegalArgumentException(s"unsupported WKT method '$method'"))
    val paramRe = """PARAMETER\["([^"]+)",\s*([-0-9.Ee+]+)""".r
    val stdToKey: Map[String, String] = // pairs are (std name, key)
      paramNames(proj).toMap ++ readAliases.getOrElse(proj, Map.empty)
    val params = paramRe.findAllMatchIn(wkt).flatMap { m =>
      val nameP = m.group(1); val v = m.group(2)
      if (nameP.startsWith("graft:")) Some(nameP.stripPrefix("graft:") -> v)
      else stdToKey.get(nameP) match {
        case Some(k) => Some(k -> v)
        case None =>
          // an unmapped parameter with a nonzero value would silently
          // change the CRS (e.g. a false easting this method has no slot
          // for) — the CRS layer has no silent fallbacks, so fail loudly;
          // zero-valued defaults (pyproj writes every EPSG slot) pass
          require(v.toDouble == 0.0,
            s"WKT parameter '$nameP' = $v has no mapping for $method and is nonzero")
          None
      }
    }.toMap
    val sweep =
      if (proj == "geos" && method.contains("Sweep X")) Map("sweep" -> "x") else Map.empty
    Crs.fromParams(Map("proj" -> proj) ++ params ++ sweep ++ ellParams, raw = wkt)
  }

  private def ellipsoidOf(crs: Crs): Ellipsoid = {
    // every engine Projection carries its ellipsoid; recover it from the
    // parameter surface the same way Crs.fromParams built it
    val p = crs.params
    (p.get("a"), p.get("b"), p.get("rf"), p.get("R")) match {
      case (_, _, _, Some(r)) => Ellipsoid.sphere(r.toDouble)
      case (Some(a), Some(b), _, _) => Ellipsoid(a.toDouble, b.toDouble)
      case (Some(a), None, Some(rf), _) =>
        val av = a.toDouble; Ellipsoid(av, av * (1 - 1 / rf.toDouble))
      case (Some(a), None, None, _) => Ellipsoid.sphere(a.toDouble)
      case _ if p.get("ellps").contains("sphere") => Ellipsoid.sphere(6370997.0)
      case _ => Ellipsoid.WGS84
    }
  }
}
