package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import graft.core.{AreaConfig, AreaDef, Crs}

/** GeoTIFF area inference — `get_area_def_from_raster`
  * (`pyresample/utils/rasterio.py:77`) without rasterio/GDAL: parse the
  * TIFF 6.0 IFD and the GeoTIFF 1.1 geo-keys (both public specs) for
  * exactly what the reference reads off the handle — RasterXSize/YSize,
  * the affine transform (ModelPixelScale + ModelTiepoint), and the CRS —
  * then delegate to the existing geotransform math
  * (`AreaConfig.fromGeoTransform`). Pixel strips are never decoded:
  * the operator's contract is georeferencing, and bulk raster DATA
  * enters Spark through parquet.
  *
  * CRS resolution mirrors the spec's layering: a handful of well-known
  * `ProjectedCSTypeGeoKey` EPSG codes are baked (4326/3857/3413/3031);
  * user-defined CRSs are assembled from `ProjCoordTransGeoKey` +
  * parameter keys; geographic-model files map to lon/lat with the
  * ellipsoid from the Geog*GeoKeys. */
object GeoTiff {

  // TIFF tags
  private val TagWidth = 256; private val TagLength = 257
  private val TagModelPixelScale = 33550
  private val TagModelTiepoint = 33922
  private val TagGeoKeys = 34735
  private val TagGeoDoubles = 34736

  // GeoTIFF key ids (GeoTIFF 1.1 §B)
  private val GTModelType = 1024
  private val GeographicType = 2048
  private val GeogSemiMajor = 2057; private val GeogSemiMinor = 2058
  private val GeogInvFlattening = 2059
  private val ProjectedCSType = 3072
  private val ProjCoordTrans = 3075
  private val ProjStdParallel1 = 3078; private val ProjStdParallel2 = 3079
  private val ProjNatOriginLong = 3080; private val ProjNatOriginLat = 3081
  private val ProjFalseEasting = 3082; private val ProjFalseNorthing = 3083
  private val ProjFalseOriginLong = 3084; private val ProjFalseOriginLat = 3085
  private val ProjFalseOriginEasting = 3086; private val ProjFalseOriginNorthing = 3087
  private val ProjCenterLong = 3088; private val ProjCenterLat = 3089
  private val ProjCenterEasting = 3090; private val ProjCenterNorthing = 3091
  private val ProjScaleAtNatOrigin = 3092; private val ProjScaleAtCenter = 3093
  private val ProjStraightVertPoleLong = 3095

  // GeoTIFF coordinate-transformation codes -> engine projections
  // (GeoTIFF 1.1 §B.6: 1=TransverseMercator, 7=Mercator, 8=LCC 2SP,
  //  10=LAEA, 11=AlbersEqualArea, 12=AzimuthalEquidistant,
  //  14=Stereographic, 15=PolarStereographic, 17=Equirectangular,
  //  21=Orthographic, 24=Sinusoidal)
  private val ctToProj = Map(
    1 -> "tmerc", 7 -> "merc", 8 -> "lcc", 10 -> "laea", 11 -> "aea",
    12 -> "aeqd", 14 -> "stere", 15 -> "stere", 17 -> "eqc",
    21 -> "ortho", 24 -> "sinu", 28 -> "cea")

  /** Well-known EPSG codes (public definitions): a small baked table plus
    * the formulaic UTM (326xx/327xx, lon_0 = 6·zone − 183) and UPS
    * (5041/5042) families — the CRSs of nearly every projected GeoTIFF in
    * the wild. */
  private[sources] def epsgParams(code: Int): Map[String, String] = code match {
    case 4326 => Map("proj" -> "longlat") // WGS84 default ellipsoid
    case 3857 => Map("proj" -> "merc", "a" -> "6378137", "b" -> "6378137", "lon_0" -> "0")
    case 3413 => Map("proj" -> "stere", "lat_0" -> "90", "lat_ts" -> "70",
      "lon_0" -> "-45", "a" -> "6378137", "rf" -> "298.257223563")
    case 3031 => Map("proj" -> "stere", "lat_0" -> "-90", "lat_ts" -> "-71",
      "lon_0" -> "0", "a" -> "6378137", "rf" -> "298.257223563")
    case 6933 => // NSIDC EASE-Grid 2.0 Global (cea, WGS84, lat_ts 30)
      Map("proj" -> "cea", "lat_ts" -> "30", "lon_0" -> "0",
        "a" -> "6378137", "rf" -> "298.257223563")
    case utm if utm >= 32601 && utm <= 32660 => // WGS84 / UTM north
      Map("proj" -> "utm", "zone" -> (utm - 32600).toString,
        "a" -> "6378137", "rf" -> "298.257223563")
    case utm if utm >= 32701 && utm <= 32760 => // WGS84 / UTM south
      Map("proj" -> "utm", "zone" -> (utm - 32700).toString, "south" -> "true",
        "a" -> "6378137", "rf" -> "298.257223563")
    case 5041 => Map("proj" -> "stere", "lat_0" -> "90", "k_0" -> "0.994", // UPS North
      "lon_0" -> "0", "x_0" -> "2000000", "y_0" -> "2000000",
      "a" -> "6378137", "rf" -> "298.257223563")
    case 5042 => Map("proj" -> "stere", "lat_0" -> "-90", "k_0" -> "0.994", // UPS South
      "lon_0" -> "0", "x_0" -> "2000000", "y_0" -> "2000000",
      "a" -> "6378137", "rf" -> "298.257223563")
    case other => throw new IllegalArgumentException(
      s"EPSG:$other not in the baked table (4326/3857/3413/3031, UTM 326xx/327xx, UPS 5041/5042); " +
        "write user-defined geo-keys for other CRSs")
  }

  final case class RasterInfo(
      width: Int, height: Int,
      geoTransform: Seq[Double], // GDAL order: (x0, sx, 0, y0, 0, -sy)
      crs: Crs)

  def readInfo(path: String): RasterInfo = {
    val raf = new RandomAccessFile(path, "r")
    try readInfoFrom(path, raf)
    finally raf.close()
  }

  private def readInfoFrom(path: String, raf: RandomAccessFile): RasterInfo = {
    // positioned bounded reads: the IFD may sit ANYWHERE in the file
    // (commonly after the pixel strips), so never materialize the file —
    // the scaladoc's "pixel strips are never decoded" is also "never
    // loaded", and >2 GB rasters parse fine
    def slice(off: Long, len: Int): ByteBuffer = {
      val arr = new Array[Byte](len)
      raf.seek(off); raf.readFully(arr)
      ByteBuffer.wrap(arr)
    }
    val head = slice(0, 8)
    val order = new String(Array(head.get(0), head.get(1)), "US-ASCII") match {
      case "II" => ByteOrder.LITTLE_ENDIAN
      case "MM" => ByteOrder.BIG_ENDIAN
      case other => throw new IllegalArgumentException(s"$path: not a TIFF (order '$other')")
    }
    head.order(order)
    require(head.getShort(2) == 42, s"$path: bad TIFF magic")
    val ifdOff = head.getInt(4).toLong & 0xFFFFFFFFL
    val n = slice(ifdOff, 2).order(order).getShort(0) & 0xFFFF
    val ifd = slice(ifdOff + 2, 12 * n).order(order)
    // entry: tag(2) type(2) count(4) valueOrOffset(4)
    final case class Entry(tag: Int, typ: Int, count: Int, at: Int) // at: offset in `ifd`
    val entries = (0 until n).map { i =>
      val e = 12 * i
      Entry(ifd.getShort(e) & 0xFFFF, ifd.getShort(e + 2) & 0xFFFF, ifd.getInt(e + 4), e + 8)
    }
    def find(tag: Int): Option[Entry] = entries.find(_.tag == tag)
    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4; case 5 | 10 | 12 => 8
      case other => throw new IllegalArgumentException(s"TIFF type $other")
    }
    // values ≤4 bytes live inline in the entry; larger ones at an offset
    def valueBuf(e: Entry): ByteBuffer = {
      val total = typeSize(e.typ) * e.count
      if (total <= 4) ifd.duplicate().position(e.at).slice().order(order)
      else slice(ifd.getInt(e.at).toLong & 0xFFFFFFFFL, total).order(order)
    }
    def shorts(e: Entry): Array[Int] = {
      val b = valueBuf(e)
      Array.tabulate(e.count)(i => b.getShort(2 * i) & 0xFFFF)
    }
    def doubles(e: Entry): Array[Double] = {
      val b = valueBuf(e)
      Array.tabulate(e.count)(i => b.getDouble(8 * i))
    }
    def intVal(e: Entry): Long = e.typ match {
      case 3 => (ifd.getShort(e.at) & 0xFFFF).toLong
      case 4 => ifd.getInt(e.at).toLong & 0xFFFFFFFFL
      case other => throw new IllegalArgumentException(s"tag ${e.tag}: type $other not integral")
    }

    val width = intVal(find(TagWidth).getOrElse(
      throw new IllegalArgumentException(s"$path: no ImageWidth"))).toInt
    val height = intVal(find(TagLength).getOrElse(
      throw new IllegalArgumentException(s"$path: no ImageLength"))).toInt
    val scale = find(TagModelPixelScale).map(doubles).getOrElse(
      throw new IllegalArgumentException(s"$path: no ModelPixelScale (not georeferenced)"))
    val tie = find(TagModelTiepoint).map(doubles).getOrElse(
      throw new IllegalArgumentException(s"$path: no ModelTiepoint (not georeferenced)"))
    require(tie.length >= 6, s"$path: short ModelTiepoint")
    val (sx, sy) = (scale(0), scale(1))
    // tiepoint (i, j, k) -> model (x, y, z); raster (0,0) model position:
    val x0 = tie(3) - tie(0) * sx
    val y0 = tie(4) + tie(1) * sy
    val gt = Seq(x0, sx, 0.0, y0, 0.0, -sy)

    // geo keys: (KeyDirectoryVersion, KeyRevision, MinorRevision, NumberOfKeys)
    val geo = find(TagGeoKeys).map(shorts).getOrElse(
      throw new IllegalArgumentException(s"$path: no GeoKeyDirectory (not georeferenced)"))
    val geoDoubles = find(TagGeoDoubles).map(doubles).getOrElse(Array.empty[Double])
    val nKeys = geo(3)
    // key entry: (keyId, tiffTagLocation, count, valueOrIndex)
    val keys: Map[Int, (Int, Int, Int)] = (0 until nKeys).map { i =>
      val o = 4 + 4 * i
      geo(o) -> ((geo(o + 1), geo(o + 2), geo(o + 3)))
    }.toMap
    def keyShort(id: Int): Option[Int] = keys.get(id).collect {
      case (0, _, v) => v // stored inline in the directory
    }
    def keyDouble(id: Int): Option[Double] = keys.get(id).collect {
      case (TagGeoDoubles, _, idx) => geoDoubles(idx)
      case (0, _, v) => v.toDouble
    }

    val ellParams: Map[String, String] =
      (keyDouble(GeogSemiMajor), keyDouble(GeogSemiMinor), keyDouble(GeogInvFlattening)) match {
        case (Some(a), Some(b), _) => Map("a" -> a.toString, "b" -> b.toString)
        case (Some(a), None, Some(rf)) => Map("a" -> a.toString, "rf" -> rf.toString)
        case (Some(a), None, None) => Map("a" -> a.toString)
        case _ => Map.empty // fall through to the model's default (WGS84)
      }
    val modelType = keyShort(GTModelType).getOrElse(
      throw new IllegalArgumentException(s"$path: no GTModelTypeGeoKey"))
    val crs: Crs = modelType match {
      case 2 => // geographic
        keyShort(GeographicType) match {
          case Some(32767) | None => Crs.fromParams(Map("proj" -> "longlat") ++ ellParams)
          case Some(4326) => Crs.fromParams(Map("proj" -> "longlat"))
          case Some(other) => Crs.fromParams(epsgParams(other))
        }
      case 1 => // projected
        keyShort(ProjectedCSType) match {
          case Some(code) if code != 32767 => Crs.fromParams(epsgParams(code))
          case _ =>
            val ct = keyShort(ProjCoordTrans).getOrElse(throw new IllegalArgumentException(
              s"$path: user-defined PCS without ProjCoordTransGeoKey"))
            val proj = ctToProj.getOrElse(ct, throw new IllegalArgumentException(
              s"$path: unsupported coordinate transformation code $ct"))
            val p = Seq(
              keyDouble(ProjNatOriginLat).map("lat_0" -> _.toString),
              keyDouble(ProjCenterLat).map("lat_0" -> _.toString),
              keyDouble(ProjFalseOriginLat).map("lat_0" -> _.toString),
              keyDouble(ProjNatOriginLong).map("lon_0" -> _.toString),
              keyDouble(ProjCenterLong).map("lon_0" -> _.toString),
              keyDouble(ProjFalseOriginLong).map("lon_0" -> _.toString),
              keyDouble(ProjStraightVertPoleLong).map("lon_0" -> _.toString),
              keyDouble(ProjStdParallel1).map(v =>
                (if (proj == "lcc" || proj == "aea") "lat_1" else "lat_ts") -> v.toString),
              keyDouble(ProjStdParallel2).map("lat_2" -> _.toString),
              keyDouble(ProjScaleAtNatOrigin).map("k_0" -> _.toString),
              keyDouble(ProjScaleAtCenter).map("k_0" -> _.toString),
              keyDouble(ProjFalseEasting).map("x_0" -> _.toString),
              keyDouble(ProjFalseOriginEasting).map("x_0" -> _.toString),
              keyDouble(ProjCenterEasting).map("x_0" -> _.toString),
              keyDouble(ProjFalseNorthing).map("y_0" -> _.toString),
              keyDouble(ProjFalseOriginNorthing).map("y_0" -> _.toString),
              keyDouble(ProjCenterNorthing).map("y_0" -> _.toString)
            ).flatten.toMap
            // CT_PolarStereographic (15) carries the hemisphere in the
            // sign of its standard parallel; the projection origin IS the
            // pole when no origin-lat key is present
            val pole: Map[String, String] =
              if (ct == 15 && !p.contains("lat_0"))
                Map("lat_0" -> (if (p.get("lat_ts").exists(_.toDouble < 0)) "-90" else "90"))
              else Map.empty
            Crs.fromParams(Map("proj" -> proj) ++ p ++ pole ++ ellParams)
        }
      case other => throw new IllegalArgumentException(s"$path: GTModelType $other unsupported")
    }
    RasterInfo(width, height, gt, crs)
  }

  /** `get_area_def_from_raster`: read georeferencing and build the area
    * via the shared geotransform math. */
  def areaFromGeoTiff(path: String, areaId: String = "from_raster"): AreaDef = {
    val info = readInfo(path)
    require(info.geoTransform(2) == 0 && info.geoTransform(4) == 0,
      "rotated rasters are not supported (reference contract)")
    val gt = info.geoTransform
    AreaDef(areaId, info.crs, info.width, info.height,
      gt(0), gt(3) - info.height * (-gt(5)), gt(0) + info.width * gt(1), gt(3))
  }
}
