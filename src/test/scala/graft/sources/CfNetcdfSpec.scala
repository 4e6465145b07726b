package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end `load_cf_area` over real NetCDF3 bytes: the fixtures under
  * src/test/resources/cf replicate the reference's CF test datasets
  * (`pyresample/test/test_utils/test_cf.py` _prepare_cf_nh10km /
  * _prepare_cf_goes / _prepare_cf_llwgs84 / _prepare_cf_llnocrs /
  * _prepare_cf_projected_packed_xy), written byte-level by
  * tools/make_nc_fixture.py from the public classic-format spec —
  * independently of the Scala reader. Golden values are the ones that
  * reference suite asserts (shape, first/last axis values, extents). */
class CfNetcdfSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/cf/$name")
    assert(url != null, s"missing fixture /cf/$name (run tools/make_nc_fixture.py)")
    url.getPath
  }

  test("nh10km: polar_stereographic discovery, km axes, record dim") {
    val nc = NetCdf3.read(fixture("nh10km.nc"))
    assert(nc.version === 1)
    assert(nc.dims.map(d => (d.name, d.length)) ===
      Seq(("time", 0), ("yc", 1120), ("xc", 760)))
    // discovery with no hints, with the field variable, and with the
    // grid-mapping container + explicit axes must agree (test_cf.py:210)
    val (a0, i0) = CfArea.loadCfArea(nc)
    val (a1, i1) = CfArea.loadCfArea(nc, variable = Some("ice_conc"))
    val (a2, _) = CfArea.loadCfArea(nc, variable = Some("Polar_Stereographic_Grid"),
      y = Some("yc"), x = Some("xc"))
    assert(a0 === a1 && a1 === a2)
    assert((a1.height, a1.width) === (1120, 760))
    // km axes -> metre extents; first cell centre at -3845000 m
    assert(a1.xLL === -3850000.0 && a1.xUR === 3750000.0)
    assert(a1.yLL === -5350000.0 && a1.yUR === 5850000.0)
    val px = (a1.xUR - a1.xLL) / a1.width
    assert(a1.xLL + 0.5 * px === -3845000.0) // xc[0] golden
    // CRS: stere with the fixture's ellipsoid
    assert(a1.crs.params("proj") === "stere")
    assert(a1.crs.params("lat_0").toDouble === 90.0)
    assert(a1.crs.params("lat_ts").toDouble === 70.0)
    assert(a1.crs.params("lon_0").toDouble === -45.0)
    // cf_info (test_cf.py:229): lon/lat guessed for the field variable,
    // absent for the grid-mapping container query
    assert(i1.typeOfGridMapping === "polar_stereographic")
    assert(i1.gridMappingVariable === "Polar_Stereographic_Grid")
    assert(i1.x.varname === "xc" && i1.y.varname === "yc")
    assert(i1.x.unit === Some("km"))
    assert(i1.lat === Some("lat") && i1.lon === Some("lon"))
    assert(i0.lat === Some("lat"))
    val (_, iGm) = CfArea.loadCfArea(nc, variable = Some("Polar_Stereographic_Grid"),
      y = Some("yc"), x = Some("xc"))
    assert(iGm.lat === None && iGm.lon === None)
  }

  test("goes: CDF-2, radians axes scaled by satellite height, payload read") {
    val nc = NetCdf3.read(fixture("goes.nc"))
    assert(nc.version === 2)
    val (adef, info) = CfArea.loadCfArea(nc, variable = Some("C13"))
    assert(info.gridMappingVariable === "GOES-East")
    assert(info.typeOfGridMapping === "geostationary")
    // the reference asserts these exact post-conversion values
    // (test_cf.py:248): radians * perspective_point_height
    assert(info.x.varname === "x" && info.x.first === -3627271.2913)
    assert(info.y.varname === "y" && info.y.last === 1583173.6575)
    assert(info.x.unit === Some("m"))
    assert(adef.crs.params("proj") === "geos")
    assert(adef.crs.params.get("sweep") === Some("x"))
    assert(adef.crs.params("h").toDouble === 35786023.0)
    assert((adef.height, adef.width) === (15, 25))
    // payload: deterministic ((r*25+c)%97)/8 pattern, exact in float32
    val data = nc.readDoubles("C13")
    assert(data.length === 15 * 25)
    val expected = (0 until 15 * 25).map(i => (i % 97).toDouble / 8.0)
    assert(data.toSeq === expected)
  }

  test("llwgs84: latitude_longitude grid mapping, degree axes") {
    val nc = NetCdf3.read(fixture("llwgs84.nc"))
    for (args <- Seq(
        CfArea.loadCfArea(nc),
        CfArea.loadCfArea(nc, variable = Some("temp")),
        CfArea.loadCfArea(nc, variable = Some("crs"),
          y = Some("lat"), x = Some("lon")))) {
      val (adef, _) = args
      assert((adef.height, adef.width) === (19, 37))
      // increasing lat axis: the extent is stored flipped, exactly like
      // upstream (_get_area_extent_from_cf_axis); x centres at -180 + 10k
      assert(adef.xLL === -185.0 && adef.xUR === 185.0)
      assert(adef.yLL === 95.0 && adef.yUR === -95.0)
      assert(adef.crs.params("proj") === "longlat")
    }
    val (_, info) = CfArea.loadCfArea(nc, variable = Some("temp"))
    assert(info.lat === Some("lat") && info.lon === Some("lon"))
    // semi_major + inverse_flattening ellipsoid
    val (adef, _) = CfArea.loadCfArea(nc)
    assert(adef.crs.params("a").toDouble === 6378137.0)
    assert(math.abs(adef.crs.params("b").toDouble - 6356752.314245179) < 1e-6)
  }

  test("llnocrs: no grid_mapping at all falls back to WGS84 latlon") {
    val (adef, info) = CfArea.loadCfArea(fixture("llnocrs.nc"))
    assert(info.gridMappingVariable === "latlon_default")
    assert(info.typeOfGridMapping === "latitude_longitude")
    assert(adef.crs.params("proj") === "longlat")
    assert((adef.height, adef.width) === (19, 37))
    assert(adef.xLL === -185.0 && adef.xUR === 185.0)
  }

  test("packed: scale_factor/add_offset axes and multi-record reads") {
    val nc = NetCdf3.read(fixture("packed.nc"))
    val (adef, info) = CfArea.loadCfArea(nc, variable = Some("temp"))
    assert(info.typeOfGridMapping === "stereographic")
    // int16 axes decoded through scale*10 + offset 1000: [0, 1000, 2000]
    assert(info.x.first === 0.0 && info.x.last === 2000.0 && info.x.spacing === 1000.0)
    assert(info.y.first === 2000.0 && info.y.last === 0.0 && info.y.sign === -1.0)
    assert(adef.xLL === -500.0 && adef.xUR === 2500.0)
    assert(adef.yLL === -500.0 && adef.yUR === 2500.0)
    assert(adef.crs.params("k_0").toDouble === 1.0)
    // two record variables -> interleaved, 4-byte-padded record stride
    assert(nc.numRecs === 3)
    assert(nc.readDoubles("tseries").toSeq === Seq(11.0, 22.0, 33.0))
    assert(nc.readDoubles("tflag").toSeq === Seq(1.0, 0.0, 1.0))
    assert(nc.readDoubles("temp").length === 9)
  }

  test("end-to-end: CF file -> grid DataFrame -> quick resample to a coarser area") {
    // the reference's core workflow (load_cf_area + data -> resample),
    // entirely offline: goes.nc's C13 payload onto a 5x3 aggregate of
    // its own geostationary grid via the Quick (linesample) container.
    val spark = graft.functions.GraftExtensions.install(
      org.apache.spark.sql.SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val nc = NetCdf3.read(fixture("goes.nc"))
    val (df, adef) = CfArea.readGrid(spark, nc, "C13")
    assert(df.count() === 15L * 25L)
    // every cell id in range, values match the fixture's payload pattern
    val sum = df.agg(org.apache.spark.sql.functions.sum("C13")).head().getDouble(0)
    val expected = (0 until 15 * 25).map(i => (i % 97).toDouble / 8.0).sum
    assert(math.abs(sum - expected) < 1e-9)
    // resample onto the 5x 3 downscaled area: quick linesample picks the
    // source pixel containing each coarse-cell centre
    val coarse = adef.aggregate(5, 5)
    val img = new graft.operators.ImageContainerQuick(
      graft.operators.AreaImage(df, adef, Seq("C13")))
    val out = img.resample(coarse)
    assert(out.area === coarse)
    assert(out.data.count() === (coarse.width.toLong * coarse.height))
    val vals = out.data.orderBy("cell")
      .select("C13").collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 96.0 / 8.0))
    // a variable stored with TRANSPOSED (x, y) dims must map to the
    // identical row-major cells — the silent-transposition guard
    val (dfT, _) = CfArea.readGrid(spark, nc, "C13T")
    val a = df.orderBy("cell").select("C13").collect().map(_.getDouble(0)).toSeq
    val b = dfT.orderBy("cell").select("C13T").collect().map(_.getDouble(0)).toSeq
    assert(a === b, "transposed-dims variable must decode to the same raster")
  }

  test("polar_stereographic accepts the scale-factor form of the scale definition") {
    import graft.core.AreaConfig
    // CF allows scale_factor_at_projection_origin instead of
    // standard_parallel; it must land as k_0, not be dropped
    val num = Map(
      "latitude_of_projection_origin" -> 90.0,
      "straight_vertical_longitude_from_pole" -> -45.0,
      "scale_factor_at_projection_origin" -> 0.97,
      "semi_major_axis" -> 6378137.0).get _
    val p = AreaConfig.cfProjParams("polar_stereographic", num, _ => None)
    assert(p("k_0").toDouble === 0.97)
    assert(!p.contains("lat_ts"), "k_0 form must not also pin a standard parallel")
    // and the built CRS scales by k: forward x at k=0.97 is 0.97x of k=1
    val k97 = graft.core.Crs.fromParams(p)
    val k1 = graft.core.Crs.fromParams(p.updated("k_0", "1.0"))
    val (x97, _) = k97.forward(10.0, 70.0); val (x1, _) = k1.forward(10.0, 70.0)
    assert(math.abs(x97 / x1 - 0.97) < 1e-9)
  }

  test("lambert_cylindrical_equal_area constructs a cea CRS (r10)") {
    import graft.core.AreaConfig
    // standard_parallel form
    val num = Map(
      "longitude_of_central_meridian" -> 15.0,
      "standard_parallel" -> 30.0,
      "semi_major_axis" -> 6378137.0,
      "inverse_flattening" -> 298.257223563).get _
    val p = AreaConfig.cfProjParams("lambert_cylindrical_equal_area", num, _ => None)
    assert(p("proj") === "cea" && p("lat_ts").toDouble === 30.0)
    val crs = graft.core.Crs.fromParams(p)
    val (x, y) = crs.forward(16.0, 45.0)
    val (lon2, lat2) = crs.inverse(x, y)
    assert(math.abs(lon2 - 16.0) < 1e-9 && math.abs(lat2 - 45.0) < 1e-9)
    // scale-factor form lands as k_0, not a dropped attribute
    val numK = Map(
      "longitude_of_central_meridian" -> 0.0,
      "scale_factor_at_projection_origin" -> 0.9,
      "semi_major_axis" -> 6371000.0).get _
    val pK = AreaConfig.cfProjParams("lambert_cylindrical_equal_area", numK, _ => None)
    assert(pK("k_0").toDouble === 0.9 && !pK.contains("lat_ts"))
    val (xk, _) = graft.core.Crs.fromParams(pK).forward(10.0, 0.0)
    val (x1, _) = graft.core.Crs.fromParams(pK.updated("k_0", "1.0")).forward(10.0, 0.0)
    assert(math.abs(xk / x1 - 0.9) < 1e-12)
  }

  test("parameter validation mirrors upstream error contracts") {
    val nc = NetCdf3.read(fixture("nh10km.nc"))
    // x without y
    assertThrows[IllegalArgumentException](
      CfArea.loadCfArea(nc, variable = Some("ice_conc"), x = Some("xc")))
    // gm container without explicit axes
    assertThrows[IllegalArgumentException](
      CfArea.loadCfArea(nc, variable = Some("Polar_Stereographic_Grid")))
    // unknown variable
    assertThrows[NoSuchElementException](
      CfArea.loadCfArea(nc, variable = Some("nope")))
    // wrong-axis explicit name
    assertThrows[IllegalArgumentException](
      CfArea.loadCfArea(nc, variable = Some("ice_conc"), y = Some("xc"), x = Some("yc")))
  }

  test("modis_sinu: sinusoidal grid mapping on the MODIS sphere (r9)") {
    val (a, info) = CfArea.loadCfArea(NetCdf3.read(fixture("modis_sinu.nc")))
    assert(info.typeOfGridMapping === "sinusoidal")
    assert((a.width, a.height) === (120, 120))
    assert(a.crs.params("proj") === "sinu")
    assert(a.crs.params("a").toDouble === 6371007.181)
    // tile h18v04: x in [0, T], y in [4T, 5T] with T = 10 deg of arc
    val tile = 1111950.5196666666
    assert(math.abs(a.xLL - 0.0) < 1e-6 && math.abs(a.xUR - tile) < 1e-6)
    assert(math.abs(a.yLL - 4 * tile) < 1e-6 && math.abs(a.yUR - 5 * tile) < 1e-6)
    // the top edge of the v04 row sits at 50N (within the 10-digit
    // truncation of the tile-size literal, ~5e-9 deg)
    val (_, lat) = a.crs.inverse(a.xLL, a.yUR)
    assert(math.abs(lat - 50.0) < 1e-6)
  }

  test("utm_tmerc: CF transverse_mercator discovers a UTM 33N grid (r9)") {
    val (a, info) = CfArea.loadCfArea(NetCdf3.read(fixture("utm_tmerc.nc")))
    assert(info.typeOfGridMapping === "transverse_mercator")
    assert((a.width, a.height) === (60, 50))
    assert(a.crs.params("proj") === "tmerc")
    assert(a.crs.params("k_0").toDouble === 0.9996)
    assert(a.crs.params("x_0").toDouble === 500000.0)
    // extent: cell centres 401km..519km +- 1km half-pixel
    assert(a.xLL === 400000.0 && a.xUR === 520000.0)
    assert(a.yUR === 6300000.0 && a.yLL === 6200000.0)
    // central meridian at easting 500000; the grid sits in zone 33
    val (x, _) = a.crs.forward(15.0, 56.5)
    assert(math.abs(x - 500000.0) < 1e-6)
    val (lonC, latC) = a.crs.inverse((a.xLL + a.xUR) / 2, (a.yLL + a.yUR) / 2)
    assert(lonC > 12 && lonC < 18 && latC > 55 && latC < 58)
  }

  test("rotated_pole: CF rotated_latitude_longitude loads end-to-end (r10)") {
    // r9's most-hit remaining gap: the mapping VALIDATED in discovery but
    // threw at CRS construction. Now it constructs the ob_tran kernel.
    val (a, info) = CfArea.loadCfArea(NetCdf3.read(fixture("rotated_pole.nc")))
    assert(info.typeOfGridMapping === "rotated_latitude_longitude")
    assert((a.width, a.height) === (40, 30))
    assert(a.crs.params("proj") === "ob_tran")
    assert(a.crs.params("o_lat_p").toDouble === 39.25)
    assert(a.crs.params("lon_0").toDouble === 18.0) // 180 + (-162)
    // extent: rotated degrees, centres -9.75..9.75 x -7.25..7.25 + half px
    assert(math.abs(a.xLL - -10.0) < 1e-9 && math.abs(a.xUR - 10.0) < 1e-9)
    assert(math.abs(a.yLL - -7.5) < 1e-9 && math.abs(a.yUR - 7.5) < 1e-9)
    // the grid centre is true (18E, 50.75N) — the COSMO/CORDEX anchor
    val (cx, cy) = a.crs.forward(18.0, 50.75)
    assert(math.abs(cx) < 1e-9 && math.abs(cy) < 1e-9)
    // and the whole fixture window sits over central Europe
    val (lonC, latC) = a.crs.inverse(0.0, 0.0)
    assert(math.abs(lonC - 18.0) < 1e-9 && math.abs(latC - 50.75) < 1e-9)
  }

  test("zero-spacing axis fails loudly instead of poisoning the extent (r9)") {
    val nc = NetCdf3.read(fixture("badaxis.nc"))
    val e = intercept[IllegalArgumentException](
      CfArea.loadCfArea(nc, variable = Some("band1")))
    assert(e.getMessage.contains("zero spacing"), e.getMessage)
  }

  test("NetCDF-4/HDF5 sniff: helpful conversion pointer, not a magic mismatch (r9)") {
    val f = java.nio.file.Files.createTempFile("nc4", ".nc")
    try {
      // the HDF5 superblock signature + padding
      java.nio.file.Files.write(f,
        Array[Int](0x89, 'H', 'D', 'F', 0x0D, 0x0A, 0x1A, 0x0A, 0, 0, 0, 0)
          .map(_.toByte))
      val e = intercept[IllegalArgumentException](NetCdf3.read(f.toString))
      assert(e.getMessage.contains("nccopy -k classic"), e.getMessage)
      assert(e.getMessage.contains("NetCDF-4/HDF5"))
    } finally java.nio.file.Files.deleteIfExists(f)
  }
}
