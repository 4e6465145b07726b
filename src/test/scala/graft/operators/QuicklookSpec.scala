package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** Pixel-exact contract of the quicklook sink (S11, `plot.py:308` minus
  * the map underlay): vmin/vmax luminance scaling onto the RdBu_r /
  * gray ramps, absent cells transparent, PNG round-trip lossless. */
class QuicklookSpec extends SparkSpec {

  private def area(w: Int, h: Int) = AreaDef("ql", Crs.fromProj4("+proj=eqc"),
    w, h, 0, 0, w * 1000.0, h * 1000.0)

  test("render: extrema hit ramp endpoints, holes stay transparent") {
    val s = spark
    import s.implicits._
    // 3x2 grid, cell = row*3 + col; cell 4 missing
    val df = Seq((0L, 0.0), (1L, 5.0), (2L, 10.0), (3L, 2.5), (5L, 7.5))
      .toDF("cell", "v")
    val img = Quicklook.render(AreaImage(df, area(3, 2), Seq("v")), "v")
    assert(img.getWidth === 3 && img.getHeight === 2)
    assert(img.getRGB(0, 0) === 0xFF053061) // vmin -> dark blue (5,48,97)
    assert(img.getRGB(2, 0) === 0xFF67001F) // vmax -> dark red (103,0,31)
    assert(img.getRGB(1, 0) === 0xFFF7F7F7) // midpoint -> near-white
    assert((img.getRGB(0, 1) >>> 24) === 0xFF, "present cell opaque")
    assert(img.getRGB(1, 1) === 0, "missing cell (4) fully transparent")
  }

  test("render: explicit vmin/vmax clamp like imshow; gray ramp is linear") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, -100.0), (1L, 50.0), (2L, 200.0)).toDF("cell", "v")
    val img = Quicklook.render(AreaImage(df, area(3, 1), Seq("v")), "v",
      vmin = Some(0.0), vmax = Some(100.0), cmap = "gray")
    assert(img.getRGB(0, 0) === 0xFF000000) // clamped below
    assert(img.getRGB(2, 0) === 0xFFFFFFFF) // clamped above
    assert(img.getRGB(1, 0) === 0xFF808080) // t=0.5 -> round(127.5)=128
  }

  test("save: PNG signature on disk and lossless pixel round-trip") {
    val s = spark
    import s.implicits._
    val df = (0L until 12L).map(c => (c, (c % 5).toDouble)).toDF("cell", "v")
    val ai = AreaImage(df, area(4, 3), Seq("v"))
    val path = java.nio.file.Files.createTempDirectory("ql").resolve("q.png").toString
    Quicklook.save(path, ai, "v")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(bytes.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n').map(_.toByte.toByte))
    val back = javax.imageio.ImageIO.read(new java.io.File(path))
    val orig = Quicklook.render(ai, "v")
    for (y <- 0 until 3; x <- 0 until 4)
      assert(back.getRGB(x, y) === orig.getRGB(x, y), s"pixel ($x,$y)")
  }

  test("graticule overlay: meridians land on the right longlat columns; geos off-disk is artifact-free (r9)") {
    val s = spark
    import s.implicits._
    // 360x180 world grid, 1 deg/px: meridian at lon=0 -> pixel column 180
    val world = graft.core.AreaDef("w", graft.core.Crs.fromProj4("+proj=longlat"),
      360, 180, -180, -90, 180, 90)
    val df = (0L until (360L * 180)).map(c => (c, 1.0)).toDF("cell", "v")
    val img = Quicklook.renderWithGraticule(
      AreaImage(df, world, Seq("v")), "v", stepDeg = 90.0, vmin = Some(0.0), vmax = Some(2.0))
    // base color everywhere is the t=0.5 near-white; a graticule pixel differs
    val base = img.getRGB(50, 50)
    assert(img.getRGB(180, 50) !== base, "meridian 0E missing at column 180")
    assert(img.getRGB(90, 50) !== base, "meridian 90W missing at column 90")
    assert(img.getRGB(50, 90) !== base, "equator missing at row 90")
    assert(img.getRGB(51, 51) === base, "off-graticule pixel polluted")
    // geos disk: off-disk meridian segments lift the pen (no exceptions,
    // and the corner — far off the disk — stays untouched)
    val geos = graft.core.AreaDef("g",
      graft.core.Crs.fromProj4("+proj=geos +lon_0=0 +h=35785831 +a=6378169 +b=6356583.8"),
      100, 100, -5500000, -5500000, 5500000, 5500000)
    val gi = Quicklook.renderWithGraticule(
      AreaImage(df.limit(0), geos, Seq("v")), "v", stepDeg = 30.0)
    assert(gi.getRGB(0, 0) === 0, "corner beyond the disk must stay transparent")
  }

  test("render refuses oversized grids with an aggregate pointer (r9 scale guard)") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 1.0)).toDF("cell", "v")
    val big = AreaImage(df, area(100000, 100000), Seq("v")) // 10 GPx
    val e = intercept[IllegalArgumentException](Quicklook.render(big, "v"))
    assert(e.getMessage.contains("aggregate"), e.getMessage)
    assert(e.getMessage.contains("render budget"))
  }
}
