package graft

import graft.core.{AreaDef, Crs}
import graft.operators.{AreaImage, Dedup, KnnResample, Quicklook}
import graft.sources.CfArea

/** The README "Quickstart" block, verbatim (minus the session builder —
  * the suite shares one `GraftExtensions.install`ed session, which is the
  * same entry point the README shows). If this spec fails to compile or
  * run, the README is lying to users — fix BOTH. */
class QuickstartSpec extends SparkSpec {

  test("README quickstart: resample + dedup run and return sane results") {
    val s = spark
    import s.implicits._

    // 1. Nearest-neighbour resample: a 3-point swath onto a 4x4 LAEA grid.
    val swath = Seq(
      (0L, 11.280789, 56.011037, 1.0),
      (1L, 12.649354, 55.629675, 2.0),
      (2L, 12.080402, 55.641535, 3.0)
    ).toDF("src_id", "lon", "lat", "value")
    val area = AreaDef("quick",
      Crs.fromProj4("+proj=laea +lat_0=56 +lon_0=12 +a=6371228 +b=6371228"),
      width = 4, height = 4, -150000, -150000, 150000, 150000)
    val target = area.grid(s, withLonLat = true)
      .select($"cell".as("dst_id"), $"lon", $"lat")
    val raster = KnnResample.nearest(swath, target,
      radius = 60000.0, valueCols = Seq("value"))
    val cells = raster.as[(Long, Double)].collect().toMap
    assert(cells.nonEmpty && cells.size <= 16, s"got ${cells.size} cells")
    assert(cells.values.forall(v => v == 1.0 || v == 2.0 || v == 3.0))

    // 2. MinHash-LSH near-duplicate pairs over a documents table.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"),
      (3L, "an entirely different document about spark engines")
    ).toDF("doc_id", "text")
    val dups = Dedup.minhashLsh(docs, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(dups.exists { case (d1, d2, j) => d1 == 1L && d2 == 2L && j >= 0.3 },
      s"expected the near-identical pair (1,2); got ${dups.mkString(", ")}")
    assert(!dups.exists { case (d1, d2, _) => d2 == 3L || d1 == 3L },
      "doc 3 shares no bigrams with 1/2 and must not verify")

    // 3. CF area discovery from a NetCDF3 file + a PNG quicklook of the
    // resampled raster.
    val ncPath = getClass.getResource("/cf/nh10km.nc").getPath
    val (fromCf, cfInfo) = CfArea.loadCfArea(ncPath)
    assert((fromCf.height, fromCf.width) === (1120, 760))
    assert(cfInfo.typeOfGridMapping === "polar_stereographic")
    val png = java.nio.file.Files.createTempDirectory("quick").resolve("q.png")
    Quicklook.save(png.toString,
      AreaImage(raster.withColumnRenamed("dst_id", "cell"), area, Seq("value")),
      channel = "value")
    assert(java.nio.file.Files.size(png) > 0)
  }
}
