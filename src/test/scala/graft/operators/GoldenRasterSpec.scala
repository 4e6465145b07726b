package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** Elementwise comparison against the reference's SHIPPED golden rasters
  * (`test/test_files/mask_test_*.dat`, used by `test_kd_tree.py:488-553`):
  * 800x800 = 640,000 pixels, each checked for the exact per-pixel
  * assignment the reference's PROJ+pykdtree pipeline produced. */
class GoldenRasterSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val areaD = AreaDef("areaD",
    Crs.fromProj4("+proj=stere +a=6378144 +b=6356759 +lat_0=50 +lat_ts=50 +lon_0=8"),
    800, 800, -1370912.72, -909968.64, 1029087.28, 1490031.36)

  private def loadDat(name: String): Array[Double] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/pyresample/test/test_files/$name")), "UTF-8")
    val vals = text.trim.split("\\s+").map(_.toDouble)
    assert(vals.length == 640000, s"$name: ${vals.length}")
    vals
  }

  private def gridTarget = areaD.grid(spark, withLonLat = true)
    .select(col("cell").as("dst_id"), col("lon"), col("lat"))

  test("fill footprint matches mask_test_fill_value.dat on every pixel (test_kd_tree.py:540-553)") {
    val s = spark
    import s.implicits._
    val src = (for { y <- 0 until 50; x <- 0 until 10 } yield
      ((y * 10 + x).toLong, 3.0 + x, 75.0 - y, 1.0)).toDF("src_id", "lon", "lat", "value")
    val filled = KnnResample.nearest(src, gridTarget, 50000.0, Seq("value"))
      .select("dst_id").collect().map(_.getLong(0)).toSet
    val expectedFillMask = loadDat("mask_test_fill_value.dat") // 1.0 = unfilled
    var mismatches = 0
    var cell = 0
    while (cell < 640000) {
      val expectFilled = expectedFillMask(cell) == 0.0
      if (filled.contains(cell.toLong) != expectFilled) mismatches += 1
      cell += 1
    }
    assert(mismatches == 0, s"$mismatches of 640000 pixels differ")
  }

  test("quick resample from the MSG geos disk matches mask_grid.dat on every pixel (test_image.py:102-114)") {
    val s = spark
    import s.implicits._
    // source: full-globe MSG geostationary image 3712x3712, columns >= 1865
    // masked; target: areaD. Quick resampling = projection linesample (J9):
    // the source mask is a pure function of the source column index, so no
    // source table is materialized — the per-pixel check is entirely about
    // the geos forward projection and index arithmetic.
    val msg = AreaDef("msg_full",
      Crs.fromProj4("+proj=geos +lon_0=0 +h=35785831.0 +a=6378169.0 +b=6356584.0"),
      3712, 3712, -5568742.4, -5568742.4, 5568742.4, 5568742.4)
    val frac = GradientResample.withFractionalIndices(
      areaD.grid(spark, withLonLat = true).select(col("cell").as("dst_id"), col("lon"), col("lat")),
      msg)
    val gotMask = frac
      .withColumn("c", floor(col("src_col")).cast("long"))
      .withColumn("r", floor(col("src_row")).cast("long"))
      .select(col("dst_id"),
        when(isnan(col("src_col")) || isnan(col("src_row")) ||
          col("c") < 0 || col("c") >= 3712 || col("r") < 0 || col("r") >= 3712, 1)
          .when(col("c") >= 1865, 1)
          .otherwise(0).as("m"))
      .collect().map(row => row.getAs[Long]("dst_id") -> row.getAs[Int]("m")).toMap
    val expected = loadDat("mask_grid.dat")
    var mismatches = 0
    var cell = 0
    while (cell < 640000) {
      if (gotMask(cell.toLong) != expected(cell).toInt) mismatches += 1
      cell += 1
    }
    assert(mismatches == 0, s"$mismatches of 640000 pixels differ")
  }

  test("masked nearest matches mask_test_nearest_{data,mask}.dat on every pixel (test_kd_tree.py:488-505)") {
    val s = spark
    import s.implicits._
    // data = 1 (x<5) / 2 (x>=5); mask = 1 for x>=5 (masked travels as channel)
    val src = (for { y <- 0 until 50; x <- 0 until 10 } yield
      ((y * 10 + x).toLong, 3.0 + x, 75.0 - y,
        if (x >= 5) 2.0 else 1.0, if (x >= 5) 1.0 else 0.0))
      .toDF("src_id", "lon", "lat", "value", "m")
    val got = KnnResample.nearest(src, gridTarget, 50000.0, Seq("value", "m"))
      .collect().map(r => r.getAs[Long]("dst_id") ->
        (r.getAs[Double]("value"), r.getAs[Double]("m"))).toMap
    val expData = loadDat("mask_test_nearest_data.dat")
    val expMask = loadDat("mask_test_nearest_mask.dat")
    // fill_value=None variant (test_kd_tree.py:564-581): mask = gathered
    // mask OR unfilled
    val expFullFill = loadDat("mask_test_full_fill.dat")
    var mismatches = 0
    var cell = 0
    while (cell < 640000) {
      got.get(cell.toLong) match {
        case Some((v, m)) =>
          if (v != expData(cell) || m != expMask(cell)) mismatches += 1
          if (expFullFill(cell) != m) mismatches += 1
        case None =>
          // unfilled: reference fills data with 0, mask stays 0
          if (expData(cell) != 0.0 || expMask(cell) != 0.0) mismatches += 1
          if (expFullFill(cell) != 1.0) mismatches += 1
      }
      cell += 1
    }
    assert(mismatches == 0, s"$mismatches of 640000 pixels differ")
  }
}
