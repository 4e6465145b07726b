package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** End-to-end golden sums from the reference test suite
  * (`test_kd_tree.py:115-285`): full 800x800 stere grid resampling of the
  * canonical 50x10 synthetic swath. These depend on our stere kernel
  * agreeing with PROJ to sub-pixel precision across 640k pixels. */
class GoldenE2eSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // `test_kd_tree.py:35-48` areaD
  private val areaD = AreaDef("areaD",
    Crs.fromProj4("+proj=stere +a=6378144 +b=6356759 +lat_0=50 +lat_ts=50 +lon_0=8"),
    800, 800, -1370912.72, -909968.64, 1029087.28, 1490031.36)

  // data = y*x, lons = 3+x, lats = 75-y on (50, 10)
  private lazy val swath5010 = {
    val s = spark
    import s.implicits._
    (for { y <- 0 until 50; x <- 0 until 10 } yield
      ((y * 10 + x).toLong, 3.0 + x, 75.0 - y, (y * x).toDouble))
      .toDF("src_id", "lon", "lat", "value")
  }

  private def gridTarget = areaD.grid(spark, withLonLat = true)
    .select(col("cell").as("dst_id"), col("lon"), col("lat"))

  test("nearest 50x10 -> 800x800 cross sum == 15874591 (test_kd_tree.py:115-125)") {
    val res = KnnResample.nearest(swath5010, gridTarget, 50000.0, Seq("value"))
    val total = res.agg(sum("value")).head().getDouble(0)
    assert(total == 15874591.0, s"got $total")
  }

  test("nearest empty swath -> no pixels (test_kd_tree.py:169-178)") {
    val s = spark
    import s.implicits._
    val far = (for { y <- 0 until 50; x <- 0 until 10 } yield
      ((y * 10 + x).toLong, 165.0 + x, 75.0 - y, (y * x).toDouble))
      .toDF("src_id", "lon", "lat", "value")
    assert(KnnResample.nearest(far, gridTarget, 50000.0, Seq("value")).count() == 0)
  }

  test("gauss sparse cross sum ~ 15387753.9852 with fill -1 (test_kd_tree.py:276-285)") {
    val res = KnnResample.gauss(swath5010, gridTarget, 50000.0, 25000.0, "value")
    val row = res.agg(sum("value"), count(lit(1))).head()
    val matchedSum = row.getDouble(0); val matched = row.getLong(1)
    val total = matchedSum + (-1.0) * (800L * 800L - matched)
    assert(math.abs(total - 15387753.9852) < 1.0, s"got $total")
  }

  test("nearest 1d: area grid -> 500 points cross sum == 35821299 (test_kd_tree.py:157-167)") {
    val s = spark
    import s.implicits._
    // source = the area's own pixels, value = (row index) * (col index)
    val src = areaD.grid(spark, withLonLat = true)
      .select(col("cell").as("src_id"), col("lon"), col("lat"),
        (floor(col("cell") / 800) * (col("cell") % 800)).cast("double").as("value"))
    val tgt = (0 until 500).map(i => (i.toLong, 3.0 + i / 100.0, 75.0 - i / 10.0))
      .toDF("dst_id", "lon", "lat")
    val res = KnnResample.nearest(src, tgt, 50000.0, Seq("value"))
    val total = res.agg(sum("value")).head().getDouble(0)
    assert(total == 35821299.0, s"got $total")
  }
}
