package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** Bucket resampler semantics — `bucket/__init__.py` contracts
  * (FIXTURES.md §4): skipna true/false, out-of-grid drop, fractions,
  * abs-max sign, grid fill. */
class BucketSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val area = AreaDef("t", Crs.fromProj4("+proj=longlat"), 10, 10, 0, 0, 10, 10)
  private def bucket = BucketResampler(area)

  private lazy val swath = {
    val s = spark
    import s.implicits._
    Seq(
      // three points in cell (row 9 from top = lat 0..1? lat .5 -> row 9), col 0
      (0.5, 0.5, 1.0, "a"),
      (0.6, 0.6, 3.0, "a"),
      (0.7, 0.7, Double.NaN, "b"),
      // one point in another cell
      (5.5, 5.5, -7.0, "b"),
      // out of grid -> dropped
      (55.0, 5.0, 99.0, "a"),
      (5.0, 95.0, 99.0, "a"))
      .toDF("lon", "lat", "value", "cat")
  }

  private def cellOf(lon: Double, lat: Double): Long = area.cellOf(lon, lat)

  test("count drops out-of-grid points (A1/A2)") {
    val m = bucket.count(swath).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(cellOf(0.5, 0.5) -> 3L, cellOf(5.5, 5.5) -> 1L))
  }

  test("sum skipna=true ignores NaN (A3, bucket/__init__.py:205-259)") {
    val m = bucket.sum(swath, "value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(cellOf(0.5, 0.5)) == 4.0)
    assert(m(cellOf(5.5, 5.5)) == -7.0)
  }

  test("sum skipna=false poisons the bucket (bucket/__init__.py:261-267)") {
    val m = bucket.sum(swath, "value", skipna = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(cellOf(0.5, 0.5)).isNaN)
    assert(m(cellOf(5.5, 5.5)) == -7.0)
  }

  test("average ignores NaN (A4)") {
    val m = bucket.average(swath, "value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(cellOf(0.5, 0.5)) == 2.0)
  }

  test("min/max skipna semantics (A5)") {
    val rows = bucket.minMax(swath, "value", skipna = false).collect()
    val m = rows.map(r => r.getAs[Long]("cell") -> (r.getAs[Double]("min"), r.getAs[Double]("max"))).toMap
    assert(m(cellOf(0.5, 0.5))._1.isNaN && m(cellOf(0.5, 0.5))._2.isNaN)
    assert(m(cellOf(5.5, 5.5)) == ((-7.0, -7.0)))
    val mSkip = bucket.minMax(swath, "value").collect()
      .map(r => r.getAs[Long]("cell") -> (r.getAs[Double]("min"), r.getAs[Double]("max"))).toMap
    assert(mSkip(cellOf(0.5, 0.5)) == ((1.0, 3.0)))
  }

  test("abs_max keeps sign (A6, bucket/__init__.py:334-372)") {
    val m = bucket.absMax(swath, "value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(cellOf(5.5, 5.5)) == -7.0)
    assert(m(cellOf(0.5, 0.5)) == 3.0)
  }

  test("fractions sum to 1 per cell (A7)") {
    val rows = bucket.fractions(swath, "cat").collect()
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("fraction")).sum - 1.0) < 1e-12)
    }
    val c0 = byCell(cellOf(0.5, 0.5)).map(r => r.getAs[String]("cat") -> r.getAs[Double]("fraction")).toMap
    assert(c0("a") == 2.0 / 3 && c0("b") == 1.0 / 3)
  }

  test("golden bucket indices on polar stere WGS84 (test_bucket.py:128-135)") {
    // eurol area; expected x_idxs [1710,1710,1707,1705], y_idxs [465,465,459,455]
    val eurol = graft.core.AreaDef("eurol",
      Crs.fromProj4("+proj=stere +lat_0=90.0 +lat_ts=60.0 +lon_0=0.0 +a=6378137 +b=6356752.314245179"),
      2560, 2048, -3780000.0, -7644000.0, 3900000.0, -1500000.0)
    val pts = Seq((25.0, 60.0), (25.0, 60.00001), (25.0, 60.2), (25.0, 60.3))
    val expected = Seq((1710, 465), (1710, 465), (1707, 459), (1705, 455))
    pts.zip(expected).foreach { case ((lon, lat), (ex, ey)) =>
      val (px, py) = eurol.crs.forward(lon, lat)
      val xi = math.floor(eurol.fracCol(px)).toInt
      val yi = math.floor(eurol.fracRow(py)).toInt
      assert((xi, yi) == ((ex, ey)), s"($lon,$lat) -> ($xi,$yi) expected ($ex,$ey)")
    }
  }

  test("golden bucket indices on latlong incl. out-of-grid (test_bucket.py:138-152)") {
    val a = graft.core.AreaDef("t", Crs.fromProj4("+proj=longlat"), 2, 2, -10, -10, 10, 10)
    val pts = Seq(
      (-10.0, -10.0), (-9.9, -9.9), (-0.1, -0.1), (0.0, 0.0), (0.1, 0.1),
      (9.9, 9.9), (10.0, 10.0), (-10.1, 0.0), (0.0, 10.1))
    // reference x/y indices with -1 when the pair is out of grid
    val exp = Seq((-1, -1), (0, 1), (0, 1), (1, 1), (1, 0), (1, 0), (-1, -1), (-1, -1), (-1, -1))
    pts.zip(exp).foreach { case ((lon, lat), (ex, ey)) =>
      val cell = a.cellOf(lon, lat)
      val got = if (cell < 0) (-1, -1) else ((cell % 2).toInt, (cell / 2).toInt)
      assert(got == ((ex, ey)), s"($lon,$lat) -> $got expected ($ex,$ey)")
    }
  }

  test("toGrid fills empty buckets (full_result scatter)") {
    val g = bucket.toGrid(bucket.count(swath), lit(0L))
    assert(g.count() == 100)
    val filled = g.filter(col("n") > 0).count()
    assert(filled == 2)
  }
}
