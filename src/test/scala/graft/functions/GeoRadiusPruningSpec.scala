package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HaversineDist native expression + GeoRadiusPruning optimizer rule:
  * the derived bbox must be semantically invisible (same rows) and
  * physically visible (PushedFilters on the parquet scan). */
class GeoRadiusPruningSpec extends SparkSpec {

  /** The rule installed on the shared session (the spark.sql.extensions
    * route via GraftExtensions needs a fresh session; extraOptimizations
    * attaches to a live one). */
  private lazy val extSpark: SparkSession = {
    spark.experimental.extraOptimizations = Seq(GeoRadiusPruning)
    spark
  }

  test("haversine expression value matches the Column formula") {
    val s = spark
    import s.implicits._
    val df = Seq((12.0, 55.0)).toDF("lon", "lat")
    val both = df.select(
      HaversineDist(col("lon"), col("lat"), lit(0.0), lit(0.0)).as("a"),
      GeoFunctions.haversine(col("lon"), col("lat"), lit(0.0), lit(0.0)).as("b")).head()
    assert(approx(both.getDouble(0), both.getDouble(1), 1e-6))
  }

  test("radius filter rows unchanged by the rule; bbox reaches the scan") {
    // note: extSpark replaces the base session for this test's DataFrames
    val s = extSpark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geo").toString + "/pts"
    (for (i <- 0 until 5000) yield
      (i.toLong, (i % 360) - 180 + 0.5, (i % 180) - 90 + 0.5))
      .toDF("id", "lon", "lat").write.parquet(dir)
    val pts = s.read.parquet(dir)

    val filtered = pts.filter(
      HaversineDist(col("lon"), col("lat"), lit(10.0), lit(50.0)) <= lit(500000.0))
    // ground truth by direct computation without the rule pattern
    val expected = pts.collect().count { r =>
      HaversineDist.compute(r.getDouble(1), r.getDouble(2), 10.0, 50.0) <= 500000.0
    }
    assert(filtered.count() == expected.toLong, s"expected $expected")

    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      (physical.contains("GreaterThanOrEqual(lat") || physical.contains("GreaterThanOrEqual(`lat`")),
      s"no pushed lat bound in:\n${physical.take(2000)}")
  }

  test("reduceToArea bounds for a tmerc/UTM target push to the parquet scan (r9)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geo_utm").toString + "/pts"
    // full 2-degree world lattice so the zone-33 footprint is populated
    (for (lo <- -179 until 180 by 2; la <- -85 until 86 by 2) yield
      ((lo * 1000 + la).toLong, lo + 0.5, la + 0.5))
      .toDF("id", "lon", "lat").write.parquet(dir)
    val pts = s.read.parquet(dir)
    val area = graft.queries.Queries.utmArea()
    val red = graft.operators.DataReduce.reduceToArea(pts, area, 50000.0)
    // stored-column predicate: the bbox must reach the parquet scan
    val physical = red.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("GreaterThanOrEqual(lat"),
      s"no pushed lat bound for the UTM target:\n${physical.take(2000)}")
    // and the bbox is tight: zone 33's ~12-19E, ~54.5-59N footprint
    val rows = red.select("lon", "lat").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(0) > 5 && r.getDouble(0) < 25))
    assert(rows.forall(r => r.getDouble(1) > 50 && r.getDouble(1) < 62))

    // r10: the rotated-pole target's bounds also push to the scan and
    // bound the CORDEX-like window over Europe (true lon/lat, even
    // though the grid's own axes are rotated degrees)
    val rot = graft.operators.DataReduce.reduceToArea(
      pts, graft.queries.Queries.rotatedArea(), 0.0)
    val physRot = rot.queryExecution.executedPlan.toString
    assert(physRot.contains("PushedFilters") && physRot.contains("GreaterThanOrEqual(lat"),
      s"no pushed lat bound for the rotated-pole target:\n${physRot.take(2000)}")
    val rrows = rot.select("lon", "lat").collect()
    assert(rrows.nonEmpty)
    assert(rrows.forall(r => r.getDouble(1) > 30 && r.getDouble(1) < 72),
      "rotated-pole reduce band must bound the European window")
  }

  test("rule is idempotent and handles pole/date-line circles") {
    val s = extSpark
    import s.implicits._
    val pts = Seq((179.9, 0.0, 1L), (-179.9, 0.0, 2L), (0.0, 89.9, 3L), (0.0, 0.0, 4L))
      .toDF("lon", "lat", "id")
    // date-line circle around (180, 0)
    val nearDateline = pts.filter(
      HaversineDist(col("lon"), col("lat"), lit(179.95), lit(0.0)) <= lit(100000.0))
    assert(nearDateline.collect().map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // polar circle keeps the pole-side point
    val nearPole = pts.filter(
      HaversineDist(col("lon"), col("lat"), lit(0.0), lit(89.95)) <= lit(100000.0))
    assert(nearPole.collect().map(_.getAs[Long]("id")).toSet == Set(3L))
    // running the optimizer twice must not grow the condition
    val once = nearDateline.queryExecution.optimizedPlan
    val twice = GeoRadiusPruning(once)
    assert(twice fastEquals once)
  }
}
