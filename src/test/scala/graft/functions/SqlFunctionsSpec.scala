package graft.functions

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** SQL-registered function surface. */
class SqlFunctionsSpec extends SparkSpec {

  test("registered functions are callable from spark.sql") {
    val world = AreaDef("world", Crs.fromProj4("+proj=longlat"), 360, 180, -180, -90, 180, 90)
    val stere = AreaDef("st", Crs.fromProj4("+proj=stere +lat_0=90 +a=6371000"),
      100, 100, -2e6, -2e6, 2e6, 2e6)
    SqlFunctions.register(spark, Map("world" -> world, "stere" -> stere))

    val r = spark.sql(
      """SELECT haversine_m(0.0, 0.0, 90.0, 0.0) AS h,
        |       wrap_lon(190.0) AS w,
        |       world_cell(0.5, 89.5) AS c,
        |       stere_fwd_x(10.0, 80.0) AS sx,
        |       cosine_sim(array(1.0, 0.0), array(1.0, 0.0)) AS cs
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getAs[Double]("h") - 6370997.0 * math.Pi / 2) < 1e-3)
    assert(r.getAs[Double]("w") == -170.0)
    assert(r.getAs[Long]("c") == world.cellOf(0.5, 89.5))
    assert(!r.getAs[Double]("sx").isNaN)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
  }

  test("registry gauss resampler matches the golden value") {
    val s = spark
    import s.implicits._
    val src = Seq(
      (1L, 11.280789, 56.011037, 1.0),
      (2L, 12.649354, 55.629675, 2.0),
      (3L, 12.080402, 55.641535, 3.0)).toDF("src_id", "lon", "lat", "value")
    val tgt = Seq((1L, 12.562036, 55.715613)).toDF("dst_id", "lon", "lat")
    val r = graft.operators.ResamplerRegistry.get("gauss")(src, tgt, 50000.0)
    val out = r.compute(src, "value").collect()
    assert(out.length == 1)
    assert(approx(out(0).getAs[Double]("value"), 2.2020729, 1e-5))
  }
}
