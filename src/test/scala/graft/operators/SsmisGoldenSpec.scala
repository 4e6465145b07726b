package graft.operators

import graft.SparkSpec
import graft.sources.Npz
import org.apache.spark.sql.functions._

/** Real-data golden: the reference's SSMIS swath self-map
  * (`test_swath.py:48-62` test_self_map): gauss resampling of 300k real
  * satellite FOVs onto themselves (radius 70 km, sigma 56.5 km) must sum
  * to 668848.0 x 100 within the reference's own tolerance (+-0.5 x 100). */
class SsmisGoldenSpec extends SparkSpec {

  private val npzPath = "/root/reference/pyresample/test/test_files/ssmis_swath.npz"

  test("SSMIS swath self-map gauss sum matches the reference golden") {
    assume(new java.io.File(npzPath).exists, "reference test file not present")
    val arr = Npz.readNpz(npzPath)("data")
    assert(arr.shape == Seq(300240, 3), s"unexpected shape ${arr.shape}")
    val fill = -10000000000.0
    // screen out fill values exactly like the reference (test_swath.py:41-46)
    val pts = (0 until arr.rows).flatMap { r =>
      val lon = arr(r, 0); val lat = arr(r, 1); val tb = arr(r, 2)
      if (lon != fill && lat != fill && tb != fill) Some((lon, lat, tb)) else None
    }
    info(s"${pts.size} valid FOVs of ${arr.rows}")

    val s = spark
    import s.implicits._
    val src = pts.zipWithIndex
      .map { case ((lon, lat, tb), i) => (i.toLong, lon, lat, tb) }
      .toDF("src_id", "lon", "lat", "value")
      .repartition(8)
      .cache()
    val tgt = src.select(col("src_id").as("dst_id"), col("lon"), col("lat"))

    val res = KnnResample.gauss(src, tgt, radius = 70000.0, sigma = 56500.0, "value")
    val total = res.agg(sum("value")).head().getDouble(0)
    info(f"sum/100 = ${total / 100}%.3f (golden 668848.0)")
    assert(math.abs(total / 100 - 668848.0) < 0.5,
      s"self-map sum ${total / 100} differs from the reference golden 668848.0")
    src.unpersist()
  }
}
