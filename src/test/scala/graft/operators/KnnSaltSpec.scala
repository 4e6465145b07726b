package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew-salting for the k-NN cell join (SCALING.md "Knobs": dense-swath /
  * polar-convergence cells): the salt must be semantically invisible
  * (identical neighbour table for any salt) and physically effective (the
  * densest join key shrinks ~salt-fold). Fixture: a polar-convergence-style
  * hot spot — thousands of source points inside one radius-pitch cell —
  * plus a sparse background. */
class KnnSaltSpec extends SparkSpec {

  private val radius = 100000.0 // 100 km pitch

  private lazy val source = {
    val s = spark
    import s.implicits._
    val dense = for (i <- 0 until 4000) yield
      // ~0.3 x 0.3 degree blob near the pole-ward hot spot: one cell
      (i.toLong, 10.0 + (i % 64) * 0.005, 80.0 + (i / 64) * 0.005, i.toDouble)
    val sparse = for (i <- 0 until 500) yield
      (10000L + i, -170.0 + i * 0.67, -80.0 + (i % 160) * 0.9, i.toDouble)
    (dense ++ sparse).toDF("src_id", "lon", "lat", "value")
  }

  private lazy val target = {
    val s = spark
    import s.implicits._
    ((for (i <- 0 until 50) yield (i.toLong, 10.05 + (i % 10) * 0.03, 80.05 + (i / 10) * 0.03)) ++
      (for (i <- 0 until 30) yield (100L + i, -170.0 + i * 11.0, -79.0 + i * 5.0)))
      .toDF("dst_id", "lon", "lat")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getAs[Long]("dst_id"), r.getAs[Long]("src_id"),
      r.getAs[Int]("rank"))).toSet

  test("salted neighbour table is identical to unsalted (k=4)") {
    val plain = asSet(KnnResample.neighbours(source, target, radius, k = 4))
    val salted = asSet(KnnResample.neighbours(source, target, radius, k = 4, salt = 4))
    assert(plain.nonEmpty && salted == plain)
  }

  test("salted neighbour table is identical to unsalted (k=1 fast path)") {
    val plain = asSet(KnnResample.neighbours(source, target, radius, k = 1))
    val salted = asSet(KnnResample.neighbours(source, target, radius, k = 1, salt = 8))
    assert(plain.nonEmpty && salted == plain)
  }

  test("salting splits the hot cell: max rows per join key drops ~salt-fold") {
    val salt = 4
    val salted = source
      .withColumn("cx", floor(graft.functions.GeoFunctions.lonlat2x(col("lon"), col("lat")) / radius).cast("long"))
      .withColumn("cy", floor(graft.functions.GeoFunctions.lonlat2y(col("lon"), col("lat")) / radius).cast("long"))
      .withColumn("cz", floor(graft.functions.GeoFunctions.lonlat2z(col("lat")) / radius).cast("long"))
      .withColumn("_salt", pmod(hash(col("src_id")), lit(salt)))
    val unsaltedMax = salted.groupBy("cx", "cy", "cz").count()
      .agg(max("count")).head().getLong(0)
    val saltedMax = salted.groupBy("cx", "cy", "cz", "_salt").count()
      .agg(max("count")).head().getLong(0)
    assert(unsaltedMax >= 2000L, s"fixture lost its hot cell: $unsaltedMax")
    // murmur3 on sequential ids is near-uniform; 2x headroom on salt-fold
    assert(saltedMax * 2 <= unsaltedMax,
      s"salting ineffective: $saltedMax vs $unsaltedMax / $salt")
  }
}
