package graft.operators

import graft.SparkSpec

/** kd-tree family golden values ported from the reference
  * (`test_kd_tree.py:50-113`, FIXTURES.md §2): 3-point swath, 1-point
  * target; nearest -> 2; gauss(sigma=25000, radius 50 km) -> 2.2020729;
  * custom w=1-d/100000 -> 2.4356757; gauss+uncertainty ->
  * (2.20206560694, 0.707115076173, 3). */
class KnnSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val source = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 11.280789, 56.011037, 1.0),
      (2L, 12.649354, 55.629675, 2.0),
      (3L, 12.080402, 55.641535, 3.0))
      .toDF("src_id", "lon", "lat", "value")
  }

  private lazy val target = {
    val s = spark
    import s.implicits._
    Seq((1L, 12.562036, 55.715613)).toDF("dst_id", "lon", "lat")
  }

  test("neighbours: all 3 within 100 km, ranked by distance") {
    val n = KnnResample.neighbours(source, target, 100000.0, 3).collect()
    assert(n.length == 3)
    val byRank = n.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("src_id"))
    assert(byRank.toSeq == Seq(2L, 3L, 1L)) // nearest is point 2
  }

  test("resample_nearest golden: value 2 (test_kd_tree.py:58-62)") {
    val r = KnnResample.nearest(source, target, 50000.0, Seq("value")).collect()
    assert(r.length == 1 && r(0).getAs[Double]("value") == 2.0)
  }

  test("resample_gauss golden: 2.2020729 (test_kd_tree.py:64-71)") {
    val r = KnnResample.gauss(source, target, 50000.0, 25000.0, "value").collect()
    assert(r.length == 1)
    assert(approx(r(0).getAs[Double]("value"), 2.2020729, 1e-5),
      s"got ${r(0).getAs[Double]("value")}")
  }

  test("resample_custom golden: 2.4356757 (test_kd_tree.py:73-83)") {
    val r = KnnResample.weighted(source, target, 50000.0, 8, "value",
      d2 => lit(1.0) - sqrt(d2) / lit(100000.0)).collect()
    assert(r.length == 1)
    assert(approx(r(0).getAs[Double]("value"), 2.4356757, 1e-5),
      s"got ${r(0).getAs[Double]("value")}")
  }

  test("gauss with uncertainty golden: (2.20206560694, 0.707115076173, 3) (test_kd_tree.py:86-101)") {
    val sigma = graft.functions.GeoFunctions.fwhm2sigma(41627.730557884883)
    val r = KnnResample.gauss(source, target, 100000.0, sigma, "value",
      uncertainty = true).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(approx(row.getAs[Double]("value"), 2.20206560694, 1e-5), s"mean ${row.get(1)}")
    assert(approx(row.getAs[Double]("stddev"), 0.707115076173, 1e-5), s"stddev ${row.get(2)}")
    assert(row.getAs[Long]("n") == 3L)
  }

  test("custom with uncertainty golden: (2.32193149, 0.81817972, 3) (test_kd_tree.py:103-117)") {
    val r = KnnResample.weighted(source, target, 100000.0, 8, "value",
      d2 => lit(1.0) - sqrt(d2) / lit(100000.0), uncertainty = true).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(approx(row.getAs[Double]("value"), 2.32193149, 1e-5), s"mean ${row.get(1)}")
    assert(approx(row.getAs[Double]("stddev"), 0.81817972, 1e-5), s"stddev ${row.get(2)}")
    assert(row.getAs[Long]("n") == 3L)
  }

  test("multi-channel weighted merge shares neighbours and weights (kd_tree.py:607-615)") {
    val s = spark
    import s.implicits._
    val multi = Seq(
      (1L, 11.280789, 56.011037, 1.0, 10.0),
      (2L, 12.649354, 55.629675, 2.0, 20.0),
      (3L, 12.080402, 55.641535, 3.0, 30.0))
      .toDF("src_id", "lon", "lat", "ch1", "ch2")
    val r = KnnResample.weightedMulti(multi, target, 50000.0, 8, Seq("ch1", "ch2"),
      d2 => exp(-d2 / lit(25000.0 * 25000.0))).collect()
    assert(r.length == 1)
    assert(approx(r(0).getAs[Double]("ch1"), 2.2020729, 1e-5))
    assert(approx(r(0).getAs[Double]("ch2"), 22.020729, 1e-4))
  }

  test("per-channel weight functions hit both goldens at once (kd_tree.py:192-253)") {
    val s = spark
    import s.implicits._
    val multi = Seq(
      (1L, 11.280789, 56.011037, 1.0, 1.0),
      (2L, 12.649354, 55.629675, 2.0, 2.0),
      (3L, 12.080402, 55.641535, 3.0, 3.0))
      .toDF("src_id", "lon", "lat", "cg", "cc")
    val r = KnnResample.weightedMultiPerChannel(multi, target, 50000.0, 8, Seq(
      "cg" -> (d2 => exp(-d2 / lit(25000.0 * 25000.0))), // gauss sigma 25000
      "cc" -> (d2 => lit(1.0) - sqrt(d2) / lit(100000.0)))) // custom 1 - d/1e5
      .collect()
    assert(r.length == 1)
    assert(approx(r(0).getAs[Double]("cg"), 2.2020729, 1e-5))
    assert(approx(r(0).getAs[Double]("cc"), 2.4356757, 1e-5))
  }

  test("radius cut: no neighbours -> empty result, no fabricated rows") {
    val r = KnnResample.nearest(source, target, 1000.0, Seq("value"))
    assert(r.count() == 0)
  }

  test("carry payloads ride the heap: values, nulls, and ordering") {
    val s = spark
    import s.implicits._
    // null channel value + a second channel; winners' payloads must match a
    // plain join-back on src_id, and nulls must survive the heap round-trip
    val src = Seq(
      (1L, 11.280789, 56.011037, Some(1.0), 10.0),
      (2L, 12.649354, 55.629675, None, 20.0),
      (3L, 12.080402, 55.641535, Some(3.0), 30.0))
      .toDF("src_id", "lon", "lat", "v1", "v2")
    val viaCarry = KnnResample.neighbours(src, target, 100000.0, 3, carry = Seq("v1", "v2"))
      .select("dst_id", "src_id", "rank", "v1", "v2").collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Int]("rank"),
        Option(r.getAs[Any]("v1")), r.getAs[Double]("v2"))).sortBy(_._2)
    assert(viaCarry.map(_._1).toSeq == Seq(2L, 3L, 1L))
    assert(viaCarry.map(_._3).toSeq == Seq(None, Some(3.0), Some(1.0)))
    assert(viaCarry.map(_._4).toSeq == Seq(20.0, 30.0, 10.0))
  }

  test("neighboursAgg array equals exploded neighbours, rank order") {
    val exploded = KnnResample.neighbours(source, target, 100000.0, 3, carry = Seq("value"))
      .orderBy("rank")
      .collect().map(r => (r.getAs[Double]("dist2"), r.getAs[Long]("src_id"), r.getAs[Double]("value")))
    val agg = KnnResample.neighboursAgg(source, target, 100000.0, 3, carry = Seq("value"))
      .collect()
    assert(agg.length == 1)
    val cand = agg(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("cand")
      .map(r => (r.getAs[Double]("dist2"), r.getAs[Long]("src_id"), r.getAs[Double]("value"))).toSeq
    assert(cand == exploded.toSeq)
    assert(cand.map(_._1) == cand.map(_._1).sorted) // ascending dist2
  }

  test("cell-join exactness vs brute force on a lattice") {
    val s = spark
    import s.implicits._
    // 20x20 source lattice, 30 targets; radius chosen to straddle cells
    val src = (0 until 400).map { i =>
      (i.toLong, (i % 20) * 0.5 - 5.0, (i / 20) * 0.5 - 5.0, i.toDouble)
    }.toDF("src_id", "lon", "lat", "value")
    val tgts = (0 until 30).map { i => (i.toLong, i * 0.31 - 4.5, i * 0.17 - 2.5) }
    val tgt = tgts.toDF("dst_id", "lon", "lat")
    val got = KnnResample.neighbours(src, tgt, 1.2, 1, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r.getAs[Long]("src_id")).toMap
    // brute force on the driver
    val srcPts = (0 until 400).map(i => (i.toLong, (i % 20) * 0.5 - 5.0, (i / 20) * 0.5 - 5.0))
    tgts.foreach { case (id, tlon, tlat) =>
      val inR = srcPts
        .map { case (sid, slon, slat) =>
          (sid, (tlon - slon) * (tlon - slon) + (tlat - slat) * (tlat - slat))
        }
        .filter(_._2 <= 1.2 * 1.2)
      if (inR.isEmpty) assert(!got.contains(id))
      else assert(got(id) == inR.minBy(t => (t._2, t._1))._1, s"target $id")
    }
  }
}
