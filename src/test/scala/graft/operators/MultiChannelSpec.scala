package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}
import org.apache.spark.sql.functions._

/** Multi-channel uncertainty merge (kd_tree.py:821-859 across channels) and
  * dynamic-grid EWA (ewa/_ll2cr.pyx:66). */
class MultiChannelSpec extends SparkSpec {

  test("weightedMulti uncertainty matches the single-channel path per channel") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val src = (1 to 300).map(i =>
      (i.toLong, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10,
        rnd.nextInt(50).toDouble, rnd.nextInt(90).toDouble))
      .toDF("src_id", "lon", "lat", "va", "vb")
    val tgtDf = (1 to 40).map(i =>
      (i.toLong, rnd.nextDouble() * 16 - 8, rnd.nextDouble() * 16 - 8)).toDF("dst_id", "lon", "lat")
    val wf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      d2 => exp(-d2 / lit(4.0))

    val multi = KnnResample.weightedMulti(src, tgtDf, 3.0, 8, Seq("va", "vb"), wf,
      planar = true, uncertainty = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap

    val a = KnnResample.weighted(src.withColumnRenamed("va", "value"), tgtDf, 3.0, 8,
      "value", wf, uncertainty = true, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap
    val b = KnnResample.weighted(src.withColumnRenamed("vb", "value"), tgtDf, 3.0, 8,
      "value", wf, uncertainty = true, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap

    assert(multi.keySet == a.keySet && multi.keySet == b.keySet)
    multi.foreach { case (id, m) =>
      assert(approx(m.getAs[Double]("va"), a(id).getAs[Double]("value"), 1e-9))
      assert(approx(m.getAs[Double]("stddev_va"), a(id).getAs[Double]("stddev"), 1e-9))
      assert(approx(m.getAs[Double]("vb"), b(id).getAs[Double]("value"), 1e-9))
      assert(approx(m.getAs[Double]("stddev_vb"), b(id).getAs[Double]("stddev"), 1e-9))
      assert(m.getAs[Long]("n_va") == a(id).getAs[Long]("n"))
      assert(m.getAs[Long]("n_vb") == b(id).getAs[Long]("n"))
    }
  }

  test("weightedMulti uncertainty masks NaN/null per channel without cross-poisoning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      val va = if (i % 17 == 0) Double.NaN else rnd.nextInt(50).toDouble
      (i.toLong, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10,
        va, rnd.nextInt(90).toDouble)
    }
    val src = rows.toDF("src_id", "lon", "lat", "va", "vb")
    val tgtDf = (1 to 30).map(i =>
      (i.toLong, rnd.nextDouble() * 16 - 8, rnd.nextDouble() * 16 - 8)).toDF("dst_id", "lon", "lat")
    val wf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      d2 => exp(-d2 / lit(4.0))

    val multi = KnnResample.weightedMulti(src, tgtDf, 3.0, 8, Seq("va", "vb"), wf,
      planar = true, uncertainty = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap

    // va must match the single-channel run over the pre-filtered source;
    // vb must match the single-channel run over the UNfiltered source
    // (the NaN rows still have valid vb and still count for vb)
    val aClean = KnnResample.weighted(
      src.filter(!isnan(col("va"))).withColumnRenamed("va", "value"),
      tgtDf, 3.0, 8, "value", wf, uncertainty = true, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap
    val bAll = KnnResample.weighted(src.withColumnRenamed("vb", "value"), tgtDf, 3.0, 8,
      "value", wf, uncertainty = true, planar = true)
      .collect().map(r => r.getAs[Long]("dst_id") -> r).toMap

    multi.foreach { case (id, m) =>
      assert(!m.getAs[Double]("vb").isNaN && !m.getAs[Double]("stddev_vb").isNaN)
      assert(approx(m.getAs[Double]("vb"), bAll(id).getAs[Double]("value"), 1e-9))
      assert(m.getAs[Long]("n_vb") == bAll(id).getAs[Long]("n"))
      // the masked channel never reports NaN stats; where the neighbour
      // SET is unaffected by the dropped rows, values match the clean run
      assert(!m.getAs[Double]("va").isNaN && !m.getAs[Double]("stddev_va").isNaN)
      aClean.get(id).foreach { ac =>
        if (m.getAs[Long]("n_va") == ac.getAs[Long]("n") && m.getAs[Long]("n_va") == m.getAs[Long]("n_vb"))
          assert(approx(m.getAs[Double]("va"), ac.getAs[Double]("value"), 1e-9))
      }
    }
  }

  test("weightedMulti uncertainty: <2 valid neighbours -> NULL stddev, shared n kept") {
    val s = spark
    import s.implicits._
    val src = Seq((1L, 0.4, 0.0, Double.NaN, 3.0), (2L, -0.4, 0.0, 7.0, 5.0))
      .toDF("src_id", "lon", "lat", "va", "vb")
    val tgt = Seq((10L, 0.0, 0.0)).toDF("dst_id", "lon", "lat")
    val r = KnnResample.weightedMulti(src, tgt, 3.0, 8, Seq("va", "vb"),
      d2 => exp(-d2), planar = true, uncertainty = true).collect()(0)
    assert(r.getAs[Long]("n") == 2L) // shared count: both joined neighbours
    assert(r.getAs[Long]("n_va") == 1L && r.getAs[Long]("n_vb") == 2L)
    assert(r.isNullAt(r.fieldIndex("stddev_va")), "single-sample stddev must be NULL, not 0.0")
    assert(!r.isNullAt(r.fieldIndex("stddev_vb")))
    assert(r.getAs[Double]("va") == 7.0) // mean over the one valid neighbour
  }

  test("streaming EWA (flatMapGroupsWithState) matches the batch pipeline after scan flush") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    // running-total aggregation after flatMapGroupsWithState: the static
    // late-row check does not apply (see ewaRunningMean scaladoc)
    s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val area = AreaDef("ewa_s", Crs.fromProj4("+proj=longlat"), 20, 10, 0, 0, 20, 10)
    val mem = MemoryStream[(java.sql.Timestamp, Int, Int, Double, Double, Double)]
    val stream = mem.toDF.toDF("ts", "y", "x", "lon", "lat", "value")
    val partials = graft.streaming.StreamingOps.ewaStream(
      stream, area, rowsPerScan = 5, flushDelayMs = 1000, watermark = "0 seconds")
    val query = graft.streaming.StreamingOps.ewaRunningMean(partials)
      .writeStream.format("memory").queryName("ewa_stream_test")
      .outputMode("complete").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
      // two complete scans (y 0..4 and 5..9) on a clean grid: u = x+0.5, v = y+0.5
      val pixels = for { y <- 0 until 10; x <- 0 until 20 } yield
        (y, x, x + 0.5, 10.0 - (y + 0.5), (y * 3 + x).toDouble % 17)
      mem.addData(pixels.map { case (y, x, lo, la, v) => (t0, y, x, lo, la, v) })
      query.processAllAvailable()
      // advance the watermark far past the scans' flush deadline, twice:
      // the timeout fires on the batch AFTER the watermark moves
      val later = new java.sql.Timestamp(t0.getTime + 3600L * 1000)
      mem.addData(Seq((later, 1000, 0, 0.5, 9.5, 1.0)))
      query.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp(later.getTime + 1000), 1000, 1, 1.5, 9.5, 1.0)))
      query.processAllAvailable()

      val got = s.table("ewa_stream_test").collect()
        .map(r => r.getAs[Long]("cell") -> r.getAs[Double]("value")).toMap
      val batch = EwaResample.resample(
        pixels.toDF("y", "x", "lon", "lat", "value"), area, rowsPerScan = 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(batch.nonEmpty)
      assert(got.keySet == batch.keySet,
        s"cells differ: extra=${got.keySet -- batch.keySet} missing=${batch.keySet -- got.keySet}")
      batch.foreach { case (c, v) => assert(approx(got(c), v, 1e-9), s"cell $c: ${got(c)} vs $v") }
    } finally {
      query.stop()
      s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    }
  }

  test("dynamic-grid EWA fits the footprint and matches the static grid (ll2cr_dynamic)") {
    val s = spark
    import s.implicits._
    // 20x10 swath on a longlat grid: lon 10.05..19.55 (x), lat 49.9 down (y)
    val sw = (for { y <- 0 until 20; x <- 0 until 10 } yield
      (y, x, 10.05 + x * 1.0, 49.9 - y * 0.5, (y * 10 + x).toDouble)).toDF("y", "x", "lon", "lat", "value")
    val crs = Crs.fromProj4("+proj=longlat")
    val (area, result) = EwaResample.resampleDynamic(sw, crs, cellWidth = 0.5, cellHeight = 0.5,
      rowsPerScan = 10, quantizeWeights = Some(7))
    // reference fit: ox = xmin = 10.05, oy = ymax = 49.9,
    // w = int((19.05 - 10.05) / 0.5) = 18, h = int((49.9 - 40.4) / 0.5) = 19
    assert(area.width == 18, s"w=${area.width}")
    assert(area.height == 19, s"h=${area.height}")
    assert(approx(area.xLL, 10.05) && approx(area.yUR, 49.9))
    assert(approx(area.xUR, 10.05 + 18 * 0.5) && approx(area.yLL, 49.9 - 19 * 0.5))
    // identical to running the static pipeline on the fitted area
    val static = EwaResample.resample(sw, area, rowsPerScan = 10, quantizeWeights = Some(7))
    val dyn = result.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val st = static.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dyn == st)
    assert(dyn.nonEmpty)
  }
}
