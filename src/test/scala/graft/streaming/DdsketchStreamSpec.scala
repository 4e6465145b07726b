package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch

/** `Sketch.ddsketchBuckets` under Structured Streaming: the bucket-count
  * sketch maintained incrementally over shuffled micro-batches equals the
  * batch sketch bit-for-bit — count partials merge order-independently,
  * the quantile sketch's streaming story. */
class DdsketchStreamSpec extends SparkSpec {

  test("streamed DDSketch bucket counts match batch bit-for-bit") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val rnd = new scala.util.Random(47L)
    val rows = (1 to 700).map { i =>
      (if (i % 2 == 0) "a" else "b", math.floor(rnd.nextDouble() * 50000) / 100.0 + 0.01)
    }
    val batch = Sketch.ddsketchBuckets(rows.toDF("k", "v"), "k", "v")
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(String, Double)]
    val out = Sketch.ddsketchBuckets(mem.toDF.toDF("k", "v"), "k", "v")
    val query = out.writeStream.format("memory").queryName("dds_out")
      .outputMode("complete").start()
    try {
      val (x, y) = rnd.shuffle(rows).splitAt(300)
      mem.addData(x: _*)
      query.processAllAvailable()
      mem.addData(y: _*)
      query.processAllAvailable()
      val streamed = s.table("dds_out").collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally query.stop()
  }
}
