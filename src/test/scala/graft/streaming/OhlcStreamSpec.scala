package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal

/** `StreamingOps.ohlcStream` vs batch `Temporal.ohlcBars`: identical bars
  * (bit-equal doubles) with events split across micro-batches in
  * non-chronological order — min_by/max_by on the (ts, id) struct are
  * declarative aggregates, so partial-merge order cannot change the
  * result. */
class OhlcStreamSpec extends SparkSpec {

  test("streaming OHLC bars match batch bit-for-bit across micro-batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val rnd = new scala.util.Random(41L)
    // (event_id, series, epoch-seconds) — two series, ts ties included
    val events = (1L to 90L).map { i =>
      (i, if (i % 2 == 0) "buy" else "sell",
        (i % 30) * 20L, math.floor(rnd.nextDouble() * 10000) / 100.0)
    }
    val interval = 100L // seconds per bar

    val batch = Temporal.ohlcBars(
        events.toDF("event_id", "event_type", "tsec", "value")
          .selectExpr("event_id", "event_type", "tsec * 1000000 AS tus", "value"),
        interval = interval * 1000000L)
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, String, Long, Double)]
    val withTs = mem.toDF.toDF("event_id", "event_type", "tsec", "value")
      .selectExpr("event_id", "event_type", "CAST(tsec AS TIMESTAMP) AS ts", "value")
    val out = StreamingOps.ohlcStream(withTs, windowDuration = s"$interval seconds")
    val query = out.writeStream.format("memory").queryName("ohlc_out")
      .outputMode("complete").start()
    try {
      // split mid-bar and out of order: partial bars must merge exactly
      val (a, b) = rnd.shuffle(events).splitAt(40)
      mem.addData(a: _*)
      query.processAllAvailable()
      mem.addData(b: _*)
      query.processAllAvailable()
      val streamed = s.table("ohlc_out")
        .selectExpr("event_type", "unix_micros(window.start) AS bar_ts",
          "open", "high", "low", "close", "n_events", "sum_v")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, "stream bars must equal batch bars")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }
}
