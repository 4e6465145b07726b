package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Streaming abandonment (`StreamingOps.abandonmentStream`, the
  * event-time-timeout pattern) equals the batch RANGE-window anti-join
  * (`Temporal.abandonment`) on the same feed — conversions with their
  * earliest qualifying purchase AND watermark-expired abandonments. */
class AbandonStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("stream == batch: conversions and timeout-abandonments") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    // window = 10 minutes
    val win = 600000000L
    val feed = Seq(
      (ts(1), 1L, 1L, "view"),      // converts at min 5
      (ts(5), 1L, 2L, "purchase"),
      (ts(6), 1L, 3L, "view"),      // no purchase within 10 -> abandoned
      (ts(20), 2L, 4L, "view"),     // purchase exactly at edge: converts
      (ts(30), 2L, 5L, "purchase"),
      (ts(40), 3L, 6L, "view"),     // same-instant purchase: NOT after -> abandoned
      (ts(40), 3L, 7L, "purchase"))

    val mem = MemoryStream[(Timestamp, Long, Long, String)]
    val out = StreamingOps.abandonmentStream(
      mem.toDF.toDF("ts", "user_id", "event_id", "event_type"),
      windowUs = win, watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("aband_out")
      .outputMode("append").start()
    try {
      mem.addData(feed: _*)
      query.processAllAvailable()
      mem.addData((ts(600), 99L, 999L, "noop")) // advance watermark far out
      query.processAllAvailable()
      val got = s.table("aband_out")
        .select("event_id", "next_conv_us", "abandoned").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet
      val batch = Temporal.abandonment(
          feed.toDF("ts0", "user_id", "event_id", "event_type")
            .withColumn("tus", expr("unix_micros(ts0)")),
          fromType = "view", toType = "purchase", windowUs = win)
        .select("event_id", "next_conv_us", "abandoned").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet
      assert(batch.nonEmpty && batch.exists(_._3 == 1) && batch.exists(_._3 == 0))
      assert(got === batch, s"stream=$got batch=$batch")
    } finally query.stop()
  }
}
