package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Streaming abandonment (`StreamingOps.abandonmentStream`, the
  * event-time-timeout pattern) equals the batch RANGE-window anti-join
  * (`Temporal.abandonment`) on the same feed — conversions with their
  * earliest qualifying purchase AND watermark-expired abandonments,
  * INCLUDING cross-micro-batch out-of-order arrivals (a purchase
  * arriving before its view, and a later-arriving earlier purchase
  * beating one already seen). */
class AbandonStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  private val win = 600000000L // 10 minutes in µs

  private def runBoth(batches: Seq[Seq[(Timestamp, Long, Long, String)]]): Unit = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext
    val name = s"aband_out_${System.nanoTime()}"
    val mem = MemoryStream[(Timestamp, Long, Long, String)]
    val out = StreamingOps.abandonmentStream(
      mem.toDF.toDF("ts", "user_id", "event_id", "event_type"),
      windowUs = win, watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      mem.addData((ts(100000), 99L, 999999L, "noop")) // watermark → far future
      query.processAllAvailable()
      val got = s.table(name)
        .select("event_id", "next_conv_us", "abandoned").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet
      val feed = batches.flatten
      val batch = Temporal.abandonment(
          feed.toDF("ts0", "user_id", "event_id", "event_type")
            .withColumn("tus", expr("unix_micros(ts0)")),
          fromType = "view", toType = "purchase", windowUs = win)
        .select("event_id", "next_conv_us", "abandoned").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))).toSet
      assert(batch.nonEmpty)
      assert(got === batch, s"stream=$got batch=$batch")
    } finally query.stop()
  }

  test("stream == batch: in-order conversions and timeout-abandonments") {
    runBoth(Seq(Seq(
      (ts(1), 1L, 1L, "view"),      // converts at min 5
      (ts(5), 1L, 2L, "purchase"),
      (ts(6), 1L, 3L, "view"),      // no purchase within 10 -> abandoned
      (ts(20), 2L, 4L, "view"),     // purchase exactly at edge: converts
      (ts(30), 2L, 5L, "purchase"),
      (ts(40), 3L, 6L, "view"),     // same-instant purchase: NOT after -> abandoned
      (ts(40), 3L, 7L, "purchase"))))
  }

  test("stream == batch: cross-batch out-of-order arrivals") {
    runBoth(Seq(
      // batch 1: purchase arrives BEFORE its view (view comes next batch);
      // plus a view whose first-seen conversion is the LATER one
      Seq((ts(50), 4L, 10L, "purchase"),
        (ts(45), 5L, 11L, "view"), (ts(52), 5L, 12L, "purchase")),
      // batch 2 (watermark is now 42): view 4 at 45 matches the held
      // purchase at 50; purchase 48 beats user 5's already-seen 52
      Seq((ts(45), 4L, 13L, "view"),
        (ts(48), 5L, 14L, "purchase"))))
  }
}
