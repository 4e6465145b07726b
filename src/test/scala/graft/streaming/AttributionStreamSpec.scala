package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal
import java.sql.Timestamp

/** Stream-stream interval join (`StreamingOps.attributionJoin`) emits the
  * same pair set as the batch binned `Temporal.intervalJoin` on the same
  * events — Spark's native interval-join state machine vs the 2-bin
  * equi-join, two formulations of one semantics. */
class AttributionStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("stream pairs == batch intervalJoin pairs") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    // purchases: (ts, user, event_id); clicks: (ts, user, value)
    val purchases = Seq((ts(10), 1L, 100L), (ts(40), 1L, 101L),
      (ts(15), 2L, 102L), (ts(90), 3L, 103L))
    val clicks = Seq((ts(5), 1L, 1.0), (ts(10), 1L, 2.0), (ts(35), 1L, 4.0),
      (ts(14), 2L, 8.0), (ts(16), 2L, 16.0), (ts(80), 9L, 32.0))

    val pMem = MemoryStream[(Timestamp, Long, Long)]
    val cMem = MemoryStream[(Timestamp, Long, Double)]
    val out = StreamingOps.attributionJoin(
      pMem.toDF.toDF("ts", "user_id", "event_id"),
      cMem.toDF.toDF("ts", "user_id", "value"),
      window = "30 minutes", watermark = "5 minutes")
    val query = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      pMem.addData(purchases: _*)
      cMem.addData(clicks: _*)
      query.processAllAvailable()
      // advance both watermarks so every in-window pair is emitted
      pMem.addData((ts(600), 99L, 999L))
      cMem.addData((ts(600), 99L, 0.0))
      query.processAllAvailable()
      val got = s.table("attr_out")
        .filter($"p_event_id" =!= 999L)
        .select("p_event_id", "r_ts", "r_value").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2))).toSet

      val pDf = purchases.toDF("ts", "user_id", "event_id")
        .selectExpr("event_id", "user_id", "CAST(ts AS LONG) * 1000000 AS tus")
      val cDf = clicks.toDF("ts", "user_id", "value")
        .selectExpr("user_id", "CAST(ts AS LONG) * 1000000 AS tus", "value")
      val exp = Temporal.intervalJoin(pDf, cDf, "user_id", "tus",
          30L * 60L * 1000000L, "value", Seq("event_id", "user_id", "tus"))
        .select("event_id", "r_ts", "r_value").collect()
        .map(r => (r.getLong(0), r.getLong(1) / 1000L, r.getDouble(2))).toSet

      assert(exp.nonEmpty, "batch fixture must produce pairs")
      assert(got == exp, s"stream=$got batch=$exp")
    } finally query.stop()
  }
}
