package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp

/** Streaming sessionization (`StreamingOps.sessionize`, native
  * session_window): sessions split on >gap inactivity, merge within it,
  * and emit once the watermark passes their close. */
class SessionizeSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("session_window splits on gap and emits after watermark close") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val mem = MemoryStream[(Timestamp, Long, Double)]
    val out = StreamingOps.sessionize(
      mem.toDF.toDF("ts", "user_id", "value"), gap = "10 minutes", watermark = "5 minutes")
    val query = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: events at 1, 5, 9 min (one session: gaps < 10)
      //         then at 30 min (new session: 21-min gap)
      // user 2: single event at 4 min
      mem.addData(
        (ts(1), 1L, 1.0), (ts(5), 1L, 2.0), (ts(9), 1L, 4.0),
        (ts(30), 1L, 8.0), (ts(4), 2L, 16.0))
      query.processAllAvailable()
      // push the watermark far past every session's close so all emit
      mem.addData((ts(120), 9L, 0.0))
      query.processAllAvailable()
      val got = s.table("sess_out")
        .select("user_id", "n_events", "sum_v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.contains((1L, 3L, 7.0)), s"first session of user 1: $got")
      assert(got.contains((1L, 1L, 8.0)), s"second session of user 1: $got")
      assert(got.contains((2L, 1L, 16.0)), s"user 2 singleton: $got")
    } finally query.stop()
  }
}
