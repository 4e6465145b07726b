package graft.streaming

import graft.SparkSpec
import graft.operators.Temporal

/** `StreamingOps.decayedHistoryStream` vs batch
  * `Temporal.decayedHistory`: identical rows (bit-equal doubles) on an
  * in-order feed, including history carried across micro-batch
  * boundaries in keyed state. */
class DecayStreamSpec extends SparkSpec {

  test("streaming decayed history matches batch across micro-batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val rnd = new scala.util.Random(23L)
    val events = (1L to 120L).map { i =>
      (i, i % 5, i * 10L, math.floor(rnd.nextDouble() * 1000) / 8.0)
    }

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), Option(r.get(6)).map(_.asInstanceOf[Double]), r.getLong(7))

    val batch = Temporal.decayedHistory(
        events.toDF("event_id", "user_id", "tus", "value"), k = 8)
      .collect().map(key).toSet

    val mem = MemoryStream[(Long, Long, Long, Double)]
    val out = StreamingOps.decayedHistoryStream(
      mem.toDF.toDF("event_id", "user_id", "tus", "value"), k = 8).toDF()
    val query = out.writeStream.format("memory").queryName("decay_out")
      .outputMode("append").start()
    try {
      // two micro-batches: per-user history must carry across the boundary
      mem.addData(events.take(60): _*)
      query.processAllAvailable()
      mem.addData(events.drop(60): _*)
      query.processAllAvailable()
      val streamed = s.table("decay_out").collect().map(key).toSet
      assert(streamed == batch, "stream must reproduce the batch lag fold bit-for-bit")
      assert(streamed.size == 120)
    } finally query.stop()
  }
}
