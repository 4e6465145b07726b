package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp

/** Streaming exact dedup (`StreamingOps.dedupStream`): first copy per
  * digest passes, later copies inside the watermark are dropped, and the
  * digest state is EVICTED once the watermark passes — a duplicate farther
  * apart than the watermark re-emits, which is exactly the bounded-state
  * contract (unbounded-gap dedup belongs to the batch pass). */
class DedupStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("dedup within watermark; digest state evicted after it") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingOps.dedupStream(
      mem.toDF.toDF("ts", "doc_id", "text"), watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: A twice + B -> A once, B once
      mem.addData((ts(0), 1L, "doc A"), (ts(1), 2L, "doc A"), (ts(1), 3L, "doc B"))
      query.processAllAvailable()
      // batch 2: A again inside the watermark -> dropped
      mem.addData((ts(5), 4L, "doc A"))
      query.processAllAvailable()
      // batch 3: push the watermark far past A's state lifetime
      mem.addData((ts(60), 5L, "doc C"))
      query.processAllAvailable()
      // batch 4: A after eviction -> re-emitted (bounded-state contract)
      mem.addData((ts(61), 6L, "doc A"))
      query.processAllAvailable()

      val got = s.table("dedup_out").select("doc_id").as[Long].collect().sorted.toSeq
      // ids 1 and 2 are the same digest in the same micro-batch: exactly
      // one survives (which one is not guaranteed within a batch)
      assert(got.length == 4 && (got.head == 1L || got.head == 2L) &&
        got.drop(1) == Seq(3L, 5L, 6L),
        s"expected one of {1,2} then 3,5 and post-eviction 6, got $got")
    } finally query.stop()
  }
}
