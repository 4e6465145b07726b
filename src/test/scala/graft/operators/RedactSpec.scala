package graft.operators

import graft.SparkSpec
import graft.streaming.StreamingOps
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** TextAnalysis.redactPii: pattern coverage, replacement text, and the
  * streaming cleanIngest integration (scrub must land before scoring and
  * the dedup digest). */
class RedactSpec extends SparkSpec {

  test("emails, IPs and phone runs are counted and replaced in order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail a.user+tag@sub.example.org then 192.168.1.254 and 555-1234 done"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.ai one ip 10.0.0.1")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).orderBy("doc_id")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "n_redactions", "redacted")
      .collect()
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1 && out(0).getLong(3) == 1)
    assert(out(0).getString(5) == "mail <EMAIL> then <IP> and <PHONE> done")
    assert(out(1).getLong(4) == 0 && out(1).getString(5) == "no pii here at all")
    assert(out(2).getLong(1) == 2 && out(2).getLong(2) == 1 && out(2).getLong(4) == 3)
    assert(out(2).getString(5) == "two mails <EMAIL> <EMAIL> one ip <IP>")
  }

  test("cleanIngest(redact=true) scrubs before dedup digest and scoring") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)
    // identical docs except for DIFFERENT emails: after redaction both
    // become the same text, so the stream dedup must keep only one
    val a = "the cat and the dog wrote to alice@example.com is in it"
    val b = "the cat and the dog wrote to bob@other.net is in it"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingOps.cleanIngest(
      mem.toDF.toDF("ts", "doc_id", "text"),
      watermark = "10 minutes", minWords = 5, redact = true)
    val query = out.writeStream.format("memory").queryName("redact_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), 1L, a), (ts(2), 2L, b))
      query.processAllAvailable()
      val rows = s.table("redact_out").select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length == 1, s"post-redaction duplicates must collapse: ${rows.toSeq}")
      assert(rows.head._2.contains("<EMAIL>") && !rows.head._2.contains("@"),
        s"text must be scrubbed: ${rows.head._2}")
    } finally query.stop()
  }
}
