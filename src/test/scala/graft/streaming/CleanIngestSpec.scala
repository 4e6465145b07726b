package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp

/** Streaming ingest cleaner (`StreamingOps.cleanIngest`): quality gates
  * drop short/noisy docs BEFORE dedup state is touched, language ID
  * matches the batch `TextAnalysis.langId` argmax (including the
  * deterministic tie-break), and duplicates inside the watermark are
  * dropped. */
class CleanIngestSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("gates + per-row langid + dedup on one stream") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val en = "the cat and the dog sat of to is in it"
    val de = "der hund und die katze ist ein tier im haus"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingOps.cleanIngest(
      mem.toDF.toDF("ts", "doc_id", "text"),
      watermark = "10 minutes", minWords = 5)
    val query = out.writeStream.format("memory").queryName("clean_out")
      .outputMode("append").start()
    try {
      // all ts >= 1 min: epoch-0 event times sit AT the initial watermark
      // (0) and are late-dropped before the gates ever see them — which
      // would let these assertions pass without exercising the gates
      mem.addData(
        (ts(1), 1L, en), // kept, en (or its in-batch duplicate 4)
        (ts(1), 2L, "too short"), // dropped: < 5 words
        (ts(2), 3L, de), // kept, de
        (ts(3), 4L, en), // duplicate text of 1 in the SAME batch: one of {1,4} survives
        (ts(3), 5L, "xxx yyy zzz qqq www vvv")) // kept, no keyword hits -> null lang
      query.processAllAvailable()
      val got = s.table("clean_out")
        .select("doc_id", "pred_lang").as[(Long, Option[String])].collect().toMap
      val enSurvivor = got.keySet.intersect(Set(1L, 4L))
      assert(enSurvivor.size == 1, s"exactly one of the duplicate pair must survive: $got")
      assert(got.keySet == enSurvivor ++ Set(3L, 5L), s"got $got")
      assert(got(enSurvivor.head).contains("en") && got(3L).contains("de") && got(5L).isEmpty,
        s"got $got")
    } finally query.stop()
  }

  test("repetition gate drops modal-bigram-heavy docs on the stream") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val looped = "spam ham spam ham spam ham spam ham spam ham" // top2 "spam ham" 5/9 > 0.4
    val varied = "the cat and the dog sat of to is in it"       // modal bigram 1/10
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingOps.cleanIngest(
      mem.toDF.toDF("ts", "doc_id", "text"),
      watermark = "10 minutes", minWords = 5, maxTop2Frac = 0.4)
    val query = out.writeStream.format("memory").queryName("rep_out")
      .outputMode("append").start()
    try {
      // ts >= 1 min: epoch-0 event times sit AT the initial watermark (0)
      // and are discarded as late before any operator sees them
      mem.addData((ts(1), 1L, looped), (ts(1), 2L, varied))
      query.processAllAvailable()
      val got = s.table("rep_out").select("doc_id").as[Long].collect().toSet
      assert(got == Set(2L), s"repetitious doc must be gated: $got")
      // same inputs with the gate off: both survive, schema unchanged
      val gateless = StreamingOps.cleanIngest(
        Seq((ts(0), 1L, looped), (ts(0), 2L, varied)).toDF("ts", "doc_id", "text"),
        minWords = 5)
      assert(gateless.columns.toSeq == out.columns.toSeq)
    } finally query.stop()
  }

  test("per-row langid agrees with batch TextAnalysis.langId on documents") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExprs = StreamingOps.scoreDocs(docs)
      .select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val viaBatch = graft.operators.TextAnalysis.langId(docs)
      .select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // batch emits no row when there are no keyword hits; the per-row form
    // emits null — both flatten to None
    assert(viaExprs.size == docs.count(), "scoring is one row per doc")
    assert(viaBatch.nonEmpty, "fixture has docs with keyword hits")
    viaExprs.foreach { case (id, lang) =>
      assert(viaBatch.get(id).flatten == lang,
        s"doc $id: exprs $lang vs batch ${viaBatch.get(id).flatten}")
    }
  }
}
