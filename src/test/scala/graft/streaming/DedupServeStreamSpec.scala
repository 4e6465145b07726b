package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Streaming ingest dedup against the persisted MinHash index
  * (`StreamingOps.dedupServe`, r11): micro-batches must reproduce the
  * batch `dedupAgainstMinhashIndex` decision bit-for-bit, and an
  * `appendMinhashIndex` refresh between batches must take effect on the
  * next micro-batch with zero restart. */
class DedupServeStreamSpec extends SparkSpec {

  test("streamed micro-batches == batch dedup; index refresh picked up next batch") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val refA = ref.filter(col("doc_id") % 4 === 0)
    val refB = ref.filter(col("doc_id") % 4 === 2)
    val dir = java.nio.file.Files.createTempDirectory("mh_serve").toString
    Dedup.writeMinhashIndex(refA, dir)

    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(incoming.length >= 10)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), Option(r.get(2)).map(_.toString), r.getLong(3))
    def batchExpected() = Dedup.dedupAgainstMinhashIndex(
        incoming.toSeq.toDF("doc_id", "text"), dir)
      .select(col("doc_id"), col("keep"), col("dup_of"), col("n_ref_dups"))
      .collect().map(key).toSet

    val beforeRefresh = batchExpected()
    var perBatch = List.empty[Set[(Long, Boolean, Option[String], Long)]]
    val mem = MemoryStream[(Long, String)]
    val query = StreamingOps.dedupServe(mem.toDF.toDF("doc_id", "text"), dir) { out =>
      perBatch.synchronized {
        perBatch :+= out.select(col("doc_id"), col("keep"), col("dup_of"), col("n_ref_dups"))
          .collect().map(key).toSet
      }
    }
    try {
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
      // refresh the index UNDER the live stream
      Dedup.appendMinhashIndex(refB, dir)
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
    } finally query.stop()

    assert(perBatch.length === 2)
    assert(perBatch(0) === beforeRefresh, "batch 1 must equal the pre-refresh batch run")
    assert(perBatch(1) === batchExpected(), "batch 2 must serve the refreshed index")
    assert(perBatch(0) !== perBatch(1), "the appended reference half must catch more dups")
  }

  test("a delete between micro-batches is honored on the next batch (r11 tombstones)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("mh_serve_del").toString
    Dedup.writeMinhashIndex(ref, dir)

    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), Option(r.get(2)).map(_.toString), r.getLong(3))

    var perBatch = List.empty[Set[(Long, Boolean, Option[String], Long)]]
    val mem = MemoryStream[(Long, String)]
    val query = StreamingOps.dedupServe(mem.toDF.toDF("doc_id", "text"), dir) { out =>
      perBatch.synchronized {
        perBatch :+= out.select(col("doc_id"), col("keep"), col("dup_of"), col("n_ref_dups"))
          .collect().map(key).toSet
      }
    }
    try {
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
      // tombstone a reference doc that batch 1 actually cited
      val victim = perBatch.head.flatMap(_._3).map(_.toLong).min
      Dedup.deleteFromMinhashIndex(spark, dir, Seq(victim).toDF("doc_id"))
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
      assert(perBatch.length === 2)
      assert(perBatch(0).exists(_._3.contains(victim.toString)))
      assert(perBatch(1).forall(!_._3.contains(victim.toString)),
        "no post-delete decision may cite the tombstoned reference")
      assert(perBatch(0) !== perBatch(1))
    } finally query.stop()
  }
}
