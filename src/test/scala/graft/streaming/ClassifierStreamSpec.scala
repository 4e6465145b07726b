package graft.streaming

import graft.SparkSpec
import graft.operators.Selection

/** `Selection.classifierScore` is a pure per-row fold over a literal
  * weight vector (no join, no shuffle, no state), so the SAME call runs
  * on a streaming DataFrame — quality-filtering at ingest with an
  * offline-trained model. Asserts stream output == batch output. */
class ClassifierStreamSpec extends SparkSpec {

  test("streaming classifier scoring matches batch exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val wts = Selection.defaultQualityWeights(64)
    val rnd = new scala.util.Random(7L)
    val vocab = Seq("spark", "scan", "join", "sort", "window", "agg", "the", "a")
    val rows = (1L to 40L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }

    val batch = Selection.classifierScore(rows.toDF("doc_id", "text"), wts)
      .collect().map(_.toString).toSet

    val mem = MemoryStream[(Long, String)]
    val out = Selection.classifierScore(mem.toDF.toDF("doc_id", "text"), wts)
    val query = out.writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      val streamed = s.table("clf_out").collect().map(_.toString).toSet
      assert(streamed == batch, "stream and batch classifier scores must be identical")
      assert(streamed.size == 40)
    } finally query.stop()
  }
}
