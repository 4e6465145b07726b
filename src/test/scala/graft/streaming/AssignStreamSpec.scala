package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity

/** `Similarity.assignClusters` is a pure per-row argmax (no join, no
  * shuffle, no state), so the SAME call runs on a streaming DataFrame —
  * the train-offline/serve-online routing shape. Asserts stream output ==
  * batch output on identical rows. */
class AssignStreamSpec extends SparkSpec {

  test("streaming cluster assignment matches batch exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val centroids = Seq(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 1.0))
    val rnd = new scala.util.Random(11L)
    val rows = (1L to 50L).map(i => (i, Array.fill(4)(rnd.nextDouble() * 2 - 1)))

    val batch = Similarity.assignClusters(rows.toDF("vec_id", "embedding"), centroids)
      .select("vec_id", "centroid_id", "centroid_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val mem = MemoryStream[(Long, Array[Double])]
    val out = Similarity.assignClusters(mem.toDF.toDF("vec_id", "embedding"), centroids)
      .select("vec_id", "centroid_id", "centroid_sim")
    val query = out.writeStream.format("memory").queryName("assign_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      val streamed = s.table("assign_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch, "stream and batch assignment must be identical")
      assert(streamed.size == 50)
    } finally query.stop()
  }
}
