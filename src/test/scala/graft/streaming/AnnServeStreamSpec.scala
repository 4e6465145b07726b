package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Streaming ANN serving (`StreamingOps.annServe`): micro-batches of
  * query vectors retrieved against the PERSISTED partition-pruned IVF-PQ
  * index must produce exactly the batch `ivfPqTopKIndexed` results for
  * the same queries — the build-once/serve-online twin of the r10 index.
  * Two micro-batches also prove per-batch independence (no cross-batch
  * state; a query's top-k is complete the moment its batch lands). */
class AnnServeStreamSpec extends SparkSpec {

  test("streamed micro-batches against the persisted index == batch retrieval") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("annserve_idx").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(queries.length >= 4, "need a meaningful query set")
    val (b1, b2) = queries.splitAt(queries.length / 2)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))
    val batchExpected = Similarity.ivfPqTopKIndexed(
      queries.toSeq.toDF("qid", "embedding"), dir, c, ctr, books,
      k = 5, nProbe = 2, rerankFactor = 3).collect().map(key).toSet

    val got = scala.collection.mutable.Set.empty[(Long, Long, Int, Double, Double)]
    val mem = MemoryStream[(Long, Array[Double])]
    val query = StreamingOps.annServe(
      mem.toDF.toDF("qid", "embedding"), dir, c, ctr, books,
      k = 5, nProbe = 2, rerankFactor = 3) { out =>
      got.synchronized { got ++= out.collect().map(key) }
    }
    try {
      mem.addData(b1: _*)
      query.processAllAvailable()
      val afterB1 = got.synchronized(got.size)
      assert(afterB1 > 0 && afterB1 < batchExpected.size,
        "first micro-batch must serve only its own queries")
      mem.addData(b2: _*)
      query.processAllAvailable()
      assert(got.synchronized(got.toSet) === batchExpected,
        "streamed top-k must equal the batch retrieval bit-for-bit")
    } finally query.stop()
  }

  test("annRangeServe (r12): streamed range micro-batches == batch ivfRangeSearchIndexed") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("annrange_idx").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val batchExpected = Similarity.ivfRangeSearchIndexed(
      queries.toSeq.toDF("qid", "embedding"), dir, c, ctr, books,
      minSim = 0.2, nProbe = 2).collect().map(key).toSet
    assert(batchExpected.nonEmpty, "fixture must produce in-range pairs")

    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val mem = MemoryStream[(Long, Array[Double])]
    val query = StreamingOps.annRangeServe(
      mem.toDF.toDF("qid", "embedding"), dir, c, ctr, books,
      minSim = 0.2, nProbe = 2) { out =>
      got.synchronized { got ++= out.collect().map(key) }
    }
    try {
      val (b1, b2) = queries.splitAt(queries.length / 2)
      mem.addData(b1: _*)
      query.processAllAvailable()
      mem.addData(b2: _*)
      query.processAllAvailable()
      assert(query.exception.isEmpty)
      assert(got.synchronized(got.toSet) === batchExpected,
        "streamed range results must equal the batch retrieval bit-for-bit")
    } finally query.stop()
  }
}
