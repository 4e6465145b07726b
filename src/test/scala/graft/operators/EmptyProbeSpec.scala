package graft.operators
import graft.SparkSpec
import org.apache.spark.sql.functions._
class EmptyProbeSpec extends SparkSpec {
  test("empty query batch probes yield empty results, not analysis errors") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("empty_probe").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)
    val empty = emb.filter(col("vec_id") < 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    assert(Similarity.ivfPqTopKIndexed(empty, dir, c, ctr, books, k = 5).count() === 0L)
    assert(Similarity.ivfRangeSearchIndexed(empty, dir, c, ctr, books, minSim = 0.2).count() === 0L)
  }
}
