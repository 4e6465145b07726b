package graft.operators

import graft.SparkSpec

class LshDebugSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("debug: LSH signature distribution on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sig = Similarity.withLshSignature(emb.select(col("vec_id"), col("embedding")), dim = 64)
    val rows = sig.groupBy("lsh_sig").count().orderBy(desc("count")).collect()
    info(s"distinct signatures: ${rows.length} of ${emb.count()}")
    info("top sig counts: " + rows.take(5).map(_.getLong(1)).mkString(","))
    val q = emb.filter(col("vec_id") % 500 === 0).select(col("vec_id").as("qid"), col("embedding"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val top = Similarity.lshTopK(q, c, dim = 64, k = 10)
    info(s"lshTopK rows: ${top.count()} for ${q.count()} queries")
  }
}
