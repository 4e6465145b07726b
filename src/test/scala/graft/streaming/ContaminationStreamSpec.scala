package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity

/** `Similarity.semanticContamination` scores the corpus with a broadcast
  * one-row benchmark model — no corpus-keyed shuffle, no state — so the
  * SAME call runs on a streaming corpus (decontaminate-on-ingest).
  * Asserts stream output == batch output and that the batch plan never
  * hash-partitions by the corpus id. */
class ContaminationStreamSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7L)
  private def rows = (1L to 60L).map(i => (i, Array.fill(8)(rnd.nextDouble() * 2 - 1)))

  test("streaming semantic contamination matches batch exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val data = rows
    val bench = data.filter(_._1 % 10 == 0)
      .map { case (i, v) => (i + 1000L, v.map(x => x + 0.01 * rnd.nextGaussian())) }
      .toDF("bid", "embedding")
    val corpus = data.toDF("vec_id", "embedding")

    val batch = Similarity.semanticContamination(corpus, bench, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(batch.nonEmpty, "planted near-copies must be flagged")

    val mem = MemoryStream[(Long, Array[Double])]
    val out = Similarity.semanticContamination(
      mem.toDF.toDF("vec_id", "embedding"), bench, threshold = 0.8)
    val query = out.writeStream.format("memory").queryName("contam_out")
      .outputMode("append").start()
    try {
      mem.addData(data: _*)
      query.processAllAvailable()
      val streamed = s.table("contam_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(streamed == batch, "stream and batch contamination must be identical")
    } finally query.stop()
  }

  test("batch plan has no corpus-keyed shuffle") {
    val s = spark
    import s.implicits._
    val corpus = rows.toDF("vec_id", "embedding")
    val bench = rows.take(5).map { case (i, v) => (i, v) }.toDF("bid", "embedding")
    val phys = Similarity.semanticContamination(corpus, bench, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("hashpartitioning(vec_id"))
    assert(!phys.contains("CartesianProduct"))
  }
}
