package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** r12 serving observability: the per-micro-batch probe stats must be
  * MEASURED off the executed plan's scan metrics and delivered through a
  * registered `StreamingQueryListener` — files read strictly below the
  * index's file population (partition pruning visible per batch),
  * probed partitions bounded by nProbe, pending tombstones reported. */
class ServeTelemetrySpec extends SparkSpec {

  private def awaitStats(n: Int, buf: scala.collection.mutable.Buffer[ServeTelemetry.ProbeStats]): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (buf.synchronized(buf.size) < n && System.nanoTime() < deadline) Thread.sleep(50)
  }

  test("annServe: listener reports measured pruned-file counts and pending tombstones per batch") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("annserve_tel").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)
    Similarity.deleteFromIvfPqIndex(spark, dir, Seq(1L, 2L, 3L).toDF("cid"))

    // ONE query vector probes exactly nProbe cells — pruning must be
    // visible as partitionsRead <= 2 out of the index's 8 cells
    val q1 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(q1.length === 1)

    val stats = scala.collection.mutable.Buffer.empty[ServeTelemetry.ProbeStats]
    val listener = new ServeTelemetryListener(dir)(p => stats.synchronized { stats += p })
    spark.streams.addListener(listener)
    val mem = MemoryStream[(Long, Array[Double])]
    val query = StreamingOps.annServe(
      mem.toDF.toDF("qid", "embedding"), dir, c, ctr, books,
      k = 5, nProbe = 2, rerankFactor = 3) { out => out.collect(); () }
    try {
      mem.addData(q1: _*)
      query.processAllAvailable()
      mem.addData(q1: _*)
      query.processAllAvailable()
      awaitStats(2, stats)
    } finally { query.stop(); spark.streams.removeListener(listener) }

    val got = stats.synchronized(stats.toList)
    assert(got.size >= 2, s"listener must fire per probing micro-batch, got ${got.size}")
    got.foreach(p => info(p.toString))
    got.foreach { p =>
      assert(p.filesRead > 0, "a probe reads at least one code file")
      assert(p.partitionsRead <= 2, s"nProbe=2 must bound probed cells, read ${p.partitionsRead}")
      assert(p.filesPruned > 0,
        s"partition pruning must be visible: read ${p.filesRead}, pruned ${p.filesPruned}")
      assert(p.bytesRead > 0)
      assert(p.pendingTombstones === 3L, s"pending delete set misreported: ${p.pendingTombstones}")
      assert(p.generation === "flat", s"flat layout must report generation=flat: ${p.generation}")
    }
  }

  test("dedupServe: probe stats flow through the same listener route") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("mh_tel").toString
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") % 2 === 0), dir)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))

    val stats = scala.collection.mutable.Buffer.empty[ServeTelemetry.ProbeStats]
    val listener = new ServeTelemetryListener(dir)(p => stats.synchronized { stats += p })
    spark.streams.addListener(listener)
    val mem = MemoryStream[(Long, String)]
    val query = StreamingOps.dedupServe(mem.toDF.toDF("doc_id", "text"), dir) {
      out => out.collect(); ()
    }
    try {
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
      awaitStats(1, stats)
    } finally { query.stop(); spark.streams.removeListener(listener) }

    val got = stats.synchronized(stats.toList)
    assert(got.nonEmpty, "dedup probe must report stats")
    assert(got.head.filesRead > 0 && got.head.bytesRead > 0)
    assert(got.head.pendingTombstones === 0L)
  }
}
