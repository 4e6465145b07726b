package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, IndexMaintenance, Similarity}
import org.apache.spark.sql.functions._

/** The r12 manifest-pointer index layout (`IndexMaintenance
  * .enableManifest`): compaction becomes an atomic one-line manifest
  * rewrite instead of a rename pair, so the live path is NEVER absent —
  * a probe (including a mid-stream `annServe`/`dedupServe` micro-batch)
  * always resolves a complete generation. These specs pin (1) the full
  * maintenance lifecycle on a manifest layout is bit-identical to the
  * flat layout's, (2) a compaction under a LIVE dedupServe stream
  * neither fails a micro-batch nor changes decisions, and (3) an
  * annServe stream keeps serving while a compaction runs CONCURRENTLY
  * on another thread (the previous generation is retained for exactly
  * this reader). */
class ManifestSwapSpec extends SparkSpec {

  private def decisions(incoming: org.apache.spark.sql.DataFrame, dir: String) =
    Dedup.dedupAgainstMinhashIndex(incoming, dir)
      .select(col("doc_id"), col("keep"), col("dup_of"), col("n_ref_dups"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)).map(_.toString), r.getLong(3))).toSet

  test("manifest lifecycle: enable/append/delete/compact identical to flat; generations retained then reaped") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val refA = docs.filter(col("doc_id") % 4 === 0)
    val refB = docs.filter(col("doc_id") % 4 === 2)
    val incoming = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mh_manifest").toString
    def ls() = new java.io.File(dir).listFiles().map(_.getName).toSet

    Dedup.writeMinhashIndex(refA, dir)
    val flatProbe = decisions(incoming, dir)

    // enable: identity on probes, data moved into generation 0
    IndexMaintenance.enableManifest(spark, dir)
    assert(ls().contains("_graft_manifest"))
    assert(!ls().exists(_.startsWith("band_idx=")), "root data must move into the generation")
    assert(decisions(incoming, dir) === flatProbe, "enableManifest must be probe-identity")

    // append lands in the live generation; decisions == a flat rebuild on the union
    Dedup.appendMinhashIndex(refB, dir)
    val flatDir2 = java.nio.file.Files.createTempDirectory("mh_flat2").toString
    Dedup.writeMinhashIndex(refA.unionByName(refB), flatDir2)
    val unionProbe = decisions(incoming, flatDir2)
    assert(decisions(incoming, dir) === unionProbe, "append on manifest layout == flat rebuild")
    assert(unionProbe !== flatProbe)

    // delete + compact: tombstone materialized, manifest repointed,
    // previous generation retained for in-flight readers
    val victim = decisions(incoming, dir).flatMap(_._3).map(_.toLong).min
    Dedup.deleteFromMinhashIndex(spark, dir, Seq(victim).toDF("doc_id"))
    val g1 = Dedup.compactMinhashIndex(spark, dir)
    assert(new java.io.File(g1).getName === "_graft_gen_00001")
    assert(ls().contains("_graft_gen_00000"), "previous generation retained after one compact")
    assert(!ls().contains("_graft_tombstones"), "compaction materializes pending tombstones")
    val flatDir3 = java.nio.file.Files.createTempDirectory("mh_flat3").toString
    Dedup.writeMinhashIndex(
      refA.unionByName(refB).filter(col("doc_id") =!= victim), flatDir3)
    assert(decisions(incoming, dir) === decisions(incoming, flatDir3),
      "compacted manifest index == fresh build without the victim")

    // a second compact reaps generations older than the superseded one
    val g2 = Dedup.compactMinhashIndex(spark, dir)
    assert(new java.io.File(g2).getName === "_graft_gen_00002")
    assert(!ls().contains("_graft_gen_00000"), "gen 0 reaped by the second compact")
    assert(ls().contains("_graft_gen_00001"), "gen 1 retained as the previous generation")
    assert(decisions(incoming, dir) === decisions(incoming, flatDir3))
  }

  test("dedupServe: compaction under a live stream — no failed micro-batch, decisions unchanged") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("mh_serve_cpt").toString
    Dedup.writeMinhashIndex(ref, dir)
    IndexMaintenance.enableManifest(spark, dir)
    // pending tombstone so the compaction has real work to materialize
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))

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
      // compact WHILE the stream is live: the manifest swap must be
      // invisible to the next micro-batch (same decisions, no failure)
      Dedup.compactMinhashIndex(spark, dir)
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"micro-batch failed across the swap: ${query.exception}")
      assert(perBatch.length === 2)
      assert(perBatch(0) === perBatch(1), "probe-before must equal probe-after the compaction")
    } finally query.stop()
  }

  test("dedupServe: a REBUILD (new reference set) lands mid-stream as a new generation — zero gap") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val refA = docs.filter(col("doc_id") % 4 === 0)
    val refFull = docs.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("mh_rebuild").toString
    Dedup.writeMinhashIndex(refA, dir)
    IndexMaintenance.enableManifest(spark, dir)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))

    // expected decisions against each reference set, via fresh flat builds
    val flatA = java.nio.file.Files.createTempDirectory("mh_rb_a").toString
    Dedup.writeMinhashIndex(refA, flatA)
    val flatF = java.nio.file.Files.createTempDirectory("mh_rb_f").toString
    Dedup.writeMinhashIndex(refFull, flatF)
    val expA = decisions(incoming.toSeq.toDF("doc_id", "text"), flatA)
    val expF = decisions(incoming.toSeq.toDF("doc_id", "text"), flatF)
    assert(expA !== expF, "fixture must make the rebuild visible")

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
      // REBUILD under the live stream: writeMinhashIndex on a manifest
      // layout writes a fresh generation and atomically repoints
      Dedup.writeMinhashIndex(refFull, dir)
      assert(new java.io.File(IndexMaintenance.resolveLive(spark, dir)).getName
        === "_graft_gen_00001")
      mem.addData(incoming.toSeq: _*)
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"micro-batch failed across the rebuild: ${query.exception}")
      assert(perBatch.length === 2)
      assert(perBatch(0) === expA, "batch 1 must serve the original reference set")
      assert(perBatch(1) === expF, "batch 2 must serve the REBUILT reference set")
    } finally query.stop()
  }

  test("annServe: a compaction racing live micro-batches on another thread never breaks serving") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("annserve_cpt").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)
    IndexMaintenance.enableManifest(spark, dir)

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))
    val expected = Similarity.ivfPqTopKIndexed(
      queries.toSeq.toDF("qid", "embedding"), dir, c, ctr, books,
      k = 5, nProbe = 2, rerankFactor = 3).collect().map(key).toSet

    var perBatch = List.empty[Set[(Long, Long, Int, Double, Double)]]
    val mem = MemoryStream[(Long, Array[Double])]
    val query = StreamingOps.annServe(
      mem.toDF.toDF("qid", "embedding"), dir, c, ctr, books,
      k = 5, nProbe = 2, rerankFactor = 3) { out =>
      perBatch.synchronized { perBatch :+= out.collect().map(key).toSet }
    }
    @volatile var compactError: Option[Throwable] = None
    val compactor = new Thread(() => {
      try { Thread.sleep(30); Similarity.compactIvfPqIndex(spark, dir); () }
      catch { case t: Throwable => compactError = Some(t) }
    })
    try {
      compactor.start()
      for (_ <- 1 to 4) {
        mem.addData(queries.toSeq: _*)
        query.processAllAvailable()
      }
      compactor.join()
      assert(compactError.isEmpty, s"concurrent compaction failed: $compactError")
      // one more batch strictly AFTER the swap: telemetry must show the
      // new generation actually serving (the observable swap confirmation)
      mem.addData(queries.toSeq: _*)
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"micro-batch failed during the race: ${query.exception}")
      assert(perBatch.length === 5)
      perBatch.foreach(b => assert(b === expected,
        "every micro-batch across the racing compaction must serve identical top-k"))
      val post = ServeTelemetry.statsFor(dir, 4L)
      assert(post.exists(_.generation === "_graft_gen_00001"),
        s"post-compaction batch must report the new generation: $post")
    } finally query.stop()
  }
}
