package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis

/** `TextAnalysis.chunkDocuments` is stateless per-row array algebra
  * (sequence + slice + posexplode), so the SAME call runs on a streaming
  * DataFrame — chunking at ingest. Asserts stream output == batch output
  * on identical rows, plus a seeded property sweep of the coverage /
  * overlap invariants against a Scala brute-force chunker. */
class ChunkStreamSpec extends SparkSpec {

  test("streaming chunking matches batch exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val rnd = new scala.util.Random(7L)
    val rows = (1L to 40L).map { i =>
      (i, (1 to (rnd.nextInt(30) + 1)).map(j => s"w${i}_$j").mkString(" "))
    }
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens", "chunk_text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet

    val batch = collectSet(TextAnalysis.chunkDocuments(rows.toDF("doc_id", "text"), 8, 3))

    val mem = MemoryStream[(Long, String)]
    val out = TextAnalysis.chunkDocuments(mem.toDF.toDF("doc_id", "text"), 8, 3)
    val query = out.writeStream.format("memory").queryName("chunk_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      val streamed = collectSet(s.table("chunk_out"))
      assert(streamed == batch, "stream and batch chunking must be identical")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("property sweep: 200 seeded docs vs brute-force chunker (coverage + overlap)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13L)
    val docs = (1L to 200L).map { i =>
      (i, (1 to (rnd.nextInt(40) + 1)).map(j => s"t$j").mkString(" "))
    }
    val chunk = 7; val overlap = 2; val stride = chunk - overlap
    def brute(words: Array[String]): Seq[(Long, Long, Long, String)] = {
      val n = words.length
      val lastStart = math.max(0, math.ceil((n - chunk).toDouble / stride).toInt * stride)
      (0 to lastStart by stride).zipWithIndex.map { case (st, ci) =>
        val w = words.slice(st, st + chunk)
        (ci.toLong, st.toLong, w.length.toLong, w.mkString(" "))
      }
    }
    val expected = docs.flatMap { case (id, text) =>
      brute(text.split(" ")).map { case (ci, st, nt, t) => (id, ci, st, nt, t) }
    }.toSet
    val got = TextAnalysis.chunkDocuments(docs.toDF("doc_id", "text"), chunk, overlap)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_start"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
      .toSet
    assert(got == expected)
    // invariants: full coverage, consecutive chunks overlap by exactly
    // `overlap` tokens (except a shorter last window), no empty chunks
    got.groupBy(_._1).foreach { case (id, cs) =>
      val n = docs.find(_._1 == id).get._2.split(" ").length
      val covered = cs.flatMap(c => c._3 until (c._3 + c._4))
      assert(covered == (0L until n.toLong).toSet, s"doc $id misses tokens")
      assert(cs.forall(_._4 > 0), s"doc $id has an empty chunk")
      val sorted = cs.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val ovl = (a._3 + a._4) - b._3
          assert(ovl >= overlap, s"doc $id chunks ${a._2}/${b._2} overlap $ovl < $overlap")
        case _ =>
      }
    }
  }
}
