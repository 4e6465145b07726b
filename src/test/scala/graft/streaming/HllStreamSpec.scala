package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** `StreamingOps.hllStream` vs batch `Sketch.hllRegisters`/`hllDistinct`:
  * identical register files (and therefore identical estimates) with the
  * key stream split across micro-batches in shuffled order — max(rho) is
  * a declarative aggregate, so partial-merge order cannot change state. */
class HllStreamSpec extends SparkSpec {

  test("streamed HLL registers and estimate match batch bit-for-bit") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val rnd = new scala.util.Random(43L)
    // two groups, overlapping key sets, duplicates included
    val rows = (1 to 600).map { i =>
      (s"user-${i % 173}", if (i % 3 == 0) "buy" else "view")
    }
    val batchDf = rows.toDF("k", "g")
    val batchRegs = Sketch.hllRegisters(batchDf, col("k"), Seq("g"))
      .collect().map(_.toSeq).toSet
    val batchEst = Sketch.hllDistinct(batchDf, col("k"), Seq("g"))
      .select("g", "v_empty", "s_int", "hll_est")
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(String, String)]
    val out = StreamingOps.hllStream(mem.toDF.toDF("k", "g"), "k", "g")
    val query = out.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      val (a, b) = rnd.shuffle(rows).splitAt(250)
      mem.addData(a: _*)
      query.processAllAvailable()
      mem.addData(b: _*)
      query.processAllAvailable()
      val streamedRegs = s.table("hll_regs").collect().map(_.toSeq).toSet
      assert(streamedRegs === batchRegs, "register files must be identical")
      val streamedEst = Sketch.hllEstimate(s.table("hll_regs"), Seq("g"))
        .select("g", "v_empty", "s_int", "hll_est")
        .collect().map(_.toSeq).toSet
      assert(streamedEst === batchEst, "estimates off streamed registers must equal batch")
    } finally query.stop()
  }
}
