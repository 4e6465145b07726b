package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The r8 multimodal ops are pure per-row maps (no join, no shuffle, no
  * state), so the SAME calls run on a streaming DataFrame — the
  * ingest-time media pipeline shape (meta → resize plan → embed on
  * arrival). Asserts stream output == batch output on identical rows. */
class MultimodalStreamSpec extends SparkSpec {

  test("streaming resize plan + payload embedding match batch exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    val rows = (1L to 40L).map(i => (i, s"payload body $i ${"x" * (i % 7).toInt}"))
    def pipeline(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val withPayload = df.withColumn("payload", encode(col("text"), "UTF-8"))
      val planned = Multimodal.resizePlan(
        Multimodal.withPortableMeta(withPayload), maxDim = 48)
      Multimodal.payloadEmbedding(planned, dim = 4)
        .select(col("doc_id"), col("width"), col("height"),
          col("out_w"), col("out_h"),
          round(col("embedding")(0), 6).as("e0"), round(col("embedding")(3), 6).as("e3"))
    }

    val batch = pipeline(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5), r.getDouble(6))).toSet

    val mem = MemoryStream[(Long, String)]
    val query = pipeline(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mm_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      val streamed = s.table("mm_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getDouble(5), r.getDouble(6))).toSet
      assert(streamed == batch, "stream and batch media pipeline must be identical")
      assert(streamed.size == 40)
    } finally query.stop()
  }

  test("streaming REAL decode (header parse + ImageIO resize) matches batch exactly (r9)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = s.sqlContext

    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows: Seq[(Long, Array[Byte])] =
      (1L to 12L).map(i => (i, png(20 + i.toInt, 10 + (i.toInt * 3) % 17))) :+
        (99L, "not an image".getBytes)

    def pipeline(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      Multimodal.decodeAndResize(df, maxDim = 16)
        .select(col("id"), col("media_meta.format").as("fmt"),
          col("out_w"), col("out_h"),
          md5(col("resized")).as("rd"))

    val batch = pipeline(rows.toDF("id", "payload")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet

    val mem = MemoryStream[(Long, Array[Byte])]
    val query = pipeline(mem.toDF.toDF("id", "payload"))
      .writeStream.format("memory").queryName("mm_real_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      val streamed = s.table("mm_real_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
      assert(streamed == batch, "real decode must be stream==batch (map-only, no state)")
      // the 12 real PNGs decode+resize; the synthetic row (stub meta)
      // yields a null resize
      assert(streamed.count(_._5 != null) == 12)
      assert(streamed.exists(t => t._1 == 99L && t._5 == null))
    } finally query.stop()
  }
}
