package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[PcmWavExpr]] — the native WAV encoder behind q214's fixture
  * synthesis (r18): byte-for-byte parity with the hex-transform chain it
  * replaced, round-trip through the real decoder, and null semantics. */
class PcmWavSpec extends SparkSpec {

  // the exact chain q214 used through r17 (canonical 44-byte header:
  // RIFF(548) WAVE fmt(PCM,1ch,8kHz,16bit) data(512); LE int16 samples
  // as hex, byte-swapped)
  private val header = "524946462402000057415645666D7420100000000100010040" +
    "1F0000803E0000020010006461746100020000"
  private val sample =
    """((doc_id % 100) * 31 + i * 17) % 2048 - 1024 +
      |  CASE WHEN i = 0   THEN (doc_id DIV 100) % 5 * 5
      |       WHEN i = 128 THEN (doc_id DIV 100) % 5 * 7
      |       ELSE 0 END""".stripMargin

  test("byte-for-byte parity with the r17 hex-transform chain on the q214 fixture") {
    val s = spark
    import s.implicits._
    val le16 = s"lpad(hex(pmod($sample, 65536)), 4, '0')"
    val oldChain = unhex(concat(lit(header), expr(
      s"""array_join(transform(sequence(0, 255),
         |  i -> concat(substring($le16, 3, 2), substring($le16, 1, 2))), '')""".stripMargin)))
    val native = PcmWavExpr.column(expr(s"transform(sequence(0, 255), i -> $sample)"))
    // 0..599 covers every (doc_id % 100, (doc_id DIV 100) % 5) variant;
    // the large ids exercise the modular arithmetic away from small ints
    val ids = ((0L until 600L) ++ Seq(12345L, 987654321L, Long.MaxValue / 7)).toDF("doc_id")
    val rows = ids.select(col("doc_id"), oldChain.as("o"), native.as("n")).collect()
    assert(rows.length === 603)
    rows.foreach { r =>
      val o = r.getAs[Array[Byte]]("o"); val n = r.getAs[Array[Byte]]("n")
      assert(o.length === 556 && n.length === 556, s"doc_id=${r.getLong(0)}")
      assert(java.util.Arrays.equals(o, n), s"payload mismatch for doc_id=${r.getLong(0)}")
    }
  }

  test("round-trips the real decoder: fp63(encode(s)) == fp63(reference WAV bytes)") {
    val s = spark
    import s.implicits._
    // arbitrary 16-bit samples incl. negatives and the int16 extremes
    val mono: Array[Long] = Array.tabulate(256)(i => ((i * 131 + 17) % 65536 - 32768).toLong)
    val viaExpr = Seq(Tuple1(mono.toSeq)).toDF("samples")
      .select(PcmWavExpr.column(col("samples")).as("p"))
      .head().getAs[Array[Byte]]("p")
    // independent reference: ByteBuffer-packed canonical RIFF (the
    // AudioCodecSpec builder's layout)
    val dataLen = mono.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000)
      .putInt(16000).putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    mono.foreach(v => bb.putShort(v.toShort))
    assert(java.util.Arrays.equals(viaExpr, bb.array()))
    assert(graft.operators.MediaCodec.audioFp63(viaExpr) ==
      graft.operators.MediaCodec.audioFp63(bb.array()))
  }

  test("null array and null element yield null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq[java.lang.Long](1L, 2L, 3L))),
      (2L, Some(Seq[java.lang.Long](1L, null, 3L))),
      (3L, None)).toDF("id", "samples")
    val got = df.select(col("id"), PcmWavExpr.column(col("samples")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.get(1) != null)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }
}
