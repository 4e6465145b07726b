package graft.functions

import graft.operators.MediaCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over media payload bytes — the same
  * UDF-free discipline as [[ProjectPoint]]: header parse and decode run
  * inside whole-stage codegen via static calls on
  * [[graft.operators.MediaCodec]], no ScalaUDF boxing. */
case class MediaMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaMetaExpr.schema
  override def prettyName: String = "media_meta"

  override def nullSafeEval(input: Any): Any =
    MediaMetaExpr.metaRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"${ev.value} = graft.functions.MediaMetaExpr.metaRow($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType, nullable = false)))

  /** Static entry for interpreted eval AND generated code: header parse
    * to (format, width, height, n_bytes); unknown magic -> null format,
    * known format with unparsed dims -> null dims. */
  def metaRow(b: Array[Byte]): InternalRow = {
    val m = MediaCodec.parseMeta(b)
    if (m == null) new GenericInternalRow(Array[Any](null, null, null, b.length.toLong))
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.format),
      if (m.width >= 0) m.width else null,
      if (m.height >= 0) m.height else null,
      b.length.toLong))
  }

  def column(payload: Column): Column = Bridge.column(MediaMetaExpr(Bridge.expression(payload)))
}

/** Decode + resize + PNG re-encode (javax.imageio), executed in codegen.
  * Null when the payload does not decode. */
case class DecodeResizeExpr(payload: Expression, outW: Expression, outH: Expression)
    extends TernaryExpression {

  override def first: Expression = payload
  override def second: Expression = outW
  override def third: Expression = outH
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_resize_png"

  override def nullSafeEval(b: Any, w: Any, h: Any): Any =
    MediaCodec.decodeResizePng(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h) => {
      s"""
         |${ev.value} = graft.operators.MediaCodec.decodeResizePng($b, $w, $h);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(payload = f, outW = s, outH = t)
}

object DecodeResizeExpr {
  def column(payload: Column, outW: Column, outH: Column): Column =
    Bridge.column(DecodeResizeExpr(Bridge.expression(payload),
      Bridge.expression(outW.cast("int")), Bridge.expression(outH.cast("int"))))
}

/** 63-bit average-hash perceptual fingerprint (real javax.imageio decode
  * + 8×8 thumbnail + above-mean bits — `MediaCodec.aHash63`), executed in
  * codegen. Null when the payload does not decode. */
case class AHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ahash63"

  override def nullSafeEval(b: Any): Any =
    MediaCodec.aHash63(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |java.lang.Long ${ev.value}_boxed = graft.operators.MediaCodec.aHash63($b);
         |${ev.isNull} = ${ev.value}_boxed == null;
         |if (!${ev.isNull}) { ${ev.value} = ${ev.value}_boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHashExpr {
  def column(payload: Column): Column = Bridge.column(AHashExpr(Bridge.expression(payload)))
}

/** 63-bit audio fingerprint (real RIFF/WAVE PCM16 decode + 64-window
  * energy sign bits — `MediaCodec.audioFp63`), executed in codegen.
  * Null when the payload is not decodable 16-bit PCM WAV. */
case class AudioFpExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audiofp63"

  override def nullSafeEval(b: Any): Any =
    MediaCodec.audioFp63(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |java.lang.Long ${ev.value}_boxed = graft.operators.MediaCodec.audioFp63($b);
         |${ev.isNull} = ${ev.value}_boxed == null;
         |if (!${ev.isNull}) { ${ev.value} = ${ev.value}_boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFpExpr {
  def column(payload: Column): Column = Bridge.column(AudioFpExpr(Bridge.expression(payload)))
}

/** Canonical 8 kHz mono 16-bit PCM WAV encoder — the ENCODE twin of
  * [[AudioFpExpr]]'s decode, executed in codegen: a 44-byte RIFF/WAVE
  * header (sizes computed from the element count) followed by each
  * sample's low 16 bits little-endian (two's complement). Byte-for-byte
  * identical to the hex-transform chain
  * `unhex(concat(header, array_join(transform(samples, LE16-hex), '')))`
  * for any BIGINT samples (PcmWavSpec pins the parity), without the
  * per-sample hex/lpad/substring/concat string machinery. Null when the
  * array is null or contains a null element (such payloads never decode
  * under [[AudioFpExpr]] either way). */
case class PcmWavExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.catalogString} " +
            "(the column() builder casts for you)")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_wav_8k_mono16"

  override def nullSafeEval(a: Any): Any =
    PcmWavExpr.encode(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.PcmWavExpr.encode($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmWavExpr {
  private val SampleRate = 8000

  /** Static entry for interpreted eval AND generated code. */
  def encode(samples: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val n = samples.numElements()
    val dataBytes = 2 * n
    val out = new Array[Byte](44 + dataBytes)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + dataBytes); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1) // integer PCM
    le16(22, 1) // mono
    le32(24, SampleRate)
    le32(28, SampleRate * 2) // byte rate = rate * blockAlign
    le16(32, 2) // blockAlign = nCh * 2
    le16(34, 16) // bits per sample
    ascii(36, "data"); le32(40, dataBytes)
    var i = 0
    while (i < n) {
      if (samples.isNullAt(i)) return null
      val v = samples.getLong(i).toInt & 0xFFFF
      out(44 + 2 * i) = (v & 0xFF).toByte
      out(45 + 2 * i) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  def column(samples: Column): Column =
    Bridge.column(PcmWavExpr(Bridge.expression(samples.cast("array<bigint>"))))
}
