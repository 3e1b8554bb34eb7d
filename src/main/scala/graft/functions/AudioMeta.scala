package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed metadata extraction for audio binary columns: parse the
  * container header of a WAV (RIFF chunk walk → fmt + data chunks) or
  * FLAC (STREAMINFO bitfields) payload into
  * `struct<format string, channels int, sample_rate int,
  * bits_per_sample int, n_frames bigint>`, or null for unrecognized
  * bytes.
  *
  * Same posture as [[ImageMeta]] (the §2.6 multimodal contract):
  * header parsing needs no audio library, runs codegen'd per row, and
  * yields the typed metadata a pipeline partitions/filters on (e.g.
  * drop sub-16kHz or mono clips before ever decoding samples — at
  * 100 TB the decode is the expensive step, so every payload the
  * header metadata can reject is a decode saved).
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen (not defineCodeGen): the helper may return null for
  // unrecognized payloads, which must flip isNull.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.AudioMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    (0 until s.length).forall(j => b(i + j) == s.charAt(j).toByte)

  private def row(fmt: String, ch: Int, sr: Int, bps: Int, n: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), ch, sr, bps, n))

  /** Returns null for payloads that are not recognized audio. */
  def parse(b: Array[Byte]): InternalRow = {
    // WAV: "RIFF" <size> "WAVE", then chunks of id(4) + size(4 LE) +
    // payload (odd sizes padded to even). Needs BOTH the fmt chunk
    // (channels/rate/bits/block-align) and the data chunk (byte size →
    // frame count via block align).
    if (b.length >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var i = 12
      var ch = -1; var sr = -1; var bps = -1; var blockAlign = -1
      var dataBytes = -1L
      while (i + 8 <= b.length && (ch < 0 || dataBytes < 0)) {
        val size = le32(b, i + 4)
        if (tag(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
          ch = le16(b, i + 10)
          sr = le32(b, i + 12).toInt
          blockAlign = le16(b, i + 20)
          bps = le16(b, i + 22)
        } else if (tag(b, i, "data")) {
          dataBytes = size
        }
        // chunk payloads are 2-byte aligned; advance in LONG — a size
        // just under Int.MaxValue would wrap an Int index negative,
        // which still satisfies the loop bound and reads below the
        // array (the VideoMeta AVI-walk overflow class)
        val next = i.toLong + 8L + size + (size & 1L)
        if (next > b.length) i = b.length // truncated chunk: end walk
        else i = next.toInt
      }
      if (ch <= 0 || sr <= 0 || bps <= 0 || blockAlign <= 0 || dataBytes < 0)
        return null
      return row("wav", ch, sr, bps, dataBytes / blockAlign)
    }
    // FLAC: "fLaC" magic, first metadata block MUST be STREAMINFO
    // (type 0, ≥34 bytes). Bytes 18..25 of the block pack sample rate
    // (20 bits), channels−1 (3), bits-per-sample−1 (5) and total
    // samples (36) — fixed offsets from the spec.
    if (b.length >= 4 + 4 + 34 && tag(b, 0, "fLaC") && (b(4) & 0x7f) == 0) {
      val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
      if (len < 34) return null
      val o = 8 + 10 // skip min/max blocksize (4) + min/max framesize (6)
      val sr = ((b(o) & 0xff) << 12) | ((b(o + 1) & 0xff) << 4) | ((b(o + 2) & 0xff) >> 4)
      val ch = ((b(o + 2) >> 1) & 0x7) + 1
      val bps = (((b(o + 2) & 0x1) << 4) | ((b(o + 3) & 0xff) >> 4)) + 1
      val n = ((b(o + 3) & 0x0fL) << 32) | ((b(o + 4) & 0xffL) << 24) |
        ((b(o + 5) & 0xffL) << 16) | ((b(o + 6) & 0xffL) << 8) | (b(o + 7) & 0xffL)
      if (sr <= 0) return null
      return row("flac", ch, sr, bps, n)
    }
    null
  }
}
