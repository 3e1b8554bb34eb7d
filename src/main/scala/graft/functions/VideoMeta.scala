package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed metadata extraction for video binary columns: parse the
  * container header of an MP4/ISO-BMFF payload (top-level box walk →
  * `ftyp` brand, `moov/mvhd` timescale+duration, `moov/trak/tkhd`
  * pixel dimensions) or an AVI payload (RIFF `hdrl/avih` fixed-offset
  * fields) into `struct<format string, brand string, width int,
  * height int, duration_ms bigint>`, or null for unrecognized bytes.
  *
  * Completes the §2.6 multimodal triad next to [[ImageMeta]] and
  * [[AudioMeta]]: container-header parsing needs no codec library,
  * runs codegen'd per row, and yields the typed metadata a pipeline
  * partitions/filters on (drop sub-720p or >10-minute clips BEFORE
  * paying frame decode — at 100 TB every payload the header rejects
  * is a decode saved).
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_meta"

  override protected def nullSafeEval(input: Any): Any =
    VideoMeta.parse(input.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen (not defineCodeGen): the helper may return null for
  // unrecognized payloads, which must flip isNull.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.VideoMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      (0 until s.length).forall(j => b(i + j) == s.charAt(j).toByte)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  private def row(fmt: String, brand: String, w: Int, h: Int, ms: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt), UTF8String.fromString(brand), w, h, ms))

  /** MP4 box scan over [lo, hi): returns the offset of the first box
    * whose type matches, or -1. Box = u32 BE size + 4-char type; size 1
    * means a u64 largesize follows; size 0 means to-end-of-buffer. A
    * corrupt size ends the walk (no partial results). */
  private def findBox(b: Array[Byte], lo: Int, hi: Int, tp: String): Int = {
    var i = lo
    while (i + 8 <= hi) {
      val size = be32(b, i)
      if (tag(b, i + 4, tp)) return i
      val step =
        if (size == 1L) { if (i + 16 > hi) return -1; be64(b, i + 8) }
        else if (size == 0L) (hi - i).toLong
        else size
      // compare as `step > hi - i` (never `i + step > hi`): a crafted
      // largesize near Long.MaxValue wraps i + step negative, which
      // would pass the guard and cycle the walk forever
      if (step < 8 || step > (hi - i).toLong) return -1
      i += step.toInt
    }
    -1
  }

  /** Payload bounds (lo, hi) of the box at `at` (after its header).
    * Every arm clamps to [at, hi] so a truncated or lying size can
    * never yield bounds outside the buffer or an inverted range —
    * callers get an empty payload instead of a crash. */
  private def boxPayload(b: Array[Byte], at: Int, hi: Int): (Int, Int) = {
    val size = be32(b, at)
    val (lo, end) =
      if (size == 1L) {
        if (at + 16 > hi) (hi, hi.toLong) // largesize itself truncated
        else (at + 16, at + math.min(be64(b, at + 8), (hi - at).toLong))
      }
      else if (size == 0L) (at + 8, hi.toLong)
      else (at + 8, at + math.min(size, (hi - at).toLong))
    (math.min(lo, hi), math.max(math.min(end.toInt, hi), math.min(lo, hi)))
  }

  /** Returns null for payloads that are not recognized video. */
  def parse(b: Array[Byte]): InternalRow = {
    // MP4 / ISO-BMFF: first box must be ftyp (major_brand right after
    // the header). Dimensions come from the first trak whose tkhd has
    // nonzero width (audio traks carry 0×0); duration from mvhd.
    if (b.length >= 16 && tag(b, 4, "ftyp")) {
      val brand = ascii(b, 8, 4).trim
      val moovAt = findBox(b, 0, b.length, "moov")
      if (moovAt < 0) return null
      val (mlo, mhi) = boxPayload(b, moovAt, b.length)
      val mvhdAt = findBox(b, mlo, mhi, "mvhd")
      // findBox matches on the type tag BEFORE validating the box's
      // own size, so every field read below re-checks the buffer bound
      // (a truncated mvhd/tkhd must yield null, not an AIOOBE).
      if (mvhdAt < 0 || mvhdAt + 9 > mhi) return null
      val v = b(mvhdAt + 8) & 0xff
      if ((if (v == 1) mvhdAt + 40 else mvhdAt + 28) > mhi) return null
      val (timescale, duration) =
        if (v == 1) (be32(b, mvhdAt + 28), be64(b, mvhdAt + 32))
        else (be32(b, mvhdAt + 20), be32(b, mvhdAt + 24))
      // duration*1000 below must not overflow: a crafted 64-bit
      // duration would wrap duration_ms negative instead of nulling
      if (timescale <= 0 || duration < 0 || duration > Long.MaxValue / 1000L)
        return null
      // walk traks for the first visual one (16.16 fixed-point dims)
      var w = 0; var h = 0
      var trakAt = findBox(b, mlo, mhi, "trak")
      while (trakAt >= 0 && w == 0) {
        val (tlo, thi) = boxPayload(b, trakAt, mhi)
        val tkhdAt = findBox(b, tlo, thi, "tkhd")
        if (tkhdAt >= 0 && tkhdAt + 9 <= thi) {
          // width/height sit after version/flags(4) + times(8|16) +
          // track_id(4) + reserved(4) + duration(4|8) + reserved(8) +
          // layer/alt/volume/reserved(8) + matrix(36) = 76 (v0) / 88 (v1)
          val tv = b(tkhdAt + 8) & 0xff
          val base = if (tv == 1) tkhdAt + 8 + 88 else tkhdAt + 8 + 76
          if (base + 8 <= thi) {
            w = (be32(b, base) >> 16).toInt
            h = (be32(b, base + 4) >> 16).toInt
          }
        }
        // strict progress: a lying largesize can make thi <= trakAt,
        // which would re-find the same trak forever
        trakAt = findBox(b, math.max(thi, trakAt + 8), mhi, "trak")
      }
      return row("mp4", brand, w, h, duration * 1000L / timescale)
    }
    // AVI: RIFF//AVI , then LIST/hdrl whose first child must be avih
    // (fixed LE field offsets from the spec).
    if (b.length >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "AVI ")) {
      var i = 12
      while (i + 12 <= b.length) {
        val size = le32(b, i + 4)
        if (tag(b, i, "LIST") && tag(b, i + 8, "hdrl")) {
          val a = i + 12
          if (!tag(b, a, "avih") || a + 8 + 40 > b.length) return null
          val usPerFrame = le32(b, a + 8)
          val nFrames = le32(b, a + 8 + 16)
          val w = le32(b, a + 8 + 32).toInt
          val h = le32(b, a + 8 + 36).toInt
          // both fields are attacker-controlled 32-bit values; their
          // product can exceed Long.MaxValue and wrap duration_ms
          // negative — null, don't emit garbage
          if (usPerFrame > 0 && nFrames > Long.MaxValue / usPerFrame) return null
          return row("avi", "avi", w, h, nFrames * usPerFrame / 1000L)
        }
        // advance in Long: 12 + 8 + (Int.MaxValue-8) + pad wraps an Int
        // index negative, which still satisfies the loop bound and then
        // indexes the array below zero
        val next = i.toLong + 8L + size + (size & 1L)
        if (next > b.length) return null
        i = next.toInt
      }
    }
    null
  }
}
