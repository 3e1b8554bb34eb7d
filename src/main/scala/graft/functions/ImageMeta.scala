package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed metadata extraction for multimodal binary columns: parse the
  * container header of an image payload — PNG (IHDR), JPEG (SOF0/1/2
  * segment walk), GIF (logical screen descriptor) — into
  * `struct<format string, width int, height int>`, or null for
  * unrecognized bytes.
  *
  * This is the REAL half of the §2.6 multimodal story (the pixel
  * decoder stays stubbed — no imaging libs in the container): header
  * parsing needs no library, runs codegen'd per row, and gives the
  * pipeline the typed metadata it partitions/filters on (e.g. drop
  * sub-256px images before ever decoding them).
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_meta"

  override protected def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen (not defineCodeGen): the helper may return null for
  // unrecognized payloads, which must flip isNull.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ImageMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** Returns null for payloads that are not a recognized image. */
  def parse(b: Array[Byte]): InternalRow = {
    // PNG: 8-byte signature, IHDR chunk is always first → width/height
    // big-endian at offsets 16/20.
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a)
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a: logical screen w/h little-endian at 6/8.
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: SOI then marker segments; SOF0/1/2 carries height/width.
    // The walker skips 0xFF fill bytes before reading a marker (legal
    // padding between segments — ADVICE r2: treating a fill byte as a
    // segment start read a bogus length from payload bytes) and stops at
    // SOS (0xda, entropy-coded data follows — a SOF after it would be a
    // different frame) and EOI (0xd9, end of image).
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i < b.length && (b(i) & 0xff) == 0xff) {
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return null
        val marker = b(j) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return if (j + 8 <= b.length) row("jpeg", be16(b, j + 6), be16(b, j + 4))
          else null
        if (marker == 0xd9 || marker == 0xda) return null // EOI / SOS
        if (marker == 0x01 || marker == 0xd8 ||
          (marker >= 0xd0 && marker <= 0xd7)) i = j + 1 // standalone, no length
        else {
          if (j + 3 > b.length) return null
          i = j + 1 + be16(b, j + 1)
          // near-Int.MaxValue payloads: the advance can wrap negative,
          // which still passes `i < b.length` and indexes below zero
          if (i <= j) return null
        }
      }
      return null
    }
    null
  }
}
