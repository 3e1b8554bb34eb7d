package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints: normalized text → distinct selected
  * min-hashes (MOSS winnowing, gram length 5, window 4).
  *
  * Byte-identical to the SQL pipeline the DuckDB oracle mirrors:
  * {{{
  *   array_distinct(transform(sequence(1, size(gh) - 3), i -> array_min(slice(gh, i, 4))))
  *   with gh = transform(sequence(1, length(norm) - 4),
  *     i -> CAST(conv(substr(md5(substr(norm, i, 5)), 1, 8), 16, 10) AS BIGINT))
  * }}}
  * The input is ASCII by construction (the normalizer keeps [a-z0-9 ]),
  * so char positions == byte positions and md5 can run straight over
  * the byte window. One digest, one loop, no per-position UTF8String
  * allocation.
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private val Gram = 5
  private val Win = 4

  def compute(norm: UTF8String): GenericArrayData = {
    val bytes = norm.getBytes
    val nGrams = bytes.length - Gram + 1
    if (nGrams < Win) return new GenericArrayData(new Array[Any](0))
    val md = MessageDigest.getInstance("MD5")
    val gh = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, i, Gram)
      val d = md.digest()
      gh(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nGrams - Win) {
      var m = gh(i)
      var j = 1
      while (j < Win) { if (gh(i + j) < m) m = gh(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
