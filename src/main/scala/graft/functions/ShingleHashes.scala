package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused 3-token shingle hasher: array<string> tokens → array<bigint>
  * distinct shingle hashes.
  *
  * Semantically identical (and oracle-parity-identical) to the SQL
  * pipeline it replaces:
  * {{{
  *   array_distinct(transform(
  *     array_distinct(transform(sequence(1, size(tk)-2),
  *       i -> concat_ws(' ', element_at(tk,i), element_at(tk,i+1), element_at(tk,i+2)))),
  *     x -> CAST(conv(substr(md5(x),1,8),16,10) AS BIGINT)))
  * }}}
  * i.e. md5 over the UTF-8 bytes of "t1 t2 t3", first 8 hex chars read
  * as an unsigned 32-bit integer. The interpreted formulation paid one
  * lambda dispatch + UTF8String allocation per token per stage; this is
  * one fused loop with a single reused digest.
  *
  * Note on distinctness: the SQL pipeline dedupes shingle STRINGS then
  * hashes; hashing first and deduping hashes is identical because the
  * hash is deterministic (equal strings → equal hashes, and a colliding
  * unequal pair collides identically in the mirrored DuckDB oracle).
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    ShingleHashes.compute(tk)
  }

  // Codegen delegates to the static helper: the work is a per-row loop
  // over tokens with a message digest — emitting it inline buys nothing
  // over a monomorphic static call, and this keeps the generated code
  // within janino limits.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = ' '.toByte

  /** Shared by interpreted eval and generated code. md5 is fed the raw
    * UTF-8 bytes of "t1 t2 t3" directly — byte-identical to hashing the
    * concat_ws(' ', ..) string, without materializing it. Null tokens
    * are dropped from the shingle exactly as concat_ws drops null
    * arguments (ADVICE r2: a containsNull=true input NPE'd here; the
    * registered SQL function is user-callable on arbitrary arrays). */
  def compute(tk: ArrayData): GenericArrayData = {
    val n = tk.numElements()
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - 3) {
      md.reset()
      var w = 0
      var first = true
      while (w < 3) {
        if (!tk.isNullAt(i + w)) {
          if (!first) md.update(Space)
          md.update(tk.getUTF8String(i + w).getBytes)
          first = false
        }
        w += 1
      }
      val d = md.digest()
      // first 8 hex chars == first 4 digest bytes as unsigned 32-bit
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}
