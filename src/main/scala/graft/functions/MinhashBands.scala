package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused banded-minhash signature: array<bigint> shingle hashes → the
  * K=8 per-band minima of the affine family
  * `sig_j = min over h of (((2j+1) * 2654435761) % p) * h % p`,
  * p = 2^31-1 — exactly the arithmetic the DuckDB oracle spells out in
  * dedup_minhash_lsh's sig CTE. One loop over the hashes computes all 8
  * bands (vs 8 interpreted transform/array_min passes).
  */
case class MinhashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinhashBands.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashBands.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {
  val K = 8
  val P: Long = 2147483647L
  private val muls: Array[Long] =
    Array.tabulate(K)(j => (2L * j + 1) * 2654435761L % P)

  /** Null hash slots are skipped — same result as the SQL formulation,
    * where the affine map sends null → null and array_min/list_min
    * ignore nulls (ADVICE r2: getLong on a null slot was an executor
    * NPE for user-supplied containsNull=true arrays). */
  def compute(hs: ArrayData): GenericArrayData = {
    val n = hs.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < K) {
          val v = muls(j) * h % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(_.asInstanceOf[Any]))
  }
}
