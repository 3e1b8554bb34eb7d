package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd cosine similarity over two `array<float>` columns.
  *
  * Replaces the `aggregate(zip_with(..))` higher-order formulation on the
  * hot path: higher-order functions are interpreted (no whole-stage
  * codegen, no subexpression elimination), which made pair-verification
  * joins O(candidates) interpreter dispatches. This expression compiles
  * to a tight fused loop.
  *
  * Cross-engine parity contract (the DuckDB oracle computes
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[]) / (sqrt(..)*sqrt(..))`):
  * float→double widening is exact, and all three accumulators sum
  * sequentially in element order — bit-identical to both the DuckDB
  * loop and the previous fold-based Spark expression.
  *
  * Null semantics match the fold formulation EXACTLY (ADVICE r2 —
  * required for RewriteFoldCosine to be semantics-preserving on every
  * input): unequal lengths → null (zip_with pads the shorter side with
  * nulls, nulling the whole fold) and any null element → null (null
  * poisons the running sum). The element null check is emitted only
  * when the input types admit nulls, so the containsNull=false hot
  * path keeps its tight three-accumulator loop.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  // lazy val, not def: the interpreted path evaluates this per ROW
  // (ADVICE r3) — one Seq allocation + two dataType matches per cosine.
  private lazy val elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val checkNulls = elemsNullable
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, n, i) =
        (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
          ctx.freshName("n"), ctx.freshName("i"))
      val nullCheck =
        if (elemsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double xi = (double) $a.getFloat($i);
         |    double yi = (double) $b.getFloat($i);
         |    $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
