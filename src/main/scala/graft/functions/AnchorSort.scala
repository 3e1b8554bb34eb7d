package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Anchor scoring + ranking as ONE library-bytecode pass (r12) —
  * replaces the hot-path idiom
  *
  *   sort_array(transform(arr,
  *     a -> struct(0D - nanvl(graft_cosine(emb, a.av), -1D) AS negc,
  *                 a.aid AS aid)))
  *
  * over a broadcast anchor array `arr: array<struct<id, vec>>`.
  * The higher-order formulation is CodegenFallback all the way down:
  * per ROW it pays k lambda dispatches, k struct allocations, an
  * interpreted comparator sort, and (inside the lambda) the cosine's
  * interpreted dispatch — the n×k×d assignment pass that measured
  * minutes-per-task at the sf10 rung before the explicit spreads.
  * This expression is also nominally CodegenFallback (one interpreted
  * call per row), but the k×d arithmetic, ranking and output
  * construction all run inside this ONE compiled method — the
  * BootstrapWeights precedent: per-row work in pre-compiled library
  * bytecode, not interpreter dispatch.
  *
  * Exact-parity contract with the replaced expression (the oracle
  * gates hang off it):
  *  - cosine: [[CosineSim]]'s sequential double fold, bit-identical
  *    (null on length mismatch or — when the static type admits
  *    element nulls — any null element; NaN on zero norms);
  *  - score: negc = 0.0 - (NaN → -1.0 | cosine), null propagates;
  *  - order: ascending (negc, id) with the engine's struct-field
  *    semantics — null field first, ±0.0 equal (so ties, including
  *    every-score-equal degenerate rows, fall through to the id
  *    tiebreak exactly as sort_array orders them);
  *  - a NULL embedding scores every anchor null (the transform
  *    semantics: per-element null negc, ranked by id) rather than
  *    nulling the whole array.
  * Output: array<struct<negc double, id bigint>>, ascending.
  */
case class AnchorSort(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f0, f1)), _)) =>
        f0.dataType == LongType &&
          (f1.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<struct<bigint, array<float>>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("negc", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = right.nullable
  override def prettyName: String = "graft_anchor_sort"

  // Static element-null admission, mirroring CosineSim's elemsNullable
  // (the check is emitted only when the type admits nulls, so the
  // containsNull=false hot path keeps the tight loop AND the parity
  // with graft_cosine's behavior on the same static types).
  private lazy val embElemsNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  private lazy val anchorVecElemsNullable: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }
    case _ => false
  }

  /** CosineSim.nullSafeEval verbatim (boxed-null return). */
  private def cosine(x: ArrayData, y: ArrayData): java.lang.Double = {
    if (x == null || y == null) return null
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkNulls = embElemsNullable || anchorVecElemsNullable
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def eval(input: InternalRow): Any = {
    val arrV = right.eval(input)
    if (arrV == null) return null
    val anchors = arrV.asInstanceOf[ArrayData]
    val embV = left.eval(input)
    val emb = if (embV == null) null else embV.asInstanceOf[ArrayData]
    val k = anchors.numElements()
    val negc = new Array[Double](k)
    val scoreNull = new Array[Boolean](k)
    val ids = new Array[Long](k)
    val idNull = new Array[Boolean](k)
    var i = 0
    while (i < k) {
      if (anchors.isNullAt(i)) { scoreNull(i) = true; idNull(i) = true }
      else {
        val st = anchors.getStruct(i, 2)
        if (st.isNullAt(0)) idNull(i) = true else ids(i) = st.getLong(0)
        val av = if (st.isNullAt(1)) null else st.getArray(1)
        val c = cosine(emb, av)
        if (c == null) scoreNull(i) = true
        else {
          val v = c.doubleValue
          negc(i) = 0.0 - (if (java.lang.Double.isNaN(v)) -1.0 else v)
        }
      }
      i += 1
    }
    // Ascending (negc, id), null field first — the struct ordering
    // sort_array applies. Plain </> on doubles (NaN is impossible
    // post-nanvl; ±0.0 compare equal, falling to the id tiebreak,
    // matching SQLOrderingUtil).
    val idx = new Array[Integer](k)
    i = 0; while (i < k) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(ai: Integer, bi: Integer): Int = {
        val a = ai.intValue; val b = bi.intValue
        val c0 =
          if (scoreNull(a) && scoreNull(b)) 0
          else if (scoreNull(a)) -1
          else if (scoreNull(b)) 1
          else if (negc(a) < negc(b)) -1
          else if (negc(a) > negc(b)) 1
          else 0
        if (c0 != 0) c0
        else if (idNull(a) && idNull(b)) 0
        else if (idNull(a)) -1
        else if (idNull(b)) 1
        else java.lang.Long.compare(ids(a), ids(b))
      }
    })
    val out = new Array[Any](k)
    i = 0
    while (i < k) {
      val j = idx(i).intValue
      out(i) = new GenericInternalRow(Array[Any](
        if (scoreNull(j)) null else java.lang.Double.valueOf(negc(j)),
        if (idNull(j)) null else java.lang.Long.valueOf(ids(j))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AnchorSort =
    copy(left = newLeft, right = newRight)
}
