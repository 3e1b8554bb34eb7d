package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused PQ subspace assignment (r13) — replaces the hot-path idiom
  *
  *   emb.crossJoin(broadcast(cb))                          // |cb|× fan-out
  *      .select(posexplode(transform(sequence(0, m-1), s ->  // ×m rows
  *         aggregate(sequence(1, sub), 0L, (acc, i) ->
  *           acc + (xq[s*sub+i] - cq[s*sub+i])^2) * |cb| + cid)))
  *      .groupBy(vec_id[, m]).agg(min(k))                  // shuffle
  *
  * with ONE compiled pass per vector row: for each of the m subspaces,
  * the min over all |cb| codebook entries of the fused key
  * `dist·|cb| + cid` (dist = exact BIGINT squared L2 on the integer
  * grid, cid = the entry's position in `cqs`). The higher-order
  * formulation is CodegenFallback all the way down — per INPUT row it
  * pays |cb| lambda-dispatch trees of m×sub interpreted element_at
  * calls, plus the fan-out rows through a hash aggregate; here the
  * same m×|cb|×sub integer arithmetic runs inside one library-bytecode
  * eval() and the fan-out and shuffle disappear entirely.
  *
  * Exact-parity contract with the replaced pipeline (all arithmetic is
  * on BIGINTs, so there is no FP or summation-order concern):
  *  - key = dist·|cqs| + cid with Long wrap semantics (non-ANSI);
  *  - min over entries skips null keys, exactly as min() skips null
  *    rows: an entry's key is null when the entry itself is null, an
  *    addressed element is null, or an addressed index is out of the
  *    entry's bounds (element_at past the end returns null, nulling
  *    the whole fold);
  *  - a subspace where every entry's key is null yields a null array
  *    element (min over all-null);
  *  - null `xq` or null `cqs` yields null (input-null propagation).
  *
  * `m` (the subspace count) is an analysis-time constant folded by the
  * registration builder; sub = len(xq)/m, and indices past len(xq)
  * follow the element_at null rule above. Output: array<bigint>, one
  * fused key per subspace.
  */
case class PqMinKeys(left: Expression, right: Expression, m: Int)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        m >= 1
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>, m >= 1), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString}, m=$m)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_pq_min_keys"

  private lazy val xqElemsNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  private lazy val cqElemsNullable: Boolean = right.dataType match {
    case ArrayType(ArrayType(_, cn), _) => cn
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val xqV = left.eval(input)
    if (xqV == null) return null
    val cqsV = right.eval(input)
    if (cqsV == null) return null
    val xq = xqV.asInstanceOf[ArrayData]
    val cqs = cqsV.asInstanceOf[ArrayData]
    val n = xq.numElements()
    val k = cqs.numElements()
    val sub = n / m
    val checkNulls = xqElemsNullable || cqElemsNullable
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0L
      var found = false
      var c = 0
      while (c < k) {
        if (!cqs.isNullAt(c)) {
          val cq = cqs.getArray(c)
          val cqLen = cq.numElements()
          var dist = 0L
          var ok = true
          var i = s * sub
          val end = i + sub
          while (ok && i < end) {
            // element_at semantics: index past either array's end, or a
            // null element, nulls the whole fold for this entry.
            if (i >= n || i >= cqLen ||
                (checkNulls && (xq.isNullAt(i) || cq.isNullAt(i)))) ok = false
            else {
              val d = xq.getLong(i) - cq.getLong(i)
              dist += d * d
              i += 1
            }
          }
          if (ok) {
            val key = dist * k + c
            if (!found || key < best) { best = key; found = true }
          }
        }
        c += 1
      }
      out(s) = if (found) java.lang.Long.valueOf(best) else null
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqMinKeys =
    copy(left = newLeft, right = newRight)
}

/** Fused ADC (asymmetric distance) accumulation over PQ codes (r13) —
  * replaces the tail of the PQ probe pipeline
  *
  *   keys.select(vec_id, m, k % |cb| AS cid)
  *       .join(broadcast(cb), "cid")                // re-attach entries
  *       .crossJoin(broadcast(qv))
  *       .select(aggregate(..., (qv[i]-cq[i])^2) AS t)  // interpreted
  *       .groupBy(vec_id).agg(sum(t))               // second shuffle
  *
  * with one compiled pass per vector: adc = Σ over subspaces s of the
  * exact BIGINT squared L2 between the query's subvector and the
  * codebook entry assigned to s (cid = ks[s] mod |cqs|, the fused-key
  * decode). Parity contract with the replaced pipeline:
  *  - a null ks element drops that subspace's term exactly as the join
  *    drops a null-cid row; a null addressed element or out-of-bounds
  *    index nulls the term exactly as the interpreted aggregate does,
  *    and sum() skips null terms;
  *  - if every term is null/dropped the result is null (sum over no
  *    non-null rows);
  *  - null `ks`, `cqs` or `qv` yields null.
  * All arithmetic on BIGINTs with Long wrap semantics — no FP.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(LongType, _), _),
            ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<array<bigint>>, array<bigint>), " +
        s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  private lazy val ksElemsNullable: Boolean = first.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  private lazy val qvElemsNullable: Boolean = third.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  private lazy val cqElemsNullable: Boolean = second.dataType match {
    case ArrayType(ArrayType(_, cn), _) => cn
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val ksV = first.eval(input)
    if (ksV == null) return null
    val cqsV = second.eval(input)
    if (cqsV == null) return null
    val qvV = third.eval(input)
    if (qvV == null) return null
    val ks = ksV.asInstanceOf[ArrayData]
    val cqs = cqsV.asInstanceOf[ArrayData]
    val qv = qvV.asInstanceOf[ArrayData]
    val m = ks.numElements()
    val k = cqs.numElements()
    if (k == 0) return null
    val n = qv.numElements()
    val sub = n / m
    var acc = 0L
    var any = false
    var s = 0
    while (s < m) {
      if (!(ksElemsNullable && ks.isNullAt(s))) {
        // Spark % is the remainder with the dividend's sign; keys are
        // non-negative by construction, but mirror % exactly anyway.
        val cid = (ks.getLong(s) % k).toInt
        if (cid >= 0 && !cqs.isNullAt(cid)) {
          val cq = cqs.getArray(cid)
          val cqLen = cq.numElements()
          var t = 0L
          var ok = true
          var i = s * sub
          val end = i + sub
          while (ok && i < end) {
            if (i >= n || i >= cqLen ||
                (qvElemsNullable && qv.isNullAt(i)) ||
                (cqElemsNullable && cq.isNullAt(i))) ok = false
            else {
              val d = qv.getLong(i) - cq.getLong(i)
              t += d * d
              i += 1
            }
          }
          if (ok) { acc += t; any = true }
        }
      }
      s += 1
    }
    if (any) java.lang.Long.valueOf(acc) else null
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
}
