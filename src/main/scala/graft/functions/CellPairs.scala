package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Ordered within-cell pair generation as ONE library-bytecode pass
  * (r13) — replaces the inverted-index hot-path idiom
  *
  *   flatten(transform(ids, (a, i) ->
  *     transform(slice(ids, i + 2, size(ids)),
  *       b -> named_struct('id1', a.doc_id, 'id2', b.doc_id,
  *                         'n1', a.n, 'n2', b.n))))
  *
  * over a sorted cell array `ids: array<struct<doc_id, n>>`. The
  * higher-order formulation is CodegenFallback all the way down: per
  * CELL it pays O(c²) lambda dispatches, c slice() array copies and
  * c² struct allocations through the interpreter. Here the same c²/2
  * pair construction runs inside one compiled eval() (the
  * AnchorSort/PqMinKeys precedent).
  *
  * Exact-parity contract with the replaced expression:
  *  - pair order: (i, j) for i < j in array order, i-major — exactly
  *    the flatten(transform(..., transform(slice(...)))) emission
  *    order;
  *  - a null element contributes pairs whose fields from that side are
  *    null (the lambda's a.doc_id on a null struct), never a null
  *    struct;
  *  - null `ids` yields null; cells of size < 2 yield an empty array.
  * Output: array<struct<id1, id2, n1, n2>> with the input's field
  * types (ids bigint, counts int — size() is IntegerType).
  */
case class CellPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = child.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && f1.dataType == IntegerType
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, int>>, " +
        s"got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id1", LongType, nullable = true),
      StructField("id2", LongType, nullable = true),
      StructField("n1", IntegerType, nullable = true),
      StructField("n2", IntegerType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cell_pairs"

  override def eval(input: InternalRow): Any = {
    val idsV = child.eval(input)
    if (idsV == null) return null
    val ids = idsV.asInstanceOf[ArrayData]
    val c = ids.numElements()
    // Unpack once: ids(k) -> (doc_id, n) with per-field null flags.
    val id = new Array[Long](c)
    val n = new Array[Int](c)
    val idNull = new Array[Boolean](c)
    val nNull = new Array[Boolean](c)
    var k = 0
    while (k < c) {
      if (ids.isNullAt(k)) { idNull(k) = true; nNull(k) = true }
      else {
        val st = ids.getStruct(k, 2)
        if (st.isNullAt(0)) idNull(k) = true else id(k) = st.getLong(0)
        if (st.isNullAt(1)) nNull(k) = true else n(k) = st.getInt(1)
      }
      k += 1
    }
    val out = new Array[Any](c * (c - 1) / 2)
    var w = 0
    var i = 0
    while (i < c) {
      var j = i + 1
      while (j < c) {
        out(w) = new GenericInternalRow(Array[Any](
          if (idNull(i)) null else java.lang.Long.valueOf(id(i)),
          if (idNull(j)) null else java.lang.Long.valueOf(id(j)),
          if (nNull(i)) null else java.lang.Integer.valueOf(n(i)),
          if (nNull(j)) null else java.lang.Integer.valueOf(n(j))))
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CellPairs =
    copy(child = newChild)
}
