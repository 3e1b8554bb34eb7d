package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel, as a static method the generated code calls
  * directly (the `UTF8String.levenshteinDistance` pattern Spark's own
  * levenshtein uses: a non-trivial kernel stays a JVM method, the
  * Expression stays inside whole-stage codegen with zero per-row
  * interpreter dispatch).
  *
  * Semantics are pinned to DuckDB's independent implementation (the
  * oracle), probed empirically before this was written:
  * - match window = max(⌊max(l1,l2)/2⌋ − 1, 0), greedy left-to-right
  *   first-unclaimed matching ('ab' vs 'ba' → 0.0: window 0 admits only
  *   same-position matches);
  * - transpositions = ⌊raw mismatched-aligned-match count / 2⌋ as an
  *   INTEGER ('abcdxx' vs 'bcadxx' → 0.9444, not the 0.9167 a float
  *   half would give);
  * - either side empty → 0.0 (not the 1.0 some libraries return for
  *   two empties);
  * - Winkler boost ℓ·0.1·(1−jaro), common-prefix ℓ capped at 4,
  *   applied only when jaro exceeds the classic 0.7 threshold
  *   ('abcdef' vs 'abzzzz' stays at its 0.5556 jaro despite the
  *   2-char prefix).
  * Comparison is per UTF-8 BYTE — the same walk DuckDB does, on any
  * input; both engines round to 4 decimals at the call sites,
  * absorbing any last-ulp division-order dust.
  */
object JaroWinklerAlgo {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    // Byte walk, not toString: avoids two String decodes per row on the
    // |dict|²/2 hot path, and per-BYTE comparison is exactly DuckDB's
    // own walk (more faithful to the oracle than UTF-16 chars would be
    // on any non-ASCII input). getBytes is copy-free for an untruncated
    // backing array.
    val s = a.getBytes
    val t = b.getBytes
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val sMatch = new Array[Boolean](l1)
    val tMatch = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var raw = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) raw += 1
        k += 1
      }
      i += 1
    }
    val trans = raw / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - trans) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `graft_jaro_winkler(string, string) -> double` — codegen'd
  * Jaro–Winkler similarity (see [[JaroWinklerAlgo]] for the exact
  * cross-engine contract). The eighth native expression: the short-
  * string fuzzy matcher the dedup family lacked — levenshtein verifies
  * EDITS (dedup_edit_near), Jaro–Winkler ranks typo-shaped NAME
  * matches where shared prefixes dominate (the record-linkage
  * convention since the census papers it comes from). */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
