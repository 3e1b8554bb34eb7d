package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch state: the k smallest
  * distinct hash values seen so far, sorted ascending. */
final case class KmvState(hs: Seq[Long])

/** KMV distinct-count sketch as a typed Aggregator — the classic
  * bounded-memory mergeable cardinality estimator (Bar-Yossef et al.):
  * keep the K smallest distinct 32-bit hashes; if fewer than K exist the
  * count is exact, otherwise estimate (K-1) / (h_K / 2^32).
  *
  * Unlike HLL (whose register layout is engine-specific, so Spark's
  * approx_count_distinct can never match an oracle), KMV over a mirrored
  * hash is FULLY DETERMINISTIC: the k-min set of a fixed hash function
  * is independent of row order, partitioning, and merge tree shape, so
  * the DuckDB oracle (a window rank over the same md5-derived hashes)
  * reproduces the estimate bit-for-bit.
  *
  * Scale posture: state is K longs per group regardless of input size;
  * reduce is O(1) amortized once the buffer fills (most rows fail the
  * `h >= last` gate); merge is a bounded sorted-merge — exactly the
  * partial-aggregation shape a 1000-executor groupBy needs.
  */
object KmvDistinct extends Aggregator[Long, KmvState, Double] {

  /** Sketch width: 64 gives ~1/sqrt(62) ≈ 13% standard error. */
  val K = 64
  private val Norm = 4294967296.0 // 2^32: hashes are 8-hex-char md5 prefixes

  override def zero: KmvState = KmvState(Vector.empty)

  override def reduce(s: KmvState, h: Long): KmvState = {
    val hs = s.hs
    if (hs.length == K && h >= hs.last) s // common case once warm: no-op
    else if (hs.contains(h)) s // distinct semantics (k=64: O(k) scan is cheap)
    else KmvState(((hs :+ h).sorted).take(K))
  }

  override def merge(a: KmvState, b: KmvState): KmvState =
    KmvState((a.hs ++ b.hs).distinct.sorted.take(K))

  override def finish(s: KmvState): Double =
    if (s.hs.length < K) s.hs.length.toDouble
    else (K - 1) * Norm / s.hs.last

  override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
