package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch state: D×W counter matrix, flattened row-major. */
final case class CmsState(counters: Array[Long])

/** Count-Min sketch (Cormode & Muthukrishnan) as a typed Aggregator —
  * the bounded-memory mergeable frequency estimator: D hash rows of W
  * counters; an item increments one counter per row; the estimate for a
  * key is the MIN of its D counters (never an underestimate, over by at
  * most the collision mass).
  *
  * Like [[KmvDistinct]] (and unlike engine-native sketches), this is
  * FULLY DETERMINISTIC cross-engine: cells are decoded from md5 hex
  * pairs of the item (mirrored digit-for-digit in the DuckDB oracle),
  * and the counter matrix is a sum — independent of row order,
  * partitioning, and merge-tree shape.
  *
  * Scale posture: state is D·W longs per group regardless of input
  * size; reduce is D array increments; merge is one elementwise add —
  * the exact partial-aggregate shape a 1000-executor groupBy needs. The
  * input is (precomputed cell vector, weight): cells come from a
  * codegen'd md5 expression at the call site, and the weight lets the
  * caller pre-aggregate duplicates with a cheap codegen'd count groupBy
  * before the typed aggregate — the CMS of a multiset is the weighted
  * CMS of its support (same reasoning as KmvDistinct's distinct-first
  * input), so the object-hash aggregate sees |vocabulary| rows instead
  * of |occurrences|.
  *
  * W is deliberately small (64) so the whole matrix (D·W longs) stays
  * cache-resident. A key only overcounts if it collides in ALL D rows —
  * at the test vocabulary (31 keys) that never happens, so
  * `agg_cms_heavy`'s estimates are exact there (the absent-key probe
  * still demonstrates est=0); the overcount path itself is pinned by
  * FunctionPropertiesSpec with crafted colliding cell vectors, and the
  * DuckDB oracle reproduces the full cell-sum semantics either way.
  */
object CountMinSketch extends Aggregator[(Seq[Int], Long), CmsState, CmsState] {

  /** Hash rows: 4 independent md5-hex-pair cell functions. */
  val D = 4
  /** Counters per row. */
  val W = 64

  override def zero: CmsState = CmsState(Array.fill(D * W)(0L))

  override def reduce(s: CmsState, in: (Seq[Int], Long)): CmsState = {
    val (cells, n) = in
    var i = 0
    while (i < D) { s.counters(i * W + cells(i)) += n; i += 1 }
    s
  }

  override def merge(a: CmsState, b: CmsState): CmsState = {
    val ac = a.counters
    val bc = b.counters
    var i = 0
    while (i < ac.length) { ac(i) += bc(i); i += 1 }
    a
  }

  override def finish(s: CmsState): CmsState = s

  override def bufferEncoder: Encoder[CmsState] = Encoders.product[CmsState]
  override def outputEncoder: Encoder[CmsState] = Encoders.product[CmsState]
}
