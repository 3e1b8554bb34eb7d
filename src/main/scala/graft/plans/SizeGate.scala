package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Size-gated join hint for vertex-sized iterative loop state
  * (VERDICT r6 #1).
  *
  * Every iterative kernel in this library (pagerank / ppr / hits /
  * label-prop / bfs-layers / diameter / closeness / betweenness /
  * kcore / dedup-mis) joins per-round vertex-sized state against a
  * checkpointed edge table. Post-checkpoint state is a LogicalRDD
  * with unknown stats, so without a hint the planner assumes it huge
  * and reshuffles the EDGE side every round (measured r5: the
  * pagerank loop 21.4 → ~7 s with the hint at sf0.1). But a
  * hard-coded `broadcast()` is a hand-edit-at-scale: past the point
  * where the vertex set fits the broadcast ceiling (8 GiB / driver
  * memory), the job DIES instead of degrading.
  *
  * [[hintIfSmall]] converts that hand-edit into a size gate. Every
  * loop already materializes a driver-side row count for its state
  * (the convergence measure / `nActive` / the frontier count); the
  * caller passes it here:
  *
  *  - `rows <= rowCap` → `broadcast(df)`: the measured-fast path, a
  *    zero-edge-shuffle round at any scale where the state fits.
  *  - `rows > rowCap` → repartition the STATE on the join key(s) so
  *    it co-partitions with the once-pre-partitioned edge table: the
  *    classic Pregel round — the per-round shuffle is vertex-sized
  *    (the state), never the edge list. With no keys supplied the
  *    state is returned unhinted (used where the state side already
  *    carries the right hash partitioning, e.g. a groupBy output).
  *
  * The cap is rows, not bytes, because the gated frames are all
  * narrow fixed-width (v, value) tuples (≤ ~48 B/row): the default
  * [[DefaultRowCap]] of 8M rows ≈ 400 MB broadcast — conservative
  * against the 8 GiB hard ceiling, overridable per-session via
  * [[CapConf]] (the GraphSpec gate tests force it to 0 to drive the
  * degraded path on fixture graphs).
  */
object SizeGate {

  /** Session conf key overriding the broadcast row cap. */
  val CapConf = "spark.graft.broadcast.rowCap"

  /** Default row cap: ~400 MB of narrow state rows. */
  val DefaultRowCap = 8000000L

  def rowCap(df: DataFrame): Long =
    df.sparkSession.conf.getOption(CapConf).map { v =>
      try v.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$CapConf must be a plain row count (long), got '$v' — " +
            "byte-size suffixes are not supported; the cap is ROWS")
      }
    }.getOrElse(DefaultRowCap)

  /** True when `rows` fits the session's broadcast row cap — callers
    * use this to pick the edge-table layout ONCE (broadcast path:
    * partition edges on the round's groupBy key; degraded path:
    * partition edges on the state-join key so the round co-partitions
    * instead of reshuffling edges). */
  def fits(df: DataFrame, rows: Long): Boolean = rows <= rowCap(df)

  /** Gate a vertex-sized state frame into a per-round edge join: see
    * object doc. `rows` is the caller's materialized driver-side row
    * count for `df` (or a monotone upper bound — conservative in the
    * safe direction: a bound only ever demotes broadcast to shuffle,
    * never the reverse). */
  def hintIfSmall(df: DataFrame, rows: Long, keys: Column*): DataFrame =
    if (fits(df, rows)) broadcast(df)
    else if (keys.isEmpty) df
    // shuffle_hash on the state side: the per-partition state slice is
    // rows/parallelism of narrow tuples — always hashable — and a
    // shuffled-hash join skips the TWO per-round sorts a sort-merge
    // join would pay on vertex-sized data (measured sf0.1 cap=0:
    // the 12-kernel degraded loop 136.8 → see SURVEY; the EDGE side
    // stays sort-free too).
    else df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
      .hint("shuffle_hash")
}
