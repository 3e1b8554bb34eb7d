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

  /** Session conf key overriding the shuffled-hash per-partition slice
    * bound (rows) — the middle tier's knob, independent of [[CapConf]]
    * so forcing the broadcast cap to 0 (the spec/bench degraded-path
    * driver) still exercises the realistic shuffled-hash regime. */
  val SliceConf = "spark.graft.shufflehash.sliceRows"

  /** Default row cap: ~400 MB of narrow state rows. */
  val DefaultRowCap = 8000000L

  private def longConf(df: DataFrame, key: String, dflt: Long): Long =
    df.sparkSession.conf.getOption(key).map { v =>
      try v.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be a plain row count (long), got '$v' — " +
            "byte-size suffixes are not supported; the bound is ROWS")
      }
    }.getOrElse(dflt)

  def rowCap(df: DataFrame): Long = longConf(df, CapConf, DefaultRowCap)

  def sliceRows(df: DataFrame): Long = longConf(df, SliceConf, DefaultRowCap)

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
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      val rp = df.repartition(par, keys: _*)
      // Middle tier — shuffled-hash while the AVERAGE per-partition
      // state slice stays within [[sliceRows]]: a slice-sized hash
      // table per task is no more memory than the broadcast path
      // already asks of every executor, and SHJ skips the TWO
      // per-round sorts an SMJ would pay on vertex-sized data
      // (measured sf0.1 cap=0: the 12-kernel degraded loop
      // 136.8 → 123.7 s). Past THAT bound the hint is dropped and the
      // join degrades once more — to sort-merge, which spills; a
      // forced hash build there would reintroduce the exact
      // die-instead-of-degrade mode this gate exists to remove
      // (review finding, r7). Partition count stays `par` in every
      // tier so the pre-partitioned edge checkpoint co-partitions
      // throughout.
      if (rows <= sliceRows(df) * par.toLong) rp.hint("shuffle_hash") else rp
    }
}
