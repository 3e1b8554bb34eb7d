package graft.plans

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** localCheckpoint with block bookkeeping — ONE definition of the pair
  * behind every iterative kernel (the GraphOps loops, the DedupOps
  * components/MIS rounds): [[tracked]] returns the checkpointed frame
  * plus the persistent-RDD ids the call registered; [[free]] releases
  * them once superseded. Ownership is a getPersistentRDDs diff, which
  * assumes queries run SERIALLY per session (true for Verify/Bench/the
  * driver — see the GraphOps.pagerankRanks note before going
  * concurrent).
  *
  * `eager = false` (VERDICT r7 #5) marks the plan for localCheckpoint
  * WITHOUT the upfront materialization job. Block REGISTRATION still
  * happens at call time (RDD.localCheckpoint persists immediately, so
  * the bookkeeping diff is exact either way), but the blocks
  * materialize inside the caller's NEXT action — which every loop
  * already runs right after the checkpoint (the round count / the
  * freeze-measure aggregate) — so checkpoint + measure ride ONE job
  * instead of two. At cluster latencies round setup dominates short
  * rounds; halving per-round driver actions is free latency
  * (JobCountSpec pins the job arithmetic).
  *
  * LAZY CONTRACT: run a FULL action (count / aggregate — something
  * that computes every partition) on the returned frame BEFORE freeing
  * any upstream checkpoint blocks its plan references. An
  * unmaterialized lazy checkpoint still computes through its parents;
  * freeing a parent first loses the only copy of truncated-lineage
  * data. Partial first actions (limit/take) are also fine for
  * correctness — the end-of-job doCheckpoint fills missing partitions
  * with a follow-up job — but forfeit the one-job win, so loop code
  * always pairs lazy with its full measure action.
  */
object Checkpoints {

  def tracked(df: DataFrame, eager: Boolean = true): (DataFrame, Set[Int]) = {
    PlanCapture.record(df)
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint(eager)
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  def free(sc: SparkContext, ids: Set[Int]): Unit =
    ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
}
