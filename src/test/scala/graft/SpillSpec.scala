package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r8 #5: prove the SizeGate degraded tier SPILLS instead of
  * dying. The SHJ middle tier exists because a forced shuffle_hash
  * build cannot spill — so past the shjBound the gate must drop the
  * hint and let the planner pick sort-merge, whose sorts spill to
  * disk under memory pressure. This spec forces that regime at
  * fixture scale: broadcast cap 0 (no tier 1), slice budget 1 (tier 2
  * bound collapses), and the sorter's force-spill threshold dialed
  * down so the SMJ sorts actually hit their spill path on a small
  * frame — then asserts completion, correctness, a SortMergeJoin
  * plan, and NONZERO spilled bytes observed through task metrics.
  */
class SpillSpec extends AnyFunSuite {
  import TestSpark.spark

  test("past the SHJ bound the degraded tier sort-merge-joins and SPILLS, never dies") {
    val sc = spark.sparkContext
    val spilledMem = new java.util.concurrent.atomic.AtomicLong(0)
    val spilledDisk = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach { m =>
          spilledMem.addAndGet(m.memoryBytesSpilled)
          spilledDisk.addAndGet(m.diskBytesSpilled)
        }
    }
    val keys = Seq(graft.plans.SizeGate.CapConf, graft.plans.SizeGate.SliceConf,
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    sc.addSparkListener(listener)
    try {
      spark.conf.set(graft.plans.SizeGate.CapConf, "0")
      spark.conf.set(graft.plans.SizeGate.SliceConf, "1")
      // The SMJ match buffer (ExternalAppendOnlyUnsafeRowArray) moves
      // to a spillable sorter past in.memory.threshold rows and spills
      // past spill.threshold — the RUNTIME-settable levers for
      // exercising the spill path without a multi-GiB fixture (the
      // core force-spill conf is static). Thresholds sized so each
      // key run spills a handful of times, not thousands: every spill
      // FILE costs a read-ahead buffer at replay, and a pathological
      // 16-row threshold OOMs the test JVM on reader buffers — the
      // first draft measured exactly that, which is its own evidence
      // the spill machinery (not an in-memory shortcut) is engaged.
      spark.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "512")
      spark.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "512")
      // Both broadcast levers off so the PLANNER can't rescue the join
      // either — this test is about the no-hint degraded regime.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val dup = 4096L // state rows per join key — each run spills ~8 chunks
      val keysN = 5L
      val n = dup * keysN
      val nEdges = 1000L
      val state = spark.range(0, n).toDF("id")
        .select((col("id") % keysN).as("v"), col("id").as("rank"))
      val edges = spark.range(0, nEdges).toDF("src")
        .withColumn("dst", col("src") % keysN)
      // rows=n >> shjBound=1 → tier 3: repartition only, NO shuffle_hash
      // hint — the join must degrade to spillable sort-merge.
      val gated = graft.plans.SizeGate.hintIfSmall(state, n, col("v"))
      val joined = edges.join(gated, col("dst") === col("v"))
        .agg(count(lit(1)).as("cnt"), sum("rank").as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"degraded tier did not plan a sort-merge join:\n${plan.take(2000)}")
      assert(!plan.contains("ShuffledHashJoin") && !plan.contains("BroadcastHashJoin"),
        "an unspillable build sneaked past the collapsed SHJ bound")
      val row = joined.first()
      assert(row.getLong(0) == nEdges * dup, s"join lost rows: ${row.getLong(0)}")
      // Key k matches state ranks {k, k+keysN, ...} (dup of them) for
      // each of its nEdges/keysN edges.
      val perKeyRankSum = (0L until keysN)
        .map(k => (0L until dup).map(j => k + keysN * j).sum)
      val expected = (0L until keysN)
        .map(k => (nEdges / keysN) * perKeyRankSum(k.toInt)).sum
      assert(row.getLong(1) == expected,
        s"rank sum ${row.getLong(1)} != $expected — spill corrupted the match buffer?")
      // Listener bus is async — poll for the spill metrics, bounded.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spilledMem.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spilledMem.get() > 0,
        "SMJ completed but never spilled — the force-spill regime did not engage, " +
          "so this run proved nothing about the degrade-by-spilling contract")
      assert(spilledDisk.get() > 0,
        s"memory spill without disk spill (mem=${spilledMem.get()})")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      sc.removeSparkListener(listener)
    }
  }
}
