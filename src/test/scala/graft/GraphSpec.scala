package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Iterative-graph-kernel evidence (SURVEY §2.10): pagerank's
  * convergence contract and the triangle wedge-join balance. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("pagerank reaches the global-freeze fixpoint before the unroll cap") {
    // The cap is the oracle-mirroring bound, not the expected exit
    // (the kmeansLoop pattern): Spark must stop at the hysteresis
    // fixpoint — delta == 0 exactly — with room to spare, or the
    // early-stop == full-unroll equivalence is running on luck.
    val (ranks, iters) = GraphOps.pagerankRanks(spark, sf)
    info(s"pagerank froze after $iters iterations (cap ${GraphOps.PrMaxIter})")
    assert(iters > 1, "loop exited without iterating")
    assert(iters < GraphOps.PrMaxIter,
      s"no global freeze within ${GraphOps.PrMaxIter} iterations")
    // And the frozen state is a true fixpoint of the map: every rank
    // sits inside its 1% band (rp == r after the last application).
    val moved = ranks.filter(org.apache.spark.sql.functions.expr("r <> rp")).count()
    assert(moved == 0, s"$moved vertices still moving at exit")
  }
}
