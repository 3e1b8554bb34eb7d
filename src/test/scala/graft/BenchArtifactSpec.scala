package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r7 #1/#2 — the bench artifact's self-adjudication fields.
  * planSha must be invariant to the run-varying plan-string tokens
  * (expression ids, codegen/plan ids, data paths) and sensitive to
  * real plan changes; trailingMedians must read the committed rolling
  * history and scope itself to the matching scale factor.
  */
class BenchArtifactSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("planSha is stable across expr-id renumbering and path changes") {
    val a = """*(2) HashAggregate(keys=[g#123L], functions=[count(1)])
              |+- Exchange hashpartitioning(g#123L, 32), [plan_id=456]
              |   +- FileScan parquet [g#123L] Location: file:/root/testdata/sf0.01/x""".stripMargin
    val b = """*(2) HashAggregate(keys=[g#9871L], functions=[count(1)])
              |+- Exchange hashpartitioning(g#9871L, 32), [plan_id=12]
              |   +- FileScan parquet [g#9871L] Location: file:/root/testdata/sf0.1/x""".stripMargin
    assert(Bench.planSha(a) == Bench.planSha(b),
      "expr ids / plan ids / paths leaked into the fingerprint")
    val c = a.replace("HashAggregate", "SortAggregate")
    assert(Bench.planSha(a) != Bench.planSha(c),
      "a real operator change did not change the fingerprint")
    assert(Bench.planSha(a).matches("[0-9a-f]{12}"))
  }

  test("planSha of a live query is identical across two builds in one session") {
    def build() = graft.operators.Relational.q01PricingSummary(spark, sf)
    val s1 = Bench.planSha(build().queryExecution.executedPlan.toString)
    val s2 = Bench.planSha(build().queryExecution.executedPlan.toString)
    // The second build allocates fresh expression ids — the exact
    // across-boot variation the normalization must absorb.
    assert(s1 == s2, "same code, same session: fingerprints diverged")
  }

  test("trailingMedians reads the committed history, scoped to the sf") {
    // The committed seed: five full-suite sf0.1 lines (r5-r7 official
    // + the two r7 builder boots). Tests run with cwd = repo root.
    val m = Bench.trailingMedians("/root/testdata/sf0.1")
    assert(m.nonEmpty, "no medians parsed from BENCH_HISTORY.jsonl")
    val betw = m.get("graph_betweenness")
    assert(betw.exists(v => v > 5 && v < 30),
      s"betweenness median $betw outside the controlled band — the " +
        "seed should carry [12.1, 25.3, 15.2, 16.8, 52.1] → median 16.8")
    // The r7 official stall (52.1 s) must NOT be the median — the
    // window exists precisely so one stalled entry cannot become the
    // baseline.
    assert(betw.exists(_ < 30), "a stalled entry became the baseline")
    // Foreign sf → no medians → no retries ever trigger locally.
    assert(Bench.trailingMedians("/root/testdata/sf0.001").isEmpty)
  }
}
