package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan guards: no query may plan an unconditional
  * cartesian product (broadcast nested-loop joins against single-row /
  * tiny broadcast sides are fine and expected for query-vector and
  * anchor-array cross joins), and shuffle counts are reported so a plan
  * regression shows up as a diff in the test log.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("shuffle counts per query (report + ceiling)") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      name -> "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
        .findAllIn(plan).size
    }
    counts.foreach { case (n, c) => info(f"$n%-22s $c shuffle(s)") }
    // The heaviest pipelines (banded LSH with verification) legitimately
    // need several shuffles; anything beyond this ceiling means a join
    // or agg lost its partitioning reuse. Documented exceptions only:
    // - qc_completeness unions TEN independent single-scan global
    //   aggregates (one per table of the schema-wide panel); each
    //   contributes exactly one ONE-ROW partial->final exchange, so its
    //   count is bounded by the table count, never by data volume. A
    //   2-exchange stack-first rewrite was MEASURED in r10 and
    //   rejected: it ran 2.7x slower (corpus-sized row fan-out through
    //   the generator vs ten free 1-row hops) — see qcCompleteness.
    val ceiling = Map("qc_completeness" -> 10).withDefaultValue(8)
    counts.foreach { case (n, c) =>
      assert(c <= ceiling(n), s"$n plans $c shuffles (ceiling ${ceiling(n)})")
    }
  }
}
