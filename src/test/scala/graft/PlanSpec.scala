package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Physical-plan shape assertions (the 100 TB posture, SURVEY.md §5):
  * filters/projections reach the parquet scan, dims broadcast, top-k
  * avoids global sort. Uses explain("formatted") text — the same
  * evidence a human plan audit reads.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("q02 pushes filters and prunes columns at the scan") {
    val p = plan(Relational.q02FilterProject(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity"), p)
    // pruned read schema: no l_shipdate/l_comment in the scan
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("q06 pushes its selective predicates to the scan") {
    val p = plan(Relational.q06ForecastRevenue(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q05 star join broadcasts the dimension tables") {
    val p = plan(Relational.q05LocalSupplier(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q14 broadcasts part") {
    val p = plan(Relational.q14ConditionalAgg(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q03 top-k plans TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.q03ShippingPriority(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q08 top-k plans TakeOrderedAndProject") {
    val p = plan(Relational.q08TopkOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q12 plans a left-semi join") {
    val p = plan(Relational.q12SemiJoin(spark, sf))
    assert(p.contains("LeftSemi"), p)
  }

  test("q11 plans a left-anti join") {
    val p = plan(Relational.q11AntiJoin(spark, sf))
    assert(p.contains("LeftAnti"), p)
  }
}
