package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewOps

/** Skew-safety evidence (VERDICT r2 item #7): AQE actually splits a
  * synthetically hot shuffle partition, and the explicit salted join is
  * result-identical to the plain join while spreading the hot key.
  *
  * Runs on a `newSession()` (shared SparkContext, private SQLConf) so
  * the lowered skew thresholds never leak into other specs.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val s = {
    val ns = TestSpark.spark.newSession()
    // Scale the AQE skew knobs down to the fixture size (200k rows):
    // a partition is "skewed" if > factor × median AND > threshold.
    // The hot partition is ~150k incompressible rows vs a ~12k-row median.
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ns
  }

  test("AQE splits the hot partition of a skewed sort-merge join (skew=true)") {
    val df = SkewOps.skewDemoJoin(s)
    val rows = df.collect() // drives the adaptive plan to its final form
    // 150k ids with id%4!=0 -> key 0 (hot, matches dim key 0) + the 250
    // ids divisible by 4 below 1000.
    assert(rows.length === 150250)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"expected a skew-split join in the final adaptive plan:\n$plan")
  }

  test("saltedJoin equals the plain join and shuffles on (key, salt)") {
    val (facts, dim) = SkewOps.skewFixture(s)
    val plain = facts.join(dim, Seq("k"))
    val salted = SkewOps.saltedJoin(facts, dim.hint("merge"), Seq("k"), salts = 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    // exact multiset equality, both directions
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    salted.write.format("noop").mode("overwrite").save()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains(SkewOps.SaltCol),
      s"expected the salt column in the join keys/partitioning:\n$plan")
  }

  test("saltedJoin preserves left_outer nulls and left_semi/anti row sets") {
    val (facts, dim) = SkewOps.skewFixture(s)
    val bigKeysOnly = dim.filter(org.apache.spark.sql.functions.col("k") < 500)
    for (jt <- Seq("left_outer", "left_semi", "left_anti")) {
      val plain = facts.join(bigKeysOnly, Seq("k"), jt)
      val salted = SkewOps.saltedJoin(facts, bigKeysOnly, Seq("k"), 4, jt)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"mismatch for $jt")
    }
  }
}
