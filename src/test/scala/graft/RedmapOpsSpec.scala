package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.RedmapOps._

/** The redmap job surface, ported 1:1 onto the typed combinators, must
  * agree with the DataFrame operators that the oracle gate already
  * proves correct — and must plan the right physical shapes. */
class RedmapOpsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("wordcount via redmap combinators equals the DataFrame operator") {
    import spark.implicits._
    val texts = Tables(spark, sf).documents.select("text").as[String]
    val counted = texts
      .flatMapOp(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq)
      .keyByOp(identity)
      .mapValuesOp(_ => 1L)
      .reduceByKeyOp(_ + _)
      .collect().toMap
    val expected = operators.TextOps.mrWordcount(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counted == expected)
  }

  test("top-k via combinators plans TakeOrderedAndProject and matches q08") {
    import spark.implicits._
    val orders = Tables(spark, sf).orders
      .select("o_orderkey", "o_totalprice").as[(Long, Double)]
    // top 20 by highest price: order by (-price, key)
    val top = orders.topOp(20) { case (k, p) => (-p, k) }
    val expected = operators.Relational.q08TopkOrders(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top == expected)
  }

  test("reservoirOp equals the oracle-checked mr_reservoir sample") {
    import spark.implicits._
    val orders = Tables(spark, sf).orders.select("o_orderkey").as[Long]
    val sampled = orders.reservoirOp(100)(_.toString).toSet
    val expected = operators.Relational.mrReservoir(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(sampled == expected)
  }

  test("secondarySortOp equals the oracle-checked mr_secondary_sort first-3") {
    import spark.implicits._
    val evs = Tables(spark, sf).events
      .selectExpr("user_id", "unix_micros(ts) AS tus", "event_id")
      .as[(Long, Long, Long)]
      .map(e => (e._1, (e._2, e._3)))
    val firsts = evs.secondarySortOp(3)(identity)
      .collect().map { case (u, vs) => u -> vs.map(_._2).mkString(",") }.toMap
    val expected = operators.Relational.mrSecondarySort(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(firsts == expected)
  }

  test("secondarySortOp(0) yields empty value lists, not a crash") {
    import spark.implicits._
    val evs = Tables(spark, sf).events
      .selectExpr("user_id", "unix_micros(ts) AS tus").as[(Long, Long)]
      .map(e => (e._1, e._2))
    val out = evs.secondarySortOp(0)(identity).collect()
    assert(out.nonEmpty && out.forall(_._2.isEmpty))
  }

  test("sortOp plans a range exchange (no single-partition sort)") {
    import spark.implicits._
    val ds = Tables(spark, sf).customer.select("c_custkey").as[Long].sortOp(identity)
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("joinByKeyOp joins pair datasets by key") {
    import spark.implicits._
    val n = Tables(spark, sf).nation
      .select("n_nationkey", "n_name").as[(Int, String)]
    val r = Tables(spark, sf).nation
      .select("n_nationkey", "n_regionkey").as[(Int, Int)]
    val joined = n.joinByKeyOp(r).collect()
    assert(joined.length == 25 && joined.forall { case (_, _, rk) => rk >= 0 })
  }

  test("cogroupOp equals the oracle-checked mr_cogroup full-outer formulation") {
    import spark.implicits._
    val t = Tables(spark, sf)
    val cust = t.customer.select("c_nationkey", "c_acctbal").as[(Int, Double)]
    val supp = t.supplier.select("s_nationkey", "s_suppkey").as[(Int, Long)]
    val cg = cust.cogroupOp(supp) { (k, bals, supps) =>
      val bs = bals.toSeq
      Iterator((k, bs.length.toLong,
        BigDecimal(bs.sum).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
        supps.length.toLong))
    }.collect().sortBy(_._1)
    val expected = operators.Relational.mrCogroup(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    // The typed path folds balances in iterator order while the oracle
    // aggregates in shuffle order; compare sums at reduced precision.
    assert(cg.length == expected.length)
    cg.zip(expected).foreach { case ((k1, n1, s1, p1), (k2, n2, s2, p2)) =>
      assert(k1 == k2 && n1 == n2 && p1 == p2)
      assert(math.abs(s1 - s2) < 1e-2, s"nation $k1: $s1 vs $s2")
    }
  }

  test("runningReduceByKeyOp snapshots fold to reduceByKeyOp across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The mr_redmap_pipeline word stream, delivered across three
    // micro-batches: the append-mode snapshot log's per-key max must
    // equal the batch reduceByKeyOp counts exactly (counts are
    // monotone under exactly-once delivery).
    val words = Tables(spark, sf).documents.select("text").as[String]
      .flatMapOp(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq)
      .filterOp(_.length >= 4)
      .collect().toSeq
    val (a, rest) = words.splitAt(words.size / 3)
    val (b, c) = rest.splitAt(rest.size / 2)
    val input = MemoryStream[String]
    val q = input.toDS()
      .keyByOp(identity)
      .mapValuesOp(_ => 1L)
      .runningReduceByKeyOp(_ + _)
      .toDF("word", "cnt")
      .writeStream.format("memory").queryName("rrbk")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData(c); q.processAllAvailable()
    } finally q.stop()
    val folded = spark.sql(
      "SELECT word, max(cnt) AS cnt FROM rrbk GROUP BY word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = words.toDS()
      .keyByOp(identity).mapValuesOp(_ => 1L).reduceByKeyOp(_ + _)
      .collect().toMap
    assert(folded == batch,
      s"snapshot fold diverged: ${folded.size} vs ${batch.size} keys")
    assert(folded.values.exists(_ > 2), "fixture degenerate: no repeated words")
  }
}
