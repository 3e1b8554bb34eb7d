package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relationally-derived graphs (SURVEY.md §2.10).
  *
  * Companion to DedupOps.dedupComponents (iterative min-label
  * propagation); here the iterative kernel is PageRank power iteration
  * over the customer↔supplier trade graph. The scale split: the
  * EXPENSIVE part is deriving the edge list from the fact tables (the
  * orders ⋈ lineitem shuffle, linear in the data) — it runs ONCE and is
  * localCheckpoint'ed; each iteration is then one edge⋈rank join + one
  * partial-aggregated groupBy on vertex-sized data. Ranks are
  * checkpointed per iteration (the dedup_components lineage-cut
  * pattern), so no plan ever contains more than one iteration and the
  * edge join never re-runs (the r2 sim_knn_graph diamond lesson). Rank
  * tables are left to AQE: vertex-sized sides broadcast at test scale
  * and shuffle at cluster scale — nothing is hint-pinned to a size
  * assumption.
  *
  * Cross-engine parity: ranks are FIXED-POINT BIGINT micro-units
  * (SCALE = 1e12) with truncating integer division (Spark `div`,
  * DuckDB `//`) — integer sums are order-independent, so results are
  * bit-exact across engines, partitionings, and merge orders, with
  * none of the float-summation-order risk an iterated double PageRank
  * would carry. Dangling mass is dropped (standard simplification) —
  * identically in both engines (moot here: the graph is undirected, so
  * every vertex with an edge has out-degree ≥ 1, and isolated vertices
  * hold teleport mass only).
  *
  * Vertex encoding: customer c → 2c, supplier s → 2s+1 (key spaces
  * overlap numerically; parity-tagging is collision-free at any scale).
  */
object GraphOps {

  /** Fixed-point scale: 1 rank unit = 1e-12. */
  private val Scale = 1000000000000L

  /** 3-iteration PageRank (d = 0.85) over the undirected bipartite
    * trade graph: {customer c} ↔ {supplier s} when any order line of
    * c's order was supplied by s. Output: top-20 vertices. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // Edge derivation: the one fact-fact shuffle (orders ⋈ lineitem on
    // orderkey); customer/supplier key columns come free from the fact
    // rows themselves. Checkpointed: out-degrees + all iterations reuse
    // the distinct pair set.
    val pairs = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cv"),
        (col("l_suppkey") * 2 + 1).as("sv"))
      .distinct()
      .localCheckpoint()
    // Undirected: both orientations of every pair.
    val edges = pairs.select(col("cv").as("src"), col("sv").as("dst"))
      .unionByName(pairs.select(col("sv").as("src"), col("cv").as("dst")))
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // Vertices carry N (vertex count) so teleport needs no driver-side
    // constant — a 1-row count broadcast-crossed onto the vertex set.
    val vertIds = t.customer.select((col("c_custkey") * 2).as("v"))
      .unionByName(t.supplier.select((col("s_suppkey") * 2 + 1).as("v")))
    val verts = vertIds
      .crossJoin(broadcast(vertIds.agg(count(lit(1)).as("n"))))
      .localCheckpoint()

    var ranks = verts.select(col("v"), col("n"), expr(s"$Scale div n").as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(outdeg, "src")
        .join(ranks.select(col("v").as("src"), col("r")), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      ranks = verts
        .join(contrib, col("v") === col("dst"), "left")
        .select(col("v"), col("n"),
          expr(s"($Scale * 15) div (100 * n) + (coalesce(in_mass, CAST(0 AS BIGINT)) * 85) div 100").as("r"))
        .localCheckpoint() // lineage cut: next iteration starts from materialized ranks
    }
    ranks
      .select(
        when(col("v") % 2 === 0, lit("customer")).otherwise(lit("supplier")).as("kind"),
        expr("v div 2").as("key"),
        col("r").as("rank_units"))
      .orderBy(col("rank_units").desc, col("kind"), col("key"))
      .limit(20)
  }

  /** Triangle counting over the co-purchase graph: parts are vertices,
    * an edge joins two parts co-ordered in ≥2 distinct orders (the
    * support threshold sparsifies boilerplate co-occurrence), and the
    * output is the top-20 parts by triangle participation — the local
    * clustering signal a recommender / community detector starts from.
    *
    * Scale posture: the edge list derives from ONE distinct+self-join
    * on l_orderkey (bounded per-order fan-out, see q26BasketPairs) and
    * is localCheckpoint'ed because the triangle enumeration joins it
    * THREE times — without the cut the pair-derivation shuffle would
    * run three times (the minhash r2 lesson). Edges are oriented
    * a<b<c, so each triangle is enumerated exactly once and the wedge
    * join (e1.b = e2.b2) never pairs a hub's full degree against
    * itself in both directions. */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = Relational.coPurchasePairCounts(spark, dir)
      .filter(col("n_orders") >= 2)
      .select("p1", "p2")
      .localCheckpoint()
    val tri = edges.select(col("p1").as("a"), col("p2").as("b"))
      .join(edges.select(col("p1").as("b"), col("p2").as("c")), "b")
      .join(edges.select(col("p1").as("a"), col("p2").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("p_partkey"))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(desc("n_triangles"), col("p_partkey"))
      .limit(20)
  }

  val oracles: Map[String, String] = Map(
    "graph_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS support
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |edges AS (SELECT p1, p2 FROM pairs WHERE support >= 2),
        |tri AS (
        |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |  FROM edges e1
        |  JOIN edges e2 ON e1.p2 = e2.p1
        |  JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        |vx AS (SELECT unnest([a, b, c]) AS p_partkey FROM tri)
        |SELECT p_partkey, count(*) AS n_triangles
        |FROM vx GROUP BY 1
        |ORDER BY n_triangles DESC, p_partkey LIMIT 20""".stripMargin,
    "graph_pagerank" -> {
      // Scale is interpolated, never hard-coded: a precision bump to
      // the Scala constant must not silently diverge the oracle.
      def iter(prev: String, cN: String, rN: String): String =
        s"""$cN AS (SELECT e.dst, sum($prev.r // od.outdeg) AS m
           |  FROM e JOIN od USING (src) JOIN $prev ON $prev.v = e.src
           |  GROUP BY e.dst),
           |$rN AS (SELECT v.v, v.n,
           |    ($Scale * 15) // (100 * v.n)
           |      + (coalesce($cN.m, 0) * 85) // 100 AS r
           |  FROM v LEFT JOIN $cN ON $cN.dst = v.v)""".stripMargin
      s"""WITH p AS (
         |  SELECT DISTINCT o.o_custkey * 2 AS cv, l.l_suppkey * 2 + 1 AS sv
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT cv AS src, sv AS dst FROM p
         |      UNION ALL SELECT sv AS src, cv AS dst FROM p),
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |vi AS (SELECT c_custkey * 2 AS v FROM customer
         |       UNION ALL SELECT s_suppkey * 2 + 1 AS v FROM supplier),
         |nn AS (SELECT count(*) AS n FROM vi),
         |v AS (SELECT vi.v, nn.n FROM vi CROSS JOIN nn),
         |r0 AS (SELECT v, n, $Scale // n AS r FROM v),
         |${iter("r0", "c1", "r1")},
         |${iter("r1", "c2", "r2")},
         |${iter("r2", "c3", "r3")}
         |SELECT CASE WHEN r3.v % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
         |  CAST(r3.v // 2 AS BIGINT) AS key,
         |  CAST(r3.r AS BIGINT) AS rank_units
         |FROM r3
         |ORDER BY rank_units DESC, kind, key LIMIT 20""".stripMargin
    },
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank(_, _)),
    "graph_triangles" -> (graphTriangles(_, _)),
  )
}
