package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-safe join tooling (SURVEY.md §5 posture; VERDICT r2 item #7).
  *
  * At 100 TB a single hot key (a null-ish default id, a bot user, an
  * empty-string fingerprint) turns one shuffle partition into a
  * straggler that runs for hours while 999 executors idle. Two layers
  * of defense, both demonstrated by SkewSpec and dumped in the plan
  * audit:
  *
  *  1. '''AQE skew-join splitting''' — `spark.sql.adaptive.skewJoin.
  *     enabled` is on in every GraftSession. At runtime Spark re-plans
  *     an oversized shuffle partition into multiple splits, each joined
  *     against a duplicated copy of the matching partition on the other
  *     side (`SortMergeJoin ... skew=true` in the final adaptive plan).
  *     Zero code changes in the query; this is the default path and the
  *     reason graft queries do not hand-roll salting.
  *
  *  2. '''Explicit salting''' ([[saltedJoin]]) — for the cases AQE
  *     cannot fix: a skewed '''broadcast-ineligible many-to-many''' join
  *     where one key's rows exceed a single task's memory even after
  *     splitting one side, or engines/paths where AQE is off (streaming
  *     joins are planned without AQE). The skewed side gets a uniform
  *     per-row salt in [0, S); the other side is replicated S× (one copy
  *     per salt value); the join key becomes (key, salt) so the hot
  *     key's rows spread over S shuffle partitions. Cost: S× shuffle
  *     volume of the smaller side — pick S ≈ (hot-key rows) /
  *     (rows-per-task budget), small (8–64).
  */
object SkewOps {

  val SaltCol = "__graft_salt"

  /** Equi-join with the skewed (large) side salted `salts` ways.
    * Result-identical to `skewed.join(other, keys, joinType)`: every
    * skewed-side row carries exactly one salt value and the other side
    * is replicated once per salt value, so each (key, salt) cell holds
    * the full set of `other` rows for that key. Supported join types
    * are the ones where `other`-side rows may be safely duplicated
    * before matching: inner, left_outer, left_semi, left_anti.
    *
    * The salt is `pmod(hash(monotonically_increasing_id()), salts)` —
    * uniform (hash of a per-row unique id, so even identical duplicate
    * rows spread) and stable within an execution (mono_id is a pure
    * function of partition id × row index, so a task retry recomputes
    * the same salts).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports left-preserving joins only, got $joinType " +
        "(a right/full join would need the salt on the other side)")
    val l = skewed.withColumn(SaltCol,
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val r = other.withColumn(SaltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** [[saltedJoin]] exercised in a REGISTERED ORACLE-GATED query path
    * (the sim_ann_kmeans_par move applied to the skew tooling): the
    * fact side of orders⋈lineitem joins through an 8-way salt, then
    * aggregates per order priority in exact cents. The oracle is the
    * PLAIN join — result-identity with the unsalted join IS the
    * operator's contract, so the DuckDB gate proves exactly the
    * property SkewSpec asserts, on real tables, every round. The
    * salt costs one 8× replication of the (orderkey, priority)
    * projection — the documented smaller-side price. */
  def mrSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    val l = t.lineitem.select(col("l_orderkey").as("k"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val o = t.orders.select(col("o_orderkey").as("k"), col("o_orderpriority"))
    saltedJoin(l, o, Seq("k"), salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("cents").cast("decimal(38,0)")).cast("double") / 100, 3)
          .as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Pre-join skew PROFILE — the diagnostic read BEFORE reaching for
    * [[saltedJoin]]: per-key row-count statistics for the join columns
    * a pipeline is about to shuffle on, one row per audited column.
    * `top1_ppm` (hot key's share) and `p99_over_p50` locate the skew;
    * `salt_rec` is the S ≈ hot-rows / avg-rows-per-key rule of thumb
    * from the [[saltedJoin]] doc, ready to pass as `salts`.
    *
    * Exactness: quantiles of the per-key count distribution are
    * TYPE-1 over the COUNT-OF-COUNTS table (the qc_iqr_outliers
    * posture — the window runs over |distinct counts| rows, never
    * |keys|), everything integer, engine division kept per-side.
    * Scale: ALL audited columns profile from ONE stacked scan keyed by
    * key_col (the first cut of this query ran two independent
    * 5-shuffle chains — 10 exchanges; the audit ceiling caught it).
    * Every downstream stage partitions on key_col, so the histogram
    * window, its quantile fold, and the per-column row stats reuse one
    * lattice: 2 data-sized exchanges (stacked key counts, count
    * histogram) + the key_col-sized rest. */
  def qcSkewProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Tables(spark, dir).lineitem
      .select(expr(
        "stack(2, 'l_suppkey', l_suppkey, 'l_partkey', l_partkey) AS (key_col, k)"))
      .groupBy("key_col", "k")
      .agg(count(lit(1)).as("c"))
    val hist = counts.groupBy("key_col", "c").agg(count(lit(1)).as("nk"))
    val w = Window.partitionBy("key_col").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q = hist
      .withColumn("cum", sum("nk").over(w))
      .withColumn("tot", sum("nk").over(
        Window.partitionBy("key_col")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("key_col")
      .agg(
        max("tot").as("n_keys"),
        min(when(expr("cum * 2 >= tot"), col("c"))).as("p50"),
        min(when(expr("cum * 100 >= tot * 99"), col("c"))).as("p99"))
    counts.groupBy("key_col")
      .agg(sum("c").as("n_rows"), max("c").as("max_rows"))
      .join(broadcast(q), "key_col")
      .selectExpr("key_col", "n_keys", "n_rows", "max_rows",
        "max_rows * 1000000 div n_rows AS top1_ppm",
        "p50", "p99",
        "p99 * 100 div p50 AS p99_over_p50_pct",
        "greatest(CAST(1 AS BIGINT), (max_rows * n_keys + n_rows - 1) div n_rows) AS salt_rec")
      .orderBy("key_col")
  }

  val oracles: Map[String, String] = Map(
    "qc_skew_profile" -> {
      def side(keyCol: String) =
        s"""SELECT '$keyCol' AS key_col, n_keys, n_rows, max_rows,
           |  max_rows * 1000000 // n_rows AS top1_ppm,
           |  p50, p99, p99 * 100 // p50 AS p99_over_p50_pct,
           |  greatest(CAST(1 AS BIGINT), (max_rows * n_keys + n_rows - 1) // n_rows) AS salt_rec
           |FROM (
           |  SELECT CAST(sum(c) AS BIGINT) AS n_rows, CAST(max(c) AS BIGINT) AS max_rows
           |  FROM (SELECT count(*) AS c FROM lineitem GROUP BY $keyCol)) a
           |CROSS JOIN (
           |  SELECT CAST(max(tot) AS BIGINT) AS n_keys,
           |    CAST(min(CASE WHEN cum * 2 >= tot THEN c END) AS BIGINT) AS p50,
           |    CAST(min(CASE WHEN cum * 100 >= tot * 99 THEN c END) AS BIGINT) AS p99
           |  FROM (
           |    SELECT c, sum(nk) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
           |           sum(nk) OVER () AS tot
           |    FROM (SELECT c, count(*) AS nk
           |          FROM (SELECT count(*) AS c FROM lineitem GROUP BY $keyCol)
           |          GROUP BY c))) b""".stripMargin
      s"""SELECT * FROM (${side("l_suppkey")}
         |UNION ALL
         |${side("l_partkey")})
         |ORDER BY key_col""".stripMargin
    },
    "mr_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100, 3) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_salted_join" -> (mrSaltedJoin(_, _)),
    "qc_skew_profile" -> (qcSkewProfile(_, _)),
  )

  /** Synthetic hot-key fixture shared by SkewSpec and the plan-audit
    * dump: `facts` is 200k rows where 75% share key 0 (the hot key)
    * and the rest are unique; `dim` is 1k keys, too large to broadcast
    * once the broadcast threshold is lowered. A plain shuffle join puts
    * 150k rows in one partition — the straggler shape. The payload is
    * murmur3-randomized so lz4 cannot compress the hot partition's
    * shuffle blocks away (skew detection compares COMPRESSED partition
    * bytes, and a constant-key run compresses ~10×). */
  def skewFixture(spark: SparkSession): (DataFrame, DataFrame) = {
    val facts = spark.range(0, 200000)
      .select(
        when(col("id") % 4 === 0, col("id")).otherwise(0L).as("k"),
        hash(col("id")).cast("long").as("payload"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 13).as("dim_payload"))
    (facts, dim)
  }

  /** The AQE-skew demo join over [[skewFixture]]: forced to sort-merge
    * (`merge` hint beats any broadcast decision) so the skewed shuffle
    * partition exists for AQE to split. Callers set the small
    * skew thresholds (see SkewSpec / Plans) before executing. */
  def skewDemoJoin(spark: SparkSession): DataFrame = {
    val (facts, dim) = skewFixture(spark)
    facts.join(dim.hint("merge"), Seq("k"))
  }
}
