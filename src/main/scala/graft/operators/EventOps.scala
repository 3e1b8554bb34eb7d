package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics operators (SURVEY.md §2.2 extension): the
  * bounded-range join, ordered-funnel, and cohort-retention shapes every
  * clickstream/telemetry pipeline needs.
  *
  * Scale posture: everything shuffles on `user_id` (or a (user, time-bin)
  * composite) — never on a timestamp alone — so partitioning survives a
  * 1000× fan-out; the range join is banded (each view lands in exactly 2
  * time-bin cells) so the candidate space is per-(user, bin) cells rather
  * than the per-user cross product a naive inequality join degenerates to
  * when one user has millions of events spread over years.
  */
object EventOps {

  /** 24 h in microseconds — the band width AND the funnel step window.
    * Integer microsecond arithmetic end-to-end so oracle parity is exact. */
  private[graft] val W24h = 86400000000L

  /** Bounded-range join: for every click, count the same user's views in
    * the preceding 24 h window.
    *
    * The naive formulation is an inequality join (user equal, view ts in
    * (click ts - W, click ts]) — Catalyst would plan the time predicate
    * as a post-join filter, making the join cost per-user quadratic.
    * Banding makes it equi: each view is replicated to its time bin and
    * the next (2 rows), each click probes its own bin only; a matching
    * pair is never more than one bin apart because the window width
    * equals the bin width. Join keys (user_id, bin) are uniform-ish by
    * construction, the exact range predicate filters within cells, and
    * the 2× replication of ONE side is the entire overhead. */
  def evRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("bin", expr(s"tus div $W24h"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), unix_micros(col("ts")).as("vtus"))
      .withColumn("bin", explode(expr(s"array(vtus div $W24h, vtus div $W24h + 1)")))
    val counts = clicks
      .join(views,
        col("user_id") === col("v_uid") && clicks("bin") === views("bin") &&
          col("vtus") >= col("tus") - W24h && col("vtus") < col("tus"))
      .groupBy("user_id", "event_id")
      .agg(count(lit(1)).as("n"))
    clicks
      .join(counts, Seq("user_id", "event_id"), "left")
      .select(col("user_id"), col("event_id"),
        coalesce(col("n"), lit(0L)).as("n_prior_views"))
      .orderBy("user_id", "event_id")
  }

  /** Ordered conversion funnel view → click → purchase, each step within
    * 24 h of the previous: per user, the deepest step reached, aggregated
    * to a step histogram.
    *
    * Each step is one groupBy(user_id) min — three narrow aggregates
    * chained by per-user joins, all hash-partitioned on user_id (one
    * physical shuffle layout reused), never a per-user event-sequence
    * sort. */
  /** ONE definition of the funnel rule (first view → first click
    * within 24 h → first purchase within 24 h), shared by the
    * step-count funnel and its latency companion so the business rule
    * cannot drift between them. c/p carry the previous step's
    * timestamp (t1k/t2k) for the latency op — extra columns the
    * count funnel simply ignores. Returns (ev, v, c, p). */
  private def funnelSteps(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("tus") > col("t1") && col("tus") <= col("t1") + W24h)
      .groupBy("user_id").agg(min("tus").as("t2"), max("t1").as("t1k"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("t2")), "user_id")
      .filter(col("tus") > col("t2") && col("tus") <= col("t2") + W24h)
      .groupBy("user_id").agg(min("tus").as("t3"), max("t2").as("t2k"))
    (ev, v, c, p)
  }

  def evFunnel(spark: SparkSession, dir: String): DataFrame = {
    val (ev, v, c, p) = funnelSteps(spark, dir)
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(expr(
        """CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
          | WHEN t1 IS NOT NULL THEN 1 ELSE 0 END""".stripMargin).as("steps"))
      .groupBy("steps")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("steps")
  }

  /** Cohort retention: users grouped by first-active day, distinct active
    * users per (cohort day, day offset) for offsets 0–7. The working set
    * after the first distinct is (user, day) pairs — days-per-user rows,
    * not events — so the cohort join is tiny relative to the input. */
  def evRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir).events
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min("d").as("d0"))
    days.join(cohort, "user_id")
      .select(col("user_id"), col("d0").as("cohort_day"),
        datediff(col("d"), col("d0")).as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Per-user daily activity with a 7-day RANGE-frame moving count —
    * the frame-based window shape (RANGE BETWEEN n PRECEDING) the other
    * windowed operators don't exercise: the frame is defined by VALUE
    * distance on the day number, not row offsets, so gap days shrink
    * the window (a ROWS frame would silently span them). All counts are
    * integers — exact cross-engine, no float-order risk.
    *
    * Shape: one (user, day) pre-aggregate (partial map-side), then one
    * window over the ~|users|·|days| daily grid — the window input is
    * the contracted table, never raw events. */
  def evMovingStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir).events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01"))).as("d"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).as("n_day"))
    val w = Window.partitionBy("user_id").orderBy("d").rangeBetween(-6, 0)
    daily
      .withColumn("n_7d", sum("n_day").over(w))
      .orderBy("user_id", "d")
  }

  /** Dense-grid gap filling: per event_type, the FULL hourly grid from
    * the type's first to last active hour with zero-filled counts — the
    * resampling step every time-series report/model needs (a missing
    * hour must be an explicit 0, not an absent row). The grid generates
    * from a per-type 2-row aggregate via sequence+explode — never a
    * driver loop — and the left join back to the observed counts is a
    * broadcast at any scale where hours-per-type fits an executor
    * (sequence length = time span, independent of event volume). Hour
    * arithmetic in integer epoch-hours end to end. */
  def evGapFill(spark: SparkSession, dir: String): DataFrame = {
    val hours = Tables(spark, dir).events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"))
    val grid = hours.groupBy("event_type")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
    grid.join(hours, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").as("epoch_hour"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("event_type", "epoch_hour")
  }

  /** Cumulative distinct users by day (the growth curve every product
    * dashboard wants): running distinct is O(seen keys) state done
    * naively, but distinct-by-first-appearance makes it linear — each
    * user collapses to their first active day (one partial-aggregated
    * groupBy), days aggregate to new-user counts, and the running sum
    * is a window over #days rows (aggregated data — same justification
    * as the vocab/ntile windows). */
  def evCumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstDay = Tables(spark, dir).events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("user_id").agg(min("d").as("d0"))
    firstDay.groupBy(col("d0").as("epoch_day"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users", sum("n_new").over(
        Window.orderBy("epoch_day").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("epoch_day")
  }

  /** Per-day DAU / trailing-7-day WAU stickiness — the engagement
    * ratio every product dashboard tracks next to the growth curve
    * ([[evCumulativeUsers]]).
    *
    * The sliding-window DISTINCT is the hard part at scale: a naive
    * "count distinct users where day in [d−6, d]" per day is a range
    * join against the raw event stream. Instead the stream collapses
    * ONCE to distinct (day, user) pairs (one partial-aggregated
    * shuffle, linear), and each pair fans out to the ≤7 window ends it
    * serves (a fixed 7× blow-up of the already-collapsed pairs — the
    * ev_range_join banding idea with a fully bounded fan-out). Both
    * counts are two-level distinct aggregates on day keys; days are
    * few but each day's distinct-user set is partial-aggregated before
    * the final shuffle. Day arithmetic is integer microseconds
    * end-to-end; stickiness is one division of two exact integers
    * (bit-identical cross-engine). Output rows: days with ≥1 active
    * user (the WAU side always covers them). */
  def evDauWau(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables(spark, dir).events
      .select(expr(s"unix_micros(ts) div $W24h").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint() // feeds both counts — one collapse pass
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** Hopping-window (sliding) counts: 1-hour windows every 30 minutes
    * via Spark's built-in `window()` — each event lands in exactly
    * window/slide = 2 windows, so the blow-up is the fixed overlap
    * factor, and the groupBy partial-aggregates on (window, type)
    * before the shuffle. The DuckDB oracle mirrors the same semantics
    * with an explicit 2-slot explode (epoch-aligned starts — Spark's
    * alignment contract). */
  def evSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("event_type"), col("cnt"))
      .orderBy("wstart", "event_type")

  /** Top event-type transitions (session path analysis): for each
    * user's time-ordered stream, the (event_type → next event_type)
    * pairs where the gap is ≤ 30 min (the ev_sessionize boundary, so
    * a transition never spans sessions), counted corpus-wide — the
    * Markov-chain edge weights behind funnel design and next-action
    * prediction. Deterministic order: (tus, event_id) is a total
    * order per user, so `lead` is well-defined under ties; output
    * top-20 by count with a (from, to) tiebreak.
    *
    * Scale: ONE shuffle on user_id for the lead window (per-user
    * sequences are bounded — the sessionize partitioning argument),
    * then a partial-aggregated groupBy on the tiny type-pair domain
    * and a TakeOrderedAndProject. */
  /** Full transition-count table behind [[evTopTransitions]] — exposed
    * pre-limit so StreamingSpec can equate it with the streaming twin's
    * aggregated edge emissions. */
  private[graft] def evTransitionCounts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("gap", lead("tus", 1).over(w) - col("tus"))
      .filter(col("to_type").isNotNull && col("gap") <= 1800000000L)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  def evTopTransitions(spark: SparkSession, dir: String): DataFrame =
    evTransitionCounts(spark, dir)
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
      .limit(20)

  /** The generator's closed event-type domain. ev_markov_stationary's
    * one-row matrix unroll needs a FIXED column naming; StatSpec's
    * "Markov stationary" test pins that the live domain equals this
    * list, so a drifted generator fails loudly instead of silently
    * dropping a type. */
  private[graft] val MarkovTypes =
    Seq("click", "error", "purchase", "signup", "view")

  /** Rounds of the fixed power-iteration unroll — identical in both
    * engines; past the quantized mixing point extra rounds barely move
    * the ppm ranks, and the CONTRACT is the fixed unroll, not a
    * convergence claim (the chain mixes in a handful of rounds at this
    * type-domain size). */
  private val MarkovRounds = 12

  /** The row-normalized matrix in exact ppm, as shared formula text:
    * a type with ZERO out-transitions (possible on a tiny corpus slice)
    * gets an all-zero row — an absorbing type redistributes nothing
    * and its mass drains over the rounds — instead of a division by
    * zero that would error (Spark ANSI) or NULL-cascade through every
    * layer (review finding, r6). */
  private def markovPExprs(divTok: String): Seq[String] =
    (for {
      i <- MarkovTypes; j <- MarkovTypes
    } yield s"CASE WHEN tot_$i = 0 THEN CAST(0 AS BIGINT) " +
      s"ELSE (n_${i}_$j * 1000000) $divTok tot_$i END AS p_${i}_$j") ++
      MarkovTypes.map(i => s"tot_$i")

  /** One power-iteration layer: r'_j = Σ_i (r_i · p_ij) div 1e6, as
    * formula TEXT shared verbatim by both engines (`divTok` is the
    * only dialect split — Spark `div`, DuckDB `//`). Everything is
    * BIGINT: p is the row-normalized matrix in ppm (≤1e6) and ranks
    * stay ~1e6-scale, so terms are bounded ~1e12 forever — corpus size
    * never enters the iteration. */
  private def markovLayer(divTok: String): Seq[String] =
    MarkovTypes.map { j =>
      MarkovTypes
        .map(i => s"((r_$i * p_${i}_$j) $divTok 1000000)")
        .mkString("(", " + ", s") AS r_$j")
    }

  /** Stationary distribution of the event-type Markov chain — the
    * model UNDER ev_top_transitions' raw counts: where does a user's
    * attention settle if the observed session-local dynamics run
    * forever? The analytics answer to "which surface ultimately owns
    * the traffic", read next to the raw transition table.
    *
    * Scale shape: the ONLY corpus-sized work is the shared
    * [[evTransitionCounts]] pass (one user_id window shuffle + a
    * ≤|types|² partial agg). The 5×5 matrix then collapses to ONE ROW
    * by conditional aggregation, row-normalizes to exact ppm, and the
    * power iteration unrolls as [[MarkovRounds]] chained select
    * layers over that single row (the stat_pacf trick applied to a
    * matrix recurrence) — zero joins, zero extra exchanges, and the
    * DuckDB oracle walks the IDENTICAL formula text so every
    * truncating division lands on the same BIGINTs. Readout unpivots
    * to (event_type, stationary_ppm, n_out) with the final
    * renormalization a single shared integer division. */
  def evMarkovStationary(spark: SparkSession, dir: String): DataFrame =
    markovStationaryFrom(evTransitionCounts(spark, dir))

  /** The stationary readout over ANY (from_type, to_type, n) count
    * table — shared by the batch query and the streaming twin
    * (transitionsStream's edge counts are mergeable, so the SAME
    * readout runs over state accumulated incrementally;
    * StreamingSpec pins stream == batch through it). */
  private[graft] def markovStationaryFrom(pairs: DataFrame): DataFrame = {
    // coalesce(sum, 0): over an EMPTY pairs table sum() is NULL, and a
    // NULL tot_i would slip past the tot_i = 0 absorbing-row guard and
    // NULL-cascade through every layer (r6 ADVICE). Coalesced (in both
    // engine texts), the degenerate input drains every rank to 0 as
    // the renormalization guard's comment promises.
    val matCols = (for {
      i <- MarkovTypes; j <- MarkovTypes
    } yield coalesce(sum(when(col("from_type") === i && col("to_type") === j,
      col("n")).otherwise(0L)), lit(0L)).as(s"n_${i}_$j")) ++
      MarkovTypes.map(i => coalesce(sum(when(col("from_type") === i, col("n"))
        .otherwise(0L)), lit(0L)).as(s"tot_$i"))
    val mrow = pairs.agg(matCols.head, matCols.tail: _*)
    val pCols = markovPExprs("div")
    val r0 = MarkovTypes.map(i => s"CAST(1000000 AS BIGINT) AS r_$i")
    val carry = pCols.map(_.split(" AS ").last) // p_*, tot_* pass through
    var it = mrow.selectExpr(pCols: _*).selectExpr(r0 ++ carry: _*)
    for (_ <- 1 to MarkovRounds)
      it = it.selectExpr(markovLayer("div") ++ carry: _*)
    val totalR = MarkovTypes.map(i => s"r_$i").mkString(" + ")
    // Same zero guard at the renormalization: an all-absorbing matrix
    // (empty pairs table) drains every rank to 0 by round 1.
    val stackArgs = MarkovTypes
      .map(i => s"'$i', CASE WHEN $totalR = 0 THEN CAST(0 AS BIGINT) " +
        s"ELSE (r_$i * 1000000) div ($totalR) END, tot_$i")
      .mkString(", ")
    it.selectExpr(
      s"stack(${MarkovTypes.size}, $stackArgs) AS (event_type, stationary_ppm, n_out)")
      .orderBy("event_type")
  }

  /** Top 3-step paths — [[evTopTransitions]] widened to trigrams: the
    * most common (step1 → step2 → step3) sequences where BOTH hops
    * stay inside the 30-min session gap (a path never crosses a
    * session boundary). The behavioral-flow report product teams read
    * next to the funnel. Same scale shape as transitions: ONE user_id
    * shuffle for the window, two lead() taps over it, then a
    * partial-aggregated count on the ≤|types|³ path domain and a
    * TakeOrderedAndProject top-20. */
  def evTopPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .withColumn("g1", lead("tus", 1).over(w) - col("tus"))
      .withColumn("g2", lead("tus", 2).over(w) - lead("tus", 1).over(w))
      .filter(col("t3").isNotNull
        && col("g1") <= 1800000000L && col("g2") <= 1800000000L)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  /** Funnel step latency — [[evFunnel]]'s companion: not how MANY
    * users reach each step but how LONG the converting users took
    * (median + p90 minutes per hop), the numbers a growth team reads
    * next to the step counts. Same step derivation as the funnel
    * (first view, first click within 24 h, first purchase within
    * 24 h); latencies are exact integer minutes and the quantiles are
    * the agg_exact_median counting selection over a per-hop minute
    * histogram — no interpolation, no sort of raw rows. */
  def evFunnelTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, _, c, p) = funnelSteps(spark, dir)
    val gaps = c
      .select(lit("1_view_to_click").as("hop"),
        expr("(t2 - t1k) div 60000000").as("m"))
      .unionByName(p.select(lit("2_click_to_purchase").as("hop"),
        expr("(t3 - t2k) div 60000000").as("m")))
    // The per-hop minute histogram feeds BOTH the cumulative window
    // and the totals join; without the cut the whole funnel chain
    // re-derives for the second consumer (PlanAuditSpec's ceiling
    // caught the un-cut plan at 13 shuffles — the agg_mad lesson).
    val h = gaps.groupBy("hop", "m").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val w = Window.partitionBy("hop").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("cum", sum("cnt").over(w))
      .join(broadcast(h.groupBy("hop").agg(sum("cnt").as("n"))), "hop")
      .filter((col("cum") - col("cnt") < expr("(n + 1) div 2") &&
        expr("(n + 1) div 2") <= col("cum")) ||
        (col("cum") - col("cnt") < expr("(9 * n + 9) div 10") &&
          expr("(9 * n + 9) div 10") <= col("cum")))
      .groupBy("hop")
      .agg(max("n").as("n_converted"),
        min(when(col("cum") - col("cnt") < expr("(n + 1) div 2") &&
          expr("(n + 1) div 2") <= col("cum"), col("m"))).as("median_min"),
        min(when(col("cum") - col("cnt") < expr("(9 * n + 9) div 10") &&
          expr("(9 * n + 9) div 10") <= col("cum"), col("m"))).as("p90_min"))
      .orderBy("hop")
  }

  /** Incremental materialized-view maintenance — the production
    * refresh pattern behind every hourly-rollup dashboard: the stored
    * MV (here: the hourly aggregate of the 90% "base" slice, built
    * once and lineage-cut to stand in for the persisted table) is
    * refreshed by recomputing ONLY the hours the 10% "delta" slice
    * touches — untouched MV rows pass through unscanned. Refresh cost
    * is O(delta + touched-hour slice), not O(corpus) — the
    * dedup_incremental argument applied to aggregation state. The
    * oracle is the PLAIN full aggregate: merged-refresh == full
    * recompute is exactly the MV-consistency contract. The base/delta
    * split is the deterministic md5 90/10 used by mix_split_assign. */
  def evIncrHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .withColumn("is_delta",
        expr("CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10 = 9"))
    val mv = ev.filter(!col("is_delta"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // the "stored" MV table
    val touched = ev.filter(col("is_delta")).select("h").distinct()
    val untouched = mv.join(broadcast(touched), Seq("h"), "left_anti")
    val refreshed = ev
      .join(broadcast(touched), Seq("h")) // base+delta rows of touched hours
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"))
    untouched.unionByName(refreshed)
      .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"))
      .orderBy("event_type", "epoch_hour")
  }

  /** Kaplan–Meier survival curve over user lifetimes — the churn
    * analysis a retention team runs: a user "dies" when inactive at
    * corpus end (≥1 full silent day — the synthetic corpus's activity
    * is dense, so longer horizons are degenerate; a production corpus
    * raises the constant; duration = last−first active day), otherwise
    * they are right-CENSORED at the observation horizon (the thing
    * naive "average lifetime" gets wrong). Output: one row per death
    * time t — at-risk count, deaths, and the survival estimate
    * S(t) = Π (1 − dᵢ/nᵢ).
    *
    * Determinism of an ordered PRODUCT of rationals: each factor
    * quantizes to an integer (nᵢ−dᵢ)·1e9 div nᵢ and the running
    * product is the integer recurrence acc·f div 1e9 folded LEFT over
    * the time-ordered factor list — both engines fold the identical
    * integer sequence (Spark `aggregate` with init == DuckDB
    * `list_reduce` over the init-prepended list), so S is bit-stable.
    * Scale: lifetimes contract events to ONE row per user; the KM
    * table is |distinct death times| (≤ observation days) rows, and
    * the fold happens once over that bounded list. */
  def evSurvival(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables(spark, dir).events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val u = days.groupBy("user_id").agg(min("day").as("d0"), max("day").as("dl"))
    val mx = days.agg(max("day").as("md"))
    val g = u.crossJoin(broadcast(mx))
      .select(
        expr("CASE WHEN md - dl >= 1 THEN dl - d0 ELSE md - d0 END").as("t"),
        expr("CASE WHEN md - dl >= 1 THEN 1 ELSE 0 END").as("ev"))
      .groupBy("t")
      .agg(sum("ev").as("d"), count(lit(1)).as("m"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val dth = g
      .crossJoin(broadcast(g.agg(sum("m").as("n"))))
      .withColumn("n_risk", col("n") - coalesce(sum("m").over(w), lit(0L)))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"),
        expr("(n_risk - d) * 1000000000 div n_risk").as("f"))
    dth
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"), col("d"), col("f"))))
        .as("arr"))
      .filter(size(col("arr")) > 0)
      .select(explode(expr(
        """transform(sequence(1, size(arr)), i -> struct(
          |  arr[i-1].t AS t, arr[i-1].n_risk AS n_risk, arr[i-1].d AS n_churn,
          |  aggregate(transform(slice(arr, 1, i), x -> x.f),
          |    CAST(1000000000 AS BIGINT),
          |    (acc, x) -> (acc * x) div 1000000000) AS sq))""".stripMargin)).as("s"))
      .select(col("s.t").as("t"), col("s.n_risk").as("n_risk"),
        col("s.n_churn").as("n_churn"),
        (round(col("s.sq").cast("double") / lit(1000000000.0), 4) + lit(0.0))
          .as("survival"))
      .orderBy("t")
  }

  /** Inter-purchase gap distribution — the repurchase-cycle histogram
    * behind retention and LTV models: per user, the day gap between
    * consecutive purchases, bucketed with a 30-day tail cap (the
    * agg_histogram bounded-domain discipline). One user_id window
    * shuffle + one ≤31-key count; every gap is exact integer days. */
  def evRepurchaseGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("prev", lag("tus", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(least(expr("(tus - prev) div 86400000000"), lit(30L)).as("gap_days"))
      .groupBy("gap_days")
      .agg(count(lit(1)).as("n"))
      .orderBy("gap_days")
  }

  /** Lag-1 autocorrelation of the daily event-count series — the
    * TIME-SERIES member of the stats family (t/U/KS compare groups,
    * linreg/spearman relate columns; this asks whether the series
    * remembers yesterday — the one-number screen behind "is volume
    * bursty or independent" capacity/anomaly decisions). The estimator
    * r1 = Σ(x_t−x̄)(x_{t+1}−x̄) / Σ(x_t−x̄)² is cleared of the
    * rational x̄ by multiplying through by n²: every accumulator is an
    * exact integer (counts, lagged cross products, squares — DECIMAL
    * (38,0)/HUGEINT through the fold), and r1 is derived by ONE
    * formula string shared verbatim with the oracle.
    *
    * Scale: the series is a |days|-key partial-aggregated count
    * (bounded by the time span at any volume — the ev_gap_fill
    * contract); the lag tap is a lead window over that bounded table,
    * and the final fold is one row. */
  /** Granger-causality derived layers over the exact n-cleared
    * co-moment integers — shared formula text (the bivariate-OLS
    * normal equations solved in closed 2×2 form, every product/divide
    * an IEEE-identical fixed tree; exp/ln never appear). The causal
    * flag compares the raw F against 3.84 — the asymptotic χ²₁ 5%
    * critical value (documented approximation: the exact F(1, n−3)
    * cutoff is 3.87-3.95 at the test scales' day counts). */
  private val GrangerLayers: Seq[Seq[String]] = Seq(
    Seq("n",
      "CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11",
      "CAST(n * sxx - sx * sx AS DOUBLE) AS cxx",
      "CAST(n * s1x - s1 * sx AS DOUBLE) AS c1x",
      "CAST(n * sy1 - sy * s1 AS DOUBLE) AS cy1",
      "CAST(n * syx - sy * sx AS DOUBLE) AS cyx",
      "CAST(n * syy - sy * sy AS DOUBLE) AS cyy"),
    Seq("*", "c11 * cxx - c1x * c1x AS det"),
    Seq("*",
      "(cy1 * cxx - cyx * c1x) / det AS bf",
      "(c11 * cyx - c1x * cy1) / det AS cf"),
    Seq("*",
      "cyy - cy1 * cy1 / c11 AS rssr",
      "cyy - bf * cy1 - cf * cyx AS rssf"),
    Seq("n",
      "round(bf, 6) + 0.0 AS ar_coef",
      "round(cf, 6) + 0.0 AS cross_coef",
      """CASE WHEN det <= 0 OR rssf <= 0 THEN NULL
        |     ELSE round((rssr - rssf) * (n - 3) / rssf, 4) + 0.0
        |END AS f_stat""".stripMargin,
      """CASE WHEN det <= 0 OR rssf <= 0 THEN NULL
        |     ELSE (rssr - rssf) * (n - 3) / rssf >= 3.84
        |END AS causal_5pct""".stripMargin))

  /** Granger causality: does yesterday's activity VOLUME predict
    * today's purchase REVENUE beyond what yesterday's revenue already
    * does? The causality screen completing the time-series panel
    * (autocorr: self-dependence; PACF: AR order; xi: any dependence
    * on time; THIS: directional cross-series predictive power — the
    * question "is volume a leading indicator" that a forecasting team
    * answers before adding the regressor). Restricted model
    * y ~ y_lag vs full y ~ y_lag + x_lag, both solved in closed form
    * from ONE pass of exact n-cleared co-moment integers
    * ([[GrangerLayers]]); F = (RSS_r − RSS_f)(n−3)/RSS_f with the
    * asymptotic 5% verdict. Lag = previous observed day in the day
    * order (the stat_autocorr convention). Scale: the series is a
    * |days|-key partial agg; the lag taps and the fold run over that
    * bounded table; the layer chain is a 1-row plan. */
  def statGranger(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"),
        when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L).as("v"))
      .groupBy("d")
      .agg(sum("v").as("y"), count(lit(1)).as("x"))
    val w = Window.orderBy("d")
    val t = daily
      .withColumn("y1", lag("y", 1).over(w))
      .withColumn("x1", lag("x", 1).over(w))
      .filter(col("y1").isNotNull)
    val folds = Seq(
      count(lit(1)).as("n"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
      sum(expr("CAST(y1 AS DECIMAL(38,0))")).as("s1"),
      sum(expr("CAST(y1 AS DECIMAL(38,0)) * y1")).as("s11"),
      sum(expr("CAST(x1 AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * x1")).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y1")).as("sy1"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * x1")).as("syx"),
      sum(expr("CAST(y1 AS DECIMAL(38,0)) * x1")).as("s1x"))
    GrangerLayers.foldLeft(t.agg(folds.head, folds.tail: _*)) {
      (df, l) => df.selectExpr(l: _*)
    }
  }

  def statAutocorr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val w = Window.orderBy("d")
    series
      .withColumn("xn", lead("x", 1).over(w))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"),
        sum(expr("CASE WHEN xn IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          "ELSE CAST(x AS DECIMAL(38,0)) * xn END")).as("cxy"),
        sum(expr("CASE WHEN xn IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          "ELSE CAST(x AS DECIMAL(38,0)) END")).as("sh"),
        sum(expr("CASE WHEN xn IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          "ELSE CAST(xn AS DECIMAL(38,0)) END")).as("st"))
      .selectExpr(AutocorrDerived: _*)
  }

  /** Autocorrelation derived stat over the exact integer accumulators
    * (n days, S = Σx, Q = Σx², and over the n−1 lagged pairs: cxy =
    * Σx_t·x_{t+1}, sh = Σx_t, st = Σx_{t+1}) — ONE formula string for
    * both engines (the TtestDerived idiom): numerator and denominator
    * are the mean-cleared sums scaled by n², each an exact integer. */
  private val AutocorrDerived = Seq(
    "n",
    """round(CAST(n * n * cxy - n * s * (sh + st) + (n - 1) * s * s AS DOUBLE)
      | / CAST(n * (n * q - s * s) AS DOUBLE), 4)
      | + 0.0 AS r1""".stripMargin)

  /** Partial autocorrelation, lags 1–3, of the daily event-count
    * series — the AR-order diagnostic next to stat_autocorr's r1 (an
    * AR(p) process shows PACF cut off after lag p while the ACF
    * tails): ACF r₁..r₃ from one pass of exact-integer lag
    * accumulators (the AutocorrDerived estimator generalized — each
    * lag k keeps its own pair sums over the n−k lagged pairs), then
    * the Durbin–Levinson recursion unrolled to depth 3 as SHARED
    * formula text layers, so every intermediate double is bit-equal
    * across engines before the final round(…, 4).
    *
    * Scale: the global window runs over the DAILY series — rows
    * bounded by the time horizon (decades ≈ 10⁴ rows), not the event
    * count; the heavy work is the partial-aggregated daily rollup. */
  def statPacf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val w = Window.orderBy("d")
    val led = series
      .withColumn("x1", lead("x", 1).over(w))
      .withColumn("x2", lead("x", 2).over(w))
      .withColumn("x3", lead("x", 3).over(w))
    val aggs =
      Seq(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q")) ++
      (1 to 3).flatMap(k => Seq(
        sum(expr(s"CASE WHEN x$k IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          s"ELSE CAST(x AS DECIMAL(38,0)) * x$k END")).as(s"c$k"),
        sum(expr(s"CASE WHEN x$k IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          s"ELSE CAST(x AS DECIMAL(38,0)) END")).as(s"sh$k"),
        sum(expr(s"CASE WHEN x$k IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
          s"ELSE CAST(x$k AS DECIMAL(38,0)) END")).as(s"st$k"),
        count(col(s"x$k")).as(s"n$k")))
    PacfLayers.foldLeft(led.agg(aggs.head, aggs.tail: _*)) {
      (df, layer) => df.selectExpr(layer: _*)
    }
  }

  /** Durbin–Levinson unroll as shared select layers (Spark selectExpr
    * chain == DuckDB CTE chain, identical IEEE trees): raw ACF per
    * lag (the AutocorrDerived formula with that lag's pair sums),
    * then φ₂₂, φ₂₁, φ₃₃, then the rounded readout (pacf1 ≡ r1). */
  private val PacfLayers: Seq[Seq[String]] = Seq(
    Seq("n") ++ (1 to 3).map(k =>
      s"""CAST(n * n * c$k - n * s * (sh$k + st$k) + n$k * s * s AS DOUBLE)
         | / CAST(n * (n * q - s * s) AS DOUBLE) AS r${k}raw""".stripMargin),
    Seq("*", "(r2raw - r1raw * r1raw) / (1e0 - r1raw * r1raw) AS p2raw"),
    Seq("*", "r1raw - p2raw * r1raw AS phi21"),
    Seq("*",
      """(r3raw - phi21 * r2raw - p2raw * r1raw)
        | / (1e0 - phi21 * r1raw - p2raw * r2raw) AS p3raw""".stripMargin),
    Seq("n",
      "round(r1raw, 4) + 0.0 AS r1",
      "round(r2raw, 4) + 0.0 AS r2",
      "round(r3raw, 4) + 0.0 AS r3",
      "round(r1raw, 4) + 0.0 AS pacf1",
      "round(p2raw, 4) + 0.0 AS pacf2",
      "round(p3raw, 4) + 0.0 AS pacf3"))

  /** Chatterjee ξ derived readout over the exact integer fold (n days,
    * a_sum = Σ|r_{i+1} − r_i| over the day order, b_sum = Σ lᵢ(n−lᵢ))
    * — ONE formula text for both engines; the only division is the
    * final one. A constant series has b_sum = 0 and no defined ξ. */
  private val XiDerived = Seq(
    "CAST(n AS BIGINT) AS n",
    "CAST(a_sum AS BIGINT) AS rank_jumps",
    "CAST(b_sum AS BIGINT) AS tie_mass",
    """CASE WHEN b_sum = 0 THEN NULL
      | ELSE round(1 - CAST(n AS DOUBLE) * a_sum / (2 * CAST(b_sum AS DOUBLE)), 4) + 0.0
      | END AS xi""".stripMargin)

  /** Chatterjee's ξ rank correlation (2021) of the daily event-count
    * series against time — the DEPENDENCE screen the classical pair
    * misses: Pearson (stat_linreg) sees linear signal and Spearman
    * monotone signal, while ξ → 1 whenever y is ANY measurable
    * function of x (a U-shape, a seasonal cycle) and ξ ≈ 0 under
    * independence. The tie-general estimator
    * ξ = 1 − n·Σ|r_{i+1}−r_i| / (2·Σ lᵢ(n−lᵢ)) runs on exact
    * integers end to end: rᵢ = #{y_j ≤ y_i} and lᵢ = #{y_j ≥ y_i}
    * come from ONE cumulative pass over the value-distinct histogram
    * (no arbitrary tie-break ever enters — the counting definition is
    * total), the |Δrank| sum from a lead window over the day order,
    * and the single division happens in [[XiDerived]] shared verbatim.
    *
    * Scale: the series is the horizon-bounded daily rollup (the
    * statAutocorr posture); histogram, ranks, and both windows run
    * over that bounded table, and the heavy work is the one
    * partial-aggregated daily count. */
  def statXiCorr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Checkpointed: the bounded daily series feeds the value histogram,
    // the totals row, AND the day-ordered join — one events pass.
    val series = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
      .localCheckpoint()
    val tot = series.agg(count(lit(1)).as("n"))
    val wv = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = series.groupBy("x").agg(count(lit(1)).as("cx"))
      .withColumn("cum", sum("cx").over(wv))
    val wd = Window.orderBy("d")
    series.join(broadcast(ranks), "x")
      .crossJoin(broadcast(tot))
      .select(col("d"), col("cum").as("r"),
        expr("n - (cum - cx) AS l"), col("n"))
      .withColumn("rn", lead("r", 1).over(wd))
      .agg(
        max("n").as("n"),
        sum(expr("CASE WHEN rn IS NULL THEN 0 ELSE abs(rn - r) END")).as("a_sum"),
        sum(expr("l * (n - l)")).as("b_sum"))
      .selectExpr(XiDerived: _*)
  }

  private[operators] def statXiCorrOracle: String =
    s"""WITH series AS (
       |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM series),
       |hv AS (SELECT x, CAST(count(*) AS BIGINT) AS cx FROM series GROUP BY 1),
       |rk AS (
       |  SELECT x, cx,
       |    sum(cx) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM hv),
       |j AS (
       |  SELECT series.d, rk.cum AS r, t.n - (rk.cum - rk.cx) AS l, t.n
       |  FROM series JOIN rk USING (x) CROSS JOIN t),
       |led AS (SELECT *, lead(r) OVER (ORDER BY d) AS rn FROM j),
       |m AS (
       |  SELECT max(n) AS n,
       |    sum(CASE WHEN rn IS NULL THEN 0 ELSE abs(rn - r) END) AS a_sum,
       |    sum(l * (n - l)) AS b_sum
       |  FROM led)
       |SELECT ${XiDerived.mkString(",\n")}
       |FROM m""".stripMargin

  /** Decision-stump purity layer — ONE text for both engines: for a
    * candidate split (left = pre-activity ≤ threshold), the
    * class-purity mass Σ_side Σ_class count²/n_side, each term one
    * double multiply-then-divide of exact integers combined in a FIXED
    * four-term expression tree (never an aggregation) — bit-equal
    * cross-engine, so the argmax ordering agrees without any rounding
    * contract. Maximizing purity minimizes weighted Gini impurity:
    * gini_split = 1 − purity/n. */
  private val StumpPurity =
    """CAST(pl AS DOUBLE) * pl / nl + CAST(nl - pl AS DOUBLE) * (nl - pl) / nl
      | + CAST(pr AS DOUBLE) * pr / nr + CAST(nr - pr AS DOUBLE) * (nr - pr) / nr
      | AS purity""".stripMargin

  /** Decision-stump readout over (threshold, nl, pl, nr, pr, n, pos,
    * purity) — shared verbatim; root and split Gini plus the gain. */
  private val StumpDerived = Seq(
    "threshold",
    "CAST(n AS BIGINT) AS n",
    "CAST(nl AS BIGINT) AS n_left",
    "CAST(nr AS BIGINT) AS n_right",
    "CAST(pl AS BIGINT) AS pos_left",
    "CAST(pr AS BIGINT) AS pos_right",
    """round(1 - (CAST(pos AS DOUBLE) * pos + CAST(n - pos AS DOUBLE) * (n - pos))
      | / (CAST(n AS DOUBLE) * n), 4) + 0.0 AS gini_root""".stripMargin,
    "round(1 - purity / n, 4) + 0.0 AS gini_split",
    """round((1 - (CAST(pos AS DOUBLE) * pos + CAST(n - pos AS DOUBLE) * (n - pos))
      | / (CAST(n AS DOUBLE) * n)) - (1 - purity / n), 4) + 0.0 AS gain""".stripMargin)

  /** Best single decision-stump split of post-period conversion by
    * pre-period activity — the 1-level decision tree that answers "at
    * WHAT activity level do users start converting?", the feature-
    * screening primitive behind tree ensembles and behind targeting
    * rules (ev_uplift_deciles slices by fixed deciles; this LEARNS the
    * cut). Candidates are the distinct pre-period event counts from
    * the shared [[prePostUsers]] panel (so the stump composes with the
    * experimentation family's definitions); for each, left/right
    * class counts come from ONE cumulative window over the
    * value-distinct histogram, the class-purity objective evaluates
    * through [[StumpPurity]] shared verbatim (exact integers, fixed
    * four-term IEEE tree — the stat_changepoint argmax contract), and
    * TakeOrderedAndProject picks the winner with ties on the smaller
    * threshold in both engines.
    *
    * Scale: one user-keyed partial-aggregated shuffle (the panel), one
    * histogram over the bounded activity domain, one window over that
    * domain, a 1-row totals broadcast, and a k=1 top-k — no per-user
    * window, nothing quadratic. An unbounded activity domain would bin
    * first, exactly like agg_histogram. */
  def statBestSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = prePostUsers(spark, dir)
      .select(col("ex"), col("conv"))
    val h = users.groupBy("ex")
      .agg(count(lit(1)).as("cnt"), sum("conv").as("pos"))
      .localCheckpoint()
    val tot = h.agg(sum("cnt").as("n"), sum("pos").as("pos_tot"))
    val w = Window.orderBy("ex")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("nl", sum("cnt").over(w))
      .withColumn("pl", sum("pos").over(w))
      .drop("pos")
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("n"))
      .selectExpr("ex AS threshold", "nl", "pl", "n", "pos_tot AS pos",
        "n - nl AS nr", "pos_tot - pl AS pr")
      .selectExpr("threshold", "nl", "pl", "nr", "pr", "n", "pos", StumpPurity)
      .orderBy(col("purity").desc, col("threshold").asc)
      .limit(1)
      .selectExpr(StumpDerived: _*)
  }

  private[operators] def statBestSplitOracle: String =
    s"""WITH $PrePostCte,
       |h AS (
       |  SELECT ex, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(conv) AS BIGINT) AS pos
       |  FROM u GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos FROM h),
       |cw AS (
       |  SELECT ex,
       |    sum(cnt) OVER (ORDER BY ex ROWS UNBOUNDED PRECEDING) AS nl,
       |    sum(pos) OVER (ORDER BY ex ROWS UNBOUNDED PRECEDING) AS pl
       |  FROM h),
       |cand AS (
       |  SELECT ex AS threshold, nl, pl, n, pos, n - nl AS nr, pos - pl AS pr
       |  FROM cw CROSS JOIN tot WHERE nl < n),
       |pur AS (
       |  SELECT threshold, nl, pl, nr, pr, n, pos, $StumpPurity
       |  FROM cand),
       |win AS (
       |  SELECT * FROM pur ORDER BY purity DESC, threshold ASC LIMIT 1)
       |SELECT ${StumpDerived.mkString(",\n")}
       |FROM win""".stripMargin

  /** Daily new-vs-returning user split — the growth-accounting view
    * next to ev_cumulative_users' running total and ev_dau_wau's
    * stickiness ratio (is today's activity acquisition or retention?):
    * per day, actives whose FIRST-ever active day is today vs the
    * rest. First appearance is a per-user min over the collapsed
    * (day, user) pairs — the ev_cumulative_users linearization of what
    * is naively a self-join against all history.
    *
    * Scale: one distinct over (day, user) pairs (partial-agg shuffle),
    * one user-keyed min, one user-keyed join of two user-sized tables,
    * and a |days|-key rollup. No window over raw events, nothing
    * quadratic; the first-appearance table is the thing a production
    * pipeline would persist and merge incrementally (min is a
    * semilattice — the same property the streaming twins exploit). */
  def evNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .distinct()
    val first = du.groupBy("user_id").agg(min("d").as("first_d"))
    du.join(first, "user_id")
      .groupBy("d")
      .agg(
        sum(when(col("d") === col("first_d"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("d") === col("first_d"), 0L).otherwise(1L)).as("returning_users"))
      .orderBy("d")
  }

  /** Theil–Sen robust trend — the MEDIAN of all pairwise slopes of the
    * daily event-count series (the outlier-immune complement to
    * stat_linreg's OLS slope: one corrupted day moves OLS by its
    * leverage but shifts a median by at most one rank). Slopes are
    * exact integers — (x_j−x_i)·10⁶ div (d_j−d_i), truncate-toward-
    * zero identical in both engines on BIGINT (the q34 parity note;
    * day counts would need >9·10¹² events/day to overflow the ppm
    * product) — and the median is a counting selection over the slope
    * histogram (the agg_exact_median contract: no interpolation, no
    * sort of the raw pairs, lower median at even n).
    *
    * Scale: the pairwise expansion is over the DAILY series, whose
    * length is bounded by the time span — O(span²) pairs INDEPENDENT
    * of row volume (the one place an inequality join is legitimate:
    * the bounded side broadcasts, so no cartesian shuffle exists).
    * The selection window runs over ≤|distinct slopes| ≤ span² rows. */
  def statTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val series = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val a = series.select(col("d").as("d1"), col("x").as("x1"))
    val b = series.select(col("d").as("d2"), col("x").as("x2"))
    val hist = a.join(broadcast(b), col("d2") > col("d1"))
      .select(expr("(x2 - x1) * 1000000 div (d2 - d1)").as("s"))
      .groupBy("s").agg(count(lit(1)).as("c"))
    val n = hist.agg(sum("c").as("n_pairs"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum("c").over(w))
      .crossJoin(broadcast(n))
      .filter(col("cum") >= expr("(n_pairs + 1) div 2") &&
        col("cum") - col("c") < expr("(n_pairs + 1) div 2"))
      .select(col("n_pairs"), col("s").as("slope_ppm"))
  }

  /** Wald–Wolfowitz runs test — is the daily volume series RANDOM
    * around its median, or does it trend/oscillate? (The randomness
    * screen next to stat_autocorr's memory measure: autocorrelation
    * sees linear dependence, runs count sees ANY sign-pattern
    * structure.) Days equal to the median drop (the classic
    * convention); R, n₁, n₂ are exact integers — R = 1 + sign-change
    * count from a lag window over the span-bounded daily table — and
    * z = (R − (2n₁n₂/n + 1)) / √(2n₁n₂(2n₁n₂ − n)/(n²(n − 1))) is ONE
    * shared formula string with a degenerate guard (an empty side, or
    * zero variance when 2n₁n₂ ≤ n — e.g. n₁ = n₂ = 1, where the raw
    * formula divides by a 0.0 sqrt into ±Inf/NaN).
    * The median is the agg_exact_median counting selection over the
    * daily-count histogram.
    *
    * Scale: everything after the |days|-key partial agg runs on the
    * span-bounded series (histogram, selection window, lag window). */
  def statRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val series = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val hist = series.groupBy("x").agg(count(lit(1)).as("c"))
    val n = hist.agg(sum("c").as("n_days"))
    val wv = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = hist.withColumn("cum", sum("c").over(wv))
      .crossJoin(broadcast(n))
      .filter(col("cum") >= expr("(n_days + 1) div 2") &&
        col("cum") - col("c") < expr("(n_days + 1) div 2"))
      .select(col("x").as("med"))
    val wd = Window.orderBy("d")
    series.crossJoin(broadcast(med))
      .filter(col("x") =!= col("med"))
      .select(col("d"), (col("x") > col("med")).cast("int").as("s"))
      .withColumn("prev", lag("s", 1).over(wd))
      .agg(
        sum(expr("s")).as("n1"),
        sum(expr("1 - s")).as("n2"),
        sum(expr("CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END"))
          .as("runs"))
      .selectExpr(Seq("n1", "n2", "runs", RunsZ): _*)
  }

  /** Runs-test z over the exact (n1, n2, runs) integers — ONE formula
    * string for both engines; every product stays in DECIMAL(38,0)
    * until the two final double casts. */
  private val RunsZ =
    """round(CASE WHEN n1 = 0 OR n2 = 0 OR 2 * n1 * n2 <= n1 + n2 THEN 0.0
      | ELSE CAST(runs * (n1 + n2) - (2 * CAST(n1 AS DECIMAL(38,0)) * n2 + n1 + n2) AS DOUBLE)
      |   / ((n1 + n2) * sqrt(CAST(2 * CAST(n1 AS DECIMAL(38,0)) * n2
      |        * (2 * CAST(n1 AS DECIMAL(38,0)) * n2 - n1 - n2) AS DOUBLE)
      |      / CAST(CAST(n1 + n2 AS DECIMAL(38,0)) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))
      | END, 4) + 0.0 AS z""".stripMargin

  /** Weekly seasonality profile — the day-of-week × hour-of-day activity
    * grid (the load-shape heatmap behind capacity planning and
    * anomaly-baseline choice; ev_hourly_agg is the TIMELINE, this is
    * the folded CYCLE). Both coordinates come from exact integer
    * epoch-microsecond arithmetic — dow = (days + 4) mod 7 (epoch day 0
    * was a Thursday; 0 = Sunday) and hour = (us div 3.6e9) mod 24 —
    * rather than calendar functions, because Spark's dayofweek is
    * 1-based Sunday while DuckDB's is 0-based: deriving both from the
    * same integer formula removes the calendar-convention parity trap
    * entirely (the UTC-pinned-session contract all event ops share).
    *
    * Scale: a pure per-row map into a partial-aggregated count on the
    * fixed 168-cell domain, plus a 1-row total broadcast for exact-ppm
    * shares — one shuffle of ≤168 rows per partition, no window. */
  def evSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hour"))
    val grid = ev.groupBy("dow", "hour").agg(count(lit(1)).as("n"))
    val tot = grid.agg(sum("n").as("n_total"))
    grid.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n"),
        expr("n * 1000000 div n_total").as("share_ppm"))
      .orderBy("dow", "hour")
  }

  /** Session entry/exit matrix — what users arrive ON and leave FROM
    * (the landing/exit-page analysis next to ev_top_transitions'
    * within-session edges): sessions by the shared 30-min-gap rule,
    * entry = first event type, exit = last (both under the (tus,
    * event_id) total order every session op uses), counted on the
    * |types|² grid with exact-ppm shares of all sessions.
    *
    * Scale: ONE user-keyed window pass builds session ids and both
    * boundary ranks (three window functions over the same
    * WindowExec), then a partial-aggregated pivot of boundary rows
    * only; the grid rollup is |types|²-keyed. */
  def evEntryExit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val sess = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy("user_id", "sid").orderBy("tus", "event_id")
    val bounds = sess
      .withColumn("rn_a", row_number().over(ws))
      .withColumn("rn_d", row_number().over(
        Window.partitionBy("user_id", "sid").orderBy(desc("tus"), desc("event_id"))))
      .filter(col("rn_a") === 1 || col("rn_d") === 1)
      .groupBy("user_id", "sid")
      .agg(max(when(col("rn_a") === 1, col("event_type"))).as("entry_type"),
        max(when(col("rn_d") === 1, col("event_type"))).as("exit_type"))
    val grid = bounds.groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"))
    grid.crossJoin(broadcast(grid.agg(sum("n_sessions").as("n_total"))))
      .select(col("entry_type"), col("exit_type"), col("n_sessions"),
        expr("n_sessions * 1000000 div n_total").as("share_ppm"))
      .orderBy("entry_type", "exit_type")
  }

  /** Bot/automation screen — the traffic-hygiene shortlist every
    * training-data pipeline runs over behavioral logs before trusting
    * them (ev_user_features builds the MODELING features; this ranks
    * users by the burstiness fingerprints that separate scripts from
    * people): per user, hour-level concentration (max events in any
    * one active hour vs the uniform share) and the mean inter-event
    * gap. burst_ppm = max_hourly·active_hours·10⁶ div n_events — an
    * exact-integer ratio that is 10⁶ for a perfectly uniform user and
    * grows with concentration; mean_gap_us = (last−first) div (n−1),
    * exact microseconds. Top-20 shortlist by (burst desc, user) via
    * TakeOrderedAndProject.
    *
    * Scale: one (user, hour) partial-agg count re-aggregated per user,
    * one user-keyed scalar pass, a co-partitioned user join (both
    * sides already hash on user), and a global top-20 heap. No raw-
    * event window — the gap statistic needs only first/last/count. */
  def evBotScreen(spark: SparkSession, dir: String): DataFrame = {
    // Checkpointed: the slim projection feeds two DIFFERENTLY-keyed
    // aggregations ((user, hour) and user) — ReuseExchange can't merge
    // those, so without the cut the fact scan + unix_micros run twice
    // (the ev_sessionize/ev_user_features one-scan discipline).
    val ev = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        expr("unix_micros(ts) div 3600000000").as("hour"))
      .localCheckpoint()
    val hourly = ev.groupBy("user_id", "hour").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("active_hours"), max("c").as("max_hourly"))
    val scalar = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min("tus").as("first_tus"),
        max("tus").as("last_tus"))
    scalar.join(hourly, "user_id")
      .select(col("user_id"), col("n_events"), col("active_hours"),
        col("max_hourly"),
        expr("CASE WHEN n_events > 1 THEN (last_tus - first_tus) div (n_events - 1) " +
          "ELSE 0 END").as("mean_gap_us"),
        expr("max_hourly * active_hours * 1000000 div n_events").as("burst_ppm"))
      .orderBy(desc("burst_ppm"), col("user_id"))
      .limit(20)
  }

  /** A/B experiment readout — the end-to-end composition of the keyed
    * deterministic split (the mix_split_assign md5 idiom: at 100 TB an
    * experiment arm is a HASH of the unit key, never a random draw —
    * membership must survive replays, late data, and corpus growth)
    * with the stats family's exact-accumulator discipline: per variant,
    * users and conversions (a purchase above $150), then the pooled
    * two-proportion z² statistic. z² = (c_a·n_b − c_b·n_a)²·N /
    * (n_a·n_b·C·(N−C)) — the classic (p̂₁−p̂₂)² over pooled variance
    * with every factor cross-multiplied into exact BIGINT/DECIMAL(38,0)
    * products, ONE final double division, and a degenerate guard
    * (empty arm, C=0, or C=N ⇒ 0 — an empty arm would otherwise be a
    * 0/0 NaN in z² and an ANSI divide-by-zero in the ppm rate). The
    * z² formula string is shared verbatim with the oracle (the
    * TtestDerived idiom).
    *
    * Scale: conversion is a per-user max — a map-side partial agg on
    * the user key; the readout is a one-row conditional fold over the
    * per-user table. Nothing global but the final single row. */
  /** ONE definition of the experiment's per-user conversion
    * accumulators (conversion gate, md5 arm hash, per-arm 4-way fold),
    * shared by [[evAbTest]] and [[statPowerMde]] — the md5Ranked
    * lesson: the MDE panel's contract is "the same experiment", and a
    * copy would let an edit to the conversion threshold silently
    * decouple the two (review-caught). Mirrored by [[AbAccumSql]] on
    * the oracle side. */
  /** ONE definition of the experiment's two rules, shared by every
    * A/B op (ev_ab_test, stat_power_mde, stat_wilson_ci, stat_sprt) in
    * BOTH engines where the text allows: the conversion gate is
    * engine-identical SQL; the arm hash needs a per-engine spelling
    * (Spark conv() vs DuckDB strpos-arithmetic) of the same md5-nibble
    * parity. An edit to either rule now reaches every consumer. */
  private[graft] val AbConvGate = "event_type = 'purchase' AND value > 150"
  private[graft] val AbHashExpr =
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 4), 16, 10) AS INT) % 2"
  private[graft] val AbArmSql =
    s"CASE WHEN $AbHashExpr = 0 THEN 'A' ELSE 'B' END"
  private[graft] val AbHashSqlDuck = (1 to 4)
    .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
    .mkString("(", " + ", ")") + " % 2"
  private[graft] val AbArmSqlDuck =
    s"CASE WHEN $AbHashSqlDuck = 0 THEN 'A' ELSE 'B' END"

  private def abArmAccumulators(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("user_id")
      .agg(max(when(expr(AbConvGate), 1L).otherwise(0L)).as("conv"))
      .withColumn("arm_b", expr(AbHashExpr))
      .agg(
        sum(expr("CASE WHEN arm_b = 0 THEN 1 ELSE 0 END")).as("n_a"),
        sum(expr("CASE WHEN arm_b = 0 THEN conv ELSE 0 END")).as("c_a"),
        sum(expr("CASE WHEN arm_b = 1 THEN 1 ELSE 0 END")).as("n_b"),
        sum(expr("CASE WHEN arm_b = 1 THEN conv ELSE 0 END")).as("c_b"))

  /** DuckDB twin of [[abArmAccumulators]]: CTEs `u` (per-user conv +
    * arm) and `m` (the 4 accumulators). */
  private val AbAccumSql =
    s"""u AS (
       |  SELECT user_id,
       |    max(CASE WHEN $AbConvGate THEN 1 ELSE 0 END) AS conv,
       |    $AbHashSqlDuck AS arm_b
       |  FROM events GROUP BY user_id),
       |m AS (
       |  SELECT CAST(sum(CASE WHEN arm_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm_b = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
       |    CAST(sum(CASE WHEN arm_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm_b = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
       |  FROM u)""".stripMargin

  def evAbTest(spark: SparkSession, dir: String): DataFrame =
    abArmAccumulators(spark, dir).selectExpr(AbReadout: _*)

  /** Pooled two-proportion z² over the four exact integers (arm sizes
    * n_a/n_b, arm conversions c_a/c_b) — ONE formula string for both
    * engines (the TtestDerived idiom). z² cross-multiplies the pooled-
    * variance denominator away so the only float op is the final
    * division of two exact DECIMAL(38,0) products. (The ppm rates stay
    * engine-specific: integer division is `div` in Spark, `//` in
    * DuckDB — the q34_yoy_growth parity note.) */
  private val AbTestZ2 =
    """round(CASE WHEN n_a = 0 OR n_b = 0
      |        OR c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
      | ELSE CAST((CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)
      |        * (CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)
      |        * (n_a + n_b) AS DOUBLE)
      |    / CAST(CAST(n_a AS DECIMAL(38,0)) * n_b * (c_a + c_b)
      |        * (n_a + n_b - c_a - c_b) AS DOUBLE) END, 4) + 0.0 AS z2""".stripMargin

  /** The experiment readout's derived columns over the four exact
    * accumulators — ONE list shared by [[evAbTest]] and the gated
    * streaming twin's sink rollup (StreamOps.streamAbTestGated), so
    * both execution modes derive rates and z² from the same strings.
    * (Declared after [[AbTestZ2]]: object vals initialize in order.) */
  private[graft] val AbReadout: Seq[String] =
    Seq("n_a", "c_a", "n_b", "c_b",
      "CASE WHEN n_a = 0 THEN 0 ELSE c_a * 1000000 div n_a END AS conv_a_ppm",
      "CASE WHEN n_b = 0 THEN 0 ELSE c_b * 1000000 div n_b END AS conv_b_ppm",
      AbTestZ2)

  /** Wilson 95% confidence interval per experiment arm — the
    * uncertainty readout missing between ev_ab_test's point z² and
    * stat_power_mde's design-time sizing (a dashboard shows the arm
    * rates WITH intervals; the normal-approximation ±z√(pq/n) breaks
    * down exactly where experiments live, small p and small n, while
    * Wilson stays inside [0,1] and centers correctly): both arms from
    * the SAME shared accumulators as ev_ab_test (one definition of
    * arm and conversion), the interval from shared formula-text layers
    * over the exact (n, c) integers — p, z²/n, center, half-width each
    * bit-equal across engines before the final round. z is pinned at
    * 1.96 / z² at 3.8416 as exact decimal literals. */
  def statWilsonCi(spark: SparkSession, dir: String): DataFrame =
    WilsonLayers.foldLeft(
      abArmAccumulators(spark, dir)
        .selectExpr(
          "stack(2, 'A', n_a, c_a, 'B', n_b, c_b) AS (arm, n_users, n_conv)")
        .selectExpr("arm", "CAST(n_users AS BIGINT) AS n_users",
          "CAST(n_conv AS BIGINT) AS n_conv",
          "CAST(CASE WHEN n_users = 0 THEN 0 " +
            "ELSE n_conv * 1000000 div n_users END AS BIGINT) AS rate_ppm")) {
      (df, layer) => df.selectExpr(layer: _*)
    }.orderBy("arm")

  /** Wilson interval as shared select layers (the PacfLayers idiom):
    * p and z²/n, then center and half-width, then the rounded bounds. */
  private val WilsonLayers: Seq[Seq[String]] = Seq(
    Seq("*",
      "CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS p",
      "CAST(3.8416 AS DOUBLE) / CAST(n_users AS DOUBLE) AS zzn"),
    Seq("*",
      "(p + zzn / 2) / (1e0 + zzn) AS center",
      """CAST(1.96 AS DOUBLE) / (1e0 + zzn)
        | * sqrt(p * (1e0 - p) / CAST(n_users AS DOUBLE)
        |        + zzn / (4e0 * CAST(n_users AS DOUBLE))) AS hw""".stripMargin),
    // n_users = 0 guard: the divisions above give NaN on an empty arm
    // (double division in both engines), but pinning the bounds to the
    // defined [0, 1] envelope keeps the output engine-identical and
    // meaningful (an empty arm constrains nothing).
    Seq("arm", "n_users", "n_conv", "rate_ppm",
      "round(CASE WHEN n_users = 0 THEN 0e0 ELSE center - hw END, 4) + 0.0 AS wilson_lo",
      "round(CASE WHEN n_users = 0 THEN 1e0 ELSE center + hw END, 4) + 0.0 AS wilson_hi"))

  /** SPRT design constants, shared by the Spark op and its oracle.
    * H0: conversion = 30%; H1: = 45%; α = β = 0.05. The log terms are
    * computed ONCE here in JVM math and embedded as shortest-round-trip
    * DOUBLE LITERALS in both engines (the kmeans literal-centroid move
    * applied to constants) — ln() never runs inside either engine, so
    * libm rounding differences cannot exist. */
  private val SprtL1 = math.log(0.45 / 0.30)
  private val SprtL2 = math.log(0.55 / 0.70)
  private val SprtHi = math.log(0.95 / 0.05)
  private val SprtLo = math.log(0.05 / 0.95)

  /** Wald's SEQUENTIAL probability ratio test over the experiment
    * stream — the monitoring companion to the fixed-horizon panel
    * (ev_ab_test decides at the end; stat_power_mde sizes upfront;
    * SPRT is how a live experiment STOPS EARLY with α/β still
    * controlled — peeking at a z-test daily inflates false positives,
    * peeking at the SPRT boundary is the test). Sequential accounting
    * is the load-bearing part (the r5 review caught a lookahead
    * version crediting a day-30 conversion to the day-1 statistic —
    * both engines shared it, so only review could): a user ENTERS the
    * denominator on their first active day, and their conversion
    * enters the numerator on the day of their first QUALIFYING
    * purchase — day d's LLR sees exactly what was observable by day
    * d. Arm hash and conversion gate are [[AbArmSql]]/[[AbConvGate]]
    * (the ev_ab_test definitions, now shared constants). LLR =
    * c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) against the Wald bounds —
    * exact BIGINT counts × identical literal doubles, bit-equal
    * across engines; decisions compare the RAW llr, the display
    * rounds. Windows run over the horizon-bounded (arm × day) grid. */
  def statSprt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), col("value"),
        expr("unix_micros(ts) div 86400000000").as("d"))
    // Entry and conversion events STACK into one (arm, day) rollup —
    // no day grid, no joins (a user contributes an n-row at d0 and, if
    // converting, a c-row at dc; days carrying only conversions appear
    // naturally): one per-user shuffle, one (arm, day) shuffle, one
    // per-arm window.
    val u = ev.groupBy("user_id")
      .agg(min("d").as("d0"),
        min(when(expr(AbConvGate), col("d"))).as("dc"))
      .withColumn("arm", expr(AbArmSql))
    val daily = u
      .select(col("arm"), explode(expr(
        "filter(array(struct(d0 AS day, 1L AS n, 0L AS c), " +
          "struct(dc AS day, 0L AS n, 1L AS c)), x -> x.day IS NOT NULL)")).as("e"))
      .groupBy(col("arm"), col("e.day").as("day"))
      .agg(sum("e.n").as("n"), sum("e.c").as("c"))
    val w = Window.partitionBy("arm").orderBy("day")
    daily
      .withColumn("n_users", sum("n").over(w))
      .withColumn("n_conv", sum("c").over(w))
      .selectExpr("arm", "day", "n_users", "n_conv",
        s"n_conv * CAST($SprtL1 AS DOUBLE) + (n_users - n_conv) * CAST($SprtL2 AS DOUBLE) AS llr_raw")
      .selectExpr("arm", "day", "n_users", "n_conv",
        "round(llr_raw, 4) + 0.0 AS llr",
        s"""CASE WHEN llr_raw >= CAST($SprtHi AS DOUBLE) THEN 'accept_h1'
           |     WHEN llr_raw <= CAST($SprtLo AS DOUBLE) THEN 'accept_h0'
           |     ELSE 'continue' END AS decision""".stripMargin)
      .orderBy("arm", "day")
  }

  /** Hourly session concurrency — the capacity-planning curve ops
    * teams read (how many sessions are live in each hour): sessions
    * from the ev_sessionize 30-min-gap rule, each exploded to the
    * hours it touches (bounded fan-out — a session spans few hours by
    * construction, since any 30-min silence ends it), then ONE
    * partial-aggregated count per hour. The sweep-line alternative
    * (global ±1 running sum) needs a single globally-ordered
    * partition; the hour-bucket explode is the partitionable form. */
  def evConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("is_new",
        when(lag("tus", 1).over(w).isNull
          || col("tus") - lag("tus", 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum("is_new").over(cum))
      .groupBy("user_id", "sid")
      .agg(min("tus").as("s"), max("tus").as("e"))
      .select(explode(expr(
        "sequence(s div 3600000000, e div 3600000000)")).as("epoch_hour"))
      .groupBy("epoch_hour")
      .agg(count(lit(1)).as("n_concurrent"))
      .orderBy("epoch_hour")
  }

  /** Sequence-ordering audit — "do event ids respect time within each
    * user's stream": the ingestion-hygiene check that catches clock
    * skew, replayed shards, and out-of-order assignment before any
    * window operator silently consumes them (every sessionize/funnel/
    * lag in this engine orders by (tus, event_id) — this panel
    * measures how often those two orders DISAGREE). Per-user lag
    * window (the scale-safe stream-local formulation — a global id
    * ordering would be one corpus-sized partition), exact counts, the
    * worst backwards time-step in microseconds, and the inversion
    * rate in ppm. */
  def qcSequenceCheck(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("ptus", lag("tus", 1).over(w))
      .filter(col("ptus").isNotNull)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("ptus") > col("tus"), 1L).otherwise(0L)).as("n_inversions"),
        max(when(col("ptus") > col("tus"), col("ptus") - col("tus"))
          .otherwise(0L)).as("max_backstep_us"))
      .withColumn("inversion_ppm",
        expr("n_inversions * 1000000 div n_pairs"))
  }

  /** Sample-ratio-mismatch check — THE standard A/B health gate run
    * before reading any result: is the observed arm split consistent
    * with the designed 50/50? z² = (n_a − n_b)²/(n_a + n_b), an exact
    * rational quantized to micro-units, flagged against the 95%
    * χ²₁ critical value 3.84 with an integer cross-multiplied compare
    * (no float threshold). A failed SRM invalidates the experiment
    * regardless of its p-value — which is why this panel exists
    * separately from ev_ab_test's effect readout. Same shared
    * [[abArmAccumulators]] as the other experiment panels. */
  def statSrmCheck(spark: SparkSession, dir: String): DataFrame =
    abArmAccumulators(spark, dir)
      .selectExpr("n_a", "n_b",
        """CASE WHEN n_a + n_b = 0 THEN CAST(0 AS BIGINT)
          | ELSE ((n_a - n_b) * (n_a - n_b) * 1000000) div (n_a + n_b)
          | END AS srm_z2_micro""".stripMargin)
      .selectExpr("n_a", "n_b", "srm_z2_micro",
        // z2 > 3.84 ⟺ z2_micro > 3840000, exactly
        "CASE WHEN srm_z2_micro > 3840000 THEN 1 ELSE 0 END AS srm_flag")

  /** Audience OVERLAP matrix — Jaccard similarity between event
    * types' user sets ("how much do purchasers overlap with
    * sharers"): the segmentation panel read before building funnels
    * between two behaviors. One distinct (type, user) pass feeds set
    * sizes AND the intersection self-join; the join keys on user_id,
    * where each user carries ≤|types| rows, so per-key fan-out is
    * bounded by |types|² whatever the corpus size — never a hot key.
    * Exact-ppm Jaccard from three integers. Pairs with an empty
    * intersection are absent (both engines inner-join the pair
    * counts). */
  def evUserOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tu = Tables(spark, dir).events
      .select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
    val inter = tu.select(col("event_type").as("t1"), col("user_id"))
      .join(tu.select(col("event_type").as("t2"), col("user_id")), "user_id")
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("t1"), col("n").as("n1"))), "t1")
      .join(broadcast(sizes.select(col("event_type").as("t2"), col("n").as("n2"))), "t2")
      .select(col("t1"), col("t2"), col("inter"), col("n1"), col("n2"),
        expr("inter * 1000000 div (n1 + n2 - inter)").as("jaccard_ppm"))
      .orderBy("t1", "t2")
  }

  /** CUSUM change-point detection on the daily event-count series —
    * "did the level shift, and when": the cumulative sum of
    * deviations from the global mean peaks at the most likely change
    * point. Deviations are scaled ×n (cusum_k = Σ_{i≤k} (n·xᵢ − S))
    * so everything stays in exact BIGINTs — no mean division until
    * never. One bounded daily rollup, one domain-sized cumulative
    * window, one deterministic argmax (max |cusum|, earliest day
    * tiebreak). */
  def statCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .crossJoin(broadcast(daily.agg(sum("x").as("s"), count(lit(1)).as("nd"))))
      .withColumn("cusum", sum(col("nd") * col("x") - col("s")).over(w))
      .select(col("d"), col("nd"), abs(col("cusum")).as("ac"), col("cusum"))
      .orderBy(desc("ac"), col("d"))
      .limit(1)
      .select(col("nd").as("n_days"), col("d").as("change_day"),
        col("cusum").as("cusum_units"))
  }

  /** Seasonal DECOMPOSITION (STL-lite) of the hourly event count
    * series: trend = centered 25 h moving average, seasonal =
    * hour-of-day mean of the DETRENDED series, residual = what's left
    * — the classical additive split behind "is Monday 9am actually
    * anomalous or just Monday 9am" (ev_seasonality reads the raw
    * hour-of-day profile; this one removes the trend first so a
    * growing corpus doesn't masquerade as seasonality). All
    * exact-integer milli-units: trend and seasonal are sum·1000 div
    * count with explicit frame counts, so both engines truncate
    * identically. The hourly series is one bounded row per hour
    * (~|corpus days|·24), so the single-partition trend window is
    * domain-sized, never corpus-sized (the stat_autocorr posture).
    * Output: 24 hour-of-day rows with the seasonal factor and the
    * mean absolute residual — a seasonal factor dwarfing its residual
    * is a real pattern, not noise. */
  def statSeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .withColumn("trend_milli",
        expr("sum(n * 1000) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) div " +
          "count(n) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)"))
      .withColumn("det_milli", col("n") * 1000 - col("trend_milli"))
      .withColumn("hod", expr("h % 24"))
      .localCheckpoint()
    val seasonal = hourly.groupBy("hod")
      .agg(expr("sum(det_milli) div count(1)").as("seasonal_milli"),
        count(lit(1)).as("n_hours"))
    hourly.join(broadcast(seasonal), "hod")
      .groupBy("hod")
      .agg(max("seasonal_milli").as("seasonal_milli"),
        max("n_hours").as("n_hours"),
        expr("sum(abs(det_milli - seasonal_milli)) div count(1)")
          .as("mean_abs_resid_milli"))
      .orderBy("hod")
  }

  /** Seasonal-naive forecast BACKTEST — the baseline every metrics
    * forecaster must beat, evaluated as a query: forecast(type, hour)
    * = observed count 24 h earlier, scored by MAE over the corpus's
    * final 72 hours. Hour pairing is an equi-join on (type, h−24)
    * rather than a lag(24) window so GAPPY series stay correct (a
    * missing hour silently misaligns every lag after it; the join
    * skips hours missing either side — documented backtest scope).
    * Exact integers end-to-end: counts, absolute errors, and the
    * MAE in milli-units via integer division. One (type, hour)
    * partial-agg shuffle; the self-join collapses onto the same
    * checkpointed ≤|types|·|hours| table. */
  def evSeasonalNaive(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir).events
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val prev = hourly.select(col("event_type"), (col("h") + 24).as("h"),
      col("cnt").as("cnt_prev"))
    hourly.join(prev, Seq("event_type", "h"))
      .crossJoin(broadcast(hourly.agg(max("h").as("mh"))))
      .filter(col("h") > col("mh") - 72)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("cnt") - col("cnt_prev"))).as("sum_abs_err"))
      .withColumn("mae_milli", expr("sum_abs_err * 1000 div n_hours"))
      .orderBy("event_type")
  }

  /** Holt linear-trend forecast (double exponential smoothing,
    * α = β = 0.5) over each event type's DAILY count series — the
    * next-better baseline above [[evSeasonalNaive]]: level + trend
    * state absorbs drift a seasonal-naive repeat can't, and the fitted
    * (level, trend) pair IS the h-step forecast line. Output per
    * type: series length, final level/trend, and the 1- and 7-day-
    * ahead forecasts.
    *
    * The recurrence l' = ½y + ½(l+b); b' = ½(l'−l) + ½b is SEQUENTIAL
    * by definition, so it folds LEFT over the gap-filled time-ordered
    * series (missing days count 0 — a dense axis join, so a gap can't
    * silently misalign the fold; the evSeasonalNaive lesson). State
    * rides as a 2-element DOUBLE array because DuckDB's list_reduce
    * requires acc type == element type (the ev_survival init-prepend
    * trick, lifted from scalars to pairs); init is the textbook
    * simple start l₁ = y₁, b₁ = y₂ − y₁ and the update runs over
    * t = 2..T (so y₂ enters both the init and the first update — the
    * standard simple-init Holt convention). Every fold step is the
    * same IEEE double
    * tree in both engines (halving is exact, adds correctly rounded —
    * the agg_moments contract), so the fit is bit-stable.
    *
    * Scale: one (type, day) partial-agg shuffle; the fold runs once
    * per type over a days-long bounded array (series length is
    * calendar time, not corpus size). */
  /** The gap-filled daily count series per event type as an ordered
    * [y, 0] pair list — the CTE chain (daily → dense axis → `ser`)
    * shared by the stat_holt_forecast and stat_forecast_eval
    * oracles. */
  private val holtSeriesCtesSql =
    """daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |axis AS (
      |  SELECT event_type, unnest(generate_series(d0, d1)) AS d
      |  FROM types CROSS JOIN span),
      |full_s AS (
      |  SELECT a.event_type, a.d,
      |         CAST(coalesce(cnt, 0) AS DOUBLE) AS y
      |  FROM axis a LEFT JOIN daily x
      |    ON a.event_type = x.event_type AND a.d = x.d),
      |ser AS (
      |  SELECT event_type, list([y, CAST(0 AS DOUBLE)] ORDER BY d) AS ys,
      |         count(*) AS n_days
      |  FROM full_s GROUP BY 1 HAVING count(*) >= 2)""".stripMargin

  /** The Holt α=β=½ fold lambda, Spark side (0-based arrays) — ONE
    * definition shared by [[statHoltForecast]] and
    * [[statForecastEval]] so the recurrence cannot drift between the
    * fit and its backtest. */
  private val HoltFoldSpark =
    """(acc, x) -> array(
      |    0.5D * x[0] + 0.5D * (acc[0] + acc[1]),
      |    0.5D * ((0.5D * x[0] + 0.5D * (acc[0] + acc[1])) - acc[0])
      |      + 0.5D * acc[1])""".stripMargin

  /** Same lambda, DuckDB side (1-based lists). */
  private val HoltFoldSql =
    """(acc, x) -> [
      |        0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
      |        0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
      |          + 0.5 * acc[2]]""".stripMargin

  /** The gap-filled daily count series per type as an ordered
    * [y, 0]-pair array (event_type, ys, n_days) — shared by
    * [[statHoltForecast]] and [[statForecastEval]]. */
  private def holtSeries(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("d"))
    val daily = ev.groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
    val axis = daily.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("d"))
    axis.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("cnt"), lit(0L)).cast("double").as("y"))
      .groupBy("event_type")
      .agg(expr("sort_array(collect_list(struct(d, y)))").as("sy"),
        count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .withColumn("ys", expr("transform(sy, p -> array(p.y, CAST(0 AS DOUBLE)))"))
  }

  def statHoltForecast(spark: SparkSession, dir: String): DataFrame = {
    holtSeries(spark, dir)
      .withColumn("st", expr(
        s"""aggregate(slice(ys, 2, CAST(size(ys) - 1 AS INT)),
           |  array(ys[0][0], ys[1][0] - ys[0][0]),
           |  $HoltFoldSpark)""".stripMargin))
      .select(col("event_type"), col("n_days"),
        (round(expr("st[0]"), 4) + lit(0.0)).as("level"),
        (round(expr("st[1]"), 4) + lit(0.0)).as("trend"),
        (round(expr("st[0] + st[1]"), 4) + lit(0.0)).as("fc_1"),
        (round(expr("st[0] + 7 * st[1]"), 4) + lit(0.0)).as("fc_7"))
      .orderBy("event_type")
  }

  /** Forecaster BACKTEST head-to-head — Holt ([[statHoltForecast]]'s
    * exact recurrence via the shared [[HoltFoldSpark]] lambda) vs the
    * naive-1 "tomorrow == today" baseline, scored by one-step-ahead
    * MAE over each type's final ≤10 days: the model-selection readout
    * a metrics pipeline prints before trusting either forecaster
    * (ev_seasonal_naive's measure-don't-guess law pointed at
    * stat_holt_forecast itself). Each cut c refits Holt on days 1..c
    * through the SAME fold text — the fit and its backtest cannot
    * drift — and forecasts day c+1; each error quantizes to exact
    * milli-units before the integer MAE, and holt_wins compares the
    * exact error sums. The prefix refits cost O(window·T) lambda
    * steps per type — calendar-bounded, corpus-independent (the
    * ev_survival prefix-product shape). */
  def statForecastEval(spark: SparkSession, dir: String): DataFrame =
    holtSeries(spark, dir)
      .filter(col("n_days") >= 4)
      .withColumn("he", expr(
        s"""transform(sequence(CAST(greatest(2, n_days - 10) AS INT),
           |                   CAST(n_days - 1 AS INT)), c ->
           |  CAST(round(abs(
           |    aggregate(slice(ys, 2, c - 1),
           |      array(ys[0][0], ys[1][0] - ys[0][0]), $HoltFoldSpark)[0]
           |    + aggregate(slice(ys, 2, c - 1),
           |      array(ys[0][0], ys[1][0] - ys[0][0]), $HoltFoldSpark)[1]
           |    - ys[c][0]) * 1000) AS BIGINT))""".stripMargin))
      .withColumn("ne", expr(
        """transform(sequence(CAST(greatest(2, n_days - 10) AS INT),
          |                   CAST(n_days - 1 AS INT)), c ->
          |  CAST(round(abs(ys[c][0] - ys[c - 1][0]) * 1000) AS BIGINT))"""
          .stripMargin))
      .select(col("event_type"),
        size(col("he")).cast("long").as("n_eval"),
        expr("aggregate(ne, CAST(0 AS BIGINT), (a, x) -> a + x) div size(ne)")
          .as("mae_naive_milli"),
        expr("aggregate(he, CAST(0 AS BIGINT), (a, x) -> a + x) div size(he)")
          .as("mae_holt_milli"),
        expr("""aggregate(he, CAST(0 AS BIGINT), (a, x) -> a + x)
          | < aggregate(ne, CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin)
          .as("holt_wins"))
      .orderBy("event_type")

  /** Shared MDE formula string (both engines): two-proportion minimum
    * detectable effect at α=0.05 two-sided, 80% power —
    * (z_{0.975} + z_{0.80}) = 1.959964 + 0.841621 = 2.801585. The one
    * double chain (sqrt is correctly rounded IEEE in both engines, the
    * literal and association pinned by this single string) quantizes
    * straight to ppm. */
  private val MdePpm =
    """CASE WHEN n_min = 0 THEN CAST(0 AS BIGINT) ELSE CAST(round(2.801585
      | * sqrt(2.0 * (CAST(pooled_ppm AS DOUBLE) / 1000000.0)
      |        * (1.0 - CAST(pooled_ppm AS DOUBLE) / 1000000.0)
      |        / n_min)
      | * 1000000) AS BIGINT) END AS mde_ppm""".stripMargin

  /** Experiment POWER readout — the minimum detectable effect the
    * ev_ab_test experiment can resolve at 80% power, next to the
    * effect it actually observed: the "was this A/B test big enough"
    * panel an experimentation platform prints before anyone reads the
    * z-score. Same per-user conversion accumulators as ev_ab_test
    * (one user_id shuffle, 4-long fold); pooled rate and observed
    * diff in exact ppm; the MDE is the one pinned double chain
    * ([[MdePpm]]), and `detectable` is an exact integer compare of
    * observed vs MDE. */
  def statPowerMde(spark: SparkSession, dir: String): DataFrame =
    abArmAccumulators(spark, dir)
      .selectExpr("n_a", "n_b",
        "(c_a + c_b) * 1000000 div (n_a + n_b) AS pooled_ppm",
        "least(n_a, n_b) AS n_min",
        """abs(CASE WHEN n_a = 0 THEN 0 ELSE c_a * 1000000 div n_a END
          | - CASE WHEN n_b = 0 THEN 0 ELSE c_b * 1000000 div n_b END)
          | AS observed_diff_ppm""".stripMargin)
      .selectExpr("n_a", "n_b", "n_min", "pooled_ppm", "observed_diff_ppm",
        MdePpm)
      .selectExpr("n_a", "n_b", "pooled_ppm", "observed_diff_ppm", "mde_ppm",
        // a single-arm experiment resolves nothing, whatever it observed
        """CASE WHEN n_min = 0 THEN 0
          | WHEN observed_diff_ppm >= mde_ppm THEN 1
          | ELSE 0 END AS detectable""".stripMargin)

  /** OHLC bar aggregation — the time-series downsampler every metrics
    * store runs before charting/alerting: per (event_type, 4 h bar),
    * the first (open), max (high), min (low), and last (close) value
    * plus count and volume. Values in exact 1e-6 BIGINT units (the vq
    * convention) so every output is order-independent.
    *
    * open/close are argmin/argmax by the total order (tus, event_id):
    * ONE window pass assigns row_number ascending and the partition
    * count (same partitioning, so the unordered count reuses the
    * ordered window's exchange+sort), then the groupBy collapses onto
    * that distribution — one shuffle total on the uniform
    * (event_type, bar) key, which is exactly the key a 1000-executor
    * ingest would already be partitioned by. first()/last() would be
    * nondeterministic under parallel scan order; the row_number gate
    * is the deterministic equivalent. */
  /** Maximum drawdown of the daily purchase-revenue level series — the
    * risk readout next to the OHLC/forecast family (how far below the
    * best day ever did revenue sink, and when — the decline metric a
    * revenue-ops dashboard alarms on; a CUMULATIVE total never falls,
    * so drawdown applies to the level series, like a price): running
    * max over the horizon-bounded daily series, drawdown = peak −
    * today per day, TakeOrderedAndProject picks the deepest day (ties
    * → earliest). All exact BIGINT cents — the peak/drawdown
    * comparisons cannot drift between engines.
    *
    * Scale: one partial-aggregated daily rollup; the window runs over
    * the days-bounded series (the statAutocorr posture). */
  def evDrawdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("rev_cents"))
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("peak_cents", max(col("rev_cents")).over(w))
      .withColumn("drawdown_cents", col("peak_cents") - col("rev_cents"))
      .orderBy(desc("drawdown_cents"), col("d"))
      .limit(1)
      .select(col("d").as("worst_day"), col("rev_cents"), col("peak_cents"),
        col("drawdown_cents"))
  }

  def evOhlcBars(spark: SparkSession, dir: String): DataFrame = {
    val barUs = 14400000000L // 4 h in microseconds
    val w = Window.partitionBy("event_type", "bar").orderBy("tus", "event_id")
    val wAll = Window.partitionBy("event_type", "bar")
    Tables(spark, dir).events
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vq"))
      .withColumn("bar", expr(s"tus div $barUs"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy("event_type", "bar")
      .agg(
        max(when(col("rn") === 1, col("vq"))).as("open_u"),
        max("vq").as("high_u"),
        min("vq").as("low_u"),
        max(when(col("rn") === col("cnt"), col("vq"))).as("close_u"),
        count(lit(1)).as("n"),
        sum("vq").as("vol_u"))
      .select(col("event_type"),
        expr(s"timestamp_micros(bar * $barUs)").as("bar_start"),
        col("open_u"), col("high_u"), col("low_u"), col("close_u"),
        col("n"), col("vol_u"))
      .orderBy("event_type", "bar_start")
  }

  /** Exponentially weighted moving average over each user's
    * event-value sequence — the time-series smoother behind alerting
    * baselines and engagement trending. α = 1/2 with an 8-tap bound,
    * so every weight is a power of two: with values quantized to
    * exact micro-units, numerator (Σ v_j·2^(7−j)) and denominator
    * (Σ 2^(7−j) over the taps that exist) are exact BIGINTs and the
    * smoothed value is ONE deterministic double division —
    * bit-identical cross-engine, no recursive state (the closed-form
    * window beats a sequential fold at any scale: one user_id
    * shuffle, eight lag() taps reading the SAME window buffer). */
  def evEwma(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val base = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vq"))
    val withLags = (1 to 7).foldLeft(base.withColumn("l0", col("vq"))) {
      (df, j) => df.withColumn(s"l$j", lag(col("vq"), j).over(w))
    }
    val num = (0 to 7)
      .map(j => s"coalesce(l$j, 0) * ${1L << (7 - j)}").mkString(" + ")
    val den = (0 to 7)
      .map(j => s"CASE WHEN l$j IS NULL THEN 0 ELSE ${1L << (7 - j)} END")
      .mkString(" + ")
    withLags
      .select(col("user_id"), col("event_id"),
        (round(expr(s"CAST($num AS DOUBLE) / ($den)") / lit(1000000.0), 4)
          + lit(0.0)).as("ewma"))
      .orderBy("user_id", "event_id")
  }

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent NON-purchase event within 30 min (the ev_sessionize
    * boundary — credit never crosses a session gap); purchases with no
    * in-window touch credit 'direct'. Output per channel: conversions
    * and exact-cents attributed revenue — the conversion-accounting
    * query behind every funnel/marketing dashboard.
    *
    * The two ignore-nulls `last` windows (type and time) evaluate the
    * SAME when-condition, so they always read the same touch row; the
    * frame ends at -1 so a purchase never attributes to itself, and
    * (tus, event_id) is a total order per user so ties are
    * deterministic. Revenue sums are BIGINT cents (the centsSum
    * contract) — no FP anywhere.
    *
    * Scale: ONE shuffle on user_id for the window (bounded per-user
    * sequences — the sessionize argument), then a partial-aggregated
    * groupBy on the 5-value channel domain. */
  def evAttribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .withColumn("touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .withColumn("touch_tus",
        last(when(col("event_type") =!= "purchase", col("tus")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("source_type",
        when(col("touch_tus").isNotNull &&
          col("tus") - col("touch_tus") <= 1800000000L, col("touch_type"))
          .otherwise(lit("direct")))
      .groupBy("source_type")
      .agg(count(lit(1)).as("conversions"), sum("vc").as("revenue_cents"))
      .orderBy("source_type")
  }

  /** Linear MULTI-touch attribution — the equal-credit counterpart
    * of [[evAttribution]]'s last-touch rule: every non-purchase touch
    * in the 30-min pre-purchase window (the same session boundary)
    * shares the conversion equally — the model marketing teams run
    * next to last-touch to see how much credit the last click steals.
    *
    * Exactness without FP: credit rides in ppm units and revenue in
    * cents, both split by integer division with the REMAINDER
    * assigned to the LATEST touch (deterministic via the
    * (tus, event_id) order), so per-purchase credit sums to exactly
    * 1e6 ppm and credited revenue to exactly the purchase's cents —
    * StatSpec asserts conservation against the direct purchase
    * totals. Touchless purchases credit 'direct' in full.
    *
    * Scale: the pre-purchase window join is the [[evRangeJoin]]
    * banded-bin shape (touch side replicated 2×, equi-join on
    * (user, bin) — never a cross of the two streams); the rank/count
    * windows run per purchase partition (bounded by touches per 30
    * min); the channel rollup is partial-aggregated on the 5-value
    * domain. */
  def evAttributionMulti(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val G = 1800000000L
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("tus").as("ptus"), col("vc"))
      .withColumn("bin", expr(s"ptus div $G"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("tid"),
        col("event_type").as("channel"), col("tus").as("ttus"))
      .withColumn("bin", explode(expr(s"array(ttus div $G, ttus div $G + 1)")))
    val joined = purch.join(touches, Seq("user_id", "bin"))
      .filter(col("ttus") > col("ptus") - G && col("ttus") < col("ptus"))
    val wp = Window.partitionBy("user_id", "pid")
    val credited = joined
      .withColumn("k", count(lit(1)).over(wp))
      .withColumn("i",
        row_number().over(wp.orderBy(col("ttus"), col("tid"))).cast("long"))
      .select(col("channel"),
        (expr("1000000 div k") +
          when(col("i") === col("k"), expr("1000000 % k")).otherwise(lit(0L)))
          .as("credit_ppm"),
        (expr("vc div k") +
          when(col("i") === col("k"), expr("vc % k")).otherwise(lit(0L)))
          .as("rc"))
    val direct = purch
      .join(joined.select(col("user_id"), col("pid")).distinct(),
        Seq("user_id", "pid"), "left_anti")
      .select(lit("direct").as("channel"), lit(1000000L).as("credit_ppm"),
        col("vc").as("rc"))
    credited.unionByName(direct)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        sum("credit_ppm").as("credit_ppm"),
        sum("rc").as("revenue_cents"))
      .orderBy("channel")
  }

  /** Hourly anomaly detection: per event_type, the hours whose count
    * is ≥2 sample standard deviations from that type's hourly mean —
    * the volume-spike / outage detector every telemetry pipeline runs.
    *
    * Cross-engine determinism WITHOUT a rounding contract: the z²≥4
    * test is evaluated wholly in exact integers — with n hours, S=Σcnt,
    * SS=Σcnt², a=n·cnt−S, D=n·SS−S²: z² = a²(n−1)/(n·D), so the flag
    * is a²·(n−1) ≥ 4·n·D (exact integer comparison, no FP anywhere),
    * and the reported z² is one division of two exact integers — the
    * SAME two integers in both engines, hence the same IEEE double.
    * DECIMAL(38,0) accumulators give 100 TB headroom (DuckDB widens to
    * INT128 on its own). Two partial-aggregated shuffles: hourly
    * counts, then per-type stats broadcast back onto the hourly rows. */
  def evAnomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyFromHourly(Tables(spark, dir).events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt")))

  /** The z² flag derivation over a caller-supplied (event_type, h,
    * cnt) hourly table — ONE definition shared by [[evAnomaly]] and
    * the gated streaming twin's readback (StreamOps
    * .streamAnomalyGated folds the streamed per-type hour tables and
    * reruns exactly this tail), so the exact-integer test and the raw
    * z_sq arithmetic cannot drift between the two. */
  private[graft] def anomalyFromHourly(hourly: DataFrame): DataFrame = {
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("cnt").cast("decimal(38,0)")).as("s"),
      sum((col("cnt") * col("cnt")).cast("decimal(38,0)")).as("ss"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("a", col("n").cast("decimal(38,0)") * col("cnt") - col("s"))
      .withColumn("d", col("n").cast("decimal(38,0)") * col("ss") - col("s") * col("s"))
      .filter(col("n") >= 2 && col("d") > 0 &&
        col("a") * col("a") * (col("n") - lit(1)).cast("decimal(38,0)") >=
          col("d") * col("n").cast("decimal(38,0)") * lit(4))
      .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"),
        when(col("a") > 0, "high").otherwise("low").as("dirn"),
        ((col("a") * col("a") * (col("n") - lit(1)).cast("decimal(38,0)")).cast("double") /
          (col("d") * col("n").cast("decimal(38,0)")).cast("double")).as("z_sq"))
      .orderBy("event_type", "epoch_hour")
  }

  /** Robust hourly anomaly flags — the median/MAD twin of
    * [[evAnomaly]]: the z² test's mean and variance are themselves
    * moved by the anomalies it hunts (one 10× spike inflates σ enough
    * to mask a 3× spike — masking), while median and MAD have a 50%
    * breakdown point, so a burst can't hide its siblings. Rule:
    * |cnt − median| > 3·MAD, every term an exact integer (lower
    * median of integer counts by rank selection — never the
    * interpolated midpoint, which would demand float parity), so the
    * flag set is bit-stable across engines and partitionings.
    *
    * Scale: both rank selections run on the horizon-bounded hourly
    * table (types × hours — the evAnomaly posture); the heavy work is
    * the partial-aggregated hourly rollup underneath. */
  def evAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Checkpointed: types × hours rows feeding TWO consumers each
    // (median selection + the deviation join; then the deviation table
    // feeds the MAD selection + the final filter) — without the cuts
    // each branch re-derives the rollup from a fresh events scan (the
    // qcDrift lesson; 1 corpus pass is the floor).
    val hourly = Tables(spark, dir).events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // Lower median by rank selection: value at row (n+1) div 2 of the
    // sorted column (tie order can't move the value AT a rank).
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame =
      df.withColumn("rn",
          row_number().over(
            Window.partitionBy("event_type").orderBy(col(valueCol), col("h"))))
        .withColumn("nn",
          count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rn") === expr("(nn + 1) div 2"))
        .select(col("event_type"), col(valueCol).as(out))
    val med = lowerMedian(hourly, "cnt", "med")
    val withMed = hourly.join(broadcast(med), "event_type")
      .withColumn("ad", abs(col("cnt") - col("med")))
      .localCheckpoint()
    val mad = lowerMedian(withMed, "ad", "mad")
    withMed.join(broadcast(mad), "event_type")
      .filter(col("ad") > col("mad") * 3)
      .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"),
        col("med"), col("mad"))
      .orderBy("event_type", "epoch_hour")
  }

  /** Single most-significant changepoint of the daily event-count
    * series by BINARY SEGMENTATION — the localization companion to
    * stat_cusum (CUSUM says "a drift exists"; this names the day it
    * happened): the split k maximizing the between-segment
    * sum-of-squares gain L²/k + (S−L)²/(n−k) − S²/n, i.e. the one
    * 2-segment model that explains the most variance. The gain's
    * numerator over the common denominator k(n−k)n is assembled in
    * exact DECIMAL(38,0) products (headroom: Σcounts ≤ ~1e13 at n ≤
    * 1e4 days stays under 38 digits), so both engines divide the SAME
    * two integers — argmax ties break on the earlier day in both.
    *
    * Scale: the candidate-split scan is the horizon-bounded daily
    * series (one cumulative window + a 1-row totals broadcast), then
    * TakeOrderedAndProject picks the winner — no per-event work
    * beyond the daily rollup. */
  def statChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Checkpointed: the horizon-bounded daily series feeds BOTH the
    // totals row and the cumulative scan — one events pass, not two.
    val series = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
      .localCheckpoint()
    val w = Window.orderBy("d")
    val tot = series.agg(count(lit(1)).as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).as("s"))
    series
      .withColumn("k", row_number().over(w))
      .withColumn("l", sum(expr("CAST(x AS DECIMAL(38,0))")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("k") < col("n"))
      .selectExpr("d", "k", "n - k AS nr", "l", "s - l AS r", "n", "s")
      .selectExpr("d", "k", "nr",
        """CAST(l * l * nr * n + r * r * k * n - s * s * k * nr AS DOUBLE)
          | / CAST(CAST(k AS DECIMAL(38,0)) * nr * n AS DOUBLE) AS gain""".stripMargin,
        "l * 1000000 div k AS mean_left_ppm",
        "r * 1000000 div nr AS mean_right_ppm")
      .orderBy(col("gain").desc, col("d").asc)
      .limit(1)
      .selectExpr("d AS split_day", "CAST(k AS BIGINT) AS n_left",
        "CAST(nr AS BIGINT) AS n_right",
        "CAST(mean_left_ppm AS BIGINT) AS mean_left_ppm",
        "CAST(mean_right_ppm AS BIGINT) AS mean_right_ppm",
        "round(gain, 4) + 0.0 AS gain")
  }

  /** Rolling 7-day distinct-user estimate by MERGING DAILY HLL
    * SKETCHES — the sketch-rollup pattern that makes windowed distinct
    * counts tractable at scale: exact rolling distinct rescans every
    * window (O(window × data) — ev_dau_wau's posture, fine until the
    * window or cardinality grows), while mergeable daily registers
    * reduce the rolling step to a register-wise max over 64-value
    * sketches — O(days × 64) after one (day, user)-distinct data pass,
    * and the same daily sketch table serves 7-day, 28-day, and
    * all-time readouts without touching data again. Registers are the
    * oracle-gated agg_hll_distinct layout (32-bit md5, p=6, rank by
    * integer bin-length; max IS the merge), the estimator is the
    * shared [[Relational.HllEstExpr]], and the day×bucket grid is
    * DENSE so a bucket silent today still carries yesterday's
    * contribution into today's window. */
  def evRollingHll(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val du = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .distinct()
    // Checkpointed: days × ≤64 rows, and the ONLY consumer of the
    // corpus-sized distinct — the day grid below re-derives its day set
    // from these registers (a day is present iff it had a user), so
    // events is scanned exactly once.
    val regs = du
      .withColumn("h",
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .select(col("d"), expr("h div 67108864").as("bucket"),
        expr("h % 67108864").as("w"))
      .withColumn("rho", expr("CASE WHEN w = 0 THEN 27 ELSE 27 - length(bin(w)) END"))
      .groupBy("d", "bucket").agg(max("rho").as("r"))
      .localCheckpoint()
    val grid = regs.select("d").distinct()
      .select(col("d"), explode(expr("sequence(0L, 63L)")).as("bucket"))
    grid.join(regs, Seq("d", "bucket"), "left")
      .withColumn("rr", max("r").over(
        Window.partitionBy("bucket").orderBy("d").rangeBetween(-6, 0)))
      .groupBy("d")
      .agg(count(col("rr")).as("present"),
        sum(expr("pow(CAST(2 AS DOUBLE), -rr)")).as("sp"))
      .select(col("d").as("day"),
        round(expr(Relational.HllEstExpr), 3).as("est_users_7d"),
        col("present"))
      .orderBy("day")
  }

  /** Per-user behavioral feature assembly — the feature-engineering
    * step a churn/LTV model trains on, one row per user: activity
    * volume (events, active days, span), diversity (distinct types +
    * modal type with exact tiebreak), monetary mass (exact cents), and
    * idle recency vs the corpus's last day. This is the operator that
    * turns the event log into a model matrix; every downstream query
    * (segmentation, scoring, joins against labels) rides on it.
    *
    * Two user-keyed partial-aggregated shuffles — the scalar aggregate
    * and the (user, type) modal count (whose majority window runs on
    * ≤#types rows per user) — joined user-to-user (co-partitioned:
    * both sides arrive hash-distributed on user_id, no third
    * exchange), plus a 1-row global-max-day broadcast. All features
    * integer-exact (day bins, counts, BIGINT cents, modal tiebreak
    * (count DESC, type ASC)) — bit-stable across engines and
    * partition orders. */
  def evUserFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div $W24h").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_cents"))
    val scalar = ev.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      countDistinct("day").as("n_active_days"),
      countDistinct("event_type").as("n_types"),
      sum("v_cents").as("value_cents"),
      min("day").as("first_day"),
      max("day").as("last_day"))
    val modal = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("cnt"), col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"),
        col("cnt").as("top_type_n"))
    val gmax = ev.agg(max("day").as("gmax_day"))
    scalar.join(modal, "user_id")
      .crossJoin(broadcast(gmax))
      .select(col("user_id"), col("n_events"), col("n_active_days"),
        col("n_types"), col("top_type"), col("top_type_n"),
        col("value_cents"),
        (col("last_day") - col("first_day")).as("span_days"),
        (col("gmax_day") - col("last_day")).as("idle_days"))
      .orderBy("user_id")
  }

  /** Cohort LTV triangle — the revenue companion to [[evRetention]]'s
    * activity triangle: users grouped by signup cohort (first active
    * day, ANY event type), purchase revenue rolled up per (cohort,
    * age-in-days) cell with exact cents, purchase counts, and distinct
    * buyers. Reading a column gives the day-N monetization curve;
    * comparing rows gives cohort-quality drift — the report a
    * subscription/commerce pipeline recomputes daily.
    *
    * Scale: two user-keyed partial-aggregated passes (first-day,
    * purchases) joined co-partitioned on user_id, then a rollup on the
    * bounded (cohort, age) triangle domain; the only distinct is
    * per-cell buyers, partial-aggregated on (cohort, age, user). All
    * integer (day bins, cents). */
  def evCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div $W24h").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_cents"))
      .localCheckpoint() // first-day AND purchase sides — one scan
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("day"), col("v_cents"))
    buys.join(cohort, "user_id")
      .withColumn("age_days", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "age_days")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct("user_id").as("n_buyers"),
        (sum(col("v_cents").cast("decimal(38,0)")).cast("double") / 100)
          .as("revenue"))
      .orderBy("cohort_day", "age_days")
  }

  /** Half-life for [[evDecayedScore]] (and its streaming twin —
    * shared so the decay curve can never diverge): 7 days in µs. */
  private[graft] val HalfLifeUs = 7L * W24h

  /** One hour in microseconds. */
  private val HourUs = 3600000000L

  /** Longest consecutive-day activity streak per user — the classic
    * GAPS-AND-ISLANDS shape (retention/engagement reporting's streak
    * badge): distinct active days collapse per user, island id =
    * day − row_number (constant within a consecutive run, integer
    * arithmetic only), longest streak = max island size. Top-20 users
    * by streak.
    *
    * Scale: the distinct is partial-aggregated on (user, day); both
    * windows share ONE user-partitioned exchange (same partition key,
    * Catalyst reuses the sort); islands never materialize beyond a
    * grouped count. */
  def evStreak(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir).events
      .select(col("user_id"), expr(s"unix_micros(ts) div $W24h").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"), sum("len").as("n_active_days"))
      .orderBy(desc("longest_streak"), col("user_id"))
      .limit(20)
  }

  /** INTERVAL × INTERVAL overlap join — the remaining temporal-join
    * shape next to ev_asof_join (point→latest-point) and ev_range_join
    * (point→window): per-user session intervals (the ev_sessionize
    * 30-min-gap derivation) joined against global INCIDENT hours
    * (hours whose event count exceeds 1.25× the hourly average — the
    * ev_anomaly flavor), rolled up per user as sessions touched and
    * incident-hours covered. The "did this activity overlap that
    * outage/campaign window" query every ops/attribution pipeline has.
    *
    * Scale posture: the overlap is BANDED, not an inequality join — a
    * session [s,e] overlaps hour h iff h ∈ [s div H, e div H], so each
    * session explodes to its spanned hours (fan-out = duration/1h,
    * bounded by the session gap structure, never the other table) and
    * the join is EQUI on hr with the tiny incident set broadcast. The
    * oracle expresses the same overlap as a direct BETWEEN join —
    * equivalence of the two formulations is exactly what the gate
    * checks. The incident threshold is cross-multiplied integer
    * (cnt·nh·4 > 5·tot), no FP. Both the slim event projection (2
    * consumers: sessions + hourly counts) and the session table (2
    * consumers: spans + rollup) are localCheckpoint'ed. */
  def evIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"))
      .localCheckpoint()
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val sess = ev
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("tus").as("s_start"), max("tus").as("s_end"))
      .localCheckpoint()
    val hours = ev.groupBy(expr(s"tus div $HourUs").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val incidents = hours
      .crossJoin(broadcast(hours.agg(sum("cnt").as("tot"), count(lit(1)).as("nh"))))
      .filter(col("cnt") * col("nh") * 4 > col("tot") * 5)
    val overlaps = sess
      .withColumn("hr",
        explode(expr(s"sequence(s_start div $HourUs, s_end div $HourUs)")))
      .join(broadcast(incidents.select("hr")), Seq("hr"))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_inc_hours"))
    sess.join(overlaps, Seq("user_id", "sid"), "left")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_inc_hours").isNotNull, 1L).otherwise(0L))
          .as("n_incident_sessions"),
        sum(coalesce(col("n_inc_hours"), lit(0L))).as("sum_incident_hours"))
      .orderBy("user_id")
  }

  /** Exponentially time-decayed engagement score — the recency-weighted
    * feature every ranking/freshness pipeline computes (a count where
    * yesterday's event is worth 2^(-1/7) of today's): per user,
    * Σ value·2^(−age/halflife) anchored at the corpus max timestamp,
    * top-20 users. The decay anchor is data-derived (a 1-row max
    * broadcast-crossed onto the scan — no driver constant, no wall
    * clock, so the result is a pure function of the input).
    *
    * Float posture: ONE pow per row, then each term is quantized to
    * integer MICRO-UNITS before summing — the sum is a BIGINT, so it is
    * order-independent (the cents-sum contract) and the top-20 cut has
    * no float-summation-order risk; engines need only agree on the
    * per-row pow/round, not on any accumulation order. Ages are exact
    * integer microseconds (unix_micros / epoch_us) so both engines feed
    * pow bit-identical arguments.
    *
    * Scale: one partial-aggregated scan (map-side combine on user_id)
    * + a k-row TakeOrderedAndProject — no window, no global sort. */
  def evDecayedScore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("value"))
    ev.crossJoin(broadcast(ev.agg(max("tus").as("tmax_us"))))
      .select(col("user_id"),
        expr(s"CAST(round(value * pow(0.5, CAST(tmax_us - tus AS DOUBLE) / $HalfLifeUs) * 1000000) AS BIGINT)")
          .as("du"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("du").as("decayed_units"))
      .orderBy(desc("decayed_units"), col("user_id"))
      .limit(20)
      .select(col("user_id"), col("n_events"), col("decayed_units"),
        (col("decayed_units").cast("double") / 1000000).as("decayed_score"))
  }

  /** DuckDB twin of [[funnelSteps]] — the funnel-rule CTEs shared by
    * BOTH funnel oracles (t1k/t2k carried exactly as the Scala helper
    * does; the count funnel ignores them). */
  private def funnelStepsSql: String =
    s"""ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |v AS (SELECT user_id, min(tus) AS t1 FROM ev
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, min(tus) AS t2, max(t1) AS t1k
       |      FROM ev e JOIN v USING (user_id)
       |      WHERE event_type = 'click' AND tus > t1 AND tus <= t1 + $W24h
       |      GROUP BY 1),
       |p AS (SELECT e.user_id, min(tus) AS t3, max(t2) AS t2k
       |      FROM ev e JOIN c USING (user_id)
       |      WHERE event_type = 'purchase' AND tus > t2 AND tus <= t2 + $W24h
       |      GROUP BY 1)""".stripMargin

  /** CUPED derived stats over the exact per-arm / pooled accumulators
    * — ONE formula chain for both engines (the TtestDerived idiom).
    * theta = cov(X,Y)/var(X) from pooled sums; adjusted arm means
    * subtract theta·(arm pre-mean − pooled pre-mean); variance
    * reduction = ρ² (the CUPED identity var(Y−θX) = var(Y)(1−ρ²)). */
  private val CupedTheta =
    """(CAST(n * sxy - sx * sy AS DOUBLE)
      | / CAST(n * sxx - sx * sx AS DOUBLE))""".stripMargin

  private val CupedDerived = Seq(
    "n_a", "n_b",
    "round(theta, 6) + 0.0 AS theta",
    """round((CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b) / 1000, 4)
      | + 0.0 AS diff_raw""".stripMargin,
    """round(((CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b)
      |  - theta * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b)) / 1000, 4)
      | + 0.0 AS diff_adj""".stripMargin,
    """round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
      | / CAST(n * sxx - sx * sx AS DOUBLE)
      | / CAST(n * syy - sy * sy AS DOUBLE), 4)
      | + 0.0 AS var_reduction""".stripMargin)

  /** CUPED variance reduction (Deng et al. 2013) for the A/B readout:
    * each user's PRE-period activity (value sum before the corpus
    * midpoint) is the covariate that soaks up between-user variance in
    * the POST-period metric — the standard trick that lets an
    * experiment resolve the same effect with ~(1−ρ²)× the sample.
    *
    * Mechanics: one events scan → per-user (pre, post) milli-unit
    * sums (the split point is the exact integer midpoint of the
    * corpus's microsecond time range, from a broadcast 1-row min/max
    * agg); arms from the same md5-nibble hash as ev_ab_test (so the
    * CUPED readout composes with the rest of the experimentation
    * family); then ONE conditional aggregation produces pooled
    * {n, sx, sy, sxx, sxy, syy} and per-arm {n, sx, sy} — all exact
    * DECIMAL(38,0)/HUGEINT — and theta/adjusted-diff/ρ² derive through
    * [[CupedDerived]] shared verbatim. Scale: two partial-aggregated
    * shuffles (user grouping, then the 1-row fold), no window, no
    * per-user state at the driver. */
  /** Shared per-user PRE/POST panel behind the ev_cuped / ev_did /
    * ev_uplift_deciles / ev_capture_recapture family (the
    * shared-accumulator discipline): ONE events scan → per user the
    * exact milli-unit value sums (x = pre, y = post), event counts
    * (ex/ey), the ev_ab_test conversion gate evaluated on the POST
    * period only, and the md5-nibble arm. The split point is the exact
    * integer midpoint of the corpus's microsecond range, from a
    * broadcast 1-row min/max agg. [[PrePostCte]] is the DuckDB twin —
    * one definition per engine side, every consumer reads from it. */
  private def prePostUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v"),
        col("event_type"), col("value"))
    val lim = ev.agg(min("tus").as("lo"), max("tus").as("hi"))
    ev.crossJoin(broadcast(lim))
      .withColumn("mid", expr("lo + (hi - lo) div 2"))
      .groupBy("user_id")
      .agg(
        sum(expr("CASE WHEN tus < mid THEN v ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN tus >= mid THEN v ELSE 0 END")).as("y"),
        sum(expr("CASE WHEN tus < mid THEN 1 ELSE 0 END")).as("ex"),
        sum(expr("CASE WHEN tus >= mid THEN 1 ELSE 0 END")).as("ey"),
        max(expr("CASE WHEN tus >= mid AND event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END")).as("conv"))
      .withColumn("arm_b",
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 4), 16, 10) AS INT) % 2"))
  }

  /** DuckDB twin of [[prePostUsers]]: CTEs `e`, `lim`, `u`. */
  private val PrePostCte: String = {
    val h = (1 to 4)
      .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
      .mkString("(", " + ", ")")
    s"""e AS (
       |  SELECT user_id, epoch_us(ts) AS tus,
       |    CAST(round(value * 1000) AS BIGINT) AS v, event_type, value
       |  FROM events),
       |lim AS (SELECT min(tus) AS lo, max(tus) AS hi FROM e),
       |u AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN tus < lo + (hi - lo) // 2 THEN v ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN tus >= lo + (hi - lo) // 2 THEN v ELSE 0 END) AS BIGINT) AS y,
       |    CAST(sum(CASE WHEN tus < lo + (hi - lo) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS ex,
       |    CAST(sum(CASE WHEN tus >= lo + (hi - lo) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS ey,
       |    max(CASE WHEN tus >= lo + (hi - lo) // 2 AND event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv,
       |    $h % 2 AS arm_b
       |  FROM e, lim GROUP BY user_id)""".stripMargin
  }

  def evCuped(spark: SparkSession, dir: String): DataFrame =
    prePostUsers(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CASE WHEN arm_b = 0 THEN 1 ELSE 0 END")).as("n_a"),
        sum(expr("CASE WHEN arm_b = 0 THEN CAST(x AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sx_a"),
        sum(expr("CASE WHEN arm_b = 0 THEN CAST(y AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sy_a"),
        sum(expr("CASE WHEN arm_b = 1 THEN 1 ELSE 0 END")).as("n_b"),
        sum(expr("CASE WHEN arm_b = 1 THEN CAST(x AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sx_b"),
        sum(expr("CASE WHEN arm_b = 1 THEN CAST(y AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sy_b"))
      .withColumn("theta", expr(CupedTheta))
      .selectExpr(CupedDerived: _*)

  /** Conditional-Poisson (C-test) z over the two half-window purchase
    * counts — shared formula string for both engines. Equal exposure
    * by construction makes the conditional null Binomial(n, 1/2),
    * whose normal approximation is (n2−n1)/√(n1+n2). */
  private val RateZ =
    """round(CAST(n_post - n_pre AS DOUBLE)
      | / sqrt(CAST(n_post + n_pre AS DOUBLE)), 4) + 0.0 AS z_stat""".stripMargin

  /** Two-window Poisson rate comparison (the C-test): did the purchase
    * RATE change between the pre and post halves of the corpus range?
    * Exposure is equal by construction (the exact integer midpoint
    * split), so conditioning on the total reduces the comparison to a
    * Binomial(n, ½) sign test — the monitoring question ("did
    * throughput change?") asked of COUNTS, where the t-family needs
    * per-unit values. Counts exact; ratio exact integer ppm
    * (truncating div, the q34 parity note); z through [[RateZ]]
    * shared verbatim. One partial-aggregated scan, 1-row output. */
  def statRateTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(unix_micros(col("ts")).as("tus"), col("event_type"))
    val lim = ev.agg(min("tus").as("lo"), max("tus").as("hi"))
    ev.crossJoin(broadcast(lim))
      .withColumn("mid", expr("lo + (hi - lo) div 2"))
      .filter(col("event_type") === "purchase")
      .agg(
        sum(expr("CASE WHEN tus < mid THEN 1 ELSE 0 END")).as("n_pre"),
        sum(expr("CASE WHEN tus >= mid THEN 1 ELSE 0 END")).as("n_post"))
      .selectExpr("n_pre", "n_post",
        "CASE WHEN n_pre = 0 THEN 0 ELSE n_post * 1000000 div n_pre END AS ratio_ppm",
        RateZ)
  }

  /** Dispersion index derived stats — mean and variance of the
    * per-user count from exact accumulators over the FULL user
    * population (zeros included via the broadcast global user count);
    * ONE formula list for both engines. D = var/mean: 1 under
    * Poisson, > 1 overdispersed. */
  private val DispersionDerived = Seq(
    "t AS event_type", "nu AS n_users",
    "round(CAST(s AS DOUBLE) / nu, 4) + 0.0 AS mean_events",
    """round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / nu) / (nu - 1), 4)
      | + 0.0 AS var_events""".stripMargin,
    """round(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / nu) / (nu - 1))
      | / (CAST(s AS DOUBLE) / nu), 4) + 0.0 AS dispersion""".stripMargin)

  /** Per-type overdispersion screen: the variance-to-mean ratio of
    * per-user event counts — the modeling gate before anyone fits a
    * Poisson to user activity (human behavior is bursty; D ≫ 1 says
    * use negative-binomial / add a per-user rate, and an SLO alert
    * sized on Poisson tails will page constantly). Zeros matter: a
    * user who never clicked still belongs to the click population, so
    * the moments run over sum/sumsq of the PRESENT users plus the
    * broadcast global user count (absent users add exactly 0 to both
    * sums — no users×types expansion is ever materialized). All
    * accumulators exact DECIMAL/HUGEINT; derived through
    * [[DispersionDerived]] verbatim. Two partial-aggregated shuffles
    * ((type,user) then type), type-sized output. */
  def statDispersion(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir).events
      .groupBy(col("event_type").as("t"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val users = Tables(spark, dir).events
      .agg(countDistinct("user_id").as("nu"))
    perUser
      .groupBy("t")
      .agg(
        sum(expr("CAST(c AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"))
      .crossJoin(broadcast(users))
      .selectExpr(DispersionDerived: _*)
      .orderBy("event_type")
  }

  /** Negative-binomial method-of-moments fit per event type — the
    * modeling step stat_dispersion's screen points at (D ≫ 1 ⇒ the
    * Poisson is wrong; THIS is the distribution you fit instead, the
    * one an SLO alert or a capacity model should draw tails from):
    * from the same zeros-included per-user count accumulators, the
    * moment equations give r = m²/(v − m) and p = r/(r + m); a type
    * with v ≤ m keeps a 'poisson_like' verdict and null parameters
    * (the MoM fit does not exist there). Shared formula layers, exact
    * integer accumulators, one division path per double. */
  def statNbFit(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir).events
      .groupBy(col("event_type").as("t"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val users = Tables(spark, dir).events
      .agg(countDistinct("user_id").as("nu"))
    NbFitLayers.foldLeft(
      perUser.groupBy("t")
        .agg(
          sum(expr("CAST(c AS DECIMAL(38,0))")).as("s"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"))
        .crossJoin(broadcast(users))) {
      (df, layer) => df.selectExpr(layer: _*)
    }.orderBy("event_type")
  }

  /** Method-of-moments layers shared by both engines (population
    * moments over ALL nu users — absent users are exact zeros). */
  private val NbFitLayers: Seq[Seq[String]] = Seq(
    Seq("t AS event_type", "nu",
      "CAST(s AS DOUBLE) / nu AS m",
      "CAST(q AS DOUBLE) / nu - (CAST(s AS DOUBLE) / nu) * (CAST(s AS DOUBLE) / nu) AS v"),
    Seq("*", "CASE WHEN v > m THEN m * m / (v - m) END AS r_raw"),
    Seq("event_type", "CAST(nu AS BIGINT) AS n_users",
      "round(m, 4) + 0.0 AS mean_per_user",
      "round(v, 4) + 0.0 AS var_per_user",
      "CASE WHEN v > m THEN 'negative_binomial' ELSE 'poisson_like' END AS fit",
      "round(r_raw, 4) + 0.0 AS nb_r",
      "round(r_raw / (r_raw + m), 4) + 0.0 AS nb_p"))

  /** Difference-in-differences derived stats — four arm×period means
    * plus the DiD estimate, all from the exact per-arm milli-unit
    * accumulators; ONE formula list for both engines. */
  private val DidDerived = Seq(
    "n_c", "n_t",
    "round(CAST(sx_c AS DOUBLE) / n_c / 1000, 4) + 0.0 AS pre_c",
    "round(CAST(sy_c AS DOUBLE) / n_c / 1000, 4) + 0.0 AS post_c",
    "round(CAST(sx_t AS DOUBLE) / n_t / 1000, 4) + 0.0 AS pre_t",
    "round(CAST(sy_t AS DOUBLE) / n_t / 1000, 4) + 0.0 AS post_t",
    """round(((CAST(sy_t AS DOUBLE) / n_t - CAST(sx_t AS DOUBLE) / n_t)
      |  - (CAST(sy_c AS DOUBLE) / n_c - CAST(sx_c AS DOUBLE) / n_c)) / 1000, 4)
      | + 0.0 AS did""".stripMargin)

  /** Difference-in-differences over the [[prePostUsers]] panel — the
    * estimator for when assignment ISN'T randomized (a staged rollout,
    * a geo launch): the control arm's pre→post drift is the
    * counterfactual subtracted from the treated arm's, so any shared
    * time trend (seasonality, marketing, the news) cancels instead of
    * polluting the effect. Here the arms ARE the hash split, which
    * makes the expected DiD ≈ 0 — the panel's job is the estimator
    * machinery next to ev_cuped's variance story (CUPED reduces noise
    * under randomization; DiD removes bias without it). One
    * conditional fold over the shared panel → six exact accumulators →
    * [[DidDerived]] verbatim in both engines. */
  def evDid(spark: SparkSession, dir: String): DataFrame =
    prePostUsers(spark, dir)
      .agg(
        sum(expr("CASE WHEN arm_b = 0 THEN 1 ELSE 0 END")).as("n_c"),
        sum(expr("CASE WHEN arm_b = 0 THEN CAST(x AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sx_c"),
        sum(expr("CASE WHEN arm_b = 0 THEN CAST(y AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sy_c"),
        sum(expr("CASE WHEN arm_b = 1 THEN 1 ELSE 0 END")).as("n_t"),
        sum(expr("CASE WHEN arm_b = 1 THEN CAST(x AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sx_t"),
        sum(expr("CASE WHEN arm_b = 1 THEN CAST(y AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sy_t"))
      .selectExpr(DidDerived: _*)

  /** Uplift by pre-activity decile — the heterogeneous-treatment-effect
    * readout (an average lift of zero can hide "+big on dormant users,
    * −big on power users"; segmenting by PRE-period behavior is the
    * standard first cut and, unlike post-period segments, can't be
    * moved by the treatment itself). Users rank into ntile(10) deciles
    * of pre-period value (user_id tiebreak — total order, so both
    * engines assign identical deciles), then per decile the exact
    * arm×conversion counts and integer-ppm rates with the lift
    * difference. Scale: the global ntile is a single-ordering window
    * over USER-sized data — at the scale where that matters, deciles
    * come from pre-computed quantile bounds (the agg_quantile_bins
    * posture) instead of a global sort; the per-decile fold is the
    * usual partial agg. */
  def evUpliftDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("x", "user_id")
    prePostUsers(spark, dir)
      .withColumn("d", ntile(10).over(w))
      .groupBy("d")
      .agg(
        sum(expr("CASE WHEN arm_b = 0 THEN 1 ELSE 0 END")).as("n_a"),
        sum(expr("CASE WHEN arm_b = 0 THEN CAST(conv AS BIGINT) ELSE 0 END")).as("c_a"),
        sum(expr("CASE WHEN arm_b = 1 THEN 1 ELSE 0 END")).as("n_b"),
        sum(expr("CASE WHEN arm_b = 1 THEN CAST(conv AS BIGINT) ELSE 0 END")).as("c_b"))
      .selectExpr("CAST(d AS INT) AS decile", "n_a", "c_a", "n_b", "c_b",
        "CASE WHEN n_a = 0 THEN 0 ELSE c_a * 1000000 div n_a END AS conv_a_ppm",
        "CASE WHEN n_b = 0 THEN 0 ELSE c_b * 1000000 div n_b END AS conv_b_ppm")
      .selectExpr("decile", "n_a", "c_a", "n_b", "c_b",
        "conv_a_ppm", "conv_b_ppm",
        "conv_b_ppm - conv_a_ppm AS lift_ppm")
      .orderBy("decile")
  }

  /** Chapman capture–recapture estimate of the active-user population
    * from two "capture" windows (pre/post halves of the corpus range)
    * — the ecology estimator growth teams use when no single window
    * sees everyone: N̂ = (n1+1)(n2+1)/(m+1) − 1 from the two window
    * counts and their overlap, all exact integers (truncating div —
    * `div` vs `//`, the q34 parity note), reported next to the TRUE
    * distinct-user count the estimator is trying to recover (the
    * corpus is finite, so the gate is self-validating). One fold over
    * the shared [[prePostUsers]] panel — presence = per-window event
    * count > 0. */
  def evCaptureRecapture(spark: SparkSession, dir: String): DataFrame =
    prePostUsers(spark, dir)
      .agg(
        sum(expr("CASE WHEN ex > 0 THEN 1 ELSE 0 END")).as("n_first"),
        sum(expr("CASE WHEN ey > 0 THEN 1 ELSE 0 END")).as("n_second"),
        sum(expr("CASE WHEN ex > 0 AND ey > 0 THEN 1 ELSE 0 END")).as("n_both"),
        count(lit(1)).as("n_users"))
      .selectExpr("n_first", "n_second", "n_both", "n_users",
        "(n_first + 1) * (n_second + 1) div (n_both + 1) - 1 AS chapman_est")

  /** Growth accounting: the daily active-user delta decomposed into
    * NEW (first-ever day), RETAINED (also active the previous day),
    * RESURRECTED (returning after a gap), and CHURNED (active the
    * previous day, not today) — the standard MAU/DAU ledger a growth
    * team reads before any single metric, finishing what
    * [[evNewVsReturning]] starts (its `returning` bucket is retained +
    * resurrected merged, and it has no churn side at all). Churn is
    * attributed to the FIRST inactive day (d+1 of the last active day
    * before the gap) and right-censored at the corpus max day — a user
    * whose last activity is the final day has not churned yet.
    * StatSpec pins the ledger identity churned(d) + retained(d) =
    * DAU(d−1) for every interior day.
    *
    * Scale: one distinct over (user, day) pairs, one user-keyed
    * lag/lead window, then day-domain aggregates — the
    * ev_cumulative_users posture (nothing after the distinct is
    * data-sized; the full-outer merge runs on the ≤span day domain). */
  def evGrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    val lagged = du
      .withColumn("prev_d", lag("d", 1).over(w))
      .withColumn("next_d", lead("d", 1).over(w))
      .localCheckpoint()
    val act = lagged.groupBy("d").agg(
      sum(when(col("prev_d").isNull, 1L).otherwise(0L)).as("new_users"),
      sum(when(col("prev_d") === col("d") - 1, 1L).otherwise(0L)).as("retained"),
      sum(when(col("prev_d").isNotNull && col("prev_d") < col("d") - 1, 1L)
        .otherwise(0L)).as("resurrected"))
    val maxd = lagged.agg(max("d").as("maxd"))
    val churn = lagged.crossJoin(broadcast(maxd))
      .filter(col("d") < col("maxd") &&
        (col("next_d").isNull || col("next_d") > col("d") + 1))
      .select((col("d") + 1).as("d"))
      .groupBy("d").agg(count(lit(1)).as("churned"))
    act.join(churn, Seq("d"), "full_outer")
      .selectExpr("d",
        "coalesce(new_users, CAST(0 AS BIGINT)) AS new_users",
        "coalesce(retained, CAST(0 AS BIGINT)) AS retained",
        "coalesce(resurrected, CAST(0 AS BIGINT)) AS resurrected",
        "coalesce(churned, CAST(0 AS BIGINT)) AS churned")
      .orderBy("d")
  }

  /** Per-user session counts via Spark's BUILT-IN `session_window`
    * aggregation — the declarative twin of ev_sessionize's lag+cumsum
    * formulation, and the exact batch shape of the §2.8 streaming
    * session window (same API, same state semantics). The oracle
    * deliberately states the OTHER formulation (gap rule over a lag
    * window) — two independent derivations agreeing is the stronger
    * gate. Boundary contract: session_window's interval is half-open
    * [start, last+gap), so a gap of EXACTLY 30 min starts a new
    * session (`>=`), one tick off ev_sessionize's `>` rule — the twins
    * are deliberately one boundary apart and both pinned.
    *
    * Scale: one user_id-keyed aggregation; Spark plans session_window
    * as a sort-based merge per user partition — no per-event state. */
  def evSessionNative(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_ev"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("n_events"))
      .orderBy("user_id")

  /** Behavioral × demographic cut — the clickstream⋈CRM join every
    * analytics team runs and the library's first CROSS-DATASET
    * linkage (events.user_id ⊆ customer.c_custkey is the star
    * schema's implicit FK, asserted by qc_referential's machinery):
    * per (market segment, event type), distinct users, events, exact
    * cents of event value, and events-per-user in ppm. The customer
    * dim broadcasts; the one data-sized shuffle is the per-(user,
    * type) partial aggregation, after which everything is
    * segment-domain-sized. */
  def evSegmentEngagement(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perUser = t.events
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_ev"), sum("cents").as("c"))
    perUser
      .join(broadcast(t.customer.select(col("c_custkey").as("user_id"),
        col("c_mktsegment"))), "user_id")
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n_users"),
        sum("n_ev").as("n_events"),
        sum(expr("CAST(c AS DECIMAL(38,0))")).cast("long").as("value_cents"))
      .selectExpr("c_mktsegment", "event_type", "n_users", "n_events",
        "value_cents",
        "n_events * 1000000 div n_users AS events_per_user_ppm")
      .orderBy("c_mktsegment", "event_type")
  }

  /** Cross-SYSTEM value reconciliation — qc_referential checks that
    * KEYS line up across tables; this checks that VALUES do across
    * SYSTEMS (the clickstream's purchase amounts vs the order system's
    * revenue for the same customers — the daily finance-vs-telemetry
    * diff every pipeline owner is asked for): per nation over the
    * event-active customer population, both sides in exact cents plus
    * the behavioral/transactional ratio in ppm (one integer division;
    * a ratio wildly off 1e6 localizes instrumentation drift to a
    * segment). Both fact sides pre-aggregate per customer BEFORE the
    * join (user-keyed partial aggregation, the ev_cohort_ltv
    * posture); the nation rollup is domain-sized and the dim
    * broadcasts. */
  def qcCrossSystem(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("user_id")
      .agg(sum(expr("CAST(c AS DECIMAL(38,0))")).as("ev_c"))
    val ord = t.orders
      .select(col("o_custkey").as("user_id"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("user_id")
      .agg(sum(expr("CAST(c AS DECIMAL(38,0))")).as("ord_c"))
    ev.join(ord, Seq("user_id"), "left_outer")
      .join(broadcast(t.customer.select(col("c_custkey").as("user_id"),
        col("c_nationkey"))), "user_id")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sum("ev_c").cast("long").as("event_cents"),
        sum(expr("coalesce(ord_c, CAST(0 AS DECIMAL(38,0)))")).cast("long")
          .as("order_cents"))
      .selectExpr("c_nationkey", "n_customers", "event_cents", "order_cents",
        """CASE WHEN order_cents = 0 THEN CAST(NULL AS BIGINT)
          | ELSE event_cents * 1000000 div order_cents END
          | AS ev_over_ord_ppm""".stripMargin)
      .orderBy("c_nationkey")
  }

  /** Pareto / concentration CURVE of event volume over users — the
    * curve companion to agg_gini's scalar (the stat_calibration move:
    * a scalar inequality number hides WHERE the mass sits; the curve
    * answers "what share of traffic do the top k% of users drive").
    * Share held by the top ⌈k·U/10⌉ users at each decile k, all exact
    * integers: users within one activity level are interchangeable,
    * so mass at an interior rank is cum_mass − (cum_users − rank)·level
    * — the counting-selection pick (agg_exact_median) applied to a
    * cumulative readout.
    *
    * Scale: the qc_skew_profile shape — per-user counts collapse to a
    * COUNT-OF-COUNTS histogram, the window runs over |distinct
    * activity levels| rows (never |users|), the decile fan-out is a
    * 10-row broadcast. */
  def evParetoCurve(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the |levels|-row histogram feeds both the
    // cumulative window and the totals — without it the whole
    // events scan + two shuffles replay for the 1-row total side.
    val hist = Tables(spark, dir).events
      .groupBy("user_id").agg(count(lit(1)).as("n_ev"))
      .groupBy("n_ev").agg(count(lit(1)).as("nk"))
      .withColumn("mass", expr("n_ev * nk"))
      .localCheckpoint()
    val w = Window.orderBy(col("n_ev").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum_u", sum("nk").over(w))
      .withColumn("cum_m", sum("mass").over(w))
    val tot = hist.agg(sum("nk").as("u"), sum("mass").as("e"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_ev"), col("nk"), col("cum_u"), col("cum_m"),
        col("u"), col("e"),
        explode(expr("sequence(1, 10)")).as("decile"))
      .withColumn("rk", expr("(decile * u + 9) div 10"))
      .filter(col("cum_u") >= col("rk") &&
        col("cum_u") - col("nk") < col("rk"))
      .selectExpr("decile", "rk AS top_users",
        "cum_m - (cum_u - rk) * n_ev AS cum_events",
        "(cum_m - (cum_u - rk) * n_ev) * 1000000 div e AS share_ppm")
      .orderBy("decile")
  }

  val oracles: Map[String, String] = Map(
    "ev_pareto_curve" ->
      """WITH pu AS (SELECT user_id, count(*) AS n_ev FROM events GROUP BY 1),
        |h AS (SELECT n_ev, CAST(count(*) AS BIGINT) AS nk,
        |        CAST(n_ev * count(*) AS BIGINT) AS mass
        |      FROM pu GROUP BY 1),
        |c AS (
        |  SELECT n_ev, nk,
        |    sum(nk) OVER (ORDER BY n_ev DESC ROWS UNBOUNDED PRECEDING) AS cum_u,
        |    sum(mass) OVER (ORDER BY n_ev DESC ROWS UNBOUNDED PRECEDING) AS cum_m
        |  FROM h),
        |t AS (SELECT CAST(sum(nk) AS BIGINT) AS u, CAST(sum(mass) AS BIGINT) AS e
        |      FROM h),
        |x AS (
        |  SELECT decile, n_ev, nk, cum_u, cum_m, u, e,
        |    (decile * u + 9) // 10 AS rk
        |  FROM c CROSS JOIN t
        |  CROSS JOIN (SELECT unnest(range(1, 11)) AS decile))
        |SELECT CAST(decile AS INT) AS decile, CAST(rk AS BIGINT) AS top_users,
        |  CAST(cum_m - (cum_u - rk) * n_ev AS BIGINT) AS cum_events,
        |  CAST((cum_m - (cum_u - rk) * n_ev) * 1000000 // e AS BIGINT)
        |    AS share_ppm
        |FROM x
        |WHERE cum_u >= rk AND cum_u - nk < rk
        |ORDER BY decile""".stripMargin,
    "ev_segment_engagement" ->
      """WITH pu AS (
        |  SELECT user_id, event_type, count(*) AS n_ev,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT c_mktsegment, event_type, n_ev, c
        |  FROM pu JOIN customer ON user_id = c_custkey)
        |SELECT c_mktsegment, event_type,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  CAST(sum(c::HUGEINT) AS BIGINT) AS value_cents,
        |  CAST(sum(n_ev) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |    AS events_per_user_ppm
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "qc_cross_system" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    sum(CAST(round(value * 100) AS BIGINT)::HUGEINT) AS ev_c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |ord AS (
        |  SELECT o_custkey AS user_id,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT) AS ord_c
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT c_nationkey, ev_c, coalesce(ord_c, 0) AS ord_c
        |  FROM ev LEFT JOIN ord USING (user_id)
        |  JOIN customer ON user_id = c_custkey)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(ev_c) AS BIGINT) AS event_cents,
        |  CAST(sum(ord_c) AS BIGINT) AS order_cents,
        |  CASE WHEN CAST(sum(ord_c) AS BIGINT) = 0 THEN CAST(NULL AS BIGINT)
        |   ELSE CAST(sum(ev_c) AS BIGINT) * 1000000
        |        // CAST(sum(ord_c) AS BIGINT) END AS ev_over_ord_ppm
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_growth_accounting" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
        |  FROM events),
        |l AS (
        |  SELECT d, user_id,
        |    lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
        |    lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
        |  FROM du),
        |act AS (
        |  SELECT d,
        |    CAST(sum(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(sum(CASE WHEN prev_d = d - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS retained,
        |    CAST(sum(CASE WHEN prev_d IS NOT NULL AND prev_d < d - 1
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        |  FROM l GROUP BY d),
        |mx AS (SELECT max(d) AS maxd FROM du),
        |churn AS (
        |  SELECT d + 1 AS d, CAST(count(*) AS BIGINT) AS churned
        |  FROM l CROSS JOIN mx
        |  WHERE d < maxd AND (next_d IS NULL OR next_d > d + 1)
        |  GROUP BY d + 1)
        |SELECT d,
        |  coalesce(new_users, 0) AS new_users,
        |  coalesce(retained, 0) AS retained,
        |  coalesce(resurrected, 0) AS resurrected,
        |  coalesce(churned, 0) AS churned
        |FROM act FULL JOIN churn USING (d)
        |ORDER BY d""".stripMargin,
    "ev_session_native" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |l AS (
        |  SELECT user_id, tus,
        |    lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
        |  FROM e),
        |s AS (
        |  SELECT user_id,
        |    CASE WHEN prev IS NULL OR tus - prev >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM l)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_cuped" ->
      s"""WITH $PrePostCte,
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         |    sum(x::HUGEINT * x) AS sxx, sum(x::HUGEINT * y) AS sxy,
         |    sum(y::HUGEINT * y) AS syy,
         |    CAST(sum(CASE WHEN arm_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    sum(CASE WHEN arm_b = 0 THEN x::HUGEINT ELSE 0 END) AS sx_a,
         |    sum(CASE WHEN arm_b = 0 THEN y::HUGEINT ELSE 0 END) AS sy_a,
         |    CAST(sum(CASE WHEN arm_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    sum(CASE WHEN arm_b = 1 THEN x::HUGEINT ELSE 0 END) AS sx_b,
         |    sum(CASE WHEN arm_b = 1 THEN y::HUGEINT ELSE 0 END) AS sy_b
         |  FROM u),
         |t AS (SELECT *, $CupedTheta AS theta FROM m)
         |SELECT ${CupedDerived.mkString(",\n")}
         |FROM t""".stripMargin,
    "stat_rate_test" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS tus, event_type FROM events),
         |lim AS (SELECT min(tus) AS lo, max(tus) AS hi FROM e),
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN tus < lo + (hi - lo) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
         |    CAST(sum(CASE WHEN tus >= lo + (hi - lo) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_post
         |  FROM e, lim WHERE event_type = 'purchase')
         |SELECT n_pre, n_post,
         |  CASE WHEN n_pre = 0 THEN 0 ELSE n_post * 1000000 // n_pre END AS ratio_ppm,
         |  $RateZ
         |FROM m""".stripMargin,
    "stat_dispersion" ->
      s"""WITH pu AS (
         |  SELECT event_type AS t, user_id, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM events),
         |m AS (
         |  SELECT t, sum(c::HUGEINT) AS s, sum(c::HUGEINT * c) AS q
         |  FROM pu GROUP BY t)
         |SELECT ${DispersionDerived.mkString(",\n")}
         |FROM m, nu ORDER BY event_type""".stripMargin,
    "ev_drawdown" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |dd AS (
        |  SELECT d, rev_cents,
        |    max(rev_cents) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak_cents
        |  FROM daily)
        |SELECT d AS worst_day, rev_cents, peak_cents,
        |  peak_cents - rev_cents AS drawdown_cents
        |FROM dd ORDER BY drawdown_cents DESC, d LIMIT 1""".stripMargin,
    "stat_nb_fit" ->
      s"""WITH pu AS (
         |  SELECT event_type AS t, user_id, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM events),
         |acc AS (
         |  SELECT t, sum(c::HUGEINT) AS s, sum(c::HUGEINT * c) AS q
         |  FROM pu GROUP BY t),
         |t0 AS (SELECT ${NbFitLayers(0).mkString(",\n")} FROM acc, nu),
         |t1 AS (SELECT ${NbFitLayers(1).mkString(",\n")} FROM t0)
         |SELECT ${NbFitLayers(2).mkString(",\n")} FROM t1
         |ORDER BY event_type""".stripMargin,
    "ev_did" ->
      s"""WITH $PrePostCte,
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN arm_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         |    sum(CASE WHEN arm_b = 0 THEN x::HUGEINT ELSE 0 END) AS sx_c,
         |    sum(CASE WHEN arm_b = 0 THEN y::HUGEINT ELSE 0 END) AS sy_c,
         |    CAST(sum(CASE WHEN arm_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         |    sum(CASE WHEN arm_b = 1 THEN x::HUGEINT ELSE 0 END) AS sx_t,
         |    sum(CASE WHEN arm_b = 1 THEN y::HUGEINT ELSE 0 END) AS sy_t
         |  FROM u)
         |SELECT ${DidDerived.mkString(",\n")}
         |FROM m""".stripMargin,
    "ev_uplift_deciles" ->
      s"""WITH $PrePostCte,
         |d10 AS (
         |  SELECT *, ntile(10) OVER (ORDER BY x, user_id) AS d FROM u),
         |g AS (
         |  SELECT d,
         |    CAST(sum(CASE WHEN arm_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN arm_b = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN arm_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN arm_b = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
         |  FROM d10 GROUP BY d),
         |p AS (
         |  SELECT CAST(d AS INT) AS decile, n_a, c_a, n_b, c_b,
         |    CASE WHEN n_a = 0 THEN 0 ELSE c_a * 1000000 // n_a END AS conv_a_ppm,
         |    CASE WHEN n_b = 0 THEN 0 ELSE c_b * 1000000 // n_b END AS conv_b_ppm
         |  FROM g)
         |SELECT decile, n_a, c_a, n_b, c_b, conv_a_ppm, conv_b_ppm,
         |  conv_b_ppm - conv_a_ppm AS lift_ppm
         |FROM p ORDER BY decile""".stripMargin,
    "ev_capture_recapture" ->
      s"""WITH $PrePostCte,
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN ex > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         |    CAST(sum(CASE WHEN ey > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_second,
         |    CAST(sum(CASE WHEN ex > 0 AND ey > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |    CAST(count(*) AS BIGINT) AS n_users
         |  FROM u)
         |SELECT n_first, n_second, n_both, n_users,
         |  (n_first + 1) * (n_second + 1) // (n_both + 1) - 1 AS chapman_est
         |FROM m""".stripMargin,
    "qc_sequence_check" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS ptus
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN ptus > tus THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
        |  CAST(max(CASE WHEN ptus > tus THEN ptus - tus ELSE 0 END) AS BIGINT)
        |    AS max_backstep_us,
        |  CAST(sum(CASE WHEN ptus > tus THEN 1 ELSE 0 END) * 1000000 // count(*)
        |    AS BIGINT) AS inversion_ppm
        |FROM e WHERE ptus IS NOT NULL""".stripMargin,
    "stat_srm_check" ->
      s"""WITH $AbAccumSql
         |SELECT n_a, n_b,
         |  CASE WHEN n_a + n_b = 0 THEN 0
         |       ELSE ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
         |  END AS srm_z2_micro,
         |  CASE WHEN (CASE WHEN n_a + n_b = 0 THEN 0
         |             ELSE ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b) END)
         |            > 3840000 THEN 1 ELSE 0 END AS srm_flag
         |FROM m""".stripMargin,
    "ev_user_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM tu a JOIN tu b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t1, t2, inter, s1.n AS n1, s2.n AS n2,
        |  inter * 1000000 // (s1.n + s2.n - inter) AS jaccard_ppm
        |FROM p JOIN s s1 ON s1.event_type = p.t1
        |       JOIN s s2 ON s2.event_type = p.t2
        |ORDER BY t1, t2""".stripMargin,
    "stat_cusum" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS nd
        |      FROM daily),
        |c AS (
        |  SELECT d, nd,
        |    CAST(sum(nd * x - s) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cusum
        |  FROM daily CROSS JOIN t)
        |SELECT nd AS n_days, d AS change_day, cusum AS cusum_units
        |FROM c ORDER BY abs(cusum) DESC, d LIMIT 1""".stripMargin,
    "stat_seasonal_decompose" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |tr AS (
        |  SELECT h, n,
        |    CAST(sum(n * 1000) OVER w // count(n) OVER w AS BIGINT) AS trend_milli
        |  FROM hourly
        |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |det AS (
        |  SELECT h % 24 AS hod, n * 1000 - trend_milli AS det_milli FROM tr),
        |se AS (
        |  SELECT hod, CAST(sum(det_milli) // count(*) AS BIGINT) AS seasonal_milli,
        |    CAST(count(*) AS BIGINT) AS n_hours
        |  FROM det GROUP BY 1)
        |SELECT hod, max(seasonal_milli) AS seasonal_milli,
        |  max(n_hours) AS n_hours,
        |  CAST(sum(abs(det_milli - se.seasonal_milli)) // count(*) AS BIGINT)
        |    AS mean_abs_resid_milli
        |FROM det JOIN se USING (hod)
        |GROUP BY hod ORDER BY hod""".stripMargin,
    "stat_holt_forecast" ->
      s"""WITH $holtSeriesCtesSql,
         |fit AS (
         |  SELECT event_type, n_days,
         |    list_reduce(
         |      list_concat([[ys[1][1], ys[2][1] - ys[1][1]]], ys[2:]),
         |      $HoltFoldSql)
         |      AS st
         |  FROM ser)
         |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
         |  round(st[1], 4) + 0.0 AS level,
         |  round(st[2], 4) + 0.0 AS trend,
         |  round(st[1] + st[2], 4) + 0.0 AS fc_1,
         |  round(st[1] + 7 * st[2], 4) + 0.0 AS fc_7
         |FROM fit ORDER BY event_type""".stripMargin,
    "stat_forecast_eval" ->
      s"""WITH $holtSeriesCtesSql,
         |ev AS (
         |  SELECT event_type, n_days,
         |    list_transform(range(greatest(2, n_days - 10), n_days), c ->
         |      CAST(round(abs(
         |        list_reduce(
         |          list_concat([[ys[1][1], ys[2][1] - ys[1][1]]], ys[2:c]),
         |          $HoltFoldSql)[1]
         |        + list_reduce(
         |          list_concat([[ys[1][1], ys[2][1] - ys[1][1]]], ys[2:c]),
         |          $HoltFoldSql)[2]
         |        - ys[c + 1][1]) * 1000) AS BIGINT)) AS he,
         |    list_transform(range(greatest(2, n_days - 10), n_days), c ->
         |      CAST(round(abs(ys[c + 1][1] - ys[c][1]) * 1000) AS BIGINT)) AS ne
         |  FROM ser WHERE n_days >= 4)
         |SELECT event_type,
         |  CAST(len(he) AS BIGINT) AS n_eval,
         |  CAST(list_sum(ne) // len(ne) AS BIGINT) AS mae_naive_milli,
         |  CAST(list_sum(he) // len(he) AS BIGINT) AS mae_holt_milli,
         |  list_sum(he) < list_sum(ne) AS holt_wins
         |FROM ev ORDER BY event_type""".stripMargin,
    "ev_seasonal_naive" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(h) AS mh FROM hourly),
        |j AS (
        |  SELECT a.event_type, a.h, a.cnt, b.cnt AS cnt_prev
        |  FROM hourly a JOIN hourly b
        |    ON a.event_type = b.event_type AND a.h = b.h + 24)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(abs(cnt - cnt_prev)) AS BIGINT) AS sum_abs_err,
        |  CAST(sum(abs(cnt - cnt_prev)) * 1000 // count(*) AS BIGINT) AS mae_milli
        |FROM j, mx WHERE j.h > mh - 72
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stat_power_mde" ->
      s"""WITH $AbAccumSql,
         |x AS (
         |  SELECT n_a, n_b,
         |    (c_a + c_b) * 1000000 // (n_a + n_b) AS pooled_ppm,
         |    least(n_a, n_b) AS n_min,
         |    abs(CASE WHEN n_a = 0 THEN 0 ELSE c_a * 1000000 // n_a END
         |      - CASE WHEN n_b = 0 THEN 0 ELSE c_b * 1000000 // n_b END)
         |      AS observed_diff_ppm
         |  FROM m),
         |y AS (SELECT n_a, n_b, n_min, pooled_ppm, observed_diff_ppm, $MdePpm FROM x)
         |SELECT n_a, n_b, pooled_ppm, observed_diff_ppm, mde_ppm,
         |  CASE WHEN n_min = 0 THEN 0
         |   WHEN observed_diff_ppm >= mde_ppm THEN 1
         |   ELSE 0 END AS detectable
         |FROM y""".stripMargin,
    "ev_ohlc_bars" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, epoch_us(ts) AS tus,
         |         CAST(round(value * 1000000) AS BIGINT) AS vq
         |  FROM events),
         |x AS (
         |  SELECT event_type, tus // 14400000000 AS bar, vq,
         |    row_number() OVER w AS rn,
         |    count(*) OVER (PARTITION BY event_type, tus // 14400000000) AS cnt
         |  FROM e WINDOW w AS (
         |    PARTITION BY event_type, tus // 14400000000
         |    ORDER BY tus, event_id))
         |SELECT event_type, make_timestamp(bar * 14400000000) AS bar_start,
         |  max(CASE WHEN rn = 1 THEN vq END) AS open_u,
         |  max(vq) AS high_u, min(vq) AS low_u,
         |  max(CASE WHEN rn = cnt THEN vq END) AS close_u,
         |  count(*) AS n, CAST(sum(vq) AS BIGINT) AS vol_u
         |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_streak" ->
      s"""WITH days AS (
         |  SELECT DISTINCT user_id, epoch_us(ts) // $W24h AS day FROM events),
         |isl AS (
         |  SELECT user_id,
         |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
         |  FROM days),
         |runs AS (
         |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
         |  FROM isl GROUP BY 1, 2)
         |SELECT user_id, max(len) AS longest_streak,
         |  CAST(sum(len) AS BIGINT) AS n_active_days
         |FROM runs GROUP BY 1
         |ORDER BY longest_streak DESC, user_id LIMIT 20""".stripMargin,
    "ev_interval_overlap" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
         |x AS (
         |  SELECT user_id, tus, event_id,
         |    CASE WHEN lag(tus) OVER w IS NULL
         |              OR tus - lag(tus) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |y AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
         |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x),
         |sess AS (
         |  SELECT user_id, sid, min(tus) AS s_start, max(tus) AS s_end
         |  FROM y GROUP BY 1, 2),
         |hours AS (
         |  SELECT tus // $HourUs AS hr, CAST(count(*) AS BIGINT) AS cnt
         |  FROM ev GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS nh
         |        FROM hours),
         |inc AS (SELECT hr FROM hours CROSS JOIN tot
         |        WHERE cnt * nh * 4 > tot * 5),
         |ov AS (
         |  SELECT s.user_id, s.sid, CAST(count(*) AS BIGINT) AS n_inc_hours
         |  FROM sess s JOIN inc i
         |    ON i.hr BETWEEN s.s_start // $HourUs AND s.s_end // $HourUs
         |  GROUP BY 1, 2)
         |SELECT s.user_id, count(*) AS n_sessions,
         |  CAST(sum(CASE WHEN o.n_inc_hours IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_incident_sessions,
         |  CAST(sum(coalesce(o.n_inc_hours, 0)) AS BIGINT) AS sum_incident_hours
         |FROM sess s LEFT JOIN ov o ON s.user_id = o.user_id AND s.sid = o.sid
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_decayed_score" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) AS tus,
         |    CAST(round(value * pow(0.5,
         |      CAST((SELECT max(epoch_us(ts)) FROM events) - epoch_us(ts) AS DOUBLE)
         |        / $HalfLifeUs) * 1000000) AS BIGINT) AS du
         |  FROM events)
         |SELECT user_id, count(*) AS n_events,
         |  CAST(sum(du) AS BIGINT) AS decayed_units,
         |  CAST(sum(du) AS DOUBLE) / 1000000 AS decayed_score
         |FROM ev GROUP BY 1
         |ORDER BY decayed_units DESC, user_id LIMIT 20""".stripMargin,
    "ev_cohort_ltv" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) // $W24h AS day,
         |    CAST(round(value * 100) AS BIGINT) AS v_cents
         |  FROM events),
         |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
         |buys AS (SELECT user_id, day, v_cents FROM ev
         |         WHERE event_type = 'purchase')
         |SELECT cohort_day, b.day - c.cohort_day AS age_days,
         |  count(*) AS n_purchases,
         |  count(DISTINCT b.user_id) AS n_buyers,
         |  CAST(sum(v_cents) AS DOUBLE) / 100 AS revenue
         |FROM buys b JOIN cohort c ON b.user_id = c.user_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_user_features" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) // $W24h AS day,
         |    CAST(round(value * 100) AS BIGINT) AS v_cents
         |  FROM events),
         |s AS (
         |  SELECT user_id, count(*) AS n_events,
         |    count(DISTINCT day) AS n_active_days,
         |    count(DISTINCT event_type) AS n_types,
         |    CAST(sum(v_cents) AS BIGINT) AS value_cents,
         |    min(day) AS first_day, max(day) AS last_day
         |  FROM ev GROUP BY 1),
         |m AS (
         |  SELECT user_id, event_type AS top_type, cnt AS top_type_n FROM (
         |    SELECT user_id, event_type, count(*) AS cnt, row_number() OVER
         |      (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
         |    FROM ev GROUP BY 1, 2) WHERE rn = 1),
         |g AS (SELECT max(day) AS gmax_day FROM ev)
         |SELECT s.user_id, n_events, n_active_days, n_types, top_type,
         |  top_type_n, value_cents,
         |  last_day - first_day AS span_days,
         |  gmax_day - last_day AS idle_days
         |FROM s JOIN m ON s.user_id = m.user_id CROSS JOIN g
         |ORDER BY s.user_id""".stripMargin,
    "ev_dau_wau" ->
      s"""WITH du AS (
         |  SELECT DISTINCT epoch_us(ts) // $W24h AS day, user_id FROM events),
         |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
         |f AS (SELECT du.day + g.i AS day, du.user_id
         |      FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS i) g),
         |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM f GROUP BY day)
         |SELECT dau.day, dau.dau, wau.wau,
         |  round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
         |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "ev_cumulative_users" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS d0
        |  FROM events GROUP BY user_id),
        |d AS (SELECT d0 AS epoch_day, count(*) AS n_new FROM f GROUP BY d0)
        |SELECT epoch_day, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY epoch_day
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM d ORDER BY epoch_day""".stripMargin,
    "ev_sliding_window" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS tus FROM events),
        |x AS (SELECT event_type,
        |        unnest([tus // 1800000000, tus // 1800000000 - 1]) AS slot
        |      FROM e)
        |SELECT make_timestamp(slot * 1800000000) AS wstart,
        |  make_timestamp((slot + 2) * 1800000000) AS wend,
        |  event_type, count(*) AS cnt
        |FROM x GROUP BY 1, 2, 3 ORDER BY wstart, event_type""".stripMargin,
    "ev_markov_stationary" -> {
      val matCols = (for {
        i <- MarkovTypes; j <- MarkovTypes
      } yield s"CAST(coalesce(sum(CASE WHEN from_type = '$i' AND to_type = '$j' " +
        s"THEN n ELSE 0 END), 0) AS BIGINT) AS n_${i}_$j") ++
        MarkovTypes.map(i => s"CAST(coalesce(sum(CASE WHEN from_type = '$i' " +
          s"THEN n ELSE 0 END), 0) AS BIGINT) AS tot_$i")
      val pCols = markovPExprs("//")
      val carry = pCols.map(_.split(" AS ").last)
      val r0 = MarkovTypes.map(i => s"CAST(1000000 AS BIGINT) AS r_$i")
      val layers = (1 to MarkovRounds).map { k =>
        s"r$k AS MATERIALIZED (SELECT ${(markovLayer("//") ++ carry).mkString(", ")} FROM r${k - 1})"
      }.mkString(",\n")
      val totalR = MarkovTypes.map(i => s"r_$i").mkString(" + ")
      val outs = MarkovTypes.map { i =>
        s"SELECT '$i' AS event_type, CAST(CASE WHEN $totalR = 0 THEN 0 " +
          s"ELSE (r_$i * 1000000) // ($totalR) END AS BIGINT) " +
          s"AS stationary_ppm, tot_$i AS n_out FROM r$MarkovRounds"
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
         |x AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS to_type,
         |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS gap
         |  FROM e),
         |pairs AS (
         |  SELECT from_type, to_type, count(*) AS n
         |  FROM x WHERE to_type IS NOT NULL AND gap <= 1800000000 GROUP BY 1, 2),
         |mrow AS MATERIALIZED (SELECT ${matCols.mkString(", ")} FROM pairs),
         |r0 AS MATERIALIZED (
         |  SELECT ${(r0 ++ carry).mkString(", ")}
         |  FROM (SELECT ${pCols.mkString(", ")} FROM mrow)),
         |$layers
         |SELECT * FROM ($outs) ORDER BY event_type""".stripMargin
    },
    "ev_top_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS to_type,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS gap
        |  FROM e)
        |SELECT from_type, to_type, count(*) AS n
        |FROM x WHERE to_type IS NOT NULL AND gap <= 1800000000
        |GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type LIMIT 20""".stripMargin,
    "ev_funnel_time" ->
      s"""WITH $funnelStepsSql,
        |gaps AS (
        |  SELECT '1_view_to_click' AS hop, (t2 - t1k) // 60000000 AS m FROM c
        |  UNION ALL
        |  SELECT '2_click_to_purchase' AS hop, (t3 - t2k) // 60000000 AS m FROM p),
        |h AS (SELECT hop, m, CAST(count(*) AS BIGINT) AS cnt
        |      FROM gaps GROUP BY 1, 2),
        |cc AS (
        |  SELECT hop, m, cnt,
        |    sum(cnt) OVER (PARTITION BY hop ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM h),
        |t AS (SELECT hop, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1)
        |SELECT cc.hop, max(n) AS n_converted,
        |  min(CASE WHEN cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |           THEN m END) AS median_min,
        |  min(CASE WHEN cum - cnt < (9 * n + 9) // 10 AND (9 * n + 9) // 10 <= cum
        |           THEN m END) AS p90_min
        |FROM cc JOIN t USING (hop)
        |WHERE (cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum)
        |   OR (cum - cnt < (9 * n + 9) // 10 AND (9 * n + 9) // 10 <= cum)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The oracle is the PLAIN full aggregate — merged-refresh == full
    // recompute IS the MV-consistency contract under test.
    "ev_incr_hourly" ->
      """SELECT event_type, epoch_us(ts) // 3600000000 AS epoch_hour,
        |  count(*) AS cnt
        |FROM events
        |GROUP BY 1, 2 ORDER BY event_type, epoch_hour""".stripMargin,
    "ev_survival" ->
      """WITH days AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |u AS (SELECT user_id, min(day) AS d0, max(day) AS dl
        |      FROM days GROUP BY 1),
        |mx AS (SELECT max(day) AS md FROM days),
        |l AS (
        |  SELECT CASE WHEN md - dl >= 1 THEN dl - d0 ELSE md - d0 END AS t,
        |         CASE WHEN md - dl >= 1 THEN 1 ELSE 0 END AS ev
        |  FROM u CROSS JOIN mx),
        |g AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
        |             CAST(count(*) AS BIGINT) AS m
        |      FROM l GROUP BY 1),
        |nn AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM g),
        |r AS (
        |  SELECT t, d,
        |    n - coalesce(sum(m) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM g CROSS JOIN nn),
        |dth AS (
        |  SELECT t, n_risk, d, (n_risk - d) * 1000000000 // n_risk AS f
        |  FROM r WHERE d > 0),
        |one AS (
        |  SELECT list(t ORDER BY t) AS ts, list(n_risk ORDER BY t) AS ns,
        |         list(d ORDER BY t) AS ds, list(f ORDER BY t) AS fs
        |  FROM dth),
        |-- bounded unroll: <= 9999 distinct death times (>= 27 years of
        |-- daily horizons) — far above any corpus this gate sees; the
        |-- WHERE i <= len(ts) below keeps it exact inside the bound
        |idx AS (SELECT unnest(range(1, 10000)) AS i)
        |SELECT CAST(ts[i] AS BIGINT) AS t, CAST(ns[i] AS BIGINT) AS n_risk,
        |  CAST(ds[i] AS BIGINT) AS n_churn,
        |  round(CAST(list_reduce(
        |      list_prepend(CAST(1000000000 AS BIGINT), fs[1:i]),
        |      (acc, x) -> (acc * x) // 1000000000) AS DOUBLE)
        |    / 1000000000.0, 4) + 0.0 AS survival
        |FROM one CROSS JOIN idx
        |WHERE i <= len(ts)
        |ORDER BY t""".stripMargin,
    "ev_new_vs_returning" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
        |  FROM events),
        |f AS (SELECT user_id, min(d) AS first_d FROM du GROUP BY 1)
        |SELECT d,
        |  CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |  CAST(sum(CASE WHEN d = first_d THEN 0 ELSE 1 END) AS BIGINT) AS returning_users
        |FROM du JOIN f USING (user_id)
        |GROUP BY d ORDER BY d""".stripMargin,
    "stat_theil_sen" ->
      """WITH series AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT (b.x - a.x) * 1000000 // (b.d - a.d) AS s
        |  FROM series a JOIN series b ON b.d > a.d),
        |h AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_pairs FROM h),
        |cm AS (SELECT s, c, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum FROM h)
        |SELECT n_pairs, s AS slope_ppm
        |FROM cm CROSS JOIN n
        |WHERE cum >= (n_pairs + 1) // 2 AND cum - c < (n_pairs + 1) // 2""".stripMargin,
    "stat_runs_test" ->
      s"""WITH series AS (
         |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |h AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM series GROUP BY 1),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n_days FROM h),
         |cm AS (SELECT x, c, CAST(sum(c) OVER (ORDER BY x) AS BIGINT) AS cum FROM h),
         |med AS (SELECT x AS med FROM cm CROSS JOIN nn
         |        WHERE cum >= (n_days + 1) // 2 AND cum - c < (n_days + 1) // 2),
         |sg AS (SELECT d, CASE WHEN x > med THEN 1 ELSE 0 END AS s
         |       FROM series CROSS JOIN med WHERE x <> med),
         |l AS (SELECT s, lag(s) OVER (ORDER BY d) AS prev FROM sg),
         |m AS (SELECT CAST(sum(s) AS BIGINT) AS n1, CAST(sum(1 - s) AS BIGINT) AS n2,
         |  CAST(sum(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END) AS BIGINT) AS runs
         |  FROM l)
         |SELECT n1, n2, runs, $RunsZ
         |FROM m""".stripMargin,
    "ev_seasonality" ->
      """WITH g AS (
        |  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM g)
        |SELECT dow, hour, n, n * 1000000 // n_total AS share_ppm
        |FROM g CROSS JOIN t ORDER BY dow, hour""".stripMargin,
    "ev_entry_exit" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
        |s AS (
        |  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |                   OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s2 AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS sid
        |  FROM s),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, sid ORDER BY tus, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, sid ORDER BY tus DESC, event_id DESC) AS rn_d
        |  FROM s2),
        |b AS (
        |  SELECT user_id, sid,
        |    max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
        |    max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type
        |  FROM r WHERE rn_a = 1 OR rn_d = 1 GROUP BY 1, 2),
        |g AS (SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
        |      FROM b GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS n_total FROM g)
        |SELECT entry_type, exit_type, n_sessions,
        |  n_sessions * 1000000 // n_total AS share_ppm
        |FROM g CROSS JOIN t ORDER BY entry_type, exit_type""".stripMargin,
    "ev_bot_screen" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus, epoch_us(ts) // 3600000000 AS hour
        |  FROM events),
        |h AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS active_hours,
        |    CAST(max(c) AS BIGINT) AS max_hourly
        |  FROM (SELECT user_id, hour, count(*) AS c FROM e GROUP BY 1, 2)
        |  GROUP BY user_id),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    min(tus) AS first_tus, max(tus) AS last_tus
        |  FROM e GROUP BY user_id)
        |SELECT s.user_id, n_events, active_hours, max_hourly,
        |  CASE WHEN n_events > 1 THEN (last_tus - first_tus) // (n_events - 1)
        |       ELSE 0 END AS mean_gap_us,
        |  max_hourly * active_hours * 1000000 // n_events AS burst_ppm
        |FROM s JOIN h ON s.user_id = h.user_id
        |ORDER BY burst_ppm DESC, s.user_id LIMIT 20""".stripMargin,
    "ev_ab_test" ->
      s"""WITH $AbAccumSql
         |SELECT n_a, c_a, n_b, c_b,
         |  CASE WHEN n_a = 0 THEN 0 ELSE c_a * 1000000 // n_a END AS conv_a_ppm,
         |  CASE WHEN n_b = 0 THEN 0 ELSE c_b * 1000000 // n_b END AS conv_b_ppm,
         |  $AbTestZ2
         |FROM m""".stripMargin,
    // Sequential accounting: entries on the first active day,
    // conversions on the day of the first QUALIFYING purchase — day
    // d's llr sees exactly what was observable by day d.
    "stat_sprt" ->
      s"""WITH uu AS (
         |  SELECT user_id,
         |    min(epoch_us(ts) // 86400000000) AS d0,
         |    min(CASE WHEN $AbConvGate
         |        THEN epoch_us(ts) // 86400000000 END) AS dc,
         |    $AbArmSqlDuck AS arm
         |  FROM events GROUP BY user_id),
         |stacked AS (
         |  SELECT arm, d0 AS day, 1 AS n, 0 AS c FROM uu
         |  UNION ALL
         |  SELECT arm, dc AS day, 0 AS n, 1 AS c FROM uu WHERE dc IS NOT NULL),
         |daily AS (
         |  SELECT arm, day, CAST(sum(n) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS c
         |  FROM stacked GROUP BY 1, 2),
         |cum AS (
         |  SELECT arm, day,
         |    sum(n) OVER (PARTITION BY arm ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS n_users,
         |    sum(c) OVER (PARTITION BY arm ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS n_conv
         |  FROM daily),
         |l AS (
         |  SELECT arm, day, n_users, n_conv,
         |    n_conv * CAST($SprtL1 AS DOUBLE)
         |      + (n_users - n_conv) * CAST($SprtL2 AS DOUBLE) AS llr_raw
         |  FROM cum)
         |SELECT arm, day, CAST(n_users AS BIGINT) AS n_users,
         |  CAST(n_conv AS BIGINT) AS n_conv,
         |  round(llr_raw, 4) + 0.0 AS llr,
         |  CASE WHEN llr_raw >= CAST($SprtHi AS DOUBLE) THEN 'accept_h1'
         |       WHEN llr_raw <= CAST($SprtLo AS DOUBLE) THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM l ORDER BY arm, day""".stripMargin,
    "stat_wilson_ci" ->
      s"""WITH $AbAccumSql,
         |arms AS (
         |  SELECT 'A' AS arm, n_a AS n_users, c_a AS n_conv FROM m
         |  UNION ALL
         |  SELECT 'B' AS arm, n_b AS n_users, c_b AS n_conv FROM m),
         |t0 AS (SELECT arm, CAST(n_users AS BIGINT) AS n_users,
         |         CAST(n_conv AS BIGINT) AS n_conv,
         |         CAST(CASE WHEN n_users = 0 THEN 0
         |              ELSE n_conv * 1000000 // n_users END AS BIGINT) AS rate_ppm
         |       FROM arms),
         |t1 AS (SELECT ${WilsonLayers(0).mkString(",\n")} FROM t0),
         |t2 AS (SELECT ${WilsonLayers(1).mkString(",\n")} FROM t1)
         |SELECT ${WilsonLayers(2).mkString(",\n")} FROM t2
         |ORDER BY arm""".stripMargin,
    "stat_xi_corr" -> statXiCorrOracle,
    "stat_best_split" -> statBestSplitOracle,
    "stat_granger" -> {
      val layers = GrangerLayers.zipWithIndex.map { case (l, k) =>
        val from = if (k == 0) "m" else s"g${k - 1}"
        s"g$k AS MATERIALIZED (SELECT ${l.mkString(", ")} FROM $from)"
      }.mkString(",\n")
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS d,
         |    sum(CASE WHEN event_type = 'purchase'
         |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y,
         |    count(*) AS x
         |  FROM events GROUP BY 1),
         |t AS (
         |  SELECT y, x,
         |    lag(y) OVER (ORDER BY d) AS y1,
         |    lag(x) OVER (ORDER BY d) AS x1
         |  FROM daily),
         |m AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(y::HUGEINT) AS sy, sum(y::HUGEINT * y) AS syy,
         |    sum(y1::HUGEINT) AS s1, sum(y1::HUGEINT * y1) AS s11,
         |    sum(x1::HUGEINT) AS sx, sum(x1::HUGEINT * x1) AS sxx,
         |    sum(y::HUGEINT * y1) AS sy1, sum(y::HUGEINT * x1) AS syx,
         |    sum(y1::HUGEINT * x1) AS s1x
         |  FROM t WHERE y1 IS NOT NULL),
         |$layers
         |SELECT * FROM g${GrangerLayers.size - 1}""".stripMargin
    },
    "stat_autocorr" ->
      s"""WITH series AS (
         |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |l AS (SELECT x, lead(x) OVER (ORDER BY d) AS xn FROM series),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(x::HUGEINT) AS s, sum(x::HUGEINT * x) AS q,
         |    sum(CASE WHEN xn IS NULL THEN 0::HUGEINT ELSE x::HUGEINT * xn END) AS cxy,
         |    sum(CASE WHEN xn IS NULL THEN 0::HUGEINT ELSE x::HUGEINT END) AS sh,
         |    sum(CASE WHEN xn IS NULL THEN 0::HUGEINT ELSE xn::HUGEINT END) AS st
         |  FROM l)
         |SELECT ${AutocorrDerived.mkString(",\n")}
         |FROM m""".stripMargin,
    "stat_pacf" -> {
      val lagAccs = (1 to 3).map(k =>
        s"""sum(CASE WHEN x$k IS NULL THEN 0::HUGEINT ELSE x::HUGEINT * x$k END) AS c$k,
           |    sum(CASE WHEN x$k IS NULL THEN 0::HUGEINT ELSE x::HUGEINT END) AS sh$k,
           |    sum(CASE WHEN x$k IS NULL THEN 0::HUGEINT ELSE x$k::HUGEINT END) AS st$k,
           |    CAST(count(x$k) AS BIGINT) AS n$k""".stripMargin).mkString(",\n    ")
      s"""WITH series AS (
         |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |l AS (SELECT x, lead(x, 1) OVER (ORDER BY d) AS x1,
         |             lead(x, 2) OVER (ORDER BY d) AS x2,
         |             lead(x, 3) OVER (ORDER BY d) AS x3 FROM series),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(x::HUGEINT) AS s, sum(x::HUGEINT * x) AS q,
         |    $lagAccs
         |  FROM l),
         |t0 AS (SELECT ${PacfLayers(0).mkString(",\n")} FROM m),
         |t1 AS (SELECT ${PacfLayers(1).mkString(",\n")} FROM t0),
         |t2 AS (SELECT ${PacfLayers(2).mkString(",\n")} FROM t1),
         |t3 AS (SELECT ${PacfLayers(3).mkString(",\n")} FROM t2)
         |SELECT ${PacfLayers(4).mkString(",\n")} FROM t3""".stripMargin
    },
    "ev_repurchase_gaps" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT (tus - lag(tus) OVER w) // 86400000000 AS rawgap
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT least(rawgap, 30) AS gap_days, count(*) AS n
        |FROM g WHERE rawgap IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT user_id, tus, event_id,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |              OR tus - lag(tus) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |y AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |sess AS (SELECT user_id, sid, min(tus) AS s, max(tus) AS e
        |         FROM y GROUP BY 1, 2),
        |h AS (SELECT unnest(range(s // 3600000000, e // 3600000000 + 1)) AS epoch_hour
        |      FROM sess)
        |SELECT epoch_hour, count(*) AS n_concurrent
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_top_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3,
        |    lead(tus, 1) OVER w - tus AS g1,
        |    lead(tus, 2) OVER w - lead(tus, 1) OVER w AS g2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT step1, step2, step3, count(*) AS n
        |FROM x
        |WHERE step3 IS NOT NULL AND g1 <= 1800000000 AND g2 <= 1800000000
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    "ev_ewma" -> {
      val num = (0 to 7)
        .map(j => s"coalesce(l$j, 0) * ${1L << (7 - j)}").mkString(" + ")
      val den = (0 to 7)
        .map(j => s"CASE WHEN l$j IS NULL THEN 0 ELSE ${1L << (7 - j)} END")
        .mkString(" + ")
      val lags = (1 to 7)
        .map(j => s"lag(vq, $j) OVER w AS l$j").mkString(",\n|    ")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tus,
         |         CAST(round(value * 1000000) AS BIGINT) AS vq
         |  FROM events),
         |x AS (
         |  SELECT user_id, event_id, vq AS l0,
         |    $lags
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
         |SELECT user_id, event_id,
         |  round((CAST($num AS DOUBLE) / ($den)) / 1000000.0, 4) + 0.0 AS ewma
         |FROM x ORDER BY user_id, event_id""".stripMargin
    },
    "ev_attribution_multi" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
        |         CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id AS pid, tus AS ptus, vc,
        |         tus // 1800000000 AS bin
        |  FROM ev WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_id AS tid, event_type AS channel,
        |         tus AS ttus,
        |         unnest([tus // 1800000000, tus // 1800000000 + 1]) AS bin
        |  FROM ev WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT p.user_id, p.pid, p.ptus, p.vc, t.tid, t.channel, t.ttus
        |  FROM p JOIN t ON p.user_id = t.user_id AND p.bin = t.bin
        |  WHERE t.ttus > p.ptus - 1800000000 AND t.ttus < p.ptus),
        |r AS (
        |  SELECT *, count(*) OVER (PARTITION BY user_id, pid) AS k,
        |    CAST(row_number() OVER (PARTITION BY user_id, pid
        |                            ORDER BY ttus, tid) AS BIGINT) AS i
        |  FROM j),
        |c AS (
        |  SELECT channel,
        |    1000000 // k + CASE WHEN i = k THEN 1000000 % k ELSE 0 END
        |      AS credit_ppm,
        |    vc // k + CASE WHEN i = k THEN vc % k ELSE 0 END AS rc
        |  FROM r),
        |d AS (
        |  SELECT 'direct' AS channel, CAST(1000000 AS BIGINT) AS credit_ppm,
        |         vc AS rc
        |  FROM p WHERE NOT EXISTS (
        |    SELECT 1 FROM j WHERE j.user_id = p.user_id AND j.pid = p.pid)),
        |u AS (SELECT * FROM c UNION ALL SELECT * FROM d)
        |SELECT channel, count(*) AS n_credits,
        |  CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm,
        |  CAST(sum(rc) AS BIGINT) AS revenue_cents
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
        |         CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |x AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER w AS touch_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN tus END
        |      IGNORE NULLS) OVER w AS touch_tus
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN touch_tus IS NOT NULL AND tus - touch_tus <= 1800000000
        |            THEN touch_type ELSE 'direct' END AS source_type,
        |  count(*) AS conversions,
        |  CAST(sum(vc) AS BIGINT) AS revenue_cents
        |FROM x WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS n, sum(cnt) AS s, sum(cnt*cnt) AS ss
        |       FROM hourly GROUP BY 1)
        |SELECT event_type, h AS epoch_hour, cnt,
        |  CASE WHEN n*cnt - s > 0 THEN 'high' ELSE 'low' END AS dirn,
        |  CAST((n*cnt - s)*(n*cnt - s)*(n - 1) AS DOUBLE)
        |    / CAST((n*ss - s*s)*n AS DOUBLE) AS z_sq
        |FROM hourly JOIN st USING (event_type)
        |WHERE n >= 2 AND n*ss - s*s > 0
        |  AND (n*cnt - s)*(n*cnt - s)*(n - 1) >= 4*n*(n*ss - s*s)
        |ORDER BY event_type, epoch_hour""".stripMargin,
    "ev_rolling_hll" -> {
      val h8 = (1 to 8)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH du AS (
         |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
         |h AS (SELECT d, $h8 AS h FROM du),
         |b AS (SELECT d, h // 67108864 AS bucket, h % 67108864 AS w FROM h),
         |rk AS (SELECT d, bucket,
         |         CASE WHEN w = 0 THEN 27 ELSE 27 - length(bin(w)) END AS rho
         |       FROM b),
         |reg AS (SELECT d, bucket, max(rho) AS r FROM rk GROUP BY 1, 2),
         |grid AS (SELECT d, unnest(range(0, 64)) AS bucket
         |         FROM (SELECT DISTINCT d FROM du)),
         |rolled AS (
         |  SELECT g.d, g.bucket,
         |    max(r) OVER (PARTITION BY g.bucket ORDER BY g.d
         |                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rr
         |  FROM grid g LEFT JOIN reg ON reg.d = g.d AND reg.bucket = g.bucket),
         |gday AS (SELECT d, CAST(count(rr) AS BIGINT) AS present,
         |           sum(pow(CAST(2 AS DOUBLE), -rr)) AS sp
         |         FROM rolled GROUP BY 1)
         |SELECT d AS day,
         |  round(${graft.operators.Relational.HllEstExpr}, 3) AS est_users_7d,
         |  present
         |FROM gday ORDER BY day""".stripMargin
    },
    "ev_anomaly_mad" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |cr AS (SELECT event_type, h, cnt,
        |         row_number() OVER (PARTITION BY event_type ORDER BY cnt, h) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS nn
        |       FROM hourly),
        |med AS (SELECT event_type, cnt AS med FROM cr WHERE rn = (nn + 1) // 2),
        |wm AS (SELECT hourly.event_type, h, cnt, med, abs(cnt - med) AS ad
        |       FROM hourly JOIN med USING (event_type)),
        |ar AS (SELECT event_type, ad,
        |         row_number() OVER (PARTITION BY event_type ORDER BY ad, h) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS nn
        |       FROM wm),
        |mad AS (SELECT event_type, ad AS mad FROM ar WHERE rn = (nn + 1) // 2)
        |SELECT wm.event_type, h AS epoch_hour, cnt, med, mad
        |FROM wm JOIN mad USING (event_type)
        |WHERE ad > mad * 3
        |ORDER BY event_type, epoch_hour""".stripMargin,
    "stat_changepoint" ->
      """WITH series AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x::HUGEINT) AS s
        |        FROM series),
        |c AS (SELECT d, row_number() OVER (ORDER BY d) AS k,
        |        sum(x::HUGEINT) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS l
        |      FROM series),
        |g AS (SELECT d, k, n - k AS nr, l, s - l AS r, n, s
        |      FROM c CROSS JOIN tot WHERE k < n),
        |e AS (SELECT d, k, nr,
        |        CAST(l * l * nr * n + r * r * k * n - s * s * k * nr AS DOUBLE)
        |          / CAST(k * nr * n AS DOUBLE) AS gain,
        |        l * 1000000 // k AS mean_left_ppm,
        |        r * 1000000 // nr AS mean_right_ppm
        |      FROM g)
        |SELECT d AS split_day, CAST(k AS BIGINT) AS n_left,
        |  CAST(nr AS BIGINT) AS n_right,
        |  CAST(mean_left_ppm AS BIGINT) AS mean_left_ppm,
        |  CAST(mean_right_ppm AS BIGINT) AS mean_right_ppm,
        |  round(gain, 4) + 0.0 AS gain
        |-- argmax on the RAW gain inside the subquery (ORDER BY in the
        |-- outer select would bind to the rounded output alias — SQL
        |-- resolves ORDER BY against select aliases first — while the
        |-- Spark op orders on the unrounded gain before limit(1))
        |FROM (SELECT * FROM e ORDER BY gain DESC, d ASC LIMIT 1)""".stripMargin,
    "ev_gap_fill" ->
      """WITH hrs AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
        |  FROM hrs GROUP BY event_type)
        |SELECT g.event_type, g.h AS epoch_hour,
        |  CAST(coalesce(cnt, 0) AS BIGINT) AS cnt
        |FROM grid g LEFT JOIN hrs USING (event_type, h)
        |ORDER BY event_type, epoch_hour""".stripMargin,
    "ev_moving_stats" ->
      """WITH daily AS (
        |  SELECT user_id,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INTEGER) AS d,
        |         count(*) AS n_day
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, d, n_day,
        |  CAST(sum(n_day) OVER (PARTITION BY user_id ORDER BY d
        |       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM daily ORDER BY user_id, d""".stripMargin,
    "ev_range_join" ->
      s"""SELECT c.user_id, c.event_id,
         |  (SELECT count(*) FROM events v
         |   WHERE v.event_type = 'view' AND v.user_id = c.user_id
         |     AND epoch_us(v.ts) >= epoch_us(c.ts) - $W24h
         |     AND epoch_us(v.ts) < epoch_us(c.ts)) AS n_prior_views
         |FROM events c WHERE c.event_type = 'click'
         |ORDER BY user_id, event_id""".stripMargin,
    "ev_funnel" ->
      s"""WITH $funnelStepsSql,
         |u AS (SELECT DISTINCT user_id FROM ev)
         |SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
         |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS steps,
         |       count(*) AS n_users
         |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
         |       LEFT JOIN p USING (user_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS d0 FROM days GROUP BY 1),
        |j AS (
        |  SELECT user_id, d0 AS cohort_day,
        |         CAST(date_diff('day', d0, d) AS INTEGER) AS day_offset
        |  FROM days JOIN coh USING (user_id))
        |SELECT cohort_day, day_offset,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j WHERE day_offset <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_growth_accounting" -> (evGrowthAccounting(_, _)),
    "ev_session_native" -> (evSessionNative(_, _)),
    "ev_segment_engagement" -> (evSegmentEngagement(_, _)),
    "qc_cross_system" -> (qcCrossSystem(_, _)),
    "ev_pareto_curve" -> (evParetoCurve(_, _)),
    "ev_cuped" -> (evCuped(_, _)),
    "ev_did" -> (evDid(_, _)),
    "stat_rate_test" -> (statRateTest(_, _)),
    "stat_dispersion" -> (statDispersion(_, _)),
    "stat_nb_fit" -> (statNbFit(_, _)),
    "ev_uplift_deciles" -> (evUpliftDeciles(_, _)),
    "ev_capture_recapture" -> (evCaptureRecapture(_, _)),
    "ev_range_join" -> (evRangeJoin(_, _)),
    "ev_gap_fill" -> (evGapFill(_, _)),
    "ev_funnel" -> (evFunnel(_, _)),
    "ev_retention" -> (evRetention(_, _)),
    "ev_moving_stats" -> (evMovingStats(_, _)),
    "ev_anomaly" -> (evAnomaly(_, _)),
    "ev_anomaly_mad" -> (evAnomalyMad(_, _)),
    "ev_rolling_hll" -> (evRollingHll(_, _)),
    "stat_changepoint" -> (statChangepoint(_, _)),
    "ev_sliding_window" -> (evSlidingWindow(_, _)),
    "ev_top_transitions" -> (evTopTransitions(_, _)),
    "ev_markov_stationary" -> (evMarkovStationary(_, _)),
    "ev_top_paths" -> (evTopPaths(_, _)),
    "ev_concurrency" -> (evConcurrency(_, _)),
    "ev_repurchase_gaps" -> (evRepurchaseGaps(_, _)),
    "stat_autocorr" -> (statAutocorr(_, _)),
    "stat_granger" -> (statGranger(_, _)),
    "stat_xi_corr" -> (statXiCorr(_, _)),
    "stat_best_split" -> (statBestSplit(_, _)),
    "stat_pacf" -> (statPacf(_, _)),
    "ev_ab_test" -> (evAbTest(_, _)),
    "stat_wilson_ci" -> (statWilsonCi(_, _)),
    "stat_sprt" -> (statSprt(_, _)),
    "ev_seasonality" -> (evSeasonality(_, _)),
    "stat_theil_sen" -> (statTheilSen(_, _)),
    "ev_new_vs_returning" -> (evNewVsReturning(_, _)),
    "stat_runs_test" -> (statRunsTest(_, _)),
    "ev_bot_screen" -> (evBotScreen(_, _)),
    "ev_entry_exit" -> (evEntryExit(_, _)),
    "ev_survival" -> (evSurvival(_, _)),
    "ev_incr_hourly" -> (evIncrHourly(_, _)),
    "ev_funnel_time" -> (evFunnelTime(_, _)),
    "ev_ewma" -> (evEwma(_, _)),
    "ev_ohlc_bars" -> (evOhlcBars(_, _)),
    "ev_drawdown" -> (evDrawdown(_, _)),
    "ev_seasonal_naive" -> (evSeasonalNaive(_, _)),
    "stat_holt_forecast" -> (statHoltForecast(_, _)),
    "stat_forecast_eval" -> (statForecastEval(_, _)),
    "stat_seasonal_decompose" -> (statSeasonalDecompose(_, _)),
    "ev_user_overlap" -> (evUserOverlap(_, _)),
    "stat_srm_check" -> (statSrmCheck(_, _)),
    "qc_sequence_check" -> (qcSequenceCheck(_, _)),
    "stat_cusum" -> (statCusum(_, _)),
    "stat_power_mde" -> (statPowerMde(_, _)),
    "ev_attribution" -> (evAttribution(_, _)),
    "ev_attribution_multi" -> (evAttributionMulti(_, _)),
    "ev_cumulative_users" -> (evCumulativeUsers(_, _)),
    "ev_dau_wau" -> (evDauWau(_, _)),
    "ev_user_features" -> (evUserFeatures(_, _)),
    "ev_cohort_ltv" -> (evCohortLtv(_, _)),
    "ev_decayed_score" -> (evDecayedScore(_, _)),
    "ev_interval_overlap" -> (evIntervalOverlap(_, _)),
    "ev_streak" -> (evStreak(_, _)),
  )
}
