package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Relational, SimilarityOps, TextOps}

/** Mathematical invariants of the statistical/linear-algebra operators
  * — identities that must hold for ANY input, complementing the
  * oracle's value equality (which pins one corpus) with structural
  * guarantees (which pin the math).
  */
class StatSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("Mann-Whitney U satisfies the U1 + U2 = n1*n2 identity") {
    // U2 derives from the same accumulators with the groups swapped;
    // the identity holds exactly because ranks are exact integers.
    val r = Relational.statMannWhitney(spark, sf).collect().head
    val (n1, n2, u1) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    // u1 is (r1_2 - n1(n1+1))/2 rounded to 4dp — reconstruct U2 via the
    // rank-sum complement: R1 + R2 = N(N+1)/2 (2x units).
    val n = n1 + n2
    val u2 = (n * (n + 1) / 2.0 - n1 * (n1 + 1) / 2.0 - u1) - n2 * (n2 + 1) / 2.0
    assert(math.abs(u1 + u2 - n1.toDouble * n2) < 1e-6,
      s"U1=$u1 U2=$u2 n1*n2=${n1 * n2}")
  }

  test("bootstrap CI brackets the full-sample mean and is ordered") {
    val r = Relational.statBootstrapCi(spark, sf).collect().head
    val (mean, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(lo <= hi, s"lo=$lo hi=$hi")
    // Poisson-bootstrap replicate means concentrate around the sample
    // mean; the 90% interval must contain it on any non-degenerate corpus.
    assert(lo <= mean && mean <= hi, s"mean=$mean outside [$lo, $hi]")
  }

  test("chi-square and Cramer's V are non-negative and V is in [0,1]") {
    val r = TextOps.statChi2(spark, sf).collect().head
    val chi2 = r.getDouble(3)
    val v = r.getDouble(4)
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0, s"cramers_v=$v")
  }

  test("Welch t-test dof lies between min(n)-1 and n1+n2-2") {
    val r = Relational.statTtest(spark, sf).collect().head
    val (n1, n2, dof) = (r.getLong(0), r.getLong(1), r.getDouble(4))
    assert(dof >= math.min(n1, n2) - 1.0 && dof <= n1 + n2 - 2.0,
      s"dof=$dof n1=$n1 n2=$n2")
  }

  test("OLS: token count regresses on chars with positive slope, r2 in (0.5, 1]") {
    // Token count is chars/(avg word len + 1) plus bounded per-doc
    // noise for any text generator, so each language's fit must slope
    // up and explain most of the variance (measured ~0.995 here);
    // r2 <= 1 is the structural bound.
    val rows = Relational.statLinreg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (slope, r2) = (r.getDouble(2), r.getDouble(4))
      assert(slope > 0.0, s"slope=$slope for lang ${r.getString(0)}")
      assert(r2 > 0.5 && r2 <= 1.0, s"r2=$r2 for lang ${r.getString(0)}")
    }
  }

  test("Spearman rho is in [-1,1] and strongly positive for chars vs tokens") {
    val r = Relational.statSpearman(spark, sf).collect().head
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0, s"rho=$rho")
    assert(rho > 0.5, s"rho=$rho — near-monotone pair not ranked as such")
  }

  test("lag-1 autocorrelation lies in [-1,1]") {
    // Cauchy-Schwarz bounds the lag-1 estimator for any series; the
    // synthetic daily counts are ~independent so no sign is pinned.
    val r = EventOps.statAutocorr(spark, sf).collect().head
    val r1 = r.getDouble(1)
    assert(r1 >= -1.0 && r1 <= 1.0, s"r1=$r1")
  }

  test("top eigenvector is unit-norm, dominant, and var_share in (0,1]") {
    val rows = SimilarityOps.embTopEigvec(spark, sf).collect()
    assert(rows.length == 64)
    val norm2 = rows.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"norm^2=$norm2")
    val eig = rows.head.getDouble(2)
    val share = rows.head.getDouble(3)
    assert(share > 0.0 && share <= 1.0, s"var_share=$share")
    // The dominant eigenvalue is >= the average eigenvalue tr(C)/64,
    // i.e. share >= 1/64.
    assert(share >= 1.0 / 64 - 1e-9, s"var_share=$share below isotropic floor")
  }

  test("Benford ppm shares sum to ~1e6 on both sides") {
    val rows = Relational.qcBenford(spark, sf).collect()
    val obs = rows.map(_.getLong(2)).sum
    val exp = rows.map(_.getLong(3)).sum
    // obs uses floor division (9 buckets) — within 9 ppm of a million;
    // the Benford expectations themselves round to ~1e6.
    assert(math.abs(obs - 1000000L) <= 9, s"obs ppm sum=$obs")
    assert(math.abs(exp - 1000000L) <= 9, s"exp ppm sum=$exp")
  }

  test("KS statistic is a valid sup-distance in [0,1]") {
    val r = Relational.statKsTest(spark, sf).collect().head
    val d = r.getDouble(2)
    assert(d >= 0.0 && d <= 1.0, s"ks_d=$d")
  }

  test("survival curve is non-increasing within (0,1] with shrinking risk sets") {
    val rows = EventOps.evSurvival(spark, sf).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getDouble(3))
    assert(surv.forall(s => s > 0.0 && s <= 1.0), surv.mkString(","))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a },
      s"survival not monotone: ${surv.mkString(",")}")
    val risk = rows.map(_.getLong(1))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
      s"risk sets not strictly shrinking: ${risk.mkString(",")}")
  }

  test("hourly concurrency equals the sum of session hour spans") {
    val conc = EventOps.evConcurrency(spark, sf).collect()
      .map(_.getLong(1)).sum
    // Re-derive the total from the SAME sessionization rule but
    // summing spans directly instead of exploding hour rows — this
    // checks the explode/count half of the operator (each session
    // contributes exactly end_hour − start_hour + 1 rows), NOT the
    // session boundaries themselves (those share the rule below and
    // are pinned against DuckDB by the oracle gate).
    val ev = Tables(spark, sf).events
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = ev
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("is_new",
        when(lag("tus", 1).over(w).isNull
          || col("tus") - lag("tus", 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum("is_new").over(cum))
      .groupBy("user_id", "sid")
      .agg(expr("max(tus) div 3600000000 - min(tus) div 3600000000 + 1").as("span"))
      .agg(sum("span")).collect().head.getLong(0)
    assert(conc == total, s"concurrency sum $conc != session-hour total $total")
  }

  test("Theil-Sen pair count is C(days, 2) and the slope is rank-central") {
    val r = EventOps.statTheilSen(spark, sf).collect().head
    val (nPairs, slope) = (r.getLong(0), r.getLong(1))
    import org.apache.spark.sql.functions._
    val days = Tables(spark, sf).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().count()
    assert(nPairs == days * (days - 1) / 2, s"pairs=$nPairs days=$days")
    // Median rank test via an independent recount: at least half the
    // pairwise slopes are <= the reported slope, and fewer than half
    // are strictly below it (the lower-median contract).
    val series = Tables(spark, sf).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
    val a = series.select(col("d").as("d1"), col("x").as("x1"))
    val b = series.select(col("d").as("d2"), col("x").as("x2"))
    // Conditional sums, not filters: a filter over the projected slope
    // would be pushed below the inequality join condition and evaluate
    // the division on d2 == d1 pairs (ANSI divide-by-zero).
    val cnt = a.join(org.apache.spark.sql.functions.broadcast(b),
        col("d2") > col("d1"))
      .select(expr("(x2 - x1) * 1000000 div (d2 - d1)").as("s"))
      .agg(sum(when(col("s") <= slope, 1L).otherwise(0L)).as("le"),
        sum(when(col("s") < slope, 1L).otherwise(0L)).as("lt"))
      .collect().head
    val (le, lt) = (cnt.getLong(0), cnt.getLong(1))
    val k = (nPairs + 1) / 2
    assert(le >= k && lt < k, s"le=$le lt=$lt k=$k")
  }

  test("runs test: counts partition the off-median days, R in [1, n]") {
    val r = EventOps.statRunsTest(spark, sf).collect().head
    val (n1, n2, runs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    import org.apache.spark.sql.functions._
    val days = Tables(spark, sf).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().count()
    // ties (days exactly at the median) are dropped, so n1+n2 <= days;
    // at least one day sits at the lower median by construction.
    assert(n1 + n2 < days && n1 + n2 > 0, s"n1=$n1 n2=$n2 days=$days")
    assert(runs >= 1 && runs <= n1 + n2, s"runs=$runs")
    // a sign change needs both signs present
    if (n1 == 0 || n2 == 0) assert(runs == 1)
  }

  test("A/B readout: arms partition the users, rates bounded, z2 >= 0") {
    val r = EventOps.evAbTest(spark, sf).collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (pa, pb, z2) = (r.getLong(4), r.getLong(5), r.getDouble(6))
    val users = Tables(spark, sf).events
      .select("user_id").distinct().count()
    assert(na + nb == users, s"arms ${na + nb} != users $users")
    assert(ca <= na && cb <= nb)
    assert(pa >= 0 && pa <= 1000000 && pb >= 0 && pb <= 1000000)
    assert(z2 >= 0.0, s"z2=$z2")
  }

  test("quantile-bin sketch: lower-edge estimate within one bin width below exact") {
    val rows = Relational.aggQuantileBins(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(50, 90, 99))
    // bin width from the corpus bounds the estimator error by construction
    val h = Tables(spark, sf).lineitem
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) AS c")
      .agg(org.apache.spark.sql.functions.expr("max(c) - min(c) + 1").as("span"))
      .collect().head.getLong(0)
    val width = h / 1024 + 1
    rows.foreach { r =>
      val err = r.getLong(3)
      // est is the bin's LOWER edge, so it can only undershoot
      assert(err <= 0 && -err <= width, s"q=${r.getInt(0)} err=$err width=$width")
    }
  }

  test("skyline: no output point dominates another, and none is dominated by any input") {
    import org.apache.spark.sql.functions._
    val sky = Relational.q43Skyline(spark, sf).collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getLong(1)))
    // pairwise non-dominance within the frontier
    for (a <- sky; b <- sky if a != b)
      assert(!(b._1 >= a._1 && b._2 <= a._2 && (b._1 > a._1 || b._2 < a._2)),
        s"$b dominates $a inside the frontier")
    // frontier membership: no input point strictly dominates a frontier point
    val pts = Tables(spark, sf).orders.select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"),
      expr("unix_micros(o_orderdate) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (a <- sky)
      assert(!pts.exists(b => b._1 >= a._1 && b._2 <= a._2 &&
        (b._1 > a._1 || b._2 < a._2)), s"input dominates frontier point $a")
    assert(sky.nonEmpty)
  }

  test("Brown-Forsythe W is non-negative and finite with k>=2 groups") {
    val r = Relational.statLevene(spark, sf).collect().head
    val (k, n, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(k >= 2 && n > k, s"k=$k n=$n")
    assert(w >= 0.0 && !w.isNaN && !w.isInfinite, s"w_stat=$w")
  }

  test("multi-touch attribution conserves credit and revenue exactly") {
    // The remainder-to-latest-touch split must make per-purchase
    // credit sum to exactly 1e6 ppm and credited revenue to exactly
    // the purchase's cents — so the channel rollup totals equal the
    // direct purchase totals bit-for-bit (no FP, no leakage).
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    val out = EventOps.evAttributionMulti(spark, sf).collect()
    val creditSum = out.map(_.getAs[Long]("credit_ppm")).sum
    val revSum = out.map(_.getAs[Long]("revenue_cents")).sum
    val p = Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)),
        sum(expr("CAST(round(value * 100) AS BIGINT)"))).first()
    assert(creditSum == 1000000L * p.getLong(0),
      s"credit $creditSum != 1e6 * ${p.getLong(0)}")
    assert(revSum == p.getLong(1), s"revenue $revSum != ${p.getLong(1)}")
  }

  test("Kendall tau-b is bounded, sign-agrees with Spearman, and pair mass closes") {
    val k = Relational.statKendallTau(spark, sf).collect().head
    val (n, cc, dd, tau) =
      (k.getLong(0), k.getLong(1), k.getLong(2), k.getDouble(3))
    assert(tau >= -1.0 && tau <= 1.0, s"tau_b=$tau")
    // C + D can never exceed the total pair count n(n-1)/2 (ties eat
    // the remainder) — the cell-join must not double-count a pair.
    assert(cc + dd <= n * (n - 1) / 2, s"C+D=${cc + dd} > pairs")
    // chars↔tokens is a strongly increasing relation on any text
    // corpus: both rank correlations must agree on direction.
    val rho = Relational.statSpearman(spark, sf).collect().head.getDouble(1)
    assert(math.signum(tau) == math.signum(rho) && tau > 0,
      s"tau=$tau rho=$rho")
  }

  test("BH discoveries form a prefix of the p-ranked list and respect the step-up rule") {
    val rows = Relational.statFdrBh(spark, sf).collect()
    val m = rows.length
    val byK = rows.sortBy(_.getAs[Long]("k"))
    val disc = byK.map(_.getAs[Int]("discovered"))
    // Discoveries are exactly ranks 1..k* — never a gap (the step-up
    // definition rejects ALL hypotheses up to the largest passing rank).
    val kStar = disc.count(_ == 1)
    assert(disc.take(kStar).forall(_ == 1) && disc.drop(kStar).forall(_ == 0),
      s"discoveries not a prefix: ${disc.mkString(",")}")
    // The boundary rank itself must satisfy p_k*·m <= α·k* (exact
    // integer form), and every rank past k* must fail it.
    val pk = byK.map(_.getAs[Long]("p_ppm"))
    if (kStar > 0)
      assert(pk(kStar - 1) * m <= 50000L * kStar,
        s"k*=$kStar violates its own threshold")
    ((kStar + 1) to m).foreach { j =>
      assert(pk(j - 1) * m > 50000L * j, s"rank $j passes but undiscovered")
    }
  }

  test("IQR fences: quartiles ordered, outliers a strict minority in every group") {
    val rows = Relational.qcIqrOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, q1, q3) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (lo, hi) = (r.getLong(4), r.getLong(5))
      assert(q1 <= q3, s"q1=$q1 > q3=$q3")
      // At least the inter-quartile half of the mass is inside the
      // fences by construction (fences lie outside [q1, q3]).
      assert(lo + hi <= n / 2, s"outliers $lo+$hi exceed half of n=$n")
    }
  }

  test("CUPED: variance reduction is a valid rho^2 and theta is finite") {
    val r = EventOps.evCuped(spark, sf).collect().head
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val (theta, dRaw, dAdj, vr) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(na > 1 && nb > 1)
    assert(!theta.isNaN && !theta.isInfinite)
    assert(vr >= 0.0 && vr <= 1.0, s"var_reduction=$vr")
    assert(!dRaw.isNaN && !dAdj.isNaN)
  }

  test("TOST: z_low always exceeds z_high and the flag matches both one-sided gates") {
    val r = Relational.statTost(spark, sf).collect().head
    val (zl, zh, eq) = (r.getDouble(3), r.getDouble(4), r.getInt(5))
    // The +δ shift can only raise the statistic: z_low > z_high for any δ > 0.
    assert(zl > zh, s"z_low=$zl z_high=$zh")
    assert(eq == 0 || eq == 1)
    // Away from the rounding boundary the flag must agree with the
    // reported z's (the flag itself compares the unrounded chain).
    if (zl > 1.646 && zh < -1.646) assert(eq == 1, s"zl=$zl zh=$zh but eq=0")
    if (zl < 1.644 || zh > -1.644) assert(eq == 0, s"zl=$zl zh=$zh but eq=1")
  }

  test("DiD closes its own identity and the arms partition the users") {
    import org.apache.spark.sql.functions.countDistinct
    val r = EventOps.evDid(spark, sf).collect().head
    val (nc, nt) = (r.getLong(0), r.getLong(1))
    val (preC, postC, preT, postT, did) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(math.abs(did - ((postT - preT) - (postC - preC))) < 5e-4,
      s"did=$did vs parts")
    val users = Tables(spark, sf).events
      .agg(countDistinct("user_id")).first().getLong(0)
    assert(nc + nt == users, s"$nc + $nt != $users")
  }

  test("uplift deciles are balanced, exhaustive, and lift closes exactly") {
    import org.apache.spark.sql.functions.countDistinct
    val rows = EventOps.evUpliftDeciles(spark, sf).collect()
    assert(rows.length == 10)
    val sizes = rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
    assert(sizes.max - sizes.min <= 1, s"ntile imbalance: ${sizes.mkString(",")}")
    val users = Tables(spark, sf).events
      .agg(countDistinct("user_id")).first().getLong(0)
    assert(sizes.sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("lift_ppm") ==
        r.getAs[Long]("conv_b_ppm") - r.getAs[Long]("conv_a_ppm"))
    }
  }

  test("capture-recapture: overlap bounded, Chapman estimate sane vs the true count") {
    val r = EventOps.evCaptureRecapture(spark, sf).collect().head
    val (n1, n2, m, nTrue, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(m <= math.min(n1, n2), s"overlap $m exceeds a window count")
    assert(n1 <= nTrue && n2 <= nTrue)
    // Chapman is consistent when captures are independent; on this
    // dense corpus it must land within a factor of 2 of the truth.
    assert(est >= nTrue / 2 && est <= nTrue * 2, s"est=$est true=$nTrue")
  }

  test("DP release: noise matches an independent JVM Laplace inverse-CDF replay") {
    val rows = TextOps.qcDpCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, n) = (r.getString(0), r.getLong(1))
      val (noise, noisy) = (r.getDouble(2), r.getDouble(3))
      // Reimplement the mechanism from scratch (MessageDigest, not
      // Spark) — the release must be exactly the keyed inverse CDF.
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(lang.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h.toDouble + 0.5) / 4294967296.0
      val expect =
        if (u < 0.5) 2.0 * math.log(2.0 * u)
        else -2.0 * math.log(2.0 * (1.0 - u))
      assert(math.abs(noise - expect) < 5e-5, s"$lang: $noise vs $expect")
      assert(math.abs(noisy - (n + expect)) < 5e-4)
    }
    // Keyed draws must differ across groups (a constant noise column
    // would be a broken hash plumbing, not a mechanism).
    assert(rows.map(_.getDouble(2)).distinct.length == rows.length)
  }

  test("rate test: z sign follows the count delta and the ratio is exact integer ppm") {
    val r = EventOps.statRateTest(spark, sf).collect().head
    val (n1, n2, ratio, z) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(n1 > 0 && n2 > 0)
    assert(ratio == n2 * 1000000L / n1)
    assert(math.signum(z) == math.signum((n2 - n1).toDouble),
      s"z=$z for $n1 -> $n2")
  }

  test("dispersion index closes var/mean and user activity is overdispersed") {
    val rows = EventOps.statDispersion(spark, sf).collect()
    assert(rows.nonEmpty)
    val nu = rows.map(_.getAs[Long]("n_users")).distinct
    assert(nu.length == 1, "population differs across types")
    rows.foreach { r =>
      val (mean, v, d) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mean > 0 && v >= 0)
      assert(math.abs(d - v / mean) < 2e-3, s"D=$d vs ${v / mean}")
    }
  }

  test("epoch plan: budget conserved exactly, 4-epoch cap, full/partial/zero in rank order") {
    val rows = TextOps.mixEpochPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = rows.map(_.getAs[Long]("toks_total"))
    val take = rows.map(_.getAs[Long]("take_tokens"))
    val epochs = rows.map(_.getAs[Long]("epochs_ppm"))
    // Budget = 3×corpus < 4×corpus capacity, so the greedy fill must
    // spend it EXACTLY — no token leaks at the cap/partial boundary.
    assert(take.sum == 3 * toks.sum, s"${take.sum} != ${3 * toks.sum}")
    assert(epochs.forall(_ <= 4000000L), "epoch cap violated")
    // In quality-rank order: a prefix at the full 4 epochs, at most
    // one partial source, then zeros — the greedy structure itself.
    val kinds = rows.indices.map { i =>
      if (take(i) == 4 * toks(i)) 'F' else if (take(i) == 0L) 'Z' else 'P'
    }.mkString
    assert("^F*P?Z*$".r.matches(kinds), s"fill pattern broken: $kinds")
  }

  test("skew profile: quantiles ordered, hot-key share exact, salt recommendation sane") {
    val rows = graft.operators.SkewOps.qcSkewProfile(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (nKeys, nRows, maxRows) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (top1, p50, p99, salt) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(8))
      assert(p50 <= p99 && p99 <= maxRows, s"$p50 <= $p99 <= $maxRows")
      assert(top1 == maxRows * 1000000L / nRows)
      // S ≈ hot-rows / avg-rows-per-key, and never below 1.
      assert(salt >= 1 && salt <= maxRows, s"salt=$salt")
      assert(nKeys <= nRows)
    }
  }

  test("malformed CSV: rejects captured, clean rows conserved, none double-counted") {
    import org.apache.spark.sql.functions.{count, lit}
    val r = graft.sources.Formats.srcCsvMalformed(spark, sf).collect().head
    val (good, bad, keySum) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val n = Tables(spark, sf).nation.agg(count(lit(1))).first().getLong(0)
    assert(bad > 0, "corruption rule produced no rejects")
    assert(good + bad == n, s"$good + $bad != $n rows")
    assert(keySum > 0)
  }

  test("schema evolution surfaces the pre-column generation as NULLs, losing no rows") {
    import org.apache.spark.sql.functions.{count, lit}
    val rows = graft.sources.Formats.srcSchemaEvolution(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val missing = rows.map(_.getAs[Long]("n_missing_bal")).sum
    val nCust = Tables(spark, sf).customer.agg(count(lit(1))).first().getLong(0)
    assert(total == nCust, s"merged read lost rows: $total != $nCust")
    // Both generations must actually be present for the evolution to
    // be exercised (even-key rows predate the column).
    assert(missing > 0 && missing < total, s"missing=$missing total=$total")
  }

  test("HLL sweep rows share one exact count and sit in the 5-sigma band per m") {
    val rows = Relational.aggHllSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(4, 6, 8))
    assert(rows.map(_._3).distinct.length == 1, "exact count differs across p")
    rows.foreach { case (p, m, exact, est) =>
      // Standard HLL relative error is ~1.04/sqrt(m); the fixture is
      // deterministic so this is a fixed property of the hash, not a
      // flaky statistical assertion.
      val band = 5.0 * 1.04 / math.sqrt(m.toDouble)
      assert(math.abs(est / exact - 1.0) <= band,
        s"p=$p est=$est exact=$exact outside ±$band")
    }
  }

  test("growth accounting satisfies the ledger identity on every interior day") {
    // churned(d) + retained(d) = DAU(d-1): everyone active yesterday
    // either came back (retained today) or did not (churned, attributed
    // to today). Also new+retained+resurrected = DAU(d).
    import org.apache.spark.sql.functions._
    val dau = Tables(spark, sf).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .distinct().groupBy("d").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = EventOps.evGrowthAccounting(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val maxd = dau.keys.max
    rows.foreach { case (d, (nw, ret, res, chu)) =>
      assert(nw + ret + res == dau.getOrElse(d, 0L), s"day $d DAU split")
      if (d > dau.keys.min && d <= maxd)
        assert(chu + ret == dau.getOrElse(d - 1, 0L),
          s"day $d ledger: churned=$chu retained=$ret dau(d-1)=${dau.get(d - 1)}")
    }
    assert(rows.values.map(_._4).sum > 0, "no churn observed — fixture degenerate")
  }

  test("AUC matches the independent O(n^2) concordant-pair definition") {
    // AUC = P(score_pos > score_neg) + P(tie)/2 — count pairs directly
    // from the raw (score, label) rows and compare with the query's
    // rank-sum form (two formulations agreeing is the stronger check,
    // the q43_skyline move).
    import org.apache.spark.sql.functions._
    val base = Tables(spark, sf).documents
      .select(col("n_chars"), expr(TextOps.tokensExpr).as("tk"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("alpha"))
      .select(size(col("tk")).as("s"),
        when(col("n_chars").between(100, 5000) && size(col("tk")) >= 20 &&
          expr("CAST(alpha AS DOUBLE) / n_chars") >= 0.6, 1).otherwise(0).as("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val pos = base.filter(_._2 == 1).map(_._1)
    val neg = base.filter(_._2 == 0).map(_._1)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expected = num / (pos.length.toDouble * neg.length)
    val r = TextOps.statAuc(spark, sf).collect().head
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    assert(math.abs(r.getDouble(2) - expected) < 1e-5,
      s"query auc=${r.getDouble(2)} brute=$expected")
  }

  test("calibration bins partition the corpus and rates are probabilities") {
    import org.apache.spark.sql.functions.{count, lit}
    val rows = TextOps.statCalibration(spark, sf).collect()
    val n = Tables(spark, sf).documents.agg(count(lit(1))).first().getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n, "bins lost docs")
    rows.foreach { r =>
      val (nd, np, rate) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"), r.getAs[Double]("pass_rate"))
      assert(np >= 0 && np <= nd)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("class metrics marginals reconcile with the confusion matrix") {
    val conf = TextOps.txtLangConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val m = TextOps.statClassMetrics(spark, sf).collect()
    val n = conf.map(_._3).sum
    // Σ(tp+fn) over classes = N (every labeled doc is in exactly one
    // class row), and per class tp+fp = column total, tp+fn = row total.
    assert(m.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum == n)
    m.foreach { r =>
      val cls = r.getString(0)
      val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"))
      assert(tp + fp == conf.filter(_._2 == cls).map(_._3).sum, s"$cls col")
      assert(tp + fn == conf.filter(_._1 == cls).map(_._3).sum, s"$cls row")
      Seq("prec", "rec", "f1").foreach { c =>
        val v = r.getAs[java.lang.Double](c)
        if (v != null) assert(v >= 0.0 && v <= 1.0, s"$cls.$c=$v")
      }
    }
  }

  test("Cohen's kappa re-derives from the confusion matrix rows") {
    val conf = TextOps.txtLangConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = conf.map(_._3).sum.toDouble
    val agree = conf.filter(c => c._1 == c._2).map(_._3).sum.toDouble
    val classes = (conf.map(_._1) ++ conf.map(_._2)).distinct
    val peNum = classes.map { c =>
      conf.filter(_._1 == c).map(_._3).sum.toDouble *
        conf.filter(_._2 == c).map(_._3).sum
    }.sum
    val expected = (n * agree - peNum) / (n * n - peNum)
    val r = TextOps.statCohensKappa(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") == n.toLong)
    assert(math.abs(r.getAs[Double]("kappa") - expected) < 1e-5,
      s"query=${r.getAs[Double]("kappa")} direct=$expected")
    // kappa <= po <= 1 when pe > 0 (chance correction only shrinks).
    assert(r.getAs[Double]("kappa") <= r.getAs[Double]("po") + 1e-9)
  }

  test("McNemar 2x2 cells partition the corpus; chi2 uses only discordants") {
    import org.apache.spark.sql.functions.{count, lit}
    val r = TextOps.statMcnemar(spark, sf).collect().head
    val n = Tables(spark, sf).documents.agg(count(lit(1))).first().getLong(0)
    val (both, a, b, nei) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(both + a + b + nei == n, "cells do not partition")
    val chi2 = r.getAs[java.lang.Double]("mcnemar_chi2")
    if (a + b > 0) {
      val d = a.toDouble - b
      assert(math.abs(chi2 - d * d / (a + b)) < 1e-4)
    } else assert(chi2 == null)
  }

  test("shard plan deals every source round-robin to within one document") {
    val rows = TextOps.mixShardPlan(spark, sf).collect()
    // Exact balance is the op's contract (hash-mod only promises it in
    // expectation): within each source, per-shard doc counts differ by
    // at most 1, and they sum back to the source's corpus.
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val docs = Tables(spark, sf).documents
    val srcTotals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, cells) =>
      val counts = cells.map(_.getAs[Long]("n_docs"))
      assert(counts.max - counts.min <= 1,
        s"$src shard counts ${counts.mkString(",")} not balanced")
      assert(counts.sum == srcTotals(src),
        s"$src shards hold ${counts.sum} of ${srcTotals(src)} docs")
    }
  }

  test("MAD anomaly flags match an independent median/MAD recomputation") {
    import org.apache.spark.sql.functions.{col, count, expr, lit}
    val hourly = Tables(spark, sf).events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val med = lowerMedian(rows.map(_._3).toSeq)
      val mad = lowerMedian(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.toSeq.filter(r => math.abs(r._3 - med) > 3 * mad)
        .map(r => (t, r._2, r._3, med, mad))
    }.toSet
    val got = EventOps.evAnomalyMad(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected,
      s"flag sets differ: extra=${got -- expected} missing=${expected -- got}")
  }

  test("changepoint maximizes the between-segment gain over all splits") {
    import org.apache.spark.sql.functions.{col, count, expr, lit}
    val xs = Tables(spark, sf).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = xs.length.toLong
    val s = xs.map(_._2).sum.toDouble
    val best = (1L until n).map { k =>
      val l = xs.take(k.toInt).map(_._2).sum.toDouble
      val r = s - l
      (xs(k.toInt - 1)._1, l * l / k + r * r / (n - k) - s * s / n)
    }.maxBy { case (d, g) => (g, -d) }
    val row = EventOps.statChangepoint(spark, sf).collect().head
    assert(row.getLong(0) == best._1,
      s"split day ${row.getLong(0)} != brute-force ${best._1}")
    // The query's exact-integer gain and the float brute force agree
    // to float tolerance.
    assert(math.abs(row.getDouble(5) - best._2) < 1e-2 * math.max(1.0, best._2),
      s"gain ${row.getDouble(5)} vs brute ${best._2}")
  }

  test("BPE train: round 1 equals the single-step kernel's top pair; merges stay distinct") {
    val merges = TextOps.txtBpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.length == 6, s"expected 6 rounds, got ${merges.length}")
    assert(merges.map(m => (m._2, m._3)).distinct.length == merges.length,
      "a pair was merged twice")
    // Round 1 is definitionally the char-pair kernel's argmax: the
    // standalone txt_bpe_merge top row must agree (same count, and the
    // pair concatenation matches).
    val kernelTop = TextOps.txtBpeMerge(spark, sf).collect().head
    val r1 = merges.head
    assert(r1._2 + r1._3 == kernelTop.getString(0) && r1._4 == kernelTop.getLong(1),
      s"round 1 ${r1} != kernel top ${kernelTop}")
    // Counts are positive and round 1 is the global maximum (later
    // rounds can only see counts <= the first argmax).
    assert(merges.forall(_._4 > 0) && merges.forall(_._4 <= r1._4))
    // EVERY round re-derived by an independent LIST-based BPE reference
    // (symbol arrays + greedy left-to-right scan — not string replace),
    // so a rewrite-mechanics bug shared by both engines' replace()
    // formulations cannot hide behind oracle parity.
    def applyMerge(sy: List[String], a: String, b: String): List[String] =
      sy match {
        case x :: y :: rest if x == a && y == b =>
          (a + b) :: applyMerge(rest, a, b)
        case x :: rest => x :: applyMerge(rest, a, b)
        case Nil => Nil
      }
    var vocab = Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(TextOps.tokensExpr)).as("t"))
      .groupBy("t").count().collect()
      .map(r => (r.getString(0).split("").toList, r.getLong(1)))
    merges.foreach { case (round, l, rt, c) =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sy, n) =>
        sy.zip(sy.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val best = counts.toSeq.minBy { case ((a, b), n) => (-n, s"$a $b") }
      assert((best._1._1, best._1._2, best._2) == ((l, rt, c)),
        s"round $round: op chose ($l, $rt, $c), reference says $best")
      vocab = vocab.map { case (sy, n) => (applyMerge(sy, l, rt), n) }
    }
  }

  test("NB fit parameters invert back to the measured moments") {
    val rows = EventOps.statNbFit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, v) = (r.getDouble(2), r.getDouble(3))
      val fit = r.getString(4)
      if (fit == "negative_binomial") {
        val (nr, np) = (r.getDouble(5), r.getDouble(6))
        // NB(r, p) with p = r/(r+m): mean = r(1-p)/p and
        // var = mean + mean^2/r — the moment equations must invert.
        val meanBack = nr * (1 - np) / np
        assert(math.abs(meanBack - m) < 1e-2, s"mean $meanBack vs $m")
        val varBack = m + m * m / nr
        assert(math.abs(varBack - v) < 1e-2, s"var $varBack vs $v")
        assert(v > m, "negative_binomial verdict requires overdispersion")
      } else {
        assert(fit == "poisson_like" && r.isNullAt(5) && r.isNullAt(6))
        assert(v <= m + 1e-9, s"poisson_like verdict with v=$v > m=$m")
      }
    }
  }

  test("drawdown row equals the brute-force running-peak recomputation") {
    import org.apache.spark.sql.functions.{col, expr}
    val daily = Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        expr("CAST(round(value * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var peak = Long.MinValue
    var best = (0L, 0L, 0L, -1L)
    daily.foreach { case (d, rev) =>
      peak = math.max(peak, rev)
      if (peak - rev > best._4) best = (d, rev, peak, peak - rev)
    }
    val got = EventOps.evDrawdown(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) == best,
      s"op ${got.mkString(",")} vs brute $best")
  }

  test("SPRT: day-d statistic sees only what was observable by day d") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = EventOps.statSprt(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
    assert(rows.map(_._1).toSet == Set("A", "B"))
    // Independent sequential reference: per user, entry day and the day
    // of the first qualifying purchase; day-d counts accumulate ONLY
    // events at or before d (the lookahead the r5 review caught would
    // fail this on any user converting after their entry day).
    val evs = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), col("value"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    def arm(uid: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (Integer.parseInt(h.substring(0, 4), 16) % 2 == 0) "A" else "B"
    }
    val perUser = evs.groupBy(_._1).map { case (uid, es) =>
      val d0 = es.map(_._4).min
      val dc = es.filter(e => e._2 == "purchase" && e._3 > 150).map(_._4)
        .sorted.headOption
      (arm(uid), d0, dc)
    }.toSeq
    val (l1, l2) = (math.log(0.45 / 0.30), math.log(0.55 / 0.70))
    val (hi, lo) = (math.log(0.95 / 0.05), math.log(0.05 / 0.95))
    rows.foreach { case (a, day, n, c, llr, decision) =>
      val users = perUser.filter(_._1 == a)
      val expN = users.count(_._2 <= day).toLong
      val expC = users.count(_._3.exists(_ <= day)).toLong
      assert((n, c) == ((expN, expC)),
        s"arm $a day $day: counts ($n, $c) vs observable ($expN, $expC)")
      val raw = c * l1 + (n - c) * l2
      assert(math.abs(llr - raw) < 1e-3, s"llr $llr vs recomputed $raw")
      val expect =
        if (raw >= hi) "accept_h1" else if (raw <= lo) "accept_h0" else "continue"
      assert(decision == expect, s"decision $decision vs $expect at llr $raw")
    }
  }

  test("Wilson intervals bracket each arm's rate inside [0, 1]") {
    val rows = EventOps.statWilsonCi(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("A", "B"))
    rows.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      val (lo, hi) = (r.getDouble(4), r.getDouble(5))
      val p = c.toDouble / n
      assert(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"bounds [$lo, $hi]")
      // The Wilson interval always contains the point estimate.
      assert(lo <= p && p <= hi, s"p=$p outside [$lo, $hi]")
      // And it is informative: strictly narrower than the trivial [0,1].
      assert(hi - lo < 1.0, s"width ${hi - lo}")
    }
  }

  test("rolling HLL tracks the exact 7-day distinct within sketch error") {
    import org.apache.spark.sql.functions.{col, expr}
    val pairs = Tables(spark, sf).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = pairs.map(_._1).distinct.sorted
    val exact = days.map(d =>
      d -> pairs.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.length)
      .toMap
    val got = EventOps.evRollingHll(spark, sf).collect()
    assert(got.length == days.length, "one row per active day")
    got.foreach { r =>
      val (d, est, present) = (r.getLong(0), r.getDouble(1), r.getLong(2))
      assert(present >= 1 && present <= 64, s"present=$present")
      val ex = exact(d)
      // m=64 gives ~13% standard error; small daily cardinalities sit
      // mostly in the bias-corrected linear-counting branch, so allow a
      // generous but still-informative envelope.
      assert(est > 0.4 * ex && est < 1.6 * ex,
        s"day $d: est $est vs exact $ex out of envelope")
    }
  }

  test("Markov stationary: type domain matches, shares close to a distribution, near-fixpoint") {
    import org.apache.spark.sql.functions.{col => c}
    // The one-row unroll names columns from MarkovTypes — a generator
    // that grew or renamed a type must fail HERE, not silently drop
    // its transitions from the matrix.
    val live = Tables(spark, sf).events
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(live.toSeq == EventOps.MarkovTypes,
      s"event-type domain drifted: ${live.mkString(",")}")
    val rows = EventOps.evMarkovStationary(spark, sf).collect()
    assert(rows.length == EventOps.MarkovTypes.size)
    val shares = rows.map(_.getLong(1))
    shares.foreach(s => assert(s >= 0 && s <= 1000000L, s"share $s"))
    // Renormalized integer shares can only lose sub-ppm mass to the
    // five truncating divisions.
    assert(shares.sum >= 1000000L - 5 && shares.sum <= 1000000L,
      s"shares sum ${shares.sum}")
    // Near-fixpoint: a dominant type exists (the chain is not the
    // uniform init any more) and every type retains some mass on this
    // strongly-connected domain.
    assert(shares.max > 1000000L / EventOps.MarkovTypes.size)
    assert(shares.min > 0, "a type lost all stationary mass")
    val touched = rows.map(_.getLong(2)).sum
    assert(touched > 0, "no transitions counted")
  }

  test("effect size: Cliff's delta matches a brute-force dominance recount") {
    import org.apache.spark.sql.functions.{col => c, expr => e}
    val r = Relational.statEffectSize(spark, sf).collect().head
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val (d, delta) = (r.getDouble(2), r.getDouble(3))
    assert(delta >= -1.0 && delta <= 1.0 && !d.isNaN)
    // Independent O(n1*n2) recount on the raw cents values.
    val vals = Tables(spark, sf).orders
      .filter(c("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(c("o_orderpriority").as("g"),
        e("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .collect().map(row => (row.getString(0), row.getLong(1)))
    val a = vals.filter(_._1 == "1-URGENT").map(_._2)
    val b = vals.filter(_._1 == "5-LOW").map(_._2)
    assert(a.length == n1 && b.length == n2)
    var gt = 0L; var lt = 0L
    for (x <- a; y <- b) { if (x > y) gt += 1 else if (x < y) lt += 1 }
    val exact = (gt - lt).toDouble / (n1.toDouble * n2)
    // Same HALF_UP rounding as Spark's round() — math.rint is
    // half-to-even and can disagree by 1e-4 on a .5 boundary (second
    // review pass, r6).
    val rounded = BigDecimal(exact)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(delta - rounded) < 1e-9,
      s"delta $delta != recount $exact")
  }

  test("Granger: nested-model invariants hold and coefficients match an independent OLS recount") {
    import org.apache.spark.sql.functions.{col => c, expr => e}
    val r = EventOps.statGranger(spark, sf).collect().head
    val (n, ar, cross) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val f = r.getDouble(3)
    assert(n >= 10, s"too few days: $n")
    // RSS_full <= RSS_restricted for nested models <=> F >= 0.
    assert(f >= 0.0, s"negative F: $f")
    // Independent recount: solve the full-model normal equations from
    // the raw daily series with plain driver-side algebra.
    val daily = Tables(spark, sf).events
      .select(e("unix_micros(ts) div 86400000000").as("d"),
        e("CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END").as("v"))
      .groupBy("d")
      .agg(e("sum(v)").as("y"), e("count(1)").as("x"))
      .orderBy("d").collect()
      .map(row => (row.getLong(1).toDouble, row.getLong(2).toDouble))
    val trips = daily.sliding(2).map { case Array((y1, x1), (y, _)) => (y, y1, x1) }.toArray
    assert(trips.length == n)
    val nn = trips.length.toDouble
    def mean(g: ((Double, Double, Double)) => Double) = trips.map(g).sum / nn
    val (my, m1, mx) = (mean(_._1), mean(_._2), mean(_._3))
    def cov(a: ((Double, Double, Double)) => Double, ma: Double,
        b: ((Double, Double, Double)) => Double, mb: Double) =
      trips.map(t => (a(t) - ma) * (b(t) - mb)).sum
    val (s11, sxx, s1x) = (cov(_._2, m1, _._2, m1), cov(_._3, mx, _._3, mx), cov(_._2, m1, _._3, mx))
    val (sy1, syx) = (cov(_._1, my, _._2, m1), cov(_._1, my, _._3, mx))
    val det = s11 * sxx - s1x * s1x
    val bf = (sy1 * sxx - syx * s1x) / det
    val cf = (s11 * syx - s1x * sy1) / det
    assert(math.abs(ar - bf) < 5e-4, s"ar_coef $ar != recount $bf")
    assert(math.abs(cross - cf) < math.max(5e-4, math.abs(cf) * 1e-3),
      s"cross_coef $cross != recount $cf")
  }

  test("whitening: the whitened covariance is the identity within quantization") {
    val rows = SimilarityOps.embWhitening(spark, sf).collect()
    assert(rows.length == 36, s"expected the 8x8 upper triangle, got ${rows.length}")
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      if (i == j) assert(math.abs(c - 1.0) <= 0.01, s"diag ($i,$i) = $c")
      else assert(math.abs(c) <= 0.01, s"offdiag ($i,$j) = $c")
    }
  }

  test("PACF: lag-1 partial equals r1 and all lags are valid correlations") {
    val r = EventOps.statPacf(spark, sf).collect().head
    val (r1, p1, p2, p3) = (r.getAs[Double]("r1"), r.getAs[Double]("pacf1"),
      r.getAs[Double]("pacf2"), r.getAs[Double]("pacf3"))
    assert(p1 == r1, s"pacf1=$p1 != r1=$r1")
    Seq(p1, p2, p3).foreach(p =>
      assert(p >= -1.0 && p <= 1.0 && !p.isNaN, s"pacf out of range: $p"))
  }
}
