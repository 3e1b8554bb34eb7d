package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Trust rules (VERDICT r1 §4): results materialize through the `noop`
  * sink (a `.count()` lets Catalyst prune unevaluated projections, so
  * map-heavy queries would time as no-ops); a warmup query absorbs
  * first-query session/codegen cost so per-query numbers are
  * attributable; failures are captured per query as `"err"` entries and
  * flip `"ok"` to false — never silently timed as their time-to-crash.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core: the brief's bench contract is local[32] on
    // the 32-thread driver machine, and an unset SPARK_GRAFT_CPUS must
    // not quietly quarter the executor threads.
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    // Shuffle-file removal is async by default (the ContextCleaner posts
    // a non-blocking delete when a shuffle dependency is GC'd), so a
    // 52-query run can accumulate dead shuffle state faster than the
    // cleaner drains it (VERDICT r2 finding #1: driver-run totals ~3x
    // the attributable cost). Blocking shuffle cleanup makes the
    // teardown in materialize() — unpersist + GC — synchronous end to
    // end: when a query's timer starts, the previous query's blocks,
    // broadcasts AND shuffle files are actually gone.
    val spark = GraftSession.local(cpus, "graft-bench",
      Map("spark.cleaner.referenceTracking.blocking.shuffle" -> "true"))

    def materialize(name: String): Either[String, Double] = {
      // Untimed cross-query state teardown (VERDICT r2 finding #1: the
      // driver's 52-query run showed ~3x aggregate inflation vs isolated
      // runs). Three layers, all deterministic rather than waiting on
      // the async ContextCleaner:
      //  1. unpersist every persistent RDD synchronously — frees the
      //     localCheckpoint blocks queries leave behind (components,
      //     minhash) instead of letting them squeeze unified execution
      //     memory for the rest of the suite;
      //  2. drop any cached relations (none expected — defensive);
      //  3. GC so the cleaner also reaps shuffle files and broadcast
      //     blocks whose owners just became unreachable.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
    }

    // Warmup: absorb session init + codegen + parquet footer reads for
    // each table family (fact scan, text+regexp+explode, vector math)
    // so per-query numbers attribute work, not first-touch JIT.
    Seq("q02_filter_project", "mr_wordcount", "sim_topk_cosine")
      .foreach(materialize)

    // Optional args narrow the run to the named queries (local iteration).
    val names =
      if (args.nonEmpty) args.toSeq.filter(SparkEntry.queries.contains).sorted
      else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> materialize(n))

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // Millisecond precision: sub-ms digits are timer noise and the
    // driver keeps only the TAIL of the build log — BENCH_r03's 3.5 KB
    // line lost its leading '{"metric":"total",...' to the cut, leaving
    // no machine-readable total (VERDICT r3 finding #5). Shorter line +
    // a file copy make the artifact truncation-proof.
    def fmt(sec: Double): String = (math.rint(sec * 1000) / 1000).toString
    val qs = results.map {
      case (k, Right(sec)) => s"${jstr(k)}:${fmt(sec)}"
      case (k, Left(err))  => s"${jstr(k)}:-1"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val nFail = results.count(_._2.isLeft)
    val total = results.collect { case (_, Right(s)) => s }.sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$nFail,"errors":$errs,"sf":${jstr(sfDir)}}"""
    // BENCH_LOCAL.json is the AUTHORITATIVE full-loop artifact (VERDICT
    // r4 #7) — a subset iteration run must not clobber it (an r6 `git
    // add -A` briefly committed a one-query file over the official
    // line before this guard existed).
    if (args.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (line + "\n").getBytes("UTF-8"))
    println(line)
    // Session-close cleanup: drop the session-keyed IVF index tables
    // (catalog entries + files) this run registered — the accumulation
    // guard ADVICE r4 asked for.
    graft.operators.SimilarityOps.dropIvfIndexes(spark)
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
