package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory.
  *
  * Settings chosen for the 100 TB posture (AQE on, skew-join handling,
  * partial aggregation pushdown) while staying correct on local[N]:
  * shuffle partitions are sized to the executor-thread count locally;
  * on a real cluster these come from dynamic AQE coalescing anyway.
  */
object GraftSession {
  def local(threads: Int = 4, appName: String = "graft",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession
      .builder()
      .withExtensions(new GraftExtensions()(_))
      .appName(appName)
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as long nanos and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The driver's parquet stamps timestamps isAdjustedToUTC=false.
      // Read them as plain TimestampType, not TIMESTAMP_NTZ: with the
      // session pinned to UTC the epoch-micros are bit-identical to the
      // DuckDB oracle's naive reading, filters stay bare-attribute (so
      // they push to the scan), and every downstream unix_micros /
      // window() call keeps its TimestampType contract.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // InferFiltersFromGenerate clones the generator's child expression
      // into a pushed-down Filter; for our shingle pipelines that inlines
      // the whole tokenize+shingle tree (higher-order funcs, interpreted,
      // no subexpression elimination) into a per-row predicate — measured
      // ~20x slowdown on explode-heavy dedup queries. The inferred filter
      // only skips empty/null arrays, which our data doesn't contain.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // Keep bucketed scans bucketed: the planner's "disable when no
      // downstream operator needs the distribution" heuristic ALSO
      // forfeits bucket-filter pruning (a probe with `aid IN (...)` on a
      // bucketed index read all 8 buckets, SelectedBucketsCount absent).
      // Our bucketed tables exist precisely for co-located joins and
      // pruned index probes, so the heuristic only ever costs us.
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // Let single-file-per-bucket sorted tables report their ordering
      // so SMJs over the bucketed fact layout skip the re-sort as well
      // as the exchange. The non-legacy default drops the ordering
      // claim entirely; the legacy path still verifies <=1 file per
      // bucket before claiming it, so a multi-file bucket degrades to
      // a sort, never to wrong results. Our bucketed writers
      // repartition on the bucket key first precisely to hit the
      // single-file case.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
    val spark = extraConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
