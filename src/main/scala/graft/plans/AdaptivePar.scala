package graft.plans

import org.apache.spark.sql.SparkSession

/** Scale-adaptive partition widths for explicit repartitions (r12,
  * guide §2: "make partitioning scale-adaptive — derive from input
  * size — rather than a constant tuned for either local mode or the
  * cluster").
  *
  * Every iterative loop and CPU-spread pass here used
  * `defaultParallelism` as its repartition width — correct on a busy
  * cluster, but a CONSTANT: at bench scale a 32-way exchange puts a
  * few dozen rows in each task, and the per-task fixed cost (closure +
  * SerializableConfiguration deserialization, accumulator bookkeeping,
  * scheduling) dwarfs the row work. Thread-dump sampling during the
  * r12 baseline showed exactly that — loop stages with 32 one-blink
  * tasks whose executorRunTime was ~90% task plumbing — and the
  * control experiment (same queries at SPARK_GRAFT_CPUS=8 vs 32) ran
  * the graph loop family EQUAL-OR-FASTER on a quarter of the cores.
  *
  * The width here derives from the driving table's on-disk bytes:
  *   width = clamp(ceil(bytes / perTaskBytes), 1, defaultParallelism)
  * - deterministic per dataset (file lengths; no extra Spark job, no
  *   sampled statistics), so executed plans stay boot-stable;
  * - capped at defaultParallelism, so at production scale the widths
  *   are EXACTLY what the constant gave — behavior at 100 TB is
  *   unchanged, only the small-input end stops paying full-cluster
  *   task counts (AQE cannot do this for us: these are explicit
  *   repartitions, which AQE coalescing deliberately honors, and the
  *   spread passes exist precisely because their cost is per-row CPU
  *   that bytes-based coalescing cannot see).
  */
object AdaptivePar {

  /** Loop-state / co-partitioned edge width: sized so a bench-scale
    * graph loop runs single-digit tasks per round while anything
    * ≥ ~64 MB of driving input saturates a 32-thread box. */
  val LoopBytesPerTask: Long = 2L * 1024 * 1024

  /** CPU-spread width for interpreted/codec per-row passes (IVF anchor
    * scoring, image decode loops): the driving tables are narrow
    * (ids, 64-dim vectors), so a small byte budget per task keeps the
    * per-row CPU spread wide even though the bytes are tiny. */
  val SpreadBytesPerTask: Long = 64L * 1024

  /** Row-expansion width (bootstrap replicates, multi-distinct
    * Expand): input rows multiply 5-50× downstream of the exchange,
    * so budget fewer input bytes per task than the loop tier. */
  val ExpandBytesPerTask: Long = 128L * 1024

  /** Stateful-stream shuffle width per staged-source byte: every
    * shuffle partition of a stateful operator is a STATE STORE
    * instance paying per-batch snapshot/commit/maintenance files in
    * the checkpoint, so a width-32 micro-batch over a few MB of
    * staged replay is almost entirely store plumbing (measured: the
    * gated stream family ran 1.7× faster at local[4] than local[32]
    * on identical data). Capped at defaultParallelism as always — a
    * production-volume source derives the full cluster width. */
  val StreamBytesPerTask: Long = 256L * 1024

  /** On-disk bytes of an arbitrary path (file or directory tree);
    * -1 (→ defaultParallelism fallback) when unreadable. */
  def pathBytes(spark: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => -1L }

  def forBytes(spark: SparkSession, bytes: Long, perTaskBytes: Long): Int = {
    val par = spark.sparkContext.defaultParallelism
    if (bytes <= 0) par
    else math.max(1L, math.min(par.toLong,
      (bytes + perTaskBytes - 1) / perTaskBytes)).toInt
  }

  /** On-disk length of `dir/name.parquet` (file or directory tree) —
    * a pure filesystem metadata read, never a Spark job. Unreadable →
    * -1, which [[forBytes]] maps to the defaultParallelism fallback
    * (the pre-r12 constant). */
  def tableBytes(spark: SparkSession, dir: String, name: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => -1L }

  def forTable(spark: SparkSession, dir: String, name: String,
      perTaskBytes: Long): Int =
    forBytes(spark, tableBytes(spark, dir, name), perTaskBytes)
}
