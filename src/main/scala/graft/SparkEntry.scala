package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's `queries` (Spark impl) and
  * `oracles` (DuckDB-equivalent SQL). Invariant: each oracle key has a
  * queries entry with identical output column names (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++
      EventOps.queries ++ GraphOps.queries ++ SkewOps.queries ++
      graft.sources.Formats.queries ++ graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ MultimodalOps.oracles ++
      EventOps.oracles ++ GraphOps.oracles ++ SkewOps.oracles ++
      graft.sources.Formats.oracles ++ graft.streaming.StreamOps.oracles
}
