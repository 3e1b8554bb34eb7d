package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity-search pipeline operators (SURVEY.md §2.5).
  *
  * Vector math is expressed with `zip_with`/`aggregate` higher-order
  * functions (codegen'd, no UDF, no collect). Both engines compute the
  * dot product as a sequential left-fold over DOUBLE-cast elements so
  * cross-engine drift is sub-ulp; outputs are rounded to 4 decimals and
  * ordered by the rounded value with a unique tiebreak.
  *
  * Scale posture: brute-force top-k is the correctness baseline (a
  * single pass + TakeOrderedAndProject, no shuffle of the corpus);
  * the ANN variant blocks by a sign-LSH bucket so each probe touches
  * ~corpus/2^bits vectors, and the bucket id is the shuffle key.
  */
object SimilarityOps {

  /** Sequential-fold cosine between two array<float> columns (Spark). */
  def cosExprSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)" +
      s" / (sqrt(aggregate($a, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))" +
      s" * sqrt(aggregate($b, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"

  /** Same cosine in DuckDB SQL (DOUBLE[] casts force double math). */
  def cosExprSql(a: String, b: String): String =
    s"(list_dot_product($a::DOUBLE[], $b::DOUBLE[])" +
      s" / (sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[]))" +
      s" * sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))))"

  /** Sign-LSH bucket over the first `bits` dims (Spark; 1-based element_at). */
  def bucketExprSpark(bits: Int): String =
    (0 until bits)
      .map(i => s"(CASE WHEN element_at(embedding, ${i + 1}) > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")

  /** Same bucket in DuckDB SQL (1-based list indexing). */
  def bucketExprSql(bits: Int, col: String = "embedding"): String =
    (0 until bits)
      .map(i => s"(CASE WHEN $col[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")

  /** Brute-force cosine top-k against the vec_id=0 query vector. The
    * query vector rides in as a broadcast single-row join (no collect). */
  def simTopkCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(expr(cosExprSpark("embedding", "qv")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(10)
  }

  /** ANN: probe only the query vector's sign-LSH bucket, then rank. */
  def simAnnBucket(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"), expr(bucketExprSpark(4)).as("bkt"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("bkt").as("qb"))
    emb.filter(col("vec_id") =!= 0)
      .join(broadcast(q), col("bkt") === col("qb"))
      .select(col("vec_id"), round(expr(cosExprSpark("embedding", "qv")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(10)
  }

  /** Distributed per-label centroid (vector mean via posexplode). */
  def embCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"), col("col").cast("double").as("v"))
      .groupBy("label", "dim")
      .agg(round(avg("v"), 4).as("avg_v"))
      .orderBy("label", "dim")

  val oracles: Map[String, String] = Map(
    "sim_topk_cosine" ->
      s"""WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosExprSql("embedding", "q")}, 4) AS cos_sim
         |FROM embeddings, qv WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "sim_ann_bucket" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${bucketExprSql(4)} AS bkt FROM embeddings),
         |qv AS (SELECT embedding AS q, bkt AS qb FROM b WHERE vec_id = 0)
         |SELECT vec_id, round(${cosExprSql("embedding", "q")}, 4) AS cos_sim
         |FROM b, qv WHERE vec_id <> 0 AND bkt = qb
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "emb_centroids" ->
      """SELECT label, CAST(t.dim AS INTEGER) AS dim,
        | round(avg(embedding[t.dim + 1]::DOUBLE), 4) AS avg_v
        |FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) t
        |GROUP BY label, t.dim ORDER BY label, dim""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_cosine" -> (simTopkCosine(_, _)),
    "sim_ann_bucket" -> (simAnnBucket(_, _)),
    "emb_centroids" -> (embCentroids(_, _)),
  )
}
