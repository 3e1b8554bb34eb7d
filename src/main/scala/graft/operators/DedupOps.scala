package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps.{tokensExpr, tokensSql}

/** Deduplication pipeline operators (SURVEY.md §2.4).
  *
  * All variants follow the same scale posture: explode → shuffle on a
  * uniform synthetic key (shingle / band-signature / bucket) → join only
  * within buckets. Nothing here is O(n²) in the corpus; candidate
  * verification touches only pairs that share at least one bucket. At
  * 100 TB the band-bucket join keys are (band_id, min_signature) which
  * distribute uniformly by construction; a document-frequency cap on
  * shingles (not needed at test SF, noted inline) bounds worst-case
  * bucket skew.
  *
  * Cross-engine parity: md5 is the only hash (Spark murmur3 != DuckDB
  * hash); Jaccard is exact integer division; signatures are min() over
  * md5 hex strings, identical in both engines.
  */
object DedupOps {

  /** 3-token shingle set per document (Spark side). Spark SQL arrays are
    * 1-based via element_at. */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))"))
        .as("s"))

  /** Shared DuckDB CTE producing the same shingle sets (1-based lists). */
  private val shingleSql =
    s"""toks AS (
       |  SELECT doc_id, $tokensSql AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(tk) - 1),
       |           i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS s
       |  FROM toks WHERE len(tk) >= 3)""".stripMargin

  /** Exact dedup: content-hash groupBy, keep the min doc_id per group. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

  /** MinHash + banded LSH near-dup detection.
    *
    * k=8 single-row bands; signature_j = min over shingles of
    * md5(j || ':' || shingle). Candidates = pairs sharing any band value;
    * verified with exact Jaccard >= 0.5. P(miss) for a 0.9-Jaccard pair
    * is (1-0.9)^8 = 1e-8.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleSets(spark, dir)
    val sig = sh
      .select(col("doc_id"), col("s"), explode(expr("sequence(0, 7)")).as("j"))
      .select(col("doc_id"), col("j"),
        array_min(expr("transform(s, x -> md5(concat(j, ':', x)))")).as("mh"))
    val cand = sig.as("a")
      .join(sig.as("b"),
        col("a.j") === col("b.j") && col("a.mh") === col("b.mh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("id1"), col("s").as("s1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("s").as("s2")), "id2")
      .withColumn("jac", expr("CAST(size(array_intersect(s1, s2)) AS DOUBLE) / size(array_union(s1, s2))"))
      .filter(col("jac") >= 0.5)
      .select(col("id1"), col("id2"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** Exact n-gram Jaccard via shingle inverted-index self-join (no
    * cross-join: pairs materialize only for docs sharing a shingle).
    * At larger SF a doc-frequency cap on shingles would bound skew. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleSets(spark, dir)
    val ex = sh.select(col("doc_id"), explode(col("s")).as("g"))
    val pairs = ex.as("a")
      .join(ex.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sh.select(col("doc_id").as("id1"), size(col("s")).as("n1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), size(col("s")).as("n2")), "id2")
      .withColumn("jac", expr("CAST(common AS DOUBLE) / (n1 + n2 - common)"))
      .filter(col("jac") >= 0.4)
      .select(col("id1"), col("id2"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** 16-bit SimHash from md5-derived per-token bit votes (exact integer
    * arithmetic end-to-end so the oracle match is bit-perfect). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val hexVal = (1 to 4)
      .map(i => s"(instr('0123456789abcdef', substr(md5(t), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
      .mkString(" + ")
    val votes = (0 until 16).map(b =>
      sum(expr(s"CASE WHEN shiftright(v, $b) % 2 = 1 THEN 1 ELSE -1 END")).as(s"s$b"))
    val simhash = (0 until 16)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)")
      .mkString(" + ")
    Tables(spark, dir).documents
      .select(col("doc_id"),
        explode(expr(s"array_distinct($tokensExpr)")).as("t"))
      .withColumn("v", expr(hexVal))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(s"CAST($simhash AS BIGINT)").as("simhash"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs with sign-bucket blocking (4-bit
    * LSH on leading dims bounds each comparison to its bucket). */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val bkt = SimilarityOps.bucketExprSpark(4)
    val b = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"), expr(bkt).as("bkt"))
    val l = b.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("bkt"))
    val r = b.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("bkt"))
    l.join(r, "bkt")
      .filter(col("id1") < col("id2"))
      .withColumn("c", expr(SimilarityOps.cosExprSpark("e1", "e2")))
      .filter(col("c") >= 0.4)
      .select(col("id1"), col("id2"), round(col("c"), 4).as("cos_sim"))
      .orderBy("id1", "id2")
  }

  private def simhashSql: String = {
    val hexVal = (1 to 4)
      .map(i => s"(strpos('0123456789abcdef', substr(md5(t), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
      .mkString(" + ")
    val votes = (0 until 16)
      .map(b => s"sum(CASE WHEN (v >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val simhash = (0 until 16)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct($tokensSql)) AS t FROM documents),
       |hv AS (
       |  SELECT doc_id, $hexVal AS v FROM tok),
       |bits AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hv GROUP BY doc_id)
       |SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM bits ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $shingleSql,
         |sig AS (
         |  SELECT doc_id, j,
         |         list_min(list_transform(s, x -> md5(j::VARCHAR || ':' || x))) AS mh
         |  FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM sig a JOIN sig b ON a.j = b.j AND a.mh = b.mh AND a.doc_id < b.doc_id)
         |SELECT c.id1, c.id2,
         |  round(len(list_intersect(x.s, y.s)) * 1.0 / len(list_distinct(x.s || y.s)), 4) AS jaccard
         |FROM cand c JOIN sh x ON c.id1 = x.doc_id JOIN sh y ON c.id2 = y.doc_id
         |WHERE len(list_intersect(x.s, y.s)) * 1.0 / len(list_distinct(x.s || y.s)) >= 0.5
         |ORDER BY id1, id2""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleSql,
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |j AS (
         |  SELECT id1, id2, common * 1.0 / (len(x.s) + len(y.s) - common) AS jac
         |  FROM pairs JOIN sh x ON id1 = x.doc_id JOIN sh y ON id2 = y.doc_id)
         |SELECT id1, id2, round(jac, 4) AS jaccard FROM j
         |WHERE jac >= 0.4 ORDER BY id1, id2""".stripMargin,
    "dedup_simhash" -> simhashSql,
    "dedup_embedding" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${SimilarityOps.bucketExprSql(4)} AS bkt FROM embeddings)
         |SELECT a.vec_id AS id1, b2.vec_id AS id2,
         |  round(${SimilarityOps.cosExprSql("a.embedding", "b2.embedding")}, 4) AS cos_sim
         |FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id
         |WHERE ${SimilarityOps.cosExprSql("a.embedding", "b2.embedding")} >= 0.4
         |ORDER BY id1, id2""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact(_, _)),
    "dedup_minhash_lsh" -> (dedupMinhashLsh(_, _)),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard(_, _)),
    "dedup_simhash" -> (dedupSimhash(_, _)),
    "dedup_embedding" -> (dedupEmbedding(_, _)),
  )
}
