package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactness specs for graft's fused Catalyst expressions against the
  * interpreted SQL pipelines they replace (the oracle mirrors those
  * pipelines, so equality here IS the cross-engine parity argument). */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private val tk = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  test("graft_shingle_hashes equals the SQL shingle+md5+conv pipeline") {
    val sqlPipeline =
      s"""array_distinct(transform(
         |  array_distinct(transform(sequence(1, size(tk) - 2),
         |    i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))),
         |  x -> CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT)))""".stripMargin
    val bad = Tables(spark, sf).documents
      .select(col("doc_id"), expr(tk).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"),
        expr("array_sort(graft_shingle_hashes(tk))").as("fused"),
        expr(s"array_sort($sqlPipeline)").as("ref"))
      .filter(col("fused") =!= col("ref"))
      .count()
    assert(bad == 0, s"$bad documents disagree with the SQL pipeline")
  }

  test("graft_minhash_bands equals the SQL affine-min formulation") {
    val p = 2147483647L
    val bad = Tables(spark, sf).documents
      .select(expr(tk).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(expr("graft_shingle_hashes(tk)").as("hs"))
      .select(
        expr("graft_minhash_bands(hs)").as("fused"),
        expr(
          s"""transform(sequence(0, 7),
             |  j -> array_min(transform(hs, h -> ((2 * j + 1) * 2654435761 % $p) * h % $p)))""".stripMargin)
          .as("ref"))
      .filter(col("fused") =!= col("ref"))
      .count()
    assert(bad == 0, s"$bad rows disagree with the SQL formulation")
  }
}
