package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** Evidence for the mm_decode plumbing (SURVEY §2.6): the mapPartitions
  * batch shape is real, and the stubbed decoder is deterministic. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("mm_decode_stub is deterministic and row-complete") {
    val a = MultimodalOps.mmDecodeStub(spark, sf).collect()
    val b = MultimodalOps.mmDecodeStub(spark, sf).collect()
    assert(a.sameElements(b), "two runs differ — stub is not deterministic")
    val nDocs = Tables(spark, sf).documents.count()
    assert(a.length == nDocs, s"decoded ${a.length} of $nDocs payloads")
    assert(a.forall(_.getInt(3) == 64))
  }

  test("mm_decode_stub schema matches the declared decode contract") {
    val df = MultimodalOps.mmDecodeStub(spark, sf)
    assert(df.schema == MultimodalOps.decodedSchema)
  }
}
