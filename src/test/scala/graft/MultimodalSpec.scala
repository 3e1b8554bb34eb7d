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

  test("graft_image_meta parses PNG, GIF, and JPEG headers exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array((w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte)
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(Array(0xff, 0xd8).map(_.toByte))                 // SOI
      b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(4)     // APP0, len 4
      b.putShort(0)
      b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11)    // SOF0
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    }
    val rows = Seq(
      ("png", png(640, 480)), ("gif", gif(320, 200)),
      ("jpeg", jpeg(1024, 768)), ("junk", "not an image".getBytes))
      .toDF("name", "payload")
      .select(col("name"), expr("graft_image_meta(payload)").as("m"))
      .select(col("name"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)), if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(rows == Set(
      ("png", Some("png"), 640, 480),
      ("gif", Some("gif"), 320, 200),
      ("jpeg", Some("jpeg"), 1024, 768),
      ("junk", None, -1, -1)), rows.toString)
  }
}
