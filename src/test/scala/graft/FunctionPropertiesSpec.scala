package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioMeta, ImageMeta, MinhashBands, ShingleHashes, VideoMeta, WinnowFps}

/** Property-based checks of the native expressions' JVM helpers —
  * pure-function properties that don't need a SparkSession, so they
  * fuzz broadly and fast. Uses scalacheck generators with a
  * deterministic seed sweep (the scalatest-scalacheck bridge artifact
  * is not in the offline cache). */
class FunctionPropertiesSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  test("ImageMeta.parse never throws on arbitrary bytes (fuzz)") {
    forAllSeeded(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes => ImageMeta.parse(bytes)
    }
    // adversarial prefixes: truncated signatures + marker-walk edges
    val evil = Seq(
      Array(0x89, 'P', 'N', 'G').map(_.toByte),
      Array(0xff, 0xd8).map(_.toByte),
      Array(0xff, 0xd8, 0xff, 0xc0).map(_.toByte),
      Array(0xff, 0xd8, 0xff, 0xe0, 0xff, 0xff).map(_.toByte),
      "GIF89a".getBytes.take(6),
      Array.emptyByteArray)
    evil.foreach(b => ImageMeta.parse(b))
  }

  test("AudioMeta/VideoMeta.parse never throw on arbitrary bytes (fuzz)") {
    val arbitrary = Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    forAllSeeded(arbitrary) { bytes =>
      AudioMeta.parse(bytes); VideoMeta.parse(bytes)
    }
    // Magic-prefixed garbage enters the chunk/box walkers with random
    // sizes — the adversarial path for the offset arithmetic.
    val magics = Seq(
      "RIFF".getBytes, "RIFFxxxxWAVE".getBytes, "RIFFxxxxAVI ".getBytes,
      "fLaC".getBytes, Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes)
    forAllSeeded(arbitrary, 100) { tail =>
      magics.foreach { m =>
        AudioMeta.parse(m ++ tail); VideoMeta.parse(m ++ tail)
      }
    }
    // walker edges: size=0 (to-end), size=1 (largesize), truncated
    // largesize, LIST loop with zero-size chunks
    val evil = Seq(
      Array[Byte](0, 0, 0, 0) ++ "ftypisom".getBytes,
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
        Array[Byte](0, 0, 0, 1) ++ "moov".getBytes, // largesize missing
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
        Array[Byte](0, 0, 0, 1) ++ "moov".getBytes ++
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 0),        // largesize 0 (< 8)
      "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "AVI ".getBytes ++
        "LIST".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "xxxx".getBytes,
      "RIFF".getBytes ++ Array[Byte](-1, -1, -1, -1) ++ "WAVE".getBytes,
      Array.emptyByteArray)
    evil.foreach { b => AudioMeta.parse(b); VideoMeta.parse(b) }
    // review repro 1: truncated mvhd — tag matches, fields out of bounds
    val truncMvhd = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++
      Array[Byte](0, 0, 0, 4) ++ Array[Byte](0, 0, 0, 16) ++ "moov".getBytes ++
      Array[Byte](0, 0, 0, 8) ++ "mvhd".getBytes
    assert(VideoMeta.parse(truncMvhd) == null)
    // review repro 2: trak with largesize 2^32 (thi <= trakAt) must
    // terminate, not loop forever re-finding the same trak
    val mvhdOk = {
      val bb = java.nio.ByteBuffer.allocate(108)
      bb.putInt(108).put("mvhd".getBytes).putInt(0).putInt(0).putInt(0)
        .putInt(600).putInt(60000)
      bb.array()
    }
    val loopTrak = {
      val moovPayload = mvhdOk ++
        Array[Byte](0, 0, 0, 1) ++ "trak".getBytes ++
        Array[Byte](0, 0, 0, 1, 0, 0, 0, 0) // largesize 2^32: .toInt == 0
      val bb = java.nio.ByteBuffer.allocate(16 + 8 + moovPayload.length)
      bb.putInt(16).put("ftypisom".getBytes).putInt(0)
      bb.putInt(8 + moovPayload.length).put("moov".getBytes).put(moovPayload)
      bb.array()
    }
    VideoMeta.parse(loopTrak) // terminates; w/h stay 0, duration parses
    // overflow repros (second review pass):
    // (a) largesize near Long.MaxValue: i + step wraps negative and the
    //     old guard passed it — the walk cycled 0 <-> 16 forever
    val hugeLargesize = {
      val bb = java.nio.ByteBuffer.allocate(32)
      bb.putInt(16).put("ftypisom".getBytes).putInt(0)
      bb.putInt(1).put("xxxx".getBytes).putLong(0x7FFFFFFFFFFFFFF0L)
      bb.array()
    }
    assert(VideoMeta.parse(hugeLargesize) == null)
    // (b) AVI chunk size near Int.MaxValue: the Int advance wrapped the
    //     index negative and read the array below zero
    val hugeAviChunk = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
      bb.put("JUNK".getBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue - 8)
      bb.array()
    }
    assert(VideoMeta.parse(hugeAviChunk) == null)
    // (c) v1 mvhd with a duration whose *1000 wraps negative -> null,
    //     not a garbage duration_ms row
    val hugeDuration = {
      val mvhdV1 = java.nio.ByteBuffer.allocate(120)
      mvhdV1.putInt(120).put("mvhd".getBytes).putInt(0x01000000)
        .putLong(0).putLong(0).putInt(600).putLong(0x2000000000000000L)
      val bb = java.nio.ByteBuffer.allocate(16 + 8 + 120)
      bb.putInt(16).put("ftypisom".getBytes).putInt(0)
      bb.putInt(8 + 120).put("moov".getBytes).put(mvhdV1.array())
      bb.array()
    }
    assert(VideoMeta.parse(hugeDuration) == null)
    // (d) avih with both 32-bit duration factors maxed: product exceeds
    //     Long.MaxValue -> null
    val hugeAvih = {
      val bb = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
      bb.put("LIST".getBytes).putInt(4 + 8 + 56).put("hdrl".getBytes)
      bb.put("avih".getBytes).putInt(56)
      bb.putInt(-1).putInt(0).putInt(0).putInt(0) // usPerFrame = 2^32-1
      bb.putInt(-1).putInt(0).putInt(0).putInt(0) // nFrames   = 2^32-1
      bb.putInt(640).putInt(480)
      bb.array()
    }
    assert(VideoMeta.parse(hugeAvih) == null)
    // (e) WAV chunk size just below Int.MaxValue: the old Int advance
    //     wrapped negative and read below the array (same class as b)
    val hugeWavChunk = {
      val bb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      bb.put("JUNK".getBytes).putInt(Int.MaxValue - 16)
      bb.array()
    }
    assert(AudioMeta.parse(hugeWavChunk) == null)
  }

  test("ShingleHashes equals a straightforward reference implementation") {
    val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAllSeeded(Gen.listOf(token)) { toks =>
      val arr = new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = ShingleHashes.compute(arr).toLongArray().toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
      val ref = toks.sliding(3).filter(_.size == 3).map { g =>
        val d = md.digest(g.mkString(" ").getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }.toSeq.distinct
      assert(got == ref)
    }
  }

  test("MinhashBands: each band min is <= every per-element band hash") {
    val hashes = Gen.listOf(Gen.choose(0L, (1L << 32) - 1))
    forAllSeeded(hashes) { hs =>
      whenever(hs.nonEmpty) {
        val arr = new GenericArrayData(hs.toArray[Any])
        val bands = MinhashBands.compute(arr).toLongArray()
        assert(bands.length == MinhashBands.K)
        (0 until MinhashBands.K).foreach { j =>
          val mul = (2L * j + 1) * 2654435761L % MinhashBands.P
          val expected = hs.map(h => mul * h % MinhashBands.P).min
          assert(bands(j) == expected)
        }
      }
    }
  }

  test("WinnowFps: fingerprints are a subset of all gram hashes, stable, ASCII-safe") {
    val ascii = Gen.listOf(Gen.frequency(9 -> Gen.alphaLowerChar, 1 -> Gen.const(' ')))
      .map(_.mkString)
    forAllSeeded(ascii) { s =>
      val a = WinnowFps.compute(UTF8String.fromString(s)).toLongArray().toSeq
      val b = WinnowFps.compute(UTF8String.fromString(s)).toLongArray().toSeq
      assert(a == b)
      if (s.length < 8) assert(a.isEmpty)
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val grams = (0 to s.length - 5).map { i =>
          val d = md.digest(s.substring(i, i + 5).getBytes("UTF-8"))
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        }.toSet
        assert(a.toSet.subsetOf(grams))
      }
    }
  }

  test("CountMinSketch: merge-tree invariance, row conservation, never-undercount, overcount on full-row collision") {
    import graft.functions.{CountMinSketch => C}
    def est(s: graft.functions.CmsState, cells: Seq[Int]): Long =
      (0 until C.D).map(i => s.counters(i * C.W + cells(i))).min
    val itemGen = for {
      cells <- Gen.listOfN(C.D, Gen.choose(0, C.W - 1)).map(_.toSeq)
      n <- Gen.choose(1L, 50L) // weighted update: n duplicates pre-counted
    } yield (cells, n)
    forAllSeeded(Gen.nonEmptyListOf(itemGen), 100) { items =>
      val seq = items.foldLeft(C.zero)(C.reduce)
      // arbitrary split + merge = same matrix (partial-agg shape)
      val (l, r) = items.splitAt(items.length / 2)
      val merged = C.merge(l.foldLeft(C.zero)(C.reduce), r.foldLeft(C.zero)(C.reduce))
      assert(seq.counters.toSeq == merged.counters.toSeq)
      // each hash row conserves the total weighted count
      val total = items.map(_._2).sum
      (0 until C.D).foreach { i =>
        assert(seq.counters.slice(i * C.W, (i + 1) * C.W).sum == total)
      }
      // CMS guarantee: estimate never undercounts
      items.map(_._1).distinct.foreach { c =>
        assert(est(seq, c) >= items.collect { case (`c`, n) => n }.sum)
      }
    }
    // identical cell vectors are indistinguishable: est = combined count
    val a = Seq(1, 2, 3, 4)
    val b = Seq(9, 2, 7, 4) // shares only SOME rows with a -> min still separates
    val s = Seq((a, 5L), (b, 3L)).foldLeft(C.zero)(C.reduce)
    assert(est(s, a) == 5L && est(s, b) == 3L) // partial overlap: min rescues both
    val s2 = Seq((a, 5L), (a, 3L)).foldLeft(C.zero)(C.reduce)
    assert(est(s2, a) == 8L) // full-row collision: counts merge, over-estimate bound
  }

  test("JaroWinklerAlgo: pinned oracle-probed cases, symmetry, bounds") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinklerAlgo.similarity(u(a), u(b))
    // Cases probed against DuckDB's independent implementation BEFORE
    // the kernel was written (see the JaroWinklerAlgo scaladoc):
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    // window 0 admits only same-position matches
    assert(jw("ab", "ba") == 0.0)
    // integer floor transposition halving (float half would give 0.9167)
    assert(math.abs(jw("abcdxx", "bcadxx") - 0.9444444444444445) < 1e-12)
    // no Winkler boost at/below the 0.7 jaro threshold despite prefix
    assert(math.abs(jw("abcdef", "abzzzz") - 0.5555555555555555) < 1e-12)
    // empties are 0, identity is 1
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0)
    assert(jw("widget", "widget") == 1.0)
    // symmetry + bounds over random ASCII pairs
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val t = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val f = jw(s, t); val r = jw(t, s)
      assert(f == r, s"asymmetric on ($s, $t): $f vs $r")
      assert(f >= 0.0 && f <= 1.0, s"out of bounds on ($s, $t): $f")
    }
  }
}
