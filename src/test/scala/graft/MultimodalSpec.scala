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

  test("graft_audio_meta parses WAV and FLAC headers exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def wav(ch: Int, sr: Int, bps: Int, frames: Int): Array[Byte] = {
      val blockAlign = ch * bps / 8
      val b = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16)
      b.putShort(1).putShort(ch.toShort).putInt(sr).putInt(sr * blockAlign)
      b.putShort(blockAlign.toShort).putShort(bps.toShort)
      b.put("data".getBytes).putInt(frames * blockAlign)
      b.array()
    }
    def flac(ch: Int, sr: Int, bps: Int, n: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + 4 + 34)
      b.put("fLaC".getBytes)
      b.put(0x00.toByte).put(0x00.toByte).put(0x00.toByte).put(34.toByte)
      b.position(b.position() + 10) // min/max blocksize + framesize
      b.put((sr >> 12).toByte).put(((sr >> 4) & 0xff).toByte)
      b.put((((sr & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte)
      b.put(((((bps - 1) & 0xf) << 4) | ((n >> 32) & 0xf).toInt).toByte)
      b.putInt((n & 0xffffffffL).toInt)
      b.array()
    }
    val rows = Seq(
      ("wav", wav(2, 44100, 16, 100)),
      ("flac", flac(1, 48000, 24, 123456L)),
      ("junk", "not audio at all".getBytes),
      ("truncated", "RIFF".getBytes))
      .toDF("name", "payload")
      .select(col("name"), expr("graft_audio_meta(payload)").as("m"))
      .select(col("name"), col("m.format"), col("m.channels"),
        col("m.sample_rate"), col("m.bits_per_sample"), col("m.n_frames"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSet
    assert(rows == Set(
      ("wav", Some("wav"), 2, 44100, 16, 100L),
      ("flac", Some("flac"), 1, 48000, 24, 123456L),
      ("junk", None, -1, -1, -1, -1L),
      ("truncated", None, -1, -1, -1, -1L)), rows.toString)
  }

  test("graft_video_meta parses MP4 and AVI headers exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0)).
    def mp4(brand: String, w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 100) // BE by default
      b.putInt(16).put("ftyp".getBytes).put(brand.getBytes).putInt(0)
      b.putInt(8 + 108 + 100).put("moov".getBytes)
      val mvhd = b.position()
      b.putInt(108).put("mvhd".getBytes).putInt(0) // version 0 + flags
        .putInt(0).putInt(0)                       // ctime, mtime
        .putInt(timescale).putInt(duration)
      b.position(mvhd + 108)
      b.putInt(100).put("trak".getBytes)
      val tkhd = b.position()
      b.putInt(92).put("tkhd".getBytes).putInt(0)  // version 0 + flags
      b.position(tkhd + 8 + 76)                    // skip to width (16.16)
      b.putInt(w << 16).putInt(h << 16)
      b.array()
    }
    def avi(w: Int, h: Int, usPerFrame: Int, frames: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
      b.put("LIST".getBytes).putInt(4 + 8 + 56).put("hdrl".getBytes)
      b.put("avih".getBytes).putInt(56)
      b.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      b.putInt(frames).putInt(0).putInt(0).putInt(0)
      b.putInt(w).putInt(h)
      b.array()
    }
    val rows = Seq(
      ("mp4", mp4("isom", 1920, 1080, 600, 60000)),
      ("avi", avi(640, 480, 40000, 250)),
      ("junk", "definitely not a movie".getBytes),
      ("truncated", "RIFF".getBytes))
      .toDF("name", "payload")
      .select(col("name"), expr("graft_video_meta(payload)").as("m"))
      .select(col("name"), col("m.format"), col("m.brand"),
        col("m.width"), col("m.height"), col("m.duration_ms"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) "" else r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSet
    assert(rows == Set(
      ("mp4", Some("mp4"), "isom", 1920, 1080, 100000L),
      ("avi", Some("avi"), "avi", 640, 480, 10000L),
      ("junk", None, "", -1, -1, -1L),
      ("truncated", None, "", -1, -1, -1L)), rows.toString)
  }

  test("TarMeta.write emits archives GNU tar itself can list") {
    // The writer's strongest check is an INDEPENDENT implementation:
    // /usr/bin/tar must list exactly the members we packed, in order.
    val bytes = graft.functions.TarMeta.write(Seq(
      ("a/0001.jpg", Array.fill[Byte](700)(3)),
      ("a/0001.txt", "caption text".getBytes("UTF-8"))))
    val f = java.io.File.createTempFile("graft_tar_spec", ".tar")
    try {
      java.nio.file.Files.write(f.toPath, bytes)
      val out = new StringBuilder
      val p = new ProcessBuilder("tar", "-tf", f.getAbsolutePath)
        .redirectErrorStream(true).start()
      scala.io.Source.fromInputStream(p.getInputStream).getLines()
        .foreach(l => out.append(l).append('\n'))
      assert(p.waitFor() == 0, s"tar -tf failed:\n$out")
      assert(out.toString == "a/0001.jpg\na/0001.txt\n", out.toString)
    } finally f.delete()
  }

  test("TarMeta.write refuses names the 100-byte ustar field cannot hold") {
    // Silent truncation would collide two long names into one index
    // entry — the serving-path corruption the writer must fail on.
    val long = "a" * 101 + ".txt"
    val e = intercept[IllegalArgumentException] {
      graft.functions.TarMeta.write(Seq((long, "x".getBytes)))
    }
    assert(e.getMessage.contains("100 bytes"))
    // Exactly 100 bytes is legal.
    val ok = graft.functions.TarMeta.write(Seq(("b" * 100, "x".getBytes)))
    assert(graft.functions.TarMeta.parse(ok) != null)
  }

  test("graft_tar_meta walks ustar archives and rejects malformed ones") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // A real ustar header: name, octal size, typeflag, "ustar" magic,
    // and the unsigned-sum checksum computed over the block with the
    // checksum field as spaces — exactly what tar(1) writes.
    def header(name: String, size: Long, typeflag: Byte): Array[Byte] = {
      val h = new Array[Byte](512)
      name.getBytes("UTF-8").copyToArray(h, 0)
      "0000644\u0000".getBytes.copyToArray(h, 100)        // mode
      "0000000\u0000".getBytes.copyToArray(h, 108)        // uid
      "0000000\u0000".getBytes.copyToArray(h, 116)        // gid
      ("%011o".format(size) + "\u0000").getBytes.copyToArray(h, 124)
      "00000000000\u0000".getBytes.copyToArray(h, 136)    // mtime
      h(156) = typeflag
      "ustar\u000000".getBytes.copyToArray(h, 257)        // magic+version
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(_ & 0xff).sum
      ("%06o".format(sum) + "\u0000 ").getBytes.copyToArray(h, 148)
      h
    }
    def member(name: String, data: Array[Byte]): Array[Byte] = {
      val padded = new Array[Byte](((data.length + 511) / 512) * 512)
      data.copyToArray(padded)
      header(name, data.length.toLong, '0'.toByte) ++ padded
    }
    val good = member("a/0001.jpg", Array.fill[Byte](600)(7)) ++
      member("a/0001.txt", "caption".getBytes) ++
      header("a/", 0L, '5'.toByte) ++                     // directory entry
      new Array[Byte](1024)                               // end-of-archive
    val lyingSize = {
      val t = member("x.bin", "abc".getBytes)
      // corrupt the size field to claim 1 GiB but keep the checksum
      // valid for the corrupted bytes — the walk must detect truncation
      val h = header("x.bin", 1L << 30, '0'.toByte)
      h ++ t.drop(512)
    }
    val badChecksum = {
      val t = member("y.bin", "abc".getBytes)
      t(130) = '7'.toByte // flip a size digit without re-checksumming
      t
    }
    val rows = Seq(
      ("good", good),
      ("lying", lyingSize),
      ("badsum", badChecksum),
      ("junk", "not an archive".getBytes),
      ("zeros", new Array[Byte](1024)))
      .toDF("name", "payload")
      .select(col("name"), expr("graft_tar_meta(payload)").as("m"))
      .select(col("name"), col("m.format"), col("m.n_members"),
        col("m.n_files"), col("m.data_bytes"), col("m.first_name"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) "" else r.getString(5))).toSet
    assert(rows == Set(
      ("good", Some("tar"), 3, 2, 607L, "a/0001.jpg"),
      ("lying", None, -1, -1, -1L, ""),
      ("badsum", None, -1, -1, -1L, ""),
      ("junk", None, -1, -1, -1L, ""),
      ("zeros", None, -1, -1, -1L, "")), rows.toString)
  }

  test("shard index offsets range-read back the original member bytes") {
    import org.apache.spark.sql.functions.col
    // The serving-path loop closed: slice each indexed (offset, size)
    // span out of the raw shard bytes and require the ORIGINAL document
    // text back — the read a training worker performs with the index.
    val dir = TestSpark.sf
    val shard = graft.operators.MultimodalOps.shardPayloads(spark, dir)
      .orderBy("shard").collect().head
    val bytes = shard.getAs[Array[Byte]]("payload")
    val idx = graft.operators.MultimodalOps.mmShardIndex(spark, dir)
      .filter(col("shard") === shard.getAs[Long]("shard")).collect()
    val texts = Tables(spark, dir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => s"doc${r.getLong(0)}.txt" -> r.getString(1)).toMap
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val (name, off, size) =
        (r.getString(1), r.getLong(2).toInt, r.getLong(3).toInt)
      val got = new String(bytes, off, size, "UTF-8")
      assert(got == texts(name), s"range read of $name diverged")
    }
  }

  test("mm_decode_png: ImageIO decode is pixel-exact vs direct md5 math; garbage yields null features") {
    import org.apache.spark.sql.functions.col
    // Independent recount: the decoded features for a handful of docs
    // must equal the md5-derived pixels computed HERE, with no image
    // machinery — the same law the DuckDB oracle enforces corpus-wide.
    val out = MultimodalOps.mmDecodePng(spark, sf)
      .filter(col("doc_id") < 5).collect()
    assert(out.length == 5, s"expected 5 rows, got ${out.length}")
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { row =>
      val id = row.getLong(0)
      var sum = 0L; var mn = 256L; var mx = -1L
      val q = new Array[Long](4)
      for (r <- 0 until 8) {
        md.reset()
        val dg = md.digest(s"${id}_$r".getBytes("UTF-8"))
        for (c <- 0 until 8) {
          val v = (dg(c) & 0xff).toLong
          sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
          q((if (r >= 4) 2 else 0) + (if (c >= 4) 1 else 0)) += v
        }
      }
      assert(row.getInt(1) == 8 && row.getInt(2) == 8, s"doc $id size wrong")
      assert(row.getLong(3) == sum && row.getLong(4) == mn && row.getLong(5) == mx,
        s"doc $id stats diverge from direct md5 math")
      assert((6 to 9).map(row.getLong) == q.toSeq,
        s"doc $id quadrant sums diverge")
    }
    // Undecodable payloads must degrade to a null-feature row, not fail.
    val session = spark
    import session.implicits._
    val junk = Seq((1L, "not a png".getBytes("UTF-8")),
        (2L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val rows = MultimodalOps.decodePngFeatures(junk).orderBy("doc_id").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(1)),
      s"garbage payloads did not yield null features: ${rows.mkString(";")}")
  }

  test("mm_frame_sample: animated-GIF frame counts and stride-2 sampling law hold") {
    import org.apache.spark.sql.functions.col
    val out = MultimodalOps.mmFrameSample(spark, sf)
      .filter(col("doc_id") < 20).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == (0L until 20L).toSet, "docs missing from the sample")
    byDoc.foreach { case (id, rows) =>
      val n = 4 + (id % 5).toInt
      // The reader must see every written frame...
      assert(rows.forall(_._2 == n), s"doc $id frame count != $n: $rows")
      // ...and the sampler must emit exactly the stride-2 subset, in order.
      assert(rows.map(_._3).sorted.toSeq == (0 until n by 2),
        s"doc $id sampled frames wrong: ${rows.map(_._3).toSeq}")
      // Pixel sums vary across frames (distinct md5 seeds) — a decoder
      // that returned frame 0 for every index would collapse them.
      assert(rows.map(_._4).distinct.length == rows.length,
        s"doc $id frame sums collapsed: $rows")
    }
  }

  test("mm_decode_jpeg: real lossy decode — exact dims, bounded per-pixel error, deterministic") {
    // VERDICT r7 #3 — the tolerance gate standing in for the hash gate
    // a lossy codec cannot have. The source pixels are md5 noise (the
    // WORST case for a DCT codec — no smoothness to exploit), so the
    // bounds below are deliberately loose fidelity envelopes; what
    // they pin is that the JDK JPEG writer+reader genuinely ran (a
    // stubbed identity would show zero error AND fail the "lossy"
    // floor; a broken decode blows the ceiling or the dims).
    val out = MultimodalOps.mmDecodeJpeg(spark, sf).collect()
    val nDocs = Tables(spark, sf).documents.count()
    assert(out.length == nDocs, s"row per doc expected: ${out.length} vs $nDocs")
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8 && r.getInt(2) == 8,
        s"doc $id decoded dims ${r.getInt(1)}x${r.getInt(2)} != 8x8")
      // Ceiling: at quality 0.9 a single 8x8 gray block's max abs
      // error on noise stays well under half the dynamic range; a
      // channel remap / stride bug lands at ~128+.
      assert(r.getLong(4) <= 96, s"doc $id max_abs_err ${r.getLong(4)} > 96")
      // Mean abs error <= 24/pixel (sum over 64 pixels).
      assert(r.getLong(5) <= 24 * 64, s"doc $id sum_abs_err ${r.getLong(5)}")
    }
    // Floor: JPEG on md5 noise is genuinely lossy — if EVERY document
    // round-trips bit-exactly, the codec did not run.
    assert(out.count(_.getLong(5) > 0) > out.length / 2,
      "decode suspiciously lossless — is the JPEG loop really running?")
    // Determinism: fixed explicit quality + same JDK codec → the
    // whole encode->decode loop replays bit-identically.
    val again = MultimodalOps.mmDecodeJpeg(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "mm_decode_jpeg is not deterministic across runs")
  }

  test("mm_decode_wav: javax.sound decode is sample-exact vs direct md5 math; garbage yields null features") {
    import org.apache.spark.sql.functions.col
    // Independent recount (the mm_decode_png pattern): decoded sample
    // stats for a handful of docs must equal the md5-derived signed
    // 16-bit samples computed HERE with no audio machinery — the same
    // law the DuckDB oracle enforces corpus-wide.
    val out = MultimodalOps.mmDecodeWav(spark, sf)
      .filter(col("doc_id") < 5).collect()
    assert(out.length == 5, s"expected 5 rows, got ${out.length}")
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { row =>
      val id = row.getLong(0)
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      for (r <- 0 until 2) {
        md.reset()
        val dg = md.digest(s"${id}_w$r".getBytes("UTF-8"))
        for (c <- 0 until 8) {
          val u = ((dg(2 * c) & 0xff) << 8) | (dg(2 * c + 1) & 0xff)
          val s = (if (u >= 32768) u - 65536 else u).toLong
          sum += s; mn = math.min(mn, s); mx = math.max(mx, s)
        }
      }
      assert(row.getInt(1) == 16 && row.getInt(2) == 8000 &&
        row.getInt(3) == 1 && row.getInt(4) == 16,
        s"doc $id stream params wrong: $row")
      assert(row.getLong(5) == sum && row.getLong(6) == mn && row.getLong(7) == mx,
        s"doc $id sample stats diverge from direct md5 math: $row")
    }
    // A handcrafted known-sample WAV decodes to hand-computed stats —
    // pins the container walk independent of the md5 synth.
    val session = spark
    import session.implicits._
    val samples = Seq[Short](0, 1, -1, 32767, -32768, 100)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val hand = Seq((7L, bb.array())).toDF("doc_id", "payload")
    val hr = MultimodalOps.decodeWavFeatures(hand).collect()(0)
    assert(hr.getInt(1) == 6 && hr.getLong(5) == 99L &&
      hr.getLong(6) == -32768L && hr.getLong(7) == 32767L,
      s"handcrafted WAV stats wrong: $hr")
    // Undecodable payloads degrade to a null-feature row, never fail.
    val junk = Seq((1L, "not a wav".getBytes("UTF-8")),
        (2L, Array.empty[Byte]), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val rows = MultimodalOps.decodeWavFeatures(junk).orderBy("doc_id").collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(1)),
      s"garbage payloads did not yield null features: ${rows.mkString(";")}")
    // Deterministic across runs (same contract as the other decodes).
    val again = MultimodalOps.mmDecodeWav(spark, sf)
      .filter(col("doc_id") < 5).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "mm_decode_wav is not deterministic across runs")
  }
}
