package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside. The testdata has no real media, so payloads are either
  * the UTF-8 encoding of `documents.text` (metadata/shard plumbing) or
  * manufactured REAL container bytes (the tar lifecycle's ustar bytes;
  * mm_decode_png's genuine PNGs). Image decode itself is REAL where
  * the JDK ships the codec — [[decodePngFeatures]] runs
  * javax.imageio's actual PNG/GIF/BMP decoder inside mapPartitions,
  * oracle-gated pixel-exactly, [[mmDecodeJpeg]] runs the JDK's
  * actual JPEG encode→decode loop, tolerance-gated (lossy decode is
  * not hash-stable), and [[mmDecodeWav]] runs the JDK's actual
  * RIFF/WAVE PCM decode, oracle-gated sample-exactly — and a
  * clearly-marked deterministic stub ([[mmDecodeStub]]) documents the
  * FFI shape for the codecs the JDK truly lacks: JPEG2000 and
  * COMPRESSED video/audio frames (H.26x, VP9/AV1, MP3/AAC/Opus).
  */
object MultimodalOps {

  /** Binary payload + typed metadata, bucketed for partition-friendly
    * writes (`bucket` would be the partitionBy/bucketBy key at scale). */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        substring(col("text"), 1, 4).as("prefix"))
      .withColumn("bucket", col("n_bytes") % 16)
      .orderBy("doc_id")

  /** Schema returned by the stubbed per-batch decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("feat_mean", DoubleType),
    StructField("feat_dim", IntegerType)))

  /** Decode/feature-extract plumbing over binary batches.
    *
    * Real shape: mapPartitions over (id, payload) rows — exactly where a
    * JNI/FFI image decoder would run, batched per partition so decoder
    * init is amortized. STUB: `decodeStub` derives a deterministic fake
    * feature vector summary from the payload bytes instead of decoding
    * actual media.
    */
  def mmDecodeStub(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    payloads.mapPartitions { rows =>
      // decoder init would happen once per partition here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (mean, dim) = decodeStub(bytes)
        Row(id, bytes.length.toLong, mean, dim)
      }
    }(enc).orderBy("doc_id")
  }

  /** STUB decoder: deterministic fake "feature extraction" (mean byte
    * value as the pooled feature, fixed fake dimensionality). Swap for a
    * real decoder at deploy time. */
  private def decodeStub(bytes: Array[Byte]): (Double, Int) = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    (if (bytes.length == 0) 0.0 else s.toDouble / bytes.length, 64)
  }

  /** Per-partition codec init (r12 optimization — guide §1.2 "per-task
    * work"): headless AWT (executors have no display) AND the ImageIO
    * stream cache OFF. The default cache backs EVERY ImageIO
    * read/write with a temp FILE (create + write + delete per call) —
    * measured 3× on mm_resize inside a full bench boot where /tmp
    * carries thousands of gate-staging entries (10.2 s in-suite vs
    * 3.8 s isolated, retry-confirmed). All payloads here are in-memory
    * byte arrays; a disk-backed stream cache buys nothing at any
    * scale. Both calls are idempotent JVM-global flags. */
  private def initImageIO(): Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Round-robin spread of the narrow (doc_id-ish) scan feeding a
    * per-row codec loop. The documents table scans as O(row groups)
    * partitions — ONE task at bench scale — and the decode cost is
    * per-row CPU that byte-based split sizing cannot see, so without
    * the spread the whole encode→decode pass single-threads (the
    * ivfCells lesson, §2.6 flavor). The exchanged rows are the narrow
    * projection only (ids, not payloads), so the one extra exchange
    * stays corpus-linear in a few bytes per row. */
  private def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    df.repartition(graft.plans.AdaptivePar.forBytes(spark,
      // All spread callers here scan documents.parquet's doc_id column;
      // width from that table's bytes (see AdaptivePar — capped at
      // defaultParallelism, so at-scale behavior is the constant's).
      docBytes(df), graft.plans.AdaptivePar.SpreadBytesPerTask))
  }

  /** documents.parquet on-disk bytes for the frame's source dir —
    * threaded through a thread-local set by each caller would be
    * overkill; the callers all pass a frame built from Tables(spark,
    * dir).documents, so the scan's file path is recoverable from the
    * logical plan's file index. Falls back to -1 (-> the
    * defaultParallelism cap) if the plan shape ever changes. */
  private def docBytes(df: DataFrame): Long =
    try {
      val files = df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case hfs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              hfs.location.sizeInBytes
          }
      }
      files.getOrElse(-1L)
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** PNG byte signature — dispatch guard for the amortized reader. */
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 137 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 13 && b(5) == 10 && b(6) == 26 && b(7) == 10

  /** Encode through an amortized per-partition writer over an
    * in-memory stream (the mmDecodeJpeg codec-amortization pattern:
    * a bare ImageIO.write pays a writer-registry scan per call). */
  private def pngEncode(writer: javax.imageio.ImageWriter,
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(img)
    } finally out.close()
    bos.toByteArray
  }

  /** Decode through an amortized per-partition reader (same pattern);
    * throws on undecodable bytes — callers that accept arbitrary
    * payloads catch and degrade exactly as ImageIO.read's null. */
  private def pngDecode(reader: javax.imageio.ImageReader,
      bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try { reader.setInput(in); reader.read(0) }
    finally in.close()
  }

  /** Schema of [[decodePngFeatures]]: integer-exact pooled features
    * from the DECODED pixels; all features null when a payload does
    * not decode as an image (corrupt bytes must degrade to a null
    * row, never fail the scan). */
  val pngFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("px_sum", LongType),
    StructField("px_min", LongType),
    StructField("px_max", LongType),
    StructField("q_tl", LongType),
    StructField("q_tr", LongType),
    StructField("q_bl", LongType),
    StructField("q_br", LongType)))

  /** REAL image decode over a (doc_id, payload binary) frame — the
    * surface [[mmDecodeStub]] could only mime (VERDICT r3-r6 missing
    * #1, "no image libs in this container"): PNG/GIF/BMP need no
    * external libs at all — `javax.imageio` ships IN the JDK — so the
    * decoder here is the real one, running exactly where a JNI/FFI
    * codec would (mapPartitions, per-partition init, headless AWT).
    * Features are integer-exact pooled stats of the decoded grayscale
    * band: width/height, pixel sum/min/max, and the four quadrant box
    * sums (the "resize/pool" step of a feature pipeline as an exact
    * 2×2 box filter — no impl-defined Graphics2D scaler). Undecodable
    * payloads yield a null-feature row. */
  def decodePngFeatures(payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pngFeatureSchema)
    payloads.mapPartitions { rows =>
      // Decoder init once per partition: headless AWT must be set
      // before the first ImageIO touch (executors have no display),
      // stream cache off (see initImageIO). The PNG reader is
      // amortized per partition; PNG-signed bytes go through it
      // directly, anything else keeps the generic registry dispatch
      // (GIF/BMP stay decodable — same reader ImageIO.read would
      // pick, so decoded rasters are identical either way).
      initImageIO()
      val pngReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pngReader.dispose()))
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // NonFatal, not just IOException: the JDK readers throw
        // unchecked exceptions (IAE/AIOOBE/NegativeArraySize) on many
        // malformed-but-signed payloads, and a NULL payload column
        // must take the same degrade path (review finding, r7).
        val img =
          if (bytes == null) null
          else if (isPng(bytes))
            try pngDecode(pngReader, bytes)
            catch { case scala.util.control.NonFatal(_) => null }
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          Row(id, null, null, null, null, null, null, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val ras = img.getRaster
          var sum = 0L
          // MaxValue, not 256: the operator accepts ARBITRARY images
          // and a 16-bit PNG's samples all exceed a 256 sentinel
          // (review finding, r7).
          var mn = Long.MaxValue
          var mx = -1L
          val q = new Array[Long](4)
          var rr = 0
          while (rr < h) {
            var c = 0
            while (c < w) {
              val v = ras.getSample(c, rr, 0).toLong
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              q((if (rr * 2 >= h) 2 else 0) + (if (c * 2 >= w) 1 else 0)) += v
              c += 1
            }
            rr += 1
          }
          Row(id, w, h, sum, mn, mx, q(0), q(1), q(2), q(3))
        }
      }
    }(enc)
  }

  /** Deterministic 8×8 grayscale test card for doc `id` — pixel
    * (r, c) = byte c of md5("id_r"), the SAME bytes the oracle reads
    * as hex nibbles — encoded to REAL PNG container bytes by the
    * JDK's ImageIO writer (the TarMeta.write pattern: the corpus
    * ships no media, so the operator manufactures genuine bytes and
    * the gate proves the decode loop lossless). */
  private[graft] def synthPng(md: java.security.MessageDigest,
      id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    fillMd5Pixels(img, md, id.toString)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The shared pixel-derivation law every §2.6 decode oracle
    * mirrors: pixel (r, c) = byte c of md5(seed + "_" + r) over an
    * 8×8 raster — ONE definition, so the PNG and GIF builders cannot
    * drift from the oracles' hex-nibble math (review finding, r7). */
  private def fillMd5Pixels(img: java.awt.image.BufferedImage,
      md: java.security.MessageDigest, seed: String): Unit = {
    var r = 0
    while (r < 8) {
      md.reset()
      val dg = md.digest(
        s"${seed}_$r".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var c = 0
      while (c < 8) {
        img.getRaster.setSample(c, r, 0, dg(c) & 0xff)
        c += 1
      }
      r += 1
    }
  }

  /** Deterministic 8×8 indexed-gray frame ([[fillMd5Pixels]] law),
    * with an EXPLICIT 256-gray palette so palette index == gray value
    * (the GIF writer then round-trips each pixel losslessly;
    * TYPE_BYTE_GRAY would leave palette construction to the
    * encoder). */
  private def grayFrame(md: java.security.MessageDigest,
      seed: String): java.awt.image.BufferedImage = {
    val g = new Array[Byte](256)
    var i = 0
    while (i < 256) { g(i) = i.toByte; i += 1 }
    val cm = new java.awt.image.IndexColorModel(8, 256, g, g, g)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    fillMd5Pixels(img, md, seed)
    img
  }

  /** §2.6 mm_frame_sample — FRAME SAMPLING over real animated-GIF
    * payloads (the video-pipeline shape the brief names, on the one
    * multi-frame container the JDK codecs fully support): each doc
    * gets a manufactured animated GIF of 4 + (doc_id % 5) frames
    * (variable length — the part a fixed-stride sampler must get
    * right), frame f's pixels md5-derived like [[synthPng]]; the JDK
    * GIF reader then counts frames and decodes EVERY SECOND one
    * (stride-2 sampling), emitting one row per sampled frame with the
    * exact decoded pixel sum. Writer and reader are instantiated ONCE
    * per partition and re-targeted per row — the codec-amortization
    * seat a video FFI uses. The oracle regenerates frame counts and
    * pixel sums from the md5 hex math alone, so a frame dropped,
    * reordered, or re-quantized anywhere in the animated encode →
    * decode → sample loop breaks the hash gate. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_frames", IntegerType),
      StructField("frame", IntegerType),
      StructField("px_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spread(Tables(spark, dir).documents.select(col("doc_id")))
      .mapPartitions { rows =>
        initImageIO()
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        // Codec teardown rides task COMPLETION, not iterator
        // exhaustion: an `Iterator ++`-style tail never runs when a
        // downstream limit/take stops early or a row throws, leaking
        // the native codec instances for the task's lifetime
        // (ADVICE r7). The listener fires on success, failure, and
        // cancellation alike.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            writer.dispose()
            reader.dispose()
          })
        rows.flatMap { row =>
          val id = row.getLong(0)
          val n = 4 + (id % 5).toInt
          // ENCODE: one real animated GIF. The cache streams are
          // per-row state, closed in try/finally so a mid-encode throw
          // cannot strand their MemoryCache backing files (ADVICE r7).
          val bos = new java.io.ByteArrayOutputStream()
          val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try {
            writer.setOutput(out)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < n) {
              writer.writeToSequence(
                new javax.imageio.IIOImage(grayFrame(md, s"${id}_f$f"), null, null),
                null)
              f += 1
            }
            writer.endWriteSequence()
          } finally out.close()
          // DECODE + stride-2 SAMPLE through the real reader.
          val in = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          try {
            reader.setInput(in)
            val got = reader.getNumImages(true)
            // Strict Range.map: every read happens before the finally
            // closes the stream the reader reads through.
            (0 until got by 2).map { fi =>
              val img = reader.read(fi)
              var sum = 0L
              var r = 0
              while (r < img.getHeight) {
                var c = 0
                while (c < img.getWidth) {
                  sum += (img.getRGB(c, r) & 0xff).toLong
                  c += 1
                }
                r += 1
              }
              Row(id, got, fi, sum)
            }
          } finally in.close()
        }
      }(enc)
      .orderBy("doc_id", "frame")
  }

  /** §2.6 mm_resize — the RESIZE leg of the decode pipeline, with a
    * full re-encode: decode the doc's real PNG ([[synthPng]] bytes
    * through the JDK decoder), downsample 8×8 → 4×4 by an EXACT 2×2
    * box filter (block sum div 4 — integer floor, no impl-defined
    * Graphics2D scaler), re-encode the result as a REAL PNG, decode
    * THAT, and emit one row per resized pixel. The oracle computes
    * every pixel from md5 hex math + the same floor division, so the
    * gate covers decode → resize → re-encode → decode end to end —
    * including the second encoder pass over computed (not synthetic)
    * pixels. */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("r", IntegerType),
      StructField("c", IntegerType),
      StructField("v", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spread(Tables(spark, dir).documents.select(col("doc_id")))
      .mapPartitions { rows =>
        // Writer AND reader amortized per partition over in-memory
        // streams (the mmDecodeJpeg pattern — r12: this leg paid FOUR
        // per-row ImageIO registry dispatches and, with the default
        // stream cache, four temp-file create/delete cycles per doc).
        initImageIO()
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            writer.dispose()
            reader.dispose()
          })
        rows.flatMap { row =>
          val id = row.getLong(0)
          // synthesize + decode the real PNG payload
          val img8 = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          fillMd5Pixels(img8, md, id.toString)
          val src = pngDecode(reader, pngEncode(writer, img8))
          // exact 2x2 box filter
          val small = new java.awt.image.BufferedImage(
            4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val s = src.getRaster.getSample(2 * c, 2 * r, 0) +
                src.getRaster.getSample(2 * c + 1, 2 * r, 0) +
                src.getRaster.getSample(2 * c, 2 * r + 1, 0) +
                src.getRaster.getSample(2 * c + 1, 2 * r + 1, 0)
              small.getRaster.setSample(c, r, 0, s / 4)
              c += 1
            }
            r += 1
          }
          // re-encode the COMPUTED pixels, then decode that artifact
          val back = pngDecode(reader, pngEncode(writer, small))
          for (rr <- 0 until 4; cc <- 0 until 4)
            yield Row(id, rr, cc, back.getRaster.getSample(cc, rr, 0).toLong)
        }
      }(enc)
      .orderBy("doc_id", "r", "c")
  }

  /** §2.6 mm_decode_png — the REAL decode lifecycle, oracle-gated:
    * synthesize a deterministic PNG per document, run it through the
    * JDK's actual PNG decoder, and reduce the DECODED pixels to
    * integer-exact features. The DuckDB oracle computes the expected
    * features straight from the md5 hex math with no image machinery
    * anywhere — so a single bit lost or remapped by the encode→decode
    * loop (stride, gamma, palette, channel order) breaks the hash
    * gate. Scale shape: one narrow scan, one fused map stage (synth +
    * decode share the partition), no shuffle before the final sort. */
  def mmDecodePng(spark: SparkSession, dir: String): DataFrame = {
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(payloadSchema)
    val payloads = spread(Tables(spark, dir).documents.select(col("doc_id")))
      .mapPartitions { rows =>
        initImageIO()
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => writer.dispose()))
        rows.map { r =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          fillMd5Pixels(img, md, r.getLong(0).toString)
          Row(r.getLong(0), pngEncode(writer, img))
        }
      }(enc)
    decodePngFeatures(payloads).orderBy("doc_id")
  }

  /** Schema of [[mmDecodeJpeg]]: dims + pixel sum of the decoded
    * image, plus per-doc decode-fidelity stats against the known
    * source pixels (max and summed absolute per-pixel error). */
  val jpegFidelitySchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("px_sum", LongType),
    StructField("max_abs_err", LongType),
    StructField("sum_abs_err", LongType)))

  /** §2.6 mm_decode_jpeg — the REAL LOSSY decode lifecycle (VERDICT r7
    * #3): synthesize the same md5-derived 8×8 gray card as
    * [[mmDecodePng]], encode it with the JDK's actual JPEG writer at a
    * FIXED explicit quality, decode the JPEG bytes back through the
    * JDK's actual JPEG reader, and emit dims + pixel sum + exact
    * per-pixel error stats against the known source. Lossy decode is
    * not hash-stable across engines, so there is deliberately NO
    * DuckDB oracle (rows-only check, declared); the quantitative gate
    * lives in MultimodalSpec instead — exact dims, determinism across
    * runs, and a bounded per-pixel error (the tolerance a lossy codec
    * is allowed). This shrinks [[mmDecodeStub]]'s domain to the codecs
    * the JDK genuinely does not ship (JPEG2000, video/audio frames).
    * Scale shape: one narrow scan, one fused map stage (synth + encode
    * + decode share the partition, writer amortized per partition), no
    * shuffle before the final sort. */
  def mmDecodeJpeg(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(jpegFidelitySchema)
    spread(Tables(spark, dir).documents.select(col("doc_id")))
      .mapPartitions { rows =>
        initImageIO()
        val md = java.security.MessageDigest.getInstance("MD5")
        // Writer AND reader amortized per partition (a per-row
        // ImageIO.read pays a reader-registry scan and a disk-backed
        // FileCache stream per row — review finding, r8; mmFrameSample
        // set the pattern). Teardown on task completion, not iterator
        // exhaustion (the mmFrameSample listener rationale).
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("jpeg").next()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            writer.dispose()
            reader.dispose()
          })
        // Explicit fixed quality: the default is writer-version
        // dependent; determinism of the whole loop is spec-pinned. The
        // param is writer-scoped and row-invariant — partition setup,
        // not the per-row loop (second review pass, r8).
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.9f)
        rows.map { r =>
          val id = r.getLong(0)
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          fillMd5Pixels(img, md, id.toString)
          val bos = new java.io.ByteArrayOutputStream()
          val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try {
            writer.setOutput(out)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
          } finally out.close()
          // Decode through the amortized reader over an in-memory
          // stream; reader.read throws (never returns null) on a bad
          // payload — and the bytes here are the writer's own output,
          // so a throw is a codec bug the gate SHOULD surface.
          val in = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val back =
            try { reader.setInput(in); reader.read(0) }
            finally in.close()
          val src = img.getRaster
          val dec = back.getRaster
          var sum = 0L
          var maxErr = 0L
          var sumErr = 0L
          var rr = 0
          while (rr < back.getHeight) {
            var c = 0
            while (c < back.getWidth) {
              val d = dec.getSample(c, rr, 0).toLong
              val e = (d - src.getSample(c, rr, 0)).abs
              sum += d
              sumErr += e
              if (e > maxErr) maxErr = e
              c += 1
            }
            rr += 1
          }
          Row(id, back.getWidth, back.getHeight, sum, maxErr, sumErr)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** Schema of [[decodeWavFeatures]]: stream parameters as DECODED
    * from the container header plus integer-exact sample stats; all
    * features null when a payload does not parse as WAV (corrupt
    * bytes degrade to a null row, never fail the scan). */
  val wavFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("s_sum", LongType),
    StructField("s_min", LongType),
    StructField("s_max", LongType)))

  /** The shared sample-derivation law the WAV decode oracle mirrors
    * (the [[fillMd5Pixels]] pattern, VERDICT r8 missing #2): sample
    * c of row r (r∈0..1, c∈0..7) is the SIGNED 16-bit value
    * `byte(2c)·256 + byte(2c+1)` of md5(id + "_w" + r) — 16 samples
    * per doc, the exact bytes the DuckDB oracle reads back as hex
    * nibbles. Encoded to a REAL RIFF/WAVE container (canonical
    * 44-byte header, PCM s16le mono 8 kHz), so the decode side walks
    * genuine container bytes. */
  private[graft] def synthWav(md: java.security.MessageDigest,
      id: Long): Array[Byte] = {
    val pcm = new Array[Byte](32)
    var r = 0
    while (r < 2) {
      md.reset()
      val dg = md.digest(
        s"${id}_w$r".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var c = 0
      while (c < 8) {
        // Value law is big-endian over the digest bytes; the PCM
        // container stores little-endian, so the byte ORDER swaps
        // here and the decoder swaps it back.
        pcm(r * 16 + 2 * c) = dg(2 * c + 1)
        pcm(r * 16 + 2 * c + 1) = dg(2 * c)
        c += 1
      }
      r += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(16000) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  /** REAL audio decode over a (doc_id, payload binary) frame —
    * uncompressed PCM inside a WAV container needs NO external codec:
    * `javax.sound.sampled` ships IN the JDK, so the header walk and
    * frame extraction here are the real ones (VERDICT r8 missing #2 —
    * this shrinks [[mmDecodeStub]]'s audio domain to COMPRESSED
    * codecs only). Features are integer-exact: the stream parameters
    * the decoder read from the header plus signed-sample sum/min/max.
    * Undecodable payloads yield a null-feature row (same degrade
    * contract as [[decodePngFeatures]]). */
  def decodeWavFeatures(payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(wavFeatureSchema)
    payloads.mapPartitions { rows =>
      // Provider dispatch amortized PER PARTITION (r13, VERDICT r12
      // wrong #1): AudioSystem.getAudioInputStream consults the
      // provider registry through a synchronized static
      // (JDK13Services.getProviders) on EVERY call, so once the r12
      // spread ran this map in N concurrent tasks the per-row lock
      // convoy cost more than the decode (mm_decode_wav 0.85→2.29 s).
      // ServiceLoader here walks the SAME provider SPI
      // (javax.sound.sampled.spi.AudioFileReader) AudioSystem
      // dispatches through, once per partition; the per-row loop
      // below replicates AudioSystem's contract — first reader that
      // does not reject the stream wins (mark/reset per attempt,
      // UnsupportedAudioFileException = "not mine").
      import scala.jdk.CollectionConverters._
      val readers = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toArray
      def openStream(bytes: Array[Byte])
          : javax.sound.sampled.AudioInputStream = {
        val bis = new java.io.ByteArrayInputStream(bytes)
        var i = 0
        while (i < readers.length) {
          bis.reset()
          try return readers(i).getAudioInputStream(bis)
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
          }
          i += 1
        }
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          "Stream of unsupported format")
      }
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val decoded =
          if (bytes == null) None
          else
            try {
              val ais = openStream(bytes)
              try {
                val fmt = ais.getFormat
                val enc16 = fmt.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                  fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
                if (!enc16) None
                else {
                  val data = ais.readAllBytes()
                  val n = data.length / 2
                  var i = 0
                  var sum = 0L
                  var mn = Long.MaxValue
                  var mx = Long.MinValue
                  while (i < n) {
                    val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toLong
                    sum += s
                    if (s < mn) mn = s
                    if (s > mx) mx = s
                    i += 1
                  }
                  Some((n, fmt.getSampleRate.toInt, fmt.getChannels,
                    fmt.getSampleSizeInBits, sum, mn, mx))
                }
              } finally ais.close()
            } catch {
              // UnsupportedAudioFileException + the unchecked throws a
              // malformed-but-signed RIFF can produce — same NonFatal
              // degrade rationale as the image readers (review, r7).
              case scala.util.control.NonFatal(_) => None
            }
        decoded match {
          case Some((n, sr, ch, bits, sum, mn, mx)) =>
            Row(id, n, sr, ch, bits, sum, mn, mx)
          case None => Row(id, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** §2.6 mm_decode_wav — the REAL LOSSLESS audio decode lifecycle:
    * synthesize a deterministic PCM WAV per document ([[synthWav]]
    * law), run it through the JDK's actual RIFF/WAVE parser, and
    * reduce the DECODED samples to integer-exact features. The DuckDB
    * oracle recomputes the expected stats straight from the md5 hex
    * math with no audio machinery anywhere — a single bit lost or
    * re-ordered by the container walk (endianness, header offsets,
    * frame size) breaks the hash gate. Scale shape: one narrow scan,
    * one fused map stage (synth + decode share the partition), no
    * shuffle before the final sort. */
  def mmDecodeWav(spark: SparkSession, dir: String): DataFrame = {
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(payloadSchema)
    // NO spread here (r13, VERDICT r12 wrong #1): synth+decode are
    // trivially cheap per row (16 samples, no codec registry churn
    // with the per-partition reader below), and the r12 doc_id spread
    // made this leg 2.7× slower — the per-task fixtures outweigh the
    // parallelism at any width the narrow scan supports.
    val payloads = Tables(spark, dir).documents.select(col("doc_id"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map(r => Row(r.getLong(0), synthWav(md, r.getLong(0))))
      }(enc)
    decodeWavFeatures(payloads).orderBy("doc_id")
  }

  /** Container-format classification over the binary payloads via the
    * native graft_image_meta header parser. On the test corpus every
    * payload is text bytes, so the oracle asserts exactly that NOTHING
    * misparses as an image — the parser's positive paths are pinned by
    * handcrafted PNG/JPEG/GIF bytes in MultimodalSpec. */
  def mmImageMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(expr("coalesce(graft_image_meta(payload).format, 'unknown')").as("format"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"))
      .orderBy("format")

  /** Audio-container classification via the native graft_audio_meta
    * header parser (WAV RIFF walk + FLAC STREAMINFO). Same contract as
    * [[mmImageMeta]]: corpus payloads are text bytes, so the oracle
    * pins that NOTHING misparses as audio; the positive paths are
    * pinned by handcrafted WAV/FLAC bytes in MultimodalSpec. */
  def mmAudioMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(expr("coalesce(graft_audio_meta(payload).format, 'unknown')").as("format"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"))
      .orderBy("format")

  /** Video-container classification via the native graft_video_meta
    * header parser (MP4/ISO-BMFF box walk + AVI RIFF hdrl/avih). Same
    * contract as [[mmImageMeta]]/[[mmAudioMeta]]: corpus payloads are
    * text bytes, so the oracle pins that NOTHING misparses as video;
    * the positive paths (brand, dims, duration) are pinned by
    * handcrafted MP4/AVI bytes in MultimodalSpec. */
  def mmVideoMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(expr("coalesce(graft_video_meta(payload).format, 'unknown')").as("format"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"))
      .orderBy("format")

  /** Archive (TAR shard) classification via the native graft_tar_meta
    * ustar walker — the WebDataset-shard ingest primitive (list a
    * shard's members without extracting). Same contract as
    * [[mmImageMeta]]: corpus payloads are text bytes, so the oracle
    * pins that NOTHING misparses as an archive; the positive paths
    * (member walk, checksum, lying-size and truncation rejection) are
    * pinned by handcrafted tar bytes in MultimodalSpec. */
  def mmArchiveMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(expr("coalesce(graft_tar_meta(payload).format, 'unknown')").as("format"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"))
      .orderBy("format")

  /** The shard payload table shared by [[mmShardRoundtrip]] and
    * [[mmShardIndex]]: 64 docs per shard, members "doc<id>.txt" in
    * doc_id order, real ustar bytes via TarMeta.write. One
    * groupByKey(shard) mapGroups builds each payload — the documented
    * imperative-constructor exception (the mm_decode_stub posture,
    * writer-side); per-shard memory is bounded by the fixed shard
    * capacity, exactly how a real shard writer sizes itself
    * (WebDataset targets fixed members-per-shard). */
  private[graft] def shardPayloads(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), expr("doc_id div 64").as("shard"))
      .as[(Long, String, Long)]
      .groupByKey(_._3)
      .mapGroups { (shard, it) =>
        val members = it.toSeq.sortBy(_._1)
          .map { case (id, text, _) => (s"doc$id.txt", text.getBytes("UTF-8")) }
        (shard, graft.functions.TarMeta.write(members))
      }
      .toDF("shard", "payload")
  }

  /** WebDataset-style shard ROUND-TRIP: pack documents into real ustar
    * shard payloads, then walk the bytes back with the native
    * graft_tar_meta parser and report per shard. The walker validates
    * magic + checksum on every header, so a writer defect surfaces as
    * a null format, a wrong member count, or a byte-total mismatch
    * against the oracle, which derives the expected metadata straight
    * from the documents table (shard grouping + text byte lengths)
    * without ever seeing tar bytes. */
  def mmShardRoundtrip(spark: SparkSession, dir: String): DataFrame =
    shardPayloads(spark, dir)
      .select(col("shard"), expr("graft_tar_meta(payload)").as("m"))
      .select(col("shard"), col("m.format").as("format"),
        col("m.n_members").as("n_members"), col("m.n_files").as("n_files"),
        col("m.data_bytes").as("data_bytes"),
        col("m.first_name").as("first_name"))
      .orderBy("shard")

  /** Shard RANDOM-ACCESS index — the per-member (name, data offset,
    * size) table a WebDataset serving layer derives once so training
    * workers range-read single samples out of multi-GB shards instead
    * of streaming them: the native graft_tar_members walker lists each
    * written shard's members from the actual bytes, while the oracle
    * computes every offset ARITHMETICALLY from the documents table
    * (512-byte header + 512-aligned data, cumulative per shard in
    * doc_id order) — so a one-byte drift anywhere in the writer's
    * layout breaks the gate. */
  def mmShardIndex(spark: SparkSession, dir: String): DataFrame =
    shardPayloads(spark, dir)
      .select(col("shard"), explode(expr("graft_tar_members(payload)")).as("m"))
      .select(col("shard"), col("m.name").as("name"),
        col("m.offset").as("offset"), col("m.size").as("size"))
      .orderBy("shard", "offset")

  /** Shard member EXTRACTION as pure expressions — the read-back that
    * completes the shard lifecycle (write → walk → index → extract):
    * each member's text is sliced straight out of the shard binary
    * with substring(payload, offset+1, size) and decoded — codegen'd
    * column operations, no imperative reader — and the doc id parses
    * back out of the member name. The oracle is simply the documents
    * table: every byte of the corpus must survive
    * tar-write → member-index → binary-slice → UTF-8-decode exactly. */
  def mmShardExtract(spark: SparkSession, dir: String): DataFrame =
    shardPayloads(spark, dir)
      .select(col("payload"), explode(expr("graft_tar_members(payload)")).as("m"))
      .select(
        expr("CAST(substr(m.name, 4, length(m.name) - 7) AS BIGINT)").as("doc_id"),
        expr("decode(substring(payload, CAST(m.offset + 1 AS INT), CAST(m.size AS INT)), 'UTF-8')").as("text"))
      .orderBy("doc_id")

  /** One 16-bit dHash band (band i covers sample-grid rows 2i, 2i+1)
    * over the text-byte payload — ONE Scala builder emitting both
    * engines' SQL (only the integer-division token differs, the q34
    * div-vs-`//` note): cell (r, c) of the 8×9 grid samples the byte
    * at 1 + (cell·(n−1)) div 71 — the fixed-grid sampling that plays
    * the "resize to 9×8" role of a real image dHash — and bit j is the
    * horizontal gradient sign px(r,c) < px(r,c+1). All integer/CASE
    * arithmetic, identical in both engines. */
  private def phashBandSql(i: Int, idiv: String): String =
    (0 until 16).map { j =>
      val r = 2 * i + j / 8
      val c = j % 8
      val cell = r * 9 + c
      s"(CASE WHEN ascii(substr(text, 1 + ($cell * (n - 1)) $idiv 71, 1))" +
        s" < ascii(substr(text, 1 + (${cell + 1} * (n - 1)) $idiv 71, 1))" +
        s" THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Hamming distance between two 4×16-bit band signatures — the xor
    * spelling is the one engine-dialect split (Spark `^`, DuckDB
    * `xor()`), so the template takes it as a parameter. */
  private def phashHammingSql(xor: (String, String) => String): String =
    (0 until 4).map(i => s"bit_count(${xor(s"a$i", s"c$i")})").mkString(" + ")

  /** Perceptual-hash near-dup detection over the binary payloads — the
    * §2.6 → §2.4 bridge: the image-dedup pipeline shape (decode →
    * resize → dHash → Hamming-band LSH → verify) with the decode an
    * honest identity over the text bytes (the mm_decode_stub posture:
    * no image libs in this container, so the 8×9 sampling grid IS the
    * resize and the byte value IS the pixel). The 64-bit gradient hash
    * is built directly as FOUR 16-bit band integers, which makes the
    * LSH structural: candidates share at least one exact band, and
    * verification is four bit_count(xor) terms. The shortlist keeps
    * candidates at Hamming ≤ 24 of 64 — 2σ below the independent-bits
    * mean of 32 (σ = 4), i.e. structurally similar rather than
    * band-lucky; exact byte duplicates land at 0 (sf0.1 has some) and
    * the decision threshold belongs downstream, the
    * dedup_threshold_sweep posture.
    *
    * Scale: the band table is one codegen'd projection checkpointed
    * once (three consumers — both join sides and verification, the
    * dedupMinhashLsh discipline); the band join keys distribute
    * uniformly (16 random-ish bits), pair volume is collision-bounded;
    * everything downstream is integer ops on 4 small ints per pair. */
  def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val bands = (0 until 4).map(i =>
      expr(phashBandSql(i, "div")).as(s"b$i"))
    val h = Tables(spark, dir).documents
      .filter(length(col("text")) >= 72)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      .select(col("doc_id") +: bands: _*)
      .localCheckpoint()
    val sig = h.select(col("doc_id"),
      posexplode(array((0 until 4).map(i => col(s"b$i")): _*)))
      .select(col("doc_id"), col("pos").as("j"), col("col").as("bv"))
    val cand = sig.as("a")
      .join(sig.as("b"),
        col("a.j") === col("b.j") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val left = h.select(col("doc_id").as("id1") +:
      (0 until 4).map(i => col(s"b$i").as(s"a$i")): _*)
    val right = h.select(col("doc_id").as("id2") +:
      (0 until 4).map(i => col(s"b$i").as(s"c$i")): _*)
    cand.join(left, "id1").join(right, "id2")
      .withColumn("hamming",
        expr(phashHammingSql((x, y) => s"$x ^ $y")).cast("long"))
      .filter(col("hamming") <= 24)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  private[operators] def mmPhashDedupOracle: String = {
    val bandCols = (0 until 4)
      .map(i => s"${phashBandSql(i, "//")} AS b$i").mkString(",\n    ")
    val sigRows = (0 until 4)
      .map(i => s"SELECT doc_id, $i AS j, b$i AS bv FROM h")
      .mkString(" UNION ALL ")
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |  WHERE length(text) >= 72),
       |h AS MATERIALIZED (
       |  SELECT doc_id,
       |    $bandCols
       |  FROM d),
       |sig AS ($sigRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM sig a JOIN sig b ON a.j = b.j AND a.bv = b.bv
       |    AND a.doc_id < b.doc_id),
       |v AS (
       |  SELECT id1, id2,
       |    CAST(${phashHammingSql((x, y) => s"xor($x, $y)")} AS BIGINT) AS hamming
       |  FROM cand
       |  JOIN (SELECT doc_id, b0 AS a0, b1 AS a1, b2 AS a2, b3 AS a3 FROM h) x
       |    ON cand.id1 = x.doc_id
       |  JOIN (SELECT doc_id, b0 AS c0, b1 AS c1, b2 AS c2, b3 AS c3 FROM h) y
       |    ON cand.id2 = y.doc_id)
       |SELECT id1, id2, hamming FROM v WHERE hamming <= 24
       |ORDER BY id1, id2""".stripMargin
  }

  /** DuckDB hex-nibble pixel read — the oracle-side half of
    * [[fillMd5Pixels]]'s law (value of digest byte c = hex chars
    * 2c+1, 2c+2 of column `h`), defined ONCE for all three decode
    * oracles (review finding, r7). */
  private def hexPixelSql: String =
    """(strpos('0123456789abcdef', substr(h, CAST(c * 2 + 1 AS INTEGER), 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(h, CAST(c * 2 + 2 AS INTEGER), 1)) - 1)""".stripMargin

  /** The doc-seeded 8×8 pixel table as shared CTE text (mm_decode_png
    * and mm_resize both start here). */
  private def docPixelCtes: String =
    s"""rws AS (
       |  SELECT doc_id, r,
       |    md5(CAST(doc_id AS VARCHAR) || '_' || CAST(r AS VARCHAR)) AS h
       |  FROM documents, (SELECT unnest(range(0, 8)) AS r)),
       |px AS (
       |  SELECT doc_id, r, c,
       |    $hexPixelSql AS v
       |  FROM rws, (SELECT unnest(range(0, 8)) AS c))""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_decode_png" ->
      s"""WITH $docPixelCtes
        |SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  CAST(sum(v) AS BIGINT) AS px_sum,
        |  CAST(min(v) AS BIGINT) AS px_min,
        |  CAST(max(v) AS BIGINT) AS px_max,
        |  CAST(sum(CASE WHEN r < 4 AND c < 4 THEN v ELSE 0 END) AS BIGINT) AS q_tl,
        |  CAST(sum(CASE WHEN r < 4 AND c >= 4 THEN v ELSE 0 END) AS BIGINT) AS q_tr,
        |  CAST(sum(CASE WHEN r >= 4 AND c < 4 THEN v ELSE 0 END) AS BIGINT) AS q_bl,
        |  CAST(sum(CASE WHEN r >= 4 AND c >= 4 THEN v ELSE 0 END) AS BIGINT) AS q_br
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      s"""WITH $docPixelCtes
        |SELECT doc_id, CAST(r // 2 AS INTEGER) AS r, CAST(c // 2 AS INTEGER) AS c,
        |  CAST(sum(v) // 4 AS BIGINT) AS v
        |FROM px GROUP BY doc_id, r // 2, c // 2
        |ORDER BY doc_id, r, c""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH d AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS INTEGER) AS n_frames
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, n_frames, CAST(f AS INTEGER) AS frame
        |  FROM d, (SELECT unnest(range(0, 8)) AS f)
        |  WHERE f < n_frames AND f % 2 = 0),
        |rws AS (
        |  SELECT doc_id, n_frames, frame, r,
        |    md5(CAST(doc_id AS VARCHAR) || '_f' || CAST(frame AS VARCHAR)
        |        || '_' || CAST(r AS VARCHAR)) AS h
        |  FROM fr, (SELECT unnest(range(0, 8)) AS r)),
        |px AS (
        |  SELECT doc_id, n_frames, frame,
        |    $hexPixelSql AS v
        |  FROM rws, (SELECT unnest(range(0, 8)) AS c))
        |SELECT doc_id, n_frames, frame, CAST(sum(v) AS BIGINT) AS px_sum
        |FROM px GROUP BY doc_id, n_frames, frame
        |ORDER BY doc_id, frame""".stripMargin,
    "mm_decode_wav" ->
      """WITH rws AS (
        |  SELECT doc_id, r,
        |    md5(CAST(doc_id AS VARCHAR) || '_w' || CAST(r AS VARCHAR)) AS h
        |  FROM documents, (SELECT unnest(range(0, 2)) AS r)),
        |by AS (
        |  SELECT doc_id, r, i,
        |    (strpos('0123456789abcdef', substr(h, CAST(i * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(h, CAST(i * 2 + 2 AS INTEGER), 1)) - 1) AS b
        |  FROM rws, (SELECT unnest(range(0, 16)) AS i)),
        |sv AS (
        |  SELECT hi.doc_id,
        |    CASE WHEN hi.b * 256 + lo.b >= 32768
        |         THEN hi.b * 256 + lo.b - 65536
        |         ELSE hi.b * 256 + lo.b END AS s
        |  FROM by hi JOIN by lo
        |    ON hi.doc_id = lo.doc_id AND hi.r = lo.r AND lo.i = hi.i + 1
        |  WHERE hi.i % 2 = 0)
        |SELECT doc_id, CAST(16 AS INTEGER) AS n_samples,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels, CAST(16 AS INTEGER) AS bits,
        |  CAST(sum(s) AS BIGINT) AS s_sum,
        |  CAST(min(s) AS BIGINT) AS s_min,
        |  CAST(max(s) AS BIGINT) AS s_max
        |FROM sv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_phash_dedup" -> mmPhashDedupOracle,
    "mm_shard_extract" ->
      "SELECT doc_id, text FROM documents ORDER BY doc_id",
    "mm_shard_index" ->
      """WITH d AS (
        |  SELECT doc_id // 64 AS shard, doc_id,
        |         octet_length(encode(text)) AS size,
        |         'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS name
        |  FROM documents),
        |o AS (
        |  SELECT shard, name, size,
        |    512 + coalesce(sum(512 + ((size + 511) // 512) * 512) OVER
        |      (PARTITION BY shard ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS "offset"
        |  FROM d)
        |SELECT shard, name, CAST("offset" AS BIGINT) AS "offset",
        |  CAST(size AS BIGINT) AS size
        |FROM o ORDER BY shard, "offset"""".stripMargin,
    "mm_shard_roundtrip" ->
      """SELECT doc_id // 64 AS shard, 'tar' AS format,
        |  CAST(count(*) AS INTEGER) AS n_members,
        |  CAST(count(*) AS INTEGER) AS n_files,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS data_bytes,
        |  'doc' || CAST(min(doc_id) AS VARCHAR) || '.txt' AS first_name
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,
    "mm_archive_meta" ->
      "SELECT 'unknown' AS format, count(*) AS n FROM documents",
    "mm_video_meta" ->
      "SELECT 'unknown' AS format, count(*) AS n FROM documents",
    "mm_audio_meta" ->
      "SELECT 'unknown' AS format, count(*) AS n FROM documents",
    "mm_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | substr(text, 1, 4) AS prefix,
        | CAST(octet_length(encode(text)) AS BIGINT) % 16 AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_image_meta" ->
      "SELECT 'unknown' AS format, count(*) AS n FROM documents",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta(_, _)),
    "mm_image_meta" -> (mmImageMeta(_, _)),
    "mm_audio_meta" -> (mmAudioMeta(_, _)),
    "mm_video_meta" -> (mmVideoMeta(_, _)),
    "mm_archive_meta" -> (mmArchiveMeta(_, _)),
    "mm_shard_roundtrip" -> (mmShardRoundtrip(_, _)),
    "mm_phash_dedup" -> (mmPhashDedup(_, _)),
    "mm_shard_index" -> (mmShardIndex(_, _)),
    "mm_shard_extract" -> (mmShardExtract(_, _)),
    // No oracle entry: the stubbed decode isn't SQL-expressible, so the
    // driver records the weaker rows-only check; MultimodalSpec asserts
    // determinism and batch shape. (The REAL decode lifecycles are
    // mm_decode_png and mm_decode_wav — fully oracle-gated — and
    // mm_decode_jpeg — tolerance-gated in MultimodalSpec, lossy decode
    // not being hash-stable; the stub remains as the documented FFI
    // shape for the codecs the JDK does not ship: JPEG2000 and
    // COMPRESSED video/audio frames.)
    "mm_decode_stub" -> (mmDecodeStub(_, _)),
    "mm_decode_png" -> (mmDecodePng(_, _)),
    "mm_decode_wav" -> (mmDecodeWav(_, _)),
    // Rows-only by design (VERDICT r7 #3): lossy JPEG decode has no
    // hash-stable SQL unrolling; the quantitative gate is
    // MultimodalSpec's exact-dims + bounded-per-pixel-error +
    // determinism panel.
    "mm_decode_jpeg" -> (mmDecodeJpeg(_, _)),
    "mm_frame_sample" -> (mmFrameSample(_, _)),
    "mm_resize" -> (mmResize(_, _)),
  )
}
