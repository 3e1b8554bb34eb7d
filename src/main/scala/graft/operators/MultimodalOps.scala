package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside. The testdata has no real media, so the payload is the
  * UTF-8 encoding of `documents.text` — the point is that the Spark-side
  * plumbing (schema, batch iteration, partition-friendly bucketing) is
  * real and oracle-checked; the decoder itself is a clearly-marked
  * deterministic stub (no image/audio libs in this container).
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

  val oracles: Map[String, String] = Map(
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
    "mm_shard_index" -> (mmShardIndex(_, _)),
    "mm_shard_extract" -> (mmShardExtract(_, _)),
    // No oracle entry: the stubbed decode isn't SQL-expressible, so the
    // driver records the weaker rows-only check; MultimodalSpec asserts
    // determinism and batch shape.
    "mm_decode_stub" -> (mmDecodeStub(_, _)),
  )
}
