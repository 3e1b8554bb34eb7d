package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables

/** Source/sink plumbing (SURVEY.md §2.7): csv + jsonl round-trips and
  * partitioned parquet writes.
  *
  * Scale posture: all readers take an explicit schema (no inference scan
  * — a 100 TB csv must not be read twice), all writers go through the
  * DataFrameWriter so they distribute per-partition, and the partitioned
  * writer pairs `partitionBy` with `sortWithinPartitions` so downstream
  * scans get both partition pruning and clustered row groups.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Explicit-schema csv read: header consumed, no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Explicit-schema jsonl read (one JSON object per line). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet sink: hive-style partition dirs on `partCols`,
    * rows clustered by `sortCols` inside each file. */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String], sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Backing-file location for a session-keyed bucketed table — ONE
    * definition of the layout root shared by every catalog writer and
    * by [[dropBucketedTable]]'s delete path (and by catalog builders
    * living outside this object, e.g. DedupOps' MinHash catalogs). */
  private[graft] def bucketedPath(tbl: String): String =
    s"$tmpRoot/graft_bucketed/$tbl"

  /** Bucketed catalog-table sink: the write-side half of the 100 TB
    * co-located-join posture. Two tables bucketed+sorted on the same
    * join key join with ZERO exchanges and zero sorts (asserted in
    * FormatsSpec) — at scale this is what turns the orders⋈lineitem
    * shuffle into a local merge per bucket. */
  def writeBucketed(df: DataFrame, table: String,
      bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", bucketedPath(table))
      .saveAsTable(table)

  /** Drop a bucketed catalog table AND its backing files. Tables
    * written by [[writeBucketed]] are EXTERNAL (they carry a `path`
    * option), so a plain DROP TABLE unregisters the name but leaves the
    * parquet behind — the file-accumulation half of the ADVICE r4
    * session-index concern. Safe to call for a name that was never
    * created. */
  def dropBucketedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = java.nio.file.Paths.get(bucketedPath(table))
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds directory handles until closed (the API's
      // try-with-resources contract), and a file vanishing mid-walk
      // throws from the iterator — close deterministically and let a
      // concurrent deletion count as success.
      val walk = java.nio.file.Files.walk(dir)
      val paths =
        try walk.iterator().asScala.toSeq.reverse
        catch { case _: java.io.UncheckedIOException => Seq.empty }
        finally walk.close()
      paths.foreach { p =>
        try java.nio.file.Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Registry of every session-keyed catalog table built through
    * [[sessionTable]]: (session identity, table name). ONE pattern and
    * ONE cleanup path — the r5 review found three hand-rolled copies
    * of the memo+name+existence-check dance, one of which
    * (fingerprintCatalog) had already escaped the cleanup routine. */
  private val sessionTables =
    scala.collection.mutable.Set.empty[(Int, String)]

  /** Build-once-per-(session, dir) EXTERNAL bucketed catalog table.
    * The name carries the FULL dir md5 + session identity (truncated-
    * hash names collide silently; cross-session Overwrite deletes
    * files under in-flight scans; identityHashCode reuse after GC
    * false-hits a memo), existence is re-checked on memo hits, and
    * every table built here is REGISTERED so [[dropSessionTables]]
    * covers it by construction. `build` receives the table name and
    * must `saveAsTable` it (via [[writeBucketed]] or equivalent). */
  def sessionTable(spark: SparkSession, dir: String, prefix: String)
      (build: String => Unit): DataFrame = {
    val sid = System.identityHashCode(spark)
    val tbl = prefix +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString +
      s"_$sid"
    sessionTables.synchronized {
      if (!sessionTables.contains((sid, tbl)) ||
          !spark.catalog.tableExists(tbl)) {
        build(tbl)
        sessionTables += ((sid, tbl))
      }
    }
    spark.table(tbl)
  }

  /** Drop every session-keyed table THIS session registered (catalog
    * entries AND backing files) and clear the memos — the session-
    * close cleanup (ADVICE r4); Bench calls it in teardown. Idempotent. */
  def dropSessionTables(spark: SparkSession): Unit = {
    val sid = System.identityHashCode(spark)
    sessionTables.synchronized {
      sessionTables.filter(_._1 == sid).toSeq.foreach { case (_, tbl) =>
        dropBucketedTable(spark, tbl)
        sessionTables -= ((sid, tbl))
      }
    }
  }

  /** Bucket count for the fact-table layout. Small here so sf0.001
    * still populates every bucket; at 100 TB you size this so one
    * bucket's files fit an executor's scan budget (thousands), and the
    * count — like the bucketing column — must MATCH across every table
    * you co-locate, because Spark only elides the exchange when both
    * sides hash into identical bucket lattices. */
  val FactBuckets = 8

  private val factCache =
    scala.collection.mutable.Map.empty[(Int, String), (String, String)]

  /** orders + lineitem written ONCE per (session, corpus dir) as
    * catalog tables bucketed AND sorted by orderkey — the layout-at-
    * rest that turns every orderkey join/aggregate in the suite into a
    * local merge per bucket (zero exchanges, zero sorts). The write is
    * the one-time layout cost a warehouse pays at ingest, not per
    * query; the first bucketed query in a session pays it here (the
    * bench figure for the *_bucketed twins therefore includes it). */
  def bucketedFacts(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val t = Tables(spark, dir)
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val (ot, lt) = (s"graft_orders_b_$suffix", s"graft_lineitem_b_$suffix")
    factCache.synchronized {
      if (!factCache.contains((System.identityHashCode(spark), dir))) {
        // repartition on the bucket key first: it uses the same Murmur3
        // hash as the bucket lattice, so each write task holds exactly
        // one bucket → ONE sorted file per bucket. With several files
        // per bucket Spark keeps the scan's distribution but discards
        // its ordering (a multi-file bucket would need a merge), and
        // downstream SMJs re-sort — the layout would only buy half its
        // value.
        t.orders.repartition(FactBuckets, col("o_orderkey"))
          .write.mode(SaveMode.Overwrite)
          .bucketBy(FactBuckets, "o_orderkey").sortBy("o_orderkey")
          .option("path", bucketedPath(ot)).saveAsTable(ot)
        t.lineitem.repartition(FactBuckets, col("l_orderkey"))
          .write.mode(SaveMode.Overwrite)
          .bucketBy(FactBuckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", bucketedPath(lt)).saveAsTable(lt)
        factCache((System.identityHashCode(spark), dir)) = (ot, lt)
      }
    }
    (spark.table(ot), spark.table(lt))
  }

  /** The existing corpus's DISTINCT content fingerprints (md5(text) of
    * the persisted source='src0' documents) written ONCE per (session,
    * dir) as a catalog table bucketed AND sorted by the hash — the
    * fingerprint index dedup_incremental's production claim rests on:
    * each increment anti-joins against this layout with ZERO exchange
    * on the catalog side (only the batch shuffles, into the catalog's
    * bucket lattice), so the recurring cost is O(increment). The one
    * corpus scan + distinct happens HERE, at catalog-build (ingest)
    * time — the cost a warehouse pays once per corpus version, exactly
    * like [[bucketedFacts]] — never per batch. Built through
    * [[sessionTable]], so [[dropSessionTables]] reclaims it. */
  def fingerprintCatalog(spark: SparkSession, dir: String): DataFrame =
    sessionTable(spark, dir, "graft_fp_b_") { tbl =>
      Tables(spark, dir).documents
        .filter(col("source") === "src0")
        .select(md5(col("text")).as("h"))
        .distinct()
        // one sorted file per bucket (same rationale as bucketedFacts:
        // repartition on the bucket key shares the bucket lattice's
        // Murmur3 hash, so the scan keeps its ordering claim)
        .repartition(FactBuckets, col("h"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(FactBuckets, "h").sortBy("h")
        .option("path", bucketedPath(tbl)).saveAsTable(tbl)
    }

  private val eventsCache =
    scala.collection.mutable.Map.empty[(Int, String), String]

  /** events written ONCE per (session, dir) bucketed AND sorted by
    * (user_id, tus, event_id) — the at-rest layout for per-user event
    * analytics: every sessionize/funnel/retention-style window or
    * groupBy on user_id collapses onto the bucket distribution (no
    * exchange), and because the sort prefix matches the window order,
    * the per-partition sort goes too. Timestamps are materialized as
    * microsecond longs (`tus`) so the layout is self-contained. */
  def bucketedEvents(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val tbl = s"graft_events_b_$suffix"
    eventsCache.synchronized {
      if (!eventsCache.contains((System.identityHashCode(spark), dir))) {
        Tables(spark, dir).events
          .select(col("event_id"), unix_micros(col("ts")).as("tus"),
            col("user_id"), col("event_type"), col("value"))
          .repartition(FactBuckets, col("user_id"))
          .write.mode(SaveMode.Overwrite)
          .bucketBy(FactBuckets, "user_id")
          .sortBy("user_id", "tus", "event_id")
          .option("path", bucketedPath(tbl)).saveAsTable(tbl)
        eventsCache((System.identityHashCode(spark), dir)) = tbl
      }
    }
    spark.table(tbl)
  }

  /** Z-order grid width per dimension (16 bits → 32-bit z-values). */
  val ZBits = 16

  /** Morton interleave of two [[ZBits]]-bit grid coordinates (dim-0
    * bits land at even positions). Pure integer expression — codegen'd,
    * 2·ZBits shift/mask terms, no UDF. Bijective on the grid
    * (FunctionPropertiesSpec round-trips it), so z-sorting loses no
    * distinction between cells. */
  private[graft] def zInterleave(u: String, h: String): String =
    (0 until ZBits).map(i =>
      s"shiftleft(shiftright($u, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($h, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")

  private val zorderCache =
    scala.collection.mutable.Map.empty[(Int, String), (String, String)]

  /** events written ONCE per (session, dir) Z-ORDER clustered on
    * (user_id, event-hour) — the multi-dimensional data-skipping layout
    * (Delta/Iceberg `OPTIMIZE ZORDER BY`) for the query family that
    * filters BOTH a user band and a time band: rows sort by the Morton
    * interleave of the two grid coordinates, so every file/row-group/
    * page covers a small RECTANGLE in (user, time) space and carries
    * tight min/max footer stats on BOTH columns — a single-column sort
    * can only give one dim tight stats. Filters still target the raw
    * `user_id`/`tus` columns (z is an ordering device, never a
    * predicate), so pushdown + page-level column-index pruning skip
    * everything outside the query rectangle.
    *
    * Each dimension is min/max-normalized onto a [[ZBits]]-bit grid
    * before interleaving (the Delta approach): raw bit-interleave
    * degenerates to a single-dim sort when one dim's varying bits sit
    * far below the other's (here: user ids are dense-small, epoch-hours
    * are large-with-low-bit-variance). The normalization stats are one
    * tiny ingest-time aggregate — the kind of stats a 100 TB ingest
    * already collects — collected to the driver as ONE row.
    *
    * Tiny pages (parquet.page.row.count.limit=128) make the page
    * column-index the pruning grain so the skipping is observable at
    * test scale; at 100 TB you'd keep default pages and let file +
    * row-group stats do the same job across thousands of files. Also
    * writes a time-sorted twin of the same rows — the conventional
    * log layout — so FormatsSpec can assert the z-layout reads
    * strictly fewer rows for a rectangle query than time-sorting does.
    * Returns (z-ordered, time-sorted) readers. */
  private[graft] def zorderLayouts(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (zp, tp) = zorderCache.synchronized {
      zorderCache.getOrElseUpdate((System.identityHashCode(spark), dir), {
        val suffix = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        val (zPath, tPath) = (tmp(s"events_zorder_$suffix"), tmp(s"events_tsort_$suffix"))
        val ev = Tables(spark, dir).events
          .select(col("event_id"), unix_micros(col("ts")).as("tus"),
            col("user_id"), col("event_type"), col("value"))
          .withColumn("hr", expr("tus div 3600000000"))
        val s = ev.agg(min("user_id"), max("user_id"), min("hr"), max("hr")).first()
        val grid = (1 << ZBits) - 1
        def gridded(c: String, lo: Long, hi: Long): String =
          if (hi > lo) s"(($c - ${lo}L) * $grid) div ${hi - lo}L" else "0L"
        val z = ev.withColumn("z", expr(zInterleave(
            gridded("user_id", s.getLong(0), s.getLong(1)),
            gridded("hr", s.getLong(2), s.getLong(3)))))
          .drop("hr")
        def write(df: DataFrame, sortCol: String, path: String): Unit =
          df.repartitionByRange(FactBuckets, col(sortCol))
            .sortWithinPartitions(sortCol)
            .write.mode(SaveMode.Overwrite)
            .option("parquet.page.row.count.limit", 128)
            .parquet(path)
        write(z, "z", zPath)
        write(z, "tus", tPath)
        (zPath, tPath)
      })
    }
    (spark.read.parquet(zp), spark.read.parquet(tp))
  }

  /** Rectangle query over the z-ordered events layout: a user band ×
    * a 3-day time band, aggregated per event type. Semantically the
    * layout is invisible (the oracle runs on the original events
    * table); the VALUE is in the plan + FormatsSpec's page-pruning
    * evidence — both predicates reach the parquet scan and the
    * z-clustering turns them into 2-dimensional page skipping. */
  def srcZorderScan(spark: SparkSession, dir: String): DataFrame =
    zorderLayouts(spark, dir)._1
      // Jan 10 00:00 ≤ ts < Jan 13 00:00 UTC, exact microsecond bounds
      .filter(col("user_id").between(3, 6) &&
        col("tus") >= 1704844800000000L && col("tus") < 1705104000000000L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .orderBy("event_type")

  private val manifestCache =
    scala.collection.mutable.Map.empty[(Int, String), (String, String)]

  /** events written ONCE per (session, dir) range-clustered into
    * [[FactBuckets]] files on user_id, PLUS a file-level stats
    * MANIFEST (file → min/max user_id, row count) derived in the same
    * ingest pass — the Iceberg/Delta planning primitive: at 100 TB a
    * table is millions of files, and opening every footer (or even
    * LISTING the directory) to plan one selective query dominates its
    * runtime; a manifest turns planning into a metadata-table filter
    * that never touches data files. The manifest is itself parquet
    * (one tiny file here; a manifest TREE at real scale), written
    * once like the bucketed layouts. Returns (dataPath, manifestPath). */
  private[graft] def manifestLayout(spark: SparkSession, dir: String)
      : (String, String) =
    manifestCache.synchronized {
      manifestCache.getOrElseUpdate((System.identityHashCode(spark), dir), {
        val suffix = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        val dataPath = tmp(s"events_manifest_data_$suffix")
        val manPath = tmp(s"events_manifest_meta_$suffix")
        // r12 (VERDICT r11 #4 — the src_bloom_prune two-sha plan flap,
        // adjudicated): this split used repartitionByRange, whose range
        // boundaries come from a reservoir sample SEEDED BY THE RDD ID —
        // a session-lifetime counter — so the file split depended on how
        // many RDDs the session had created before the build (one extra
        // in-boot retry or AQE replan upstream shifted every later id).
        // A shifted boundary moves a handful of rows across file edges,
        // which moves a probe key's bloom SURVIVOR COUNT, which changes
        // the executed plan's FileScan "(N paths)" metadata — the two
        // recurring shas. The split is now an explicit value-range
        // quantization of user_id (bucket = (user_id − lo) div
        // ceil(span / FactBuckets)), routed to the shuffle through
        // REPRESENTATIVE values precomputed to hash into DISTINCT
        // partitions — deterministic at any session history, and each
        // file still holds exactly one contiguous user range.
        val ev = Tables(spark, dir).events
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val mm = ev.agg(min("user_id").as("lo"), max("user_id").as("hi"))
          .first()
        val (loU, hiU) = (mm.getLong(0), mm.getLong(1))
        val width = math.max(1L, (hiU - loU) / FactBuckets + 1)
        // rep(b) = first long whose Murmur3 shuffle hash lands in
        // partition b — evaluated through the SAME hash expression the
        // exchange uses, so rep routing is 1:1 by construction.
        val reps: Array[Long] = {
          val cand = spark.range(0, 4096)
            .select(col("id"), pmod(hash(col("id")), lit(FactBuckets)).as("p"))
            .collect().map(r => (r.getLong(0), r.getInt(1)))
          val byPart = scala.collection.mutable.Map.empty[Int, Long]
          cand.foreach { case (id, p) =>
            if (!byPart.contains(p)) byPart(p) = id }
          require(byPart.size == FactBuckets,
            s"rep search covered ${byPart.size} of $FactBuckets partitions")
          (0 until FactBuckets).map(byPart).toArray
        }
        val repArr = array(reps.map(lit(_)): _*)
        ev
          .withColumn("rep", element_at(repArr,
            expr(s"CAST((user_id - $loU) div $width AS INT) + 1")))
          .repartition(FactBuckets, col("rep"))
          .sortWithinPartitions("user_id")
          .drop("rep")
          .write.mode(SaveMode.Overwrite).parquet(dataPath)
        spark.read.parquet(dataPath)
          .select(col("_metadata.file_path").as("file"), col("user_id"))
          .groupBy("file")
          .agg(min("user_id").as("lo"), max("user_id").as("hi"),
            count(lit(1)).as("n_rows"))
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(manPath)
        (dataPath, manPath)
      })
    }

  /** Manifest-driven planning step: the file paths whose [lo, hi]
    * user range intersects the query band, plus the layout's total
    * file count (for the FormatsSpec pruning assertion). Reads ONLY
    * the manifest — collect() here is the planner reading metadata,
    * sized |files|, never data rows. */
  private[graft] def manifestSelect(spark: SparkSession, dir: String,
      lo: Long, hi: Long): (Seq[String], Long) = {
    val man = spark.read.parquet(manifestLayout(spark, dir)._2)
    val total = man.count()
    val files = man.filter(col("hi") >= lo && col("lo") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
    (files, total)
  }

  /** User band for [[srcManifestPrune]] — inside every sf's id range
    * (sf0.001 users span 0–14) and overlapping a strict subset of the
    * [[FactBuckets]] range files at every scale. */
  private val ManifestLo = 3L
  private val ManifestHi = 6L

  /** FILE-LEVEL SKIPPING via a stats manifest, end to end: plan the
    * user-band query against the manifest (metadata only), then scan
    * ONLY the surviving range-clustered files — directory listing and
    * footer IO for pruned files never happen, which is the difference
    * between O(query) and O(table) planning on a millions-of-files
    * table. Complements the partition- (src_dpp_scan), page-
    * (src_zorder_scan), and bucket- (sim_ann_indexed) pruning levers;
    * the residual in-file filter still pushes down to row groups. The
    * oracle runs the same band query on the raw table — the layout
    * and manifest are semantically invisible; FormatsSpec asserts the
    * plan touched strictly fewer files than the layout holds. */
  def srcManifestPrune(spark: SparkSession, dir: String): DataFrame = {
    val (files, _) = manifestSelect(spark, dir, ManifestLo, ManifestHi)
    // Zero surviving files is a legal planning outcome (a band outside
    // the corpus's id range) — parquet() with no paths would throw
    // instead of producing the oracle's empty result, so fall back to
    // the full layout and let the (now row-free) pushdown do the work.
    val src =
      if (files.nonEmpty) spark.read.parquet(files: _*)
      else spark.read.parquet(manifestLayout(spark, dir)._1)
    src
      .filter(col("user_id").between(ManifestLo, ManifestHi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .orderBy("event_type")
  }

  private val bloomManCache =
    scala.collection.mutable.Map.empty[(Int, String), String]

  /** Per-file BLOOM manifest over the range-clustered layout's
    * event_id column — the file-skipping lever for point lookups on a
    * column the clustering does NOT order: every file spans nearly the
    * full event_id range, so the min/max manifest ([[manifestSelect]])
    * can never prune an event_id probe, while a per-file bloom
    * (md5-positional k=4 bits in a 65536-position space — the
    * agg_bloom_filter scheme widened; size the space ∝ keys-per-file
    * at scale) skips every file that cannot contain the key. Stored as
    * (file, bit) rows — the relational form of the bitmap an Iceberg
    * puffin/deletion-vector sidecar would hold. Derived once per
    * (session, dir) in the same ingest pass family as the manifest. */
  private[graft] def bloomManifest(spark: SparkSession, dir: String): String =
    bloomManCache.synchronized {
      bloomManCache.getOrElseUpdate((System.identityHashCode(spark), dir), {
        val suffix = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        val manPath = tmp(s"events_bloom_meta_$suffix")
        spark.read.parquet(manifestLayout(spark, dir)._1)
          .select(col("_metadata.file_path").as("file"),
            md5(col("event_id").cast("string")).as("h"))
          .select(col("file"), explode(expr(
            "transform(sequence(0, 3), j -> " +
              "CAST(conv(substr(h, j * 4 + 1, 4), 16, 10) AS INT))")).as("b"))
          .distinct()
          .write.mode(SaveMode.Overwrite).parquet(manPath)
        manPath
      })
    }

  /** The 4 bloom positions of a key, in JVM math — byte-identical to
    * the SQL chain above (same md5 hex, same 4-nibble slices). */
  private[graft] def bloomPositions(key: Long): Seq[Int] = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 to 3).map(j => Integer.parseInt(h.substring(j * 4, j * 4 + 4), 16))
  }

  /** Probe keys for [[srcBloomPrune]]: three present at every sf
    * (event_id is dense from 0) and two absent. */
  private[graft] val BloomProbes = Seq(7L, 123L, 500L, 1000000007L, 1000000013L)

  /** Point lookups through BLOOM file-skipping, end to end: for each
    * probe key, planning reads ONLY the bloom manifest (metadata), the
    * scan opens only files whose bloom contains all 4 key positions
    * (for an absent key: usually none), and the residual exact filter
    * runs inside the survivors. The oracle answers the same point
    * queries on the raw table — the manifest is semantically invisible
    * (a bloom false positive costs one extra file scan, never a wrong
    * row); FormatsSpec asserts absent keys open zero files while the
    * min/max manifest could not have pruned them at all. */
  def srcBloomPrune(spark: SparkSession, dir: String): DataFrame = {
    // The manifest parquet is already at rest — read it per probe
    // without a checkpoint (5 metadata-sized scans beat leaving
    // storage blocks behind; the planner loop is the only consumer).
    val man = spark.read.parquet(bloomManifest(spark, dir))
    val (dataPath, _) = manifestLayout(spark, dir)
    val perProbe = BloomProbes.map { k =>
      val pos = bloomPositions(k)
      val files = man.filter(col("b").isin(pos: _*))
        .groupBy("file").agg(countDistinct("b").as("nb"))
        .filter(col("nb") === pos.distinct.length)
        .select("file").collect().map(_.getString(0)).toSeq
      val src =
        if (files.nonEmpty) spark.read.parquet(files: _*)
        else spark.read.parquet(dataPath).filter(lit(false))
      src.filter(col("event_id") === k)
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(expr("CAST(round(value * 100) AS BIGINT)")), lit(0L))
            .as("value_cents"))
        .select(lit(k).as("probe_key"), col("n_rows"), col("value_cents"))
    }
    perProbe.reduce(_ unionByName _).orderBy("probe_key")
  }

  /** events written ONCE per (session, dir) as a catalog table
    * HIVE-PARTITIONED by event_type — the partition-pruning layout for
    * type-selective workloads (the complement of [[bucketedEvents]],
    * which co-locates by user): a filter or join on event_type prunes
    * whole partition directories before any IO. At 100 TB the
    * partition column is a date or a coarse category exactly like
    * this; built through [[sessionTable]] so cleanup is covered. */
  def partitionedEventsFact(spark: SparkSession, dir: String): DataFrame =
    sessionTable(spark, dir, "graft_ev_part_") { tbl =>
      Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_type")
        .option("path", bucketedPath(tbl)).saveAsTable(tbl)
    }

  /** Tiny event-type dimension (type → category) persisted as its own
    * catalog table — the filterable dim side of the dynamic-partition-
    * pruning join. It is deliberately a TABLE READ AT RUNTIME, not an
    * inline literal list: a literal IN would be static pruning; the
    * point of [[srcDppScan]] is that the surviving partition keys are
    * only knowable by scanning the dim, which is exactly when Spark
    * must inject the pruning subquery. */
  def eventTypeDim(spark: SparkSession, dir: String): DataFrame =
    sessionTable(spark, dir, "graft_ev_dim_") { tbl =>
      Tables(spark, dir).events
        .select(col("event_type")).distinct()
        .withColumn("category",
          expr("CASE WHEN event_type IN ('purchase', 'signup') " +
            "THEN 'conversion' ELSE 'engagement' END"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .option("path", bucketedPath(tbl)).saveAsTable(tbl)
    }

  /** DYNAMIC PARTITION PRUNING end to end — the other half of the
    * partition-pruning story next to src_partitioned_write's static
    * case, and a first-order 100 TB lever: the fact is partitioned on
    * the join key, the dim carries a runtime filter (category =
    * 'conversion'), and Spark injects a dynamicpruningexpression into
    * the fact scan so only the dim-surviving partitions (2 of 5 here;
    * the hot dates of a year-partitioned fact at scale) are ever read
    * — pruning happens BEFORE fact IO, off the broadcast the join
    * builds anyway. FormatsSpec asserts the pruning subquery in the
    * plan and that static pushdown could NOT have done it; the oracle
    * re-derives the same join on the raw table, so the layout is
    * semantically invisible. Revenue folds as exact BIGINT cents. */
  def srcDppScan(spark: SparkSession, dir: String): DataFrame = {
    val fact = partitionedEventsFact(spark, dir)
    val dim = eventTypeDim(spark, dir).filter(col("category") === "conversion")
    fact.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("revenue_cents"),
        countDistinct("user_id").as("n_users"))
      .orderBy("event_type")
  }

  /** Distributed FOOTER-ONLY walk of a parquet file list: one row per
    * (table, file, row group) with the group's row count and the
    * key column's min/max statistics, read via parquet-hadoop's
    * `ParquetFileReader` without touching a single data page. This is
    * the metadata pass a 100 TB planner runs to build manifests and
    * prune scans — at scale the file list is millions of entries, so
    * the walk itself is a Spark job (each task opens its files, reads
    * the ~KB footer, emits stats rows), never a driver loop.
    *
    * Statistics-less chunks surface as null min/max rather than a
    * throw: a file written without stats must degrade to "cannot
    * prune", not fail planning. */
  private[graft] def footerRowGroups(spark: SparkSession,
      files: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    // Ship the SESSION's Hadoop configuration to the tasks (as plain
    // entries — Configuration itself is not serializable): a fresh
    // default Configuration would lose s3a credentials / fs.defaultFS
    // / kerberos settings and the walk would only ever work on an
    // unconfigured local filesystem (review finding, r6).
    val confEntries = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    spark.createDataset(files)
      .repartition(files.size)
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { case (tbl, path, key) =>
          // A table entry may be a single parquet FILE or a DIRECTORY
          // of part files (the standard Spark writer layout). Expand
          // directories to their data files here in the task (r6
          // ADVICE: ParquetFileReader.open on a directory throws —
          // counter to the operator's own "degrade, don't fail
          // planning" contract); _SUCCESS/_metadata/dotfiles are
          // writer bookkeeping, not data.
          val root = new org.apache.hadoop.fs.Path(path)
          val fs = root.getFileSystem(conf)
          val dataFiles =
            if (fs.getFileStatus(root).isDirectory) {
              // Recursive: hive-partitioned layouts nest part files
              // under key=value subdirectories.
              val it = fs.listFiles(root, true)
              val found = scala.collection.mutable.ArrayBuffer.empty[
                org.apache.hadoop.fs.Path]
              // Hidden/bookkeeping filtering must cover EVERY path
              // component under root, not just the leaf name (the
              // InMemoryFileIndex rule): fs.listFiles(_, true) descends
              // into _temporary/ and .spark-staging-*/, whose leftover
              // part files from an aborted write end in .parquet and
              // would otherwise be counted as data (ADVICE r7 medium).
              // listFiles returns fully-QUALIFIED paths (scheme +
              // authority); root as parsed may not be — qualify it or
              // the walk-up never terminates at root and components
              // ABOVE it (legitimately dot-prefixed tmp dirs) would
              // count as hidden.
              val qRoot = fs.makeQualified(root)
              def hiddenUnderRoot(p: org.apache.hadoop.fs.Path): Boolean = {
                var cur = p
                while (cur != null && cur != qRoot) {
                  val n = cur.getName
                  if (n.startsWith("_") || n.startsWith(".")) return true
                  cur = cur.getParent
                }
                false
              }
              while (it.hasNext) {
                val s = it.next()
                val n = s.getPath.getName
                if (s.isFile && n.endsWith(".parquet")
                  && !hiddenUnderRoot(s.getPath)) found += s.getPath
              }
              // Empty must stay LOUD (review finding, r7): before the
              // directory support this path threw from
              // ParquetFileReader.open; silently emitting zero stats
              // rows would read downstream as "nothing to scan" and
              // prune a table that merely has unexpected file names.
              if (found.isEmpty) throw new IllegalArgumentException(
                s"no *.parquet data files under directory $path")
              found.sortBy(_.getName).toSeq
            } else Seq(root)
          dataFiles.flatMap { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            // Materialize before close: the iterator must not outlive
            // the reader it reads footers through.
            r.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
              case (b, i) =>
                val cm = b.getColumns.asScala
                  .find(_.getPath.toDotString == key)
                  .getOrElse(throw new IllegalArgumentException(
                    s"column $key absent in $path"))
                val st = cm.getStatistics
                val (mn, mx) =
                  if (st == null || !st.hasNonNullValue) (None, None)
                  else (Some(st.genericGetMin.asInstanceOf[Number].longValue),
                    Some(st.genericGetMax.asInstanceOf[Number].longValue))
                (tbl, p.getName, i.toLong, b.getRowCount, mn, mx)
            }
          } finally r.close()
          }
        }
      }
      .toDF("tbl", "file", "row_group", "n_rows", "min_key", "max_key")
  }

  /** §2.7 src_footer_stats — the planner's metadata-only read as a
    * gated query: per-table row counts and key ranges derived purely
    * from parquet FOOTERS ([[footerRowGroups]]), compared against the
    * oracle's full-data aggregates. The gate is the statement every
    * skipping layer (min/max manifest, partition pruning, CBO stats)
    * silently relies on: footers must tell the truth — a writer that
    * drifted one row or one key breaks the hash match. Row-group
    * granularity (per-group counts, ordered non-overlapping ranges on
    * a sorted file) is pinned in FormatsSpec over a deliberately
    * multi-row-group write, since the SQL oracle cannot see group
    * structure through a table view. */
  def srcFooterStats(spark: SparkSession, dir: String): DataFrame = {
    val specs = Seq(
      ("customer", "c_custkey"), ("documents", "doc_id"),
      ("events", "event_id"), ("lineitem", "l_orderkey"),
      ("orders", "o_orderkey"))
    val files = specs.map { case (t, k) => (t, s"$dir/$t.parquet", k) }
    footerRowGroups(spark, files)
      .groupBy("tbl")
      .agg(sum("n_rows").as("n_rows"), min("min_key").as("min_key"),
        max("max_key").as("max_key"))
      .orderBy("tbl")
  }

  // Per-JVM unique scratch root: fixed /tmp paths collided when two
  // runs (driver verify + a local bench, say) raced the same directory.
  private lazy val tmpRoot: String =
    java.nio.file.Files.createTempDirectory("graft_fmt_").toString

  private def tmp(name: String): String = s"$tmpRoot/$name"

  /** nation → csv → back; the oracle reads the original parquet, so a
    * lossy round-trip (types, quoting, header) would hash-mismatch. */
  def srcCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir).nation
    val path = tmp("nation_csv")
    writeCsv(nation, path)
    readCsv(spark, path, nation.schema).orderBy("n_nationkey")
  }

  /** customer → jsonl → back (exercises double round-trip fidelity). */
  def srcJsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir).customer
    val path = tmp("customer_jsonl")
    writeJsonl(customer, path)
    readJsonl(spark, path, customer.schema).orderBy("c_custkey")
  }

  /** NESTED-schema JSON round-trip: events re-shaped into a nested
    * document ({event_id, user:{id}, metrics:[{k,v}]}), written as
    * JSON lines, read back with an EXPLICIT nested schema (structs +
    * array of structs — never schema inference, which is a full extra
    * pass at 100 TB and type-unstable), then flattened back to rows
    * via dot-paths + explode. The oracle reads the ORIGINAL parquet,
    * so the whole nest → serialize → parse → flatten cycle must be
    * value-exact to hash-match — the semi-structured ingestion
    * capability (API payloads, event logs) beyond the flat jsonl
    * round-trip. */
  def srcJsonNested(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val path = tmp("events_nested_json")
    ev.select(to_json(struct(
        col("event_id"),
        struct(col("user_id").as("id"), col("event_type").as("kind")).as("user"),
        array(struct(lit("value").as("k"), col("value").as("v"))).as("metrics")))
        .as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    val schema = "event_id BIGINT, user STRUCT<id: BIGINT, kind: STRING>, " +
      "metrics ARRAY<STRUCT<k: STRING, v: DOUBLE>>"
    spark.read.schema(schema).json(path)
      .select(col("event_id"), col("user.id").as("user_id"),
        col("user.kind").as("event_type"), explode(col("metrics")).as("m"))
      .filter(col("m.k") === "value")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("m.v"), 3).as("value"))
      .orderBy("event_id")
  }

  /** customer → GZIP-compressed jsonl → back — the compressed-text
    * ingestion path (log shippers and API dumps arrive as .json.gz):
    * the writer sets the gzip codec, the reader detects it from the
    * file extension, and the explicit schema skips inference exactly
    * like the plain jsonl path. Gzip is NOT splittable — one file maps
    * to one task — so the write keeps the upstream partitioning
    * (many .gz files = restored parallelism at read; the at-scale
    * contract worth encoding, vs one giant .gz that serializes the
    * scan). Oracle reads the original parquet, so codec+serde loss
    * would hash-mismatch. */
  def srcJsonlGzip(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir).customer
    val path = tmp("customer_jsonl_gz")
    customer.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(path)
    spark.read.schema(customer.schema).json(path).orderBy("c_custkey")
  }

  /** supplier → ORC → back. ORC is the other columnar format Spark
    * ships natively (predicate pushdown + column pruning like parquet);
    * the oracle reads the original parquet, so any type or encoding
    * loss in the ORC round-trip would hash-mismatch. */
  def srcOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val supplier = Tables(spark, dir).supplier
    val path = tmp("supplier_orc")
    supplier.write.mode(SaveMode.Overwrite).orc(path)
    spark.read.schema(supplier.schema).orc(path).orderBy("s_suppkey")
  }

  /** Compression-codec round-trip: the same table written as parquet
    * under gzip / snappy / zstd and read back — the codec matrix a
    * platform validates before declaring a storage default (zstd is
    * the modern size/speed point; snappy the legacy default; gzip the
    * interchange fallback). One row per codec, identical exact-cents
    * checksums = all three decode paths agree. */
  def srcCodecs(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir).part
    Seq("gzip", "snappy", "zstd").map { c =>
      val path = tmp(s"part_$c")
      part.write.mode(SaveMode.Overwrite).option("compression", c).parquet(path)
      spark.read.parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("CAST(round(p_retailprice * 100) AS BIGINT)")).as("sum_cents"))
        .select(lit(c).as("codec"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionByName _).orderBy("codec")
  }

  /** documents.text → raw text lines (the classic MapReduce input
    * format) → read back with spark.read.text → corpus stats. Line
    * framing destroys both row identity and order, so the op flattens
    * embedded newlines BEFORE writing (one doc = one line) and gates on
    * order-independent aggregates: line count, total chars, distinct
    * line hashes. The oracle reproduces the same newline flattening
    * from the parquet side. */
  def srcTextRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val path = tmp("documents_txt")
    docs.select(regexp_replace(col("text"), "[\\r\\n]+", " ").as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    spark.read.text(path)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(length(col("value"))).as("sum_chars"),
        countDistinct(md5(col("value").cast("binary"))).as("n_distinct"))
  }

  /** documents → parquet partitioned by lang (sorted by doc_id within
    * partitions) → aggregate over the read-back; exercises partition
    * pruning-compatible layout end-to-end. */
  def srcPartitionedWrite(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val path = tmp("documents_part")
    writePartitioned(docs.select("doc_id", "lang", "n_chars"), path,
      partCols = Seq("lang"), sortCols = Seq("doc_id"))
    spark.read.parquet(path)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  /** Small-file COMPACTION — the other nightly table-maintenance
    * kernel next to [[srcMergeUpsert]] (streaming ingest leaves
    * thousands of KB-sized files per partition; scan cost at 100 TB is
    * dominated by file-open overhead until someone compacts): a
    * 64-file fragmented copy of orders is rewritten through
    * `coalesce(4)` — coalesce, NOT repartition, so compaction moves no
    * shuffle data; each output task just concatenates input splits
    * (the right plan at any scale; repartition would shuffle the
    * whole table to fix a layout problem). File counts are
    * deterministic: round-robin repartition fills all 64 (orders has
    * ≥64 rows at every SF), and coalesce(1) emits exactly ONE file
    * regardless of how the scan bin-packed the fragments (coalesce(N>1)
    * would emit min(N, scan partitions) — and the scan's partition
    * count depends on core count and maxPartitionBytes, so any larger
    * target is machine-dependent; review-caught). One output file is
    * the real per-date-partition compaction shape — a 100 TB table
    * runs this fan-in once per partition, in parallel across
    * partitions. Counts asserted against the filesystem here and
    * mirrored as literals in the oracle; row count and exact cents
    * total gate that compaction lost and changed NOTHING. */
  def srcCompaction(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir).orders
    val frag = tmp("orders_fragmented")
    val compact = tmp("orders_compacted")
    orders.repartition(64).write.mode(SaveMode.Overwrite).parquet(frag)
    spark.read.parquet(frag).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(compact)
    def nFiles(p: String): Long = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(p))
      try s.iterator().asScala.count(_.toString.endsWith(".parquet")).toLong
      finally s.close()
    }
    spark.read.parquet(compact)
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("total_cents"))
      .select(lit(nFiles(frag)).as("files_before"),
        lit(nFiles(compact)).as("files_after"),
        col("n_rows"), col("total_cents"))
  }

  /** CDC snapshot merge (upsert apply) — the table-maintenance kernel
    * every lakehouse pipeline runs nightly: apply a change feed of
    * updates / deletes / inserts to a base snapshot, latest-wins. The
    * change feed is derived DETERMINISTICALLY from orders itself
    * (key%10: 0-2 → update price +5%, 3 → delete, 7 → insert under a
    * fresh key past max(o_orderkey)) so the oracle replays the exact
    * same feed. Money in exact BIGINT cents (the q01 contract).
    *
    * The merge itself is ONE full-outer join on the key — change rows
    * override, deletes drop, inserts survive as change-only rows. Scale
    * posture: full-outer cannot broadcast, so both sides shuffle on the
    * key — exactly the copy-on-write merge a 100 TB table does; with
    * the base kept in the [[writeBucketed]] layout the base side's
    * exchange disappears and only the (small) change feed moves. Output
    * is the per-status row/value reconciliation a merge job logs. */
  /** Base snapshot as (k, st, cents) — shared by [[srcMergeUpsert]]
    * and [[srcSnapshotDiff]]. */
  private def orderSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders.select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))

  /** The merged (post-CDC-apply) snapshot as (mk, mst, mcents) — ONE
    * definition feeding both the merge rollup and the diff (the
    * shared-accumulator discipline); mirrored by [[MergeCteSql]]. */
  private def mergedOrders(spark: SparkSession, dir: String): DataFrame = {
    val b = orderSnapshot(spark, dir)
    val c = b
      .filter(expr("k % 10 IN (0, 1, 2, 3, 7)"))
      .crossJoin(broadcast(b.agg(max("k").as("mk"))))
      .select(
        expr("CASE WHEN k % 10 = 7 THEN k + mk ELSE k END").as("ck"),
        col("st").as("cst"),
        expr("CASE WHEN k % 10 = 3 THEN 'D' WHEN k % 10 <= 2 THEN 'U' ELSE 'I' END").as("op"),
        expr("CASE WHEN k % 10 <= 2 THEN (cents * 105) div 100 ELSE cents END").as("ccents"))
    b.join(c, col("k") === col("ck"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("ck"), col("k")).as("mk"),
        coalesce(col("st"), col("cst")).as("mst"),
        expr("CASE WHEN op IN ('U', 'I') THEN ccents ELSE cents END").as("mcents"))
  }

  /** DuckDB twin of the change-feed + merge CTE chain (`b`, `c`, `m`
    * with m = (mk, mst, mcents)). */
  private val MergeCteSql =
    """mx AS (SELECT max(o_orderkey) AS mk FROM orders),
      |b AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders),
      |c AS (
      |  SELECT CASE WHEN k % 10 = 7 THEN k + mk ELSE k END AS ck,
      |         st AS cst,
      |         CASE WHEN k % 10 = 3 THEN 'D'
      |              WHEN k % 10 <= 2 THEN 'U' ELSE 'I' END AS op,
      |         CASE WHEN k % 10 <= 2 THEN (cents * 105) // 100
      |              ELSE cents END AS ccents
      |  FROM b, mx WHERE k % 10 IN (0, 1, 2, 3, 7)),
      |m AS (
      |  SELECT coalesce(c.ck, b.k) AS mk, coalesce(b.st, c.cst) AS mst,
      |         CASE WHEN c.op IN ('U', 'I') THEN c.ccents
      |              ELSE b.cents END AS mcents
      |  FROM b FULL OUTER JOIN c ON b.k = c.ck
      |  WHERE c.op IS NULL OR c.op <> 'D')""".stripMargin

  def srcMergeUpsert(spark: SparkSession, dir: String): DataFrame =
    mergedOrders(spark, dir)
      .groupBy(col("mst").as("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"), sum("mcents").as("total_cents"))
      .orderBy("o_orderstatus")

  /** Snapshot DIFF — the replication/migration validation that tells
    * you WHAT changed when [[mrTableChecksum]]-style digests disagree:
    * base vs post-merge snapshot through one full-outer key join,
    * classified into added / removed / changed / same with the exact
    * net cents delta. Same shuffle shape as the merge itself; the
    * classification is one CASE over the joined row. */
  def srcSnapshotDiff(spark: SparkSession, dir: String): DataFrame =
    orderSnapshot(spark, dir)
      .join(mergedOrders(spark, dir), col("k") === col("mk"), "full_outer")
      .select(expr(
        """CASE WHEN k IS NULL THEN 'added'
          |     WHEN mk IS NULL THEN 'removed'
          |     WHEN cents <> mcents THEN 'changed'
          |     ELSE 'same' END""".stripMargin).as("kind"),
        expr("coalesce(mcents, CAST(0 AS BIGINT)) - coalesce(cents, CAST(0 AS BIGINT))")
          .as("delta"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_rows"), sum("delta").as("cents_delta"))
      .orderBy("kind")

  /** Schema EVOLUTION read — the "a column was added mid-history"
    * reality of any long-lived dataset: an early parquet generation
    * written WITHOUT c_acctbal (even custkeys) next to a later
    * generation WITH it (odd custkeys), read back as ONE table via
    * mergeSchema (the schemas union; missing columns surface as NULL —
    * never silent truncation to the first file's schema, which is the
    * default-off failure mode this option exists for). The aggregate
    * reports per-nation row counts, how many rows PREDATE the column,
    * and the exact cents sum over the rows that have it — so any
    * row-to-generation misassignment or NULL-fill error
    * hash-mismatches against the oracle computed from the original
    * table. Scale note: mergeSchema reconciles footers at planning
    * time (a driver-side footer read per generation, not a data pass);
    * production layouts key generations by a partition column exactly
    * like the v= directories here. */
  def srcSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir).customer
    val path = tmp("customer_evolving")
    customer.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/v=1")
    customer.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/v=2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$path/v=1", s"$path/v=2")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("n_missing_bal"),
        sum(when(col("c_acctbal").isNotNull,
          expr("CAST(round(c_acctbal * 100) AS BIGINT)")).otherwise(0L))
          .as("sum_bal_cents"))
      .orderBy("c_nationkey")
  }

  /** Malformed-CSV ingestion — the PERMISSIVE + corrupt-record-column
    * contract every production CSV reader runs under (real feeds
    * carry broken lines; FAILFAST kills the job on row one,
    * DROPMALFORMED silently loses data — the auditable middle is
    * PERMISSIVE with the rejects captured): a nation CSV with every
    * 5th key deliberately corrupted (non-numeric key field), read back
    * with an explicit schema + `_corrupt_record`, reporting good/bad
    * counts and the exact key checksum over the CLEAN rows. The oracle
    * derives the same partition from the corruption rule, so a reader
    * that dropped, double-counted, or mis-classified any line
    * hash-mismatches. Scale: parsing is per-line map work; the rejects
    * land in a column, not a side channel, so the audit rides the
    * same scan. */
  def srcCsvMalformed(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir).nation
    val path = tmp("nation_malformed_csv")
    nation.select(expr(
      """CASE WHEN n_nationkey % 5 = 0
        |  THEN concat('x', CAST(n_nationkey AS STRING), ',', n_name, ',',
        |              CAST(n_regionkey AS STRING))
        |  ELSE concat(CAST(n_nationkey AS STRING), ',', n_name, ',',
        |              CAST(n_regionkey AS STRING)) END""".stripMargin)
      .as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, " +
        "_corrupt_record STRING")
      .option("mode", "PERMISSIVE").csv(path)
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("_corrupt_record").isNull, col("n_nationkey"))
          .otherwise(0L)).as("good_key_sum"))
  }

  val oracles: Map[String, String] = Map(
    "src_csv_malformed" ->
      """SELECT
        |  CAST(sum(CASE WHEN n_nationkey % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |  CAST(sum(CASE WHEN n_nationkey % 5 <> 0 THEN n_nationkey ELSE 0 END) AS BIGINT) AS good_key_sum
        |FROM nation""".stripMargin,
    "src_schema_evolution" ->
      """SELECT c_nationkey, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_bal,
        |  CAST(sum(CASE WHEN c_custkey % 2 = 1
        |           THEN CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_bal_cents
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_compaction" ->
      """SELECT CAST(64 AS BIGINT) AS files_before,
        |  CAST(1 AS BIGINT) AS files_after,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders""".stripMargin,
    "src_merge_upsert" ->
      s"""WITH $MergeCteSql
         |SELECT mst AS o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(mcents) AS BIGINT) AS total_cents
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_snapshot_diff" ->
      s"""WITH $MergeCteSql,
         |d AS (
         |  SELECT CASE WHEN b.k IS NULL THEN 'added'
         |              WHEN m.mk IS NULL THEN 'removed'
         |              WHEN b.cents <> m.mcents THEN 'changed'
         |              ELSE 'same' END AS kind,
         |    coalesce(m.mcents, 0) - coalesce(b.cents, 0) AS delta
         |  FROM b FULL OUTER JOIN m ON b.k = m.mk)
         |SELECT kind, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(delta) AS BIGINT) AS cents_delta
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "src_jsonl_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "src_jsonl_gzip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "src_partitioned_write" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "src_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "src_codecs" ->
      """SELECT codec, n_rows, sum_cents FROM
        |  (SELECT count(*) AS n_rows,
        |     CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |   FROM part)
        |CROSS JOIN (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec)
        |ORDER BY codec""".stripMargin,
    "src_text_roundtrip" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(length(t)) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(t)) AS n_distinct
        |FROM (SELECT regexp_replace(text, '[\r\n]+', ' ', 'g') AS t FROM documents)""".stripMargin,
    "src_json_nested" ->
      """SELECT event_id, user_id, event_type, round(value, 3) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "src_zorder_scan" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |WHERE user_id BETWEEN 3 AND 6
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "src_bloom_prune" -> {
      val probes = BloomProbes
        .map(k =>
          s"""SELECT CAST($k AS BIGINT) AS probe_key,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT) AS value_cents
             |FROM events WHERE event_id = $k""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"$probes\nORDER BY probe_key"
    },
    "src_manifest_prune" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |WHERE user_id BETWEEN 3 AND 6
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "src_dpp_scan" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CASE WHEN event_type IN ('purchase', 'signup')
        |         THEN 'conversion' ELSE 'engagement' END AS category
        |  FROM events)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events e JOIN dim USING (event_type)
        |WHERE category = 'conversion'
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin,
    "src_footer_stats" -> Seq(
      ("customer", "c_custkey"), ("documents", "doc_id"),
      ("events", "event_id"), ("lineitem", "l_orderkey"),
      ("orders", "o_orderkey"))
      .map { case (t, k) =>
        s"""SELECT '$t' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(min($k) AS BIGINT) AS min_key,
           |  CAST(max($k) AS BIGINT) AS max_key FROM $t""".stripMargin
      }
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY tbl"),
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_schema_evolution" -> (srcSchemaEvolution(_, _)),
    "src_manifest_prune" -> (srcManifestPrune(_, _)),
    "src_bloom_prune" -> (srcBloomPrune(_, _)),
    "src_csv_malformed" -> (srcCsvMalformed(_, _)),
    "src_csv_roundtrip" -> (srcCsvRoundtrip(_, _)),
    "src_jsonl_roundtrip" -> (srcJsonlRoundtrip(_, _)),
    "src_jsonl_gzip" -> (srcJsonlGzip(_, _)),
    "src_partitioned_write" -> (srcPartitionedWrite(_, _)),
    "src_orc_roundtrip" -> (srcOrcRoundtrip(_, _)),
    "src_codecs" -> (srcCodecs(_, _)),
    "src_text_roundtrip" -> (srcTextRoundtrip(_, _)),
    "src_json_nested" -> (srcJsonNested(_, _)),
    "src_zorder_scan" -> (srcZorderScan(_, _)),
    "src_dpp_scan" -> (srcDppScan(_, _)),
    "src_footer_stats" -> (srcFooterStats(_, _)),
    "src_merge_upsert" -> (srcMergeUpsert(_, _)),
    "src_compaction" -> (srcCompaction(_, _)),
    "src_snapshot_diff" -> (srcSnapshotDiff(_, _)),
  )
}
