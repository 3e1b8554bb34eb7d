package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis pipeline operators (SURVEY.md §2.3).
  *
  * Everything is built from codegen'd built-in functions (regexp, array
  * lambdas, md5) — zero Scala UDFs — so the whole stage stays inside
  * WholeStageCodegen and scales linearly with input splits.
  *
  * Cross-engine parity rules: tokenization is
  * `regexp_extract_all(lower(text), '[a-z0-9]+')` in both engines; the
  * only hash used is md5 (identical hex in Spark and DuckDB); ratios are
  * exact-integer divisions so thresholds compare identically.
  */
object TextOps {

  /** Tokenizer used across text/dedup operators (Spark SQL fragment). */
  val tokensExpr = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
  /** Same tokenizer in DuckDB SQL. */
  val tokensSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private val stopwords = Seq("the", "a", "and", "of", "to")
  private val stopList = stopwords.map(s => s"'$s'").mkString(", ")

  /** Per-language corpus quality metrics (length/stopword/alpha ratios). */
  def txtStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("lang"), col("n_chars"), expr(tokensExpr).as("tk"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("alpha"))
      .select(col("lang"), col("n_chars"), col("alpha"),
        size(col("tk")).as("n_tokens"),
        expr(s"size(filter(tk, x -> x IN ($stopList)))").as("n_stop"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_tokens"), 4).as("avg_tokens"),
        round(avg(expr("CAST(n_stop AS DOUBLE) / n_tokens")), 4).as("avg_stop_ratio"),
        round(avg(expr("CAST(alpha AS DOUBLE) / n_chars")), 4).as("avg_alpha_ratio"),
        round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("lang")

  private val markers = Seq(
    "en" -> Seq("the", "and", "of", "a", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ein"),
    "fr" -> Seq("le", "et", "la", "les", "des"),
    "es" -> Seq("el", "y", "los", "las", "una"))

  /** Marker-word heuristic language ID (deterministic argmax with fixed
    * tie-break order en>de>fr>es).
    *
    * Shape: explode distinct tokens once, then 4 codegen'd conditional
    * sums in a hash aggregate. The per-column
    * `size(array_intersect(tk, ..))` formulation would have
    * CollapseProject inline the tokenizer into each of the 4 counts
    * (interpreted, no CSE); a marker count over distinct tokens is the
    * same number. explode_outer keeps token-less documents. */
  def txtLangid(spark: SparkSession, dir: String): DataFrame = {
    val counts = markers.map { case (l, ws) =>
      sum(when(col("t").isin(ws: _*), 1).otherwise(0)).as(s"c_$l")
    }
    Tables(spark, dir).documents
      .select(col("doc_id"), explode_outer(expr(s"array_distinct($tokensExpr)")).as("t"))
      .groupBy("doc_id")
      .agg(counts.head, counts.tail: _*)
      .select(col("doc_id"), expr(
        """CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'unk'
          | WHEN c_en >= greatest(c_de, c_fr, c_es) THEN 'en'
          | WHEN c_de >= greatest(c_fr, c_es) THEN 'de'
          | WHEN c_fr >= c_es THEN 'fr' ELSE 'es' END""".stripMargin).as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Language-ID confusion matrix — the evaluation twin of
    * [[txtLangid]] (the sim_recall_eval move applied to the text
    * classifiers): predicted language vs the table's labeled `lang`,
    * counts per (lang, pred_lang) cell — where the marker heuristic
    * is trustworthy and where it bleeds. One extra broadcast-joined
    * column over the langid plan; the matrix domain is |langs|². */
  def txtLangConfusion(spark: SparkSession, dir: String): DataFrame =
    txtLangid(spark, dir)
      .join(Tables(spark, dir).documents.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  /** Content fingerprint: md5 of whitespace-normalized lowercase text. */
  def txtFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).cast("binary")).as("fp"))
      .orderBy("doc_id")

  /** Quality-gate filter: length band + min tokens + alpha-char ratio. */
  def txtQualityFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("n_chars"), expr(tokensExpr).as("tk"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("alpha"))
      .select(col("doc_id"), col("n_chars"), size(col("tk")).as("n_tokens"), col("alpha"))
      .filter(col("n_chars").between(100, 5000) && col("n_tokens") >= 20 &&
        expr("CAST(alpha AS DOUBLE) / n_chars") >= 0.6)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        round(expr("CAST(alpha AS DOUBLE) / n_chars"), 4).as("alpha_ratio"))
      .orderBy("doc_id")

  /** BPE-ish pre-tokenizer: disjoint leading-char alternatives so Java
    * (Spark) and RE2 (DuckDB) agree regardless of alternation policy. */
  private val bpeRegex = " ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+"

  /** Token counting two ways per document: whitespace runs and a BPE-ish
    * pre-tokenizer split (the units a GPT-style byte-pair encoder would
    * merge from). Both pure regex — codegen'd, linear, shuffle-free. */
  def txtTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$bpeRegex', 0)")).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Winnowing document fingerprints (MOSS-style): hash every 5-char
    * gram of the normalized text, slide a 4-gram window taking each
    * window's min hash, and keep the distinct selected hashes. Documents
    * sharing fingerprints share matching substrings — the classic
    * near-dup/plagiarism sketch. Output: fingerprint count + checksum
    * per doc (set summary, cross-engine comparable).
    *
    * Entirely expression-level (sequence→transform→slice→array_min) —
    * no shuffle until the final ORDER BY; the md5-derived gram hash is
    * mirrored in DuckDB digit-for-digit. */
  def txtWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        expr("trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))").as("norm"))
      .filter(length(col("norm")) >= 8)
      .select(col("doc_id"), expr("graft_winnow_fps(norm)").as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        expr("aggregate(fps, CAST(0 AS BIGINT), (a, v) -> a + v)").as("fp_sum"))
      .orderBy("doc_id")

  /** Deterministic hash-mod sampling: ~10% per source stratum, keyed on
    * md5(doc_id) so the sample is stable across runs, engines, and
    * cluster sizes (the scale-safe alternative to seeded random
    * sampling, whose results depend on partitioning). */
  def mrSampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .filter(expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 10 = 0"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("source")

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis
    * A-Res): each doc draws a deterministic uniform u from md5(doc_id)
    * and competes on priority u^(1/w) with w = n_chars — the k winners
    * are a length-proportional sample, the primitive behind
    * token-weighted mixture draws (sampling DOCUMENTS uniformly
    * under-represents long documents' tokens; sampling with w = doc
    * length is uniform over TOKENS). Completes the sampling triad:
    * mr_sample_hash (fixed-rate), mr_reservoir (fixed-size uniform),
    * this (fixed-size weighted).
    *
    * Determinism/parity: u = (h + 0.5)/2^52 from the first 13 md5
    * nibbles (a 52-bit integer — exactly representable as a double, so
    * both engines compute bit-identical u), and the rank key is
    * ln(u)/w (monotone in u^(1/w); log-space sidesteps pow underflow
    * for large w). The key is compared, never output — engines need
    * only agree on the ORDER of ~uniform random doubles, where a
    * last-ulp libm divergence would need two keys within 1 ulp to
    * matter. Zero-weight docs are excluded by definition (u^(1/0) is
    * not a draw); doc_id breaks exact ties.
    *
    * Scale: priorities are per-row expressions; the k-cut is
    * TakeOrderedAndProject (per-partition heap, k rows to the driver,
    * no global sort) — the same physical shape as mr_reservoir. The
    * A-Res key is a join-semilattice like KMV's: top-k of a union ==
    * top-k of merged per-shard top-ks, so the sample merges across
    * partitions/shards for free. */
  def mrWeightedSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .filter(col("n_chars") > 0)
      .withColumn("u",
        expr("(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10) AS BIGINT) + 0.5) / 4503599627370496"))
      .withColumn("wkey", expr("ln(u) / n_chars"))
      .orderBy(desc("wkey"), col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Deterministic train/val/test split assignment (90/5/5), reported
    * per (language, split) — the dataset-versioning step every training
    * pipeline runs before anything touches the data: membership is a
    * pure function of md5(doc_id) (bucket = hash16 mod 100), so the
    * split is stable across runs, engines, partitionings, cluster
    * sizes, AND corpus growth — a doc added tomorrow cannot move
    * today's docs between splits (the property a random split or a
    * rank-based split both lack, and what keeps eval sets
    * uncontaminated across dataset versions). The id-sum checksum
    * gates MEMBERSHIP, not just counts.
    *
    * Scale: one partial-aggregated scan, O(1) per row, no shuffle
    * until the (lang, split)-sized rollup. */
  def mixSplitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100"))
      .withColumn("split",
        expr("CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("doc_id").as("id_sum"))
      .orderBy("lang", "split")

  /** The training-EXPORT manifest — the artifact a curation run
    * actually hands to the training job and to replica validation:
    * quality gate → exact-dup removal (keep the lowest doc_id) →
    * deterministic 90/5/5 split → per-(split, source) document count,
    * token total, and an order-independent membership digest. Every
    * stage is this library's own oracle-gated rule reused verbatim
    * (txt_quality_filter's gate incl. its n_tokens, txt_pipeline's
    * canonical-dup pick, mix_split_assign's md5 bucket), so the
    * manifest IS the composition of the audited pipeline, not a
    * parallel reimplementation. The digest is the mr_table_checksum
    * move (15-hex md5 prefix summed exactly) keyed on doc_id — two
    * exports match iff the SAME documents landed in the same cells,
    * regardless of partitioning or order.
    *
    * Scale: one documents scan feeds the gate + split + digest
    * columns; the dup-canonical side is one md5 groupBy; the manifest
    * rollup is |splits × sources|-keyed and partial-aggregated. */
  def mixExportManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val keep = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.select("doc_id", "source")
      .join(txtQualityFilter(spark, dir).select("doc_id", "n_tokens"), "doc_id")
      .join(keep, "doc_id")
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100"))
      .withColumn("split",
        expr("CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END"))
      .withColumn("hid",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(n_tokens AS BIGINT)")).as("n_tokens"),
        sum(expr("CAST(hid AS DECIMAL(38,0))")).cast("string").as("id_digest"))
      .orderBy("split", "source")
  }

  /** Output shards for [[mixShardPlan]] — at 100 TB this is the
    * training-job shard count (thousands); small here so sf0.001
    * still populates every (shard, source) cell. */
  private[graft] val NShards = 8

  /** EXACT-balance shard assignment — the step between a curated
    * corpus and the N tfrecord/parquet shards a training job reads:
    * within each source, documents are ranked by md5(doc_id) and
    * dealt round-robin `rank % N`, so every shard holds the same
    * per-source mixture to within one document (a hash-mod
    * assignment is only balanced in expectation; stragglers in the
    * last shards skew short training epochs).
    *
    * The naive rank is `row_number() OVER (PARTITION BY source)` —
    * a single task per source holding that source's entire corpus,
    * the same scale-killer the un-cut Pareto plan had. Here the rank
    * is TWO-LEVEL: bucket = first 3 md5 nibbles (4096 uniform cells
    * per source), per-(source, bucket) counts roll into exclusive
    * prefix offsets (a window over ≤4096 rows per source — bounded
    * by the CONSTANT bucket count, not the corpus), broadcast back,
    * and row_number runs per (source, bucket) cell. Bucket order is
    * the md5-prefix order, so offset + in-bucket rank IS the global
    * per-source md5 rank — bit-identical to the oracle's flat
    * window — while the heavy sort runs over ~n/4096-row cells in
    * parallel. Readout: per (shard, source) doc/char totals + the
    * id sum, the manifest a shard-writer validates against. */
  def mixShardPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("md5(CAST(doc_id AS STRING))").as("k"))
      .withColumn("b", expr("CAST(conv(substr(k, 1, 3), 16, 10) AS INT)"))
    val offsets = docs.groupBy("source", "b")
      .agg(count(lit(1)).as("c"))
      .withColumn("off",
        coalesce(
          sum("c").over(Window.partitionBy("source").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("source", "b", "off")
    docs
      .join(broadcast(offsets), Seq("source", "b"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("source", "b").orderBy("k")))
      .withColumn("shard", expr(s"CAST((off + rn - 1) % $NShards AS INT)"))
      .groupBy("shard", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("doc_id").as("id_sum"))
      .orderBy("shard", "source")
  }

  /** End-to-end curation pipeline composed from the library's own
    * stages: quality gate → exact-dup removal (keep the lowest doc_id)
    * → per-language counts of surviving docs. One declarative plan —
    * Catalyst fuses the stages; nothing materializes in between. */
  def txtPipeline(spark: SparkSession, dir: String): DataFrame = {
    val quality = txtQualityFilter(spark, dir).select("doc_id")
    val docs = Tables(spark, dir).documents
    val keep = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs
      .join(quality, "doc_id")
      .join(keep, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
  }

  /** Gopher-style repetition signals per document: duplicate-bigram
    * fraction (1 - distinct/total) and top-bigram fraction (most frequent
    * bigram's share) — the quality gates that catch boilerplate and
    * generated spam before training. Shape: one bigram explode → two
    * chained hash aggregates (per-(doc,bigram) counts, then per-doc
    * ratios) — both partial-aggregate map-side, no window, no join. */
  def txtRepetition(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("n_uniq"), max("c").as("max_c"))
      .select(col("doc_id"), col("n_bigrams"),
        round(expr("CAST(n_bigrams - n_uniq AS DOUBLE) / n_bigrams"), 4).as("dup_ratio"),
        round(expr("CAST(max_c AS DOUBLE) / n_bigrams"), 4).as("top_ratio"))
      .orderBy("doc_id")

  /** TF-IDF top-3 terms per document — the canonical MapReduce text
    * workload (term weighting for retrieval / keyword extraction).
    * score = (c / n_tok) · ln(N / df).
    *
    * Shape: one token explode → (doc, term) count aggregate, then the
    * two frequency denominators as window aggregates over that SAME
    * (already-shuffled) table — df = count over term partition, n_tok =
    * sum over doc partition — and the final top-3 rank reuses the doc
    * partition. Three exchanges total over the counted (doc, term)
    * table (≪ token count); no self-joins. N (docs with tokens) is a
    * 1-row broadcast. Ranking is float-safe cross-engine: ties in
    * score are exact rational ties (same c, df), broken by term; for
    * unequal small-integer inputs the ln products differ at ≫ ulp.
    */
  def txtTfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val nDocs = docs.filter(expr(s"size($tokensExpr) > 0"))
      .agg(count(lit(1)).as("n_docs"))
    val wTerm = Window.partitionBy("term")
    val wDoc = Window.partitionBy("doc_id")
    docs
      .select(col("doc_id"), explode(expr(tokensExpr)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("n_tok", sum("c").over(wDoc))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        expr("(CAST(c AS DOUBLE) / n_tok) * ln(CAST(n_docs AS DOUBLE) / df)"))
      .withColumn("rn",
        row_number().over(wDoc.orderBy(col("score").desc, col("term").asc)))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn").cast("long").as("rn"), col("term"),
        round(col("score"), 4).as("tfidf"))
      .orderBy("doc_id", "rn")
  }

  /** [[txtBm25]] query terms — three mid-frequency corpus words (the
    * literal query a retrieval benchmark fixes). */
  private[graft] val Bm25Terms = Seq("spark", "join", "window")

  /** One per-(doc, term) BM25 contribution in integer micro-units —
    * the SINGLE formula text both engines evaluate (the MdePpm
    * contract): Lucene-form idf ln(1 + (N−df+0.5)/(df+0.5)) times the
    * k1 = 1.2, b = 0.75 saturated tf, every operand an exact integer
    * entering one pinned IEEE double tree, quantized before the
    * per-doc sum so term-arrival order can't move a score. */
  private val Bm25ContribQ =
    """CAST(round(
      |  ln(1.0 + (CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |  * ((CAST(tf AS DOUBLE) * 2.2)
      |     / (CAST(tf AS DOUBLE)
      |        + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE) * CAST(nd AS DOUBLE))
      |                        / CAST(sdl AS DOUBLE))))
      |  * 1000000) AS BIGINT)""".stripMargin

  /** BM25 ranked retrieval for the fixed [[Bm25Terms]] query — the
    * lexical ranking baseline every retrieval/RAG pipeline starts
    * from (and the lexical half of [[SimilarityOps.simHybridRrf]]):
    * top-20 docs by Okapi BM25 with Lucene's idf, k1 = 1.2, b = 0.75.
    *
    * Determinism: each (doc, term) contribution quantizes to integer
    * micro-units through ONE shared formula string ([[Bm25ContribQ]]),
    * the per-doc score is an exact BIGINT sum of those units, and the
    * top-20 ranks on (score DESC, doc_id). Scale: one token explode →
    * (doc, term) counts for the |query| terms only (the filter runs
    * BEFORE the count shuffle, so the aggregate is |docs|·|query|
    * max); doc lengths are one partial-agg pass; df and the corpus
    * stats ride in as 1-row/|query|-row broadcasts;
    * TakeOrderedAndProject caps the output. */
  /** Un-truncated BM25 scores in micro-units — (doc_id, sq,
    * n_terms_hit) for every doc matching ≥1 query term; shared by
    * [[txtBm25]] and the hybrid-retrieval fusion
    * (SimilarityOps.simHybridRrf) so the lexical ranking cannot drift
    * between them. */
  private[operators] def bm25ScoresQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val toks = docs.select(col("doc_id"), explode(expr(tokensExpr)).as("t"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    val hits = toks.filter(col("t").isin(Bm25Terms: _*))
    val tf = hits.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfT = hits.select("doc_id", "t").distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("sdl"))
    tf.join(dl, "doc_id")
      .join(broadcast(dfT), "t")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), expr(Bm25ContribQ).as("cq"))
      .groupBy("doc_id")
      .agg(sum("cq").as("sq"), count(lit(1)).as("n_terms_hit"))
  }

  def txtBm25(spark: SparkSession, dir: String): DataFrame =
    bm25ScoresQ(spark, dir)
      .select(col("doc_id"), col("n_terms_hit"),
        (round(col("sq").cast("double") / lit(1000000.0), 4) + lit(0.0))
          .as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(20)

  /** Inverted-index construction over 3-token shingles: term → sorted
    * posting list (the search-index build step; shingle-level because
    * the synthetic corpus has a 31-word vocabulary, so word-level
    * postings would be ~the whole corpus per term).
    *
    * Scale posture: postings are only materialized inside the document
    * frequency window [2, 100] — df=1 terms can never match more than
    * their own doc, and hot terms (df > cap) would make O(df)-sized
    * list rows with O(df²) downstream join cost; real index builds cap
    * or tier exactly this way. The df gate is a count WINDOW over the
    * term partition evaluated BEFORE the list aggregate — a hot term is
    * dropped before any posting array exists (WindowExec buffers spill
    * to disk; a collect_list aggregation buffer would not), and the
    * following groupBy reuses the window's hash partitioning, so the
    * whole build is still ONE exchange on the term. */
  def txtInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(tk) - 2), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ', element_at(tk, i + 2))))")).as("term"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .filter(col("df").between(2, 100))
      .groupBy("term")
      .agg(max("df").as("df"),
        expr("array_join(transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')").as("postings"))
      .orderBy("term")
  }

  /** Sparse-vector document similarity THROUGH the inverted index: the
    * postings-join form of tf-idf cosine — top-25 document pairs by
    * cosine over shingle tf-idf weights, where candidate pairs come
    * from shared postings (never an all-pairs scan). This is the
    * sparse complement to the dense-embedding [[graft.operators.SimilarityOps]]
    * family: the same "block, then score only candidates" discipline,
    * with the df window [2, 100] as the blocker (df=1 terms can't
    * produce a pair; hot terms would cost O(df²) — real sparse-sim
    * systems prune or tier exactly these).
    *
    * Determinism: each weight tf·ln(N/df) quantizes to exact 1e-6
    * integer units BEFORE any fold; dots and squared norms are exact
    * DECIMAL(38,0)/HUGEINT sums of those integers, so the final
    * cosine double is partition-order-independent in both engines.
    * Cosine is taken in the df-pruned term space (dot and norms from
    * the SAME postings table — self-consistent, and the norm pass
    * costs no extra scan). Scale: ONE term exchange builds the
    * weighted postings (window df + groupBy share it), the pair join
    * keys on term with per-term fan-out ≤ C(100,2), and the top-25 is
    * TakeOrderedAndProject. The checkpoint feeds norms + both join
    * sides from one pass (the minhash pattern). */
  def simSparseCosine(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val nDocs = docs
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .filter(size(col("tk")) >= 3)
      .agg(count(lit(1)).as("n_docs"))
    val post = docs
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 2), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ', element_at(tk, i + 2)))")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .filter(col("df").between(2, 100))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        expr("CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000) AS BIGINT)").as("wq"))
      .localCheckpoint()
    val norms = post.groupBy("doc_id")
      .agg(sum(expr("CAST(wq AS DECIMAL(38,0)) * wq")).as("nsq"))
    val dots = post.as("a")
      .join(post.as("b"), col("a.term") === col("b.term")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(sum(expr("CAST(a.wq AS DECIMAL(38,0)) * b.wq")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("d1"), col("nsq").as("n1")), "d1")
      .join(norms.select(col("doc_id").as("d2"), col("nsq").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (round(col("dot").cast("double")
          / (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))), 4)
          + lit(0.0)).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("d1"), col("d2"))
      .limit(25)
  }

  /** Candidate probe set for the CMS query: high/low-frequency corpus
    * words plus one absent key (collision-only estimate). */
  private val cmsProbes = Seq("join", "merge", "data", "dup", "the", "zzzz")

  /** Cell vector for the Count-Min sketch: D rows, each cell decoded
    * from one md5 hex pair of the term, mod W (single source of truth:
    * CountMinSketch.D/W; mirrored in DuckDB). */
  private val CmsD = graft.functions.CountMinSketch.D
  private val CmsW = graft.functions.CountMinSketch.W
  private val cmsCellsExpr =
    s"transform(sequence(0, ${CmsD - 1}), i -> CAST(conv(substr(md5(term), i * 2 + 1, 2), 16, 10) AS INT) % $CmsW)"

  /** Count-Min sketch heavy-hitter estimates
    * (graft.functions.CountMinSketch) next to exact counts: one global
    * mergeable 4×64 sketch over every token occurrence, then point
    * estimates for a fixed probe set. W=64 is deliberately narrow so
    * the overcount-on-collision behavior is visible — and the DuckDB
    * oracle (the same cell sums in SQL) proves both engines agree on
    * exactly where it overcounts. The estimate never undercounts:
    * est ≥ exact always, est = exact when no collision. */
  def aggCmsHeavy(spark: SparkSession, dir: String): DataFrame = {
    val cms = udaf(graft.functions.CountMinSketch)
    val toks = Tables(spark, dir).documents
      .select(explode(expr(tokensExpr)).as("term"))
    // Pre-count per term with the codegen'd hash aggregate, then feed
    // (cells, n) into the typed sketch: the CMS of a multiset is the
    // weighted CMS of its support (KmvDistinct's distinct-first
    // reasoning), so the object-hash aggregate sees |vocabulary| rows
    // instead of |occurrences|.
    // Checkpointed: it feeds both the sketch and the exact side, and
    // without the cut the whole explode+count pipeline would run twice
    // (the r2 minhash diamond lesson). The materialized result is just
    // |vocabulary| rows.
    val termCounts = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // 1-row sketch: struct<counters: array<bigint>> of D*W counters.
    val sketch = termCounts.select(expr(cmsCellsExpr).as("cells"), col("n"))
      .agg(cms(col("cells"), col("n")).as("sk"))
    // Exact counts only for the probe set — filtered from the same
    // pre-counted table (the left join + coalesce(0) below already
    // covers absent probes).
    val exact = termCounts.filter(col("term").isin(cmsProbes: _*))
      .select(col("term"), col("n").as("exact_cnt"))
    spark.range(1)
      .select(explode(array(cmsProbes.map(lit): _*)).as("term"))
      .crossJoin(broadcast(sketch))
      .select(col("term"), expr(
        s"array_min(transform(sequence(0, ${CmsD - 1}), i -> element_at(sk.counters, i * $CmsW + (CAST(conv(substr(md5(term), i * 2 + 1, 2), 16, 10) AS INT) % $CmsW) + 1)))").as("cms_est"))
      .join(exact, Seq("term"), "left")
      .select(col("term"), col("cms_est"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
      .orderBy("term")
  }

  /** Per-document character Shannon entropy (bits) — the gibberish /
    * binary-noise / compressed-blob detector a curation pipeline runs
    * next to the token-ratio gates (low-entropy = repeated filler,
    * high-entropy = not natural language).
    *
    * entropy = log2(n) − Σ c·log2(c) / n over per-character counts —
    * algebraically −Σ (c/n)·log2(c/n) but computable in ONE aggregate
    * pass (no window for the total). Two partial-aggregated exchanges:
    * (doc_id, ch) counts, then doc_id. The empty-string filter guards
    * Spark's split(text, '') trailing-empty artifact (DuckDB's
    * string_split has none). Float-sum ordering risk is the accepted
    * emb_centroids class (~1e-14 vs the 5e-5 rounding boundary). */
  def txtEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_distinct_chars"),
        (round(log2(sum("c")) - sum(expr("c * log2(c)")) / sum("c"), 4) + lit(0.0))
          .as("entropy_bits"))
      .orderBy("doc_id")

  /** Corpus vocabulary head: top-100 tokens by frequency with rank and
    * CUMULATIVE corpus coverage — the "how many tokens cover X% of the
    * corpus" table a tokenizer/vocab build starts from.
    *
    * Scale shape: the global top-k is TakeOrderedAndProject over the
    * partial-aggregated token counts (per-partition heaps — never a
    * global sort of the vocabulary), the 1-row total rides in as a
    * broadcast, and the running-sum window orders only the 100
    * survivors (a single tiny partition by construction, AFTER the
    * cut — not a window over the vocab). Coverage is an integer-sum /
    * double-total division, so it is order-deterministic. */
  def txtVocab(spark: SparkSession, dir: String): DataFrame = {
    val freqs = Tables(spark, dir).documents
      .select(explode(expr(tokensExpr)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
    val total = freqs.agg(sum("freq").cast("double").as("tot"))
    val ord = Window.orderBy(desc("freq"), col("token"))
    freqs.orderBy(desc("freq"), col("token")).limit(100)
      .crossJoin(broadcast(total))
      .withColumn("rnk", row_number().over(ord).cast("long"))
      .withColumn("cum_share",
        round(sum("freq").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          / col("tot"), 4) + lit(0.0))
      .select(col("token"), col("freq"), col("rnk"), col("cum_share"))
      .orderBy("rnk")
  }

  /** Zipf power-law fit over the vocabulary head: the least-squares
    * slope of ln(freq) on ln(rank) across the top-100 tokens — the
    * one-number "is this corpus naturally distributed" diagnostic
    * (natural language sits near −1; generated/templated text drifts
    * flat or cliff-shaped). Rank ties break on token so the head set
    * is identical in both engines.
    *
    * Determinism: each (ln rank, ln freq) pair is quantized to exact
    * 1e-6 integer units BEFORE the regression sums, and all five
    * regression accumulators (n, Σx, Σy, Σxy, Σx²) are exact
    * DECIMAL(38,0)/HUGEINT integer folds — order-independent by
    * construction, so the closed-form slope/intercept is the same
    * double in any partitioning (the unit scales cancel in the slope;
    * the intercept divides back out once). Scale: the head cut is
    * TakeOrderedAndProject over partial-aggregated token counts
    * (per-partition heaps — the vocabulary is never globally sorted),
    * and the regression folds 100 rows. */
  def txtZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val freqs = Tables(spark, dir).documents
      .select(explode(expr(tokensExpr)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
    val ord = Window.orderBy(desc("freq"), col("token"))
    val head = freqs.orderBy(desc("freq"), col("token")).limit(100)
      .withColumn("rnk", row_number().over(ord).cast("long"))
      .select(
        expr("CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT)").as("x"),
        expr("CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT)").as("y"))
    val s = head.agg(
      count(lit(1)).as("n_head"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val slope = (col("n_head") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n_head") * col("sxx") - col("sx") * col("sx")).cast("double")
    s.select(
      col("n_head"),
      (round(slope, 4) + lit(0.0)).as("slope"),
      (round((col("sy").cast("double") / lit(1000000.0) -
          slope * (col("sx").cast("double") / lit(1000000.0))) / col("n_head"), 4)
        + lit(0.0)).as("intercept"))
  }

  /** Per-language distinctive vocabulary — the lift/log-odds-style
    * domain-signature table a corpus analyst reads to see WHAT a
    * language/domain slice is about: for each lang, the top-5 tokens
    * by LIFT = (share of the token within the lang) / (share across
    * the corpus). Lift > 1 = over-represented in that slice.
    *
    * Determinism: lift is a quotient of two exact integer products
    * (n_lt·N over n_t·N_l, DECIMAL(38,0) / HUGEINT so the products
    * never truncate at scale) — both engines derive the identical
    * double, rank on it with the token tiebreak, and round only for
    * display. Scale: one token-explode shuffle builds the (lang,
    * token) counts; both marginals fold from THAT table (never a
    * second corpus pass), the grand total broadcasts, and the rank
    * window runs over lang×vocab counts (bounded), cut by a
    * WindowGroupLimit. Support floor n_lt >= 5 keeps one-off tokens
    * from posting infinite-ish lifts. */
  def txtDistinctive(spark: SparkSession, dir: String): DataFrame = {
    // The (lang, token) count table feeds FOUR consumers (itself + two
    // marginals + the grand total); without a materialization barrier
    // each consumer re-runs the corpus explode+count subtree (the r2
    // minhash diamond — and 4 redundant exchanges tripped the
    // PlanAuditSpec shuffle ceiling). One checkpointed pass; the
    // marginals are then vocab/lang-sized aggregates that broadcast.
    val lt = Tables(spark, dir).documents
      .select(col("lang"), explode(expr(tokensExpr)).as("token"))
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("n_lt"))
      .localCheckpoint()
    val lTot = lt.groupBy("lang").agg(sum("n_lt").as("n_l"))
    val tTot = lt.groupBy("token").agg(sum("n_lt").as("n_t"))
    val tot = lt.agg(sum("n_lt").as("n"))
    val w = Window.partitionBy("lang").orderBy(desc("lift"), col("token"))
    lt.join(lTot, "lang").join(tTot, "token").crossJoin(broadcast(tot))
      .filter(col("n_lt") >= 5)
      .withColumn("lift",
        (col("n_lt").cast("decimal(38,0)") * col("n")).cast("double") /
          (col("n_t").cast("decimal(38,0)") * col("n_l")).cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk").cast("long").as("rnk"), col("token"),
        col("n_lt"), round(col("lift"), 4).as("lift"))
      .orderBy("lang", "rnk")
  }

  /** Hashing-trick featurization dimensionality. */
  val HtfDim = 64

  /** Hashing-trick bag-of-words featurization (HashingTF): each token
    * hashes to one of [[HtfDim]] feature slots (md5-derived — the only
    * cross-engine hash), per-doc counts become the feature value. The
    * fixed-dimensional output a linear quality classifier or fasttext-
    * style model consumes — no vocabulary pass, no OOV handling, which
    * is the trick's whole point at 100 TB. Output exploded as (doc_id,
    * feature_idx, cnt) — the sparse representation; one shuffle on the
    * (doc, slot) pair, partial-aggregated. */
  def txtHashingTf(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr(tokensExpr)).as("token"))
      .withColumn("feature_idx",
        expr(s"CAST(conv(substr(md5(token), 1, 8), 16, 10) AS BIGINT) % $HtfDim"))
      .groupBy("doc_id", "feature_idx")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "feature_idx")

  /** Passage-level exact dedup: split each doc into non-overlapping
    * 10-token chunks, find chunks appearing in ≥2 DISTINCT docs — the
    * line/paragraph-granularity dedup step (RefinedWeb-style) that
    * catches boilerplate recycled across otherwise-different documents,
    * where doc-level fingerprints see nothing.
    *
    * Scale posture: chunking is a per-row transform (≈n_tokens/10 rows
    * out per doc — LINEAR, unlike shingling's ×k blow-up), the groupBy
    * key is an md5 chunk hash (uniform by construction), and the
    * count_distinct partial-aggregates. Chunks under 30 chars are
    * dropped BEFORE the shuffle — short chunks are stopword noise and
    * would be the skew keys. */
  def txtPassageDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(tokensExpr).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, (size(ts) - 1) div 10), " +
          "i -> array_join(slice(ts, i * 10 + 1, 10), ' '))")).as("chunk"))
      .filter(length(col("chunk")) >= 30)
      .groupBy(md5(col("chunk")).as("chunk_hash"))
      .agg(count_distinct(col("doc_id")).as("n_docs"), min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("chunk_hash")

  /** Boilerplate STRIP measurement — the C4/RefinedWeb cleaning step
    * txt_passage_dedup only reports: chunks whose document frequency
    * reaches [[BoilerDf]] (headers, footers, license blurbs) are
    * boilerplate, and the query measures what stripping them would
    * cost each source in exact ppm of token mass. Totals count EVERY
    * chunk (Σ chunk lengths = doc tokens); only ≥30-char chunks can
    * qualify as boilerplate (the passage_dedup noise gate — a 1-token
    * tail chunk repeating across docs is not a template). One
    * checkpointed chunk pass feeds the df table and the measured
    * join-back; the boiler set is tiny by construction (high-df
    * chunks) and rides back as a broadcast.
    *
    * Threshold calibration: [[BoilerDf]] = 3 exercises the strip path
    * on the test corpus, whose duplicate families top out at df 3–4
    * (a share-of-corpus threshold like 1% of docs never fires there
    * and would gate a permanently-zero column). A production web
    * crawl raises this ONE constant to a share-of-corpus value — it
    * is interpolated into the oracle too, so Spark and the gate can
    * never disagree on the knob (a runtime parameter would let a
    * caller diverge from the fixed oracle; review-caught). */
  private[graft] val BoilerDf = 3L

  def txtStripBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val chunks = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), expr(tokensExpr).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, (size(ts) - 1) div 10), i -> slice(ts, i * 10 + 1, 10))"))
        .as("ctoks"))
      .select(col("doc_id"), col("source"),
        md5(array_join(col("ctoks"), " ")).as("h"),
        size(col("ctoks")).cast("long").as("ctok"),
        length(array_join(col("ctoks"), " ")).as("clen"))
      .localCheckpoint()
    val boiler = chunks.filter(col("clen") >= 30)
      .groupBy("h").agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= BoilerDf)
      .select(col("h"), lit(1L).as("isb"))
    chunks.join(broadcast(boiler), Seq("h"), "left")
      .groupBy("source")
      .agg(sum("ctok").as("tokens_total"),
        sum(when(col("isb").isNotNull, col("ctok")).otherwise(0L))
          .as("tokens_boiler"))
      .withColumn("boiler_ppm",
        expr("tokens_boiler * 1000000 div tokens_total"))
      .orderBy("source")
  }

  /** Soft deduplication — duplicate-count DOWNWEIGHTING, the policy
    * alternative to dedup_exact's hard drop (repetition-aware training
    * weights: a doc with k exact copies contributes 1/k of a doc, so a
    * crawl's duplication structure reweights the mixture instead of
    * truncating it). Per-copy weight = exact `1e6 div k` ppm off ONE
    * content-hash window (an unordered count-over-partition — one
    * uniform md5 exchange, no sort), then a per-source rollup of raw
    * vs EFFECTIVE doc and token mass. The raw−effective gap per source
    * is the number a mixture designer reads next to mix_temperature's
    * quota: how much of this source is genuinely distinct mass. */
  def mixSoftDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("h")
    Tables(spark, dir).documents
      .select(col("source"), md5(col("text")).as("h"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"))
      .withColumn("k", count(lit(1)).over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("k") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_docs"),
        sum(expr("1000000 div k")).as("eff_docs_ppm"),
        sum("tok").as("toks_raw"),
        sum(expr("tok * (1000000 div k)")).as("eff_toks_ppm"))
      .orderBy("source")
  }

  /** mix_token_budget's per-source token budget. */
  private[graft] val MixBudgetTokens = 700L

  /** Data-mixing sampler: downsample each source stratum to a fixed
    * TOKEN budget — the mixture-weighting step every training-data
    * pipeline runs between curation and training. Two linear passes:
    * (1) per-source token totals → a keep-rate in exact ppm
    * (`budget·1e6 div total`, clamped at 1e6); (2) a per-row
    * md5-threshold keep decision (first 6 hex digits of md5(doc_id) as
    * a uniform draw in [0, 16^6), compared CROSS-MULTIPLIED in BIGINT
    * — no double anywhere, so the selection is reproducible across
    * runs, engines, partitionings, and cluster sizes). Output per
    * source: kept/total docs and tokens, the rate, and a sum(doc_id)
    * checksum pinning the exact kept SET (not just its size).
    *
    * Scale: this is the rate-threshold formulation — O(1) per row,
    * broadcast-joined rates — NOT the per-source ordered cumulative
    * sum, which would serialize each source's whole stratum through
    * one task at 100 TB (a window PARTITION BY source with source
    * cardinality ~20 is the textbook skew trap). The price is
    * tokens_kept ≈ budget rather than ≤ budget exactly; a pipeline
    * that needs the hard cap runs this rate pass first and trims the
    * overshoot (≤ one doc in expectation per source). */
  def mixTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    // One corpus scan: the tokenizer regexp over `text` is the
    // expensive part and three consumers read its output (rates twice
    // via the final join-back, kept once) — checkpoint the slim
    // (id, source, tok, draw) projection so the text is read ONCE.
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)")
          .as("draw"))
      .localCheckpoint()
    val rates = toks.groupBy("source")
      .agg(count(lit(1)).as("n_total"), sum("tok").as("toks_total"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr(s"$MixBudgetTokens * 1000000 div toks_total")))
    val kept = toks
      .join(broadcast(rates.select("source", "rate_ppm")), "source")
      .filter(expr("draw * 1000000 < rate_ppm * 16777216"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("tok").as("toks_kept"),
        sum("doc_id").as("kept_id_sum"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"), col("toks_total"), col("rate_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("toks_kept"), lit(0L)).as("toks_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
      .orderBy("source")
  }

  /** Data-constrained EPOCH planning (the up-sampling counterpart to
    * [[mixTokenBudget]]'s downsampler): when the training budget
    * EXCEEDS the corpus, which sources get repeated, and how many
    * times? Follows the data-constrained-scaling result (Muennighoff
    * et al. 2023) that repeating data holds its value for ~4 epochs —
    * so the plan is a quality-greedy fill with a hard 4-epoch cap:
    * sources rank by type-token ratio (exact integer ppm — the
    * cheapest deterministic quality proxy; a model-based scorer plugs
    * into the same rank column), each takes min(4·tokens, remaining
    * budget) in rank order, the marginal source takes a fractional
    * epoch, the tail takes zero. Budget = 3× the corpus (computed, not
    * a literal — the plan exercises cap, partial, and cutoff at every
    * scale factor).
    *
    * Scale: token totals + distinct-type counts are partial-aggregated
    * corpus passes; the greedy fill is a cumulative window over the
    * SOURCE-sized table (bounded — the stratum count, not the corpus),
    * so the sequential-looking greedy costs nothing distributed.
    * Everything after the scan is exact BIGINT (`div` vs `//` stays
    * engine-side, the q34 note). */
  def mixEpochPlan(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("source"),
        explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("w"))
    val per = toks.groupBy("source")
      .agg(count(lit(1)).as("toks_total"),
        countDistinct("w").as("n_types"))
      .selectExpr("source", "toks_total", "n_types",
        "n_types * 1000000 div toks_total AS quality_ppm")
    val budget = per.agg(sum(expr("3 * toks_total")).as("budget"))
    val w = Window.orderBy(desc("quality_ppm"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per.crossJoin(broadcast(budget))
      .withColumn("cum_before",
        coalesce(sum(expr("4 * toks_total")).over(w), lit(0L)))
      .selectExpr("source", "toks_total", "quality_ppm",
        "least(4 * toks_total, greatest(budget - cum_before, 0)) AS take_tokens")
      .selectExpr("source", "toks_total", "quality_ppm", "take_tokens",
        "take_tokens * 1000000 div toks_total AS epochs_ppm")
      .orderBy(desc("quality_ppm"), col("source"))
  }

  /** mix_temperature's total token budget across all sources. */
  private[graft] val MixTempTokens = 14000L

  /** Temperature-scaled source mixing (α = 0.5): sampling weight per
    * source ∝ √tokens — the standard multilingual/multi-source
    * rebalancing that upweights small strata relative to proportional
    * sampling (T5/mT5-style temperature mixing) — normalized to a
    * fixed TOTAL token budget. Source s keeps
    * rate_s = B·√w_s / (Σ_t √w_t · w_s), so sampled token mass is
    * ∝ √w_s and Σ sampled ≈ B.
    *
    * Cross-engine determinism with an IRRATIONAL weight function:
    * IEEE-754 sqrt is correctly rounded in both engines (Math.sqrt and
    * libm), so √(exact BIGINT as double) is bit-identical; it is
    * immediately quantized to fixed-point micro-units
    * (⌊√tokens·1e6⌋ — floor of a bit-identical double is the same
    * integer everywhere), and EVERYTHING after is exact integer math:
    * the normalizer Σq is a BIGINT sum (order-independent, unlike a
    * double sum — the kmeansParallelInit lesson), the per-source rate
    * is one DECIMAL(38,0) integral division to ppm, and the per-row
    * keep decision is the mix_token_budget cross-multiplied
    * md5-threshold compare. Reproducible across runs, engines,
    * partitionings, and cluster sizes.
    *
    * Scale: same rate-threshold posture as [[mixTokenBudget]] — O(1)
    * per row, broadcast rates, no per-source ordered scan; the
    * normalizer is a 1-row broadcast crossJoin over the ~#sources-row
    * per-source aggregate. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)")
          .as("draw"))
      .localCheckpoint()
    // The ~#sources-row per-source table has THREE consumers (the
    // normalizer agg, the rate join, the final report join) — without
    // the checkpoint each consumer re-runs the corpus-sized groupBy
    // (the qc_drift lesson: 8 shuffles → 5).
    val per = toks.groupBy("source")
      .agg(count(lit(1)).as("n_total"), sum("tok").as("toks_total"))
      .withColumn("q_micro",
        expr("CAST(floor(sqrt(CAST(toks_total AS DOUBLE)) * 1000000) AS BIGINT)"))
      .localCheckpoint()
    val rates = per
      .crossJoin(broadcast(per.agg(sum("q_micro").as("q_sum"))))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr(s"CAST($MixTempTokens AS DECIMAL(38,0)) * 1000000 * q_micro" +
            " div (CAST(q_sum AS DECIMAL(38,0)) * toks_total)")))
    val kept = toks
      .join(broadcast(rates.select("source", "rate_ppm")), "source")
      .filter(expr("draw * 1000000 < rate_ppm * 16777216"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("tok").as("toks_kept"),
        sum("doc_id").as("kept_id_sum"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"), col("toks_total"),
        col("q_micro"), col("rate_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("toks_kept"), lit(0L)).as("toks_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
      .orderBy("source")
  }

  /** Per-document n-gram novelty: the share of a doc's DISTINCT word
    * bigrams that appear in NO other document (corpus df = 1) — high
    * novelty flags unique content worth upweighting (or hallucinated
    * noise worth inspecting); low novelty flags template text the
    * repetition gates might miss when the repeats are spread across
    * documents. The novelty score is exact integer ppm
    * (`novel·1e6 div distinct`) so ordering is cross-engine stable;
    * top-20 most-novel docs with a doc_id tiebreak.
    *
    * Scale: one explode of DISTINCT per-doc bigrams (≤ tokens−1 per
    * doc, linear), one partial-aggregated df count keyed on the bigram
    * (uniform text keys), one join back — the txt_tfidf shape with df=1
    * as the interesting tail. */
  def txtNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables(spark, dir).documents
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "array_distinct(zip_with(slice(tk, 1, size(tk) - 1), " +
          "slice(tk, 2, size(tk) - 1), (a, b) -> concat(a, ' ', b)))")).as("bg"))
      .localCheckpoint()
    // df per bigram partial-aggregates map-side (a hot boilerplate
    // bigram arrives at its reducer as per-partition counts, never as
    // rows — the reason this is a groupBy+join, not a window over bg).
    val df = bg.groupBy("bg").agg(count(lit(1)).as("df"))
    bg.join(df, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_bigrams"), col("n_novel"),
        expr("n_novel * 1000000 div n_bigrams").as("novelty_ppm"))
      .orderBy(col("novelty_ppm").desc, col("doc_id"))
      .limit(20)
  }

  /** PMI-ranked bigram collocations — the phrase-mining op (new-term
    * discovery, tokenizer-merge candidates): bigrams whose observed
    * frequency beats the independence expectation, score =
    * n_ab·N / (n_a·n_b) (the PMI ratio without the log — log is a
    * libm-parity trap and monotone, so ranking is unchanged). A
    * min-support gate (n_ab ≥ 5) kills the 1-occurrence noise that
    * dominates raw PMI. The score is one product/quotient chain over
    * exact integers, mirrored association for IEEE-identical doubles.
    *
    * Scale: one bigram explode (linear ×1, not shingling's ×k), one
    * unigram explode, three partial-aggregated counts, then joins on
    * the COLLAPSED bigram/unigram tables (post-aggregation, so a hot
    * stopword pair arrives as one row, not its occurrence stream). */
  def txtCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val toks = docs.select(col("doc_id"), expr(tokensExpr).as("tk"))
    val bg = toks.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "zip_with(slice(tk, 1, size(tk) - 1), " +
          "slice(tk, 2, size(tk) - 1), (a, b) -> concat(a, ' ', b))")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
      .select(expr("substring_index(bg, ' ', 1)").as("w1"),
        expr("substring_index(bg, ' ', -1)").as("w2"), col("n_ab"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
      .localCheckpoint() // joined twice (w1 side + w2 side) — one pass
    val nTok = uni.agg(sum("n_w").as("nn"))
    bg.join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("n_ab"),
        expr("CAST(n_ab AS DOUBLE) * CAST(nn AS DOUBLE) / " +
          "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))").as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Distribution-drift detector (χ²-style) between sources — the
    * data-quality gate a pipeline runs when a new crawl/source lands:
    * does source s's length distribution deviate from the corpus?
    * Lengths bucket into a 10-bin EQUI-WIDTH histogram (equi-depth
    * quantile edges are an engine-parity trap — see agg_histogram);
    * for each (source, bucket) the homogeneity deviation is the χ²
    * contribution ((O·N − N_s·n_b)² / (N·N_s·n_b)), whose numerator
    * root d = O·N − N_s·n_b is computed EXACTLY in DECIMAL(38,0) —
    * the one fraction is a quotient of identical exact integers in
    * both engines, hence the identical IEEE double. Top-15 deviations.
    *
    * Scale: two partial-aggregated shuffles over tiny key domains
    * (source×bucket, then bucket), 1-row global broadcast, no text
    * scan at all (n_chars is a stored column); the histogram bound
    * makes state O(sources × 10) whatever the corpus size. */
  def qcDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val lohi = docs.agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
    val bucketed = docs
      .crossJoin(broadcast(lohi))
      .select(col("source"),
        when(col("hi") === col("lo"), lit(1L))
          .otherwise(expr("(n_chars - lo) * 10 div (hi - lo + 1)")).as("bucket"))
    // sb is sources×10 rows and feeds FOUR consumers (itself + three
    // marginals) — without the cut each re-derived from a fresh
    // documents scan (8 corpus passes in the audited plan; 2 is the
    // floor: one min/max pass, one bucketing pass).
    val sb = bucketed.groupBy("source", "bucket").agg(count(lit(1)).as("n_obs"))
      .localCheckpoint()
    val bTot = sb.groupBy("bucket").agg(sum("n_obs").as("n_b"))
    val sTot = sb.groupBy("source").agg(sum("n_obs").as("n_s"))
    val tot = sb.agg(sum("n_obs").as("n"))
    sb.join(broadcast(bTot), "bucket")
      .join(broadcast(sTot), "source")
      .crossJoin(broadcast(tot))
      .withColumn("d",
        expr("CAST(n_obs AS DECIMAL(38,0)) * n - CAST(n_s AS DECIMAL(38,0)) * n_b"))
      .select(col("source"), col("bucket"), col("n_obs"),
        expr("CAST(CAST(n_s AS DECIMAL(38,0)) * n_b * 1000000 div n AS BIGINT)")
          .as("exp_ppm"),
        expr("CAST(d AS DOUBLE) * CAST(d AS DOUBLE) / " +
          "(CAST(n AS DOUBLE) * CAST(n_s AS DOUBLE) * CAST(n_b AS DOUBLE))")
          .as("chi2_contrib"))
      .orderBy(col("chi2_contrib").desc, col("source"), col("bucket"))
      .limit(15)
  }

  /** The RedmapOps facade exercised under the ORACLE gate (the
    * mr_salted_join move, applied to §2.1's typed API): a six-stage
    * redmap job — FlatMap(tokenize) → Filter(len≥4) → KeyBy →
    * MapValues(1) → ReduceByKey(+) → Filter(cnt≥10) → Sort — written
    * ENTIRELY in the typed combinators, checked against a plain SQL
    * oracle every round. The closure tokenizer mirrors the SQL
    * tokenizer exactly ([a-z0-9]+ over lowercased text — both java
    * regex and DuckDB RE2 agree on this class-only pattern).
    *
    * Scale: the combinators delegate to Dataset ops, so the chain is
    * ONE whole-stage-codegen'd scan → partial-aggregating
    * groupByKey+reduce (redmap's combiner for free) → range-exchange
    * sort; RedmapOpsSpec separately proves the plan shapes. */
  def mrRedmapPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.api.RedmapOps._
    Tables(spark, dir).documents.select("text").as[String]
      .flatMapOp(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq)
      .filterOp(_.length >= 4)
      .keyByOp(identity)
      .mapValuesOp(_ => 1L)
      .reduceByKeyOp(_ + _)
      .filterOp(_._2 >= 10L)
      .sortOp { case (w, _) => w }
      .toDF("word", "cnt")
  }

  /** Classic redmap job: word count (flatMap → reduceByKey). */
  def mrWordcount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(explode(expr(tokensExpr)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Classic redmap job: distributed grep + per-source count. */
  def mrGrepCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .filter(col("text").rlike("merge"))
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("source")

  /** Corpus composition report — predicted-language mix PER SOURCE
    * (the table a curation team prints before setting mixing weights,
    * and the [[qcDrift]]-style screen for a source whose language mix
    * shifted between snapshots): per (source, predicted lang), doc
    * count and exact-ppm share of the source. Rides [[txtLangid]]'s
    * marker heuristic unchanged; one slim (doc_id, source) join, a
    * partial-aggregated count on the |sources|×|langs| domain, and a
    * broadcast of per-source totals for the cross-multiplied ppm. */
  def qcLangMix(spark: SparkSession, dir: String): DataFrame = {
    val mix = txtLangid(spark, dir)
      .join(Tables(spark, dir).documents.select("doc_id", "source"), "doc_id")
      .groupBy("source", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
    val tot = mix.groupBy("source").agg(sum("n_docs").as("n_src"))
    mix.join(broadcast(tot), "source")
      .select(col("source"), col("pred_lang"), col("n_docs"),
        expr("n_docs * 1000000 div n_src").as("share_ppm"))
      .orderBy("source", "pred_lang")
  }

  /** Jensen–Shannon divergence between two sources' unigram
    * distributions — the bounded symmetric corpus-comparison number
    * (0 = identical mixes, 1 bit = disjoint) curation reads before
    * blending a new source, where KL would blow up on any
    * vocabulary gap. Computed in the two-sided KL form
    * ½Σ[p·log2(2p/(p+q)) + q·log2(2q/(p+q))] so absent-word terms
    * vanish exactly (x·log x → 0 via the CASE, no smoothing).
    * Per-word terms derive from exact integer counts, quantize to
    * 1e-9, and fold as exact BIGINTs — order-independent; one token
    * explode + |vocab|-key shuffle. */
  def txtJsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(expr(tokensExpr)).as("w"))
      .groupBy("w")
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c2"))
      .localCheckpoint()
    toks
      .crossJoin(broadcast(toks.agg(sum("c1").as("n1"), sum("c2").as("n2"))))
      .select(expr("""CAST(round((
          CASE WHEN c1 = 0 THEN 0.0
               ELSE (CAST(c1 AS DOUBLE) / n1)
                    * log2(2 * (CAST(c1 AS DOUBLE) / n1)
                           / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)) END
          + CASE WHEN c2 = 0 THEN 0.0
                 ELSE (CAST(c2 AS DOUBLE) / n2)
                      * log2(2 * (CAST(c2 AS DOUBLE) / n2)
                             / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)) END
        ) * 1000000000) AS BIGINT)""").as("tq"))
      .agg(count(lit(1)).as("n_words"),
        (round(sum("tq").cast("double") / lit(1000000000.0) / 2, 4) + lit(0.0))
          .as("js_bits"))
  }

  /** Chi-square test of independence between lang and source — the
    * statistical-significance layer over [[qcLangMix]]'s composition
    * report: is the language mix actually DIFFERENT across sources, or
    * within sampling noise? χ² = Σ (o−e)²/e over the full R×C grid
    * (including zero-observed cells — they still carry expectation),
    * e = row·col/N from exact integer marginals.
    *
    * Determinism: every per-cell term is a double derived from four
    * exact integers with pinned association ((r·c)/N), quantized to
    * 1e-6 units before the fold, and the fold is an exact BIGINT sum —
    * partition-order-independent. Scale: one partial-aggregated count
    * on the R×C domain; marginals fold from THAT table (no second
    * corpus pass); the zero-cell completion is a broadcast
    * dim-cross-join on |R|·|C| rows. */
  def statChi2(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables(spark, dir).documents
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val rows = obs.groupBy("lang").agg(sum("o").as("r"))
    val cols = obs.groupBy("source").agg(sum("o").as("c"))
    val n = obs.agg(sum("o").as("n"), count(lit(1)).as("n_obs_cells"))
    rows.crossJoin(cols)
      .join(obs, Seq("lang", "source"), "left")
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("n_obs_cells"), col("n"),
        expr("""CAST(round(
          (CAST(coalesce(o, 0) AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
          * (CAST(coalesce(o, 0) AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
          / (CAST(r AS DOUBLE) * c / n) * 1000000) AS BIGINT)""").as("termq"))
      .agg(max("n_obs_cells").as("n_obs_cells"),
        count(lit(1)).as("n_cells"),
        ((countDistinct("lang") - 1) * (countDistinct("source") - 1)).as("dof"),
        max("n").as("n_tot"),
        least(countDistinct("lang") - 1, countDistinct("source") - 1).as("dmin"),
        sum("termq").as("sq"))
      .select(col("n_cells"), col("n_obs_cells"), col("dof"),
        (round(col("sq").cast("double") / lit(1000000.0), 4) + lit(0.0)).as("chi2"),
        // Cramér's V — χ² normalized to [0,1] effect size, so the
        // verdict is comparable across table shapes and corpus sizes.
        (round(sqrt((col("sq").cast("double") / lit(1000000.0))
          / (col("n_tot").cast("double") * col("dmin"))), 4) + lit(0.0))
          .as("cramers_v"))
  }

  /** k-anonymity audit over quasi-identifiers (lang, source, length
    * band) — the privacy screen a training-data release runs: how
    * small is the smallest identifier-combination group, and how many
    * documents sit in groups below k=5 (re-identifiable under linkage
    * attacks). One partial-aggregated count on the QI domain, then a
    * 1-row integer fold — all counts exact. */
  def qcKAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 50").as("len_band"))
      .agg(count(lit(1)).as("g"))
      .agg(count(lit(1)).as("n_groups"),
        min("g").as("min_k"),
        sum(when(col("g") < 5, lit(1)).otherwise(lit(0))).as("groups_below_5"),
        sum(when(col("g") < 5, col("g")).otherwise(lit(0))).as("docs_below_5"))

  /** One BPE merge step — adjacent character-pair frequencies over the
    * corpus's word stream (with word multiplicity), i.e. exactly the
    * count a byte-pair-encoding tokenizer trainer computes to pick its
    * next merge: top-30 pairs by count with (count DESC, pair ASC)
    * tiebreak. A full BPE train iterates this; the per-iteration scan
    * is the distributed-scale piece (the merge TABLE update between
    * iterations is driver-side small — the kmeansLoop posture), so the
    * oracle gates the kernel once rather than unrolling a vocabulary
    * trajectory.
    *
    * Scale: tokenize → per-word pair explode (bounded: word length) →
    * partial-aggregated count on the ≤36² pair domain →
    * TakeOrderedAndProject. A hot pair ("th") arrives at the shuffle
    * as one row per partition, never as its occurrence stream. */
  def txtBpeMerge(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(explode(expr(tokensExpr)).as("t"))
      .filter(length(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("pair"))
      .limit(30)

  /** Rounds for [[txtBpeTrain]] — mirrored in the oracle's unroll. */
  private[graft] val BpeRounds = 6

  /** Iterative BPE tokenizer TRAINING — [[txtBpeMerge]] is one scan of
    * the kernel; this runs the actual train loop: R rounds of
    * (count adjacent symbol pairs → adopt the top pair as a merge →
    * rewrite), emitting the learned merge table (round, merge_left,
    * merge_right, pair_count) a tokenizer ships with.
    *
    * Scale design, in order of importance: (1) the corpus is scanned
    * ONCE — training operates on the collapsed (word, count) frequency
    * table (vocabulary-sized, not corpus-sized; this is how real BPE
    * trainers work), so every iteration is a job over thousands of
    * rows regardless of corpus bytes; (2) the chosen merge is ONE
    * driver-side row per round re-entering as literals (the kmeansLoop
    * posture); (3) the rewritten vocab is checkpointed per round so
    * round r never replays rounds 1..r-1's rewrites.
    *
    * Symbol mechanics shared with the oracle: a word's symbol string
    * BRACKETS every symbol as "_x." ("the" → "_t._h._e."), so a
    * merge (a, b) is the plain string replace "_a._b." → "_ab.",
    * greedy-left-to-right in BOTH engines (the overlapping-pair
    * convention of standard BPE). The two-sided bracket is load-
    * bearing twice over: the trailing '.' right-bounds the pattern
    * (a learned (n, t) must NOT fire on "_n._th." just because 'th'
    * starts with 't'), and because adjacent pairs share no
    * characters, a replacement never consumes the next match's
    * leading bracket ("_e._r._e._r." under (e, r) correctly yields
    * "_er._er.", where a shared-delimiter encoding drops the second
    * merge). Neither bracket char can occur inside a symbol (tokens
    * are [a-z0-9]+). Ties on pair count break on the
    * pair string ascending in both engines. The oracle unrolls R
    * MATERIALIZED rounds with scalar-subquery merge selection. */
  /** The BPE train chain in DuckDB — wf0 (word → interleaved repr ×
    * count, the word IDENTITY carried so the apply oracle can join the
    * final reprs back) and [[BpeRounds]] unrolled MATERIALIZED rounds:
    * p$r pair counts, m$r scalar top-1 merge, wf$r the rewrite. Shared
    * by the train and apply oracles. If a round has no pairs (m$r
    * empty — degenerate/tiny corpora), the scalar subquery coalesces
    * to '' so the replace pattern becomes '_.'— unmatchable, since
    * symbols are nonempty — keeping the rewrite a no-op exactly like
    * the Spark loop's empty-round skip (a raw NULL would null every
    * repr and corrupt all later rounds). */
  private def bpeChainSql: String = {
    def roundCtes(r: Int): String = {
      val prev = if (r == 1) "wf0" else s"wf${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT pr, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(sy)),
         |      i -> sy[i] || ' ' || sy[i + 1])) AS pr
         |    FROM (SELECT cnt,
         |            list_filter(string_split(replace(repr, '.', ''), '_'), x -> x <> '') AS sy
         |          FROM $prev))
         |  GROUP BY pr),
         |m$r AS MATERIALIZED (SELECT pr, c FROM p$r ORDER BY c DESC, pr LIMIT 1),
         |wf$r AS MATERIALIZED (
         |  SELECT t, replace(repr,
         |      '_' || replace(coalesce((SELECT pr FROM m$r), ''), ' ', '._') || '.',
         |      '_' || replace(coalesce((SELECT pr FROM m$r), ''), ' ', '') || '.') AS repr, cnt
         |  FROM $prev)""".stripMargin
    }
    s"""wf0 AS MATERIALIZED (
       |  SELECT t, regexp_replace(t, '(.)', '_\\1.', 'g') AS repr,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest($tokensSql) AS t FROM documents)
       |  GROUP BY 1, 2),
       |${(1 to BpeRounds).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  private val bpeMemo = scala.collection.mutable.Map
    .empty[(Int, String), Seq[(Int, String, String, Long)]]

  /** The train loop behind [[txtBpeTrain]] and [[txtBpeApply]],
    * memoized per (session, dir) so the apply op never re-trains. */
  private def learnedBpeMerges(spark: SparkSession, dir: String)
      : Seq[(Int, String, String, Long)] = bpeMemo.synchronized {
    bpeMemo.getOrElseUpdate((System.identityHashCode(spark), dir), {
      var vocab = Tables(spark, dir).documents
        .select(explode(expr(tokensExpr)).as("t"))
        .groupBy("t").agg(count(lit(1)).as("cnt"))
        .select(expr("regexp_replace(t, '(.)', '_$1.')").as("repr"), col("cnt"))
        .localCheckpoint()
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      (1 to BpeRounds).foreach { r =>
        val best = vocab
          .select(col("cnt"), expr(
            "filter(split(replace(repr, '.', ''), '_'), x -> x != '')").as("sy"))
          .filter(size(col("sy")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(sy) - 1), i -> concat(element_at(sy, i), ' ', element_at(sy, i + 1)))")).as("pr"))
          .groupBy("pr").agg(sum("cnt").as("c"))
          .orderBy(desc("c"), col("pr"))
          .limit(1).collect()
        if (best.nonEmpty) {
          val Array(l, rt) = best.head.getString(0).split(" ", 2)
          merges += ((r, l, rt, best.head.getLong(1)))
          // literal-pattern rewrite of the vocab (never the corpus);
          // plain replace() — same greedy left-to-right non-overlap
          // semantics in both engines, no regex metacharacter risk
          // (symbols are [a-z0-9]+ concatenations)
          vocab = vocab
            .withColumn("repr", expr(s"replace(repr, '_$l._$rt.', '_$l$rt.')"))
            .localCheckpoint()
        }
      }
      merges.result()
    })
  }

  def txtBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("merge_left", StringType, nullable = false),
      StructField("merge_right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learnedBpeMerges(spark, dir).map(m => Row(m._1, m._2, m._3, m._4)), 1),
      schema).orderBy("round")
  }

  /** APPLY the learned merges — the tokenizer-eval half of
    * [[txtBpeTrain]] (a merge table is only as good as the
    * compression it buys): every word re-tokenizes under the 6 learned
    * merges (the same literal-replace chain, applied as 6 chained
    * expressions in ONE codegen'd projection — no joins, no shuffle
    * beyond the word-frequency rollup), reported per language as
    * char-tokens before vs BPE-tokens after with the exact-ppm
    * compression ratio. The merges re-enter as literals from the
    * memoized train (never re-learned), so this op prices the
    * tokenizer on the corpus the way a data team decides vocab size. */
  def txtBpeApply(spark: SparkSession, dir: String): DataFrame = {
    val merges = learnedBpeMerges(spark, dir)
    val reprExpr =
      merges.foldLeft("regexp_replace(t, '(.)', '_$1.')") {
        case (e, (_, l, r, _)) => s"replace($e, '_$l._$r.', '_$l$r.')"
      }
    Tables(spark, dir).documents
      .select(col("lang"), explode(expr(tokensExpr)).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"), length(col("t")).as("chars"),
        size(expr(s"filter(split(replace($reprExpr, '.', ''), '_'), x -> x != '')")).as("toks"))
      .groupBy("lang")
      .agg(sum("cnt").as("n_words"),
        sum(expr("chars * cnt")).as("n_char_tokens"),
        sum(expr("toks * cnt")).as("n_bpe_tokens"))
      .withColumn("compression_ppm",
        expr("n_bpe_tokens * 1000000 div n_char_tokens"))
      .orderBy("lang")
  }

  /** txt_chunk_pack's context-window token budget. Docs average ~54
    * whitespace tokens, so 512 packs ~9 docs per window — a real
    * packing ratio at every test scale (each of the 20 sources fills
    * ≥2 windows even on the 500-doc corpus). */
  private[graft] val PackBudget = 512L

  /** Context-window sequence packing — the step that turns a curated
    * corpus into fixed-size training windows: docs are packed
    * CONTIGUOUSLY in doc_id order into windows of [[PackBudget]]
    * tokens (a doc belongs wholly to the window its FIRST token's
    * offset falls in, so windows can overflow past the budget; the
    * overflow count is part of the report). Packing is PER SOURCE — the window function
    * partitions by source, which is both the semantics a mixed-corpus
    * pipeline wants (no cross-source contamination inside one context
    * window) and the scale posture: a global ordered cumsum is a
    * single-task window, per-source cumsum distributes across the
    * source partitions exactly like a per-shard packer on a cluster.
    * Report per source: docs, tokens, windows, overflowing windows,
    * the fattest window, and mean fill as exact ppm of budget.
    *
    * All integer arithmetic (token counts, floor-div window ids,
    * cross-multiplied ppm) — bit-stable across engines and partition
    * orders; the ONE ordered operation is the per-source prefix sum,
    * whose order key (doc_id) is unique, so the cumsum is
    * deterministic (the secondary-sort total-order contract). */
  def txtChunkPack(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tok"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val binned = toks
      .withColumn("cum_before", coalesce(sum("tok").over(w), lit(0L)))
      .withColumn("win_id", expr(s"cum_before div $PackBudget"))
    binned
      .groupBy("source", "win_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("win_tok"))
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"),
        sum("win_tok").as("n_tokens"),
        count(lit(1)).as("n_windows"),
        sum(when(col("win_tok") > PackBudget, 1L).otherwise(0L)).as("n_overflow"),
        max("win_tok").as("max_win_tok"))
      .withColumn("fill_ppm",
        expr(s"n_tokens * 1000000 div (n_windows * $PackBudget)"))
      .orderBy("source")
  }

  /** Stand-in banned terms for [[txtBlocklist]] — the list is a
    * parameter of the operator (a real deployment loads its policy
    * list); these three are ~7.5% of the synthetic vocabulary so the
    * flag split is non-degenerate at every scale. */
  private val blockTerms = Seq("slow", "hash", "big")
  private val blockList = blockTerms.map(s => s"'$s'").mkString(", ")
  /** Flag threshold: docs whose banned-token share is ≥ this ppm. */
  private val BlockFlagPpm = 75000L

  /** Blocklist policy screen — the toxicity/NSFW-wordlist gate every
    * curation pipeline runs (here with stand-in terms; the list is a
    * parameter): per-doc banned-token share in exact ppm (integer
    * cross-multiplied division — thresholds compare identically
    * cross-engine), flagged at ≥7.5%, rolled up per source with doc
    * counts, flagged counts, flagged share, and the mean banned share
    * (an exact integer div of exact sums).
    *
    * Scale: the banned count is a map-side array filter over the
    * tokenizer's output (no explode, no shuffle until the |sources|-key
    * partial agg) — the whole screen is one codegen'd linear pass. */
  def txtBlocklist(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("source"), expr(tokensExpr).as("tk"))
      .select(col("source"), size(col("tk")).cast("long").as("nt"),
        expr(s"CAST(size(filter(tk, x -> x IN ($blockList))) AS BIGINT)").as("nb"))
      .select(col("source"),
        expr("CASE WHEN nt = 0 THEN 0 ELSE nb * 1000000 div nt END").as("ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ppm") >= BlockFlagPpm, 1L).otherwise(0L)).as("n_flagged"),
        sum("ppm").as("sppm"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        expr("n_flagged * 1000000 div n_docs").as("flagged_ppm"),
        expr("sppm div n_docs").as("avg_banned_ppm"))
      .orderBy("source")

  /** Unigram-LM cross-entropy per document — the language-model
    * quality/surprise score (the poor man's perplexity filter every
    * curation pipeline runs; CCNet/Gopher gate on exactly this shape):
    * H(doc) = −(1/n)·Σ_w c_w·log2(p_w) bits/token against the corpus
    * unigram distribution, reported for the 20 most surprising docs.
    * Perplexity = 2^H is monotone in H, so the ranking is unchanged and
    * the libm pow stays out of the gate (the txt_collocations move).
    *
    * Determinism: each distinct word's log2(N/c_w) is quantized to
    * 1e-9 integer units, the per-doc fold is an exact BIGINT sum of
    * integer products (order-independent), and the final bits/token is
    * ONE division of two exact integers — identical doubles, identical
    * ranking, deterministic (bits DESC, doc_id) order cross-engine.
    *
    * Scale: tokens collapse to per-(doc, word) counts BEFORE the vocab
    * join (hot stopwords arrive at the join as one row per doc, not one
    * per occurrence), the vocab count table partial-aggregates on
    * uniform-ish word keys (AQE skew-split covers the head), and the
    * top-20 cut is a TakeOrderedAndProject. */
  def txtPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val dtoks = Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr(tokensExpr)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val counts = dtoks.groupBy("w").agg(sum("c").as("cw"))
    val tot = counts.agg(sum("cw").as("nn"))
    dtoks.join(counts, "w")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("c"),
        expr("c * CAST(round(log2(CAST(nn AS DOUBLE) / cw) * 1000000000) AS BIGINT)")
          .as("tq"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), sum("tq").as("sq"))
      .withColumn("ce_bits",
        round(col("sq").cast("double") / lit(1000000000.0) / col("n_tokens"), 4)
          + lit(0.0))
      .orderBy((col("sq").cast("double") / lit(1000000000.0) / col("n_tokens")).desc,
        col("doc_id"))
      .limit(20)
      .select("doc_id", "n_tokens", "ce_bits")
  }

  private val markerSqlCounts = markers.map { case (l, ws) =>
    val arr = ws.map(w => s"'$w'").mkString(", ")
    s"len(list_intersect(tk, [$arr])) AS c_$l"
  }.mkString(",\n  ")

  /** The langid CTE chain (ends in `p(doc_id, pred_lang)`) — ONE SQL
    * definition of the marker heuristic shared by every langid-derived
    * oracle (txt_langid / qc_lang_mix / txt_lang_confusion /
    * stat_class_metrics / stat_cohens_kappa), so the prediction rule
    * cannot drift between its consumers. */
  private lazy val langidSqlCte =
    s"""d AS (SELECT doc_id, $tokensSql AS tk FROM documents),
       |c AS (SELECT doc_id,
       |  $markerSqlCounts
       |  FROM d),
       |p AS (SELECT doc_id,
       |  CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'unk'
       |   WHEN c_en >= greatest(c_de, c_fr, c_es) THEN 'en'
       |   WHEN c_de >= greatest(c_fr, c_es) THEN 'de'
       |   WHEN c_fr >= c_es THEN 'fr' ELSE 'es' END AS pred_lang
       |  FROM c)""".stripMargin

  /** The confusion-matrix + marginal CTE extension (`conf`, `tr`,
    * `pr`), shared by the stat_class_metrics and stat_cohens_kappa
    * oracles. */
  private lazy val confusionSqlCte =
    s"""$langidSqlCte,
       |conf AS (
       |  SELECT documents.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM p JOIN documents USING (doc_id) GROUP BY 1, 2),
       |tr AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS n_true
       |       FROM conf GROUP BY 1),
       |pr AS (SELECT pred_lang AS cls, CAST(sum(n) AS BIGINT) AS n_pred
       |       FROM conf GROUP BY 1)""".stripMargin

  /** The BM25-score CTE chain (ends in `bsq(doc_id, sq,
    * n_terms_hit)`), shared verbatim by the txt_bm25 oracle and the
    * sim_hybrid_rrf oracle — one lexical-scoring definition on the
    * oracle side too. */
  private[operators] def bm25CtesSql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, unnest($tokensSql) AS t FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS sdl FROM dl),
       |hits AS (SELECT doc_id, t FROM toks WHERE t IN ($terms)),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM hits GROUP BY 1, 2),
       |dft AS (SELECT t, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
       |bc AS (
       |  SELECT tf.doc_id, $Bm25ContribQ AS cq
       |  FROM tf JOIN dl USING (doc_id) JOIN dft USING (t) CROSS JOIN stats),
       |bsq AS (
       |  SELECT doc_id, CAST(sum(cq) AS BIGINT) AS sq, count(*) AS n_terms_hit
       |  FROM bc GROUP BY 1)""".stripMargin
  }

  private def txtBm25Oracle: String =
    s"""WITH ${bm25CtesSql}
       |SELECT doc_id, n_terms_hit,
       |  round(CAST(sq AS DOUBLE) / 1000000.0, 4) + 0.0 AS bm25
       |FROM bsq
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** Shared Laplace-mechanism formula: uniform draw u ∈ (0,1) from the
    * group key's md5 head, inverse-CDF'd to Laplace(b = 2) noise
    * (ε = 0.5, sensitivity 1 for a count release). One string per
    * step, both engines verbatim; the ln parity between JVM Math.log
    * and DuckDB libm is the established txt_tfidf/txt_entropy
    * contract. */
  private val DpU = "(CAST(h AS DOUBLE) + 0.5) / 4294967296.0"
  private val DpNoise =
    """CASE WHEN u < 0.5 THEN 2.0 * ln(2.0 * u)
      | ELSE -2.0 * ln(2.0 * (1.0 - u)) END""".stripMargin

  /** Differentially private count release (the Laplace mechanism,
    * Dwork et al. 2006) over per-language document counts — the shape
    * a data platform uses to publish corpus composition without
    * revealing any single document's membership: noise ~ Laplace(Δ/ε)
    * with Δ = 1 (one document moves one count by one), ε = 0.5.
    *
    * Determinism contract (what makes this ORACLE-CHECKABLE, and what
    * a production release would change): the uniform draw is a keyed
    * md5 hash of the GROUP LABEL, not a fresh random draw — same
    * inverse-CDF pipeline, reproducible across engines and runs. A
    * real release draws fresh randomness per publication (and pays ε
    * from a privacy ledger per release); swapping the hash for a
    * seeded RNG is a one-line change. The true count rides along here
    * because the gate validates the MECHANISM (u → noise → release);
    * a release would drop it. Scale: one partial-aggregated count +
    * per-group scalar math — nothing wider than the group-by. */
  def qcDpCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("h", expr("CAST(conv(substr(md5(lang), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("u", expr(DpU))
      .withColumn("noise", expr(DpNoise))
      .selectExpr("lang", "n",
        "round(noise, 4) + 0.0 AS noise",
        "round(n + noise, 4) + 0.0 AS n_noisy")
      .orderBy("lang")

  /** (doc_id, n_tokens, y) — the txt_quality_filter gate re-expressed
    * as a 0/1 LABEL with the token count as an integer score, the
    * shared base of the classifier-evaluation family (stat_auc /
    * stat_calibration / stat_mcnemar). The predicate text mirrors
    * txtQualityFilter verbatim (incl. the DOUBLE alpha-ratio form) so
    * label and filter can never drift. */
  private def qualityScored(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("n_chars"), expr(tokensExpr).as("tk"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("alpha"))
      .select(col("doc_id"), col("n_chars"), size(col("tk")).as("n_tokens"),
        col("alpha"))
      .withColumn("y",
        when(col("n_chars").between(100, 5000) && col("n_tokens") >= 20 &&
          expr("CAST(alpha AS DOUBLE) / n_chars") >= 0.6, 1L).otherwise(0L))

  /** The same base as a DuckDB CTE chain ending in `yl(doc_id,
    * n_tokens, y)` — predicate text mirrors the txt_quality_filter
    * oracle verbatim. */
  private val qualityScoredSqlCte =
    s"""d AS (
       |  SELECT doc_id, n_chars, CAST(len($tokensSql) AS INTEGER) AS n_tokens,
       |         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha
       |  FROM documents),
       |yl AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_chars BETWEEN 100 AND 5000 AND n_tokens >= 20
       |          AND alpha * 1.0 / n_chars >= 0.6 THEN 1 ELSE 0 END AS y
       |  FROM d)""".stripMargin

  /** AUC derived from the exact integer accumulators (n_pos, n_neg,
    * r1_2 = 2·rank-sum of the positives with average-rank ties) — ONE
    * formula string for both engines, the MannWhitneyDerived pattern.
    * AUC = U₁/(n₊·n₋) = (r1_2 − n₊(n₊+1)) / (2·n₊·n₋). */
  private val AucDerived = Seq(
    "n_pos", "n_neg",
    """round(CAST(r1_2 - n_pos * (n_pos + 1) AS DOUBLE)
      | / (2 * CAST(n_pos AS DOUBLE) * n_neg), 6) + 0.0 AS auc""".stripMargin)

  /** Exact ROC AUC of the token-count score predicting the
    * quality-gate label — the threshold-free ranking metric every
    * filter/classifier eval starts from, computed EXACTLY via the
    * rank-sum identity AUC = U/(n₊·n₋) (ties = average ranks, i.e.
    * the trapezoidal tie convention): no threshold sweep, no
    * trapezoid summation, no float until the single final division of
    * two exact integers. StatSpec pins the query against an
    * independent O(n²) concordant-pair count on the small corpus.
    *
    * Scale: the statMannWhitney shape — per-score partial-aggregated
    * counts first, so the rank window runs over |distinct scores|
    * rows (bounded by the token-count domain), never |docs|. The
    * r1_2 accumulator is DECIMAL(38,0)/HUGEINT; its DOUBLE cast in
    * the last step is the one place resolution drops (>2^53 only
    * beyond ~10^26 rank-units — not a corpus that exists). */
  def statAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = qualityScored(spark, dir)
      .groupBy(col("n_tokens").as("s"))
      .agg(sum("y").as("c1"), sum(expr("1 - y")).as("c0"))
      .withColumn("cnt", col("c1") + col("c0"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.withColumn("cum", sum("cnt").over(w))
      .withColumn("avg2", expr("2 * (cum - cnt) + cnt + 1"))
      .agg(sum("c1").as("n_pos"), sum("c0").as("n_neg"),
        sum(expr("CAST(c1 AS DECIMAL(38,0)) * avg2")).as("r1_2"))
      .selectExpr(AucDerived: _*)
  }

  /** Reliability (calibration) table for the same score/label pair —
    * the curve companion to [[statAuc]]'s scalar: fixed-width
    * token-count bins (width 10, top bin open — the agg_histogram
    * determinism move: fixed edges, never engine-interpolated
    * quantile cuts) with per-bin doc counts, positives, and the
    * empirical pass rate as ONE division of two exact integers. A
    * well-calibrated score's rate should rise monotonically through
    * the bins; StatSpec asserts the bin partition is exact (Σn = N).
    * Scale: one partial-aggregated groupBy on a ≤10-key domain. */
  private val CalibrationRate =
    "round(CAST(n_pos AS DOUBLE) / n_docs, 6) + 0.0 AS pass_rate"

  def statCalibration(spark: SparkSession, dir: String): DataFrame =
    qualityScored(spark, dir)
      .groupBy(expr("least(n_tokens div 10, 9)").as("score_bin"))
      .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"))
      .selectExpr("score_bin", "n_docs", "n_pos", CalibrationRate)
      .orderBy("score_bin")

  /** Per-class precision / recall / F1 derived from exact integer
    * (tp, fp, fn) — one formula string for both engines. NULL where
    * undefined (a class never predicted has no precision; a class
    * never labeled has no recall). */
  private val ClassMetricsDerived = Seq(
    "cls", "tp", "fp", "fn",
    "round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) + 0.0 AS prec",
    "round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) + 0.0 AS rec",
    "round(CAST(2 * tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0), 6) + 0.0 AS f1")

  /** Per-class precision/recall/F1 of the langid heuristic against
    * the labeled `lang` column — the metric readout OVER
    * txt_lang_confusion's matrix (tp/fp/fn are row/column/diagonal
    * sums of the confusion cells, so the class axis is the UNION of
    * label and prediction domains: `zh` appears with NULL precision
    * — never predicted; `unk` with NULL recall — never labeled).
    * Every metric is one division of exact integers.
    *
    * Scale: the matrix is |langs|² cells; everything after the
    * confusion aggregation is domain-sized. The matrix subtree is
    * localCheckpoint'ed once and feeds all three marginal sums. */
  def statClassMetrics(spark: SparkSession, dir: String): DataFrame = {
    val conf = txtLangConfusion(spark, dir).localCheckpoint()
    val tr = conf.groupBy(col("lang").as("cls")).agg(sum("n").as("n_true"))
    val pr = conf.groupBy(col("pred_lang").as("cls")).agg(sum("n").as("n_pred"))
    val tp = conf.filter(col("lang") === col("pred_lang"))
      .groupBy(col("lang").as("cls")).agg(sum("n").as("tp0"))
    tr.join(pr, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left_outer")
      .selectExpr("cls",
        "coalesce(tp0, CAST(0 AS BIGINT)) AS tp",
        "coalesce(n_pred, CAST(0 AS BIGINT)) - coalesce(tp0, CAST(0 AS BIGINT)) AS fp",
        "coalesce(n_true, CAST(0 AS BIGINT)) - coalesce(tp0, CAST(0 AS BIGINT)) AS fn")
      .selectExpr(ClassMetricsDerived: _*)
      .orderBy("cls")
  }

  /** Cohen's-kappa derived stats over exact integer accumulators
    * (n, diag = Σnᵢᵢ, pe_num = Σ nᵢ·n·ᵢ): po = diag/n,
    * pe = pe_num/n², κ = (n·diag − pe_num)/(n² − pe_num) — each ONE
    * division of exact integers, shared by both engines. */
  private val KappaDerived = Seq(
    "n_docs", "agree",
    "round(CAST(agree AS DOUBLE) / n_docs, 6) + 0.0 AS po",
    "round(CAST(pe_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * n_docs), 6) + 0.0 AS pe",
    """round(CAST(CAST(n_docs AS DECIMAL(38,0)) * agree - pe_num AS DOUBLE)
      | / CAST(CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_num AS DOUBLE), 6)
      | + 0.0 AS kappa""".stripMargin)

  /** Cohen's κ of langid vs the labeled language — the
    * CHANCE-CORRECTED agreement scalar next to [[statClassMetrics]]'
    * per-class view (raw accuracy rewards majority-class guessing; κ
    * subtracts the marginal-product expected agreement). All three
    * accumulators are exact integers off the same checkpointed
    * confusion matrix; κ is one division. StatSpec re-derives κ
    * independently from the txt_lang_confusion rows. */
  def statCohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val conf = txtLangConfusion(spark, dir).localCheckpoint()
    val tr = conf.groupBy(col("lang").as("cls")).agg(sum("n").as("n_true"))
    val pr = conf.groupBy(col("pred_lang").as("cls")).agg(sum("n").as("n_pred"))
    val pe = tr.join(pr, "cls")
      .agg(sum(expr("CAST(n_true AS DECIMAL(38,0)) * n_pred")).as("pe_num"))
    conf.agg(
      sum("n").as("n_docs"),
      sum(when(col("lang") === col("pred_lang"), col("n")).otherwise(0L))
        .as("agree"))
      .crossJoin(broadcast(pe))
      .selectExpr(KappaDerived: _*)
  }

  /** McNemar's paired test between two quality SCREENS on the same
    * documents — the "is filter B actually different from filter A"
    * check run before swapping a production gate (an unpaired
    * comparison of pass rates wastes the pairing; McNemar uses only
    * the DISCORDANT cells). A = the length band, B = the min-token
    * rule — the two single-signal halves of the composite
    * txt_quality_filter gate. χ² = (b−c)²/(b+c) on exact integers
    * (NULL when no disagreement exists), plus the full 2×2 for the
    * reader. Scale: one partial-aggregated scan, 1-row output. */
  private val McnemarChi2 =
    """round(CAST((a_only - b_only) * (a_only - b_only) AS DOUBLE)
      | / nullif(a_only + b_only, 0), 6) + 0.0 AS mcnemar_chi2""".stripMargin

  def statMcnemar(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("n_chars"), size(expr(tokensExpr)).as("n_tokens"))
      .select(
        when(col("n_chars").between(100, 5000), 1L).otherwise(0L).as("pa"),
        when(col("n_tokens") >= 20, 1L).otherwise(0L).as("pb"))
      .agg(
        sum(expr("pa * pb")).as("both_pass"),
        sum(expr("pa * (1 - pb)")).as("a_only"),
        sum(expr("(1 - pa) * pb")).as("b_only"),
        sum(expr("(1 - pa) * (1 - pb)")).as("neither"))
      .selectExpr("both_pass", "a_only", "b_only", "neither", McnemarChi2)

  val oracles: Map[String, String] = Map(
    "mix_export_manifest" -> {
      val h4 = (1 to 4)
        .map(i => s"(strpos('0123456789abcdef', substr(hh, $i, 1)) - 1) * ${1L << (4 * (4 - i))}")
        .mkString("(", " + ", ")")
      val h15 = (1 to 15)
        .map(i => s"(strpos('0123456789abcdef', substr(hh, $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    CAST(len($tokensSql) AS INTEGER) AS n_tokens,
         |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         |    n_chars
         |  FROM documents),
         |pass AS (
         |  SELECT doc_id, source, n_tokens FROM q
         |  WHERE n_chars BETWEEN 100 AND 5000 AND n_tokens >= 20
         |    AND alpha * 1.0 / n_chars >= 0.6),
         |keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |m AS (
         |  SELECT source, n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS hh
         |  FROM pass JOIN keep USING (doc_id)),
         |s AS (
         |  SELECT source, n_tokens,
         |    CASE WHEN $h4 % 100 < 90 THEN 'train'
         |         WHEN $h4 % 100 < 95 THEN 'val' ELSE 'test' END AS split,
         |    CAST($h15 AS BIGINT) AS hid
         |  FROM m)
         |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS n_tokens,
         |  CAST(sum(hid::HUGEINT) AS VARCHAR) AS id_digest
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "stat_auc" ->
      s"""WITH $qualityScoredSqlCte,
         |v AS (
         |  SELECT n_tokens AS s, sum(y) AS c1, sum(1 - y) AS c0
         |  FROM yl GROUP BY 1),
         |r AS (
         |  SELECT c1, c0, c1 + c0 AS cnt,
         |    sum(c1 + c0) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM v),
         |a AS (SELECT c1, c0, cnt, 2 * (cum - cnt) + cnt + 1 AS avg2 FROM r),
         |m AS (
         |  SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
         |    CAST(sum(c0) AS BIGINT) AS n_neg,
         |    sum(c1::HUGEINT * avg2) AS r1_2
         |  FROM a)
         |SELECT ${AucDerived.mkString(",\n")}
         |FROM m""".stripMargin,
    "stat_calibration" ->
      s"""WITH $qualityScoredSqlCte,
         |b AS (
         |  SELECT least(n_tokens // 10, 9) AS score_bin,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(y) AS BIGINT) AS n_pos
         |  FROM yl GROUP BY 1)
         |SELECT score_bin, n_docs, n_pos, $CalibrationRate
         |FROM b ORDER BY score_bin""".stripMargin,
    "stat_class_metrics" ->
      s"""WITH $confusionSqlCte,
         |tp AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS tp0
         |       FROM conf WHERE lang = pred_lang GROUP BY 1),
         |j AS (
         |  SELECT coalesce(tr.cls, pr.cls) AS cls,
         |    coalesce(tp0, 0) AS tp,
         |    coalesce(n_pred, 0) - coalesce(tp0, 0) AS fp,
         |    coalesce(n_true, 0) - coalesce(tp0, 0) AS fn
         |  FROM tr FULL OUTER JOIN pr ON tr.cls = pr.cls
         |  LEFT JOIN tp ON coalesce(tr.cls, pr.cls) = tp.cls)
         |SELECT ${ClassMetricsDerived.mkString(",\n")}
         |FROM j ORDER BY cls""".stripMargin,
    "stat_cohens_kappa" ->
      s"""WITH $confusionSqlCte,
         |pe AS (
         |  SELECT CAST(sum(n_true::HUGEINT * n_pred) AS DECIMAL(38,0)) AS pe_num
         |  FROM tr JOIN pr ON tr.cls = pr.cls),
         |m AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END) AS BIGINT)
         |      AS agree
         |  FROM conf)
         |SELECT ${KappaDerived.mkString(",\n")}
         |FROM m CROSS JOIN pe""".stripMargin,
    "stat_mcnemar" ->
      s"""WITH d AS (
         |  SELECT n_chars, CAST(len($tokensSql) AS INTEGER) AS n_tokens
         |  FROM documents),
         |f AS (
         |  SELECT CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END AS pa,
         |         CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END AS pb
         |  FROM d),
         |m AS (
         |  SELECT CAST(sum(pa * pb) AS BIGINT) AS both_pass,
         |    CAST(sum(pa * (1 - pb)) AS BIGINT) AS a_only,
         |    CAST(sum((1 - pa) * pb) AS BIGINT) AS b_only,
         |    CAST(sum((1 - pa) * (1 - pb)) AS BIGINT) AS neither
         |  FROM f)
         |SELECT both_pass, a_only, b_only, neither, $McnemarChi2
         |FROM m""".stripMargin,
    "qc_dp_counts" -> {
      val h8 = (1 to 8)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(lang), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |           FROM documents GROUP BY lang),
         |hh AS (SELECT lang, n, $h8 AS h FROM g),
         |uu AS (SELECT lang, n, $DpU AS u FROM hh),
         |nz AS (SELECT lang, n, $DpNoise AS noise FROM uu)
         |SELECT lang, n, round(noise, 4) + 0.0 AS noise,
         |  round(n + noise, 4) + 0.0 AS n_noisy
         |FROM nz ORDER BY lang""".stripMargin
    },
    "txt_bm25" -> txtBm25Oracle,
    "txt_blocklist" ->
      s"""WITH d AS (
         |  SELECT source,
         |    CAST(len($tokensSql) AS BIGINT) AS nt,
         |    CAST(len(list_filter($tokensSql, x -> x IN ($blockList))) AS BIGINT) AS nb
         |  FROM documents),
         |p AS (
         |  SELECT source,
         |    CASE WHEN nt = 0 THEN 0 ELSE nb * 1000000 // nt END AS ppm
         |  FROM d)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ppm >= $BlockFlagPpm THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(CASE WHEN ppm >= $BlockFlagPpm THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*) AS flagged_ppm,
         |  CAST(sum(ppm) AS BIGINT) // count(*) AS avg_banned_ppm
         |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "txt_perplexity" ->
      s"""WITH dt AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT doc_id, unnest($tokensSql) AS w FROM documents)
         |  GROUP BY doc_id, w),
         |cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM dt GROUP BY w),
         |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM cw),
         |tq AS (
         |  SELECT doc_id, c,
         |    c * CAST(round(log2(CAST(nn AS DOUBLE) / cw) * 1000000000) AS BIGINT) AS tq
         |  FROM dt JOIN cw USING (w) CROSS JOIN tot),
         |agg AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(tq) AS BIGINT) AS sq
         |  FROM tq GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  round(CAST(sq AS DOUBLE) / 1000000000 / n_tokens, 4) + 0.0 AS ce_bits
         |FROM agg
         |ORDER BY CAST(sq AS DOUBLE) / 1000000000 / n_tokens DESC, doc_id
         |LIMIT 20""".stripMargin,
    "txt_hashing_tf" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($tokensSql) AS token FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    ${(1 to 8).map(i => s"(strpos('0123456789abcdef', substr(md5(token), $i, 1)) - 1) * ${1L << (4 * (8 - i))}").mkString("(", " + ", ")")} % $HtfDim AS feature_idx
         |  FROM tk)
         |SELECT doc_id, feature_idx, count(*) AS cnt
         |FROM h GROUP BY doc_id, feature_idx
         |ORDER BY doc_id, feature_idx""".stripMargin,
    "txt_bpe_merge" ->
      s"""WITH w AS (SELECT unnest($tokensSql) AS t FROM documents),
         |p AS (
         |  SELECT unnest(list_transform(range(1, len(t)), i -> substr(t, i, 2))) AS pair
         |  FROM w WHERE len(t) >= 2)
         |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
         |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    "txt_chunk_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok
         |  FROM documents),
         |b AS (
         |  SELECT source, tok,
         |    coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // $PackBudget AS win_id
         |  FROM toks),
         |w AS (
         |  SELECT source, win_id, count(*) AS n_docs,
         |    CAST(sum(tok) AS BIGINT) AS win_tok
         |  FROM b GROUP BY 1, 2)
         |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(win_tok) AS BIGINT) AS n_tokens,
         |  count(*) AS n_windows,
         |  CAST(sum(CASE WHEN win_tok > $PackBudget THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_overflow,
         |  max(win_tok) AS max_win_tok,
         |  CAST(sum(win_tok) * 1000000 AS BIGINT) // (count(*) * $PackBudget)
         |    AS fill_ppm
         |FROM w GROUP BY source ORDER BY source""".stripMargin,
    "txt_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cc AS (
        |  SELECT doc_id, ch, count(*)::DOUBLE AS c FROM chars GROUP BY doc_id, ch)
        |SELECT doc_id, count(*) AS n_distinct_chars,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) + 0.0 AS entropy_bits
        |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "txt_distinctive" ->
      s"""WITH tok AS (
         |  SELECT lang, unnest($tokensSql) AS token FROM documents),
         |lt AS (SELECT lang, token, count(*) AS n_lt FROM tok GROUP BY 1, 2),
         |l AS (SELECT lang, sum(n_lt) AS n_l FROM lt GROUP BY 1),
         |t AS (SELECT token, sum(n_lt) AS n_t FROM lt GROUP BY 1),
         |g AS (SELECT sum(n_lt) AS n FROM lt),
         |x AS (
         |  SELECT lt.lang, lt.token, CAST(lt.n_lt AS BIGINT) AS n_lt,
         |    (lt.n_lt::HUGEINT * g.n)::DOUBLE / (t.n_t::HUGEINT * l.n_l)::DOUBLE AS lift
         |  FROM lt JOIN l USING (lang) JOIN t USING (token) CROSS JOIN g
         |  WHERE lt.n_lt >= 5),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY lift DESC, token) AS rnk
         |      FROM x)
         |SELECT lang, CAST(rnk AS BIGINT) AS rnk, token, n_lt,
         |  round(lift, 4) AS lift
         |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "txt_vocab" ->
      s"""WITH tk AS (
         |  SELECT unnest($tokensSql) AS token FROM documents),
         |f AS (SELECT token, count(*) AS freq FROM tk GROUP BY token),
         |tot AS (SELECT sum(freq)::DOUBLE AS tot FROM f),
         |top AS (SELECT token, freq FROM f ORDER BY freq DESC, token LIMIT 100)
         |SELECT token, CAST(freq AS BIGINT) AS freq,
         |  CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rnk,
         |  round(sum(freq) OVER (ORDER BY freq DESC, token
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tot, 4)
         |    + 0.0 AS cum_share
         |FROM top, tot ORDER BY rnk""".stripMargin,
    "txt_zipf_slope" ->
      s"""WITH tk AS (
         |  SELECT unnest($tokensSql) AS token FROM documents),
         |f AS (SELECT token, count(*) AS freq FROM tk GROUP BY token),
         |top AS (SELECT token, freq FROM f ORDER BY freq DESC, token LIMIT 100),
         |h AS (SELECT freq,
         |        row_number() OVER (ORDER BY freq DESC, token) AS rnk FROM top),
         |q AS (SELECT
         |        CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         |        CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y
         |      FROM h),
         |s AS (SELECT count(*) AS n_head,
         |        sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         |        sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
         |      FROM q)
         |SELECT n_head,
         |  round(CAST(n_head * sxy - sx * sy AS DOUBLE)
         |        / CAST(n_head * sxx - sx * sx AS DOUBLE), 4) + 0.0 AS slope,
         |  round((CAST(sy AS DOUBLE) / 1000000.0
         |         - (CAST(n_head * sxy - sx * sy AS DOUBLE)
         |            / CAST(n_head * sxx - sx * sx AS DOUBLE))
         |           * (CAST(sx AS DOUBLE) / 1000000.0)) / n_head, 4) + 0.0
         |    AS intercept
         |FROM s""".stripMargin,
    "txt_stats" ->
      s"""WITH d AS (
         |  SELECT lang, n_chars, $tokensSql AS tk,
         |         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha
         |  FROM documents),
         |p AS (
         |  SELECT lang, n_chars, alpha, len(tk) AS n_tokens,
         |         len(list_filter(tk, x -> x IN ($stopList))) AS n_stop
         |  FROM d)
         |SELECT lang, count(*) AS n_docs,
         |  round(avg(n_tokens), 4) AS avg_tokens,
         |  round(avg(n_stop * 1.0 / n_tokens), 4) AS avg_stop_ratio,
         |  round(avg(alpha * 1.0 / n_chars), 4) AS avg_alpha_ratio,
         |  round(avg(n_chars), 4) AS avg_chars
         |FROM p GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_langid" ->
      s"""WITH $langidSqlCte
         |SELECT doc_id, pred_lang FROM p ORDER BY doc_id""".stripMargin,
    "qc_lang_mix" ->
      s"""WITH $langidSqlCte,
         |mix AS (
         |  SELECT source, pred_lang, count(*) AS n_docs
         |  FROM p JOIN documents USING (doc_id) GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_src
         |        FROM mix GROUP BY 1)
         |SELECT mix.source, pred_lang, n_docs,
         |  n_docs * 1000000 // n_src AS share_ppm
         |FROM mix JOIN tot ON mix.source = tot.source
         |ORDER BY mix.source, pred_lang""".stripMargin,
    "txt_lang_confusion" ->
      s"""WITH $langidSqlCte
         |SELECT documents.lang, p.pred_lang, count(*) AS n
         |FROM p JOIN documents USING (doc_id)
         |GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    "txt_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_quality_filter" ->
      s"""WITH d AS (
         |  SELECT doc_id, n_chars, CAST(len($tokensSql) AS INTEGER) AS n_tokens,
         |         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens, round(alpha * 1.0 / n_chars, 4) AS alpha_ratio
         |FROM d
         |WHERE n_chars BETWEEN 100 AND 5000 AND n_tokens >= 20
         |  AND alpha * 1.0 / n_chars >= 0.6
         |ORDER BY doc_id""".stripMargin,
    "mr_wordcount" ->
      s"""SELECT tok AS word, count(*) AS cnt
         |FROM (SELECT unnest($tokensSql) AS tok FROM documents)
         |GROUP BY tok ORDER BY tok""".stripMargin,
    "txt_passage_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS ts FROM documents),
         |ch AS (
         |  SELECT doc_id, array_to_string(ts[i*10+1 : i*10+10], ' ') AS chunk
         |  FROM toks, (SELECT unnest(range(0,
         |         (SELECT (max(len(ts)) + 9) // 10 FROM toks))) AS i)
         |  WHERE i * 10 < len(ts)),
         |f AS (SELECT doc_id, chunk FROM ch WHERE length(chunk) >= 30)
         |SELECT md5(chunk) AS chunk_hash,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc
         |FROM f GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY 1""".stripMargin,
    "mr_grep_count" ->
      """SELECT source, count(*) AS cnt FROM documents
        |WHERE regexp_matches(text, 'merge')
        |GROUP BY source ORDER BY source""".stripMargin,
    "mr_sample_hash" -> {
      val h = (1 to 4)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
        .mkString("(", " + ", ")")
      s"""SELECT source, count(*) AS n_sampled FROM documents
         |WHERE $h % 10 = 0 GROUP BY source ORDER BY source""".stripMargin
    },
    "txt_strip_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, $tokensSql AS ts FROM documents),
         |tz AS (SELECT * FROM toks WHERE len(ts) > 0),
         |ch AS (
         |  SELECT doc_id, source, array_to_string(ts[i*10+1 : i*10+10], ' ') AS chunk
         |  FROM tz, (SELECT unnest(range(0,
         |         (SELECT (max(len(ts)) + 9) // 10 FROM tz))) AS i)
         |  WHERE i * 10 < len(ts)),
         |c2 AS (
         |  SELECT doc_id, source, md5(chunk) AS h,
         |    CAST(len(string_split(chunk, ' ')) AS BIGINT) AS ctok,
         |    length(chunk) AS clen
         |  FROM ch),
         |boiler AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS df
         |    FROM c2 WHERE clen >= 30 GROUP BY 1)
         |  WHERE df >= $BoilerDf)
         |SELECT source, CAST(sum(ctok) AS BIGINT) AS tokens_total,
         |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN ctok ELSE 0 END) AS BIGINT)
         |    AS tokens_boiler,
         |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN ctok ELSE 0 END) * 1000000
         |    // sum(ctok) AS BIGINT) AS boiler_ppm
         |FROM c2 LEFT JOIN boiler b USING (h)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "mix_epoch_plan" ->
      """WITH t AS (
        |  SELECT source, unnest(regexp_extract_all(text, '\S+')) AS w
        |  FROM documents),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS toks_total,
        |    CAST(count(DISTINCT w) AS BIGINT) AS n_types
        |  FROM t GROUP BY source),
        |q AS (
        |  SELECT source, toks_total,
        |    n_types * 1000000 // toks_total AS quality_ppm
        |  FROM per),
        |b AS (SELECT CAST(3 * sum(toks_total) AS BIGINT) AS budget FROM q),
        |c AS (
        |  SELECT q.*, budget,
        |    CAST(coalesce(sum(4 * toks_total) OVER (
        |      ORDER BY quality_ppm DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM q, b),
        |f AS (
        |  SELECT source, toks_total, quality_ppm,
        |    least(4 * toks_total, greatest(budget - cum_before, 0)) AS take_tokens
        |  FROM c)
        |SELECT source, toks_total, quality_ppm, take_tokens,
        |  take_tokens * 1000000 // toks_total AS epochs_ppm
        |FROM f ORDER BY quality_ppm DESC, source""".stripMargin,
    "mix_soft_dedup" ->
      """WITH t AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
        |  FROM documents),
        |x AS (SELECT source, tok, count(*) OVER (PARTITION BY h) AS k FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  CAST(sum(1000000 // k) AS BIGINT) AS eff_docs_ppm,
        |  CAST(sum(tok) AS BIGINT) AS toks_raw,
        |  CAST(sum(tok * (1000000 // k)) AS BIGINT) AS eff_toks_ppm
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "mix_split_assign" -> {
      val h = (1 to 4)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH b AS (
         |  SELECT lang, n_chars, doc_id,
         |    CASE WHEN $h % 100 < 90 THEN 'train'
         |         WHEN $h % 100 < 95 THEN 'val' ELSE 'test' END AS split
         |  FROM documents)
         |SELECT lang, split, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
    },
    // R unrolled MATERIALIZED rounds over the word-frequency table;
    // per round: pair counts → scalar-subquery top-1 merge → literal
    // replace rewrite. Same '_'-interleaved symbol mechanics and the
    // same greedy left-to-right replace as the Spark loop.
    "txt_bpe_train" -> {
      val readout = (1 to BpeRounds).map(r =>
        s"""SELECT $r AS round, split_part(pr, ' ', 1) AS merge_left,
           |  split_part(pr, ' ', 2) AS merge_right, c AS pair_count FROM m$r""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH $bpeChainSql
         |$readout
         |ORDER BY round""".stripMargin
    },
    // Rides the SAME unrolled chain (words carry their identity
    // through wf0..wf6), then joins the per-language word frequencies
    // against the final reprs for the compression readout.
    "txt_bpe_apply" ->
      s"""WITH $bpeChainSql,
         |lw AS (
         |  SELECT lang, t, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT lang, unnest($tokensSql) AS t FROM documents)
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT lang, lw.cnt, length(lw.t) AS chars,
         |         len(list_filter(string_split(replace(repr, '.', ''), '_'), x -> x <> '')) AS toks
         |  FROM lw JOIN wf$BpeRounds USING (t))
         |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
         |  CAST(sum(chars * cnt) AS BIGINT) AS n_char_tokens,
         |  CAST(sum(toks * cnt) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(toks * cnt) * 1000000 // sum(chars * cnt) AS BIGINT) AS compression_ppm
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // The flat per-source window the Spark side decomposes: ordering by
    // the full md5 string equals ordering by (3-nibble bucket, string),
    // so the two-level rank reproduces these row_numbers exactly.
    "mix_shard_plan" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, n_chars,
         |    row_number() OVER (
         |      PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rnk
         |  FROM documents)
         |SELECT CAST((rnk - 1) % ${NShards} AS INT) AS shard, source,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM r GROUP BY 1, 2 ORDER BY shard, source""".stripMargin,
    "mr_weighted_sample" -> {
      // 13-nibble md5 prefix → 52-bit integer, as a strpos sum (DuckDB
      // has no conv()); 16^(13-i) multipliers are exact BIGINT literals.
      val h = (1 to 13)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${java.math.BigInteger.valueOf(16).pow(13 - i)}")
        .mkString("(", "\n|     + ", ")")
      s"""WITH keyed AS (
         |  SELECT doc_id, source, n_chars,
         |    ln(($h + 0.5) / 4503599627370496) / n_chars AS wkey
         |  FROM documents WHERE n_chars > 0),
         |top AS (SELECT doc_id, source, n_chars FROM keyed
         |        ORDER BY wkey DESC, doc_id LIMIT 100)
         |SELECT doc_id, source, n_chars FROM top ORDER BY doc_id""".stripMargin
    },
    "txt_pipeline" ->
      s"""WITH d AS (
         |  SELECT doc_id, n_chars, CAST(len($tokensSql) AS INTEGER) AS n_tokens,
         |         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha
         |  FROM documents),
         |q AS (
         |  SELECT doc_id FROM d
         |  WHERE n_chars BETWEEN 100 AND 5000 AND n_tokens >= 20
         |    AND alpha * 1.0 / n_chars >= 0.6),
         |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents JOIN q USING (doc_id) JOIN k USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "txt_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_repetition" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS bg
         |  FROM d WHERE len(tk) >= 2),
         |c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |             count(*) AS n_uniq, max(c) AS max_c
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  round(CAST(n_bigrams - n_uniq AS DOUBLE) / n_bigrams, 4) AS dup_ratio,
         |  round(CAST(max_c AS DOUBLE) / n_bigrams, 4) AS top_ratio
         |FROM a ORDER BY doc_id""".stripMargin,
    "txt_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
         |n AS (SELECT count(*) AS n_docs FROM documents WHERE len($tokensSql) > 0),
         |w AS (SELECT doc_id, term, c,
         |        count(*) OVER (PARTITION BY term) AS df,
         |        sum(c) OVER (PARTITION BY doc_id) AS n_tok
         |      FROM tf),
         |sc AS (SELECT doc_id, term,
         |         (CAST(c AS DOUBLE) / n_tok) * ln(CAST(n_docs AS DOUBLE) / df) AS score
         |       FROM w CROSS JOIN n),
         |r AS (SELECT doc_id, term, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
         |      FROM sc)
         |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, round(score, 4) AS tfidf
         |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "txt_inverted_index" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
         |           i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))) AS term
         |  FROM toks WHERE len(tk) >= 3)
         |SELECT term, count(*) AS df,
         |  array_to_string(list_sort(list(doc_id)), ',') AS postings
         |FROM sh GROUP BY term
         |HAVING count(*) BETWEEN 2 AND 100
         |ORDER BY term""".stripMargin,
    "txt_js_divergence" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($tokensSql) AS w FROM documents
         |  WHERE source IN ('src0', 'src1')),
         |g AS (
         |  SELECT w,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM tk GROUP BY 1),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |             CAST(sum(c2) AS BIGINT) AS n2 FROM g),
         |q AS (
         |  SELECT CAST(round((
         |      CASE WHEN c1 = 0 THEN 0.0
         |           ELSE (CAST(c1 AS DOUBLE) / n1)
         |                * log2(2 * (CAST(c1 AS DOUBLE) / n1)
         |                       / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)) END
         |      + CASE WHEN c2 = 0 THEN 0.0
         |             ELSE (CAST(c2 AS DOUBLE) / n2)
         |                  * log2(2 * (CAST(c2 AS DOUBLE) / n2)
         |                         / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)) END
         |    ) * 1000000000) AS BIGINT) AS tq
         |  FROM g CROSS JOIN t)
         |SELECT count(*) AS n_words,
         |  round(CAST(sum(tq::HUGEINT) AS DOUBLE) / 1000000000.0 / 2, 4) + 0.0
         |    AS js_bits
         |FROM q""".stripMargin,
    "stat_chi2" ->
      """WITH obs AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |rr AS (SELECT lang, sum(o) AS r FROM obs GROUP BY 1),
        |cc AS (SELECT source, sum(o) AS c FROM obs GROUP BY 1),
        |nn AS (SELECT sum(o) AS n, count(*) AS n_obs_cells FROM obs),
        |g AS (
        |  SELECT rr.lang, cc.source, coalesce(o, 0) AS o, rr.r, cc.c,
        |         nn.n, nn.n_obs_cells
        |  FROM rr CROSS JOIN cc
        |  LEFT JOIN obs ON obs.lang = rr.lang AND obs.source = cc.source
        |  CROSS JOIN nn),
        |t AS (
        |  SELECT lang, source, n_obs_cells, n,
        |    CAST(round(
        |      (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
        |      * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
        |      / (CAST(r AS DOUBLE) * c / n) * 1000000) AS BIGINT) AS termq
        |  FROM g)
        |SELECT count(*) AS n_cells, max(n_obs_cells) AS n_obs_cells,
        |  (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof,
        |  round(CAST(sum(termq::HUGEINT) AS DOUBLE) / 1000000.0, 4) + 0.0 AS chi2,
        |  round(sqrt((CAST(sum(termq::HUGEINT) AS DOUBLE) / 1000000.0)
        |    / (CAST(max(n) AS DOUBLE)
        |       * least(count(DISTINCT lang) - 1, count(DISTINCT source) - 1))), 4)
        |    + 0.0 AS cramers_v
        |FROM t""".stripMargin,
    "qc_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, n_chars // 50 AS len_band, count(*) AS g
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_groups, CAST(min(g) AS BIGINT) AS min_k,
        |  CAST(sum(CASE WHEN g < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_5,
        |  CAST(sum(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT) AS docs_below_5
        |FROM g""".stripMargin,
    "sim_sparse_cosine" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS tk FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(tk) - 1),
         |           i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS term
         |  FROM toks WHERE len(tk) >= 3),
         |n AS (SELECT count(*) AS n_docs FROM toks WHERE len(tk) >= 3),
         |tfq AS (SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
         |p AS MATERIALIZED (
         |  SELECT doc_id, term,
         |    CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000) AS BIGINT) AS wq
         |  FROM tfq JOIN dfq USING (term) CROSS JOIN n
         |  WHERE df BETWEEN 2 AND 100),
         |norms AS (SELECT doc_id, sum(wq::HUGEINT * wq) AS nsq FROM p GROUP BY 1),
         |dots AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.wq::HUGEINT * b.wq) AS dot
         |  FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2,
         |  round(CAST(dot AS DOUBLE)
         |        / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))), 4)
         |    + 0.0 AS cos_sim
         |FROM dots
         |JOIN norms n1 ON dots.d1 = n1.doc_id
         |JOIN norms n2 ON dots.d2 = n2.doc_id
         |ORDER BY cos_sim DESC, d1, d2 LIMIT 25""".stripMargin,
    "agg_cms_heavy" -> {
      def cell(v: String): String =
        s"((strpos('0123456789abcdef', substr(md5($v), i * 2 + 1, 1)) - 1) * 16" +
          s" + (strpos('0123456789abcdef', substr(md5($v), i * 2 + 2, 1)) - 1)) % $CmsW"
      val probes = cmsProbes.map(w => s"'$w'").mkString(", ")
      s"""WITH toks AS (SELECT unnest($tokensSql) AS term FROM documents),
         |idx AS (SELECT unnest([${(0 until CmsD).mkString(", ")}]) AS i),
         |cells AS (
         |  SELECT i, ${cell("term")} AS cell, count(*) AS c
         |  FROM toks CROSS JOIN idx GROUP BY 1, 2),
         |cand AS (SELECT unnest([$probes]) AS term),
         |cc AS (SELECT term, i, ${cell("term")} AS cell FROM cand CROSS JOIN idx),
         |est AS (SELECT term, CAST(min(coalesce(c, 0)) AS BIGINT) AS cms_est
         |        FROM cc LEFT JOIN cells USING (i, cell) GROUP BY term),
         |ex AS (SELECT term, count(*) AS exact_cnt FROM toks GROUP BY term)
         |SELECT term, cms_est, CAST(coalesce(exact_cnt, 0) AS BIGINT) AS exact_cnt
         |FROM est LEFT JOIN ex USING (term) ORDER BY term""".stripMargin
    },
    "txt_winnow" -> {
      val h = (1 to 8)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(substr(norm, i0, 5)), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH nrm AS (
         |  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(norm) - 3), i0 -> $h) AS gh
         |  FROM nrm WHERE len(norm) >= 8),
         |f AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(gh) - 2),
         |      i -> list_min(gh[i:i+3]))) AS fps
         |  FROM g)
         |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
         |  CAST(list_sum(fps) AS BIGINT) AS fp_sum
         |FROM f ORDER BY doc_id""".stripMargin
    },
    "mix_token_budget" -> {
      val draw = (1 to 6)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (6 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
         |    CAST($draw AS BIGINT) AS draw
         |  FROM documents),
         |rates AS (
         |  SELECT source, count(*) AS n_total, sum(tok) AS toks_total,
         |    least(1000000, $MixBudgetTokens * 1000000 // sum(tok)) AS rate_ppm
         |  FROM t GROUP BY source),
         |kept AS (
         |  SELECT t.source, count(*) AS n_kept, sum(tok) AS toks_kept,
         |    sum(doc_id) AS kept_id_sum
         |  FROM t JOIN rates ON t.source = rates.source
         |  WHERE draw * 1000000 < rate_ppm * 16777216
         |  GROUP BY t.source)
         |SELECT rates.source, n_total, CAST(toks_total AS BIGINT) AS toks_total,
         |  CAST(rate_ppm AS BIGINT) AS rate_ppm,
         |  coalesce(n_kept, 0) AS n_kept,
         |  CAST(coalesce(toks_kept, 0) AS BIGINT) AS toks_kept,
         |  CAST(coalesce(kept_id_sum, 0) AS BIGINT) AS kept_id_sum
         |FROM rates LEFT JOIN kept ON rates.source = kept.source
         |ORDER BY rates.source""".stripMargin
    },
    "mix_temperature" -> {
      val draw = (1 to 6)
        .map(i => s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (6 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
         |    CAST($draw AS BIGINT) AS draw
         |  FROM documents),
         |per AS (
         |  SELECT source, count(*) AS n_total, CAST(sum(tok) AS BIGINT) AS toks_total,
         |    CAST(floor(sqrt(CAST(sum(tok) AS DOUBLE)) * 1000000) AS BIGINT) AS q_micro
         |  FROM t GROUP BY source),
         |qs AS (SELECT CAST(sum(q_micro) AS BIGINT) AS q_sum FROM per),
         |rates AS (
         |  SELECT per.*, least(1000000, CAST(
         |    ($MixTempTokens::HUGEINT * 1000000 * q_micro)
         |      // (q_sum::HUGEINT * toks_total) AS BIGINT)) AS rate_ppm
         |  FROM per CROSS JOIN qs),
         |kept AS (
         |  SELECT t.source, count(*) AS n_kept, sum(tok) AS toks_kept,
         |    sum(doc_id) AS kept_id_sum
         |  FROM t JOIN rates ON t.source = rates.source
         |  WHERE draw * 1000000 < rate_ppm * 16777216
         |  GROUP BY t.source)
         |SELECT rates.source, n_total, toks_total, q_micro, rate_ppm,
         |  coalesce(n_kept, 0) AS n_kept,
         |  CAST(coalesce(toks_kept, 0) AS BIGINT) AS toks_kept,
         |  CAST(coalesce(kept_id_sum, 0) AS BIGINT) AS kept_id_sum
         |FROM rates LEFT JOIN kept ON rates.source = kept.source
         |ORDER BY rates.source""".stripMargin
    },
    "mr_redmap_pipeline" ->
      s"""WITH w AS (
         |  SELECT unnest($tokensSql) AS word FROM documents)
         |SELECT word, count(*) AS cnt FROM w
         |WHERE length(word) >= 4
         |GROUP BY word HAVING count(*) >= 10
         |ORDER BY word""".stripMargin,
    "txt_collocations" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS tk FROM documents),
         |b AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i + 1])) AS bg
         |  FROM d WHERE len(tk) >= 2),
         |bc AS (
         |  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
         |         count(*) AS n_ab
         |  FROM b GROUP BY bg HAVING count(*) >= 5),
         |u AS (
         |  SELECT w, count(*) AS n_w
         |  FROM (SELECT unnest(tk) AS w FROM d) GROUP BY w),
         |t AS (SELECT sum(n_w) AS nn FROM u)
         |SELECT bc.w1, bc.w2, bc.n_ab,
         |  CAST(bc.n_ab AS DOUBLE) * CAST(t.nn AS DOUBLE) /
         |    (CAST(u1.n_w AS DOUBLE) * CAST(u2.n_w AS DOUBLE)) AS pmi_ratio
         |FROM bc
         |JOIN u u1 ON bc.w1 = u1.w
         |JOIN u u2 ON bc.w2 = u2.w
         |CROSS JOIN t
         |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 20""".stripMargin,
    "qc_drift" ->
      """WITH lh AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
        |bk AS (
        |  SELECT source,
        |    CAST(CASE WHEN hi = lo THEN 1
        |         ELSE (n_chars - lo) * 10 // (hi - lo + 1) END AS BIGINT) AS bucket
        |  FROM documents CROSS JOIN lh),
        |sb AS (SELECT source, bucket, count(*) AS n_obs FROM bk GROUP BY 1, 2),
        |bt AS (SELECT bucket, sum(n_obs) AS n_b FROM sb GROUP BY 1),
        |st AS (SELECT source, sum(n_obs) AS n_s FROM sb GROUP BY 1),
        |tt AS (SELECT sum(n_obs) AS n FROM sb),
        |x AS (
        |  SELECT sb.source, sb.bucket, sb.n_obs, bt.n_b, st.n_s, tt.n,
        |    sb.n_obs * tt.n - st.n_s * bt.n_b AS d
        |  FROM sb JOIN bt USING (bucket) JOIN st USING (source) CROSS JOIN tt)
        |SELECT source, bucket, n_obs,
        |  CAST(n_s * n_b * 1000000 // n AS BIGINT) AS exp_ppm,
        |  CAST(d AS DOUBLE) * CAST(d AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n_s AS DOUBLE) * CAST(n_b AS DOUBLE)) AS chi2_contrib
        |FROM x
        |ORDER BY chi2_contrib DESC, source, bucket LIMIT 15""".stripMargin,
    "txt_ngram_novelty" ->
      s"""WITH d AS (
         |  SELECT doc_id, $tokensSql AS tk FROM documents),
         |b AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1]))) AS bg
         |  FROM d WHERE len(tk) >= 2),
         |df AS (SELECT bg, count(*) AS df FROM b GROUP BY bg)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS novelty_ppm
         |FROM b JOIN df USING (bg)
         |GROUP BY doc_id
         |ORDER BY novelty_ppm DESC, doc_id LIMIT 20""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_export_manifest" -> (mixExportManifest(_, _)),
    "stat_auc" -> (statAuc(_, _)),
    "stat_calibration" -> (statCalibration(_, _)),
    "stat_class_metrics" -> (statClassMetrics(_, _)),
    "stat_cohens_kappa" -> (statCohensKappa(_, _)),
    "stat_mcnemar" -> (statMcnemar(_, _)),
    "txt_bm25" -> (txtBm25(_, _)),
    "txt_stats" -> (txtStats(_, _)),
    "txt_entropy" -> (txtEntropy(_, _)),
    "txt_blocklist" -> (txtBlocklist(_, _)),
    "txt_perplexity" -> (txtPerplexity(_, _)),
    "txt_vocab" -> (txtVocab(_, _)),
    "txt_zipf_slope" -> (txtZipfSlope(_, _)),
    "txt_distinctive" -> (txtDistinctive(_, _)),
    "txt_hashing_tf" -> (txtHashingTf(_, _)),
    "txt_langid" -> (txtLangid(_, _)),
    "txt_lang_confusion" -> (txtLangConfusion(_, _)),
    "qc_lang_mix" -> (qcLangMix(_, _)),
    "qc_dp_counts" -> (qcDpCounts(_, _)),
    "txt_fingerprint" -> (txtFingerprint(_, _)),
    "txt_quality_filter" -> (txtQualityFilter(_, _)),
    "mr_wordcount" -> (mrWordcount(_, _)),
    "txt_chunk_pack" -> (txtChunkPack(_, _)),
    "txt_bpe_merge" -> (txtBpeMerge(_, _)),
    "mr_grep_count" -> (mrGrepCount(_, _)),
    "txt_token_count" -> (txtTokenCount(_, _)),
    "txt_winnow" -> (txtWinnow(_, _)),
    "mr_sample_hash" -> (mrSampleHash(_, _)),
    "mr_weighted_sample" -> (mrWeightedSample(_, _)),
    "txt_pipeline" -> (txtPipeline(_, _)),
    "txt_repetition" -> (txtRepetition(_, _)),
    "txt_tfidf" -> (txtTfidf(_, _)),
    "txt_inverted_index" -> (txtInvertedIndex(_, _)),
    "sim_sparse_cosine" -> (simSparseCosine(_, _)),
    "stat_chi2" -> (statChi2(_, _)),
    "txt_js_divergence" -> (txtJsDivergence(_, _)),
    "qc_k_anonymity" -> (qcKAnonymity(_, _)),
    "agg_cms_heavy" -> (aggCmsHeavy(_, _)),
    "txt_passage_dedup" -> (txtPassageDedup(_, _)),
    "mix_token_budget" -> (mixTokenBudget(_, _)),
    "mix_epoch_plan" -> (mixEpochPlan(_, _)),
    "mix_soft_dedup" -> (mixSoftDedup(_, _)),
    "txt_strip_boilerplate" -> (txtStripBoilerplate(_, _)),
    "mix_temperature" -> (mixTemperature(_, _)),
    "mix_split_assign" -> (mixSplitAssign(_, _)),
    "mix_shard_plan" -> (mixShardPlan(_, _)),
    "txt_bpe_train" -> (txtBpeTrain(_, _)),
    "txt_bpe_apply" -> (txtBpeApply(_, _)),
    "txt_ngram_novelty" -> (txtNgramNovelty(_, _)),
    "qc_drift" -> (qcDrift(_, _)),
    "txt_collocations" -> (txtCollocations(_, _)),
    "mr_redmap_pipeline" -> (mrRedmapPipeline(_, _)),
  )
}
