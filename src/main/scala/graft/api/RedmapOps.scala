package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** redmap's job-builder surface as typed Dataset combinators, so a user
  * of the reference framework can port a job near-verbatim:
  *
  * {{{
  *   // redmap:  job.FlatMap(tokenize).Filter(nonEmpty).ReduceByKey(sum)
  *   import graft.api.RedmapOps._
  *   import spark.implicits._
  *   docs.flatMapOp(tokenize).filterOp(_.nonEmpty)
  *       .keyByOp(identity).mapValuesOp(_ => 1L).reduceByKeyOp(_ + _)
  * }}}
  *
  * Every combinator delegates to the Dataset API, so Catalyst still
  * optimizes the whole pipeline (these are NOT RDD ops): chained
  * mapOp/filterOp fuse into one whole-stage; reduceByKeyOp compiles to
  * a partial-aggregating groupByKey+reduceGroups (map-side combine —
  * redmap's combiner — for free); sortOp plans a range exchange; topOp
  * plans TakeOrderedAndProject.
  *
  * Reference behavior: erizocosmico/redmap chains Map/Filter/Reduce
  * steps over arbitrary Go values shipped to workers; the typed Dataset
  * is the Spark-native equivalent with Encoders instead of gob
  * serialization.
  */
object RedmapOps {

  implicit class RichDataset[T](private val ds: Dataset[T]) extends AnyVal {

    /** redmap `Map`. */
    def mapOp[U: Encoder](f: T => U): Dataset[U] = ds.map(f)

    /** redmap `Filter`. */
    def filterOp(p: T => Boolean): Dataset[T] = ds.filter(p)

    /** redmap `FlatMap`. */
    def flatMapOp[U: Encoder](f: T => IterableOnce[U]): Dataset[U] = ds.flatMap(f)

    /** Key extraction for the shuffle ops below. */
    def keyByOp[K: Encoder](f: T => K): Dataset[(K, T)] =
      ds.map(t => (f(t), t))(Encoders.tuple(implicitly[Encoder[K]], ds.encoder))

    /** redmap `Distinct`. */
    def distinctOp(): Dataset[T] = ds.distinct()

    /** redmap `Sort` (global total order by extracted key; range
      * exchange, never a single-node sort). */
    def sortOp[K: Encoder](f: T => K): Dataset[T] = {
      import ds.sparkSession.implicits._
      ds.map(t => (f(t), t))(Encoders.tuple(implicitly[Encoder[K]], ds.encoder))
        .orderBy($"_1")
        .map(_._2)(ds.encoder)
    }

    /** redmap `Top`: k smallest by key (TakeOrderedAndProject — a
      * per-partition heap and a k-row driver merge). */
    def topOp[K: Encoder](k: Int)(f: T => K): Seq[T] = {
      import ds.sparkSession.implicits._
      ds.map(t => (f(t), t))(Encoders.tuple(implicitly[Encoder[K]], ds.encoder))
        .orderBy($"_1")
        .limit(k)
        .map(_._2)(ds.encoder)
        .collect().toSeq
    }

    /** Fixed-size deterministic sample — the reservoir-sampling slot in
      * a MapReduce surface, made reproducible: the k rows minimizing
      * md5 of the extracted key (same contract as the oracle-gated
      * mr_reservoir query). Hashing runs per partition with ONE reused
      * digest instance (MessageDigest.digest resets after each call) —
      * a per-row getInstance + per-byte format would dominate the
      * sampling cost; the k-row cut is topOp's TakeOrderedAndProject. */
    def reservoirOp(k: Int)(key: T => String): Seq[T] = {
      val hexDigits = "0123456789abcdef".toCharArray
      ds.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { t =>
          val d = md.digest(key(t).getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          d.foreach { x =>
            sb.append(hexDigits((x >> 4) & 0xf)); sb.append(hexDigits(x & 0xf))
          }
          (sb.toString, t)
        }
      }(Encoders.tuple(Encoders.STRING, ds.encoder))
        .topOp(k)(_._1)(Encoders.STRING) // ONE definition of the k-min cut
        .map(_._2)
    }
  }

  implicit class RichPairDataset[K, V](private val ds: Dataset[(K, V)]) extends AnyVal {

    /** redmap map over values, keys preserved. */
    def mapValuesOp[W](f: V => W)(implicit e: Encoder[(K, W)]): Dataset[(K, W)] =
      ds.map { case (k, v) => (k, f(v)) }

    /** redmap `ReduceByKey` — partial-aggregating groupByKey (map-side
      * combine included by Spark's aggregation). */
    def reduceByKeyOp(f: (V, V) => V)(implicit ke: Encoder[K],
        kve: Encoder[(K, V)]): Dataset[(K, V)] =
      ds.groupByKey(_._1)
        .reduceGroups((a: (K, V), b: (K, V)) => (a._1, f(a._2, b._2)))
        .map(_._2)

    /** Streaming twin of [[reduceByKeyOp]] for APPEND sinks (the §2.1
      * surface's streaming member): per key, fold arriving values into
      * running state with `f` and emit the key's CURRENT reduction
      * once per micro-batch — the snapshot-log shape
      * (StreamOps.hllSnapshotStream's move generalized to a user
      * reduce). On a batch Dataset this degenerates to one emission
      * per key == [[reduceByKeyOp]]; on a stream the sink log folds to
      * the final reduction per key with any merge compatible with `f`
      * (max for a monotone counter, `f` itself when associative over
      * disjoint deliveries). Works with parquet/append sinks where
      * reduceGroups (update-mode) cannot. State is ONE V per key. */
    def runningReduceByKeyOp(f: (V, V) => V)(implicit ke: Encoder[K],
        ve: Encoder[V], kve: Encoder[(K, V)]): Dataset[(K, V)] = {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      ds.groupByKey(_._1)
        .flatMapGroupsWithState[V, (K, V)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (k: K, it: Iterator[(K, V)], state: GroupState[V]) =>
            var acc = state.getOption
            it.foreach { kv =>
              acc = Some(acc.fold(kv._2)(a => f(a, kv._2)))
            }
            acc.foreach(state.update)
            acc.map(v => (k, v)).iterator
        }
    }

    /** Inner equi-join by key with another pair dataset. */
    def joinByKeyOp[W](other: Dataset[(K, W)])(implicit
        e: Encoder[(K, V, W)]): Dataset[(K, V, W)] = {
      val l = ds.toDF("k", "v")
      val r = other.toDF("k", "w")
      l.join(r, "k").select("k", "v", "w").as[(K, V, W)]
    }

    /** Hadoop-style secondary sort: per key, the first n values by a
      * secondary ordering (the composite-key partition+sort idiom).
      * Declarative twin of the oracle-gated mr_secondary_sort query.
      * Per-key state is genuinely O(n): the key's values STREAM through
      * a bounded insertion buffer, so a key with millions of values
      * never materializes more than n of them.
      *
      * Determinism contract (ADVICE r4): `orderKey` must be a TOTAL
      * (unique) order within each key — compose a tiebreak into it the
      * way the oracle query orders by (ts, event_id). Ties keep
      * encounter order (the buffer insert is stable), but "encounter
      * order" is the post-shuffle iterator order, which Spark does NOT
      * guarantee across runs/partitionings — so equal orderKeys make
      * the surviving subset nondeterministic, exactly like a
      * non-unique ORDER BY prefix with LIMIT in SQL. */
    def secondarySortOp[S](n: Int)(orderKey: V => S)(implicit
        ord: Ordering[S], ke: Encoder[K],
        kvse: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
      ds.groupByKey(_._1)
        .mapGroups { (k, it) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[(S, V)]
          it.foreach { kv =>
            val s = orderKey(kv._2)
            // n > 0 first: with n <= 0 the length test is always false
            // and buf.last would throw on the empty buffer
            if (n > 0 && (buf.length < n || ord.lt(s, buf.last._1))) {
              // first STRICTLY greater position → stable for ties
              var pos = buf.indexWhere(x => ord.gt(x._1, s))
              if (pos < 0) pos = buf.length
              buf.insert(pos, (s, kv._2))
              if (buf.length > n) buf.remove(n)
            }
          }
          (k, buf.map(_._2).toSeq)
        }

    /** redmap `CoGroup`: for every key present in EITHER side, hand the
      * user function both sides' values (possibly empty) — the primitive
      * MapReduce builds outer joins and set ops from. Compiles to
      * `KeyValueGroupedDataset.cogroup`: one co-partitioning shuffle of
      * each side, then a per-key streamed merge — values are iterated,
      * never collected per key, so a hot key spills instead of OOMing. */
    def cogroupOp[W, U: Encoder](other: Dataset[(K, W)])(
        f: (K, Iterator[V], Iterator[W]) => IterableOnce[U])(implicit
        ke: Encoder[K]): Dataset[U] =
      ds.groupByKey(_._1).cogroup(other.groupByKey(_._1)) {
        (k, vs, ws) => f(k, vs.map(_._2), ws.map(_._2))
      }
  }
}
