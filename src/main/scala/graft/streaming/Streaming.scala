package graft.streaming

import graft.functions.GraftAggregate
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming execution of graft operators on Structured Streaming.
 *
 * The reference's streaming story is the *retract* hook on aggregates
 * (`accumulate_or_retract`, `python/mod.rs:519-582`) — the host engine
 * (RisingWave) drives retractions when late/updated rows revise a running
 * result. In Spark, the idiomatic equivalents are:
 *
 *  - event-time windowed aggregation with watermarks (append/update modes)
 *    for the common case — Spark manages state and late-data discard;
 *  - `flatMapGroupsWithState` for custom running state, where our
 *    [[RetractingAggState]] applies `accumulate` for inserts and `retract`
 *    for deletions (CDC-style `op` column), emitting revised results — the
 *    direct analogue of the reference's retractable aggregates.
 *
 * == Scale design ==
 * State is per-key and incremental: each micro-batch shuffles only that
 * batch's rows to their key partitions (same hash partitioning as a batch
 * groupBy); state store size is O(distinct keys), not O(rows seen).
 *
 * == Production state store (100 TB key spaces) ==
 * The default HDFS-backed state store keeps every key's state on the JVM
 * heap — fine for the spec-sized streams here, an OOM at a 10^9-key CDC
 * feed. On a real cluster switch to RocksDB and bound what lives in memory
 * (the switch is TESTED, not just advised: `RocksDbStreamingSpec` runs EVERY
 * state-store-backed twin in this package under this provider and asserts
 * batch-parity plus exact/bounded state-row counts from the rocksdb
 * metrics; `annJoinStream`/`dedupStream` hold their state externally via
 * foreachBatch, so no state store is involved):
 * {{{
 * spark.conf.set("spark.sql.streaming.stateStore.providerClass",
 *   "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
 * // memory is bounded and SHARED across all stateful operators on an
 * // executor; spill beyond this is RocksDB block-cache eviction, not OOM
 * spark.conf.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
 * spark.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "2048")
 * // changelog checkpointing ships per-batch deltas, not full SST snapshots:
 * // commit latency stays flat as keyed state grows into the hundreds of GB
 * spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
 * }}}
 * Sizing rules that follow from this package's state shapes:
 *  - [[retractingSum]]/windowed aggregates: state = one accumulator per key
 *    (bytes) — RocksDB handles 10^9 keys per executor comfortably; size
 *    `spark.sql.shuffle.partitions` so each partition's key slice fits the
 *    block cache (keys/partitions × state bytes < maxMemoryUsageMB).
 *  - [[sessionizeEventTime]]/[[asofJoin]]: state = per-key BUFFERS bounded
 *    by the watermark horizon; the knob that controls state size is the
 *    watermark delay, not a store setting — halving the delay halves state.
 *  - Skewed keys (one user = 1% of events) concentrate state: pre-salt the
 *    key for commutative aggregates and merge salted partials downstream.
 *
 * == Kafka wiring (CDC replay path) ==
 * The parquet-backed specs drive [[retractingSum]] through MemoryStream; on
 * a cluster the same pipeline reads a Debezium-style CDC topic (the
 * spark-sql-kafka connector is not vendored in this repo's offline build,
 * hence example-only):
 * {{{
 * val cdc = spark.readStream.format("kafka")
 *   .option("kafka.bootstrap.servers", brokers)
 *   .option("subscribe", "orders-cdc")
 *   .option("startingOffsets", "earliest")  // replay = rebuild state from 0
 *   .option("maxOffsetsPerTrigger", 5000000) // bound per-batch shuffle size
 *   .load()
 * val ops = cdc.select(from_json($"value".cast("string"), cdcSchema).as("r"))
 *   .select($"r.key", $"r.amount", ($"r.op" === "d").as("op")) // delete → retract
 *   .as[Streaming.OpRow]
 * Streaming.retractingSum(ops, sumAgg).writeStream
 *   .outputMode("update").option("checkpointLocation", ckptDir).start()
 * }}}
 * Exactly-once holds through the checkpoint dir (offsets + state commit
 * together); `maxOffsetsPerTrigger` is the backpressure valve that keeps a
 * replay-from-earliest from materializing the whole topic in one batch.
 */
object Streaming {

  /** Watermarked tumbling-window aggregate over an event stream with an
    * event-time column. Late rows beyond `watermark` are dropped — the
    * batch/stream-unified analogue of q_tumbling_window. */
  def windowedCount(events: DataFrame, tsCol: String, watermark: String,
                    window: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))

  /** One input row for the retracting runner: `op=false` accumulates,
    * `op=true` retracts (the reference's per-row ops flag). */
  case class OpRow(key: String, op: Boolean, value: Int)
  case class KeyResult(key: String, result: Long)

  /** One event for the streaming sessionizer. */
  case class SessEvent(user_id: Long, event_id: Long, t_ms: Long)
  /** [[SessEvent]] plus the TimestampType column the watermark rides on
    * (EventTimeTimeout requires a real event-time column). */
  case class SessEventTs(user_id: Long, event_id: Long, t_ms: Long,
                         ts: java.sql.Timestamp)
  /** A closed session: user, ordinal session number, span and event count. */
  case class Session(user_id: Long, session_id: Long, start_ms: Long,
                     end_ms: Long, n_events: Long)
  /** Open-session state for [[sessionize]] (public: the state encoder's
    * generated code must reach the accessors). */
  case class SessState(sessionSeq: Long, start: Long, last: Long, nEvents: Long)

  /**
   * Streaming sessionization with custom state: events within `gapMs` of the
   * previous event for the same user belong to one session; a longer gap
   * closes the session and emits it. The `flatMapGroupsWithState` form of the
   * batch `q_sessionize` window query — state per user is O(1) (current
   * session bounds only), shuffles are one hash exchange per micro-batch on
   * user_id. Sessions close when a gap-exceeding event arrives; a production
   * deployment would additionally arm `GroupStateTimeout` to flush idle
   * users without waiting for their next event.
   */
  def sessionize(input: Dataset[SessEvent], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc: Encoder[SessState] = Encoders.product[SessState]
    implicit val outEnc: Encoder[Session] = Encoders.product[Session]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    input.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          val closed = Seq.newBuilder[Session]
          var s = state.getOption.orNull
          rows.toSeq.sortBy(e => (e.t_ms, e.event_id)).foreach { e =>
            s match {
              case null => s = SessState(1L, e.t_ms, e.t_ms, 1L)
              case st if e.t_ms - st.last > gapMs =>
                closed += Session(user, st.sessionSeq, st.start, st.last, st.nEvents)
                s = SessState(st.sessionSeq + 1, e.t_ms, e.t_ms, 1L)
              case st => s = st.copy(start = math.min(st.start, e.t_ms),
                last = math.max(st.last, e.t_ms), nEvents = st.nEvents + 1)
            }
          }
          if (s != null) state.update(s)
          closed.result().iterator
      }
  }

  /**
   * Event-time variant of [[sessionize]]: the production shape. Idle users'
   * open sessions are flushed by `EventTimeTimeout` when the WATERMARK
   * passes `last + gapMs` — no need to wait for that user's next event (the
   * limitation documented on [[sessionize]]). Timeout firing is driven by
   * event time, so tests and replays are deterministic (processing-time
   * timeouts are wall-clock-dependent and hang `processAllAvailable`).
   *
   * State per user stays O(1); the watermark bounds state lifetime: every
   * open session is guaranteed flushed once the watermark passes its gap
   * deadline, so state size tracks ACTIVE users only — the property that
   * keeps a 100 TB/day stream's state store bounded.
   */
  def sessionizeEventTime(input: Dataset[SessEvent], gapMs: Long,
                          watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    implicit val stateEnc: Encoder[SessState] = Encoders.product[SessState]
    implicit val outEnc: Encoder[Session] = Encoders.product[Session]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val evtEnc: Encoder[SessEventTs] = Encoders.product[SessEventTs]
    import org.apache.spark.sql.functions.col
    input
      .withColumn("ts", (col("t_ms") / 1000.0).cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("ts", watermarkDelay)
      .as[SessEventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessEventTs], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: flush
            val st = state.get
            state.remove()
            Iterator.single(Session(user, st.sessionSeq, st.start, st.last, st.nEvents))
          } else {
            val closed = Seq.newBuilder[Session]
            var s = state.getOption.orNull
            rows.toSeq.sortBy(e => (e.t_ms, e.event_id)).foreach { e =>
              s match {
                case null => s = SessState(1L, e.t_ms, e.t_ms, 1L)
                case st if e.t_ms - st.last > gapMs =>
                  closed += Session(user, st.sessionSeq, st.start, st.last, st.nEvents)
                  s = SessState(st.sessionSeq + 1, e.t_ms, e.t_ms, 1L)
                case st => s = st.copy(start = math.min(st.start, e.t_ms),
                  last = math.max(st.last, e.t_ms), nEvents = st.nEvents + 1)
              }
            }
            if (s != null) {
              state.update(s)
              // deadline must sit beyond the current watermark or Spark
              // rejects it; max() keeps a late-arriving group flushable
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  // ---- stream-stream AS-OF join --------------------------------------------

  /** Tagged union envelope for [[asofJoin]]: both input streams ride one
    * grouped stream (`ts` carries the event-time watermark). */
  case class AsofEnv(key: Long, t_ms: Long, left: Boolean, v: Double, q: Long,
                     ts: java.sql.Timestamp)
  /** One as-of match: right row (t_ms, q) joined to the latest left row at
    * or before it; `left_t = -1`, `v = NaN` when no left preceded it. */
  case class AsofJoined(key: Long, t_ms: Long, q: Long, left_t: Long, v: Double)
  /** Per-key buffers: lefts = (t, v) candidates, rights = (t, q) pending
    * emission until the watermark passes their timestamp; `lastSeen` = max
    * event time received, the idle-GC clock. */
  case class AsofJState(lefts: Vector[(Long, Double)], rights: Vector[(Long, Long)],
                        lastSeen: Long = Long.MinValue)

  /**
   * Stream-stream AS-OF join: each right row is matched to the LATEST left
   * row with `left.t_ms <= right.t_ms` for the same key — the streaming form
   * of [[graft.plans.AsofJoinNative]] (quotes-to-trades attribution).
   *
   * Spark's stream-stream equi+range join cannot express "latest before"
   * (it emits EVERY left in the window, not the max), so this rides
   * `flatMapGroupsWithState`:
   *
   *  - a right row is emitted only once the watermark passes its timestamp —
   *    any left that could still arrive for it (`left.ts <= right.ts <= wm`)
   *    would be beyond the watermark and dropped anyway, so each right is
   *    emitted EXACTLY once with its final match (deterministic under
   *    arbitrary arrival interleaving);
   *  - left-buffer eviction keeps every left newer than the watermark plus
   *    the single newest left at-or-before it: no older left can ever be
   *    "latest before" any pending or future right, so state stays bounded
   *    by the arrival rate within the watermark delay — O(delay x rate) per
   *    key, NOT O(stream);
   *  - an event-time timeout flushes pending rights for keys that stop
   *    receiving data.
   *
   * Inputs are DataFrames with columns (key, t_ms, v|q) and a `ts` timestamp
   * column; apply `withWatermark` on BOTH before calling (the union's
   * watermark is the min of the two).
   *
   * `idleRetentionMs` bounds state for keys that go quiet holding only
   * lefts: a key with no pending rights is garbage-collected once no event
   * arrives for that long (event time) — a right arriving later than the
   * retention horizon joins as unmatched. Without this, every key ever seen
   * would pin its newest left forever.
   */
  def asofJoin(lefts: DataFrame, rights: DataFrame,
               idleRetentionMs: Long = 86400000L): Dataset[AsofJoined] = {
    implicit val envEnc: Encoder[AsofEnv] = Encoders.product[AsofEnv]
    implicit val outEnc: Encoder[AsofJoined] = Encoders.product[AsofJoined]
    implicit val stEnc: Encoder[AsofJState] = Encoders.product[AsofJState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val l = lefts.selectExpr("key", "t_ms", "true AS `left`", "v",
      "CAST(0 AS BIGINT) AS q", "ts").as[AsofEnv]
    val r = rights.selectExpr("key", "t_ms", "false AS `left`",
      "CAST('NaN' AS DOUBLE) AS v", "q", "ts").as[AsofEnv]
    l.unionByName(r)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofJState, AsofJoined](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[AsofEnv], state: GroupState[AsofJState]) =>
          var s = state.getOption.getOrElse(AsofJState(Vector.empty, Vector.empty))
          rows.foreach { e =>
            s = if (e.left) s.copy(lefts = s.lefts :+ (e.t_ms, e.v),
                                   lastSeen = math.max(s.lastSeen, e.t_ms))
                else s.copy(rights = s.rights :+ (e.t_ms, e.q),
                            lastSeen = math.max(s.lastSeen, e.t_ms))
          }
          val wm = state.getCurrentWatermarkMs()
          val lefts = s.lefts.sortBy(_._1)
          val (ready, pending) = s.rights.partition(_._1 <= wm)
          val out = ready.sortBy(_._1).map { case (rt, q) =>
            // latest left at or before rt (binary search over the sorted buffer)
            var lo = 0; var hi = lefts.length - 1; var best = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (lefts(mid)._1 <= rt) { best = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (best < 0) AsofJoined(key, rt, q, -1L, Double.NaN)
            else AsofJoined(key, rt, q, lefts(best)._1, lefts(best)._2)
          }
          // evict: keep lefts newer than the watermark + the newest one <= it
          val cutIdx = {
            var lo = 0; var hi = lefts.length - 1; var best = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (lefts(mid)._1 <= wm) { best = mid; lo = mid + 1 } else hi = mid - 1
            }
            math.max(best, 0)
          }
          s = AsofJState(lefts.drop(cutIdx), pending, s.lastSeen)
          // idle GC: a timeout that did NOT just flush rights, for a key
          // whose last event is beyond the retention horizon — NOT any
          // timeout that merely drained pending (the lefts buffer must
          // survive those for later rights)
          val idleGc = state.hasTimedOut && pending.isEmpty && ready.isEmpty &&
            wm >= s.lastSeen + idleRetentionMs
          if (idleGc || (s.lefts.isEmpty && s.rights.isEmpty)) state.remove()
          else {
            state.update(s)
            // ALWAYS arm a deadline: pending rights flush as soon as the
            // watermark allows; lefts-only keys get the idle-GC horizon
            state.setTimeoutTimestamp(
              if (pending.nonEmpty) math.max(pending.map(_._1).min + 1, wm + 1)
              else math.max(s.lastSeen + idleRetentionMs, wm + 1))
          }
          out.iterator
      }
  }

  /**
   * Stream-side of the bucketed range join (batch:
   * [[graft.plans.RangeJoin.bucketedRangeJoin]]): streaming points matched
   * to streaming intervals `[intervalTs, intervalTs + window]` for the same
   * key.
   *
   * No custom state needed — unlike AS-OF ("latest before", which Spark's
   * join cannot express), a range predicate with a BOUNDED span is exactly
   * Spark's stream-stream equi + event-time-range join: equality on the key
   * plus `pointTs BETWEEN intervalTs AND intervalTs + window`. Spark derives
   * state retention from watermark + window, so per-key join state holds at
   * most `watermark + window` of rows — the streaming analogue of the batch
   * operator's bucket-width bound. The bounded span is a REQUIREMENT here
   * (arbitrary (lo, hi) intervals would leave the state store unbounded);
   * batch callers with bounded spans get the same shape from bucketing.
   *
   * Both inputs need distinct column names and TimestampType event-time
   * columns. Inner join; append mode emits matches as they are found.
   */
  def streamRangeJoin(points: DataFrame, intervals: DataFrame,
                      pointKey: String, intervalKey: String,
                      pointTs: String, intervalTs: String,
                      window: String, watermark: String): DataFrame = {
    val p = points.withWatermark(pointTs, watermark)
    val i = intervals.withWatermark(intervalTs, watermark)
    p.join(i,
      col(pointKey) === col(intervalKey) &&
        col(pointTs) >= col(intervalTs) &&
        col(pointTs) <= col(intervalTs) + expr(s"INTERVAL $window"))
  }

  /** Input row for [[streamSemanticDedup]]: an id'd embedding. */
  final case class StreamVec(vec_id: Long, embedding: Seq[Float])
  /** Output: `dup_of` is the smallest previously-seen same-cell neighbor at
    * cosine ≥ tau, NULL (None) for originals — [[graft.ops.Dedup.semanticDedup]]'s
    * contract, incremental. */
  final case class SemDedupResult(vec_id: Long, dup_of: Option[Long])

  /** Streaming SemDeDup: the batch operator's deterministic-LSH-cell
    * semantics applied incrementally. Vectors are keyed by their
    * `hyperplane_bucket` cell (the SAME expression the batch operator uses,
    * so cell assignment can never drift between the two); per-cell state is
    * every vector seen in that cell, and each arrival maps to the smallest
    * earlier id within cosine `tau`, exactly the batch `min(id_a)` rule when
    * rows arrive in id order. Cosine replicates the engine kernel's
    * left-to-right double accumulation, so threshold decisions match the
    * batch expression bit-for-bit.
    *
    * State per cell is O(vectors in cell) — inherent to dedup (every kept
    * vector must remain comparable forever) and exactly why the cell
    * partitioning matters: `nPlanes` bounds the expected cell population,
    * and `maxPerCell` hard-caps state (beyond it, new arrivals still emit —
    * compared against the capped prefix — but are not retained; a
    * deployment sizes nPlanes so the cap is unreachable). Requires
    * `Graft.install` for `hyperplane_bucket`. */
  def streamSemanticDedup(vecs: Dataset[StreamVec], nPlanes: Int, tau: Double,
      maxPerCell: Int = 100000): Dataset[SemDedupResult] = {
    import vecs.sparkSession.implicits._
    // bucket via the registered graft expression — identical to the batch op
    val bucketed = vecs.toDF()
      .selectExpr(s"hyperplane_bucket(embedding, $nPlanes) AS bucket",
        "vec_id", "embedding")
    bucketed.as[(Long, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Array[Float])], SemDedupResult](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Seq[Float])],
            state: GroupState[List[(Long, Array[Float])]]) =>
          // stored newest-first; comparisons scan the full kept list
          var kept = state.getOption.getOrElse(Nil)
          var nKept = kept.length
          val out = List.newBuilder[SemDedupResult]
          // id order within the micro-batch = the batch operator's order
          rows.toSeq.sortBy(_._2).foreach { case (_, id, embSeq) =>
            val emb = embSeq.toArray
            var best = Long.MaxValue
            kept.foreach { case (kid, kemb) =>
              if (kid < id && cosine(kemb, emb) >= tau && kid < best) best = kid
            }
            out += SemDedupResult(id, if (best == Long.MaxValue) None else Some(best))
            if (nKept < maxPerCell) { kept = (id, emb) :: kept; nKept += 1 }
          }
          state.update(kept)
          out.result().iterator
      }
  }

  /** Streaming twin of the big-big ANN join
    * ([[graft.ops.Similarity.lshJoinTopK]]): a stream of `(q_id,
    * q_embedding)` probe rows retrieves its top-k corpus neighbors per
    * micro-batch. Retrieval is stateless per probe row, so foreachBatch +
    * the batch operator IS the exact twin — same buckets, same multi-probe
    * set, same rerank; a row's result is identical whether it arrived in a
    * batch or a stream.
    *
    * Topology per micro-batch: `bucketedCorpus` is
    * [[graft.ops.Similarity.bucketCorpus]] output, bucketed ONCE and
    * persisted BY THE CALLER (who owns the cache lifecycle — this function
    * deliberately takes the prepared handle instead of persisting
    * internally, so a stopped/restarted stream never strands an
    * unreachable cached copy); each batch then joins as a BROADCAST of the
    * (small) probe set against the cached buckets — map-only over the
    * corpus, no corpus shuffle or re-hash per batch
    * ([[graft.ops.Similarity.lshJoinTopKPrebucketed]], which also verifies
    * the corpus was bucketed at the SAME `bits`). Results land through
    * `sink(df, batchId)`, the exactly-once seam. */
  def annJoinStream(queries: DataFrame, bucketedCorpus: DataFrame, k: Int, bits: Int,
      sink: (DataFrame, Long) => Unit,
      multiProbe: Boolean = true): org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.ops.Similarity.lshJoinTopKPrebucketed(
        batch, bucketedCorpus, k, bits, multiProbe), batchId)
    }
  }

  /** Streaming incremental dedup: every micro-batch of `(id, text)` rows is
    * deduped against the PERSISTED index at `path`
    * ([[graft.ops.Dedup.dedupAgainstIndex]]), results land in `sink`, and the
    * batch's NOVEL documents (dup_of IS NULL) are appended to the index so
    * later batches dedup against them — the daily-crawl loop as a stream.
    *
    * foreachBatch is the right tool here, not a stateful operator: the index
    * is shared, persistent, and readable by BATCH consumers mid-stream, and
    * micro-batch boundaries give the exactly-once append points. Note the
    * batch-id guard: foreachBatch can replay a batch after a failure, and
    * appending the same novel docs twice would corrupt the index — replays
    * are detected via the id file and skip the append (the dedup output
    * write is idempotent per batch id).
    *
    * The stream must deliver unique ids (enforced upstream via watermarked
    * dropDuplicates); within one micro-batch, documents are NOT deduped
    * against each other — only against the index — matching the batch
    * operator's increment-vs-corpus contract. */
  def dedupStream(docs: DataFrame, textCol: String, idCol: String,
      indexPath: String, sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    // markers are scoped to THIS writer instance: a restarted stream gets a
    // fresh run id, so stale markers from a previous run (or a previous
    // checkpoint lineage whose batch ids restarted at 0) can never silently
    // swallow batches — they only suppress duplicate appends of a batch
    // replayed WITHIN one run
    val runId = java.util.UUID.randomUUID().toString
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val marker = new org.apache.hadoop.fs.Path(
        s"$indexPath/_applied/${runId}_$batchId")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        val (k, _) = {
          val r = spark.read.parquet(s"$indexPath/meta").head()
          (r.getInt(0), r.getInt(1))
        }
        // signatures computed ONCE, shared by the probe and the append
        val sigs = graft.ops.Dedup.sigsOf(batch, textCol, idCol, k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val flagged = graft.ops.Dedup
            .dedupSigsAgainstIndex(sigs, idCol, indexPath)
          sink(flagged, batchId)
          val novelIds = flagged.where(col("dup_of").isNull)
            .select(col(idCol).as("id"))
          graft.ops.Dedup.appendSigsToIndex(sigs.join(novelIds, "id"), indexPath)
          fs.create(marker, true).close()
        } finally sigs.unpersist()
      }
    }
  }

  /** The engine cosine kernel's exact arithmetic (left-to-right double
    * accumulation over floats) — see `Kernels.cosineSim`. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Apply a retractable [[GraftAggregate]] over a keyed CDC stream with
    * `flatMapGroupsWithState`, emitting the revised aggregate per key per
    * micro-batch. */
  def retractingSum(input: Dataset[OpRow], agg: GraftAggregate[Long, Long]): Dataset[KeyResult] = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[KeyResult] = Encoders.product[KeyResult]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    input.groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyResult](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[OpRow], state: GroupState[Long]) =>
          var s = state.getOption.getOrElse(agg.createState())
          rows.foreach { r =>
            val row = Row(r.value)
            s = if (r.op) agg.retract(s, row) else agg.accumulate(s, row)
          }
          state.update(s)
          Iterator.single(KeyResult(key, agg.finish(s)))
      }
  }

  /** One keyed value for the streaming cardinality sketch. */
  case class KV(key: String, value: String)
  case class CardEstimate(key: String, est: Long)

  /** Streaming distinct-count: per-key HyperLogLog registers as group state,
    * revised estimate emitted every micro-batch. Because HLL registers are a
    * commutative-idempotent max-merge, the streaming estimate after any
    * prefix of batches is IDENTICAL to the batch `hll_distinct` over the
    * same rows — arrival order, batching, and replays cannot change it
    * (re-accumulating a replayed row is a no-op by idempotence). State is a
    * fixed 2^p bytes per key forever, the streaming-state contract a
    * count-distinct-over-unbounded-keys job needs. */
  case class MetricRow(key: String, seq: Long, v: Long)
  case class AnomalyOut(key: String, seq: Long, roll_n: Int, flag: Int)
  case class AnomState(buf: Seq[Long])

  /** Streaming rolling z-score anomaly flags with BATCH-IDENTICAL
    * semantics: per-key state is the last `window−1` values (bounded,
    * O(window) per key); each arrival evaluates the exact integer test
    * `(n·x − s)² > T²·(n·s2 − s²)` over its frame — the same arithmetic as
    * [[graft.ops.TimeSeries.anomalyFlags]], so a stream fed in `seq` order
    * emits exactly the batch flags (parity spec). Rows are sorted by `seq`
    * within each micro-batch; cross-batch disorder is the caller's
    * watermarking problem (state never rewinds). */
  def anomalyStream(input: Dataset[MetricRow], window: Int = 20,
                    tSigma: Int = 3): Dataset[AnomalyOut] = {
    implicit val stateEnc: Encoder[AnomState] = Encoders.product[AnomState]
    implicit val outEnc: Encoder[AnomalyOut] = Encoders.product[AnomalyOut]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val t2 = tSigma.toLong * tSigma
    input.groupByKey(_.key)
      .flatMapGroupsWithState[AnomState, AnomalyOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MetricRow], state: GroupState[AnomState]) =>
          var buf = state.getOption.map(_.buf.toVector).getOrElse(Vector.empty[Long])
          val out = rows.toSeq.sortBy(_.seq).map { r =>
            val frame = buf :+ r.v
            val n = frame.size.toLong
            val s = frame.sum
            val s2 = frame.map(x => x * x).sum
            val d = n * r.v - s
            val flag = if (d * d > t2 * (n * s2 - s * s)) 1 else 0
            buf = frame.takeRight(window - 1)
            AnomalyOut(key, r.seq, n.toInt, flag)
          }
          state.update(AnomState(buf))
          out.iterator
      }
  }

  case class CusumOut(key: String, seq: Long, cusum: Long, changed: Int)
  case class CusumState(baseBuf: Seq[(Long, Long)], n0: Long, s0: Long,
                        cusum: Long)

  /** Streaming CUSUM change-point detection, BATCH-IDENTICAL
    * ([[graft.ops.TimeSeries.cusum]]) for every key that reaches
    * `baselineN` rows: the baseline is the rational (s0, n0) over each
    * key's first `baselineN` rows, and every row — the baseline rows
    * included — accumulates `n0·x − s0`. Rows buffer (unemitted) until the
    * baseline fills, because every cusum depends on the complete baseline;
    * from then on per-key state is THREE longs.
    * DIVERGENCE for short keys: a key that never reaches `baselineN` rows
    * emits nothing here (an unbounded stream can't know the key is done),
    * while the batch operator — which sees the group end — emits its rows
    * against the partial baseline (n0 = group size). The parity claim is
    * therefore scoped to keys with ≥ `baselineN` rows. */
  def cusumStream(input: Dataset[MetricRow], baselineN: Int,
                  thresh: Long): Dataset[CusumOut] = {
    require(baselineN >= 1, "baselineN >= 1")
    implicit val stateEnc: Encoder[CusumState] = Encoders.product[CusumState]
    implicit val outEnc: Encoder[CusumOut] = Encoders.product[CusumOut]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    input.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MetricRow], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(Vector.empty, 0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumOut]
          def emit(seq: Long, v: Long): Unit = {
            val c = st.cusum + st.n0 * v - st.s0
            st = st.copy(cusum = c)
            out += CusumOut(key, seq, c,
              if (math.abs(c) > thresh * st.n0) 1 else 0)
          }
          rows.toSeq.sortBy(_.seq).foreach { r =>
            if (st.n0 > 0) emit(r.seq, r.v)
            else {
              val buf = st.baseBuf :+ (r.seq -> r.v)
              if (buf.size < baselineN) st = st.copy(baseBuf = buf)
              else {
                st = CusumState(Vector.empty, baselineN.toLong,
                  buf.take(baselineN).map(_._2).sum, 0L)
                buf.foreach { case (s, v) => emit(s, v) }
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class TokKept(key: String, seq: Long, nTok: Long, cum: Long)
  case class BudgetState(cum: Long, done: Boolean)

  /** Streaming token-budget cut — the incremental twin of
    * [[graft.ops.Curation.tokenBudgetMix]]: per key (source), emit arriving
    * documents while the running token total stays ≤ `budget`; the first
    * overflowing document flips the key to `done` and NOTHING later emits
    * (the batch operator's monotone-prefix contract). Per-key state is one
    * long + one flag, forever.
    *
    * Ordering: the stream consumes in (seq) arrival order — the
    * deterministic-shuffle pre-ordering that the batch operator applies is
    * the upstream writer's job in a streaming setting. Parity claim
    * (spec-gated): output ≡ the batch window-cumsum prefix cut over the
    * same rows in seq order, across any micro-batch split. */
  def tokenBudgetStream(input: Dataset[MetricRow], budget: Long): Dataset[TokKept] = {
    require(budget >= 1L, "budget >= 1")
    implicit val stateEnc: Encoder[BudgetState] = Encoders.product[BudgetState]
    implicit val outEnc: Encoder[TokKept] = Encoders.product[TokKept]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    input.groupByKey(_.key)
      .flatMapGroupsWithState[BudgetState, TokKept](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[MetricRow], state: GroupState[BudgetState]) =>
          var st = state.getOption.getOrElse(BudgetState(0L, false))
          val out = scala.collection.mutable.ArrayBuffer.empty[TokKept]
          rows.toSeq.sortBy(_.seq).foreach { r =>
            if (!st.done) {
              val c = st.cum + r.v
              if (c <= budget) { st = st.copy(cum = c); out += TokKept(key, r.seq, r.v, c) }
              else st = st.copy(done = true)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class DocIn(source: String, doc_id: Long, text: String)

  /** Streaming curation capstone: the batch pipeline's document gate as a
    * stateless stream filter (the gopher battery is one boolean Column —
    * [[graft.ops.Curation.gopherPass]] — so it costs a projection, no
    * state), feeding the stateful per-source token-budget cut
    * ([[tokenBudgetStream]]). Requires `Graft.install` (token_count).
    * Batch-identical by construction: gate then prefix-cut in doc_id
    * arrival order — the parity spec replays the same rows through
    * `gopherRules` + a seq-order cumsum. */
  def curationStream(docs: Dataset[DocIn], minWords: Int, budget: Long,
                     stopList: Seq[String]): Dataset[TokKept] = {
    import org.apache.spark.sql.functions.col
    implicit val rowEnc: Encoder[MetricRow] = Encoders.product[MetricRow]
    val gated = docs
      .where(graft.ops.Curation.gopherPass(col("text"), minWords,
        stopList = stopList))
      .selectExpr("source AS key", "doc_id AS seq",
        "CAST(token_count(text) AS BIGINT) AS v")
      .as[MetricRow]
    tokenBudgetStream(gated, budget)
  }

  case class Scd2In(key: Long, ts: Long, id: Long, st: String)
  case class Scd2Out(key: Long, st: String, valid_from: Long, valid_to: Long)
  case class Scd2State(st: String, validFrom: Long, open: Boolean)

  /** Streaming SCD Type-2 history build, BATCH-IDENTICAL
    * ([[graft.ops.Warehouse.scd2]]) on CLOSED versions: each change of a
    * key's state closes the previous version and emits it with
    * `valid_to` = the change's ts (the half-open [from, to) convention).
    * The currently-OPEN version lives only in state — an unbounded stream
    * can never finalize it (the batch operator, which sees the group end,
    * emits it with a NULL valid_to; that row is the one difference).
    * Per-key state is O(1) (state value + valid_from); rows are sorted by
    * (ts, id) within each micro-batch, cross-batch disorder is the
    * caller's watermarking problem. State comparison is null-safe. */
  def scd2Stream(input: Dataset[Scd2In]): Dataset[Scd2Out] = {
    implicit val stateEnc: Encoder[Scd2State] = Encoders.product[Scd2State]
    implicit val outEnc: Encoder[Scd2Out] = Encoders.product[Scd2Out]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    input.groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Scd2In], state: GroupState[Scd2State]) =>
          var st = state.getOption.getOrElse(Scd2State(null, 0L, open = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Out]
          rows.toSeq.sortBy(r => (r.ts, r.id)).foreach { r =>
            if (!st.open) st = Scd2State(r.st, r.ts, open = true)
            else if (st.st != r.st) { // Scala == is null-safe
              out += Scd2Out(key, st.st, st.validFrom, r.ts)
              st = Scd2State(r.st, r.ts, open = true)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class QIn(key: String, v: Long)
  case class QReg(key: String, bin: Long, cnt: Long)
  case class QState(bins: Seq[Long], cnts: Seq[Long])

  /** Streaming qsketch registers, BATCH-IDENTICAL
    * ([[graft.ops.Sketches.qsketchRegisters]]): per-key state is the
    * register map (≤ ~960 entries — bounded whatever the stream length);
    * each micro-batch emits the key's full updated register set (Update
    * mode: per-(key, bin) counts only grow, so the latest emission per
    * (key, bin) is the state). Negative values are ignored, matching the
    * batch operator's filter. The bin arithmetic is the same
    * bitlength−1 formula the SQL tier uses. */
  def qsketchStream(input: Dataset[QIn]): Dataset[QReg] = {
    implicit val stateEnc: Encoder[QState] = Encoders.product[QState]
    implicit val outEnc: Encoder[QReg] = Encoders.product[QReg]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    def bin(v: Long): Long =
      if (v < 16L) v
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
        (e - 4).toLong * 16L + (v >>> (e - 4))
      }
    input.groupByKey(_.key)
      .flatMapGroupsWithState[QState, QReg](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[QIn], state: GroupState[QState]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(s =>
            s.bins.zip(s.cnts).foreach { case (b, c) => m(b) = c })
          rows.foreach { r =>
            if (r.v >= 0L) { val b = bin(r.v); m(b) = m.getOrElse(b, 0L) + 1L }
          }
          val sorted = m.toSeq.sortBy(_._1)
          state.update(QState(sorted.map(_._1), sorted.map(_._2)))
          sorted.map { case (b, c) => QReg(key, b, c) }.iterator
      }
  }

  /** One dated value for the sliding-window streaming sketch. */
  case class DayKV(key: String, day: Long, value: String)
  /** One revised window estimate: the trailing-`windowDays` distinct
    * estimate for (key, day), matching [[graft.ops.TimeSeries.windowedDistinctHll]]. */
  case class WinEst(key: String, day: Long, est: Long)
  /** Per-key state: parallel (day, registers) columns plus the min/max day
    * seen (max drives recomputation + retention eviction; min detects
    * whether eviction has ever removed one of this key's grid days). */
  case class HllWinState(days: Seq[Long], regs: Seq[Array[Byte]], maxDay: Long,
                         minDay: Long)

  /**
   * Streaming sliding-window distinct estimates — the incremental twin of
   * [[graft.ops.TimeSeries.windowedDistinctHll]]: per-key state is one HLL
   * register file PER RETAINED DAY (bounded: `retainDays` × 2^p bytes per
   * key, whatever the entity rate), and each micro-batch emits the revised
   * trailing-window estimate for every window-day the batch could have
   * changed.
   *
   * BATCH-IDENTICAL on the emitted grid: the latest emission per (key, day)
   * equals the batch operator's estimate over the same rows for every day in
   * the key's [min, max] span — including newly-in-grid days exposed on
   * EITHER side (a `maxDay` jump back-fills from the previous max; an
   * in-retention late day below the previous min back-fills down to it),
   * empty windows (emitted as 0), and null entities (which EXTEND the grid
   * without counting — the batch operator's grid projection is
   * null-inclusive while its registers filter isNotNull) — because the
   * parity spec replays exactly that contract. Uses the
   * same md5 hash/bucket/rho split and exact-integer raw estimator as the
   * batch operator, so estimates agree bit-for-bit.
   *
   * Late data: rows for days older than `max(prevMax, batchMax) -
   * retainDays` are DROPPED (their registers were evicted — the
   * state-boundedness contract; size `retainDays` like a watermark delay).
   * The horizon is computed from the batch's max day BEFORE any row is
   * accepted, so the accept/drop outcome is independent of intra-batch row
   * order — a task retry that re-reads the same rows in a different order
   * produces identical state and emissions. `retainDays` must cover at least
   * the window so every live window can re-merge its days. Once retention
   * bites (a key's span exceeds `retainDays`), windows older than the evict
   * horizon keep their LAST in-retention emission rather than being
   * recounted from partial state — so the batch-parity claim above is exact
   * when `retainDays` covers the span, and eventually-frozen-correct beyond
   * it.
   */
  def hllWindowStream(input: Dataset[DayKV], windowDays: Int, p: Int = 9,
      retainDays: Int = 0): Dataset[WinEst] = {
    require(windowDays >= 1 && windowDays <= 370, "windowDays in 1..370")
    require(p >= 4 && p <= 14, "p in 4..14")
    val retain = if (retainDays <= 0) 2 * windowDays else retainDays
    require(retain >= windowDays, "retainDays must cover the window")
    implicit val stateEnc: Encoder[HllWinState] = Encoders.product[HllWinState]
    implicit val outEnc: Encoder[WinEst] = Encoders.product[WinEst]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val agg = new graft.ops.Sketches.HllAgg(p)
    input.groupByKey(_.key)
      .flatMapGroupsWithState[HllWinState, WinEst](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DayKV], state: GroupState[HllWinState]) =>
          val st = state.getOption.getOrElse(
            HllWinState(Nil, Nil, Long.MinValue, Long.MaxValue))
          val regs = scala.collection.mutable.Map.empty[Long, Array[Byte]]
          st.days.zip(st.regs).foreach { case (d, r) => regs(d) = r }
          val prevMax = st.maxDay
          val prevMin = st.minDay
          var maxDay = prevMax
          var minDay = prevMin
          val touched = scala.collection.mutable.Set.empty[Long]
          // The retention horizon must come from the batch's max day BEFORE
          // any accept/drop decision, or intra-batch row order (which a task
          // retry does not preserve) changes which late rows survive. Rather
          // than buffering the rows (a hot key's micro-batch is unbounded),
          // ONE pass folds them into per-DAY partial registers — memory is
          // O(distinct days × 2^p), not O(rows) — and the accept/drop
          // decision moves to the day level after the pass, which is exact
          // because a day's partial register contains only that day's rows.
          val batchRegs = scala.collection.mutable.Map.empty[Long, Array[Byte]]
          val batchSeen = scala.collection.mutable.Set.empty[Long]
          var batchMax = Long.MinValue
          rows.foreach { r =>
            if (r.day > batchMax) batchMax = r.day
            // any row — null entity included — is a GRID day candidate (the
            // batch operator's grid projection is null-inclusive) ...
            batchSeen += r.day
            // ... but only non-null entities reach the registers (the batch
            // operator's isNotNull register filter)
            if (r.value != null)
              batchRegs(r.day) = agg.accumulate(
                batchRegs.getOrElse(r.day, agg.createState()), Row(r.value))
          }
          val horizon = math.max(prevMax, batchMax) - retain // deterministic
          batchSeen.foreach { d =>
            if (d > horizon) {
              if (d > maxDay) maxDay = d
              if (d < minDay) minDay = d
              batchRegs.get(d).foreach { br =>
                regs(d) = regs.get(d).map(agg.merge(_, br)).getOrElse(br)
                touched += d
              }
            } // else: beyond the retention horizon — dropped, like a watermark
          }
          // window-days to recompute: every window covering a touched day,
          // plus days newly inside the [min, max] grid on EITHER side (a
          // maxDay advance opens days at the top; an in-retention late day
          // below prevMin opens days at the bottom; on the key's first
          // batch the grid starts at its min day) — all capped to the
          // grid's right edge, so mid-gap days emit their 0s
          val affected = scala.collection.mutable.SortedSet.empty[Long]
          touched.foreach { d =>
            var w = d
            while (w < d + windowDays && w <= maxDay) { affected += w; w += 1 }
          }
          val fillFrom =
            if (prevMax == Long.MinValue)
              // first batch: the grid starts at the key's (null-inclusive)
              // min day, exactly like the batch operator's keyDayGrid
              if (minDay != Long.MaxValue) minDay else maxDay + 1
            else prevMax + 1
          require(maxDay == Long.MinValue || maxDay - fillFrom < 100000,
            s"hllWindowStream: key $key jumped ${maxDay - fillFrom} days in " +
              "one batch — corrupt timestamps?")
          (fillFrom to maxDay).foreach(affected += _)
          if (prevMin != Long.MaxValue && minDay < prevMin)
            (minDay until prevMin).foreach(affected += _) // bottom back-fill
          // Emission happens BEFORE this batch's eviction, so every affected
          // window still sees the days this batch accepted. Windows whose
          // days were evicted in an EARLIER batch must not be recounted from
          // partial state — their prior (correct) emission stands (the
          // retention contract). While nothing of this key's grid has ever
          // crossed the PRE-BATCH horizon, every window is recount-safe.
          val prevHorizon =
            if (prevMax == Long.MinValue) Long.MinValue else prevMax - retain
          val emitFloor =
            if (prevHorizon == Long.MinValue || minDay > prevHorizon) Long.MinValue
            else prevHorizon + windowDays
          val out = affected.iterator.filter(_ >= emitFloor).map { w =>
            val merged = ((w - windowDays + 1) to w).foldLeft(agg.createState()) {
              (acc, d) => regs.get(d).map(agg.merge(acc, _)).getOrElse(acc)
            }
            val covered = ((w - windowDays + 1) to w).exists(regs.contains)
            WinEst(key, w, if (covered) agg.finish(merged) else 0L)
          }.toVector
          // evict days no live window can reference anymore (state only —
          // this batch's emissions above already used them)
          regs.keys.filter(_ <= maxDay - retain).toSeq.foreach(regs.remove)
          val sorted = regs.toSeq.sortBy(_._1)
          state.update(HllWinState(sorted.map(_._1), sorted.map(_._2), maxDay,
            minDay))
          out.iterator
      }
  }

  case class TrendIn(eventType: String, day: Long)
  case class TrendOut(day: Long, eventType: String, cnt7: Long, rank: Int)
  case class TrendState(types: Seq[String], counts: Seq[Long])
  /** One fanned (window-day, type) contribution; `ts` is the window-day as
    * an event-time instant so the retention path can watermark on it. */
  case class TrendFan(day: Long, eventType: String, ts: java.sql.Timestamp)

  /**
   * Streaming trailing-window trending top-k — the incremental twin of the
   * `q_trending` dashboard rollup (per day, the top-k event types by
   * trailing `windowDays`-day event count).
   *
   * Topology inverts the batch register-fan: each event fans to the
   * `windowDays` WINDOW-day keys its day contributes to, so per-key state
   * is one count per event type seen in that window (bounded by the type
   * vocabulary, independent of event volume) and each micro-batch emits a
   * revised full top-k for every window-day it touched. Ranking matches
   * the batch query exactly: count desc, then event type asc.
   *
   * Contract vs batch: counts only grow, so the LATEST emission per day is
   * the batch result over the same rows — for every day up to the max
   * event day seen. Window-days BEYOND it (days the newest events fan
   * forward into) emit provisionally with partial trailing counts, exactly
   * what a live dashboard wants for "today"; the batch query instead clamps
   * its grid to the data's max day, so parity specs compare days ≤ that
   * max. Null event types are ignored (filter them identically on the
   * batch side when checking parity).
   *
   * Scale: the fan-out is ×windowDays on EVENTS — acceptable for dashboard
   * feeds; pre-aggregate upstream (a `groupBy(type, day).count` per batch
   * before this operator would need a count-valued input, not offered here
   * to keep the operator exactly-once simple). State rows = live window-day
   * keys × 1, BOUNDED by default: `retainDays` defaults to
   * `2 * windowDays` (the [[hllWindowStream]] convention — a negative value
   * selects this default), so window-day keys older than
   * (max fanned day − retainDays) are evicted via event-time timeout and
   * fanned rows that late are dropped by the watermark — their windows keep
   * their LAST in-retention emission. Size an explicit `retainDays
   * >= windowDays` so no live window's key can be evicted while current
   * events still fan into it. Pass `retainDays = 0` to opt OUT of eviction
   * entirely (state then grows one row per day of stream lifetime — ~365
   * small rows/year; unbounded in principle, which is why it is no longer
   * the default). On the retention path, day indexes must be `>= 0`:
   * a negative day's fan rows sit at/below the initial zero watermark and
   * would silently late-filter, so they are rejected with an error instead
   * (the unbounded path accepts any day index).
   */
  def trendingStream(input: Dataset[TrendIn], windowDays: Int = 7,
      k: Int = 3, retainDays: Int = -1): Dataset[TrendOut] = {
    require(windowDays >= 1 && windowDays <= 370, "windowDays in 1..370")
    require(k >= 1 && k <= 1000, "k in 1..1000")
    val retain = if (retainDays < 0) 2 * windowDays else retainDays
    require(retain == 0 || retain >= windowDays,
      "retainDays must cover the window (or 0 for unbounded retention)")
    implicit val stateEnc: Encoder[TrendState] = Encoders.product[TrendState]
    implicit val outEnc: Encoder[TrendOut] = Encoders.product[TrendOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val fanEnc: Encoder[TrendFan] = Encoders.product[TrendFan]
    implicit val inEnc: Encoder[TrendIn] = Encoders.product[TrendIn]
    val dayMs = 86400000L
    def step(day: Long, rows: Iterator[TrendFan],
        state: GroupState[TrendState]): Iterator[TrendOut] =
      if (state.hasTimedOut) { // beyond retention — drop the key's counts
        state.remove(); Iterator.empty
      } else {
        val st = state.getOption.getOrElse(TrendState(Nil, Nil))
        val m = scala.collection.mutable.Map.empty[String, Long]
        st.types.zip(st.counts).foreach { case (t, c) => m(t) = c }
        rows.foreach(r => m(r.eventType) = m.getOrElse(r.eventType, 0L) + 1L)
        val sorted = m.toSeq.sortBy { case (t, c) => (-c, t) }
        state.update(TrendState(sorted.map(_._1), sorted.map(_._2)))
        if (retain > 0)
          // evict at the first watermark advance past this window-day's own
          // event time: with the watermark delayed by retainDays, that is
          // maxFannedDay − retainDays > day — the same horizon at which the
          // watermark starts dropping this key's late rows, so an evicted
          // key can never be half-recreated from a partial late fan.
          // setTimeoutTimestamp requires a value > the current watermark.
          state.setTimeoutTimestamp(
            math.max((day + 1) * dayMs, state.getCurrentWatermarkMs() + 1))
        sorted.iterator.take(k).zipWithIndex.map { case ((t, c), i) =>
          TrendOut(day, t, c, i + 1)
        }
      }
    // ts = (w + 1) days: the +1 keeps day 0 strictly above Spark's initial
    // zero watermark (a row at exactly the watermark is late-filtered).
    // Day indexes must be >= 0 on the retention path for the same reason —
    // enforced below rather than silently dropped.
    val guarded =
      if (retain > 0) input.map { r =>
        if (r.day < 0) throw new IllegalArgumentException(
          s"trendingStream: negative day index ${r.day} on the retention " +
            "path (its fan rows would sit at/below the initial watermark " +
            "and be silently dropped); shift day indexes to >= 0 or pass " +
            "retainDays = 0 for unbounded retention")
        r
      } else input
    val fanned = guarded.filter(_.eventType != null)
      .flatMap(r => (r.day until r.day + windowDays)
        .map(w => TrendFan(w, r.eventType, new java.sql.Timestamp((w + 1) * dayMs))))
    if (retain <= 0)
      fanned.groupByKey(_.day)
        .flatMapGroupsWithState[TrendState, TrendOut](
          OutputMode.Update(), GroupStateTimeout.NoTimeout())(step)
    else
      fanned.withWatermark("ts", s"$retain days")
        .groupByKey(_.day)
        .flatMapGroupsWithState[TrendState, TrendOut](
          OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(step)
  }

  def hllStream(input: Dataset[KV], p: Int = 9): Dataset[CardEstimate] = {
    implicit val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
    implicit val outEnc: Encoder[CardEstimate] = Encoders.product[CardEstimate]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val agg = new graft.ops.Sketches.HllAgg(p)
    input.groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], CardEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KV], state: GroupState[Array[Byte]]) =>
          var s = state.getOption.getOrElse(agg.createState())
          rows.foreach(r => s = agg.accumulate(s, Row(r.value)))
          state.update(s)
          Iterator.single(CardEstimate(key, agg.finish(s)))
      }
  }
}
