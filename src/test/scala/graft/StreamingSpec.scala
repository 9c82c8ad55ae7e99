package graft

import graft.functions.SumAgg
import graft.streaming.Streaming
import graft.streaming.Streaming.{KeyResult, OpRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed count with watermark drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedCount(df, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      mem.addData((t(1), "click", 1.0), (t(2), "click", 2.0), (t(7), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far ahead, then send a very late row -> dropped
      mem.addData((t(59), "click", 4.0))
      q.processAllAvailable()
      mem.addData((t(1), "click", 100.0)) // late beyond watermark
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, cnt, total FROM win_counts").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))  // first window kept both on-time rows
      assert(!rows.contains(("click", 3L, 103.0))) // late row never applied
    } finally q.stop()
  }

  test("batch ≡ stream: tumbling-window aggregate over the events file source") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val schema = batchDf.schema
    def windowed(df: org.apache.spark.sql.DataFrame) = SparkEntry.eventsTsNs(df)
      .selectExpr("window(timestamp_micros(ts DIV 1000), '1 hour') AS w", "event_type", "value")
      .groupBy("w", "event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .selectExpr("unix_millis(w.start) AS ws", "event_type", "cnt")
    val expected = windowed(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the file stream source requires a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
    val q = windowed(stream).writeStream.format("memory").queryName("stream_parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT ws, event_type, cnt FROM stream_parity").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup with watermark drops duplicate doc ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = df.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      mem.addData((t(1), 1L, "a"), (t(2), 1L, "a-dup"), (t(3), 2L, "b"))
      q.processAllAvailable()
      mem.addData((t(4), 2L, "b-dup"), (t(5), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id, count(*) AS c FROM dedup_stream GROUP BY doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ids == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally q.stop()
  }

  test("batch ≡ stream: LM surprisal scoring with a batch-trained model") {
    // the train-offline / score-online pattern: the unigram model is built
    // from a batch corpus, then the map-only scorer runs unchanged on a
    // stream (no state, no watermark — it's a pure projection under a
    // broadcast model)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = (1L to 50L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val model = graft.ops.LangModel.trainUnigram(corpus, "text", vocabSize = 3)
    val docs = Seq((100L, "alpha beta"), (101L, "zeta zeta unknown"))
    val expected = graft.ops.LangModel
      .surprisal(docs.toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val mem = MemoryStream[(Long, String)]
    val q = graft.ops.LangModel
      .surprisal(mem.toDF().toDF("doc_id", "text"), model, "text", "doc_id")
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, surprisal FROM lm_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("batch ≡ stream: curation gates (mixture sample + quality filter) on a stream") {
    // stratified sampling and quality gating are pure per-row filters —
    // they compose with Structured Streaming with no state or watermark;
    // the same Curation call works on a streaming DataFrame unchanged.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 200L).map { i =>
      (i, if (i % 3 == 0) "the quick brown fox jumps over the lazy dog and runs on"
          else "zz", s"src${i % 4}")
    }
    val batch = docs.toDF("doc_id", "text", "source")
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Curation.stratifiedSample(df, "doc_id", "mix",
          org.apache.spark.sql.functions.expr(
            "300 + 100 * (CAST(substring(source, 4) AS INT) % 4)"))
        .where("token_count(text) >= 5")
    val want = gate(batch).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && want.size < 67) // both gates actually cut
    val mem = MemoryStream[(Long, String, String)]
    val q = gate(mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      docs.grouped(70).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val got = spark.sql("SELECT doc_id FROM curate_stream")
        .collect().map(_.getLong(0)).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap, matches batch semantics") {
    import spark.implicits._
    import graft.streaming.Streaming.SessEvent
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000L // 30 min, same as q_sessionize
    val mem = MemoryStream[SessEvent]
    val q = Streaming.sessionize(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two sessions (gap between t=2000 and t=2000+gap+1);
      // user 2: one session of one event
      mem.addData(
        SessEvent(1L, 1L, 1000L), SessEvent(1L, 2L, 2000L),
        SessEvent(2L, 3L, 500L), SessEvent(3L, 7L, 5000L))
      q.processAllAvailable()
      // user 1 starts a second session; user 3 gets a LATE cross-batch event
      // (t=1000 < open session's last=5000) that must extend start backward
      // without regressing end
      mem.addData(SessEvent(1L, 4L, 2000L + gap + 1), SessEvent(3L, 8L, 1000L))
      q.processAllAvailable()
      // a far-future event per user forces the previous sessions closed
      mem.addData(SessEvent(1L, 5L, 10L * gap), SessEvent(2L, 6L, 10L * gap),
        SessEvent(3L, 9L, 10L * gap))
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT user_id, session_id, start_ms, end_ms, n_events FROM sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(closed == Set(
        (1L, 1L, 1000L, 2000L, 2L),              // user 1 first session (2 events)
        (1L, 2L, 2000L + gap + 1, 2000L + gap + 1, 1L), // user 1 second session
        (2L, 1L, 500L, 500L, 1L),                // user 2 single-event session
        (3L, 1L, 1000L, 5000L, 2L)))             // late event widened the span
    } finally q.stop()
  }

  test("event-time sessionize: watermark flushes idle users via timeout") {
    import spark.implicits._
    import graft.streaming.Streaming.SessEvent
    implicit val sqlCtx = spark.sqlContext
    val gap = 1000L
    val mem = MemoryStream[SessEvent]
    val q = Streaming.sessionizeEventTime(mem.toDS(), gap)
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 goes idle after t=2000; user 99 keeps the stream (and the
      // watermark) moving
      mem.addData(SessEvent(1L, 1L, 1000L), SessEvent(1L, 2L, 2000L),
        SessEvent(99L, 3L, 500L))
      q.processAllAvailable()
      // watermark jumps to 100s — far past user 1's gap deadline (3s)
      mem.addData(SessEvent(99L, 4L, 100000L))
      q.processAllAvailable()
      // one more batch so the timeout fires with the advanced watermark
      // (batch N uses the watermark computed after batch N-1)
      mem.addData(SessEvent(99L, 5L, 100001L))
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT user_id, session_id, start_ms, end_ms, n_events FROM et_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // user 1 was flushed by TIMEOUT (no further user-1 events ever arrived);
      // user 99's first session closed by the inline gap rule
      assert(closed.contains((1L, 1L, 1000L, 2000L, 2L)), closed.toString)
      assert(closed.contains((99L, 1L, 500L, 500L, 1L)), closed.toString)
    } finally q.stop()
  }

  test("stream-stream join: watermarked, time-bounded attribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val impressions = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val i = impressions.toDF().toDF("ad_id", "imp_time")
      .withWatermark("imp_time", "10 seconds")
    val c = clicks.toDF().toDF("c_ad_id", "click_time")
      .withWatermark("click_time", "10 seconds")
    // attribute a click to an impression within 5 seconds after it
    val joined = i.join(c, org.apache.spark.sql.functions.expr(
      "ad_id = c_ad_id AND click_time >= imp_time AND click_time <= imp_time + interval 5 seconds"))
    val q = joined.selectExpr("ad_id", "unix_millis(imp_time) AS it", "unix_millis(click_time) AS ct")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      // NB: timestamps near epoch 0 interact badly with the initial
      // watermark; use a realistic base
      impressions.addData((1L, ts(1000)), (2L, ts(1000)))
      clicks.addData((1L, ts(1003)), (2L, ts(1020))) // 2's click outside the window
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad_id, it, ct FROM attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 1000000L, 1003000L)))
    } finally q.stop()
  }

  test("stream-stream AS-OF join: latest-quote-before-trade, watermark-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val quotes = MemoryStream[(Long, Long, Double)]  // (key, t_sec, value)
    val trades = MemoryStream[(Long, Long, Long)]    // (key, t_sec, qty)
    val q = quotes.toDF().toDF("key", "t_sec", "v")
      .selectExpr("key", "t_sec * 1000 AS t_ms", "v", "timestamp_seconds(t_sec) AS ts")
      .withWatermark("ts", "5 seconds")
    val t = trades.toDF().toDF("key", "t_sec", "q")
      .selectExpr("key", "t_sec * 1000 AS t_ms", "q", "timestamp_seconds(t_sec) AS ts")
      .withWatermark("ts", "5 seconds")
    val out = graft.streaming.Streaming.asofJoin(q, t)
    val query = out.writeStream.format("memory").queryName("asof_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: quotes at 1000 and 1004 for key 1; a quote for key 2 at 1001
      quotes.addData((1L, 1000L, 10.0), (1L, 1004L, 11.0), (2L, 1001L, 20.0))
      // trades: key1@1002 (matches quote@1000), key1@1005 (quote@1004),
      // key2@1000 (NO quote before it)
      trades.addData((1L, 1002L, 5L), (1L, 1005L, 7L), (2L, 1000L, 3L))
      query.processAllAvailable()
      // advance the watermark past every trade (wm = max_ts - 5s)
      quotes.addData((9L, 1100L, 0.0))
      trades.addData((9L, 1100L, 0L))
      query.processAllAvailable()
      quotes.addData((9L, 1200L, 0.0)) // second advance flushes key-9 rights
      trades.addData((9L, 1200L, 0L))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, t_ms, q, left_t, v FROM asof_stream WHERE key < 9").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.getDouble(4).isNaN) None else Some(r.getDouble(4)))).toSet
      assert(rows == Set(
        (1L, 1002000L, 5L, 1000000L, Some(10.0)),
        (1L, 1005000L, 7L, 1004000L, Some(11.0)),
        (2L, 1000000L, 3L, -1L, None)))
    } finally query.stop()
  }

  test("batch ≡ stream: asofJoin agrees with the native batch as-of exec") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic quotes/trades; strictly distinct times sidestep
    // tiebreak-order differences between the two implementations
    val quotes = (0 until 300).map(i => (i % 5L, 1000000L + i * 997L, i * 1.0))
    val trades = (0 until 200).map(i => (i % 5L, 1000500L + i * 1009L, i.toLong))
    // batch expectation: AsofJoinNative enriches each trade with the latest
    // quote at or before it (same key)
    val qdf = quotes.toDF("key", "t_ms", "v").selectExpr(
      "key AS qkey", "t_ms AS qt", "v")
    val tdf = trades.toDF("key", "t_ms", "q")
    val batch = graft.plans.AsofJoinNative.asof(tdf, qdf,
        "key", "qkey", "t_ms", "qt", "qt", Seq("qt", "v"))
      .selectExpr("key", "t_ms", "q", "qt", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
         if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    // stream: same rows through MemoryStreams in interleaved chunks
    val qs = MemoryStream[(Long, Long, Double)]
    val ts = MemoryStream[(Long, Long, Long)]
    def env(df: org.apache.spark.sql.DataFrame, vcol: String) = df
      .selectExpr("_1 AS key", "_2 AS t_ms", s"_3 AS $vcol",
        "timestamp_millis(_2) AS ts")
      .withWatermark("ts", "1 second")
    val out = graft.streaming.Streaming.asofJoin(env(qs.toDF(), "v"), env(ts.toDF(), "q"))
    val query = out.writeStream.format("memory").queryName("asof_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      (quotes.grouped(120).toSeq zip trades.grouped(80).toSeq).foreach { case (qc, tc) =>
        qs.addData(qc); ts.addData(tc); query.processAllAvailable()
      }
      // push the watermark far past every trade, twice (wm advances a batch late)
      qs.addData((99L, 9000000L, 0.0)); ts.addData((99L, 9000000L, 0L))
      query.processAllAvailable()
      qs.addData((99L, 9900000L, 0.0)); ts.addData((99L, 9900000L, 0L))
      query.processAllAvailable()
      val stream = spark.sql("SELECT key, t_ms, q, left_t, v FROM asof_parity WHERE key < 90")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      assert(stream.size == trades.size, s"stream emitted ${stream.size}/${trades.size}")
      stream.foreach { case (k, (lt, v)) =>
        val (blt, bv) = batch(k)
        assert(lt == blt && (v == bv || (v.isNaN && bv.isNaN)),
          s"$k: stream ($lt,$v) vs batch ($blt,$bv)")
      }
    } finally query.stop()
  }

  test("retracting aggregate over CDC stream revises results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[OpRow]
    val q = Streaming.retractingSum(mem.toDS(), new SumAgg)
      .writeStream.format("memory").queryName("retract_sum")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(OpRow("a", op = false, 5), OpRow("a", op = false, 7), OpRow("b", op = false, 1))
      q.processAllAvailable()
      var res = spark.sql("SELECT key, result FROM retract_sum").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(res("a") == 12L && res("b") == 1L)
      // retraction arrives: remove the 5
      mem.addData(OpRow("a", op = true, 5))
      q.processAllAvailable()
      res = spark.sql("SELECT key, result FROM retract_sum").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last.getLong(1) }
      assert(res("a") == 7L)
    } finally q.stop()
  }

  test("batch ≡ stream: streamRangeJoin agrees with the bucketed range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val W = 3600000L // 1 hour window, matching the batch bucket width
    val base = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // points: boundary hits (exactly lo, exactly lo+W), misses on both
    // sides, and a key with no interval at all
    val pointRows = Seq(
      (1L, 101L, base + 10000L), (1L, 102L, base + W),      // in-window
      (1L, 103L, base - 5000L), (1L, 104L, base + W + 1L),  // out both sides
      (2L, 201L, base), (3L, 301L, base + 1000L))           // key 3: no interval
    val intervalRows = Seq((1L, 901L, base), (2L, 902L, base))
    // batch oracle over epoch millis with hi = lo + W
    val bp = pointRows.toDF("user_id", "event_id", "t_ms")
    val bi = intervalRows.toDF("p_user", "purchase_id", "lo").selectExpr("*", s"lo + $W AS hi")
    val want = graft.plans.RangeJoin.bucketedRangeJoin(
        bp, bi, "user_id", "p_user", "t_ms", "lo", "hi", bucketWidth = W)
      .select("event_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(want == Set((101L, 901L), (102L, 901L), (201L, 902L))) // fixture is non-vacuous
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val iMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = Streaming.streamRangeJoin(
      pMem.toDF().toDF("user_id", "event_id", "ts"),
      iMem.toDF().toDF("p_user", "purchase_id", "lo_ts"),
      "user_id", "p_user", "ts", "lo_ts", window = "1 hour", watermark = "10 minutes")
    val q = joined.select("event_id", "purchase_id").writeStream.format("memory")
      .queryName("stream_range_join").outputMode(OutputMode.Append()).start()
    try {
      pMem.addData(pointRows.map { case (u, e, t) => (u, e, ts(t)) }: _*)
      iMem.addData(intervalRows.map { case (u, p, l) => (u, p, ts(l)) }: _*)
      q.processAllAvailable()
      val got = spark.table("stream_range_join").as[(Long, Long)].collect().toSet
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("batch \u2261 stream: semantic dedup agrees with Dedup.semanticDedup") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 base vectors + 12 planted near-copies (tiny perturbation on one
    // coordinate keeps cosine ~0.9999); unrelated vectors are near-orthogonal
    def vec(seed: Long): Seq[Float] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 13) - 6).toFloat / 6.0f)
    val base = (0L until 40L).map(i => Streaming.StreamVec(i, vec(i)))
    val dups = (0L until 12L).map { k =>
      val src = vec(k * 3)
      Streaming.StreamVec(100L + k, src.updated(0, src.head + 0.001f))
    }
    val all = (base ++ dups).sortBy(_.vec_id)
    val batchDf = spark.createDataFrame(
      all.map(v => (v.vec_id, v.embedding))).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
    val want = graft.ops.Dedup.semanticDedup(batchDf, "vec_id", "embedding",
        nPlanes = 6, tau = 0.99)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val mem = MemoryStream[Streaming.StreamVec]
    val q = Streaming.streamSemanticDedup(mem.toDS(), nPlanes = 6, tau = 0.99)
      .writeStream.format("memory").queryName("stream_semdedup")
      .outputMode("append").start()
    try {
      // two micro-batches in id order: originals first, then the copies
      mem.addData(all.filter(_.vec_id < 100L): _*); q.processAllAvailable()
      mem.addData(all.filter(_.vec_id >= 100L): _*); q.processAllAvailable()
      val got = spark.table("stream_semdedup")
        .as[Streaming.SemDedupResult].collect()
        .map(r => (r.vec_id, r.dup_of.getOrElse(-1L))).toSet
      assert(got == want, s"stream $got vs batch $want")
      assert(got.exists(_._2 >= 0L), "no duplicate was detected at all")
    } finally q.stop()
  }

  test("batch ≡ stream: annJoinStream equals lshJoinTopK per micro-batch") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val probes = corpus.where("vec_id % 7 = 0")
      .selectExpr("vec_id AS q_id", "embedding AS q_embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    def want(ids: Set[Long]) = graft.ops.Similarity.lshJoinTopK(
        corpus.where(s"vec_id % 7 = 0 AND vec_id IN (${ids.mkString(",")})")
          .selectExpr("vec_id AS q_id", "embedding AS q_embedding"),
        corpus, 3, bits = 5)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val results = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Int)]]
    val mem = MemoryStream[(Long, Seq[Float])]
    // the caller buckets + persists the corpus once and owns the cache
    val bucketed = graft.ops.Similarity.bucketCorpus(corpus, bits = 5).persist()
    // a mismatched-bits probe set must fail loudly, never misjoin
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.lshJoinTopKPrebucketed(
        corpus.limit(1).selectExpr("vec_id AS q_id", "embedding AS q_embedding"),
        bucketed, 3, bits = 6)
    }
    val q = Streaming.annJoinStream(
        mem.toDF().toDF("q_id", "q_embedding")
          .selectExpr("q_id", "CAST(q_embedding AS ARRAY<FLOAT>) AS q_embedding"),
        bucketed, 3, bits = 5,
        (df, bid) => results(bid) = df.select("q_id", "vec_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
      .start()
    try {
      val (b0, b1) = probes.splitAt(probes.length / 2)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      assert(results(0) == want(b0.map(_._1).toSet), "batch 0 parity")
      assert(results(1) == want(b1.map(_._1).toSet), "batch 1 parity")
      assert(results(0).nonEmpty && results(1).nonEmpty)
    } finally { q.stop(); bucketed.unpersist() }
  }

  test("dedupStream: novel docs append to the index, later batches see them") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    // seed the index with one doc
    graft.ops.Dedup.saveDedupIndex(
      Seq((100L, "seed document about spark engines and scans")).toDF("doc_id", "text"),
      "text", "doc_id", idxPath)
    val results = scala.collection.mutable.Map.empty[Long, Array[(Long, Long)]]
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.dedupStream(mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
        idxPath, (df, bid) => results(bid) = df.collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))))
      .start()
    try {
      // batch 0: one copy of the seed, one novel doc
      mem.addData((1L, "seed document about spark engines and scans"),
        (2L, "a completely new crawl page with fresh words"))
      q.processAllAvailable()
      // batch 1: a copy of batch 0's NOVEL doc must now be flagged
      mem.addData((3L, "a completely new crawl page with fresh words"))
      q.processAllAvailable()
      assert(results(0).toMap == Map(1L -> 100L, 2L -> -1L))
      assert(results(1).toMap == Map(3L -> 2L))
    } finally q.stop()
  }

  test("batch ≡ stream: hllStream estimate equals batch hll_distinct after every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val batch0 = (1 to 800).map(_ => Streaming.KV("g" + rnd.nextInt(2), "v" + rnd.nextInt(300)))
    val batch1 = (1 to 800).map(_ => Streaming.KV("g" + rnd.nextInt(2), "v" + rnd.nextInt(500)))
    def batchEst(rows: Seq[Streaming.KV]): Map[String, Long] =
      rows.toDF("key", "value").groupBy("key")
        .agg(org.apache.spark.sql.functions.call_function("hll_distinct",
          org.apache.spark.sql.functions.col("value")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[Streaming.KV]
    val q = Streaming.hllStream(mem.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(batch0: _*)
      q.processAllAvailable()
      def latest(): Map[String, Long] = spark.sql("SELECT * FROM hll_stream").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last.getLong(1) }
      assert(latest() == batchEst(batch0))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      assert(latest() == batchEst(batch0 ++ batch1))
      // replay the whole of batch1 — idempotent max-merge: nothing changes
      mem.addData(batch1: _*)
      q.processAllAvailable()
      assert(latest() == batchEst(batch0 ++ batch1))
    } finally q.stop()
  }

  test("batch ≡ stream: anomalyStream flags equal TimeSeries.anomalyFlags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // two series: noise with planted spikes
    val rows = for (k <- Seq("a", "b"); i <- 0L until 300L) yield
      Streaming.MetricRow(k, i,
        if (i % 97 == 0 && i > 0) 100000L + rnd.nextInt(100)
        else 500L + rnd.nextInt(20))
    val batch = graft.ops.TimeSeries.anomalyFlags(
        rows.toDF("key", "seq", "v"), "key", Seq("seq"), "v",
        window = 20, tSigma = 3)
      .select("key", "seq", "roll_n", "flag").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(batch.values.count(_._2 == 1) > 0, "no planted spike flagged")
    val mem = MemoryStream[Streaming.MetricRow]
    val q = Streaming.anomalyStream(mem.toDS(), window = 20, tSigma = 3)
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // split mid-frame: state must carry the partial window across batches
      val (b0, b1) = rows.partition(_.seq < 150L)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM anom_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("anomalyStream window buffer survives a stop/restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anom_ckpt").toString
    val rnd = new scala.util.Random(23)
    val rows = (0L until 200L).map(i => Streaming.MetricRow("m", i,
      if (i == 150L) 99999L else 700L + rnd.nextInt(30)))
    val seen = scala.collection.mutable.Map[Long, (Int, Int)]()
    val mem = MemoryStream[Streaming.MetricRow]
    def start() = Streaming.anomalyStream(mem.toDS(), window = 20, tSigma = 3)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.AnomalyOut], _: Long) =>
        df.collect().foreach(r => seen.synchronized { seen(r.seq) = (r.roll_n, r.flag) })
      }
      .start()
    // stop mid-frame (at seq 140, inside the spike's eventual window)…
    val (b0, b1) = rows.partition(_.seq < 140L)
    val q1 = start()
    try { mem.addData(b0: _*); q1.processAllAvailable() } finally q1.stop()
    // …the buffer lives in the state store; a NEW query must resume it so
    // the spike at 150 is judged against pre-restart values too
    val q2 = start()
    try { mem.addData(b1: _*); q2.processAllAvailable() } finally q2.stop()
    val batch = graft.ops.TimeSeries.anomalyFlags(
        rows.toDF("key", "seq", "v"), "key", Seq("seq"), "v", 20, 3)
      .select("seq", "roll_n", "flag").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(batch(150L)._2 == 1, "spike must flag in batch")
    assert(seen.toMap == batch)
  }

  test("batch ≡ stream: cusumStream equals TimeSeries.cusum incl. a mid-baseline split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    // a mean shift at seq 120 on series "a"; series "b" stays flat
    val rows = for (k <- Seq("a", "b"); i <- 0L until 200L) yield
      Streaming.MetricRow(k, i,
        if (k == "a" && i >= 120L) 900L + rnd.nextInt(10)
        else 500L + rnd.nextInt(10))
    val batch = graft.ops.TimeSeries.cusum(
        rows.toDF("key", "seq", "v"), "key", Seq("seq"), "v",
        baselineN = 50, thresh = 2000L)
      .select("key", "seq", "cusum", "changed").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(batch.values.count(_._2 == 1) > 0, "shift must flag in batch")
    val mem = MemoryStream[Streaming.MetricRow]
    val q = Streaming.cusumStream(mem.toDS(), baselineN = 50, thresh = 2000L)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // first batch ends INSIDE the baseline window (seq < 30 of 50):
      // nothing may emit yet; the buffered rows must emit correctly later
      val (b0, rest) = rows.partition(_.seq < 30L)
      mem.addData(b0: _*); q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cusum_stream").head().getLong(0) == 0L,
        "no emission before the baseline completes")
      mem.addData(rest: _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM cusum_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("batch ≡ stream: tokenBudgetStream prefix cut across a mid-prefix split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = for (k <- Seq("a", "b"); i <- 0L until 100L) yield
      Streaming.MetricRow(k, i, 10L + (i % 4))
    // expected: seq-ordered window cumsum, cum <= budget (monotone prefix)
    val expected = rows.groupBy(_.key).flatMap { case (k, rs) =>
      var c = 0L
      rs.sortBy(_.seq).flatMap { r =>
        c += r.v
        if (c <= 300L) Some((k, r.seq, r.v, c)) else { c = Long.MaxValue / 2; None }
      }
    }.toSet
    val mem = MemoryStream[Streaming.MetricRow]
    val q = Streaming.tokenBudgetStream(mem.toDS(), budget = 300L)
      .writeStream.format("memory").queryName("tokbudget_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // split INSIDE the kept prefix (~30 docs of ~10 tokens fit in 300)
      val (b0, rest) = rows.partition(_.seq < 12L)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM tokbudget_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected)
      assert(got.nonEmpty && got.size < rows.size, "cut must be non-vacuous")
      // a late straggler after the budget closed must NOT emit
      mem.addData(Streaming.MetricRow("a", 500L, 1L)); q.processAllAvailable()
      val after = spark.sql("SELECT count(*) FROM tokbudget_stream").head().getLong(0)
      assert(after == got.size.toLong)
    } finally q.stop()
  }

  test("batch ≡ stream: curationStream = gopher gate + seq-order budget cut") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = (1 to 60).map(i => s"word$i").mkString(
      "the quick data of a scan and ", " ", " end.") // passes all 7 rules
    val junk = "#### #### #### ####"                  // fails symbol/stop/words
    val rows = for (s <- Seq("sa", "sb"); i <- 0L until 40L) yield
      Streaming.DocIn(s, i, if (i % 5 == 4) junk else good)
    // batch oracle: gopherRules pass + arrival-order prefix cut
    val passIds = graft.ops.Curation.gopherRules(
        rows.toDF("source", "doc_id", "text"), "text", "doc_id",
        minWords = 40, stopList = Seq("the", "a", "of", "and"))
      .where(org.apache.spark.sql.functions.col("pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nTok = rows.map(r => (r.source, r.doc_id) ->
      r.text.split("\\s+").count(_.nonEmpty).toLong).toMap
    val expected = rows.groupBy(_.source).flatMap { case (s, rs) =>
      var c = 0L
      var done = false
      rs.sortBy(_.doc_id).flatMap { r =>
        if (done || !passIds.contains(r.doc_id)) None
        else {
          val v = nTok((r.source, r.doc_id))
          if (c + v <= 2000L) { c += v; Some((s, r.doc_id, v, c)) }
          else { done = true; None }
        }
      }
    }.toSet
    assert(expected.nonEmpty && expected.size < rows.count(r => passIds(r.doc_id)),
      "both the gate and the budget must bite")
    val mem = MemoryStream[Streaming.DocIn]
    val q = Streaming.curationStream(mem.toDS(), minWords = 40, budget = 2000L,
        stopList = Seq("the", "a", "of", "and"))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      val (b0, rest) = rows.partition(_.doc_id < 13L)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM curation_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("hllStream state survives a stop/restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hll_ckpt").toString
    val rnd = new scala.util.Random(11)
    val batch0 = (1 to 600).map(_ => Streaming.KV("k" + rnd.nextInt(2), "a" + rnd.nextInt(250)))
    val batch1 = (1 to 600).map(_ => Streaming.KV("k" + rnd.nextInt(2), "b" + rnd.nextInt(250)))
    val seen = scala.collection.mutable.Map[String, Long]()
    val mem = MemoryStream[Streaming.KV]
    def start() = Streaming.hllStream(mem.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.CardEstimate], _: Long) =>
        df.collect().foreach(r => seen.synchronized { seen(r.key) = r.est })
      }
      .start()
    val q1 = start()
    try {
      mem.addData(batch0: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // the registers live in the state store now — a NEW query from the same
    // checkpoint must resume them, so batch1's estimates reflect batch0 too
    val q2 = start()
    try {
      mem.addData(batch1: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val expected = (batch0 ++ batch1).toDF("key", "value").groupBy("key")
      .agg(org.apache.spark.sql.functions.call_function("hll_distinct",
        org.apache.spark.sql.functions.col("value")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seen.toMap == expected)
  }

  test("batch ≡ stream: hllWindowStream equals windowedDistinctHll on the emitted grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = 86400L * 1000000000L
    // 2 keys, activity on days 0,1,2,5,9 (gaps!), 120 draws/day from 300
    val rnd = new scala.util.Random(13)
    val rows = (for (k <- Seq("a", "b"); d <- Seq(0L, 1L, 2L, 5L, 9L); _ <- 0 until 120)
      yield Streaming.DayKV(k, d, s"u${rnd.nextInt(300)}")) ++
      // null entities EXTEND the grid without counting (the batch grid
      // projection is null-inclusive): a's grid must stretch to day 11
      Seq(Streaming.DayKV("a", 11L, null), Streaming.DayKV("b", 3L, null))
    val batchDf = rows.toDF("key", "day", "value")
      .selectExpr("key AS k", s"day * ${ns}L AS ts", "value AS e")
    val want = graft.ops.TimeSeries.windowedDistinctHll(
        batchDf, "k", "ts", "e", windowDays = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.values.exists(_ == 0L) && want.values.exists(_ > 0L),
      "fixture needs both empty and covered windows")
    assert(want.contains(("a", 11L)) && !want.contains(("b", 11L)),
      "fixture needs a null-extended grid day")
    val mem = MemoryStream[Streaming.DayKV]
    // retention covers the full 0..9 span so the parity claim is exact
    val q = Streaming.hllWindowStream(mem.toDS(), windowDays = 3, retainDays = 16)
      .writeStream.format("memory").queryName("hllwin_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // three chunks split MID-DAY: day registers must merge across batches,
      // and the day-9 jump must back-fill the gap days' zeros
      rows.grouped(rows.size / 3 + 1).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      val got = spark.sql("SELECT * FROM hllwin_stream").collect()
        .groupBy(r => (r.getString(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.last.getLong(2) }
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("hllWindowStream: beyond-retention late rows drop; wild day jumps fail loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.DayKV]
    val results = scala.collection.mutable.Map.empty[(String, Long), Long]
    val q = Streaming.hllWindowStream(mem.toDS(), windowDays = 2, retainDays = 3)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.WinEst], _: Long) =>
        df.collect().foreach(r => results.synchronized {
          results((r.key, r.day)) = r.est })
      }.start()
    try {
      mem.addData(Streaming.DayKV("k", 10L, "a"), Streaming.DayKV("k", 10L, "b"))
      q.processAllAvailable()
      assert(results(("k", 10L)) >= 1L)
      // a row 4 days late (10 - 3 - 1 = 6 <= 10 - retain) must be DROPPED:
      // day 7's window estimate never appears, day 10's never changes
      val before = results.toMap
      mem.addData(Streaming.DayKV("k", 6L, "z"))
      q.processAllAvailable()
      assert(results.toMap == before, "beyond-retention row must not change anything")
      // an IN-retention late day below the previous min back-fills the grid
      // down to it: day 8 opens days 8 and 9 (window 9 = days {8,9} -> day 8
      // only; day 9's own window was never coverable before)
      mem.addData(Streaming.DayKV("k", 8L, "y"))
      q.processAllAvailable()
      assert(results(("k", 8L)) >= 1L && results(("k", 9L)) >= 1L,
        results.toString)
      // a null entity on an ALREADY-IN-GRID day is a no-op: registers and
      // grid both unchanged, so no estimate revision at all
      val beforeNull = results.toMap
      mem.addData(Streaming.DayKV("k", 10L, null))
      q.processAllAvailable()
      assert(results.toMap == beforeNull, "in-grid null entity must be a no-op")
      // a null entity on a NEW day extends the grid (the batch grid is
      // null-inclusive): day 11's window {10, 11} emits from day 10's
      // registers alone, with no new register state
      mem.addData(Streaming.DayKV("k", 11L, null))
      q.processAllAvailable()
      assert(results(("k", 11L)) == results(("k", 10L)), results.toString)
      // a 100k-day jump (corrupt timestamp) must kill the query loudly, not
      // grind through a 100k-window back-fill
      mem.addData(Streaming.DayKV("k", 300000L, "w"))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(ex).exists(_.contains("jumped")), chain(ex).mkString(" | "))
    } finally q.stop()
  }

  test("batch ≡ stream: trendingStream DEFAULT path (bounded retention) equals the rollup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val types = Seq("click", "view", "buy", "share", "like")
    // span ≤ default retention (2*windowDays = 14 fan-ts days): the bounded
    // DEFAULT must still be exactly batch-parity when the data fits retention
    val rows = (0 until 700).map { _ =>
      val t = types(rnd.nextInt(types.size) min rnd.nextInt(types.size))
      Streaming.TrendIn(t, Seq(0L, 1L, 2L, 4L, 5L, 6L)(rnd.nextInt(6)))
    }
    val dmax = rows.map(_.day).max
    val daily = rows.toDF("event_type", "day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val fanned = daily.select(col("event_type"), col("c"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .groupBy("day", "event_type").agg(sum("c").as("cnt7"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("cnt7").desc, col("event_type"))
    val want = fanned.where(col("day") <= dmax)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val results = scala.collection.mutable.Map.empty[(Long, Int), (String, Long)]
    val mem = MemoryStream[Streaming.TrendIn]
    val q = Streaming.trendingStream(mem.toDS()) // all defaults: retention ON
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.TrendOut], _: Long) =>
        df.collect().foreach(r => results.synchronized {
          results((r.day, r.rank)) = (r.eventType, r.cnt7) })
      }.start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      val got = results.toMap.filter(_._1._1 <= dmax)
      assert(got == want, s"default-path stream $got vs batch $want")
      // the default path IS the watermarked one: the query carries state
      // with an event-time watermark (retention armed out of the box)
      val prog = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(prog.nonEmpty && prog.last.eventTime.containsKey("watermark"),
        "default trendingStream should run with a watermark (bounded state)")
    } finally q.stop()
  }

  test("trendingStream: negative day indexes are rejected on the retention path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.TrendIn]
    val q = Streaming.trendingStream(mem.toDS()) // default = bounded
      .writeStream.outputMode(OutputMode.Update())
      .format("noop").start()
    try {
      mem.addData(Streaming.TrendIn("a", -1L))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(ex).exists(_.contains("negative day index")),
        chain(ex).mkString(" | "))
    } finally q.stop()
  }

  test("batch ≡ stream: trendingStream unbounded opt-out (retainDays=0) on a 12-day span") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val types = Seq("click", "view", "buy", "share", "like")
    // skewed type mix over 12 days with gaps, so top-3 and its ties are real
    val rows = (0 until 900).map { _ =>
      val t = types(rnd.nextInt(types.size) min rnd.nextInt(types.size))
      Streaming.TrendIn(t, Seq(0L, 1L, 2L, 3L, 6L, 7L, 11L)(rnd.nextInt(7)))
    }
    val dmax = rows.map(_.day).max
    // the q_trending batch derivation, verbatim
    val daily = rows.toDF("event_type", "day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val fanned = daily.select(col("event_type"), col("c"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .groupBy("day", "event_type").agg(sum("c").as("cnt7"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("cnt7").desc, col("event_type"))
    val want = fanned.where(col("day") <= dmax)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val results = scala.collection.mutable.Map.empty[(Long, Int), (String, Long)]
    val mem = MemoryStream[Streaming.TrendIn]
    // spans 12 event days (17 fan days) > default retention: the explicit
    // retainDays = 0 opt-out must never drop or evict anything
    val q = Streaming.trendingStream(mem.toDS(), retainDays = 0)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.TrendOut], _: Long) =>
        df.collect().foreach(r => results.synchronized {
          results((r.day, r.rank)) = (r.eventType, r.cnt7) })
      }.start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      // latest emission per (day, rank), clamped to the batch grid
      val got = results.toMap.filter(_._1._1 <= dmax)
      assert(got == want, s"stream $got vs batch $want")
      // fan-forward days beyond dmax DID emit provisional rows (the live
      // "today" view the batch clamp excludes)
      assert(results.keys.exists(_._1 > dmax))
    } finally q.stop()
  }

  test("trendingStream: retainDays evicts old window-day keys and freezes their emissions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
      val withState = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(withState.nonEmpty, "query reported no state operators")
      withState.last.stateOperators.map(_.numRowsTotal).sum
    }
    val results = scala.collection.mutable.Map.empty[(Long, Int), (String, Long)]
    val mem = MemoryStream[Streaming.TrendIn]
    val q = Streaming.trendingStream(mem.toDS(), windowDays = 2, k = 3,
        retainDays = 2)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.TrendOut], _: Long) =>
        df.collect().foreach(r => results.synchronized {
          results((r.day, r.rank)) = (r.eventType, r.cnt7) })
      }.start()
    try {
      mem.addData(Streaming.TrendIn("a", 0L), Streaming.TrendIn("a", 0L),
        Streaming.TrendIn("b", 0L), Streaming.TrendIn("a", 1L))
      q.processAllAvailable()
      // day 0: a=2 b=1; day 1: a=3 b=1; day 2 (fan-forward): a=1
      assert(results((0L, 1)) == ("a", 2L) && results((0L, 2)) == ("b", 1L))
      assert(results((1L, 1)) == ("a", 3L))
      assert(stateRows(q) == 3L) // window-day keys 0, 1, 2
      // jump 10 days ahead: watermark = maxFannedDay(11) - retainDays(2) = 9,
      // so keys 0/1/2 (timeouts at days 1/2/3) evict once the advanced
      // watermark is applied (the batch after the jump)
      mem.addData(Streaming.TrendIn("c", 10L))
      q.processAllAvailable()
      mem.addData(Streaming.TrendIn("c", 10L))
      q.processAllAvailable()
      assert(results((10L, 1)) == ("c", 2L) && results((11L, 1)) == ("c", 2L))
      assert(stateRows(q) == 2L, // only window-day keys 10, 11 survive
        s"expected old window-day keys evicted, got ${stateRows(q)} state rows")
      // a beyond-retention late event: its fanned rows (days 0/1) are below
      // the watermark and must be DROPPED — the evicted windows keep their
      // last in-retention emission instead of resurrecting with partial
      // counts (the hllWindowStream retention contract)
      mem.addData(Streaming.TrendIn("b", 0L))
      q.processAllAvailable()
      assert(results((0L, 1)) == ("a", 2L) && results((0L, 2)) == ("b", 1L))
      assert(results((1L, 1)) == ("a", 3L))
      assert(stateRows(q) == 2L)
    } finally q.stop()
  }

  test("hllWindowStream: retention horizon is intra-batch order-independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one first batch spanning MORE than retainDays, oldest rows FIRST: the
    // horizon must come from the batch's max day computed up front, so days
    // 0 and 1 drop no matter where they sit in the batch — a task retry
    // that re-reads the rows in another order must produce identical
    // state and emissions
    val mem = MemoryStream[Streaming.DayKV]
    val results = scala.collection.mutable.Map.empty[(String, Long), Long]
    val q = Streaming.hllWindowStream(mem.toDS(), windowDays = 2, retainDays = 3)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.WinEst], _: Long) =>
        df.collect().foreach(r => results.synchronized {
          results((r.key, r.day)) = r.est })
      }.start()
    try {
      mem.addData(Streaming.DayKV("k", 0L, "old"), Streaming.DayKV("k", 1L, "old2"),
        Streaming.DayKV("k", 10L, "new"))
      q.processAllAvailable()
      // horizon = 10 - 3 = 7: days 0/1 dropped BEFORE they can seed the
      // grid, so the grid is [10, 10] and the emission equals the batch
      // operator run on the surviving row alone
      val ns = 86400L * 1000000000L
      val want = graft.ops.TimeSeries.windowedDistinctHll(
          Seq(("k", 10L * ns, "new")).toDF("k", "ts", "e"), "k", "ts", "e",
          windowDays = 2)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(results.toMap == want, s"stream $results vs batch $want")
    } finally q.stop()
  }

  test("batch ≡ stream: qsketchStream registers equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(67)
    val rows = (1 to 3000).map { _ =>
      Streaming.QIn("k" + rnd.nextInt(2), 1L << rnd.nextInt(30) | rnd.nextInt(1000))
    }
    val batch = graft.ops.Sketches.qsketchRegisters(
        rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mem = MemoryStream[Streaming.QIn]
    val q = Streaming.qsketchStream(mem.toDS())
      .writeStream.format("memory").queryName("qsketch_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      val (b0, b1) = rows.splitAt(1100)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      // counts per (key, bin) only grow → max over emissions = final state
      val got = spark.sql(
          "SELECT key, bin, max(cnt) FROM qsketch_stream GROUP BY key, bin")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("batch ≡ stream: scd2Stream equals Warehouse.scd2 on closed versions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    // 3 keys × 120 rows; states repeat in runs so versions collapse
    val rows = for (k <- 1L to 3L; i <- 0L until 120L) yield
      Streaming.Scd2In(k, ts = i * 10L, id = k * 1000L + i,
        st = if (rnd.nextInt(4) == 0) null else "s" + rnd.nextInt(3))
    val batchClosed = graft.ops.Warehouse.scd2(
        rows.toDF("key", "ts", "id", "st"), "key", "ts", "id", Seq("st"))
      .where("valid_to IS NOT NULL")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(batchClosed.size > 10, "need a non-trivial version history")
    val mem = MemoryStream[Streaming.Scd2In]
    val q = Streaming.scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // split MID-VERSION: a version opened in batch 0 must close in batch 1
      val (b0, rest) = rows.partition(_.ts < 370L)
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM scd2_stream").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(got == batchClosed)
    } finally q.stop()
  }
}
