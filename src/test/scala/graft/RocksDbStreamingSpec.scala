package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/**
 * The Streaming.scala header tells deployments to switch the state store to
 * RocksDB at scale. This spec turns that advice into TESTED behavior: EVERY
 * state-store-backed twin in `Streaming.scala` runs under
 * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
 * (shipped with Spark 4 — rocksdbjni is on the classpath, no new
 * dependency), must produce the SAME results as its batch operator, and
 * the per-query progress metrics must prove RocksDB actually held the state
 * (rocksdb custom metrics present, state row counts exact or tightly
 * bounded).
 *
 * Covered: semantic-dedup, HLL, HLL sliding window, trending top-k, SCD2,
 * retracting aggregate, windowed count, sessionize (both variants), as-of
 * join, range join, anomaly, CUSUM, token-budget, curation, qsketch. NOT here: `annJoinStream` and
 * `dedupStream` — their state is external (a persisted parquet index /
 * cached corpus driven through foreachBatch), so no state store is involved
 * regardless of provider.
 */
class RocksDbStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB provider set, restoring the prior value. */
  private def withRocksDb[T](body: => T): T = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksProvider)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  /** The last progress with state operators, proving the RocksDB provider
    * engaged (its custom metrics are provider-specific) and returning the
    * total state rows for boundedness asserts. */
  private def rocksStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
    val withState = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(withState.nonEmpty, "query reported no state operators")
    val ops = withState.last.stateOperators
    import scala.jdk.CollectionConverters._
    assert(ops.exists(_.customMetrics.asScala.keys.exists(_.startsWith("rocksdb"))),
      s"no rocksdb custom metrics — provider did not engage: " +
        ops.map(_.customMetrics.asScala.keys.mkString(",")).mkString(" | "))
    ops.map(_.numRowsTotal).sum
  }

  test("rocksdb: streamSemanticDedup equals batch semanticDedup, state rows exact") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
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

    withRocksDb {
      val mem = MemoryStream[Streaming.StreamVec]
      val q = Streaming.streamSemanticDedup(mem.toDS(), nPlanes = 6, tau = 0.99)
        .writeStream.format("memory").queryName("rocks_semdedup")
        .outputMode("append").start()
      try {
        mem.addData(all.filter(_.vec_id < 100L): _*); q.processAllAvailable()
        mem.addData(all.filter(_.vec_id >= 100L): _*); q.processAllAvailable()
        val got = spark.table("rocks_semdedup")
          .as[Streaming.SemDedupResult].collect()
          .map(r => (r.vec_id, r.dup_of.getOrElse(-1L))).toSet
        assert(got == want, s"rocksdb stream $got vs batch $want")
        // one state row per LSH cell (flatMapGroupsWithState key), and every
        // cell seen must be retained: bounded by the 52 vectors, at least 1
        val rows = rocksStateRows(q)
        assert(rows >= 1L && rows <= 52L, s"state rows $rows out of [1, 52]")
      } finally q.stop()
    }
  }

  test("rocksdb: hllStream estimates equal batch hll_distinct after every prefix") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def batchEst(rows: Seq[Streaming.KV]): Map[String, Long] =
      rows.toDF("key", "value").groupBy("key")
        .agg(org.apache.spark.sql.functions.call_function("hll_distinct",
          org.apache.spark.sql.functions.col("value")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch0 = (0 until 500).map(i => Streaming.KV("a", s"u${i % 97}")) ++
      (0 until 300).map(i => Streaming.KV("b", s"v$i"))
    val batch1 = (0 until 400).map(i => Streaming.KV("a", s"u${i % 211}")) ++
      (0 until 100).map(i => Streaming.KV("b", s"v${i + 250}"))
    withRocksDb {
      val mem = MemoryStream[Streaming.KV]
      val q = Streaming.hllStream(mem.toDS())
        .writeStream.format("memory").queryName("rocks_hll")
        .outputMode("update").start()
      try {
        def latest(): Map[String, Long] = spark.sql("SELECT * FROM rocks_hll").collect()
          .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last.getLong(1) }
        mem.addData(batch0: _*)
        q.processAllAvailable()
        assert(latest() == batchEst(batch0))
        mem.addData(batch1: _*)
        q.processAllAvailable()
        assert(latest() == batchEst(batch0 ++ batch1))
        // exactly one state row per key (the HLL register blob)
        assert(rocksStateRows(q) == 2L)
      } finally q.stop()
    }
  }

  test("rocksdb: retractingSum revises per-key results, one state row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Streaming.OpRow
    withRocksDb {
      val mem = MemoryStream[OpRow]
      val q = Streaming.retractingSum(mem.toDS(), new graft.functions.SumAgg)
        .writeStream.format("memory").queryName("rocks_retract")
        .outputMode("update").start()
      try {
        mem.addData(OpRow("a", op = false, 5), OpRow("a", op = false, 7),
          OpRow("b", op = false, 1))
        q.processAllAvailable()
        mem.addData(OpRow("a", op = true, 5)) // CDC retraction revises "a"
        q.processAllAvailable()
        val res = spark.sql("SELECT key, result FROM rocks_retract").collect()
          .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last.getLong(1) }
        assert(res == Map("a" -> 7L, "b" -> 1L))
        assert(rocksStateRows(q) == 2L) // one accumulator per key
      } finally q.stop()
    }
  }

  test("rocksdb: windowedCount holds one state row per open (window, type) group") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
      val q = Streaming.windowedCount(
          mem.toDF().toDF("ts", "event_type", "value"), "ts", "5 minutes", "10 minutes")
        .writeStream.format("memory").queryName("rocks_wincount")
        .outputMode("update").start()
      try {
        def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
        mem.addData((t(1), "click", 1.0), (t(2), "click", 2.0), (t(7), "view", 3.0))
        q.processAllAvailable()
        mem.addData((t(12), "click", 4.0))
        q.processAllAvailable()
        val latest = spark.sql(
            "SELECT unix_millis(window.start) AS ws, event_type, cnt, total FROM rocks_wincount")
          .collect().groupBy(r => (r.getLong(0), r.getString(1)))
          .map { case (k, rs) => k -> ((rs.last.getLong(2), rs.last.getDouble(3))) }
        val w0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
        val w1 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00").getTime
        assert(latest == Map((w0, "click") -> ((2L, 3.0)), (w0, "view") -> ((1L, 3.0)),
          (w1, "click") -> ((1L, 4.0))))
        // watermark (10:07) has not passed any window end yet: all 3 groups live
        assert(rocksStateRows(q) == 3L)
      } finally q.stop()
    }
  }

  test("rocksdb: sessionize closes on gap, one state row per user with an open session") {
    import spark.implicits._
    import Streaming.SessEvent
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000L
    withRocksDb {
      val mem = MemoryStream[SessEvent]
      val q = Streaming.sessionize(mem.toDS(), gap)
        .writeStream.format("memory").queryName("rocks_sessions")
        .outputMode("append").start()
      try {
        mem.addData(SessEvent(1L, 1L, 1000L), SessEvent(1L, 2L, 2000L),
          SessEvent(2L, 3L, 500L))
        q.processAllAvailable()
        mem.addData(SessEvent(1L, 4L, 2000L + gap + 1)) // closes user 1's first session
        q.processAllAvailable()
        val closed = spark.sql(
            "SELECT user_id, session_id, start_ms, end_ms, n_events FROM rocks_sessions")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(closed == Set((1L, 1L, 1000L, 2000L, 2L)))
        assert(rocksStateRows(q) == 2L) // users 1 and 2 both hold an open session
      } finally q.stop()
    }
  }

  test("rocksdb: sessionizeEventTime timeout-flushes idle users and removes their state") {
    import spark.implicits._
    import Streaming.SessEvent
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[SessEvent]
      val q = Streaming.sessionizeEventTime(mem.toDS(), gapMs = 1000L)
        .writeStream.format("memory").queryName("rocks_et_sessions")
        .outputMode("append").start()
      try {
        mem.addData(SessEvent(1L, 1L, 1000L), SessEvent(1L, 2L, 2000L),
          SessEvent(99L, 3L, 500L))
        q.processAllAvailable()
        mem.addData(SessEvent(99L, 4L, 100000L)) // watermark jumps past user 1's deadline
        q.processAllAvailable()
        mem.addData(SessEvent(99L, 5L, 100001L)) // timeout fires on the following batch
        q.processAllAvailable()
        val closed = spark.sql(
            "SELECT user_id, session_id, start_ms, end_ms, n_events FROM rocks_et_sessions")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(closed.contains((1L, 1L, 1000L, 2000L, 2L)), closed.toString)
        assert(closed.contains((99L, 1L, 500L, 500L, 1L)), closed.toString)
        // user 1's state was REMOVED by the timeout flush: only user 99 remains
        assert(rocksStateRows(q) == 1L)
      } finally q.stop()
    }
  }

  test("rocksdb: asofJoin emits watermark-final matches, per-key buffers bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    withRocksDb {
      val quotes = MemoryStream[(Long, Long, Double)]
      val trades = MemoryStream[(Long, Long, Long)]
      val ql = quotes.toDF().toDF("key", "t_sec", "v")
        .selectExpr("key", "t_sec * 1000 AS t_ms", "v", "timestamp_seconds(t_sec) AS ts")
        .withWatermark("ts", "5 seconds")
      val tr = trades.toDF().toDF("key", "t_sec", "q")
        .selectExpr("key", "t_sec * 1000 AS t_ms", "q", "timestamp_seconds(t_sec) AS ts")
        .withWatermark("ts", "5 seconds")
      val query = Streaming.asofJoin(ql, tr)
        .writeStream.format("memory").queryName("rocks_asof")
        .outputMode("append").start()
      try {
        quotes.addData((1L, 1000L, 10.0), (1L, 1004L, 11.0), (2L, 1001L, 20.0))
        trades.addData((1L, 1002L, 5L), (1L, 1005L, 7L), (2L, 1000L, 3L))
        query.processAllAvailable()
        quotes.addData((9L, 1100L, 0.0)); trades.addData((9L, 1100L, 0L))
        query.processAllAvailable()
        quotes.addData((9L, 1200L, 0.0)); trades.addData((9L, 1200L, 0L))
        query.processAllAvailable()
        val rows = spark.sql(
            "SELECT key, t_ms, q, left_t, v FROM rocks_asof WHERE key < 9").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.getDouble(4).isNaN) None else Some(r.getDouble(4)))).toSet
        assert(rows == Set(
          (1L, 1002000L, 5L, 1000000L, Some(10.0)),
          (1L, 1005000L, 7L, 1004000L, Some(11.0)),
          (2L, 1000000L, 3L, -1L, None)))
        // keys retain only their newest watermark-covered lefts: at most one
        // state row per key seen (1, 2, 9), at least one (key 9 is active)
        val stateRows = rocksStateRows(query)
        assert(stateRows >= 1L && stateRows <= 3L, s"state rows $stateRows out of [1, 3]")
      } finally query.stop()
    }
  }

  test("rocksdb: streamRangeJoin equals the batch bucketed range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val W = 3600000L
    val base = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val pointRows = Seq(
      (1L, 101L, base + 10000L), (1L, 102L, base + W),
      (1L, 103L, base - 5000L), (1L, 104L, base + W + 1L),
      (2L, 201L, base), (3L, 301L, base + 1000L))
    val intervalRows = Seq((1L, 901L, base), (2L, 902L, base))
    val bp = pointRows.toDF("user_id", "event_id", "t_ms")
    val bi = intervalRows.toDF("p_user", "purchase_id", "lo").selectExpr("*", s"lo + $W AS hi")
    val want = graft.plans.RangeJoin.bucketedRangeJoin(
        bp, bi, "user_id", "p_user", "t_ms", "lo", "hi", bucketWidth = W)
      .select("event_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(want == Set((101L, 901L), (102L, 901L), (201L, 902L)))
    withRocksDb {
      val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val iMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val joined = Streaming.streamRangeJoin(
        pMem.toDF().toDF("user_id", "event_id", "ts"),
        iMem.toDF().toDF("p_user", "purchase_id", "lo_ts"),
        "user_id", "p_user", "ts", "lo_ts", window = "1 hour", watermark = "10 minutes")
      val q = joined.select("event_id", "purchase_id").writeStream.format("memory")
        .queryName("rocks_range_join").outputMode("append").start()
      try {
        pMem.addData(pointRows.map { case (u, e, t) => (u, e, ts(t)) }: _*)
        iMem.addData(intervalRows.map { case (u, p, l) => (u, p, ts(l)) }: _*)
        q.processAllAvailable()
        val got = spark.table("rocks_range_join").as[(Long, Long)].collect().toSet
        assert(got == want, s"rocksdb stream $got vs batch $want")
        // stream-stream join state: both sides' rows buffered within the
        // watermark horizon (nothing evicted yet) — bounded by the inputs
        val rows = rocksStateRows(q)
        assert(rows >= 1L && rows <= 2L * (pointRows.size + intervalRows.size).toLong,
          s"state rows $rows out of bounds")
      } finally q.stop()
    }
  }

  test("rocksdb: anomalyStream equals batch anomalyFlags, one state row per series") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val rows = for (k <- Seq("a", "b"); i <- 0L until 60L) yield
      Streaming.MetricRow(k, i,
        if (i == 45L) 100000L + rnd.nextInt(100) else 500L + rnd.nextInt(20))
    // window 20: a lone spike needs n-1 > tSigma² to clear its own
    // variance inflation (at window 10 it sits exactly on the boundary)
    val batch = graft.ops.TimeSeries.anomalyFlags(
        rows.toDF("key", "seq", "v"), "key", Seq("seq"), "v", window = 20, tSigma = 3)
      .select("key", "seq", "roll_n", "flag").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(batch.values.count(_._2 == 1) > 0, "no planted spike flagged")
    withRocksDb {
      val mem = MemoryStream[Streaming.MetricRow]
      val q = Streaming.anomalyStream(mem.toDS(), window = 20, tSigma = 3)
        .writeStream.format("memory").queryName("rocks_anom")
        .outputMode("update").start()
      try {
        val (b0, b1) = rows.partition(_.seq < 30L) // split mid-frame
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(b1: _*); q.processAllAvailable()
        val got = spark.sql("SELECT * FROM rocks_anom").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
        assert(got == batch)
        assert(rocksStateRows(q) == 2L) // one rolling buffer per series key
      } finally q.stop()
    }
  }

  test("rocksdb: cusumStream equals batch cusum, one state row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(43)
    val rows = for (k <- Seq("a", "b"); i <- 0L until 80L) yield
      Streaming.MetricRow(k, i,
        if (k == "a" && i >= 50L) 900L + rnd.nextInt(10) else 500L + rnd.nextInt(10))
    val batch = graft.ops.TimeSeries.cusum(
        rows.toDF("key", "seq", "v"), "key", Seq("seq"), "v",
        baselineN = 20, thresh = 1000L)
      .select("key", "seq", "cusum", "changed").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(batch.values.count(_._2 == 1) > 0, "shift must flag in batch")
    withRocksDb {
      val mem = MemoryStream[Streaming.MetricRow]
      val q = Streaming.cusumStream(mem.toDS(), baselineN = 20, thresh = 1000L)
        .writeStream.format("memory").queryName("rocks_cusum")
        .outputMode("update").start()
      try {
        val (b0, rest) = rows.partition(_.seq < 10L) // split inside the baseline
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(rest: _*); q.processAllAvailable()
        val got = spark.sql("SELECT * FROM rocks_cusum").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
        assert(got == batch)
        assert(rocksStateRows(q) == 2L)
      } finally q.stop()
    }
  }

  test("rocksdb: tokenBudgetStream prefix cut, one state row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = for (k <- Seq("a", "b"); i <- 0L until 40L) yield
      Streaming.MetricRow(k, i, 10L + (i % 4))
    val expected = rows.groupBy(_.key).flatMap { case (k, rs) =>
      var c = 0L
      rs.sortBy(_.seq).flatMap { r =>
        c += r.v
        if (c <= 200L) Some((k, r.seq, r.v, c)) else { c = Long.MaxValue / 2; None }
      }
    }.toSet
    withRocksDb {
      val mem = MemoryStream[Streaming.MetricRow]
      val q = Streaming.tokenBudgetStream(mem.toDS(), budget = 200L)
        .writeStream.format("memory").queryName("rocks_tokbudget")
        .outputMode("update").start()
      try {
        val (b0, rest) = rows.partition(_.seq < 8L) // split inside the kept prefix
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(rest: _*); q.processAllAvailable()
        val got = spark.sql("SELECT * FROM rocks_tokbudget").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got == expected)
        assert(got.nonEmpty && got.size < rows.size, "cut must be non-vacuous")
        assert(rocksStateRows(q) == 2L)
      } finally q.stop()
    }
  }

  test("rocksdb: curationStream = gopher gate + budget cut, one state row per source") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = (1 to 60).map(i => s"word$i").mkString(
      "the quick data of a scan and ", " ", " end.")
    val junk = "#### #### #### ####"
    val rows = for (s <- Seq("sa", "sb"); i <- 0L until 20L) yield
      Streaming.DocIn(s, i, if (i % 5 == 4) junk else good)
    val passIds = graft.ops.Curation.gopherRules(
        rows.toDF("source", "doc_id", "text"), "text", "doc_id",
        minWords = 40, stopList = Seq("the", "a", "of", "and"))
      .where(org.apache.spark.sql.functions.col("pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nTok = rows.map(r => (r.source, r.doc_id) ->
      r.text.split("\\s+").count(_.nonEmpty).toLong).toMap
    val expected = rows.groupBy(_.source).flatMap { case (s, rs) =>
      var c = 0L; var done = false
      rs.sortBy(_.doc_id).flatMap { r =>
        if (done || !passIds.contains(r.doc_id)) None
        else {
          val v = nTok((r.source, r.doc_id))
          if (c + v <= 600L) { c += v; Some((s, r.doc_id, v, c)) }
          else { done = true; None }
        }
      }
    }.toSet
    assert(expected.nonEmpty && expected.size < rows.count(r => passIds(r.doc_id)),
      "both the gate and the budget must bite")
    withRocksDb {
      val mem = MemoryStream[Streaming.DocIn]
      val q = Streaming.curationStream(mem.toDS(), minWords = 40, budget = 600L,
          stopList = Seq("the", "a", "of", "and"))
        .writeStream.format("memory").queryName("rocks_curation")
        .outputMode("update").start()
      try {
        val (b0, rest) = rows.partition(_.doc_id < 5L)
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(rest: _*); q.processAllAvailable()
        val got = spark.sql("SELECT * FROM rocks_curation").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got == expected)
        assert(rocksStateRows(q) == 2L)
      } finally q.stop()
    }
  }

  test("rocksdb: qsketchStream registers equal the batch sketch, one state row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(71)
    val rows = (1 to 600).map { _ =>
      Streaming.QIn("k" + rnd.nextInt(2), 1L << rnd.nextInt(24) | rnd.nextInt(500))
    }
    val batch = graft.ops.Sketches.qsketchRegisters(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    withRocksDb {
      val mem = MemoryStream[Streaming.QIn]
      val q = Streaming.qsketchStream(mem.toDS())
        .writeStream.format("memory").queryName("rocks_qsketch")
        .outputMode("update").start()
      try {
        val (b0, b1) = rows.splitAt(250)
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(b1: _*); q.processAllAvailable()
        val got = spark.sql(
            "SELECT key, bin, max(cnt) FROM rocks_qsketch GROUP BY key, bin")
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == batch)
        assert(rocksStateRows(q) == 2L) // one register map per key
      } finally q.stop()
    }
  }

  test("rocksdb: hllWindowStream equals the batch HLL windowed distinct, one state row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = 86400L * 1000000000L
    val rnd = new scala.util.Random(17)
    val rows = for (k <- Seq("a", "b"); d <- 0L until 5L; _ <- 0 until 80)
      yield Streaming.DayKV(k, d, s"v${rnd.nextInt(200)}")
    val want = graft.ops.TimeSeries.windowedDistinctHll(
        rows.toDF("key", "day", "value")
          .selectExpr("key AS k", s"day * ${ns}L AS ts", "value AS e"),
        "k", "ts", "e", windowDays = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    withRocksDb {
      val mem = MemoryStream[Streaming.DayKV]
      val q = Streaming.hllWindowStream(mem.toDS(), windowDays = 3)
        .writeStream.format("memory").queryName("rocks_hllwin")
        .outputMode("update").start()
      try {
        val (b0, b1) = rows.splitAt(rows.size / 2) // splits mid-day
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(b1: _*); q.processAllAvailable()
        val got = spark.sql("SELECT * FROM rocks_hllwin").collect()
          .groupBy(r => (r.getString(0), r.getLong(1)))
          .map { case (k, rs) => k -> rs.last.getLong(2) }
        assert(got == want, s"rocksdb stream $got vs batch $want")
        assert(rocksStateRows(q) == 2L) // one day-register map per key
      } finally q.stop()
    }
  }

  test("rocksdb: trendingStream equals the batch rollup, one state row per window-day") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val types = Seq("click", "view", "buy", "share")
    val rows = (0 until 400).map { _ =>
      Streaming.TrendIn(types(rnd.nextInt(types.size)), rnd.nextInt(5).toLong)
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
    // live window-day keys: every day any event fans into
    val liveKeys = rows.flatMap(r => r.day until r.day + 7).distinct.size
    withRocksDb {
      val results = scala.collection.mutable.Map.empty[(Long, Int), (String, Long)]
      val mem = MemoryStream[Streaming.TrendIn]
      val q = Streaming.trendingStream(mem.toDS())
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.TrendOut], _: Long) =>
          df.collect().foreach(r => results.synchronized {
            results((r.day, r.rank)) = (r.eventType, r.cnt7) })
        }.start()
      try {
        val (b0, b1) = rows.splitAt(rows.size / 2)
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(b1: _*); q.processAllAvailable()
        val got = results.toMap.filter(_._1._1 <= dmax)
        assert(got == want, s"rocksdb stream $got vs batch $want")
        assert(rocksStateRows(q) == liveKeys.toLong)
      } finally q.stop()
    }
  }

  test("rocksdb: scd2Stream equals batch Warehouse.scd2 on closed versions") {
    Graft.install(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Streaming.Scd2In(1L, 10L, 100L, "a"), Streaming.Scd2In(1L, 20L, 101L, "b"),
      Streaming.Scd2In(1L, 30L, 102L, "c"), Streaming.Scd2In(2L, 10L, 103L, "x"),
      Streaming.Scd2In(2L, 40L, 104L, "y"), Streaming.Scd2In(3L, 15L, 105L, "q"))
    val batch = graft.ops.Warehouse.scd2(
        events.toDF("key", "ts", "id", "st"), "key", "ts", "id", Seq("st"))
      .where("valid_to IS NOT NULL")
      .selectExpr("key", "st", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    withRocksDb {
      val mem = MemoryStream[Streaming.Scd2In]
      val q = Streaming.scd2Stream(mem.toDS())
        .writeStream.format("memory").queryName("rocks_scd2")
        .outputMode("update").start()
      try {
        // two micro-batches split mid-key to force state carry-over
        mem.addData(events.take(3): _*); q.processAllAvailable()
        mem.addData(events.drop(3): _*); q.processAllAvailable()
        val got = spark.table("rocks_scd2").as[Streaming.Scd2Out].collect()
          .map(o => (o.key, o.st, o.valid_from, o.valid_to)).toSet
        assert(got == batch, s"rocksdb stream $got vs batch $batch")
        // one open-version state row per key
        assert(rocksStateRows(q) == 3L)
      } finally q.stop()
    }
  }
}
