package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/**
 * The Streaming.scala header tells deployments to switch the state store to
 * RocksDB at scale. This spec turns that advice into TESTED behavior: the
 * stateful streaming twins run under
 * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
 * (shipped with Spark 4 — rocksdbjni is on the classpath, no new
 * dependency), must produce the SAME results as their batch operators, and
 * the per-query progress metrics must prove RocksDB actually held the state
 * (rocksdb custom metrics present, state row counts exact).
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
