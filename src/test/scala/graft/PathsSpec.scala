package graft

import graft.ops.{Funnel, Profile, TimeSeries}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def eventsDf(rows: Seq[(Long, String, Long, Long)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("tp", StringType, nullable = false),
      StructField("t", LongType, nullable = false),
      StructField("i", LongType, nullable = false)))
    spark.createDataFrame(
      rows.map { case (u, tp, t, i) => Row(u, tp, t, i) }.asJava, schema)
  }

  test("topPaths counts in-session trigrams only, never across a gap") {
    val gap = 100L
    val rows = Seq(
      // user 1, session A: a b c d  → a>b>c, b>c>d
      (1L, "a", 0L, 1L), (1L, "b", 10L, 2L), (1L, "c", 20L, 3L), (1L, "d", 30L, 4L),
      // gap > 100 → session B: a b c → a>b>c
      (1L, "a", 500L, 5L), (1L, "b", 510L, 6L), (1L, "c", 520L, 7L),
      // user 2: only two events — no trigram
      (2L, "a", 0L, 8L), (2L, "b", 10L, 9L))
    val got = Funnel.topPaths(eventsDf(rows), "u", "tp", "t", "i", gap, n = 3, k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("a>b>c" -> 2L, "b>c>d" -> 1L))
  }

  test("cusum flags a mean shift and scales by the baseline count") {
    // baseline 4 rows of 10, then a shift to 20: cusum grows 40/row after
    val rows = (0L until 4L).map(i => (1L, "x", i, i)) ++
      (4L until 10L).map(i => (1L, "x", i, i))
    val df = eventsDf(rows.map { case (u, tp, t, i) => (u, tp, t, i) })
      .withColumn("v", org.apache.spark.sql.functions.expr(
        "CASE WHEN t < 4 THEN 10 ELSE 20 END"))
    val out = TimeSeries.cusum(df, "u", Seq("t"), "v", baselineN = 4, thresh = 20L)
      .select("t", "cusum", "changed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    // n0=4, s0=40: rows 0..3 deviation 0; rows 4.. add 4*20-40 = 40 each
    assert(out.map(_._2).toSeq == Seq(0L, 0L, 0L, 0L, 40L, 80L, 120L, 160L, 200L, 240L))
    // thresh*n0 = 80: changed once |cusum| > 80
    assert(out.map(_._3).toSeq == Seq(0, 0, 0, 0, 0, 0, 1, 1, 1, 1))
  }

  test("runLength emits one row per maximal run with start rank and length") {
    val rows = Seq(
      (1L, "a", 0L, 1L), (1L, "a", 1L, 2L), (1L, "b", 2L, 3L),
      (1L, "a", 3L, 4L), (2L, "c", 0L, 5L))
    val got = TimeSeries.runLength(eventsDf(rows), "u", Seq("t", "i"), "tp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3))
    assert(got.toSeq == Seq((1L, "a", 1L, 2L), (1L, "b", 3L, 1L),
      (1L, "a", 4L, 1L), (2L, "c", 1L, 1L)))
  }

  test("timeWeighted: step-interpolated area and span, last sample no area") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("t", LongType, nullable = false),
      StructField("i", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val rows = Seq(Row("a", 0L, 1L, 10L), Row("a", 5L, 2L, 20L), Row("a", 8L, 3L, 1L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = TimeSeries.timeWeighted(df, "k", "t", "i", "v").collect().head
    // 10·(5−0) + 20·(8−5) + 0 = 110 over span 8
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((3L, 110L, 8L)))
  }

  test("intervalCoverage merges overlaps and touching intervals") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false)))
    val rows = Seq(
      Row("a", 0L, 10L), Row("a", 5L, 15L),   // overlap → [0,15)
      Row("a", 15L, 18L),                     // touching → still island 1
      Row("a", 20L, 30L),                     // gap → island 2
      Row("b", 1L, 2L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = TimeSeries.intervalCoverage(df, "k", "s", "e")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((28L, 2L)), "b" -> ((1L, 1L))))
  }

  test("rollingExtrema tile trick equals the naive bounded frame (random)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    for (w <- Seq(2, 3, 7, 16)) {
      val df = spark.range(500).selectExpr("CAST(id % 3 AS STRING) AS k",
        "id AS i", "pmod(hash(id), 1000) AS v")
      val naiveW = Window.partitionBy("k").orderBy("i").rowsBetween(-(w - 1), 0)
      val naive = df
        .withColumn("nmax", max(col("v")).over(naiveW))
        .withColumn("nmin", min(col("v")).over(naiveW))
      val got = graft.ops.TimeSeries.rollingExtrema(naive, "k", Seq("i"), "v", w)
      assert(got.where(col("roll_max") =!= col("nmax") ||
        col("roll_min") =!= col("nmin")).count() == 0, s"w=$w")
    }
  }

  test("dedupBursts keeps the first event of each chained burst") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("i", LongType, nullable = false)))
    // gaps: 5, 5, 100, 5 with delta 10 → burst {0,5,10}, {110,115}
    val rows = Seq(Row(1L, 0L, 1L), Row(1L, 5L, 2L), Row(1L, 10L, 3L),
      Row(1L, 110L, 4L), Row(1L, 115L, 5L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val kept = graft.ops.TimeSeries.dedupBursts(df, Seq("u"), Seq("ts", "i"),
        "ts", deltaNs = 10L)
      .collect().map(_.getLong(2)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("windowedDistinct: trailing-window exact distincts incl. gap days") {
    import org.apache.spark.sql.types._
    val ns = 86400L * 1000000000L
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("e", LongType, nullable = false)))
    // key a: entity 1 on day 0, entities 1,2 on day 3, span 0..3
    val rows = Seq(Row("a", 0L * ns, 1L), Row("a", 3L * ns, 1L),
      Row("a", 3L * ns + 5L, 2L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = graft.ops.TimeSeries.windowedDistinct(df, "k", "ts", "e", 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // day0: {1}; day1,2: window covers day0 ({1}); day3: {1,2}
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("windowedDistinct: activity gap wider than the window reports nd=0") {
    import org.apache.spark.sql.types._
    val ns = 86400L * 1000000000L
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("e", LongType, nullable = false)))
    // activity on day 0 and day 5 only; window 2 (trailing days d-1..d)
    val rows = Seq(Row("b", 0L * ns, 7L), Row("b", 5L * ns, 8L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = graft.ops.TimeSeries.windowedDistinct(df, "k", "ts", "e", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // days 2..4 have an EMPTY trailing window — they must appear with 0
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 1L))
  }

  test("windowedDistinct: island reformulation equals brute force (dups, null entities)") {
    import org.apache.spark.sql.types._
    val ns = 86400L * 1000000000L
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("e", LongType, nullable = true)))
    // deterministic scatter: duplicate (k, e, day) events, entities active on
    // merged AND disjoint island patterns, plus null-entity-only days (must
    // stay in-grid at nd = 0) — the edge set of the r15 island rewrite
    val rows = (for (i <- 0 until 200) yield {
      val k = "k" + (i % 2)
      val day = (i * 7919) % 23          // days 0..22, repeats
      val ent: java.lang.Long =
        if (i % 13 == 0) null else java.lang.Long.valueOf((i * 31) % 5)
      Row(k, day * ns + (i % 3), ent)
    }).toSeq
    val df = spark.createDataFrame(rows.asJava, schema)
    val w = 4
    val got = graft.ops.TimeSeries.windowedDistinct(df, "k", "ts", "e", w)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: per key, every day in [min, max], count distinct non-null
    // entities active in (day-w, day]
    val byKey = rows.groupBy(_.getString(0))
    val want = byKey.flatMap { case (k, rs) =>
      val days = rs.map(r => r.getLong(1) / ns)
      (days.min to days.max).map { d =>
        val nd = rs.filter { r =>
          val rd = r.getLong(1) / ns
          rd > d - w && rd <= d && !r.isNullAt(2)
        }.map(_.getLong(2)).distinct.size
        (k, d) -> nd.toLong
      }
    }
    assert(got == want)
  }

  test("windowedDistinctHll: window estimates equal the merged register-file estimator") {
    import org.apache.spark.sql.functions.col
    val ns = 86400L * 1000000000L
    // 300 entities on day 0, 200 NEW entities on day 1 (500 distinct total)
    val df = spark.range(500).selectExpr("'a' AS k",
      s"CASE WHEN id < 300 THEN 0 ELSE ${ns}L END AS ts", "id AS e")
    val got = graft.ops.TimeSeries.windowedDistinctHll(df, "k", "ts", "e",
        windowDays = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // the day-0 window holds exactly day 0's entities: its estimate must
    // EQUAL hllEstimateRaw over that register file (same hash, same p)
    val reg0 = graft.ops.Sketches.collectRegisters(
      graft.ops.Sketches.hllRegisters(spark.range(300).toDF("v"), col("v"), 9), 9)
    assert(got(0L) == graft.ops.Sketches.hllEstimateRaw(reg0))
    // the day-1 window merges day 0 + day 1: estimate == the UNION register
    // file's — HLL mergeability through the window fan-out
    val regAll = graft.ops.Sketches.collectRegisters(
      graft.ops.Sketches.hllRegisters(spark.range(500).toDF("v"), col("v"), 9), 9)
    assert(got(1L) == graft.ops.Sketches.hllEstimateRaw(regAll))
    assert(got.keySet == Set(0L, 1L))
  }

  test("windowedDistinctHll: gap days report 0; corrected mode tracks small truths") {
    import org.apache.spark.sql.types._
    val ns = 86400L * 1000000000L
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("e", LongType, nullable = false)))
    val rows = Seq(Row("b", 0L * ns, 7L), Row("b", 5L * ns, 8L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = graft.ops.TimeSeries.windowedDistinctHll(df, "k", "ts", "e",
        windowDays = 2, corrected = true)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // same day grid as the exact operator; empty trailing windows are 0, and
    // linear counting makes the single-entity days estimate ~1 (the RAW
    // estimator would report ~370 here — the documented small-range bias)
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(got(2L) == 0L && got(3L) == 0L && got(4L) == 0L)
    assert(got(0L) == 1L && got(1L) == 1L && got(5L) == 1L)
  }

  test("winsorize clips to the group's discrete percentile bounds") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val vals = (1L to 100L).map(v => Row("a", v))
    val df = spark.createDataFrame(vals.asJava, schema)
    val got = graft.ops.Profile.winsorize(df, "g", "v", pLo = 10, pHi = 90)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 10L && got(5L) == 10L && got(10L) == 10L)
    assert(got(50L) == 50L)
    assert(got(90L) == 90L && got(95L) == 90L && got(100L) == 90L)
  }

  test("groupPercentilesCont interpolates exactly (×100 integers)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame((1L to 100L).map(v => Row("a", v)).asJava, schema)
    val r = graft.ops.Profile.groupPercentilesCont(df, "g", "v", Seq(0, 25, 50, 100))
      .collect().head
    // ranks over 1..100: p25 → 25.75, p50 → 50.5, endpoints exact
    assert(r.getLong(1) == 100L)    // p0  = 1.00
    assert(r.getLong(2) == 2575L)   // p25 = 25.75
    assert(r.getLong(3) == 5050L)   // p50 = 50.50
    assert(r.getLong(4) == 10000L)  // p100 = 100.00
  }

  test("groupWeightedPercentilesDisc ≡ percentile over the weight expansion") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("w", LongType, nullable = false)))
    // v = 1..10 with weight v: W = 55, p50 target 28 → v=7; p90 → v=10
    val rows = (1L to 10L).map(v => Row("a", v, v))
    val df = spark.createDataFrame(rows.asJava, schema)
    val r = graft.ops.Profile.groupWeightedPercentilesDisc(df, "g", "v", "w",
      Seq(50, 90)).collect().head
    assert(r.getLong(1) == 7L && r.getLong(2) == 10L)
    // equivalence on random data: expanding each row w times and taking the
    // plain discrete percentile must agree
    val rnd = new scala.util.Random(7)
    val rand = (1 to 200).map(_ => Row("b", rnd.nextInt(50).toLong,
      rnd.nextInt(4) + 1L))
    val rdf = spark.createDataFrame(rand.asJava, schema)
    val viaWeights = graft.ops.Profile.groupWeightedPercentilesDisc(
      rdf, "g", "v", "w", Seq(25, 50, 75, 99)).collect().head
    val expanded = rdf.selectExpr("g", "explode(sequence(1, w)) AS i", "v")
    val viaExpansion = graft.ops.Profile.groupPercentilesDisc(
      expanded, "g", "v", Seq(25, 50, 75, 99)).collect().head
    (1 to 4).foreach(i => assert(viaWeights.getLong(i) == viaExpansion.getLong(i)))
  }

  test("histogram: equi-width buckets with empty cells present") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = true)))
    val rows = (1L to 50L).map(v => Row("a", v)) ++
      Seq(Row("a", null), Row("a", 999L), Row("b", 7L)) // excluded + key b
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = graft.ops.Profile.histogram(df, "g", "v", lo = 1L, hi = 60L, nbins = 12)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 24) // full 2-key × 12-bucket grid
    (0 to 9).foreach(b => assert(got(("a", b.toLong)) == 5L)) // width-5 slices
    assert(got(("a", 10L)) == 0L && got(("a", 11L)) == 0L)    // empty cells
    assert(got(("b", 1L)) == 1L && got(("b", 0L)) == 0L)      // 7 → bucket 1
  }

  test("quantileBins: even deciles, NULL values get NULL buckets") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("v", LongType, nullable = true)))
    val rows = (1L to 100L).map(v => Row("a", v, v)) ++
      Seq(Row("a", 200L, null), Row("a", 201L, null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = graft.ops.Profile.quantileBins(df, "g", "v", "id", nBins = 10)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    (1L to 100L).foreach(v => assert(got(v) == (v - 1) / 10 + 1))
    assert(got(200L) == -1L && got(201L) == -1L) // NULL in, NULL bucket out
  }

  test("contingency: cell counts, marginals, grand total") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", LongType, nullable = true)))
    val rows = Seq(Row("x", 1L), Row("x", 1L), Row("x", 2L), Row("y", 1L),
      Row(null, 1L), Row("y", null)) // null-keyed rows excluded
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = graft.ops.Profile.contingency(df, "a", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("x", 1L)) == ((2L, 3L, 3L, 4L)))
    assert(got(("x", 2L)) == ((1L, 3L, 1L, 4L)))
    assert(got(("y", 1L)) == ((1L, 1L, 3L, 4L)))
    assert(got.size == 3) // sparse: no (y,2) cell
  }

  test("winsorize: all-NULL-valued keys pass through instead of vanishing") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = true)))
    val rows = (1L to 10L).map(v => Row("a", v)) ++
      Seq(Row("z", null), Row("z", null)) // key with ONLY null values
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = graft.ops.Profile.winsorize(df, "g", "v", pLo = 10, pHi = 90)
    val zRows = out.filter(org.apache.spark.sql.functions.col("g") === "z").collect()
    assert(zRows.length == 2 && zRows.forall(_.isNullAt(2)))
    // keyCol named like an old intermediate must not throw (collision guard)
    val df2 = df.withColumnRenamed("g", "n")
    assert(graft.ops.Profile.groupPercentilesDisc(df2, "n", "v", Seq(50))
      .collect().length == 1)
  }

  test("coOccurrence: Apriori prune + exact pair counts + deterministic top-k") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val docs = Seq(
      (1L, "a b c rare1"), (2L, "a b c rare2"), (3L, "a b rare3"),
      (4L, "a b b b"), // duplicate terms collapse: (a,b) counts once here
      (5L, "c rare4"))
    val df = spark.createDataFrame(
      docs.map { case (i, t) => Row(i, t) }.asJava, schema)
    val got = graft.ops.Index.coOccurrence(df, "text", "doc_id", minSup = 3L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // frequent terms: a(4) b(4) c(3); pairs ≥ 3: (a,b)=4, (a,c)=2 ✗, (b,c)=2 ✗
    assert(got == Seq(("a", "b", 4L)))
  }

  test("kCore peels to the unique fixed point (triangle + pendant chain)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    // triangle 1-2-3 (the 2-core) with a chain 3-4-5 hanging off it
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => Row(a, b) }.asJava, schema)
    val got = graft.ops.Dedup.kCore(df, "a", "b", k = 2, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: nothing survives (empty result is a valid converged state)
    assert(graft.ops.Dedup.kCore(df, "a", "b", k = 3, iters = 10).count() == 0)
  }

  test("clusteringPieces: triangle and degree counts on a known graph") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    // triangle 1-2-3 with pendant 3-4 (and a duplicate reversed edge)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => Row(a, b) }.asJava, schema)
    val got = graft.ops.Dedup.clusteringPieces(df, "a", "b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 2L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 3L)), 4L -> ((0L, 1L))))
  }

  test("bfsDistances: hop-bounded min distances from a seed set") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    // path 1-2-3-4-5 plus a cycle edge 5-1 reached faster the other way
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => Row(a, b) }.asJava, schema)
    val seeds = spark.createDataFrame(Seq(Row(1L), Row(10L)).asJava,
      StructType(Seq(StructField("id", LongType, nullable = false))))
    val got = graft.ops.Dedup.bfsDistances(df, "a", "b", seeds, "id", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seed 10 is graph-absent but still reports 0; 4 is 2 hops via 5-1
    assert(got == Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("zOrderValue interleaves bits; SQL fragment replays it exactly") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).selectExpr("id % 37 AS x", "id % 53 AS y")
    val both = df.select(
      graft.ops.Layout.zOrderValue(Seq(col("x"), col("y")), 16).as("zc"),
      expr(graft.ops.Layout.zOrderSql(Seq("x", "y"), 16)).as("zs"),
      col("x"), col("y"))
    assert(both.where(col("zc") =!= col("zs")).count() == 0)
    // hand-checked example: x=3 (11b), y=1 (1b) → bits x→{0,2}, y→{1} → 7
    val one = both.where(col("x") === 3 && col("y") === 1).head()
    assert(one.getLong(0) == 7L)
    // Morton keys of equal values are equal, distinct cells distinct (both
    // inputs < 2^16 so no wrap): zval is a bijection on the (x, y) grid
    assert(both.select("zc").distinct().count() ==
      both.select("x", "y").distinct().count())
  }

  test("rankCorrStats: perfect agreement gives sum_d2 = 0; ties averaged") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false)))
    val data = Seq(
      // group a: y = 2x → identical ranks → sum_d2 = 0
      Row("a", 1L, 2L), Row("a", 2L, 4L), Row("a", 3L, 6L),
      // group b: x = {1,1,2}: doubled tie-avg ranks R2x = (3,3,6);
      // y = (5,6,4) distinct: R2y = (4,6,2) → d = (-1,-3,4) → sum_d2 = 26
      Row("b", 1L, 5L), Row("b", 1L, 6L), Row("b", 2L, 4L))
    val df = spark.createDataFrame(data.asJava, schema)
    val got = Profile.rankCorrStats(df, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).longValueExact()))).toMap
    assert(got == Map("a" -> ((3L, 0L)), "b" -> ((3L, 26L))))
  }
}
