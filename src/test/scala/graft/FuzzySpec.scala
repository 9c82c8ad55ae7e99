package graft

import graft.ops.{Fuzzy, Profile, TimeSeries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def strDf(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, schema)
  }

  /** Independent brute-force oracle. */
  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib; dd = lev(sa, sb) if dd <= k
    } yield (ia, ib, dd)).toSet
  }

  test("fuzzySelfJoin equals brute force (k=1 and k=2, varied lengths)") {
    val rows = Seq(
      1L -> "almond", 2L -> "blond", 3L -> "almonds", 4L -> "almond",
      5L -> "lemon", 6L -> "melon", 7L -> "x", 8L -> "y", 9L -> "xy",
      10L -> "", 11L -> "a", 12L -> "spark engine", 13L -> "spark engines",
      14L -> "sparc engine", 15L -> "completely different")
    for (k <- Seq(1, 2)) {
      val got = Fuzzy.fuzzySelfJoin(strDf(rows), "id", "s", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(rows, k), s"k=$k")
    }
  }

  test("fuzzyJoin across two tables finds cross pairs only via blocking") {
    val left = strDf(Seq(1L -> "sunday", 2L -> "monday"))
    val right = strDf(Seq(10L -> "sundae", 11L -> "tuesday"))
    val got = Fuzzy.fuzzyJoin(left, "id", "s", right, "id", "s", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 10L, 1)))
  }

  test("anomalyFlags: exact integer z-score flags a planted spike") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("i", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    // 30 stable values then one large spike
    val vals = (0L until 30L).map(i => ("a", i, 100L + (i % 3))) :+ (("a", 30L, 5000L))
    val df = spark.createDataFrame(vals.map { case (k, i, v) => Row(k, i, v) }.asJava, schema)
    // window must exceed T²+1: an in-frame outlier's z-score is bounded by
    // √(n−1) (it inflates its own frame's σ), so n=10 can never flag at 3σ
    val out = TimeSeries.anomalyFlags(df, "k", Seq("i"), "v", window = 20, tSigma = 3)
      .select("i", "flag").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(30L) == 1)
    assert((0L until 30L).forall(i => out(i) == 0))
  }

  test("resampleFill forward-fills gap days with the last value") {
    import org.apache.spark.sql.types._
    val ns = 86400L * 1000000000L
    val schema = StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("eid", LongType, nullable = false)))
    val rows = Seq(
      Row(1L, 0L * ns + 5L, 10L, 1L),       // day 0
      Row(1L, 0L * ns + 9L, 11L, 2L),       // day 0, later ts wins
      Row(1L, 3L * ns + 1L, 42L, 3L),       // day 3 (days 1-2 filled with 11)
      Row(2L, 7L * ns, 7L, 4L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = TimeSeries.resampleFill(df, "u", "ts", "v", "eid")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 0L) -> 11L, (1L, 1L) -> 11L, (1L, 2L) -> 11L,
      (1L, 3L) -> 42L, (2L, 7L) -> 7L))
  }

  test("resampleFill fails loudly on a pathological span instead of dropping the key") {
    import org.apache.spark.sql.types._
    val ns = 86400L * 1000000000L
    val schema = StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("eid", LongType, nullable = false)))
    val rows = Seq(Row(1L, 0L, 1L, 1L), Row(1L, 2000L * ns, 2L, 2L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val ex = intercept[Exception] {
      TimeSeries.resampleFill(df, "u", "ts", "v", "eid", maxSpanDays = 1000)
        .collect()
    }
    assert(ex.getMessage.contains("spans >="))
  }

  test("ewmaScaled: weights halve per step back, truncated at depth") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("i", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame(
      Seq(Row("a", 0L, 1L), Row("a", 1L, 1L), Row("a", 2L, 1L)).asJava, schema)
    val out = TimeSeries.ewmaScaled(df, "k", Seq("i"), "v", depth = 3)
      .orderBy("i").collect().map(_.getLong(3))
    // depth 3 weights: 4,2,1 → rows: 4, 4+2, 4+2+1
    assert(out.toSeq == Seq(4L, 6L, 7L))
  }

  test("groupPercentilesDisc matches a brute-force sorted-position oracle") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val data = Seq("a" -> Seq(5L, 1L, 9L, 3L, 7L), "b" -> Seq(10L, 20L),
      "c" -> Seq(4L))
    val df = spark.createDataFrame(
      data.flatMap { case (k, vs) => vs.map(v => Row(k, v)) }.asJava, schema)
    val ps = Seq(25, 50, 90, 100)
    val got = graft.ops.Profile.groupPercentilesDisc(df, "k", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getLong(i + 1))).toMap
    val want = data.toMap.map { case (k, vs) =>
      val sorted = vs.sorted
      k -> ps.map(p => sorted(((p * vs.size + 99) / 100) - 1))
    }
    assert(got == want)
  }

  test("weightedSample: exact k per stratum, deterministic, weight-monotone") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("g", StringType, nullable = false),
      StructField("w", IntegerType, nullable = false)))
    // ids 0..49 weight 1, ids 50..99 weight 10, one zero-weight row
    val rows = (0L until 100L).map(i => Row(i, "s", if (i < 50) 1 else 10)) :+
      Row(100L, "s", 0)
    val df = spark.createDataFrame(rows.asJava, schema)
    def run(salt: String) = graft.ops.Curation
      .weightedSample(df, "id", "g", org.apache.spark.sql.functions.col("w"),
        k = 20, salt = salt)
      .collect().map(_.getLong(0)).toSet
    val a = run("s1")
    assert(a.size == 20 && !a.contains(100L), "exact k, zero-weight excluded")
    assert(a == run("s1"), "deterministic in the salt")
    // heavy rows (10× weight) should dominate the sample across salts
    val heavyShare = (1 to 5).map(i => run(s"salt$i").count(_ >= 50L)).sum
    assert(heavyShare > 60, s"heavy rows won only $heavyShare/100 slots")
  }

  test("profile: exact stats, native-type extrema, column order preserved") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n", LongType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(Seq(
      Row(2L, "b"), Row(10L, "a"), Row(null, "a"), Row(2L, null)).asJava, schema)
    val out = Profile.profile(df, Seq("n", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
    // min of {2,10} is 2 numerically (lexicographic would say "10")
    assert(out.toSeq == Seq(
      "n" -> ((3L, 2L, "2", "10")),
      "s" -> ((3L, 2L, "a", "b"))))
  }

  test("profile: n_distinct matches countDistinct on float edge values (-0.0, NaN)") {
    import org.apache.spark.sql.types._
    // countDistinct normalizes -0.0 == 0.0 and NaN == NaN; the string-cast
    // distinct path must agree (a bare cast would count "-0.0" separately)
    val schema = StructType(Seq(StructField("d", DoubleType, nullable = true)))
    val df = spark.createDataFrame(Seq(
      Row(0.0), Row(-0.0), Row(Double.NaN), Row(Double.NaN), Row(1.5),
      Row(null)).asJava, schema)
    val nd = Profile.profile(df, Seq("d")).collect().head.getLong(2)
    val want = df.select(org.apache.spark.sql.functions.countDistinct("d"))
      .collect().head.getLong(0)
    assert(nd == want, s"profile n_distinct=$nd, countDistinct=$want")
  }

  test("sortedNeighborhood: finds in-window pairs, misses out-of-window ones") {
    graft.Graft.install(spark)
    // sort order by s: apple01, apple02, banana, cherry, zzz..., apple99
    // is NOT how it sorts — build an explicit gap: two near-identical names
    // adjacent in sort order, and two equally-similar names separated by
    // more than `window` filler rows
    val filler = (100L until 120L).map(i => (i, f"m$i%03d filler row"))
    val rows = Seq(
      (1L, "aaaa target alpha"), (2L, "aaaa target alphb"), // adjacent pair
      (50L, "zz far twin one"), (51L, "zz far twin onf")    // adjacent too
    ) ++ filler
    val out = Fuzzy.sortedNeighborhood(strDf(rows), "id", "s",
      window = 3, minSim = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)) && out.contains((50L, 51L)))
    // the aaaa pair and zz pair are separated by 20 filler rows — no
    // cross pair can appear
    assert(!out.exists { case (a, b) => a <= 2 && b >= 50 })
    // sim of the found pairs matches the direct scorer
    val sim = Fuzzy.sortedNeighborhood(strDf(rows), "id", "s", 3, 0.9)
      .where(col("id_a") === 1).collect().head.getDouble(2)
    val direct = graft.functions.Kernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaa target alpha"),
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaa target alphb"))
    assert(sim == direct)
  }

  test("sortedNeighborhood plan: rank equi-join, never a cartesian product") {
    graft.Graft.install(spark)
    val rows = (0L until 50L).map(i => (i, f"k$i%03d"))
    val plan = Fuzzy.sortedNeighborhood(strDf(rows), "id", "s", 5, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pair generation degenerated to a cross join:\n$plan")
  }
}
