package graft

import graft.ops.{Curation, Dedup, Fuzzy, Profile, TimeSeries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the analytics operators against independent
  * in-memory models — high-collision alphabets and adversarial shapes the
  * hand-written cases don't reach. Seeds are fixed: failures reproduce. */
class AnalyticsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzySelfJoin ≡ brute force on random dense short strings (k=1..3)") {
    val rnd = new scala.util.Random(42)
    // tiny alphabet + short lengths → heavy collisions, exact dups, empties
    val rows = (1L to 120L).map { i =>
      val len = rnd.nextInt(7) // 0..6
      i -> Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    val df = spark.createDataFrame(
      rows.map { case (i, s) => Row(i, s) }.asJava, schema)
    for (k <- 1 to 3) {
      val got = Fuzzy.fuzzySelfJoin(df, "id", "s", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib; d = lev(sa, sb) if d <= k
      } yield (ia, ib, d)).toSet
      assert(got == want, s"k=$k: ${got.diff(want).size} extra, ${want.diff(got).size} missing")
    }
  }

  test("scd2 ≡ in-memory run-collapse model on random changelogs") {
    val rnd = new scala.util.Random(97)
    val rows = for (k <- 1L to 8L; i <- 0L until (30 + rnd.nextInt(60)).toLong)
      yield (k, rnd.nextInt(20).toLong * 5, k * 10000 + i, // ts ties likely
        if (rnd.nextInt(6) == 0) null else "s" + rnd.nextInt(3))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("st", StringType, nullable = true)))
    val df = spark.createDataFrame(
      rows.map { case (k, t, i, s) => Row(k, t, i, s) }.asJava, schema)
    val got = graft.ops.Warehouse.scd2(df, "k", "ts", "id", Seq("st"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getInt(4))).toSet
    val want = rows.groupBy(_._1).flatMap { case (k, ks) =>
      val ordered = ks.sortBy(r => (r._2, r._3))
      val versions = ordered.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, t, _, s)) =>
          if (acc.nonEmpty && acc.last._1 == s) acc else acc :+ (s -> t)
      }
      versions.zipWithIndex.map { case ((s, from), i) =>
        val to = if (i + 1 < versions.size) versions(i + 1)._2 else Long.MaxValue
        (k, s, from, to, if (to == Long.MaxValue) 1 else 0)
      }
    }.toSet
    assert(got == want)
  }

  test("snapshotDiff ≡ map-diff model on random keyed snapshots") {
    val rnd = new scala.util.Random(101)
    def snap() = (1L to 200L).flatMap { k =>
      if (rnd.nextInt(4) == 0) None
      else Some(k -> (if (rnd.nextInt(5) == 0) null
                      else java.lang.Long.valueOf(rnd.nextInt(3).toLong)))
    }.toMap
    val (o, n) = (snap(), snap())
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = true)))
    def toDf(m: Map[Long, java.lang.Long]) = spark.createDataFrame(
      m.toSeq.map { case (k, v) => Row(k, v) }.asJava, schema)
    val got = graft.ops.Warehouse.snapshotDiff(toDf(o), toDf(n), Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (o.keySet ++ n.keySet).flatMap { k =>
      (o.get(k), n.get(k)) match {
        case (None, Some(_)) => Some(k -> "added")
        case (Some(_), None) => Some(k -> "removed")
        case (Some(a), Some(b)) if a != b => Some(k -> "changed")
        case _ => None
      }
    }.toMap
    assert(got == want)
  }

  test("histogram ≡ counting model on random values and bounds") {
    val rnd = new scala.util.Random(103)
    val vals = (1 to 2000).map(_ => rnd.nextInt(200).toLong - 50)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame(
      vals.map(v => Row("a", v)).asJava, schema)
    for ((lo, hi, nb) <- Seq((0L, 99L, 10), (-50L, 149L, 7), (10L, 10L, 3))) {
      val got = graft.ops.Profile.histogram(df, "g", "v", lo, hi, nb)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val width = hi - lo + 1
      val want = (0L until nb.toLong).map(b => b ->
        vals.count(v => v >= lo && v <= hi &&
          (v - lo) * nb / width == b).toLong).toMap
      assert(got == want, s"[$lo,$hi]x$nb")
    }
  }

  test("rollingExtrema ≡ naive trailing frame on random series and windows") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 0 until 5; i <- 0 until (20 + rnd.nextInt(80)))
      yield (k.toString, i.toLong, rnd.nextInt(50).toLong)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", StringType, nullable = false),
      StructField("i", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame(
      rows.map { case (k, i, v) => Row(k, i, v) }.asJava, schema)
    for (w <- Seq(2, 5, 13, 64)) {
      val got = TimeSeries.rollingExtrema(df, "k", Seq("i"), "v", w)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      rows.groupBy(_._1).foreach { case (k, ks) =>
        val sorted = ks.sortBy(_._2)
        sorted.indices.foreach { t =>
          val frame = sorted.slice(math.max(0, t - w + 1), t + 1).map(_._3)
          assert(got((k, sorted(t)._2)) == ((frame.max, frame.min)), s"w=$w k=$k t=$t")
        }
      }
    }
  }

  test("rollingExtrema null values never enter the extrema (deque path, r16)") {
    // nulls are skipped by max/min and an all-null window yields null — the
    // window-aggregate semantics the r16 monotonic-deque rewrite must keep
    val rnd = new scala.util.Random(23)
    val rows = for (k <- 0 until 4; i <- 0 until 60) yield (k.toString, i.toLong,
      if (rnd.nextInt(10) < 4) null
      else java.lang.Long.valueOf(rnd.nextInt(50).toLong))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", StringType, nullable = false),
      StructField("i", LongType, nullable = false),
      StructField("v", LongType, nullable = true)))
    val df = spark.createDataFrame(
      rows.map { case (k, i, v) => Row(k, i, v) }.asJava, schema)
    for (w <- Seq(2, 7, 31)) {
      val got = TimeSeries.rollingExtrema(df, "k", Seq("i"), "v", w)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((if (r.isNullAt(3)) null else r.getLong(3),
            if (r.isNullAt(4)) null else r.getLong(4)))).toMap
      rows.groupBy(_._1).foreach { case (k, ks) =>
        val sorted = ks.sortBy(_._2)
        sorted.indices.foreach { t =>
          val frame = sorted.slice(math.max(0, t - w + 1), t + 1)
            .flatMap(r => Option(r._3)).map(_.longValue)
          val want: (Any, Any) =
            if (frame.isEmpty) (null, null) else (frame.max, frame.min)
          assert(got((k, sorted(t)._2)) == want, s"w=$w k=$k t=$t")
        }
      }
    }
  }

  test("groupPercentilesDisc ≡ sorted-position model on random groups") {
    val rnd = new scala.util.Random(13)
    val rows = for (g <- 0 until 8; _ <- 0 until (1 + rnd.nextInt(40)))
      yield (g.toString, rnd.nextInt(20).toLong) // ties abound
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame(
      rows.map { case (g, v) => Row(g, v) }.asJava, schema)
    val ps = Seq(1, 25, 50, 75, 99, 100)
    val got = Profile.groupPercentilesDisc(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getLong(i + 1))).toMap
    rows.groupBy(_._1).foreach { case (g, gs) =>
      val sorted = gs.map(_._2).sorted
      val want = ps.map(p => sorted(((p * sorted.size + 99) / 100) - 1))
      assert(got(g) == want, s"g=$g")
    }
  }

  test("weightedSample: per-stratum independence, exact k, salt determinism") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("g", StringType, nullable = false),
      StructField("w", IntegerType, nullable = false)))
    val rows = (0L until 200L).map(i => Row(i, (i % 4).toString, 1 + (i % 5).toInt))
    val df = spark.createDataFrame(rows.asJava, schema)
    def pick(d: org.apache.spark.sql.DataFrame) = Curation
      .weightedSample(d, "id", "g", col("w"), k = 7, salt = "prop")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val all = pick(df)
    assert(all.size == 28 && all.groupBy(_._1).forall(_._2.size == 7))
    // strata are independent: sampling one stratum alone picks the same ids
    val only2 = pick(df.where(col("g") === "2"))
    assert(only2 == all.filter(_._1 == "2"))
  }

  test("runLength reconstructs the original symbol stream per key") {
    val rnd = new scala.util.Random(3)
    val rows = for (k <- 0 until 4; i <- 0 until 60)
      yield (k.toLong, i.toLong, ('x' + rnd.nextInt(2)).toChar.toString)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("u", LongType, nullable = false),
      StructField("i", LongType, nullable = false),
      StructField("tp", StringType, nullable = false)))
    val df = spark.createDataFrame(
      rows.map { case (u, i, tp) => Row(u, i, tp) }.asJava, schema)
    val runs = TimeSeries.runLength(df, "u", Seq("i"), "tp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (u, us) =>
      val stream = us.sortBy(_._2).map(_._3)
      val rebuilt = runs.filter(_._1 == u).sortBy(_._3)
        .flatMap { case (_, sym, _, len) => Seq.fill(len.toInt)(sym) }
      assert(rebuilt.toSeq == stream.toSeq, s"u=$u")
      // run starts are contiguous: next start = prev start + prev len
      val rs = runs.filter(_._1 == u).sortBy(_._3)
      rs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ =>
      }
    }
  }

  test("lshJoinTopK ≡ bucket+rerank model on random low-dim vectors with heavy ties") {
    graft.Graft.install(spark)
    val rnd = new scala.util.Random(44)
    // dim 4 over a 5-value alphabet: many identical vectors (exact sim
    // ties), crowded buckets, zero vectors (sim defined 0.0) — the
    // adversarial shapes the real-embedding gates never produce
    val vals = Array(-1f, -0.5f, 0f, 0.5f, 1f)
    def vec(): Array[Float] = Array.fill(4)(vals(rnd.nextInt(vals.length)))
    val right = (0L until 80L).map(i => (i, vec().toSeq))
    val left = (0L until 30L).map(i => (1000L + i, right((i % 80).toInt)._2)) ++
      (30L until 40L).map(i => (1000L + i, vec().toSeq))
    import spark.implicits._
    val rdf = right.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val ldf = left.toDF("q_id", "q_embedding")
      .withColumn("q_embedding", col("q_embedding").cast("array<float>"))
    val bits = 4
    val got = graft.ops.Similarity.lshJoinTopK(ldf, rdf, 3, bits = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    // model: buckets via the ENGINE's own bucket function (gated
    // separately by q_lsh_bucket), candidates/rerank replicated in memory
    def buckets(pairs: Seq[(Long, Seq[Float])], emb: String): Map[Long, Long] =
      pairs.toDF("id", emb).withColumn(emb, col(emb).cast("array<float>"))
        .selectExpr("id", s"hyperplane_bucket($emb, $bits) AS b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rb = buckets(right, "e")
    val lb = buckets(left, "e")
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s == 0.0) 0.0 else s // normalize -0.0 like UnsafeRow's sort does
    }
    val rightByBucket = right.groupBy(p => rb(p._1))
    val exp = left.flatMap { case (qid, qe) =>
      val b0 = lb(qid)
      val probes = (b0 +: (0 until bits).map(i => b0 ^ (1L << i))).toSet
      val cands = probes.toSeq.flatMap(b => rightByBucket.getOrElse(b, Nil))
      cands.map { case (vid, ve) => (vid, cos(ve, qe)) }
        .sortWith { case ((ia, sa), (ib, sb)) =>
          if (sa != sb) sa > sb else ia < ib }
        .take(3).zipWithIndex
        .map { case ((vid, _), idx) => (qid, vid, idx + 1) }
    }.toSet
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
  }

  test("lshJoinTopKMulti ≡ multi-table bucket+rerank model under heavy ties") {
    graft.Graft.install(spark)
    val rnd = new scala.util.Random(45)
    // same adversarial shape as the single-table property test: low-dim
    // coarse alphabet → exact-duplicate vectors, exact sim ties, crowded
    // buckets, zero vectors
    val vals = Array(-1f, -0.5f, 0f, 0.5f, 1f)
    def vec(): Array[Float] = Array.fill(4)(vals(rnd.nextInt(vals.length)))
    val right = (0L until 80L).map(i => (i, vec().toSeq))
    val left = (0L until 30L).map(i => (1000L + i, right((i % 80).toInt)._2)) ++
      (30L until 40L).map(i => (1000L + i, vec().toSeq))
    import spark.implicits._
    val rdf = right.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val ldf = left.toDF("q_id", "q_embedding")
      .withColumn("q_embedding", col("q_embedding").cast("array<float>"))
    val (bits, tables) = (4, 3)
    val got = graft.ops.Similarity.lshJoinTopKMulti(ldf, rdf, 3, bits, tables)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    // model: table-seeded buckets via the ENGINE's own function (gated
    // separately by q_ann_multitable's oracle), candidate union + pair
    // dedup + rerank replicated in memory
    def buckets(pairs: Seq[(Long, Seq[Float])], t: Int): Map[Long, Long] =
      pairs.toDF("id", "e").withColumn("e", col("e").cast("array<float>"))
        .selectExpr("id", s"hyperplane_bucket_t(e, $bits, $t) AS b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      if (s == 0.0) 0.0 else s
    }
    val perTable = (0 until tables).map { t =>
      (buckets(right, t), buckets(left, t))
    }
    val exp = left.flatMap { case (qid, qe) =>
      val cands = perTable.flatMap { case (rb, lb) =>
        val b = lb(qid)
        right.filter(p => rb(p._1) == b)
      }.distinctBy(_._1)                           // pair dedup across tables
      cands.map { case (vid, ve) => (vid, cos(ve, qe)) }
        .sortWith { case ((ia, sa), (ib, sb)) =>
          if (sa != sb) sa > sb else ia < ib }
        .take(3).zipWithIndex
        .map { case ((vid, _), idx) => (qid, vid, idx + 1) }
    }.toSet
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
    // table 0 is bit-identical to the un-seeded hyperplane set
    val b0 = buckets(right, 0)
    val plain = right.toDF("id", "e").withColumn("e", col("e").cast("array<float>"))
      .selectExpr("id", s"hyperplane_bucket(e, $bits) AS b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b0 == plain)
  }

  test("kCore self-consistency and idempotence on random graphs") {
    val rnd = new scala.util.Random(19)
    val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false)))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => Row(a, b) }.asJava, schema)
    for (k <- Seq(2, 4, 6)) {
      val core = Dedup.kCore(df, "a", "b", k, iters = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every survivor's within-core degree ≥ k
      assert(core.values.forall(_ >= k), s"k=$k")
      // the fixed point really is fixed: peeling the core again changes nothing
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val coreEdges = und.filter { case (a, b) =>
        core.contains(a) && core.contains(b) }
      if (coreEdges.nonEmpty) {
        val df2 = spark.createDataFrame(
          coreEdges.map { case (a, b) => Row(a, b) }.asJava, schema)
        val again = Dedup.kCore(df2, "a", "b", k, iters = 60)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(again == core, s"k=$k not idempotent")
      } else assert(core.isEmpty)
    }
  }
}
