package graft

import graft.ops.{Curation, Dedup, Index, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch operators (HLL / CMS / Bloom), the inverted index, the Gopher rule
  * battery, and public connected components. Property style: every sketch is
  * checked against its exact ground truth on seeded random data. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  // ---- HyperLogLog ---------------------------------------------------------

  test("hll: corrected estimate within 10% of exact distinct at n=5000") {
    val keys = (1 to 20000).map(_ => "k" + rnd.nextInt(5000))
    val exact = keys.distinct.size
    val df = keys.toDF("k")
    val regs = new Array[Byte](512)
    Sketches.hllRegisters(df, col("k"), p = 9).collect().foreach { r =>
      regs(r.getInt(0)) = r.getInt(1).toByte
    }
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - exact) < 0.10 * exact, s"est=$est exact=$exact")
  }

  test("hll: register merge (elementwise max) equals whole-corpus registers") {
    val keys = (1 to 3000).map(i => "u" + rnd.nextInt(2000))
    val (a, b) = keys.splitAt(1100)
    def regsOf(ks: Seq[String]): Array[Byte] = {
      val agg = new Sketches.HllAgg(9)
      var st = agg.createState()
      ks.foreach(k => st = agg.accumulate(st, org.apache.spark.sql.Row(k)))
      st
    }
    val whole = regsOf(keys)
    val merged = new Sketches.HllAgg(9).merge(regsOf(a), regsOf(b))
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("hll_distinct SQL aggregate equals driver-side raw estimator") {
    val keys = (1 to 4000).map(i => "g" + (i % 2) -> ("v" + rnd.nextInt(700)))
    val df = keys.toDF("g", "v")
    df.createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT g, hll_distinct(v) AS e FROM hll_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = keys.groupBy(_._1).map { case (g, kvs) =>
      val agg = new Sketches.HllAgg(9)
      var st = agg.createState()
      kvs.foreach { case (_, v) => st = agg.accumulate(st, org.apache.spark.sql.Row(v)) }
      g -> Sketches.hllEstimateRaw(st)
    }
    assert(viaSql == expected)
  }

  test("hll raw estimator: exact-integer formula matches a float reference") {
    // raw = alpha*m^2 / sum(2^-Mj); BigInt formula must floor the same value
    val regs = new Array[Byte](512)
    (0 until 512).foreach(j => regs(j) = (rnd.nextInt(8) + 1).toByte)
    val m = 512.0
    val alpha = 0.7213 / (1 + 1.079 / m)
    val s = regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val floatE = alpha * m * m / s
    val intE = Sketches.hllEstimateRaw(regs)
    assert(math.abs(intE - floatE) <= 1.0, s"int=$intE float=$floatE")
  }

  test("hll intersect estimate: inclusion-exclusion lands near true overlap") {
    val shared = (1 to 1500).map(i => "s" + i)
    val aOnly = (1 to 1500).map(i => "a" + i)
    val bOnly = (1 to 1500).map(i => "b" + i)
    def regs(ks: Seq[String]): Array[Byte] =
      Sketches.collectRegisters(Sketches.hllRegisters(ks.toDF("k"), col("k"), 9), 9)
    val (ra, rb) = (regs(shared ++ aOnly), regs(shared ++ bOnly))
    val est = Sketches.hllIntersectEstimate(ra, rb)
    assert(math.abs(est - 1500L) < 450, s"est=$est")  // 3 correlated estimates -> wide band
    // union registers commute and the merge is idempotent
    assert(java.util.Arrays.equals(Sketches.hllMerge(ra, rb), Sketches.hllMerge(rb, ra)))
    assert(java.util.Arrays.equals(Sketches.hllMerge(ra, ra), ra))
  }

  test("heavyHitters: CMS-pruned result equals the exact heavy-hitter set") {
    // skewed counts: key i appears i times
    val rows = (1 to 80).flatMap(i => Seq.fill(i)("h" + i))
    val got = Sketches.heavyHitters(rows.toDF("k"), col("k"), minCount = 50L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 50L).toMap
    assert(got == truth)
  }

  // ---- Count-min -----------------------------------------------------------

  test("cms: never underestimates, exact for most keys at low load") {
    val keys = (1 to 5000).map(_ => "w" + rnd.nextInt(300))
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mat = Sketches.countMin(keys.toDF("k"), col("k"), None, d = 4, w = 1024)
    truth.foreach { case (k, n) =>
      val est = Sketches.cmsEstimate(mat, 4, 1024, k)
      assert(est >= n, s"underestimate for $k: $est < $n")
    }
    // at 300 keys / 1024 slots / 4 rows, collisions in all 4 rows are rare
    val exact = truth.count { case (k, n) => Sketches.cmsEstimate(mat, 4, 1024, k) == n }
    assert(exact >= truth.size * 0.95)
  }

  test("cms: weighted build sums weights") {
    val df = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("k", "wt")
    val mat = Sketches.countMin(df, col("k"), Some(col("wt")), d = 2, w = 64)
    assert(Sketches.cmsEstimate(mat, 2, 64, "a") >= 12L)
    assert(Sketches.cmsEstimate(mat, 2, 64, "b") >= 1L)
  }

  // ---- Bloom ---------------------------------------------------------------

  test("bloom: no false negatives; FP rate sane at sized filter") {
    val members = (1 to 500).map(i => "m" + i)
    val bits = Sketches.bloomBits(members.toDF("k"), col("k"), mBits = 8192, k = 3)
    members.foreach(m => assert(Sketches.bloomContains(bits, 8192, 3, m)))
    val nonMembers = (1 to 2000).map(i => "x" + i)
    val fps = nonMembers.count(Sketches.bloomContains(bits, 8192, 3, _))
    // 500 keys * 3 hashes in 8192 bits -> fill ~0.17, fp ~ 0.5%; allow 5%
    assert(fps <= 100, s"fp=$fps/2000")
  }

  test("bloomProbe: map-only filter passes every true member") {
    val members = (1 to 50).map(i => "m" + i)
    val bits = Sketches.bloomBits(members.toDF("k"), col("k"), mBits = 4096, k = 3)
    val probe = ((1 to 50).map(i => "m" + i) ++ (1 to 50).map(i => "z" + i)).toDF("k")
    val got = Sketches.bloomProbe(probe, col("k"), bits, 4096, 3)
      .as[String].collect().toSet
    assert(members.toSet.subsetOf(got))
    assert(got.size <= 60) // few false positives at this sizing
  }

  // ---- Inverted index ------------------------------------------------------

  test("inverted index + searchAll match brute-force containment") {
    val vocab = Vector("red", "green", "blue", "cyan", "lime", "teal")
    val docs = (1 to 200).map { i =>
      (i.toLong, (1 to 10).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val idx = Index.invertedIndex(df, "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toList
    idx.foreach { case (term, dfc, postings) =>
      val truth = docs.filter(_._2.split(" ").contains(term)).map(_._1).sorted
      assert(postings == truth, s"postings for $term")
      assert(dfc == truth.size)
    }
    val hits = Index.searchAll(Index.invertedIndex(df, "text", "doc_id"),
      Seq("red", "blue")).as[Long].collect().toSet
    val truth = docs.filter { case (_, t) =>
      val ws = t.split(" ").toSet; ws("red") && ws("blue")
    }.map(_._1).toSet
    assert(hits == truth)
  }

  test("inverted index: maxDf filter prunes before postings materialize") {
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "a d")).toDF("doc_id", "text")
    val idx = Index.invertedIndex(df, "text", "doc_id", minDf = 1, maxDf = 2)
    assert(!idx.collect().map(_.getString(0)).contains("a")) // df=3 pruned
    assert(idx.count() == 3) // b, c, d
  }

  test("mergeIndex: order- and replay-proof, equals whole-corpus index") {
    val docs = (1 to 60).map(i => (i.toLong, s"w${i % 7} w${i % 5} shared")).toDF("doc_id", "text")
    val whole = Index.invertedIndex(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val a = Index.invertedIndex(docs.where(col("doc_id") <= 20), "text", "doc_id")
    val b = Index.invertedIndex(docs.where(col("doc_id") > 20), "text", "doc_id")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(toMapOf(Index.mergeIndex(a, b)) == whole)
    assert(toMapOf(Index.mergeIndex(b, a)) == whole)          // commutative
    assert(toMapOf(Index.mergeIndex(Index.mergeIndex(a, b), b)) == whole) // replay-idempotent
    // associative over a 3-way split in either association order
    val parts = Seq(docs.where(col("doc_id") % 3 === 0), docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 === 2)).map(Index.invertedIndex(_, "text", "doc_id"))
    assert(toMapOf(Index.mergeIndex(Index.mergeIndex(parts(0), parts(1)), parts(2))) == whole)
    assert(toMapOf(Index.mergeIndex(parts(0), Index.mergeIndex(parts(1), parts(2)))) == whole)
  }

  test("deterministicShuffle: a permutation, stable across runs, salt-dependent") {
    val docs = (1 to 100).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val p1 = graft.ops.Curation.deterministicShuffle(docs, "doc_id", "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.values.toSeq.sorted == (0L until 100L))          // contiguous positions
    val p1again = graft.ops.Curation.deterministicShuffle(docs, "doc_id", "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == p1again)                                      // reproducible
    val p2 = graft.ops.Curation.deterministicShuffle(docs, "doc_id", "s2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 != p2)                                           // epochs differ
  }

  // ---- Gopher rules --------------------------------------------------------

  test("gopher rules: each predicate fires on a targeted fixture") {
    val good = ((1 to 60).map(_ => "steady") ++ Seq("the", "of")).mkString(" ")
    val fixtures = Seq(
      (1L, good),                                       // passes all
      (2L, "the of tiny"),                              // fails r_words
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the of"), // fails r_meanlen (mean<3)
      (4L, ((1 to 60).map(_ => "x#####x")).mkString(" ") + " the of"), // fails r_symbol
      (5L, (1 to 60).map(_ => "- bullet line").mkString("\n")), // fails r_bullet
      (6L, (1 to 60).map(_ => "trailing...").mkString("\n")),   // fails r_ellipsis
      (7L, ((1 to 60).map(_ => "123")).mkString(" ") + " the of"), // fails r_alpha
      (8L, (1 to 60).map(_ => "steady").mkString(" ")), // fails r_stop (0 stopwords)
    )
    val out = Curation.gopherRules(fixtures.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("doc_id").collect()
    def b(r: org.apache.spark.sql.Row, c: String) = r.getBoolean(r.fieldIndex(c))
    assert(b(out(0), "pass"))
    assert(!b(out(1), "r_words"))
    assert(!b(out(2), "r_meanlen"))
    assert(!b(out(3), "r_symbol"))
    assert(!b(out(4), "r_bullet"))
    assert(!b(out(5), "r_ellipsis"))
    assert(!b(out(6), "r_alpha"))
    assert(!b(out(7), "r_stop"))
  }

  // ---- Funnel --------------------------------------------------------------

  test("funnel: greedy sorted chain equals sequential-min semantics") {
    // user 1: full chain, with a click BEFORE the first view (must be
    // skipped) and a same-timestamp click (strictly-after excludes it)
    // user 2: view then purchase but no click -> reached 1
    // user 3: only clicks -> reached 0
    val ev = Seq(
      (1L, "click", 5L), (1L, "view", 10L), (1L, "click", 10L),
      (1L, "click", 20L), (1L, "purchase", 15L), (1L, "purchase", 30L),
      (2L, "view", 1L), (2L, "purchase", 2L),
      (3L, "click", 7L),
      (4L, "error", 9L), // no stage-typed events: no funnel row
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
      .toMap
    assert(got(1L) == (3, Seq(Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == (1, Seq(Some(1L), None, None)))
    assert(got(3L) == (0, Seq(None, None, None)))
    assert(!got.contains(4L))
  }

  test("cohortRetention: hand-computed matrix, pre-anchor activity excluded") {
    val D = 86400L * 1000000000L
    val ev = Seq(
      (1L, "signup", 10 * D), (1L, "click", 10 * D + 5), (1L, "view", 12 * D),
      (1L, "view", 9 * D),   // before the anchor day: excluded
      (2L, "signup", 10 * D), (2L, "view", 12 * D),
      (3L, "signup", 11 * D), (3L, "click", 11 * D),
      (4L, "click", 10 * D), // never signs up: no cohort
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Funnel.cohortRetention(ev, "user_id", "event_type", "ts", "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cohort day 10: users 1,2 active day 0; users 1,2 active day 2
    // cohort day 11: user 3 active day 0
    assert(got == Map((10L, 0L) -> 2L, (10L, 2L) -> 2L, (11L, 0L) -> 1L))
  }

  test("funnel maxSpan: conversions outside the window are rejected") {
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 150L), (1L, "purchase", 300L), // purchase past span
      (2L, "view", 100L), (2L, "click", 150L), (2L, "purchase", 190L), // inside
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxSpan = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2, 2L -> 3))
  }

  test("triangles match brute force on a random graph, each counted once") {
    val edges = (1 to 260).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val undirected = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val truth = (for {
      a <- 0L until 40L; b <- a + 1 to 39L; c <- b + 1 to 39L
      if undirected((a, b)) && undirected((b, c)) && undirected((a, c))
    } yield (a, b, c)).toSet
    val got = graft.ops.Dedup.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == truth)
    assert(got.length == truth.size) // no duplicates
  }

  test("pageRank: hand-computed integer iterations on a star graph") {
    // star 0-{1,2,3}: deg(0)=3, deg(leaf)=1
    // round 1: r(0)=150000+850*3e6//1000=2700000; r(leaf)=150000+850*(1e6//3)//1000=433333
    // round 2: r(0)=150000+850*(3*433333)//1000=1254999; r(leaf)=150000+850*(2700000//3)//1000=915000
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val got = graft.ops.Dedup.pageRank(edges, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1254999L, 1L -> 915000L, 2L -> 915000L, 3L -> 915000L))
  }

  // ---- Connected components ------------------------------------------------

  test("connectedComponents matches union-find on a random graph") {
    val n = 120
    val edges = (1 to 150).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> {
        // component = min id in the union-find class
        val root = find(id.toInt)
        (0 until n).filter(j => find(j) == root).min.toLong
      }).toMap
    val got = Dedup.connectedComponents(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth)
  }

  test("qsketch: merge-stable registers, quantiles within 1/16 relative error") {
    val rnd = new scala.util.Random(53)
    // lognormal-ish positive longs with a heavy tail + the exact range
    val vals = (1 to 4000).map { _ =>
      val e = rnd.nextInt(28)
      ((1L << e) + ((rnd.nextLong() & Long.MaxValue) % (1L << e)))
        .max(rnd.nextInt(16).toLong)
    }
    val df = vals.map(v => ("k", v)).toDF("g", "v")
    val regs = Sketches.qsketchRegisters(df, "g", "v")
    // merge stability: registers of two shards, unioned and re-summed,
    // equal the full build (the artifact contract)
    val (s1, s2) = vals.zipWithIndex.partition(_._2 % 2 == 0)
    val merged = Sketches.qsketchRegisters(s1.map(x => ("k", x._1)).toDF("g", "v"), "g", "v")
      .union(Sketches.qsketchRegisters(s2.map(x => ("k", x._1)).toDF("g", "v"), "g", "v"))
      .groupBy("g", "bin").agg(sum("cnt").as("cnt"))
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      regs.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
    // error bound vs the exact discrete percentiles
    val est = Sketches.qsketchQuantiles(regs, "g", Seq(50, 90, 99)).collect().head
    val sorted = vals.sorted
    def exact(p: Int): Long = sorted(((p.toLong * sorted.size + 99) / 100).toInt - 1)
    Seq(50, 90, 99).zipWithIndex.foreach { case (p, i) =>
      val e = est.getLong(i + 1); val x = exact(p)
      assert(e <= x && x - e <= x / 16 + 1, s"p$p: est $e vs exact $x")
    }
  }
}
