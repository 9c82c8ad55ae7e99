package graft

import graft.ops.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava, schema)
  }

  test("trainUnigram counts, truncates deterministically, and totals all tokens") {
    val corpus = df(Seq(
      (1L, "a a a b b c"),
      (2L, "a b d")))
    val m = LangModel.trainUnigram(corpus, "text", vocabSize = 2)
    // counts: a=4 b=3 c=1 d=1; top-2 = {a, b}; total covers c and d too
    assert(m.total == 9L)
    assert(m.counts == Map("a" -> 4L, "b" -> 3L))
  }

  test("trainUnigram fingerprint path falls back exactly on flat distributions") {
    // 6000 distinct tokens, each count 1 — more distinct fingerprints than
    // vocabSize + slack (4096), and the V-th winner TIES the sentinel count,
    // so the r16 fingerprint-keyed path cannot prove its candidate set
    // sufficient and must take the exact string-keyed fallback. The result
    // must equal the (count DESC, token ASC) contract regardless of path.
    val docs = (0 until 60).map { d =>
      d.toLong -> (0 until 100).map(i => f"t${d * 100 + i}%05d").mkString(" ")
    }
    val m = LangModel.trainUnigram(df(docs), "text", vocabSize = 4)
    assert(m.total == 6000L)
    assert(m.counts == Map("t00000" -> 1L, "t00001" -> 1L,
      "t00002" -> 1L, "t00003" -> 1L))
  }

  test("trainUnigram fingerprint path is exact on skewed distributions") {
    // counts separate cleanly (proven-path regime): winners' exact counts
    // sit strictly above everything excluded
    val docs = (0 until 50).map { d =>
      d.toLong -> (("hot " * (d % 5 + 1)) + f"warm cold${d}%03d")
    }
    val m = LangModel.trainUnigram(df(docs), "text", vocabSize = 2)
    // hot: sum(d%5+1) over 50 docs = 10*(1+2+3+4+5) = 150; warm: 50
    assert(m.counts == Map("hot" -> 150L, "warm" -> 50L))
    assert(m.total == 150L + 50L + 50L)
  }

  test("trainUnigram proves sufficiency with a LIVE sentinel (candidates ⊂ universe)") {
    // 4204 distinct tokens > vocabSize + slack (4 + 4096), so the candidate
    // fingerprint set is a strict subset and the sentinel is REAL (the
    // 4101st fingerprint's count, 1), while the V-th winner's exact count
    // (7) sits STRICTLY above it — the branch that accepts the
    // fingerprint-keyed result without the exact fallback pass. The flat
    // test covers the tie→fallback side; this covers the accept side.
    val hot = Seq.fill(10)("ha") ++ Seq.fill(9)("hb") ++
      Seq.fill(8)("hc") ++ Seq.fill(7)("hd")
    val singles = (0 until 4200).map(i => f"s$i%05d")
    val docs = (hot ++ singles).grouped(200).zipWithIndex
      .map { case (ts, i) => i.toLong -> ts.mkString(" ") }.toSeq
    val m = LangModel.trainUnigram(df(docs), "text", vocabSize = 4)
    assert(m.counts == Map("ha" -> 10L, "hb" -> 9L, "hc" -> 8L, "hd" -> 7L))
    assert(m.total == 34L + 4200L)
  }

  test("trainUnigram breaks count ties lexicographically") {
    val corpus = df(Seq((1L, "z y z y x")))
    val m = LangModel.trainUnigram(corpus, "text", vocabSize = 1)
    // y and z tie at 2; (count DESC, token ASC) picks y
    assert(m.counts.keySet == Set("y"))
  }

  test("surprisal charges bit_length(total/c) per token, OOV at full cost") {
    val corpus = df(Seq((1L, "a a a a a a a b")))
    val m = LangModel.trainUnigram(corpus, "text", vocabSize = 1)
    // total=8, vocab={a:7}; surp(a)=bitlen(8/7=1)=1, OOV surp=bitlen(8)=4
    val out = LangModel.surprisal(df(Seq((5L, "a b a"))), m, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((5L, 3, 1L + 4L + 1L, 2L)))
  }

  test("surprisal separates in-model text from gibberish") {
    val corpus = df((1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog")))
    val m = LangModel.trainUnigram(corpus, "text", vocabSize = 8)
    val out = LangModel.surprisal(
      df(Seq((1L, "the quick brown fox"), (2L, "zxq wvut qqqz mmmk"))),
      m, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L))
  }

  test("lmScore is map-only over docs: no join or shuffle in the scoring plan") {
    val corpus = df(Seq((1L, "a b c a b a")))
    val m = LangModel.trainUnigram(corpus, "text", vocabSize = 4)
    val plan = LangModel.surprisal(df(Seq((9L, "a b"))), m, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("tfIdf weights rare terms above common ones and drops zero scores") {
    val docs = df(Seq(
      (1L, "common common common rare"),
      (2L, "common common"),
      (3L, "common"),
      (4L, "nothing here")))
    // N=4; df(rare)=1 -> idf=bitlen(4)=3; df(common)=3 -> idf=bitlen(4/3=1)=1
    val out = LangModel.tfIdf(docs, Seq("rare", "common"), "text", "doc_id")
      .orderBy(desc("score"), asc("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc1: 1*3 + 3*1 = 6; doc2: 2; doc3: 1; doc4 dropped
    assert(out.toSeq == Seq((1L, 6L), (2L, 2L), (3L, 1L)))
  }

  test("bm25 ranks the term-dense short doc first and scores all docs") {
    val docs = df(Seq(
      (1L, "needle needle needle"),
      (2L, "needle padding padding padding padding padding padding padding"),
      (3L, "no match at all")))
    val out = LangModel.bm25(docs, Seq("needle"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 3)
    assert(out(1L) > out(2L))
    assert(out(3L) == 0.0)
  }

  test("null text and empty corpora degrade to zero scores, never NPE") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val withNull = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "a b"),
      org.apache.spark.sql.Row(2L, null)).asJava, schema)
    val empty = spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, schema)
    val m = LangModel.trainUnigram(empty, "text", 4)
    assert(m.total == 0L && m.counts.isEmpty)
    val out = LangModel.surprisal(withNull, m, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // degenerate model: every token costs bit_length(0) = 0 bits
    assert(out == Set((1L, 2, 0L), (2L, 0, 0L)))
    assert(LangModel.tfIdf(withNull, Seq("a"), "text", "doc_id").count() == 1L)
    assert(LangModel.bm25(empty, Seq("a"), "text", "doc_id").count() == 0L)
  }

  test("mergeUnigram: incremental training equals whole-corpus training") {
    val a = df(Seq((1L, "spark scan merge spark"), (2L, "the the scan")))
    val b = df(Seq((3L, "batch spark the"), (4L, "scan scan window")))
    val whole = LangModel.trainUnigram(a.union(b), "text", vocabSize = 8)
    val merged = LangModel.mergeUnigram(
      LangModel.trainUnigram(a, "text", vocabSize = 8),
      LangModel.trainUnigram(b, "text", vocabSize = 8), vocabSize = 8)
    assert(merged.total == whole.total)
    assert(merged.counts == whole.counts)
  }

  test("adaptiveThreshold: exact ceil-percentile over an integer histogram") {
    import spark.implicits._
    // scores 1..10, one each: P30 needs ceil(10*30/100)=3 rows -> v=3
    val s = (1L to 10L).toDF("v")
    assert(LangModel.adaptiveThreshold(s, "v", 30) == Some(3L))
    // ties: [1,1,1,9]: need ceil(4*30/100)=2 -> cum(1)=3 >= 2 -> v=1
    val t = Seq(1L, 1L, 1L, 9L).toDF("v")
    assert(LangModel.adaptiveThreshold(t, "v", 30) == Some(1L))
    // pct=100 returns the max; empty input returns None
    assert(LangModel.adaptiveThreshold(s, "v", 100) == Some(10L))
    assert(LangModel.adaptiveThreshold(s.where(lit(false)), "v", 30).isEmpty)
  }

  test("adaptiveThreshold: wide-range score fails loudly at the distinct cap") {
    // a continuous-ish score (every value distinct) must NOT silently haul
    // one histogram row per value to the driver — the family's loud-guard
    // convention
    val wide = spark.range(5000).selectExpr("id * 1000003 AS v")
    val e = intercept[IllegalArgumentException] {
      LangModel.adaptiveThreshold(wide, "v", 30, maxDistinct = 1000)
    }
    assert(e.getMessage.contains("distinct score values"))
    // at-the-cap domains still work exactly (cap is inclusive)
    val narrow = spark.range(5000).selectExpr("id % 10 AS v")
    assert(LangModel.adaptiveThreshold(narrow, "v", 30, maxDistinct = 10) == Some(2L))
  }

  test("compress_ratio flags repetitive text below natural prose") {
    Graft.install(spark)
    val rows = df(Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "Four score and seven years ago our fathers brought forth a new nation")))
      .selectExpr("doc_id", "compress_ratio(text) AS cr")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) < rows(2L))
    assert(rows.values.forall(v => v > 0.0 && v < 2.0))
  }

  test("bigram LM: pair counts and stupid-backoff arithmetic, hand-computed") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val m = graft.ops.LangModel.trainBigram(corpus, "text",
      vocabSize = 16, bigramVocab = 64)
    // unigram: a:3 b:3 c:1 x:1, total 8; bigrams: (a,b):3 (b,a):1 (b,c):1 (b,x):1
    assert(m.uni.total == 8L)
    assert(m.uni.counts == Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "x" -> 1L))
    assert(m.bigrams == Map(("a", "b") -> 3L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("b", "x") -> 1L))
    // score "a b c z": uni(a)=bitLen(8/3)=2; (a,b) hit bitLen(3/3)=1;
    // (b,c) hit bitLen(3/1)=2; (c,z) miss -> 1 + bitLen(8/1)=5; total 10
    val got = graft.ops.LangModel.bigramSurprisal(
        Seq((9L, "a b c z")).toDF("doc_id", "text"), m, "text", "doc_id")
      .collect().head
    assert(got.getInt(1) == 4)
    assert(got.getLong(2) == 10L)
  }

  test("bigram LM: truncation skew (pair kept, context dropped) backs off") {
    import spark.implicits._
    // vocabSize=1 keeps only 'z' (it dominates the unigram counts), so 'q'
    // falls out of top-V: the (q, r) bigram survives top-B but its context
    // count is 0, failing the c1(prev) >= c2 guard — must back off
    val corpus = Seq((1L, "z z z z z q r q r q r")).toDF("doc_id", "text")
    val m = graft.ops.LangModel.trainBigram(corpus, "text",
      vocabSize = 1, bigramVocab = 64)
    assert(m.uni.counts.keySet == Set("z"))
    assert(m.bigrams(("q", "r")) == 3L)
    // doc "q r": uni(q)=OOV -> bitLen(11/1)=4; (q,r): c2=3 but c1(q)=0 -> backoff
    // 1 + uniBits(r)=1+4=5; total 9
    val got = graft.ops.LangModel.bigramSurprisal(
        Seq((9L, "q r")).toDF("doc_id", "text"), m, "text", "doc_id")
      .collect().head
    assert(got.getLong(2) == 9L)
  }
}
