package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, String, String)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("source", StringType, nullable = false)))
    spark.createDataFrame(
      rows.map { case (i, t, s) => org.apache.spark.sql.Row(i, t, s) }.asJava, schema)
  }

  test("tokenBudgetMix: monotone prefix cut per stratum, deterministic order") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("src", StringType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tok", IntegerType, nullable = false)))
    val rows = (0L until 20L).map(i =>
      org.apache.spark.sql.Row(if (i < 10) "a" else "b", i, 10 + (i % 3).toInt))
    val docs = spark.createDataFrame(rows.asJava, schema)
    val out = Curation.tokenBudgetMix(docs, "src", "doc_id", "n_tok",
      budget = 40, salt = "t").collect()
    // every stratum's kept set fits the budget and one more doc would not
    val byStratum = out.groupBy(_.getString(0))
    assert(byStratum.keySet == Set("a", "b"))
    byStratum.foreach { case (_, rs) =>
      val total = rs.map(_.getLong(2)).sum
      assert(total <= 40 && total >= 40 - 12) // can't fit another 10..12-tok doc
      // cum column really is the running sum in the emitted order
      assert(rs.map(_.getLong(3)).max == total)
    }
    // deterministic: same salt → same rows
    val again = Curation.tokenBudgetMix(docs, "src", "doc_id", "n_tok",
      budget = 40, salt = "t").collect().map(_.getLong(1)).toSet
    assert(again == out.map(_.getLong(1)).toSet)
    // different salt → different prefix (deterministic hashes: this either
    // always holds or never does — verified to differ for salts t/u here)
    val other = Curation.tokenBudgetMix(docs, "src", "doc_id", "n_tok",
      budget = 40, salt = "u").collect().map(_.getLong(1)).toSet
    assert(other != again)
  }

  test("normalizeUrl: canonical form for every contract rule; opaque passthrough") {
    import spark.implicits._
    val cases = Seq(
      // fragment + default port + trailing slash + tracking + unsorted params
      "HTTP://Example.COM:80/a/?b=2&utm_source=x&a=1#frag" ->
        "http://example.com/a?a=1&b=2",
      "https://HOST.net:443/P/Q" -> "https://host.net/P/Q", // path case kept
      "http://h.io:8080/x" -> "http://h.io:8080/x",         // explicit port kept
      "http://h.io" -> "http://h.io/",                      // empty path -> /
      "http://h.io/?" -> "http://h.io/",                    // bare ? dropped
      "http://h.io/a?fbclid=1&gclid=2&utm_x=3" -> "http://h.io/a", // all tracked
      "http://h.io/a?UTM_SOURCE=x&B=2" -> "http://h.io/a?B=2", // case-insens family
      "  http://h.io/a  " -> "http://h.io/a",               // trimmed
      "http://h.io/a//" -> "http://h.io/a",                 // ALL trailing slashes
      "http://h.io:80:80/x" -> "http://h.io:80:80/x",       // junk port kept WHOLE
      "https://[2001:DB8::1]:443/x" -> "https://[2001:db8::1]/x", // IPv6 + port
      "http://[::80]/x" -> "http://[::80]/x",               // bracketed, no port
      "HTTP://User@H.io:80/x" -> "http://user@h.io/x",      // userinfo preserved
      "mailto-like-opaque-value" -> "mailto-like-opaque-value") // no :// -> as-is
    val got = cases.map(_._1).toDF("u")
      .select(graft.ops.Curation.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
    // domain of the normalized forms
    val doms = cases.map(_._2).toDF("u")
      .select(graft.ops.Curation.urlDomain(col("u")).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(doms == Seq(Some("example.com"), Some("host.net"), Some("h.io"),
      Some("h.io"), Some("h.io"), Some("h.io"), Some("h.io"), Some("h.io"),
      Some("h.io"), Some("h.io"), Some("[2001:db8::1]"), Some("[::80]"),
      Some("h.io"), None))
  }

  test("c4Filter: every line rule and page rule fires; clean pages survive") {
    val good = "This sentence has more than five words in it.\n" +
      "Another perfectly fine sentence follows right here now.\n" +
      "A third keeps the page over the sentence minimum."
    val pages = df(Seq(
      (1L, good, "s"),                                           // clean pass
      (2L, good + "\nPlease enable javascript to see this page.", "s"), // js line dropped, page ok
      (3L, good + "\nlorem ipsum dolor sit amet.", "s"),          // page killed
      (4L, good + "\nvar x = { a: 1 }", "s"),                     // brace kills page
      (5L, "Only two sentences survive this cleaning pass here.\n" +
           "And here is exactly the second surviving one.", "s"), // < 3 sentences
      (6L, "no terminal punctuation on this line\nShort one.\n" + good, "s")))
    val out = Curation.c4Filter(pages, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(6)).toSeq ==
      Seq(true, true, false, false, false, true))
    // page 2: the javascript line is dropped but the 3 good lines remain
    assert(out(1).getInt(2) == 3)
    // page 6: the two junk lines are dropped, clean_text is just `good`
    assert(out(5).getString(7) == good)
    // page 1 sentence count = 3 terminal marks
    assert(out(0).getInt(3) == 3)
    // killed pages carry NULL clean_text but still report counts
    assert(out(2).isNullAt(7) && out(2).getBoolean(4))
    assert(out(3).isNullAt(7) && out(3).getBoolean(5))
  }

  test("c4Filter is map-only: no exchange in the plan") {
    val pages = df(Seq((1L, "One fine sentence with enough words here.", "s")))
    val plan = Curation.c4Filter(pages, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("decontaminate flags only corpus docs sharing an n-gram with the benchmark") {
    val bench = df(Seq((100L, "the secret eval answer is forty two exactly", "b")))
    val corpus = df(Seq(
      (1L, "a doc quoting the secret eval answer is forty two exactly verbatim", "c"),
      (2L, "completely unrelated text with no overlap at all whatsoever here", "c")))
    val hits = Curation.decontaminate(corpus, bench, "text", "doc_id", n = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L))
  }

  test("decontaminate broadcast side: plan broadcasts the benchmark n-grams") {
    val bench = df(Seq((100L, "alpha beta gamma delta epsilon zeta", "b")))
    val corpus = df(Seq((1L, "alpha beta gamma delta epsilon zeta eta", "c")))
    val plan = Curation.decontaminate(corpus, bench, "text", "doc_id", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("dedupSentences keeps first global occurrence and reassembles in order") {
    val docs = df(Seq(
      (1L, "Shared sentence one. Unique to one.", "s"),
      (2L, "Shared sentence one. Unique to two. Another bit.", "s"),
      (3L, "Shared sentence one.", "s"))) // fully duplicate -> vanishes
    val out = Curation.dedupSentences(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Shared sentence one Unique to one")
    assert(out(2L) == "Unique to two Another bit")
    assert(!out.contains(3L))
  }

  test("dedupSpans removes covered spans, keeps short docs, drops exact copies") {
    Graft.install(spark)
    val docs = df(Seq(
      // doc 1 is the first occurrence of everything it holds
      (1L, "a b c d e f g h novel1 novel2", "s"),
      // doc 2 repeats doc 1's leading 8-gram then diverges: the 8 covered
      // tokens go, the tail survives
      (2L, "a b c d e f g h tail1 tail2 tail3", "s"),
      // doc 3 is an exact copy of doc 1: fully covered, disappears
      (3L, "a b c d e f g h novel1 novel2", "s"),
      // doc 4 is shorter than n: carries no grams, survives intact
      (4L, "tiny doc", "s")))
    val out = Curation.dedupSpans(docs, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d e f g h novel1 novel2")
    assert(out(2L) == "tail1 tail2 tail3")
    assert(!out.contains(3L))
    assert(out(4L) == "tiny doc")
  }

  test("gram_fingerprints equals doc_fingerprint over joined n-gram slices") {
    Graft.install(spark)
    // unicode + varied token lengths: the streamed-bytes kernel must match
    // the string-building formulation byte-for-byte, including multi-byte
    // UTF-8 and the n > size empty case
    val docs = df(Seq(
      (1L, "a b c d e f g h i", "s"),
      (2L, "héllo wörld ζeta x y z", "s"),
      (3L, "one two", "s"),
      (4L, "repeated repeated repeated repeated", "s")))
    for (n <- Seq(2, 3, 8)) {
      val got = docs.selectExpr("doc_id",
          s"gram_fingerprints(filter(split(text, '\\\\s+'), t -> t != ''), $n) AS fps")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = docs.selectExpr("doc_id",
          s"""CASE WHEN size(filter(split(text, '\\\\s+'), t -> t != '')) >= $n
             |THEN transform(sequence(0, size(filter(split(text, '\\\\s+'), t -> t != '')) - $n),
             |  i -> doc_fingerprint(array_join(slice(filter(split(text, '\\\\s+'), t -> t != ''), i + 1, $n), ' ')))
             |ELSE array() END AS fps""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"n=$n")
    }
  }

  test("semanticDecontaminate flags only near-benchmark vectors, broadcast side") {
    Graft.install(spark)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    def vec(seed: Int) =
      Array.tabulate(64)(i => (math.sin(seed * 64 + i) * 0.5).toFloat)
    def df0(rows: Seq[(Long, Array[Float])]) = spark.createDataFrame(
      rows.map { case (i, v) => org.apache.spark.sql.Row(i, v.toSeq) }.asJava, schema)
    val bench = df0(Seq(1L -> vec(1), 2L -> vec(2)))
    val corpus = df0(Seq(
      10L -> vec(1),                                  // copy of bench 1
      11L -> vec(1).updated(0, vec(1)(0) + 1e-4f),    // near copy of bench 1
      12L -> vec(7)))                                 // unrelated
    val out = graft.ops.Curation
      .semanticDecontaminate(corpus, bench, "vec_id", "embedding", tau = 0.99)
    assert(out.queryExecution.executedPlan.toString.contains("Broadcast"))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 11L -> 1L))
  }

  test("stratifiedSample is deterministic, salt-sensitive, and rate-monotone") {
    val docs = df((1L to 400L).map(i => (i, s"text $i", s"src${i % 4}")))
    def ids(salt: String, rate: Int) =
      Curation.stratifiedSample(docs, "doc_id", salt, lit(rate))
        .collect().map(_.getLong(0)).toSet
    val a = ids("mix", 300)
    assert(a == ids("mix", 300))            // reproducible
    assert(a != ids("other", 300))          // salt-independent sample
    assert(a.subsetOf(ids("mix", 700)))     // higher rate is a superset
    assert(a.nonEmpty && a.size < 400)
  }

  test("upsample repeats by per-row weight, drops non-positive, stays map-only") {
    val docs = df(Seq((0L, "drop me", "s"), (1L, "once", "s"),
      (3L, "thrice", "s"), (7L, "negative", "s"), (9L, "null weight", "s")))
    val out = Curation.upsample(docs, expr(
      "CASE WHEN doc_id = 7 THEN -2 WHEN doc_id = 9 THEN CAST(NULL AS INT) ELSE CAST(doc_id AS INT) END"))
    val got = out.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("copy")))
    assert(got.toSet == Set((1L, 0), (3L, 0), (3L, 1), (3L, 2)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("packSequences greedy first-fit per stratum in id order") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("src", StringType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tok", IntegerType, nullable = false)))
    val rows = Seq(("a", 1L, 300), ("a", 2L, 200), ("a", 3L, 20), ("a", 4L, 700),
      ("a", 5L, 100), ("b", 6L, 512), ("b", 7L, 1)).map {
      case (s, i, n) => org.apache.spark.sql.Row(s, i, n) }
    val docs = spark.createDataFrame(rows.asJava, schema)
    val out = Curation.packSequences(docs, "src", "doc_id", "n_tok", budget = 512)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(2), r.getInt(3))).toMap
    // a: 300+200 fit (500), +20 fits (520 > 512? no: 500+20=520 > 512 -> new bin)
    assert(out(("a", 1L)) == (0, 300))
    assert(out(("a", 2L)) == (0, 500))
    assert(out(("a", 3L)) == (1, 20))   // 500+20 > 512 -> bin 1
    assert(out(("a", 4L)) == (2, 700))  // oversize doc gets its own bin
    assert(out(("a", 5L)) == (3, 100))  // 700+100 > 512 -> next bin
    assert(out(("b", 6L)) == (0, 512))
    assert(out(("b", 7L)) == (1, 1))    // 512+1 > 512 -> new bin
  }
}
