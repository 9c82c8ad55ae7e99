package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def docs(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava, schema)
  }

  // Independent encoder: the textbook min-rank-rescan formulation. Used to
  // check that the engine's sequential flat-replace application agrees on
  // every model the trainer can produce.
  private def rescanEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val best = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        .sortBy(identity).headOption
      best match {
        case None => done = true
        case Some((r, _)) =>
          val (a, b) = merges(r)
          // merge ALL occurrences of this pair left-to-right, then rescan
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
      }
    }
    syms
  }

  test("train learns the most frequent pair first, ties to smallest pair") {
    // 'ab' x3, 'ac' x1: (a,b)=3 beats (a,c)=1; (a,c) below minCount=2 stops.
    val m = Bpe.train(docs(Seq((1L, "ab ab ab ac"))), "text", numMerges = 8)
    assert(m.merges == Seq("a" -> "b"))
    // with minCount=1 the second merge is learned too
    val m1 = Bpe.train(docs(Seq((1L, "ab ab ab ac"))), "text", numMerges = 8, minCount = 1L)
    assert(m1.merges == Seq("a" -> "b", "a" -> "c"))
  }

  test("train cascades: compounds are learned after their components") {
    val m = Bpe.train(docs(Seq((1L, "abc abc abc ab"))), "text", numMerges = 4)
    assert(m.merges == Seq("a" -> "b", "ab" -> "c"))
  }

  test("tie-break is deterministic: equal counts pick lexicographically smallest") {
    // 'xy' and 'ab' both appear twice; (a,b) < (x,y)
    val m = Bpe.train(docs(Seq((1L, "xy xy ab ab"))), "text", numMerges = 1)
    assert(m.merges == Seq("a" -> "b"))
  }

  test("encode applies merges in rank order with full cascades") {
    val m = Bpe.BpeModel(Seq("t" -> "h", "th" -> "e"))
    val out = Bpe.encode(docs(Seq((1L, "the thermal tee"))), m, "text", "doc_id")
      .select(array_join(col("tokens"), "|"), col("n_tok")).head
    assert(out.getString(0) == "the|the|r|m|a|l|t|e|e")
    assert(out.getInt(1) == 9)
  }

  test("encode merges left-to-right non-overlapping on repeated symbols") {
    val m = Bpe.BpeModel(Seq("a" -> "a"))
    val out = Bpe.encode(docs(Seq((1L, "aaa aaaa"))), m, "text", "doc_id")
      .select(array_join(col("tokens"), "|")).head.getString(0)
    assert(out == "aa|a|aa|aa")
  }

  test("null and empty text encode to zero tokens") {
    val out = Bpe.encode(docs(Seq((1L, null), (2L, "   "))),
        Bpe.BpeModel(Seq("a" -> "b")), "text", "doc_id")
      .orderBy("doc_id").select("n_tok").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 0))
  }

  test("sequential application equals min-rank rescan on trained models") {
    // random-ish corpus over a tiny alphabet makes deep merge stacks
    val words = Seq("abab", "ababab", "aabb", "baba", "abba", "bab", "abab",
      "aaab", "abab", "bbaa", "ababa", "abab", "aab", "ab")
    val corpus = docs(words.zipWithIndex.map { case (w, i) => (i.toLong, w) })
    val m = Bpe.train(corpus, "text", numMerges = 10, minCount = 1L)
    assert(m.merges.nonEmpty)
    val enc = Bpe.encode(corpus, m, "text", "doc_id")
      .orderBy("doc_id").select("tokens").collect().map(_.getSeq[String](0).toSeq)
    words.zip(enc).foreach { case (w, got) =>
      assert(got == rescanEncode(w, m.merges), s"word $w")
    }
  }

  test("roundtrip: token concatenation rebuilds the word stream") {
    val corpus = docs(Seq((1L, "spark scan merge spark scan"), (2L, "window window sort")))
    val out = Bpe.tokenize(corpus, "text", "doc_id", numMerges = 16)
      .orderBy("doc_id")
      .select(concat_ws("", col("tokens"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("sparkscanmergesparkscan", "windowwindowsort"))
  }

  test("training is deterministic across repeated runs") {
    val corpus = docs(Seq((1L, "spark scan merge batch table the the"),
      (2L, "batch stream spark spark scan")))
    val a = Bpe.train(corpus, "text", numMerges = 12, minCount = 1L)
    val b = Bpe.train(corpus, "text", numMerges = 12, minCount = 1L)
    assert(a.merges == b.merges)
  }

  test("encode is map-only: no exchange in the plan") {
    val m = Bpe.BpeModel(Seq("a" -> "b"))
    val plan = Bpe.encode(docs(Seq((1L, "ab"))), m, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("nTokCol matches encode's n_tok column") {
    val corpus = docs(Seq((1L, "spark scan merge"), (2L, "the the windows")))
    val m = Bpe.train(corpus, "text", numMerges = 6, minCount = 1L)
    val viaCol = corpus.select(col("doc_id"), Bpe.nTokCol(corpus, m, "text").as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq
    val viaEncode = Bpe.encode(corpus, m, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getInt(2)).toSeq
    assert(viaCol == viaEncode)
  }

  test("reserved bracket code points are stripped from input words") {
    val m = Bpe.BpeModel(Seq("a" -> "b"))
    val out = Bpe.encode(docs(Seq((1L, "a\u0001b a\u0002\u0001b"))), m, "text", "doc_id")
      .select(array_join(col("tokens"), "|")).head.getString(0)
    assert(out == "ab|ab")
  }
}
