package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the BPE parity claims over RANDOM corpora: sequential
  * rank-order merge application (the engine's flat-replace algorithm and the
  * SQL oracle's `replace` chain) must agree with the textbook min-rank-rescan
  * encoder on every model the trainer can produce, and encode must always be
  * lossless. Small alphabets force deep, adversarial merge stacks (repeated
  * symbols, overlapping pairs, compound-of-compound merges). */
class BpePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def check(p: Prop, min: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private def docs(words: Seq[String]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      words.zipWithIndex.map { case (w, i) =>
        org.apache.spark.sql.Row(i.toLong, w) }.asJava, schema)
  }

  private val wordGen: Gen[String] =
    for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString

  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(4, 16).flatMap(n => Gen.listOfN(n, wordGen))

  // the textbook formulation: repeatedly merge ALL occurrences of the
  // lowest-rank pair present anywhere in the word, rescanning after each
  private def rescanEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      syms.zip(syms.tail).flatMap(rank.get).minOption match {
        case None => done = true
        case Some(r) =>
          val (a, b) = merges(r)
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

  test("sequential merge application equals min-rank rescan on trained models") {
    check(Prop.forAll(corpusGen) { words =>
      val corpus = docs(words)
      val m = Bpe.train(corpus, "text", numMerges = 12, minCount = 1L)
      val enc = Bpe.encode(corpus, m, "text", "doc_id")
        .orderBy("doc_id").select("tokens")
        .collect().map(_.getSeq[String](0).toSeq)
      words.zip(enc).forall { case (w, got) => got == rescanEncode(w, m.merges) }
    }, min = 15)
  }

  test("dedup index property: every relabeled copy is an exact hit, novel words are not") {
    check(Prop.forAll(corpusGen) { words =>
      val path = java.nio.file.Files.createTempDirectory("graft_prop_idx").toString
      val uniq = words.distinct
      val corpus = docs(uniq)
      graft.ops.Dedup.saveDedupIndex(corpus, "text", "doc_id", path)
      // increment: all corpus docs relabeled (+1000) plus one guaranteed-novel doc
      val inc = docs(uniq).selectExpr("doc_id + 1000 AS doc_id", "text")
        .union(docs(Seq("zzzz qqqq xxxx")).selectExpr("doc_id + 9000 AS doc_id", "text"))
      val got = graft.ops.Dedup.dedupAgainstIndex(inc, "text", "doc_id", path)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) "" else r.getString(2))).toMap
      uniq.indices.forall(i => got(i.toLong + 1000) == "exact") &&
        got(9000L) == ""
    }, min = 10)
  }

  test("encode is lossless and every token is a known symbol") {
    check(Prop.forAll(corpusGen) { words =>
      val corpus = docs(words)
      val m = Bpe.train(corpus, "text", numMerges = 10, minCount = 1L)
      val symbols = (m.merges.map { case (a, b) => a + b } ++
        words.flatMap(_.map(_.toString))).toSet
      val rows = Bpe.encode(corpus, m, "text", "doc_id")
        .orderBy("doc_id").select("tokens")
        .collect().map(_.getSeq[String](0).toSeq)
      words.zip(rows).forall { case (w, toks) =>
        toks.mkString == w && toks.forall(symbols.contains)
      }
    }, min = 15)
  }
}
