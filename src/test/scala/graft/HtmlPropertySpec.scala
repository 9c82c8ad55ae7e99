package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate for [[TextAnalysis.stripHtml]] — the same
  * treatment `normalizeUrl` got in [[UrlPropertySpec]]. The oracle gate
  * (`q_html_strip`) drives ONE planted page family; this spec drives
  * hostile GENERATED markup (unclosed tags, nested script/style,
  * case-mangled tags, entity torture incl. `&amp;amp;`, null bytes,
  * >64 KB pages) through the Column and checks the operator-level contract
  * no planted family covers:
  *
  *   1. totality — non-null in, non-null out, nothing throws, large pages
  *      complete;
  *   2. whitespace canon — output never contains `\t\n\x0B\f\r`, never a
  *      double space, never leading/trailing space;
  *   3. content routing — planted TEXT tokens survive, planted
  *      script/style BODIES die (including across the cross-nesting shapes
  *      where a single-alternation block regex leaked trailing script
  *      source — the bug this spec found, fixed by two self-matched
  *      passes), and no tag of the generated tag set leaves `<name` /
  *      `</name` residue;
  *   4. entity contract — single-encoded entities never survive literally;
  *      `&amp;` decodes LAST and non-recursively (`&amp;amp;` → `&amp;`,
  *      `&amp;lt;` → `&lt;`);
  *   5. conditional fixpoint — on outputs free of `<` and `&` a second
  *      stripHtml application is the identity. (Unconditional idempotence
  *      is deliberately NOT the contract: entity decode runs AFTER
  *      tag-strip, so `&lt;script&gt;` decodes to literal text
  *      `<script>` that a second pass would eat — pinned by a vector
  *      below.)
  *
  * Generation is seeded (failures reproduce); evaluation is ONE DataFrame
  * pass over all samples with the strip applied twice (s1, s2 = strip(s1))
  * so the fixpoint check costs no extra job. */
class HtmlPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  // ---- hostile markup generator --------------------------------------------
  private val tagNames = Seq("b", "i", "em", "strong", "div", "span", "p", "h1", "li", "a")
  private val attrGen = Gen.oneOf("", " class=\"x y\"", " id='k'", " data-u=\"ü λ\"",
    " href=\"/a?b=1&c=2\"", " style='a:b; c:d'", " CLASS=m", " disabled",
    " onclick='f(1,2)'")

  /** One segment: (html, tokens that must survive, tokens that must die). */
  private def segGen(i: Int): Gen[(String, Seq[String], Seq[String])] = Gen.frequency(
    3 -> (for {
      t <- Gen.oneOf(tagNames); a <- attrGen; up <- Gen.oneOf(false, true)
    } yield {
      val tn = if (up) t.toUpperCase else t
      (s"<$tn$a>tok$i</$tn>", Seq(s"tok$i"), Seq.empty[String])
    }),
    2 -> (for {
      t <- Gen.oneOf("script", "style")
      body <- Gen.oneOf(s"var zap$i = 1 < 2;", s".x>y { color: red } /* zap$i */",
        s"if (a<b && c>d) { zap$i(); }", s"document.write('<div>zap$i</div>');")
    } yield (s"""<$t type="text/x">$body</$t>""", Seq.empty[String], Seq(s"zap$i"))),
    // the cross-nesting shape that leaked under the single-alternation
    // regex: </style> must NOT close a <script> block
    1 -> Gen.const((s"<script>zapa$i <style>zapb$i</style> zapc$i</script>",
      Seq.empty[String], Seq(s"zapa$i", s"zapb$i", s"zapc$i"))),
    2 -> Gen.const((s"tok$i", Seq(s"tok$i"), Seq.empty[String])),
    1 -> Gen.const((s"R&amp;D tok$i &quot;q&quot; &#39;s&#39; a&nbsp;b",
      Seq(s"tok$i"), Seq.empty[String])),
    1 -> Gen.const((s"\t\n tok$i \r\f", Seq(s"tok$i"), Seq.empty[String])))

  private def seqGen[A](gs: Seq[Gen[A]]): Gen[Seq[A]] =
    gs.foldLeft(Gen.const(Seq.empty[A]))((acc, g) => acc.flatMap(xs => g.map(xs :+ _)))

  private case class DocCase(html: String, keep: Seq[String], drop: Seq[String],
                             unclosedTail: Boolean)

  private def docGen(docId: Int): Gen[DocCase] = for {
    n <- Gen.chooseNum(3, 8)
    segs <- seqGen((0 until n).map(j => segGen(docId * 100 + j)))
    seps <- Gen.listOfN(n, Gen.oneOf(" ", "\n", "", "\t", "  ", "\r\n"))
    tail <- Gen.frequency(5 -> Gen.const(""), 1 -> Gen.const("<div class="))
  } yield DocCase(
    segs.zip(seps).map { case ((h, _, _), sp) => h + sp }.mkString,
    segs.flatMap(_._2), segs.flatMap(_._3), tail.nonEmpty)

  // raw garbage over a markup-hostile alphabet (incl. the null byte)
  private val junkGen: Gen[String] = Gen.chooseNum(0, 32).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("<>&;/!\"'= \t\nabAB19#%\u0000üλ".toSeq)).map(_.mkString))

  private def sample[A](g: Gen[A], seed: Long): Option[A] =
    g.apply(Gen.Parameters.default, Seed(seed))

  private val wsClass = Set('\t', '\n', '\u000B', '\f', '\r')

  private def checkCanon(h: String, s1: String): Unit = {
    assert(s1 != null, s"null strip for <$h>")
    assert(!s1.exists(wsClass), s"control ws residue: <$h> -> <$s1>")
    assert(!s1.contains("  "), s"double space: <$h> -> <$s1>")
    // Spark's trim strips SPACES only (a leading null byte stays — Java's
    // String.trim would eat anything <= 0x20, which is NOT the contract)
    assert(!s1.startsWith(" ") && !s1.endsWith(" "), s"not trimmed: <$h> -> <$s1>")
  }

  test("stripHtml fuzz: total, canon-whitespace, routes content, conditional fixpoint") {
    val docs = (0 until 400).flatMap(i => sample(docGen(i), 42L + i))
    val junk = (0 until 200).flatMap(i => sample(junkGen, 7L + i)).distinct
    assert(docs.size == 400, s"doc generator collapsed: ${docs.size}")
    assert(junk.size > 120, s"junk generator collapsed: ${junk.size}")

    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("idx", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false)))
    val all: Seq[String] = docs.map(_.html) ++ junk
    val rows = all.zipWithIndex.map { case (h, i) => Row(i, h) }
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = df.select(col("idx"), col("h"),
        TextAnalysis.stripHtml(col("h")).as("s1"))
      .select(col("idx"), col("h"), col("s1"),
        TextAnalysis.stripHtml(col("s1")).as("s2"))
      .collect().sortBy(_.getInt(0))
    assert(out.length == all.size)

    var fixpointChecked = 0
    out.foreach { r =>
      val (i, h, s1, s2) = (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))
      checkCanon(h, s1)
      // conditional fixpoint: no angle brackets + no ampersands left means
      // a second application can only re-collapse already-canonical ws
      if (!s1.contains('<') && !s1.contains('&')) {
        fixpointChecked += 1
        assert(s2 == s1, s"fixpoint violated: <$h> -> <$s1> -> <$s2>")
      }
      if (i < docs.size) {
        val d = docs(i)
        d.keep.foreach(t => assert(s1.contains(t), s"lost text <$t>: <$h> -> <$s1>"))
        d.drop.foreach(t => assert(!s1.contains(t), s"leaked block <$t>: <$h> -> <$s1>"))
        if (!d.unclosedTail) {
          val lower = s1.toLowerCase
          (tagNames ++ Seq("script", "style")).foreach { t =>
            assert(!lower.contains("<" + t) && !lower.contains("</" + t),
              s"tag residue <$t>: <$h> -> <$s1>")
          }
          // single-encoded entities never survive literally
          Seq("&nbsp;", "&lt;", "&gt;", "&quot;", "&#39;", "&amp;").foreach(e =>
            assert(!s1.contains(e), s"entity residue $e: <$h> -> <$s1>"))
        }
      }
    }
    assert(fixpointChecked >= 100, s"only $fixpointChecked fixpoint-checked samples")
    // the families that motivated the gate really occur in the corpus
    assert(docs.exists(_.drop.exists(_.startsWith("zapa"))), "no cross-nesting doc generated")
    assert(docs.exists(_.unclosedTail), "no unclosed-tail doc generated")
  }

  test("stripHtml vectors: entity ordering, cross-nesting kill, documented edges") {
    val vectors = Seq(
      // &amp; decodes LAST and non-recursively
      "&amp;amp;" -> "&amp;",
      "&amp;lt;escaped" -> "&lt;escaped",
      // the fixed leak: </style> does not close <script>; all three die
      "<script>a<style>b</style>c</script>d" -> "d",
      "<ScRiPt>x</sCrIpT>ok" -> "ok",
      // decoded entities are literal TEXT (tag-strip already ran)
      "&lt;script&gt;alert(1)&lt;/script&gt;" -> "<script>alert(1)</script>",
      // unterminated trailing tag has no '>' to anchor on: survives as text
      // (cross-engine identical — the DuckDB twin shares the regex)
      "a <div" -> "a <div",
      // null bytes are not whitespace and pass through
      "a\u0000b" -> "a\u0000b",
      "<p>a</p>\n\n<p>b</p>" -> "a b",
      "" -> "")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("idx", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false)))
    val df = spark.createDataFrame(
      vectors.zipWithIndex.map { case ((h, _), i) => Row(i, h) }.asJava, schema)
    val got = df.select(col("idx"), TextAnalysis.stripHtml(col("h")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    vectors.zipWithIndex.foreach { case ((h, want), i) =>
      assert(got(i) == want, s"<$h>: got <${got(i)}>, want <$want>")
    }
    // the fixpoint carve-out, demonstrated: the decoded-text form above is
    // markup to a SECOND application (this is why idempotence is gated on
    // '<'-free output)
    val second = df.where(col("idx") === 4)
      .select(TextAnalysis.stripHtml(TextAnalysis.stripHtml(col("h"))).as("s"))
      .collect().head.getString(0)
    assert(second == "")
  }

  test("stripHtml scale: >64 KB pages complete and route correctly") {
    val big = ("<div class='x'>chunk </div>" * 3000) +
      "<script>var zz = 'killbig' + '<div>inner</div>';</script>" +
      ("<p>tail </p>" * 10)
    assert(big.length > 64 * 1024)
    // unclosed script at the head of a large page: the open tag strips, the
    // body survives as text (documented regex semantics — no closer, no
    // block match); the operator must still complete and canon-collapse
    val unclosed = "<script>leak " + ("x" * 70000)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("idx", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false)))
    val df = spark.createDataFrame(
      Seq(Row(0, big), Row(1, unclosed)).asJava, schema)
    val got = df.select(col("idx"), TextAnalysis.stripHtml(col("h")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    checkCanon("big", got(0))
    assert(got(0).contains("chunk") && got(0).contains("tail"))
    assert(!got(0).contains("killbig") && !got(0).contains("inner"))
    checkCanon("unclosed", got(1))
    assert(got(1).startsWith("leak x"))
  }
}
