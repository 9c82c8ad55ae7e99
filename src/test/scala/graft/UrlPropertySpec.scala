package graft

import graft.ops.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate for [[Curation.normalizeUrl]] / [[Curation.urlDomain]]
  * — the oracle gates plant VARIANT FAMILIES; this spec drives hostile
  * GENERATED urls (and raw garbage) through the same Columns and checks the
  * operator-level contract no planted family can cover:
  *
  *   1. totality — non-null in, non-null out, nothing throws;
  *   2. idempotence — `normalizeUrl` is a fixpoint of itself;
  *   3. `java.net.URI` agreement — where URI parses a hierarchical url with
  *      a host, the normalized scheme and [[Curation.urlDomain]] agree with
  *      URI's own scheme/host extraction (lowercased);
  *   4. `urlDomain ∘ normalizeUrl` is total: NULL exactly on the opaque
  *      (no `://`) values, never an exception.
  *
  * Generation is seeded (failures reproduce); evaluation is ONE DataFrame
  * pass over all samples (the AnalyticsPropertySpec convention — per-sample
  * Spark jobs would be 1000× slower), with the two-step projection the
  * operator's composition note prescribes. */
class UrlPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  // ---- hostile url generator ------------------------------------------------
  private val schemeGen = Gen.oneOf(
    "http", "HTTP", "https", "HtTpS", "ftp", "wss", "HT TP", "", "a+b-c")
  private val hostGen = Gen.oneOf(
    "example.com", "ExAmPlE.CoM", "h", "h.io", "XN--caf-dma.fr", "127.0.0.1",
    "[::1]", "[2001:DB8::1]", "[::80]", "[::1", "h_x.io", "h..io", "h io")
  private val userGen = Gen.oneOf("", "u@", "User:Pa:ss@", "a@b@")
  private val portGen = Gen.oneOf(
    "", ":80", ":443", ":8080", ":080", ":0", ":65536", ":80:80", ":", ":abc")
  private val pathGen = Gen.oneOf(
    "", "/", "//", "/a", "/A/B", "/a/", "/a//", "/a///", "/%2F%zz", "/a b",
    "/a?b", "/déjà/vu", "/:80", "/@at", "/..", "/a/../b", "////")
  private val tokGen = Gen.oneOf(
    "a=1", "B=2", "b=2", "utm_source=x", "UTM_Medium=Y", "FBCLID=9",
    "gclid=1", "GCLid=", "", "k", "k=", "=v", "k=v=w", "a=%20", "utm=keepme",
    "xutm_source=keep")
  private val queryGen = Gen.oneOf(
    Gen.const(""), Gen.const("?"),
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, tokGen))
      .map(ts => "?" + ts.mkString("&")))
  private val fragGen = Gen.oneOf("", "#", "#Frag", "#a?b=1", "#x://y")
  private val padGen = Gen.oneOf("", " ", "  ")
  private val urlGen: Gen[String] = for {
    l <- padGen; s <- schemeGen; u <- userGen; h <- hostGen; p <- portGen
    pa <- pathGen; q <- queryGen; f <- fragGen; r <- padGen
  } yield s"$l$s://$u$h$p$pa$q$f$r"
  // raw garbage: arbitrary short strings over a url-hostile alphabet
  private val junkGen: Gen[String] = Gen.chooseNum(0, 24).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("abAB19:/?#[]@&=%. \t~üλ".toSeq)).map(_.mkString))

  private def samples(g: Gen[String], n: Int, seed: Long): Seq[String] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("normalizeUrl fuzz: total, idempotent, URI-agreeing on 1200 hostile urls") {
    val raws = (samples(urlGen, 1000, 42L) ++ samples(junkGen, 200, 7L)).distinct
    assert(raws.size > 800, s"generator collapsed: ${raws.size} distinct")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("u", StringType, nullable = false)))
    val df = spark.createDataFrame(raws.map(Row(_)).asJava, schema)
    // two-step projections (the operator's composition contract): norm is
    // materialized once, then norm2/domain derive from the column
    val out = df.select(col("u"), Curation.normalizeUrl(col("u")).as("norm"))
      .select(col("u"), col("norm"),
        Curation.normalizeUrl(col("norm")).as("norm2"),
        Curation.urlDomain(col("norm")).as("domain"))
      .collect()
    assert(out.length == raws.size)
    var uriChecked = 0
    out.foreach { r =>
      val (u, norm) = (r.getString(0), r.getString(1))
      val norm2 = r.getString(2)
      val domain = Option(r.getString(3))
      // 1. totality
      assert(norm != null, s"null norm for <$u>")
      // 2. idempotence
      assert(norm2 == norm, s"not idempotent: <$u> -> <$norm> -> <$norm2>")
      // 4. urlDomain totality: null iff opaque
      assert(domain.isEmpty == !norm.contains("://"),
        s"domain null-contract: <$u> -> <$norm> domain=$domain")
      // 3. URI agreement where java.net.URI parses a hierarchical url
      val uri = try Some(new java.net.URI(u.trim)) catch { case _: Exception => None }
      for (p <- uri if p.getScheme != null && p.getHost != null
           && u.trim.contains("://")) {
        uriChecked += 1
        assert(norm.startsWith(p.getScheme.toLowerCase + "://"),
          s"scheme disagrees with URI: <$u> -> <$norm>, URI=${p.getScheme}")
        assert(domain.contains(p.getHost.toLowerCase),
          s"host disagrees with URI: <$u> -> domain=$domain, URI=${p.getHost}")
      }
    }
    // agreement must not be vacuous: a healthy share of the generated urls
    // parses under java.net.URI and went through property 3
    assert(uriChecked >= 100, s"only $uriChecked URI-parsed samples")
    // the families that motivated the gate really occur in the corpus
    assert(raws.exists(u => u.contains("UTM_") || u.contains("FBCLID")))
    assert(raws.exists(_.contains("//" + "a")) || raws.exists(_.contains("a//")))
  }
}
