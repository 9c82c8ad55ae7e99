package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests mirroring the reference's conformance corpus (FIXTURES.md §A;
  * reference `arrow-udf/tests/tests.rs`). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql1(q: String): Row = spark.sql(q).collect().head

  test("normalize_text: casefold, NFC composition, whitespace collapse, trim") {
    // decomposed e + combining acute must compose to é; tabs/newlines
    // collapse; ends trimmed; case folds
    assert(sql1("SELECT normalize_text('  Cafe\u0301 \t DU\nJOUR  ')")
      .getString(0) == "caf\u00e9 du jour")
    assert(sql1("SELECT normalize_text('')").getString(0) == "")
    assert(sql1("SELECT normalize_text(CAST(NULL AS STRING))").isNullAt(0))
    // vertical tab is in the explicit collapse class (Java \s has it,
    // RE2 \s doesn't — the class is spelled out on both sides)
    assert(sql1("SELECT normalize_text('a\u000Bb')").getString(0) == "a b")
  }

  test("blocklist_matches: automaton ≡ naive contains on dense random cases") {
    val rnd = new scala.util.Random(42)
    val ab = "abc" // dense alphabet stresses the fail links
    for (_ <- 1 to 300) {
      val pats = (1 to rnd.nextInt(6) + 1)
        .map(_ => (1 to rnd.nextInt(4) + 1).map(_ => ab(rnd.nextInt(3))).mkString)
        .distinct
      val text = (1 to rnd.nextInt(30)).map(_ => ab(rnd.nextInt(3))).mkString
      val got = graft.ops.Blocklist.matches(text, pats)
      val want = pats.filter(text.contains).sorted
      assert(got == want, s"text=$text pats=$pats got=$got want=$want")
    }
    // overlapping pattern inside a longer phrase, via the SQL surface
    assert(sql1("""SELECT array_join(blocklist_matches('xfast keyy',
        array('ast', 'fast key', 'zz')), ',')""").getString(0) == "ast,fast key")
    assert(sql1("SELECT size(blocklist_matches('abc', array('zz')))").getInt(0) == 0)
    // empty patterns fail loudly instead of silently diverging from the
    // contains-replay contract ('' matches every text under contains)
    assertThrows[Exception] {
      graft.ops.Blocklist.matches("abc", Seq("a", ""))
    }
  }

  test("compress_ratio bounds on deterministic fixtures + roundtrip identity") {
    // ratio MAGNITUDES have no cross-engine oracle (DEFLATE isn't in SQL),
    // so they are pinned here as BOUNDS robust to zlib version drift:
    // pure repetition compresses below 2%, seeded pseudo-random hex stays
    // above 30%, natural prose lands in between; empty input is 1.0 by
    // convention; and inflate(deflate(s)) == s on every shape incl. unicode
    val rep = "a" * 4000
    val rnd = new scala.util.Random(7)
    val hex = (1 to 4000).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "inspects forty-two parquet files before lunch ") * 40
    val uni = "héllo wörld é世界 " * 100
    import graft.ops.Zlib
    assert(Zlib.ratio("") == 1.0)
    assert(Zlib.ratio(rep) < 0.02, s"repetitive ratio ${Zlib.ratio(rep)}")
    assert(Zlib.ratio(hex) > 0.30, s"random-hex ratio ${Zlib.ratio(hex)}")
    val pr = Zlib.ratio(prose)
    assert(pr > 0.01 && pr < 0.5, s"prose ratio $pr")
    Seq("", "a", rep, hex, prose, uni).foreach { s =>
      assert(Zlib.roundtripOk(s), s"roundtrip failed on len=${s.length}")
    }
    // SQL surface: the three oracle-pinned flags must all be 1
    graft.Graft.install(spark)
    val r = spark.sql(
      """SELECT CAST(compress_roundtrip_ok(t) AS INT) AS a,
        |  CAST(compress_ratio(t) > 0.0 AS INT) AS b,
        |  CAST(compress_ratio(t || t) <= compress_ratio(t) + 0.001 AS INT) AS c
        |FROM VALUES ('some repeated text some repeated text') v(t)""".stripMargin)
      .collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((1, 1, 1)))
  }

  test("blocklist memo: cycling through >64 pattern lists stays correct (bounded eviction)") {
    // 200 distinct lists blow the 64-entry memo several times over; every
    // call must still answer correctly (eviction only ever costs a rebuild,
    // and never evicts the entry being used)
    for (i <- 0 until 200) {
      val pats = Seq(s"pat$i", "shared")
      val got = graft.ops.Blocklist.matches(s"xx pat$i yy shared", pats)
      assert(got == Seq(s"pat$i", "shared").sorted, s"i=$i got=$got")
    }
  }

  test("stripHtml: blocks, tags, entity order, whitespace, case-insensitivity") {
    import org.apache.spark.sql.functions._
    def strip(s: String): String = spark.range(1)
      .select(graft.ops.TextAnalysis.stripHtml(lit(s)).as("c"))
      .collect().head.getString(0)
    // script/style content vanishes entirely, tags become separators
    assert(strip("<p>a</p><script>var x = 1 < 2;</script><b>b</b>") == "a b")
    assert(strip("<STYLE>h1 { x }</STYLE>keep") == "keep")
    // &amp; decodes LAST: &amp;lt; is the text "&lt;", not "<"
    assert(strip("x &amp;lt; y &lt; z") == "x &lt; y < z")
    assert(strip("a&nbsp;b &quot;c&quot; &#39;d&#39; e&gt;f") ==
      "a b \"c\" 'd' e>f")
    // whitespace collapse + trim
    assert(strip("  a\n\n<br>\t b ") == "a b")
    assert(strip("") == "")
  }

  test("jaro_winkler: classic values, boost threshold, degenerate inputs") {
    // classic record-linkage pairs (Winkler 1990 examples)
    assert(sql1("SELECT jaro_winkler('MARTHA', 'MARHTA')").getDouble(0)
      === 0.9611111111111111)
    assert(sql1("SELECT jaro_winkler('DIXON', 'DICKSONX')").getDouble(0)
      === 0.8133333333333332)
    // below the 0.7 boost threshold the shared prefix must NOT boost
    assert(sql1("SELECT jaro_winkler('abcdef', 'abzzzz')").getDouble(0)
      === 0.5555555555555555)
    assert(sql1("SELECT jaro_winkler('same', 'same')").getDouble(0) === 1.0)
    assert(sql1("SELECT jaro_winkler('', 'abc')").getDouble(0) === 0.0)
    // window 0 on 2-char strings: transposed pair has no in-window match
    assert(sql1("SELECT jaro_winkler('ab', 'ba')").getDouble(0) === 0.0)
    assert(sql1("SELECT jaro_winkler(CAST(NULL AS STRING), 'x')").isNullAt(0))
    // BYTE-level like DuckDB: é/è share their UTF-8 lead byte, so m=5 of 6
    // bytes and prefix 2 — a UTF-16 char-level variant would say 0.88
    assert(sql1("SELECT jaro_winkler('héllo', 'hèllo')").getDouble(0)
      === 0.9111111111111112)
  }

  test("gcd: value, null-skip, both overloads") {
    assert(sql1("SELECT gcd(25, 15)").getInt(0) == 5)
    assert(sql1("SELECT gcd(CAST(NULL AS INT), 15)").isNullAt(0))
    assert(sql1("SELECT gcd(CAST(25 AS BIGINT), CAST(15 AS BIGINT))").getLong(0) == 5L)
  }

  test("div error column: (1,0) fails, (-1,-1) ok, null in -> null out") {
    val r = spark.sql(
      """SELECT graft_div(x, y) AS d FROM VALUES (1, 0), (-1, -1), (CAST(NULL AS INT), CAST(NULL AS INT)) t(x, y)""")
      .select("d.value", "d.error").collect()
    assert(r(0).isNullAt(0) && r(0).getString(1) == "division by zero")
    assert(r(1).getInt(0) == 1 && r(1).isNullAt(1))
    assert(r(2).isNullAt(0) && r(2).isNullAt(1))
  }

  test("option_add: CalledOnNullInput treats null as 0") {
    assert(sql1("SELECT option_add(1, CAST(NULL AS INT))").getInt(0) == 1)
    assert(sql1("SELECT option_add(CAST(NULL AS INT), CAST(NULL AS INT))").getInt(0) == 0)
  }

  test("split and array round trip") {
    assert(sql1("SELECT graft_split('a,b', ',')").getSeq[String](0) == Seq("a", "b"))
    assert(sql1("SELECT array_sum(array(1, 2, NULL, 4))").getInt(0) == 7)
  }

  test("key_value struct return; malformed -> null struct") {
    val ok = sql1("SELECT key_value('a=b') AS kv")
    assert(ok.getStruct(0) == Row("a", "b"))
    assert(sql1("SELECT key_value('??')").isNullAt(0))
  }

  test("range_setof: generator with null skip, large input stays lazy") {
    val r = spark.sql(
      "SELECT x, t.value FROM VALUES (1), (CAST(NULL AS INT)), (3) v(x) LATERAL VIEW range_setof(x) t AS value")
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getInt(1))).toSeq
    assert(r == Seq((1, 0), (3, 0), (3, 1), (3, 2)))
    // 1M rows generated lazily, limit pushes down into the iterator
    assert(spark.sql("SELECT t.value FROM VALUES (1000000) v(x) LATERAL VIEW range_setof(x) t AS value LIMIT 5")
      .count() == 5)
  }

  test("json_array_elements: values + error row") {
    val r = spark.sql(
      """SELECT t.value, t.error FROM VALUES ('[1, null, ""]'), ('not json') v(x)
        |LATERAL VIEW json_array_elements(x) t AS value, error""".stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq == Seq(
      ("1", null), ("null", null), ("\"\"", null), (null, "not a json array")))
  }

  test("many_args: 16-arg signature") {
    val args = (1 to 16).mkString(", ")
    assert(sql1(s"SELECT many_args($args)").getInt(0) == 136)
  }

  test("variadic concat_sep") {
    assert(sql1("SELECT concat_sep('|', 'a', 'b', 'c')").getString(0) == "a|b|c")
    assert(sql1("SELECT concat_sep('|', 'a')").getString(0) == "a")
  }

  test("overloads: graft_length on string and binary") {
    assert(sql1("SELECT graft_length('héllo')").getInt(0) == 5)
    assert(sql1("SELECT graft_length(CAST('héllo' AS BINARY))").getInt(0) == 6) // utf-8 bytes
  }

  test("fnv64 and poly_hash are stable") {
    assert(sql1("SELECT fnv64('abc')").getLong(0) == sql1("SELECT fnv64('abc')").getLong(0))
    assert(sql1("SELECT poly_hash('abc')").getLong(0) ==
      (('a'.toLong * 31 + 'b') * 31 + 'c') % 1000000007L)
  }

  test("identity over the type matrix (reference identity_all_types fixture)") {
    val r = spark.sql(
      """SELECT graft_identity(true), graft_identity(CAST(7 AS TINYINT)),
        |       graft_identity(CAST(7 AS SMALLINT)), graft_identity(7),
        |       graft_identity(CAST(7 AS BIGINT)), graft_identity(CAST(1.5 AS FLOAT)),
        |       graft_identity(CAST(1.5 AS DOUBLE)), graft_identity('s'),
        |       graft_identity(CAST('b' AS BINARY)), graft_identity(DATE '2022-04-08'),
        |       graft_identity(TIMESTAMP_NTZ '2022-04-08 12:34:56'),
        |       graft_identity(array('a', 'b')),
        |       graft_identity(named_struct('key', 'k', 'value', 'v')),
        |       graft_identity(map('a', '1')),
        |       graft_identity(make_interval(0, 0, 0, 2, 1, 0, 0)),
        |       graft_identity(CAST(NULL AS INT))""".stripMargin).collect().head
    assert(r.getBoolean(0))
    assert(r.getByte(1) == 7 && r.getShort(2) == 7 && r.getInt(3) == 7 && r.getLong(4) == 7L)
    assert(r.getFloat(5) == 1.5f && r.getDouble(6) == 1.5)
    assert(r.getString(7) == "s" && new String(r.getAs[Array[Byte]](8)) == "b")
    assert(r.getDate(9).toString == "2022-04-08")
    assert(r.getAs[java.time.LocalDateTime](10).toString == "2022-04-08T12:34:56")
    assert(r.getSeq[String](11) == Seq("a", "b"))
    assert(r.getStruct(12) == org.apache.spark.sql.Row("k", "v"))
    assert(r.getMap[String, String](13) == Map("a" -> "1"))
    assert(r.get(14).toString.contains("2 days"))
    assert(r.isNullAt(15)) // CalledOnNullInput passes null through
  }

  test("decimal extension type: arbitrary-precision text arithmetic") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      Graft.tagged(lit("0.0001"), "a", graft.types.GraftType.DecimalExt),
      Graft.tagged(lit("0.0002"), "b", graft.types.GraftType.DecimalExt))
    assert(df.selectExpr("decimal_add(a, b)").collect().head.getString(0) == "0.0003")
    // untagged strings must NOT resolve to the decimal overload
    val e = intercept[Exception](
      spark.sql("SELECT decimal_add('1', '2')").collect())
    assert(e.getMessage.contains("no overload"))
  }

  test("graft_to_json across types") {
    val r = spark.sql(
      """SELECT graft_to_json('a"b'), graft_to_json(7), graft_to_json(true),
        |       graft_to_json(array(1, 2)),
        |       graft_to_json(named_struct('key', 'k', 'value', 'v'))""".stripMargin)
      .collect().head
    assert(r.getString(0) == "\"a\\\"b\"")
    assert(r.getString(1) == "7")
    assert(r.getString(2) == "true")
    assert(r.getString(3) == "[1,2]")
    assert(r.getString(4) == "{\"key\":\"k\",\"value\":\"v\"}")
  }

  test("json_get: extension-typed array access (jsonb_access fixture)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      Graft.tagged(lit("""[1, null, ""]"""), "j", graft.types.GraftType.JsonExt))
    val r = df.selectExpr("json_get(j, 0)", "json_get(j, 1)", "json_get(j, 2)",
      "json_get(j, 9)").collect().head
    assert(r.getString(0) == "1")
    assert(r.getString(1) == "null") // JSON null literal, not SQL NULL
    assert(r.getString(2) == "\"\"")
    assert(r.isNullAt(3)) // out of bounds -> SQL NULL
    // untagged strings must not resolve
    val e = intercept[Exception](spark.sql("SELECT json_get('[1]', 0)").collect())
    assert(e.getMessage.contains("no overload"))
  }

  test("datetime(date, time64) -> timestamp composition") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      expr("DATE '2022-04-08'").as("d"),
      Graft.tagged(lit(45296789012L), "t", graft.types.GraftType.TimeExt)) // 12:34:56.789012
    val r = df.selectExpr("datetime(d, t)").collect().head
    assert(r.getAs[java.time.LocalDateTime](0).toString == "2022-04-08T12:34:56.789012")
  }

  test("deterministic=false survives: volatile function not constant-folded") {
    graft.functions.Udf.scalar1[Int, Int]("graft_rand_like(int) -> int",
      deterministic = false)(n => n)
    Graft.install(spark)
    // would be folded to a literal if deterministic; just assert it evaluates
    assert(sql1("SELECT graft_rand_like(7)").getInt(0) == 7)
  }
}
