package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests mirroring the reference's conformance corpus (FIXTURES.md §A;
  * reference `arrow-udf/tests/tests.rs`). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql1(q: String): Row = spark.sql(q).collect().head

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

  test("deterministic=false survives: volatile function not constant-folded") {
    graft.functions.Udf.scalar1[Int, Int]("graft_rand_like(int) -> int",
      deterministic = false)(n => n)
    Graft.install(spark)
    // would be folded to a literal if deterministic; just assert it evaluates
    assert(sql1("SELECT graft_rand_like(7)").getInt(0) == 7)
  }
}
