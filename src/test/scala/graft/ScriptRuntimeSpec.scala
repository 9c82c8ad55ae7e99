package graft

import graft.runtime.{AggregateCode, ScriptRuntime, ScriptUdf}
import graft.sig.CallMode
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

class ScriptRuntimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("interpreter: arithmetic, strings, conditionals") {
    val rt = new ScriptRuntime()
    rt.addFunction("f", LongType, CallMode.ReturnNullOnNullInput,
      "(fn (x y) (+ (* x 2) y))")
    assert(rt.call("f", Seq(3L, 4L)) == 10L)
    rt.addFunction("g", LongType, CallMode.ReturnNullOnNullInput,
      "(fn (s) (if (> (len s) 3) (upper s) (lower s)))")
    assert(rt.call("g", Seq("abCde")) == "ABCDE")
    assert(rt.call("g", Seq("AB")) == "ab")
  }

  test("interpreter: step budget aborts runaway calls") {
    val rt = new ScriptRuntime(stepBudget = 50)
    rt.addFunction("deep", LongType, CallMode.ReturnNullOnNullInput,
      "(fn (x) " + "(+ 1 " * 60 + "x" + ")" * 60 + ")")
    val e = intercept[IllegalStateException](rt.call("deep", Seq(1L)))
    assert(e.getMessage.contains("step budget"))
  }

  test("interpreter: syntax errors fail at addFunction (driver side)") {
    val rt = new ScriptRuntime()
    intercept[IllegalArgumentException] {
      rt.addFunction("bad", LongType, CallMode.ReturnNullOnNullInput, "(+ 1 2)")
    }
  }

  test("script function runs distributed through SQL") {
    ScriptUdf.register("script_score(bigint) -> bigint", "(fn (x) (+ (* x 3) 1))")
    Graft.install(spark)
    val r = spark.sql("SELECT sum(script_score(CAST(id AS BIGINT))) FROM range(1000)")
      .collect().head.getLong(0)
    // sum over 0..999 of 3x+1 = 3*499500 + 1000
    assert(r == 3L * 499500L + 1000L)
  }

  test("aggregate phases run through the runtime SPI, including retract") {
    val rt = new ScriptRuntime()
    rt.addAggregate("ssq", LongType, AggregateCode(
      init = "(fn () 0)",
      accumulate = "(fn (s x) (+ s (* x x)))",
      retract = Some("(fn (s x) (- s (* x x)))"),
      merge = "(fn (a b) (+ a b))",
      finish = "(fn (s) s)"))
    var s = rt.aggCreateState("ssq")
    s = rt.aggAccumulate("ssq", s, Seq(3L))
    s = rt.aggAccumulate("ssq", s, Seq(4L))
    assert(rt.aggFinish("ssq", s) == 25L)
    s = rt.aggRetract("ssq", s, Seq(3L))
    assert(rt.aggFinish("ssq", s) == 16L)
    val merged = rt.aggMerge("ssq", s, rt.aggAccumulate("ssq", rt.aggCreateState("ssq"), Seq(2L)))
    assert(rt.aggFinish("ssq", merged) == 20L)
  }

  test("append-only script aggregate rejects retract") {
    val rt = new ScriptRuntime()
    rt.addAggregate("cnt", LongType, AggregateCode(
      "(fn () 0)", "(fn (s x) (+ s 1))", None, "(fn (a b) (+ a b))", "(fn (s) s)"))
    val s = rt.aggAccumulate("cnt", rt.aggCreateState("cnt"), Seq(9L))
    intercept[UnsupportedOperationException] { rt.aggRetract("cnt", s, Seq(9L)) }
  }

  test("script aggregate runs distributed through SQL with partial/merge split") {
    Graft.install(spark) // Builtins registers script_sumsq
    val r = spark.sql(
      "SELECT script_sumsq(CAST(id AS BIGINT)) FROM range(1000)")
      .collect().head.getLong(0)
    // sum of squares 0..999 = n(n-1)(2n-1)/6 for n=1000
    assert(r == 999L * 1000L * 1999L / 6L)
  }

  test("batched column-at-a-time calls through the runtime SPI") {
    val rt = new ScriptRuntime()
    rt.addFunction("twice", LongType, CallMode.ReturnNullOnNullInput, "(fn (x) (* x 2))")
    val out = rt.callBatch("twice", Seq(Array[Any](1L, null, 3L)), 3)
    assert(out.toSeq == Seq(2L, null, 6L))
    // DataFrame chunked tier wired through the same SPI surface
    val df = spark.range(10).selectExpr("id")
    val res = ScriptUdf.withBatchColumn(df.toDF(), "d", Seq("id"), LongType,
      "twice_df", "(fn (x) (* x 2))")
    assert(res.selectExpr("sum(d)").collect().head.getLong(0) == 90L)
  }

  test("script table function yields multiple rows via list") {
    ScriptUdf.register("script_pair(bigint) ->> bigint", "(fn (x) (list x (+ x 1)))")
    Graft.install(spark)
    val rows = spark.sql(
      "SELECT t.value FROM (SELECT CAST(5 AS BIGINT) AS n) LATERAL VIEW script_pair(n) t AS value")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(5L, 6L))
  }

  test("fallible script function yields error column") {
    ScriptUdf.register("script_div(bigint, bigint) -> bigint", "(fn (a b) (/ a b))",
      fallible = true)
    Graft.install(spark)
    val rows = spark.sql(
      "SELECT script_div(x, y).value AS v, script_div(x, y).error AS e FROM VALUES (CAST(10 AS BIGINT), CAST(3 AS BIGINT)), (CAST(1 AS BIGINT), CAST(0 AS BIGINT)) t(x, y)")
      .collect()
    assert(rows(0).getLong(0) == 3L && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getString(1).contains("division by zero"))
  }
}
