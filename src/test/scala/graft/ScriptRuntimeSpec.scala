package graft

import graft.runtime.{ScriptRuntime, ScriptUdf}
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
