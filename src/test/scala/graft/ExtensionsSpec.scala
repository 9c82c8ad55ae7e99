package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  /** Run `f` against a fresh SparkSession with GraftExtensions applied
    * programmatically (spark.sql.extensions is a static conf and cannot
    * reach the pre-existing SparkContext), restoring the shared session
    * afterwards. */
  private def withExtensionsSession(f: SparkSession => Unit): Unit = {
    val old = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("GraftExtensions makes functions session-native via withExtensions") {
    // force the shared test session up first so newSession config is inherited
    TestSpark.spark
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the existing session (extensions already applied
    // or not) — assert on an isolated SparkSession only when fresh; otherwise
    // verify via explicit extension application.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw, covers injection wiring
    Graft.install(s)
    assert(s.sql("SELECT gcd(21, 14)").collect().head.getInt(0) == 7)
  }



  test("columnar rule auto-lowers SQL gcd over a parquet scan") {
    withExtensionsSession { s =>
      Graft.install(s)
      val df = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("l_orderkey", "gcd(l_partkey, l_suppkey) AS g")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarMap"), plan)
      val lowered = df.selectExpr("sum(g)").collect().head.getLong(0)
      // parity against the codegen'd expression tier on the shared session
      val old = TestSpark.spark
      Graft.install(old)
      val expected = old.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("sum(gcd(l_partkey, l_suppkey))").collect().head.getLong(0)
      assert(lowered == expected && lowered > 0)
    }
  }

  test("columnar rule auto-lowers SQL token_count over a string scan column") {
    withExtensionsSession { s =>
      Graft.install(s)
      val df = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "token_count(text) AS n")
      assert(df.queryExecution.executedPlan.toString.contains("ColumnarMap"))
      val old = TestSpark.spark
      Graft.install(old)
      val expected = old.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("sum(token_count(text))").collect().head.getLong(0)
      assert(df.selectExpr("sum(n)").collect().head.getLong(0) == expected)
    }
  }

  test("columnar rule auto-lowers boxed functions — wasm guest over a parquet scan") {
    withExtensionsSession { s =>
      Graft.install(s)
      // wasm_gcd takes bigint args: raw parquet int64 columns lower directly
      val df = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("wasm_gcd(l_partkey, l_suppkey) AS g")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarMultiMap"), plan)
      // wasm scalars lower through the BATCHED kernel (one instance borrow
      // per scan batch), not the per-row closure fallback
      assert(plan.contains("WasmBatchKernel"), plan)
      val lowered = df.selectExpr("sum(g)").collect().head.getLong(0)
      val old = TestSpark.spark
      Graft.install(old)
      val expected = old.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("sum(wasm_gcd(l_partkey, l_suppkey))").collect().head.getLong(0)
      assert(lowered == expected && lowered > 0)
    }
  }

  test("wasm buffer args + string return lower to the batched kernel; literals inject as constant vectors") {
    withExtensionsSession { s =>
      Graft.install(s)
      // wasm_count_byte(string, int): one scan column + one literal —
      // lowers only because ConstArgsKernel fills the literal position;
      // wasm_substring returns a STRING through the packed-i64 alloc ABI
      val df = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "wasm_count_byte(text, 101) AS ne",
                    "wasm_substring(text, 8, 24) AS sub")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WasmBatchKernel"), plan)
      assert(plan.contains("ConstArgsKernel"), plan)
      assert("ColumnarMultiMap".r.findAllIn(plan).size == 1, plan) // fused
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val old = TestSpark.spark
      Graft.install(old)
      val expected = old.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "wasm_count_byte(text, 101) AS ne",
                    "wasm_substring(text, 8, 24) AS sub")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == expected && got.nonEmpty)
    }
  }

  test("columnar rule auto-lowers boxed string->string functions") {
    withExtensionsSession { s =>
      Graft.install(s)
      val df = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "lang_id(text) AS lang")
      assert(df.queryExecution.executedPlan.toString.contains("ColumnarMultiMap"))
      val old = TestSpark.spark
      Graft.install(old)
      val expected = old.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "lang_id(text) AS lang")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected && got.nonEmpty)
    }
  }

  test("several lowerable projections fuse into ONE multi-kernel pass") {
    withExtensionsSession { s =>
      Graft.install(s)
      val df = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "token_count(text) AS n", "lang_id(text) AS lang")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarMultiMap"), plan)
      // one fused node, not a chain of single-kernel operators
      assert("ColumnarMultiMap".r.findAllIn(plan).size == 1, plan)
      val old = TestSpark.spark
      Graft.install(old)
      val expected = old.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("doc_id", "token_count(text) AS n", "lang_id(text) AS lang")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == expected && got.nonEmpty)
    }
  }

  test("columnar rule leaves non-attribute gcd arguments on the expression tier") {
    withExtensionsSession { s =>
      Graft.install(s)
      // computed (cast) arguments -> not lowerable; must still run correctly
      val df = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("gcd(CAST(l_partkey AS INT), CAST(l_suppkey AS INT)) AS g")
      assert(!df.queryExecution.executedPlan.toString.contains("ColumnarMap"))
      assert(df.selectExpr("sum(g)").collect().head.getLong(0) > 0)
    }
  }
}
