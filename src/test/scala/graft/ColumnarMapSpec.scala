package graft

import graft.plans.ColumnarMap
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

class ColumnarMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("columnar gcd matches the expression tier on a parquet scan") {
    Graft.install(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(l_partkey AS INT) AS a", "CAST(l_suppkey AS INT) AS b")
    val columnar = ColumnarMap.withBatchColumn(df, "g", Seq("a", "b"),
        IntegerType, ColumnarMap.GcdKernel)
      .selectExpr("l_orderkey", "l_linenumber", "g")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val expr = df.selectExpr("l_orderkey", "l_linenumber", "gcd(a, b) AS g")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(columnar == expr)
    assert(columnar.nonEmpty)
  }

  test("scan feeds the kernel in columnar form (no RowToColumnar below it)") {
    // raw int64 scan columns, no cast projection — the kernel consumes the
    // vectorized reader's batches as-is
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
    val out = ColumnarMap.withBatchColumn(df, "g", Seq("l_partkey", "l_suppkey"),
      LongType, ColumnarMap.GcdLongKernel)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarMap"), plan)
    // the parquet scan is columnar, so the transition to rows must sit ABOVE
    // the kernel, never between scan and kernel
    assert(!plan.contains("RowToColumnar"), plan)
    val iKernel = plan.indexOf("ColumnarMap")
    val iToRow = plan.indexOf("ColumnarToRow")
    assert(iToRow >= 0 && iToRow < iKernel, plan)
  }

  test("row-producing child gets an automatic RowToColumnar transition") {
    val df = spark.range(1000)
      .selectExpr("CAST(id % 97 AS INT) AS a", "CAST(id % 89 AS INT) AS b")
    val out = ColumnarMap.withBatchColumn(df, "g", Seq("a", "b"),
      IntegerType, ColumnarMap.GcdKernel)
    assert(out.queryExecution.executedPlan.toString.contains("RowToColumnar"))
    assert(out.selectExpr("sum(g)").collect().head.getLong(0) > 0)
  }
}
