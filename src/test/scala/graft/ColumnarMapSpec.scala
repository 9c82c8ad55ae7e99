package graft

import graft.plans.ColumnarMap
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
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

  test("columnar cosine over float-array column matches the expression tier") {
    Graft.install(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where("vec_id = 0").select("embedding")
      .collect().head.getSeq[Float](0).map(_.toDouble).toArray
    val columnar = ColumnarMap.withBatchColumn(emb.select("vec_id", "embedding"),
        "sim", Seq("embedding"), DoubleType, ColumnarMap.CosineQueryKernel(q))
      .selectExpr("vec_id", "CAST(ROUND(sim * 10000) AS BIGINT) AS s4")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = emb.selectExpr("vec_id",
        s"CAST(ROUND(cosine_sim(embedding, CAST(array(${q.mkString(",")}) AS ARRAY<FLOAT>)) * 10000) AS BIGINT) AS s4")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(columnar == expected)
    assert(columnar(0L) == 10000L) // self-similarity
  }

  test("columnar token_count over a string scan column matches the expression tier") {
    Graft.install(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val columnar = ColumnarMap.withBatchColumn(docs, "n", Seq("text"),
        IntegerType, ColumnarMap.TokenCountKernel)
      .selectExpr("doc_id", "n")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val expected = docs.selectExpr("doc_id", "token_count(text) AS n")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(columnar == expected && columnar.nonEmpty)
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
