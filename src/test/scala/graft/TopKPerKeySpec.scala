package graft

import graft.plans.TopKPerKey
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches the window row_number formulation exactly") {
    val df = spark.range(100000).selectExpr(
      "CAST(id % 37 AS INT) AS key", "id AS ord", "concat('p', id) AS payload")
    val custom = TopKPerKey.topK(df, Seq("key"), "ord", 5)
      .selectExpr("key", "ord", "payload")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    df.createOrReplaceTempView("tk_in")
    val reference = spark.sql(
      """SELECT key, ord, payload FROM (
        |  SELECT key, ord, payload,
        |         row_number() OVER (PARTITION BY key ORDER BY ord DESC) AS rn
        |  FROM tk_in) WHERE rn <= 5""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(custom == reference)
    assert(custom.size == 37 * 5)
  }

  test("ascending mode and k larger than group size") {
    val df = spark.range(10).selectExpr("CAST(id % 3 AS INT) AS key", "id AS ord")
    val res = TopKPerKey.topK(df, Seq("key"), "ord", 100, asc = true)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(res.size == 10) // every row survives when k >= group size
  }

  test("plan shape: partial exec below the exchange, final above") {
    val df = spark.range(1000).selectExpr("CAST(id % 5 AS INT) AS key", "id AS ord")
    val plan = TopKPerKey.topK(df, Seq("key"), "ord", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerKey"), plan)
    assert(plan.contains("FinalTopKPerKey"), plan)
    val iPartial = plan.indexOf("PartialTopKPerKey")
    val iExchange = plan.indexOf("Exchange")
    val iFinal = plan.indexOf("FinalTopKPerKey")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected Final above Exchange above Partial:\n$plan")
  }

  test("NULL order keys rank last, matching row_number NULLS LAST") {
    // key 0: 2 non-null rows + nulls (nulls must fill the k=3 slots);
    // key 1: >=3 non-null rows (nulls must be excluded entirely)
    val df = spark.range(20).selectExpr(
      "CAST(id % 2 AS INT) AS key",
      "CASE WHEN id % 2 = 0 AND id > 3 THEN NULL ELSE id END AS ord")
    val custom = TopKPerKey.topK(df, Seq("key"), "ord", 3)
      .selectExpr("key", "ord")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    df.createOrReplaceTempView("tk_null_in")
    val reference = spark.sql(
      """SELECT key, ord FROM (
        |  SELECT key, ord,
        |         row_number() OVER (PARTITION BY key ORDER BY ord DESC NULLS LAST) AS rn
        |  FROM tk_null_in) WHERE rn <= 3""".stripMargin)
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // non-null survivors must agree exactly; null-filled slots agree by count
    assert(custom.filter(_._2 >= 0) == reference.filter(_._2 >= 0))
    assert(custom.count(_._2 < 0) == reference.count(_._2 < 0))
  }

  test("lexicographic multi-column ordering with mixed directions") {
    // many ties on the primary column => the ascending tiebreak decides
    val df = spark.range(50000).selectExpr(
      "CAST(id % 11 AS INT) AS key", "CAST(id % 13 AS DOUBLE) AS sim", "id AS vid")
    val custom = TopKPerKey.topKBy(df, Seq("key"), Seq(("sim", false), ("vid", true)), 7)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    df.createOrReplaceTempView("tk_multi_in")
    val reference = spark.sql(
      """SELECT key, sim, vid FROM (
        |  SELECT key, sim, vid,
        |         row_number() OVER (PARTITION BY key ORDER BY sim DESC, vid ASC) AS rn
        |  FROM tk_multi_in) WHERE rn <= 7""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    assert(custom == reference)
    assert(custom.size == 11 * 7)
  }

  test("string ordering with UTF8String sort keys") {
    val df = spark.range(1000).selectExpr(
      "CAST(id % 4 AS INT) AS key", "concat('s', lpad(CAST(id AS STRING), 4, '0')) AS name")
    val res = TopKPerKey.topK(df, Seq("key"), "name", 2)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(res == Set((0, "s0996"), (0, "s0992"), (1, "s0997"), (1, "s0993"),
      (2, "s0998"), (2, "s0994"), (3, "s0999"), (3, "s0995")))
  }

  // Regression guard for the round-4 finding: ANN rerank must use the
  // bounded partial-heap operator, never a full-candidate row_number window
  // (which funnels all scored candidates into <= #queries partitions).
  test("plan guard: ANN top-k queries run on TopKPerKey, not a window") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_ann_topk", "q_lsh_topk", "q_ivf_topk")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartialTopKPerKey") && plan.contains("FinalTopKPerKey"),
        s"$q lost the partial-heap operator:\n$plan")
      // a rank window over the <= k-per-query SURVIVORS is fine; a window
      // BELOW the heap operator would mean it ranks the full candidate set
      // again (parents print before children, so above == smaller index)
      val iWin = plan.indexOf("Window")
      assert(iWin < 0 || iWin < plan.indexOf("FinalTopKPerKey"),
        s"$q ranks the full candidate set in a window:\n$plan")
    }
  }
}
