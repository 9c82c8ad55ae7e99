package graft

import graft.plans.{AsofJoin, AsofJoinNative}
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native exec matches the union+window formulation on real data") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = SparkEntry.eventsTsNs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .selectExpr("event_id", "user_id", "ts DIV 1000000 AS t_ms")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS t_ms", "o_orderkey")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val reference = normalize(AsofJoin.asof(e, o, "user_id", "o_custkey",
      "t_ms", "t_ms", "o_orderkey", Seq("o_orderkey")))
    val native = normalize(AsofJoinNative.asof(e, o, "user_id", "o_custkey",
      "t_ms", "t_ms", "o_orderkey", Seq("o_orderkey")))
    assert(native == reference)
    assert(native.size == 1000)
  }

  test("native exec: ties, equal-time match, no-match nulls") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val lSchema = StructType(Seq(StructField("k", IntegerType), StructField("t", LongType),
      StructField("lid", IntegerType)))
    val rSchema = StructType(Seq(StructField("k", IntegerType), StructField("t", LongType),
      StructField("rid", IntegerType), StructField("v", StringType)))
    val left = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1, 10L, 100),
      org.apache.spark.sql.Row(1, 20L, 101),
      org.apache.spark.sql.Row(1, 5L, 102),
      org.apache.spark.sql.Row(2, 50L, 103),
      org.apache.spark.sql.Row(3, 50L, 104),
    ).asJava, lSchema)
    val right = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1, 8L, 1, "r1"),
      org.apache.spark.sql.Row(1, 20L, 2, "r2"),
      org.apache.spark.sql.Row(2, 40L, 3, "r3a"),
      org.apache.spark.sql.Row(2, 40L, 4, "r3b"),
    ).asJava, rSchema)
    val out = AsofJoinNative.asof(left, right, "k", "k", "t", "t", "rid", Seq("rid", "v"))
      .collect().map(r => (r.getInt(2), if (r.isNullAt(3)) null else r.get(3))).toMap
    assert(out(100) == 1)
    assert(out(101) == 2)
    assert(out(102) == null)
    assert(out(103) == 4)
    assert(out(104) == null)
  }

  test("plan shape: AsofJoin exec with exchanges and sorts from EnsureRequirements") {
    val l = spark.range(100).selectExpr("id % 5 AS k", "id AS t")
    val r = spark.range(50).selectExpr("id % 5 AS k", "id AS t", "id AS rid")
    val plan = AsofJoinNative.asof(l, r, "k", "k", "t", "t", "rid", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(plan.contains("Sort"), plan)
  }
}
