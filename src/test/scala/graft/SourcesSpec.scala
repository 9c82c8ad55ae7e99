package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink coverage: the reference has no IO layer (host-engine concern,
  * SURVEY §2.3) — in graft, Spark's readers/writers are that layer. These
  * tests pin the behaviors the 100 TB design relies on: partition pruning,
  * predicate pushdown, and bucketed (exchange-free) joins. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv and json round trip with schema") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = spark.range(100).selectExpr("id", "CAST(id % 7 AS INT) AS k", "concat('n', id) AS name")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$dir/csv")
    val json = spark.read.json(s"$dir/json")
    assert(csv.count() == 100 && json.count() == 100)
    assert(csv.agg(sum("id")).collect().head.getLong(0) == 4950L)
    assert(json.agg(sum("id")).collect().head.getLong(0) == 4950L)
  }

  test("partitionBy write + partition pruning on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    spark.range(1000).selectExpr("id", "CAST(id % 10 AS INT) AS bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/t")
    val pruned = spark.read.parquet(s"$dir/t").where("bucket = 3")
    assert(pruned.count() == 100)
    // pruning must reach the file listing: only one partition directory read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"),
      s"partition filter missing in:\n$plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      spark.sql("DROP TABLE IF EXISTS b1")
      spark.sql("DROP TABLE IF EXISTS b2")
      spark.range(10000).selectExpr("id AS k", "id * 2 AS v1")
        .write.option("path", s"$wh/b1").bucketBy(8, "k").sortBy("k").saveAsTable("b1")
      spark.range(5000).selectExpr("id AS k", "id * 3 AS v2")
        .write.option("path", s"$wh/b2").bucketBy(8, "k").sortBy("k").saveAsTable("b2")
      val joined = spark.table("b1").join(spark.table("b2"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 5000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b1")
      spark.sql("DROP TABLE IF EXISTS b2")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted join spreads a hot key and preserves results") {
    import graft.plans.Skew
    val hot = spark.range(10000).selectExpr("CAST(id % 3 AS BIGINT) AS k", "id AS v")
    val dim = spark.range(3).selectExpr("id AS k", "concat('d', id) AS name")
    val out = Skew.saltedJoin(hot, dim, "k", salts = 8)
    assert(out.count() == 10000)
    assert(out.columns.toSeq.sorted == Seq("k", "name", "v"))
    val plain = hot.join(dim, Seq("k")).agg(sum("v")).collect().head.getLong(0)
    assert(out.agg(sum("v")).collect().head.getLong(0) == plain)
  }

  test("arrow IPC round trip: scalars, embeddings (float lists), metadata") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("arrow_io").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
    graft.sources.ArrowIO.write(src, dir)
    val back = graft.sources.ArrowIO.read(spark, dir)
    assert(back.schema.map(_.name) == Seq("vec_id", "embedding"))
    assert(back.count() == src.count())
    // value parity on a checksum of ids and the first component of each vector
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.selectExpr("sum(vec_id)",
        "sum(CAST(ROUND(embedding[0] * 10000) AS BIGINT))").collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(sig(back) == sig(src))
  }

  test("arrow IPC round trip preserves dates and timestamps") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("arrow_io_ts").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS d", "o_orderdate AS ts")
      .where("o_orderkey < 100")
    graft.sources.ArrowIO.write(src, dir)
    val back = graft.sources.ArrowIO.read(spark, dir)
    val a = src.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("arrow IPC goes through Hadoop FileSystem: file: URI, multi-part, tmp invisible") {
    val spark = TestSpark.spark
    val local = java.nio.file.Files.createTempDirectory("arrow_io_fs")
    val dir = "file://" + local.toString // explicit scheme — resolved via Path.getFileSystem
    val src = spark.range(1000).selectExpr("id", "CAST(id * 2 AS INT) AS v")
      .repartition(7)
    graft.sources.ArrowIO.write(src, dir)
    val parts = local.toFile.listFiles().map(_.getName).filter(_.endsWith(".arrow"))
    assert(parts.length >= 2, s"expected multiple part files, got ${parts.toSeq}")
    assert(parts.forall(n => !n.contains(".tmp")), "no tmp residue after success")
    // a stale tmp from a hypothetical failed attempt must be invisible to read
    java.nio.file.Files.write(local.resolve("part-3.arrow.tmp-99"),
      Array[Byte](1, 2, 3))
    val back = graft.sources.ArrowIO.read(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).collect().head.getLong(0) == 499500L)
    // a re-write with fewer partitions clears stale parts and tmp orphans
    graft.sources.ArrowIO.write(spark.range(10).toDF("id").repartition(1), dir)
    val names = local.toFile.listFiles().map(_.getName)
    assert(!names.exists(_.contains(".tmp")), s"stale tmp not cleared: ${names.toSeq}")
    assert(graft.sources.ArrowIO.read(spark, dir).count() == 10)
  }
}
