package graft

import graft.ops.Rank
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  test("globalPrefix rejects a fractional valCol instead of truncating silently") {
    import org.apache.spark.sql.types._
    val s = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("d", DoubleType, nullable = false)))
    val df = spark.createDataFrame(Seq(Row(1L, 1.5), Row(2L, 2.5)).asJava, s)
    val e = intercept[IllegalArgumentException] {
      Rank.globalPrefix(df, Seq(col("id").asc), "d")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("globalPrefix equals the single-partition window on random data") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 500L).map(i => Row(i, rnd.nextInt(40).toLong))
    // many partitions + heavy ties to stress the range/offset arithmetic
    val df = spark.createDataFrame(rows.asJava, schema).repartition(7)
    val got = Rank.globalPrefix(df, Seq(col("v").desc, col("id").asc), "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("id").asc)
    val exp = df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum("v").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp)
  }

  test("globalPrefix: interpreted (no-codegen) path equals the codegen path") {
    // PartitionRunningSum has two eval paths: doGenCode (whole-stage) and
    // evalInternal (interpreted fallback). Force the fallback and compare.
    val rnd = new scala.util.Random(43)
    val rows = (1L to 300L).map(i => Row(i, rnd.nextInt(20).toLong))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(5)
    def run(): Map[Long, (Long, Long)] =
      Rank.globalPrefix(df, Seq(col("v").asc, col("id").asc), "v")
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val withCodegen = run()
    val ws = spark.conf.get("spark.sql.codegen.wholeStage")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  test("globalPrefix: rank/cum referenced multiple times downstream stay single-evaluation") {
    // Regression guard for the stateful expression under CollapseProject:
    // if the optimizer ever inlined PartitionRunningSum into more than one
    // use site, the accumulator would advance once PER REFERENCE per row
    // and every downstream value would be wrong. q_abc's CASE references
    // cum twice; this pins the same shape against the window model.
    val rows = (1L to 200L).map(i => Row(i, (i % 13).toLong))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(4)
    val out = Rank.globalPrefix(df, Seq(col("v").desc, col("id").asc), "v")
      .selectExpr("id", "rank + rank AS r2", "cum + cum AS c2",
        "CASE WHEN cum > 100 THEN cum ELSE -cum END AS cpick")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("id").asc)
    val exp = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum("v").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .selectExpr("id", "rank + rank AS r2", "cum + cum AS c2",
        "CASE WHEN cum > 100 THEN cum ELSE -cum END AS cpick")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == exp)
  }

  test("rfmScores: quintile positions 1-5, best metric gets 5") {
    val rfmSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("rec", LongType, nullable = false),
      StructField("f", LongType, nullable = false),
      StructField("m", LongType, nullable = false)))
    // rec ascending best → id 1 best recency; f/m descending best → id 10
    val rows = (1L to 10L).map(i => Row(i, i, i, i * 100L))
    val df = spark.createDataFrame(rows.asJava, rfmSchema)
    val got = Rank.rfmScores(df, "id", "rec", "f", "m")
      .collect().map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5), r.getInt(6))))
      .toMap
    assert(got(1L) == ((5, 1, 1)) && got(10L) == ((1, 5, 5)))
    // 10 rows → exactly 2 per quintile on each axis
    assert(got.values.map(_._1).groupBy(identity).forall(_._2.size == 2))
  }
}
