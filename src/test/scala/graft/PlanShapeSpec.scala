package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-SHAPE asserts for the heavy pipeline operators: the "would this
 * survive 100×?" argument, checked structurally rather than by prose. Each
 * test builds the operator over a small input and asserts the physical plan
 * has no single-partition exchange (the global funnel every one of these ops
 * exists to avoid) and no cartesian product; where the op documents an exact
 * shuffle budget, that is asserted too. The x_* probes in Bench re-assert
 * the same shapes at 2M–100M rows before timing them.
 *
 * localCheckpoint lineage cuts hide upstream stages from a final plan, so
 * ops that checkpoint are asserted in pieces (the pre-checkpoint stage
 * explicitly).
 */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def docs(n: Int) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame((0 until n).map(i =>
      Row(i.toLong, s"tok${i % 7} alpha beta tok${i % 5} gamma delta tok$i epsilon zeta eta")).asJava,
      schema)
  }

  test("minhashPairs: LSH candidate stage is equi-join only (no cartesian, no funnel)") {
    Graft.install(spark)
    val pairs = graft.ops.Dedup.minhashPairs(docs(60), "text", "doc_id")
    PlanAudit.assertScaleShape(pairs, "minhashPairs")
  }

  test("nearDedupCorpus: final anti-join stage has no funnel") {
    Graft.install(spark)
    val out = graft.ops.Dedup.nearDedupCorpus(docs(60), "text", "doc_id")
    PlanAudit.assertScaleShape(out, "nearDedupCorpus")
  }

  test("globalPrefix: codegen prefix attachment, ZERO post-checkpoint shuffles") {
    val df = spark.range(1000).selectExpr("id", "hash(id) AS v")
      .withColumn("v", col("v").cast("long"))
    val out = graft.ops.Rank.globalPrefix(df, Seq(col("v").desc, col("id").asc), "v")
    // the range shuffle + sort are pre-checkpoint; rank/cum attach via the
    // stateful PartitionRunningSum expression in a bare Project — the
    // output plan over the checkpoint must contain NO exchange at all
    PlanAudit.assertScaleShape(out, "globalPrefix", maxShuffles = 0)
    // and the attachment must stay inside whole-stage codegen (the `*(n)`
    // prefix in the executed-plan string marks a codegen stage)
    assert(out.queryExecution.executedPlan.toString.contains("*(1) Project"),
      "prefix attachment fell out of whole-stage codegen")
  }

  test("windowedDistinctHll: register pipeline is 4 bounded shuffles, no funnel") {
    val ns = 86400L * 1000000000L
    val ev = spark.range(2000).selectExpr("CAST(id % 5 AS STRING) AS k",
      s"(id div 5 % 20) * ${ns}L AS ts", "pmod(hash(id), 300) AS e")
    val out = graft.ops.TimeSeries.windowedDistinctHll(ev, "k", "ts", "e", 7)
    // shuffles: day-register agg (map-side combined over raw rows), the
    // post-fan window merge, the estimate sums, and the grid min/max —
    // everything after the first one moves REGISTER rows (≤2^p per
    // key·day), never entities; the grid joins back by broadcast
    PlanAudit.assertScaleShape(out, "windowedDistinctHll", maxShuffles = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      "day-register max must combine map-side before the first exchange")
  }

  test("scd2Apply: merge plan has no funnel and no cartesian") {
    val logSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("st", StringType, nullable = true)))
    val base = spark.createDataFrame((1L to 200L).map(i =>
      Row(i % 20, i, i, "s" + (i % 3))).asJava, logSchema)
    val hist = graft.ops.Warehouse.scd2(base, "k", "ts", "id", Seq("st"))
      .localCheckpoint()
    val changes = spark.createDataFrame((1L to 40L).map(i =>
      Row(i % 20, 1000L + i, 1000L + i, "n" + (i % 2))).asJava, logSchema)
    val out = graft.ops.Warehouse.scd2Apply(hist, changes, "k", "ts", "id", Seq("st"))
    PlanAudit.assertScaleShape(out, "scd2Apply")
  }

  test("sortedNeighborhood: rank fan-out joins are equi-joins, no funnel") {
    Graft.install(spark)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    val df = spark.createDataFrame((0 until 100).map(i =>
      Row(i.toLong, f"name${i / 2}%03d${if (i % 2 == 0) "a" else "b"}")).asJava, schema)
    val out = graft.ops.Fuzzy.sortedNeighborhood(df, "id", "s", window = 3, minSim = 0.8)
    PlanAudit.assertScaleShape(out, "sortedNeighborhood")
  }

  test("dedupSpans: gram first-occurrence rides fp-partitioned windows, no funnel") {
    Graft.install(spark)
    val out = graft.ops.Curation.dedupSpans(docs(50), "text", "doc_id", n = 3)
    PlanAudit.assertScaleShape(out, "dedupSpans")
  }
}
