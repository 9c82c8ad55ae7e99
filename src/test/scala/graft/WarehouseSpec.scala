package graft

import graft.ops.Warehouse
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, schema)

  private val logSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("st", StringType, nullable = true)))

  test("scd2 collapses unchanged runs into half-open validity intervals") {
    val rows = Seq(
      Row(1L, 10L, 1L, "a"), Row(1L, 20L, 2L, "a"), // same state: one version
      Row(1L, 30L, 3L, "b"),                        // change at 30
      Row(1L, 40L, 4L, "a"),                        // back to a: NEW version
      Row(2L, 5L, 5L, "x"))
    val got = Warehouse.scd2(df(logSchema, rows), "k", "ts", "id", Seq("st"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 10L, 30L, 0), (1L, "b", 30L, 40L, 0), (1L, "a", 40L, -1L, 1),
      (2L, "x", 5L, -1L, 1)))
  }

  test("scd2 change detection is null-safe and tiebreak-deterministic") {
    val rows = Seq( // duplicate ts=10: id orders a before null
      Row(1L, 10L, 1L, "a"), Row(1L, 10L, 2L, null),
      Row(1L, 20L, 3L, null)) // null == null: no new version
    val got = Warehouse.scd2(df(logSchema, rows), "k", "ts", "id", Seq("st"))
      .orderBy("valid_from", "is_current").collect()
    assert(got.length == 2)
    assert(got(0).getString(1) == "a" && got(0).getLong(3) == 10L)
    assert(got(1).isNullAt(1) && got(1).getInt(4) == 1)
  }

  test("scd2 plans exactly one hash exchange (both windows share one sort)") {
    val rows = (1L to 50L).map(i => Row(i % 5, i, i, "s" + (i % 3)))
    val plan = Warehouse.scd2(df(logSchema, rows), "k", "ts", "id", Seq("st"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("scd2Apply: incremental merge equals the full rebuild at any split") {
    val rnd = new scala.util.Random(23)
    val rows = for (k <- 1L to 5L; i <- 0L until 80L) yield
      Row(k, i * 7L, k * 1000L + i,
        if (rnd.nextInt(5) == 0) null else "s" + rnd.nextInt(3))
    val all = df(logSchema, rows)
    val full = Warehouse.scd2(all, "k", "ts", "id", Seq("st"))
      .collect().map(_.toSeq).toSet
    for (splitTs <- Seq(0L, 100L, 300L, 10000L)) {
      val hist = Warehouse.scd2(all.where(col("ts") < splitTs),
        "k", "ts", "id", Seq("st"))
      val got = Warehouse.scd2Apply(hist, all.where(col("ts") >= splitTs),
        "k", "ts", "id", Seq("st")).collect().map(_.toSeq).toSet
      assert(got == full, s"split at $splitTs diverged")
    }
  }

  test("scd1Latest: latest-wins with deterministic ties") {
    val rows = Seq(
      Row(1L, 10L, 1L, "a"), Row(1L, 20L, 2L, "b"),
      Row(1L, 20L, 3L, "c"), // duplicate ts: greater id wins
      Row(2L, 5L, 4L, null)) // null state carried as-is
    val got = Warehouse.scd1Latest(df(logSchema, rows), "k", "ts", "id", Seq("st"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)), r.getLong(2))).toMap
    assert(got(1L) == (("c", 20L)) && got(2L) == ((null, 5L)))
  }

  test("scd2Apply: a change predating the open version fails loudly") {
    val base = df(logSchema, Seq(Row(1L, 100L, 1L, "a"), Row(1L, 200L, 2L, "b")))
    val hist = Warehouse.scd2(base, "k", "ts", "id", Seq("st"))
    val late = df(logSchema, Seq(Row(1L, 150L, 3L, "c"))) // before open@200
    val ex = intercept[Exception] {
      Warehouse.scd2Apply(hist, late, "k", "ts", "id", Seq("st")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("scd2Apply: a SAME-INSTANT change (ts == open valid_from) also fails loudly") {
    // the seed carries a -inf tiebreak, so a same-instant change with a
    // smaller real tiebreak would silently diverge from the full rebuild —
    // the guard must reject ts <= valid_from, not just ts <
    val base = df(logSchema, Seq(Row(1L, 100L, 5L, "a"), Row(1L, 200L, 6L, "b")))
    val hist = Warehouse.scd2(base, "k", "ts", "id", Seq("st"))
    val sameInstant = df(logSchema, Seq(Row(1L, 200L, 1L, "c"))) // == open@200, tiebreak 1 < 6
    val ex = intercept[Exception] {
      Warehouse.scd2Apply(hist, sameInstant, "k", "ts", "id", Seq("st")).collect()
    }
    assert(ex.getMessage != null)
  }

  private val snapSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = true)))

  test("kAnonymity: flags only sub-k combinations; exactly k is compliant; NULL is a value") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("zip", StringType, nullable = true),
      StructField("age", LongType, nullable = false)))
    // zip A/age 1: 3 rows (== k, compliant); zip B/age 2: 2 rows (violates);
    // zip NULL/age 3: 1 row (violates — NULLs group together like SQL)
    val rows = Seq(Row("A", 1L), Row("A", 1L), Row("A", 1L),
      Row("B", 2L), Row("B", 2L), Row(null, 3L))
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = Warehouse.kAnonymity(df, Seq("zip", "age"), k = 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((Some("B"), 2L, 2L), (None, 3L, 1L)))
    val e = intercept[IllegalArgumentException] {
      Warehouse.kAnonymity(df, Seq("zip"), k = 1)
    }
    assert(e.getMessage.contains("vacuous"))
  }

  test("snapshotDiff classifies added/removed/changed and hides unchanged") {
    val old = df(snapSchema, Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, null)))
    val neu = df(snapSchema, Seq(Row(2L, 25L), Row(3L, null), Row(4L, 40L)))
    val got = Warehouse.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // k=3 has NULL compare values on both sides → unchanged (null-safe)
    assert(got.toSeq == Seq((1L, "removed"), (2L, "changed"), (4L, "added")))
    val all = Warehouse.snapshotDiff(old, neu, Seq("k"), Seq("v"),
      includeUnchanged = true).collect()
    assert(all.length == 4)
    val changed = all.find(_.getLong(0) == 2L).get
    assert(changed.getLong(2) == 20L && changed.getLong(3) == 25L)
  }

  test("snapshotDiff plans one full-outer sort-merge join, two exchanges") {
    val old = df(snapSchema, (1L to 50L).map(i => Row(i, i)))
    val neu = df(snapSchema, (20L to 70L).map(i => Row(i, i + 1)))
    val plan = Warehouse.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("dqReport predicates: NULL evaluations count as violations") {
    val d = df(snapSchema, Seq(Row(1L, 10L), Row(2L, null), Row(3L, 3L)))
    val got = Warehouse.dqReport(d,
        predicates = Seq(("v_gt_k", "v > k")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // k=1: 10>1 ok; k=2: NULL → violation; k=3: 3>3 false → violation
    assert(got("predicate:v_gt_k") == ((2L, 3L)))
  }

  test("dqReport counts each violation family with exact totals") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("q", LongType, nullable = true),
      StructField("flag", StringType, nullable = true)))
    val rows = Seq(
      Row(1L, 5L, "A"), Row(1L, 60L, "A"), // dup id; q=60 out of [1,50]
      Row(2L, null, "Z"),                  // null q (NOT a range violation)
      Row(null, 7L, "N"))                  // null id
    val d = df(schema, rows)
    val dim = df(StructType(Seq(StructField("pk", LongType, nullable = false))),
      Seq(Row(1L)))
    val got = Warehouse.dqReport(d,
        notNull = Seq("id", "q"),
        unique = Seq(Seq("id")),
        ranges = Seq(("q", 1L, 50L)),
        accepted = Seq(("flag", Seq("A", "N"))),
        refs = Seq(("id", dim, "pk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("not_null:id") == (1L, 4L))
    assert(got("not_null:q") == (1L, 4L))
    assert(got("range:q[1,50]") == (1L, 4L)) // only the 60; NULL not counted
    assert(got("accepted:flag") == (1L, 4L)) // only Z
    assert(got("unique:id") == (1L, 4L))     // one excess duplicate row
    assert(got("ref:id->pk") == (1L, 3L))    // id=2 orphaned; 3 non-null fks
  }

  test("compact: shrinks a many-file table in place, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(10000L).selectExpr("id", "id % 7 AS v")
      .repartition(64).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val (nBefore, nAfter, rows) = Warehouse.compact(spark, dir, targetBytes = 64L << 20)
    assert(nBefore == 64 && nAfter == 1 && rows == 10000L)
    // content byte-identical, swap dirs cleaned up
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == beforeRows)
    assert(!new java.io.File(dir + ".compact_tmp").exists)
    assert(!new java.io.File(dir + ".compact_bak").exists)
    // idempotent second run: already one file, stays one file
    val (b2, a2, r2) = Warehouse.compact(spark, dir, targetBytes = 64L << 20)
    assert(b2 == 1 && a2 == 1 && r2 == 10000L)
  }
}
