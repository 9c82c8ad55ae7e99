package graft

import graft.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate lifecycle tests mirroring the reference's sum / weighted_avg
  * fixtures (FIXTURES.md: `tests/python.rs:669-913`), incl. retract. */
class AggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sum lifecycle: accumulate 1,null,3,5 -> 9; retract flips sign") {
    val g = new SumAgg
    var s = g.createState()
    Seq[Integer](1, null, 3, 5).foreach { v =>
      s = g.accumulate(s, Row(v))
    }
    assert(s == 9L)
    // accumulate-or-retract with ops = F,F,T,F over the same input -> 1+3-3+5?
    // (reference semantics: per-row flag true = retract)
    var s2 = g.createState()
    val ops = Seq(false, false, true, false)
    Seq[Integer](1, null, 3, 5).zip(ops).foreach { case (v, retract) =>
      s2 = if (retract) g.retract(s2, Row(v)) else g.accumulate(s2, Row(v))
    }
    assert(s2 == 3L) // 1 + 0 - 3 + 5
  }

  test("weighted_avg: accumulate, merge, finish") {
    val g = new WeightedAvgAgg
    var a = g.createState()
    a = g.accumulate(a, Row(2, 4))   // sum=8  w=4
    a = g.accumulate(a, Row(3, 8))   // sum=32 w=12
    assert(a == WAvgState(32, 12))
    val merged = g.merge(a, a)
    assert(merged == WAvgState(64, 24))
    assert(math.abs(g.finish(merged) - 64.0 / 24.0) < 1e-12)
  }

  test("sum_udaf through SQL with group by (partial + final agg)") {
    val r = spark.sql(
      """SELECT k, sum_udaf(v) AS s FROM VALUES ('a', 1), ('a', 2), ('b', 5) t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq == Seq(("a", 3L), ("b", 5L)))
  }

  test("median_udaf: opaque java-serialized state merges across partitions") {
    val r = spark.sql(
      """SELECT median_udaf(CAST(v AS DOUBLE)) FROM (SELECT explode(sequence(1, 101)) AS v DISTRIBUTE BY v % 4)""")
      .collect().head.getDouble(0)
    assert(r == 51.0)
    val even = spark.sql("SELECT median_udaf(CAST(v AS DOUBLE)) FROM VALUES (1), (2), (3), (4) t(v)")
      .collect().head.getDouble(0)
    assert(even == 2.5)
  }

  test("median_bounded: exact below the cap, identical to median_udaf") {
    val r = spark.sql(
      """SELECT median_bounded(CAST(v AS DOUBLE)) AS b, median_udaf(CAST(v AS DOUBLE)) AS e
        |FROM (SELECT explode(sequence(1, 101)) AS v DISTRIBUTE BY v % 4)""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(0) == 51.0)
    val even = spark.sql(
      "SELECT median_bounded(CAST(v AS DOUBLE)) FROM VALUES (1), (2), (3), (4) t(v)")
      .collect().head.getDouble(0)
    assert(even == 2.5)
  }

  test("median_bounded: a 100k-value hot group stays O(cap) and lands within 1%") {
    // 25x the 4096 cap: the state must collapse to the centroid sketch
    // instead of carrying 100k doubles through the shuffle (the exact
    // reference is the opt-in unbounded form)
    val r = spark.sql(
      """SELECT median_bounded(v) AS approx, median_exact_unbounded(v) AS exact
        |FROM (SELECT CAST(pow(id % 1000, 1.7) AS DOUBLE) AS v FROM range(100000)
        |      DISTRIBUTE BY id % 8)""".stripMargin).collect().head
    val (approx, exact) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) <= 0.01 * math.max(1.0, exact),
      s"approx=$approx exact=$exact")
    // the memory contract itself: accumulate 100k values directly and check
    // the collapsed state size
    val agg = new graft.functions.BoundedMedianAgg(4096)
    var st = agg.createState()
    (0 until 100000).foreach { i =>
      st = agg.accumulate(st, org.apache.spark.sql.Row(math.pow(i % 1000, 1.7)))
    }
    assert(st.exact == null && st.buf.size <= 2 * 4096 / 4 + 1,
      s"state not bounded: ${if (st.exact != null) st.exact.size else st.buf.size}")
  }

  test("bounded-memory scale path: percentile_approx tracks the exact median") {
    // MedianAgg holds O(group) state by necessity (exact median); the
    // documented 100TB path is Spark's mergeable GK sketch. Cross-check the
    // two on the same skewed data: at accuracy 10000 the sketch must land
    // within 1% of exact on 100k values.
    val r = spark.sql(
      """SELECT median_exact_unbounded(v) AS exact, percentile_approx(v, 0.5, 10000) AS approx
        |FROM (SELECT CAST(pow(id % 1000, 1.7) AS DOUBLE) AS v FROM range(100000)
        |      DISTRIBUTE BY id % 8)""".stripMargin).collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(exact - approx) <= 0.01 * math.max(1.0, exact),
      s"exact=$exact approx=$approx")
  }

  test("median_exact_unbounded: a group over the value cap fails loudly, not OOM") {
    val agg = new graft.functions.MedianAgg(maxValues = 1000)
    var st = agg.createState()
    (0 until 1000).foreach { i =>
      st = agg.accumulate(st, org.apache.spark.sql.Row(i.toDouble))
    }
    val e = intercept[IllegalArgumentException] {
      agg.accumulate(st, org.apache.spark.sql.Row(1000.0))
    }
    assert(e.getMessage.contains("median_exact_unbounded"))
    val other = agg.createState()
    other.add(0.5)
    val e2 = intercept[IllegalArgumentException] { agg.merge(st, other) }
    assert(e2.getMessage.contains("median_exact_unbounded"))
  }

  test("median_udaf default is the BOUNDED aggregate: hot-group state stays O(cap)") {
    // the registered default must never carry O(group) state — same direct
    // state probe as the median_bounded contract test, via the default class
    val agg = new graft.functions.BoundedMedianAgg()
    var st = agg.createState()
    (0 until 50000).foreach { i =>
      st = agg.accumulate(st, org.apache.spark.sql.Row(i.toDouble))
    }
    assert(st.exact == null, "default median_udaf state did not collapse")
  }
}
