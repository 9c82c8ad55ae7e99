package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Table profiler: one tall row per column with exact summary statistics —
 * the data-quality report a pipeline runs before trusting a new drop of
 * input data (null counts, cardinalities, value ranges).
 *
 * Scale design: ONE logical scan. All per-column aggregates ride a single
 * `agg(...)` — Catalyst plans the exact multi-column `count(DISTINCT …)`
 * set with one Expand (scan cost × #profiled columns, partial-aggregated
 * below the shuffle; the shuffle itself carries only group hashes, never
 * rows). The 1-row wide result is turned tall with `stack` — no driver
 * collection. min/max are computed in the column's native type and cast to
 * string only afterwards, so numeric ranges are true numeric extrema, not
 * lexicographic ones.
 */
object Profile {

  /** Profile `cols` of `df`: (col_name, n_nonnull, n_distinct, min_s, max_s).
    * Rows come back in `cols` order. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 64, "1..64 columns (Expand factor)")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"nn_$i"),
      countDistinct(col(c)).as(s"nd_$i"),
      min(col(c)).cast("string").as(s"mn_$i"),
      max(col(c)).cast("string").as(s"mx_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.indices.map { i =>
      s"'${cols(i)}', nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_s, max_s)")
  }

  /** Exact discrete percentiles per group: for each percentile p the value
    * at 1-indexed position ⌈p·n/100⌉ of the group's sorted values — the
    * standard `percentile_disc` contract, computed with integer-only
    * position arithmetic (⌈p·n/100⌉ = (p·n+99) div 100) so the oracle
    * replays it exactly. Ties in `valCol` don't matter: row_number order
    * among equal values is arbitrary, but the value AT any rank is
    * well-defined.
    *
    * Scale: one shuffle on the group key; a running-rank window plus one
    * partial-aggregated max per percentile. Output: (keyCol, p<p1>, …). */
  def groupPercentilesDisc(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100), "ps in 1..100")
    val wOrd = Window.partitionBy(keyCol).orderBy(col("v"))
    val wAll = Window.partitionBy(keyCol)
    val base = df.select(col(keyCol), col(valCol).cast("long").as("v"))
      .where(col("v").isNotNull) // percentiles are over the non-null multiset
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(col("v")).over(wAll))
    val aggs = ps.map { p =>
      // integer div, not Column./ (double division)
      max(when(col("rn") === expr(s"(${p}L * n + 99) div 100"), col("v")))
        .as(s"p$p")
    }
    base.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
  }
}
