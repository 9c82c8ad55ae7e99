package graft.ops

import org.apache.spark.sql.DataFrame
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
}
