package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: multi-dimensional clustering for scan pruning.
 *
 * At 100 TB the dominant cost is what the scan does NOT read. A table
 * sorted by one column prunes parquet row groups on that column only;
 * Z-ORDERING (bit-interleaving several columns into one sort key) gives
 * every interleaved column locality, so min/max row-group statistics prune
 * selective filters on ANY of them — the standard layout trick behind
 * Delta/Iceberg `OPTIMIZE ZORDER BY`.
 *
 * The z-value is pure integer bit arithmetic (no UDF, codegen'd, and
 * replayable in any engine), and clustering is one global range sort —
 * exactly the shuffle a layout rewrite must pay.
 */
object Layout {

  /** The Morton (Z-curve) interleaving of `cols`: bit `i` of column `j`
    * lands at position `i·m + j`. Columns are masked to `bits` low bits
    * (callers normalize to non-negative; values beyond `bits` bits wrap
    * into the same cell rather than failing). `m·bits ≤ 63`. */
  def zOrderValue(cols: Seq[Column], bits: Int): Column = {
    val m = cols.size
    require(m >= 2 && m <= 6, "interleave 2..6 columns")
    require(bits >= 1 && m * bits <= 63, s"need m*bits <= 63, got $m*$bits")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(1L), i * m + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** The same interleaving as a SQL fragment (for oracles / other engines):
    * `zOrderSql(Seq("x","y"), 16)` ≡ `zOrderValue(Seq(col("x"),col("y")), 16)`. */
  def zOrderSql(cols: Seq[String], bits: Int): String = {
    val m = cols.size
    // same guards as zOrderValue: a shift ≥ 64 wraps mod 64 in Spark but
    // not in other engines — the "equivalent twin" would silently diverge
    require(m >= 2 && m <= 6, "interleave 2..6 columns")
    require(bits >= 1 && m * bits <= 63, s"need m*bits <= 63, got $m*$bits")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((($c >> $i) & 1)) << ${i * m + j})"
    terms.mkString(" | ")
  }

  /** Cluster `df` for layout: one global range sort on the z-value of
    * `cols` (ties broken by the remaining sort stability of the write
    * path). Write the result with any partitioned/bucketed sink; row-group
    * min/max stats then prune filters on every clustered column. */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame =
    df.withColumn("__z", zOrderValue(cols.map(col), bits))
      .sort(col("__z"))
      .drop("__z")
}
