package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for each left row, attach the most recent right row with
 * `rightTime <= leftTime` within the same key group. Spark has no native
 * as-of operator; the naive formulation (range join + per-row argmax)
 * explodes to O(L×R) pairs per key.
 *
 * == Scale design ==
 * Implemented as the union-and-window linear scan: tag both inputs, union,
 * and take `last(payload ignoring nulls)` over a window ordered by
 * (time, tag, tiebreak) per key. One shuffle on the key, one sort — the same
 * cost as a sort-merge join, regardless of how many right rows precede each
 * left row. Ties: a right row at exactly `leftTime` IS matched (<=); among
 * right rows with equal time the one with the greatest tiebreak column wins.
 */
object AsofJoin {

  /**
   * @param left       probe side; every left row survives (left-outer as-of)
   * @param right      reference side, its columns are attached
   * @param keyL,keyR  equi-join key columns
   * @param timeL,timeR ordering columns (same comparable type, e.g. epoch ms)
   * @param tiebreakR  right column breaking equal-time ties (max wins)
   * @param payloadCols right columns to attach (null when no match)
   */
  def asof(left: DataFrame, right: DataFrame,
           keyL: String, keyR: String,
           timeL: String, timeR: String,
           tiebreakR: String,
           payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 = right (reference) sorts before tag 1 = left at equal time → "<=".
    val rTagged = right.select(
      col(keyR).as("__key"), col(timeR).as("__t"), lit(0).as("__tag"),
      col(tiebreakR).as("__tb"),
      struct(payloadCols.map(col): _*).as("__payload"))
    val lTagged = left.select(
      Seq(col(keyL).as("__key"), col(timeL).as("__t"), lit(1).as("__tag"),
        lit(null).cast(rTagged.schema("__tb").dataType).as("__tb"),
        lit(null).cast(rTagged.schema("__payload").dataType).as("__payload")) ++
        leftCols.map(col): _*)
    val unioned = rTagged
      .select(Seq(col("__key"), col("__t"), col("__tag"), col("__tb"), col("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .unionByName(lTagged)
    val w = Window.partitionBy("__key")
      .orderBy(col("__t"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"__matched.$p").as(p)): _*)
  }
}
