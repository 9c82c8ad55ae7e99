package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed range join: points matched to intervals (`lo <= p <= hi`) for the
 * same key. Spark plans a bare range predicate as a broadcast-nested-loop or
 * a sort-merge over the key alone (every point × every interval per key);
 * bucketing the value axis turns it into an equi-join.
 *
 * == Scale design (100 TB) ==
 * Each interval replicates to `ceil(span / bucketWidth)` buckets (choose the
 * width near the typical span so replication stays O(1)); each point maps to
 * exactly one bucket. The join shuffles on `(key, bucket)` — candidates
 * co-locate, the exact `BETWEEN` filter runs locally, and no per-key
 * cartesian product ever materializes. Skewed buckets split via AQE.
 */
object RangeJoin {

  /**
   * Join `points` to `intervals` on `pointKey == intervalKey` and
   * `lo <= pointVal <= hi` (all numeric/long columns). Output: all point
   * columns + all interval columns.
   */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        pointKey: String, intervalKey: String,
                        pointVal: String, lo: String, hi: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
                       floor(col(hi) / bucketWidth).cast("long"))))
    val pb = points.withColumn("__bucket",
      floor(col(pointVal) / bucketWidth).cast("long"))
    pb.join(ib, pb(pointKey) === ib(intervalKey) && pb("__bucket") === ib("__bucket"))
      .where(col(pointVal) >= col(lo) && col(pointVal) <= col(hi))
      .drop("__bucket")
  }
}
