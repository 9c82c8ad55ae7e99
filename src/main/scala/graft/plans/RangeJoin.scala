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
  /** Exact integer floor-division bucket index — `floor(x / w)` via double
    * division would mis-bucket values above 2^53 (nanosecond epochs). pmod
    * keeps the floor semantics for negative values too. */
  private def floorBucket(c: String, w: Long) =
    expr(s"(CAST(`$c` AS BIGINT) - pmod(CAST(`$c` AS BIGINT), ${w}L)) DIV ${w}L")

  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        pointKey: String, intervalKey: String,
                        pointVal: String, lo: String, hi: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "__bucket is reserved by bucketedRangeJoin")
    // Inverted intervals (hi < lo) match nothing, but sequence() would step
    // DOWNWARD through them and explode a garbage interval into arbitrarily
    // many bucket rows — drop them before the explode so they cost nothing.
    val ib = intervals.where(col(lo) <= col(hi)).withColumn("__bucket",
      explode(sequence(floorBucket(lo, bucketWidth), floorBucket(hi, bucketWidth))))
    val pb = points.withColumn("__bucket", floorBucket(pointVal, bucketWidth))
    pb.join(ib, pb(pointKey) === ib(intervalKey) && pb("__bucket") === ib("__bucket"))
      .where(col(pointVal) >= col(lo) && col(pointVal) <= col(hi))
      .drop("__bucket")
  }

  /**
   * Interval-OVERLAP join: pairs of closed intervals sharing a key with
   * `a.lo <= b.hi AND b.lo <= a.hi`. Both sides explode to value buckets
   * and meet on `(key, bucket)` — the same never-cartesian discipline as
   * [[bucketedRangeJoin]] — but an overlapping pair shares EVERY bucket its
   * overlap region spans, so each pair is emitted only in its FIRST shared
   * bucket: `bucket == max(floorBucket(a.lo), floorBucket(b.lo))`
   * (= the overlap start's bucket — floor is monotone, and overlap
   * guarantees that bucket lies inside both explode ranges). Exactly one
   * row per overlapping pair, no post-join distinct.
   *
   * Scale: replication is span/bucketWidth per row (pick the width near the
   * typical span); the shuffle is the (key, bucket) equi-join; AQE splits
   * skewed buckets. Inverted intervals are dropped before the explode on
   * both sides (same guard as the point form).
   */
  def bucketedIntervalJoin(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           lLo: String, lHi: String, rLo: String, rHi: String,
                           bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(left.columns ++ right.columns)
      .exists(c => c == "__bucket" || c == "__lofb"),
      "__bucket/__lofb are reserved by bucketedIntervalJoin")
    // Post-join predicates must be side-QUALIFIED (lb(...)/rb(...)) — the
    // natural call shape names both sides' bounds identically ('lo'/'hi'),
    // and bare col(...) would fail analysis as ambiguous. floorBucket is
    // name-based, so each side's lo-bucket is precomputed pre-join (__lofb,
    // one long per row) and compared qualified after.
    val lb = left.where(col(lLo) <= col(lHi))
      .withColumn("__lofb", floorBucket(lLo, bucketWidth))
      .withColumn("__bucket",
        explode(sequence(col("__lofb"), floorBucket(lHi, bucketWidth))))
    val rb = right.where(col(rLo) <= col(rHi))
      .withColumn("__lofb", floorBucket(rLo, bucketWidth))
      .withColumn("__bucket",
        explode(sequence(col("__lofb"), floorBucket(rHi, bucketWidth))))
    lb.join(rb, lb(leftKey) === rb(rightKey) && lb("__bucket") === rb("__bucket"))
      .where(lb(lLo) <= rb(rHi) && rb(rLo) <= lb(lHi))
      .where(lb("__bucket") === greatest(lb("__lofb"), rb("__lofb")))
      .drop("__bucket", "__lofb")
  }
}
