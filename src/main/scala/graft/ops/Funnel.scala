package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel analysis over an event stream: for each user, the earliest
 * stage-1 event, then the earliest stage-2 event STRICTLY after it, and so
 * on through the stage list — the product-analytics "view → click →
 * purchase" conversion primitive.
 *
 * Scale design: ONE shuffle on the user key; each group is scanned once in
 * timestamp order with `flatMapSortedGroups` (Spark sorts groups
 * spill-safely instead of buffering them), and per-user state is the
 * stage-time array — O(#stages), never O(events). The greedy sorted scan
 * (take the next needed stage the first time it appears after the previous
 * stage's time) is provably the sequential-min chain: t_{k+1} =
 * min{ts of stage k+1 | ts > t_k}, which is what the SQL oracle computes
 * with chained min-aggregates.
 */
object Funnel {

  /** One row per user: `(userCol, reached, t_1 … t_n)` where `reached` is
    * the number of completed stages and `t_k` is the stage-k chain time
    * (null once the chain breaks). Timestamps are compared as longs —
    * normalize first (see [[graft.SparkEntry.eventsTsNs]]). */
  /** `maxSpan`: optional conversion window — later stages only count while
    * `ts − t_1 ≤ maxSpan` (anchored at the FIRST stage-1 touch, the
    * standard first-touch attribution; a later anchor is never considered). */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String], maxSpan: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.length <= 8, "1..8 stages")
    Dedup.requireIntegralIds(events, Seq(userCol), "funnel")
    requireLongTs(events, tsCol, "funnel")
    val spark = events.sparkSession
    import spark.implicits._
    val n = stages.length
    val stageArr = stages.toArray
    val out = events
      .select(col(userCol).cast("long").as("u"), col(typeCol).cast("string").as("tp"),
        col(tsCol).cast("long").as("t"))
      .where(col("u").isNotNull && col("tp").isin(stages: _*) && col("t").isNotNull)
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("t").asc) { (user, it) =>
        val times = new Array[Long](n)
        var next = 0
        val span = maxSpan.getOrElse(Long.MaxValue)
        it.foreach { case (_, tp, ts) =>
          if (next < n && tp == stageArr(next) &&
              (next == 0 || (ts > times(next - 1) && ts - times(0) <= span))) {
            times(next) = ts
            next += 1
          }
        }
        val filled: Seq[Option[Long]] =
          (0 until n).map(k => if (k < next) Some(times(k)) else None)
        Iterator.single((user, next, filled))
      }(Encoders.product[(Long, Int, Seq[Option[Long]])])
      .toDF("u", "reached", "ts_list")
    // every user with at least one stage-typed event gets a row (reached=0
    // if the chain never starts); users with no stage events have no funnel
    val tCols = (0 until n).map(k => element_at(col("ts_list"), k + 1).as(s"t${k + 1}"))
    out.select(col("u").as(userCol) +: col("reached") +: tCols: _*)
  }

  /** Cohort retention matrix: users are anchored to the day of their first
    * `anchorType` event; each (cohort_day, offset_day) cell counts the
    * distinct users from that cohort active (any event) that many days
    * later. Timestamps are ns-since-epoch longs; days are integer division
    * by 86400e9 — all-integer, so the matrix hash-gates exactly.
    *
    * Scale: anchor extraction is one user-keyed counted aggregate; activity
    * dedups to (user, day) — bounded by users × active days, far below the
    * event count; the join is user-keyed; the final cell aggregate is a
    * (cohort, offset)-keyed count-distinct. Nothing is ever driver-side. */
  /** Timestamps must already be integral (ns-since-epoch longs, see
    * [[graft.SparkEntry.eventsTsNs]]): a TimestampType column would CAST to
    * seconds and silently collapse day arithmetic / chain ordering. */
  private def requireLongTs(df: DataFrame, tsCol: String, op: String): Unit = {
    val dt = df.schema(tsCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
      s"$op: timestamp column '$tsCol' must be an integral epoch value, got $dt")
  }

  def cohortRetention(events: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, anchorType: String): DataFrame = {
    Dedup.requireIntegralIds(events, Seq(userCol), "cohortRetention")
    requireLongTs(events, tsCol, "cohortRetention")
    // integer DIV, not `/`: float division of an ns-scale long loses
    // precision past the double mantissa and can misplace day boundaries
    val day = expr(s"CAST($tsCol AS BIGINT) DIV 86400000000000")
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("u"), col(typeCol).cast("string").as("tp"),
        day.as("day"))
    val anchors = e.where(col("tp") === anchorType)
      .groupBy("u").agg(min("day").as("cohort_day"))
    val activity = e.select(col("u"), col("day")).distinct()
    activity.join(anchors, "u")
      .where(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_day"))
      .agg(countDistinct("u").as("active_users"))
  }

  /** Session path mining: the `k` most frequent length-`n` event-type
    * sequences occurring inside gap-sessions — "what do users do next"
    * product analytics. Sessions are `gapNs`-bounded (a gap larger than
    * `gapNs` between consecutive events starts a new session); every
    * sliding n-window fully inside one session counts once.
    *
    * Scale: one shuffle on the user key (sessionization + leads in two
    * window passes over the same sort), one counted path aggregation
    * (partial map-side combine — path cardinality ≤ |types|ⁿ, tiny), and a
    * TakeOrdered top-k. `idCol` breaks timestamp ties deterministically.
    * Output: (path, cnt), ordered cnt desc then path. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, idCol: String, gapNs: Long, n: Int,
               k: Int): DataFrame = {
    require(n >= 2 && n <= 8, "path length in 2..8")
    Dedup.requireIntegralIds(events, Seq(userCol), "topPaths")
    requireLongTs(events, tsCol, "topPaths")
    import org.apache.spark.sql.expressions.Window
    val wRow = Window.partitionBy("u").orderBy(col("t"), col("i"))
    val wRun = wRow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select(
      col(userCol).cast("long").as("u"), col(typeCol).cast("string").as("tp"),
      col(tsCol).cast("long").as("t"), col(idCol).cast("long").as("i"))
    val sess = base
      .withColumn("__new", when(col("t") - lag(col("t"), 1).over(wRow) <= gapNs, 0L)
        .otherwise(1L))
      .withColumn("sess", sum(col("__new")).over(wRun))
    val withLeads = (1 until n).foldLeft(sess) { (d, j) =>
      d.withColumn(s"tp$j", lead(col("tp"), j).over(wRow))
        .withColumn(s"ok$j", lead(col("sess"), j).over(wRow) === col("sess"))
    }
    val inSession = (1 until n).map(j => col(s"ok$j")).reduce(_ && _)
    val path = concat_ws(">", col("tp") +: (1 until n).map(j => col(s"tp$j")): _*)
    withLeads.where(inSession)
      .select(path.as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }
}
