package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Warehouse-maintenance operators: SCD Type-2 history building from a
 * changelog, keyed snapshot diffing, and a declarative data-quality
 * constraint report — the maintenance jobs that run NEXT TO an analytics
 * engine over the same tables (reference analogue: the curation/ingest
 * side of arrow-udf deployments; none of these need UDFs, so they are
 * pure Catalyst plans).
 *
 * Scale design notes per operator are on each method; nothing here ever
 * collects a corpus-sized result to the driver, and every join is either
 * key-bucketed (AQE-splittable) or an explicitly-reportable aggregate.
 */
object Warehouse {

  /** Slowly-Changing-Dimension Type-2 history from a changelog: per `keyCol`
    * (ordered by `tsCol`, then `tiebreakCol` for determinism under duplicate
    * timestamps), consecutive rows whose `stateCols` are unchanged collapse
    * into one VERSION; each version carries `valid_from` (its first ts),
    * `valid_to` (the NEXT version's first ts, NULL while current — the
    * half-open [from, to) convention) and `is_current`.
    *
    * Change detection is null-safe (`<=>` over the state struct), so NULL
    * state values compare like values, not like SQL unknowns.
    *
    * Scale: ONE shuffle on `keyCol`; the change-detection lag and the
    * validity lead ride the same (key, ts, tiebreak) sort order — the
    * filter between them preserves ordering, so Catalyst plans a single
    * Exchange+Sort. Per-key state in the window operator is O(1).
    * Output: (keyCol, stateCols…, valid_from, valid_to, is_current). */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, tiebreakCol: String,
           stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "scd2 needs at least one state column")
    require(!(stateCols :+ keyCol :+ tsCol).exists(_.startsWith("__")),
      "scd2: __-prefixed input columns collide with intermediates")
    val reservedScd2 = Set("valid_from", "valid_to", "is_current")
    require(!(keyCol +: tsCol +: tiebreakCol +: stateCols).exists(reservedScd2),
      s"scd2: input columns may not be named ${reservedScd2.mkString("/")}")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tiebreakCol))
    val state = struct(stateCols.map(col): _*)
    df.select((keyCol +: tsCol +: tiebreakCol +: stateCols).distinct.map(col): _*)
      .withColumn("__prev", lag(state, 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> state))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select((keyCol +: stateCols) .map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** SCD Type-1 (latest-wins) state: one row per key carrying the state of
    * the greatest (ts, tiebreak) — the upsert-compaction companion to
    * [[scd2]]. ONE partial-aggregated shuffle (`max_by` folds map-side);
    * no window, no sort. Output: (keyCol, stateCols…, tsCol). */
  def scd1Latest(df: DataFrame, keyCol: String, tsCol: String,
                 tiebreakCol: String, stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "scd1Latest needs at least one state column")
    require(!(keyCol +: tsCol +: tiebreakCol +: stateCols)
      .exists(_.startsWith("__")),
      "scd1Latest: __-prefixed input columns collide with intermediates")
    df.groupBy(col(keyCol))
      .agg(
        max_by(struct(stateCols.map(col): _*),
          struct(col(tsCol), col(tiebreakCol))).as("__st"),
        max(struct(col(tsCol), col(tiebreakCol))).as("__at"))
      .select(col(keyCol) +: stateCols.map(c => col(s"__st.$c").as(c)) :+
        col(s"__at.$tsCol").as(tsCol): _*)
  }

  /** Incremental SCD2 maintenance (the MERGE pattern): apply a NEW
    * changelog batch to an existing [[scd2]] history without touching
    * closed versions. Each key's OPEN version is re-seeded as a synthetic
    * changelog row at its `valid_from` (with a −∞ tiebreak so it sorts
    * before any same-instant new row) and re-collapsed together with the
    * new rows; the result is `closed-history ∪ scd2(seeds ∪ changes)` —
    * IDENTICAL to rebuilding from the full changelog (the oracle gate
    * replays exactly that). A change OLDER than — or AT THE SAME INSTANT
    * as — its key's open version fails loudly: older data would rewrite
    * closed history, and a same-instant change with a tiebreak below the
    * open version's original row would reorder against the full rebuild
    * (the synthetic seed carries a −∞ tiebreak, not the original), so both
    * need an explicit watermark/dedup policy upstream, not a silent
    * divergence. The guard rides the ts column itself so column pruning
    * can never elide it.
    *
    * Scale: closed history is touched by NOTHING (at 100 TB it stays on
    * disk; only the open-version seeds — one row per live key — and the
    * new batch enter the shuffle). `tiebreakCol` must be integral (the
    * synthetic seed tiebreak is Long.MinValue). */
  def scd2Apply(history: DataFrame, changes: DataFrame, keyCol: String,
                tsCol: String, tiebreakCol: String,
                stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "scd2Apply needs at least one state column")
    Dedup.requireIntegralIds(changes, Seq(tiebreakCol), "scd2Apply")
    val closed = history.where(col("valid_to").isNotNull)
    val open = history.where(col("valid_to").isNull)
    val tsType = changes.schema(tsCol).dataType
    val openFrom = open.select(col(keyCol), col("valid_from").as("__vf"))
    val guardedChanges = changes.join(openFrom, Seq(keyCol), "left")
      .withColumn("__ts_g",
        when(col("__vf").isNotNull && col(tsCol) <= col("__vf"),
          raise_error(concat(lit("scd2Apply: change for key "),
            col(keyCol).cast("string"),
            lit(" is at or before the open version's valid_from — late or" +
              " same-instant data needs a watermark/dedup policy, not a" +
              " silent history divergence"))).cast(tsType))
          .otherwise(col(tsCol)))
      .select(col(keyCol) +: col("__ts_g").as(tsCol) +:
        col(tiebreakCol).cast("long").as(tiebreakCol) +: stateCols.map(col): _*)
    val seeds = open.select(col(keyCol) +: col("valid_from").as(tsCol) +:
      lit(Long.MinValue).as(tiebreakCol) +: stateCols.map(col): _*)
    closed.select((keyCol +: stateCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
      .union(scd2(seeds.union(guardedChanges), keyCol, tsCol, tiebreakCol,
        stateCols))
  }

  /** Keyed snapshot diff: classify every key across two snapshot versions as
    * `added` (new only), `removed` (old only), `changed` (both, differing
    * `cmpCols`) or `unchanged`; `includeUnchanged=false` (default) keeps the
    * result change-sized, not table-sized. Comparison is null-safe struct
    * equality. CONTRACT: `keyCols` identify at most one row per snapshot
    * (duplicate keys multiply through the join, as in any keyed merge).
    *
    * Scale: one co-partitioned shuffle per side into a sort-merge FULL
    * OUTER join on the key — the one join shape that can't broadcast; AQE
    * skew-split applies. The change filter is evaluated join-side, so with
    * the default only the delta flows downstream.
    * Output: (keyCols…, change, old_<c>/new_<c> per cmp col). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   cmpCols: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && cmpCols.nonEmpty, "need key and compare columns")
    require(!(keyCols ++ cmpCols).exists(_.startsWith("__")),
      "snapshotDiff: __-prefixed input columns collide with intermediates")
    require(!keyCols.contains("change"),
      "snapshotDiff: a key column named 'change' collides with the output")
    def side(df: DataFrame, tag: String) =
      df.select(keyCols.map(col) :+ struct(cmpCols.map(col): _*).as(tag): _*)
    // using-columns full outer join → key columns arrive coalesced; a
    // missing side is a NULL struct (structs with null FIELDS are non-null,
    // so presence tests stay exact even for all-NULL compare values)
    val j = side(oldDf, "__old").join(side(newDf, "__new"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(!(col("__old") <=> col("__new")), lit("changed"))
          .otherwise(lit("unchanged")))
    val kept = if (includeUnchanged) j else j.where(col("change") =!= "unchanged")
    kept.select(keyCols.map(col) ++ Seq(col("change")) ++ cmpCols.flatMap(c =>
      Seq(col(s"__old.$c").as(s"old_$c"), col(s"__new.$c").as(s"new_$c"))): _*)
  }

  /** Declarative data-quality report (mini constraint-validation battery):
    * one tall row `(check_name, violations, total)` per declared check.
    *
    *  - `notNull`: NULL count per column (total = table rows)
    *  - `ranges`: values (cast long) outside [lo, hi]; NULLs are NOT range
    *    violations — completeness is `notNull`'s job (total = table rows)
    *  - `accepted`: values outside the allowed set; NULLs not counted
    *    (total = table rows)
    *  - `unique`: excess duplicate rows per key set, Σ max(c−1, 0) over
    *    group counts c (total = table rows)
    *  - `refs`: `(fkCol, dimDf, pkCol)` orphaned foreign keys — non-null
    *    fk values with no match in the dimension's pk (total = non-null
    *    fk rows)
    *  - `predicates`: `(name, sqlBooleanExpr)` — rows where the expression
    *    is NOT true (NULL counts as a violation: an unknown invariant is a
    *    broken invariant); folded into the same single scan
    *
    * Scale: all notNull/range/accepted indicators fold into ONE scan's
    * partial aggregate; each `unique` key set is one groupBy whose shuffle
    * carries only (key, count); each ref check is one left join against the
    * DISTINCT dimension keys (let AQE broadcast small dims) reduced to two
    * counters. The report itself is checks-sized. */
  def dqReport(df: DataFrame,
               notNull: Seq[String] = Nil,
               unique: Seq[Seq[String]] = Nil,
               ranges: Seq[(String, Long, Long)] = Nil,
               accepted: Seq[(String, Seq[String])] = Nil,
               refs: Seq[(String, DataFrame, String)] = Nil,
               predicates: Seq[(String, String)] = Nil): DataFrame = {
    require(notNull.nonEmpty || unique.nonEmpty || ranges.nonEmpty ||
      accepted.nonEmpty || refs.nonEmpty || predicates.nonEmpty,
      "dqReport: no checks declared")
    require(ranges.forall { case (_, lo, hi) => lo <= hi },
      "dqReport: range checks need lo <= hi")
    require(accepted.forall(_._2.nonEmpty),
      "dqReport: accepted-set checks need at least one allowed value")
    require(unique.forall(_.nonEmpty), "dqReport: empty unique key set")
    val scanChecks: Seq[(String, org.apache.spark.sql.Column)] =
      notNull.map(c => s"not_null:$c" -> col(c).isNull.cast("long")) ++
      ranges.map { case (c, lo, hi) =>
        s"range:$c[$lo,$hi]" -> (col(c).isNotNull &&
          (col(c).cast("long") < lo || col(c).cast("long") > hi)).cast("long") } ++
      accepted.map { case (c, vs) =>
        s"accepted:$c" -> (col(c).isNotNull &&
          !col(c).isin(vs.map(_.asInstanceOf[Any]): _*)).cast("long") } ++
      predicates.map { case (name, e) =>
        s"predicate:$name" -> (!coalesce(expr(e), lit(false))).cast("long") }
    val scanReport: Option[DataFrame] =
      if (scanChecks.isEmpty) None else Some {
        val aggs = scanChecks.zipWithIndex.map { case ((_, ind), i) =>
          coalesce(sum(ind), lit(0L)).as(s"__v_$i")
        } :+ count(lit(1)).as("__total")
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = scanChecks.zipWithIndex.map { case ((name, _), i) =>
          s"'${name.replace("'", "''")}', __v_$i"
        }.mkString(", ")
        one.selectExpr(
          s"stack(${scanChecks.size}, $stackArgs) AS (check_name, violations)",
          "__total AS total")
      }
    val uniqueReports = unique.map { ks =>
      df.groupBy(ks.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(when(col("__c") > 1, col("__c") - 1)), lit(0L))
          .as("violations"), coalesce(sum(col("__c")), lit(0L)).as("total"))
        .select(lit(s"unique:${ks.mkString(",")}").as("check_name"),
          col("violations"), col("total"))
    }
    val refReports = refs.map { case (fk, dimDf, pk) =>
      val fks = df.where(col(fk).isNotNull).select(col(fk).as("__fk"))
      val dim = dimDf.select(col(pk).as("__fk")).distinct()
        .withColumn("__hit", lit(1))
      fks.join(dim, Seq("__fk"), "left")
        .agg(coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("violations"), count(lit(1)).as("total"))
        .select(lit(s"ref:$fk->$pk").as("check_name"),
          col("violations"), col("total"))
    }
    (scanReport.toSeq ++ uniqueReports ++ refReports).reduce(_ union _)
  }

  /** Small-file compaction — the maintenance job every long-lived ingest
    * table needs: rewrite a parquet directory into ⌈totalBytes /
    * targetBytes⌉ files and swap it in place. Returns
    * (filesBefore, filesAfter, rows).
    *
    * The rewrite is ONE round-robin repartition (no keys, no skew — Spark's
    * RoundRobinPartitioning balances by construction); the swap is
    * rename-based (dir → .bak, tmp → dir, drop .bak), atomic per rename on
    * HDFS/local. On an object store (no atomic rename) production tables
    * want a manifest-based table format instead — this operator is the
    * filesystem-table half, and its crash window (between the two renames)
    * leaves `.bak` intact for manual recovery.
    *
    * At 100 TB you run this per PARTITION directory (date=…), not per
    * table: each invocation's cost is then one partition's rewrite and the
    * repartition count stays in the thousands. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long): (Int, Int, Long) = {
    require(targetBytes >= 1L, "targetBytes >= 1")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    // a partitioned table root has NO top-level data files — rewriting it
    // here would flatten the layout into one unpartitioned file and destroy
    // partition pruning; fail loudly instead (run compact per partition dir)
    require(before.nonEmpty,
      s"compact: no top-level .parquet files in $dir — for a partitioned " +
        "table run compact on each partition directory")
    val total = before.map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1L) / targetBytes).toInt
    // row count via observe: piggybacks on the rewrite job's single scan
    // instead of paying a second full read
    val obs = org.apache.spark.sql.Observation()
    val df = spark.read.parquet(dir).observe(obs, count(lit(1)).as("rows"))
    val tmp = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + ".compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + ".compact_bak")
    df.repartition(n).write.mode("overwrite").parquet(tmp.toString)
    val rows = obs.get("rows").asInstanceOf[Long]
    fs.delete(bak, true)
    require(fs.rename(path, bak), s"compact: could not move $dir aside")
    require(fs.rename(tmp, path), s"compact: could not swap in rewritten $dir")
    fs.delete(bak, true)
    (before.length, dataFiles(path).length, rows)
  }

  /** k-anonymity audit over a quasi-identifier combination: every distinct
    * value combination of `quasiCols` must be shared by at least `k` rows,
    * or the rows holding it are re-identifiable by joining those columns
    * against an external dataset — the standard privacy gate run on a
    * training corpus's metadata columns before release. Returns only the
    * VIOLATING combinations with their group sizes (delta-sized output:
    * empty when the table is k-anonymous; a combination with exactly `k`
    * rows is compliant).
    *
    * Scale: one map-side-combined aggregate on the quasi columns — the
    * output is bounded by the number of rare combinations, never the table;
    * nothing reaches the driver. NULL is a value: an all-NULL combination
    * held by fewer than k rows is reported like any other (grouping treats
    * NULLs as equal, matching SQL GROUP BY). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: need at least one quasi column")
    require(k >= 2, "kAnonymity: k < 2 is vacuous (every row is 1-anonymous)")
    require(!quasiCols.contains("n"),
      "kAnonymity: output column 'n' collides with a quasi column — rename it")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }
}
