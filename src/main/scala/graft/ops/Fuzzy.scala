package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity join (fuzzy join / entity resolution) with
 * PassJoin-style pigeonhole blocking (Li, Deng, Feng — "PassJoin: a
 * partition-based method for similarity joins", VLDB 2012): never O(n²).
 *
 * Blocking soundness: split the index-side string into `k+1` contiguous
 * segments. An alignment witnessing edit distance ≤ k touches ≤ k of those
 * segments (each substitution/deletion lands inside exactly one segment;
 * insertions fall between characters and only shift positions), so at least
 * one segment survives UNTOUCHED and appears verbatim in the probe string,
 * displaced by at most k positions. The probe side therefore emits, for each
 * plausible index length `la ∈ [len−k, len+k]` and segment index, every
 * substring of the segment's length within ±k of its nominal start — a
 * bounded O(k²·(2k+1)) key set per row. Candidates meet on the exact
 * (segment-index, segment-content) equi-join key; `levenshtein ≤ k`
 * verifies. No false negatives ⇒ the result provably equals the brute-force
 * cross join the oracle runs; only the shuffle volume differs.
 *
 * Scale design: ONE equi-join shuffle keyed by (segIdx, content) — key
 * fan-out is a small constant per row, bucket sizes track segment-content
 * selectivity (natural text ⇒ selective), and verification cost is bounded
 * by candidate count. Strings shorter than k+1 characters cannot host a
 * non-empty segment split; they ride a per-exact-length fallback bucket
 * (such strings live in a tiny O(alphabet^k) universe, and an edit-distance
 * join over them is inherently all-pairs within the bucket).
 */
object Fuzzy {

  /** Probe-side key generator: for every plausible index length `la` and
    * segment index, all candidate substrings within the ±k shift window.
    * Pure Spark SQL expression (codegen'd, no UDF). `sequence()` calls are
    * guarded so an empty window never produces Spark's descending-sequence
    * surprise. */
  private def probeKeysExpr(strCol: String, k: Int): String = {
    val kp1 = k + 1
    s"""array_distinct(flatten(transform(
       |  sequence(greatest(length($strCol) - $k, 0), length($strCol) + $k), la ->
       |    CASE WHEN la <= $k THEN array(struct(-1 AS gi, concat('L', la) AS gs))
       |    ELSE flatten(transform(sequence(0, $k), i ->
       |      CASE WHEN least(length($strCol) - ((((i+1) * la) div $kp1) - ((i * la) div $kp1)),
       |                      ((i * la) div $kp1) + $k)
       |                >= greatest(((i * la) div $kp1) - $k, 0)
       |           THEN transform(sequence(greatest(((i * la) div $kp1) - $k, 0),
       |                                   least(length($strCol) - ((((i+1) * la) div $kp1) - ((i * la) div $kp1)),
       |                                         ((i * la) div $kp1) + $k)), p ->
       |                  struct(i AS gi,
       |                         substring($strCol, p + 1,
       |                                   (((i+1) * la) div $kp1) - ((i * la) div $kp1)) AS gs))
       |           ELSE CAST(array() AS ARRAY<STRUCT<gi: INT, gs: STRING>>) END))
       |    END)))""".stripMargin
  }

  /** Index-side key generator: the k+1 segments of the string itself (or the
    * short-string fallback bucket). */
  private def indexKeysExpr(strCol: String, k: Int): String = {
    val kp1 = k + 1
    s"""CASE WHEN length($strCol) <= $k
       |     THEN array(struct(-1 AS gi, concat('L', length($strCol)) AS gs))
       |     ELSE transform(sequence(0, $k), i ->
       |       struct(i AS gi,
       |              substring($strCol, ((i * length($strCol)) div $kp1) + 1,
       |                        (((i+1) * length($strCol)) div $kp1)
       |                          - ((i * length($strCol)) div $kp1)) AS gs)) END""".stripMargin
  }

  /** PassJoin candidate pairs over two DISTINCT-string relations
    * (`sa`/`sb` columns), verified with `levenshtein ≤ k`. Includes the
    * (s, s) identical pair when it exists on both sides. */
  private def distinctStringPairs(uniqA: DataFrame, uniqB: DataFrame,
                                  k: Int): DataFrame = {
    val idx = uniqA.withColumn("key", explode(expr(indexKeysExpr("sa", k))))
    val prb = uniqB.withColumn("key", explode(expr(probeKeysExpr("sb", k))))
    // NOTE (r15): a dedup-candidates-before-verification variant (distinct
    // (sa, sb) pairs, then one levenshtein per candidate) was tried and
    // REVERTED — on planted high-selectivity corpora it won ~15%, but on
    // natural text (q_fuzzy_join over part names) segment keys are shared
    // widely and the pre-verification distinct exchanged a candidate set the
    // pushed-down filter otherwise prunes in place (3.0 s → 12.2 s). The
    // pushed levenshtein evaluates once per join row plus once per survivor
    // in the projection; that duplicate is the cheaper evil here.
    // NOTE (r16): re-tried as a COST-BASED switch (sampled 1/8-per-side
    // candidate-multiplicity probe deciding dedup per input, per r15
    // VERDICT #4). Measured pinned both ways, warm min-of-3, same host:
    // dedup lost even on the PLANTED probes this time (x_fuzzy_1m 11.7 s
    // no-dedup vs 13.2 dedup; x_fuzzy_dup_1m 4.1 vs 4.8; q_fuzzy_join 2.8
    // vs 9.9), and the sampling probe itself cost 0.6–5.5 s because the
    // distinct-string relations recompute for the probe action (they are
    // deliberately not persisted — corpus-sized). The r15 planted-probe win
    // did not reproduce; no regime measured here pays for the switch, so
    // the pushed-filter shape below stays the unconditional choice.
    idx.join(prb, idx("key") === prb("key"))
      .where(abs(length(col("sa")) - length(col("sb"))) <= k)
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .where(col("dist") <= k)
      .select(col("sa"), col("sb"), col("dist"))
      .distinct()
  }

  /** All (id_a, id_b, dist) pairs across `left` × `right` with
    * `levenshtein(strA, strB) ≤ maxDist`. Ids must be integral (join keys
    * and downstream pair dedup assume exact equality semantics).
    *
    * Duplicate strings are collapsed BEFORE blocking: the candidate join
    * runs over distinct strings, then maps back to ids with equi-joins.
    * A value appearing m times therefore costs the blocking stage one row,
    * not m (and never m² candidate checks) — only the final id-pair
    * expansion is output-sized, which any correct answer must pay. */
  def fuzzyJoin(left: DataFrame, leftId: String, leftStr: String,
                right: DataFrame, rightId: String, rightStr: String,
                maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, "maxDist in 1..4 (key fan-out grows O(k^3))")
    Dedup.requireIntegralIds(left, Seq(leftId), "fuzzyJoin")
    Dedup.requireIntegralIds(right, Seq(rightId), "fuzzyJoin")
    val l = left.select(col(leftId).cast("long").as("id_a"),
                        col(leftStr).cast("string").as("s_a"))
    val r = right.select(col(rightId).cast("long").as("id_b"),
                         col(rightStr).cast("string").as("s_b"))
    val pairs = distinctStringPairs(
      l.select(col("s_a").as("sa")).distinct(),
      r.select(col("s_b").as("sb")).distinct(), maxDist)
    pairs
      .join(l, col("sa") === col("s_a"))
      .join(r, col("sb") === col("s_b"))
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Self-join variant: unordered pairs once (`id_a < id_b`). The
    * distinct-string core self-joins the string universe (ordered
    * `sa ≤ sb` so each unordered string pair verifies once); identical-
    * string id pairs ride the `sa = sb` diagonal. */
  def fuzzySelfJoin(df: DataFrame, idCol: String, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, "maxDist in 1..4 (key fan-out grows O(k^3))")
    Dedup.requireIntegralIds(df, Seq(idCol), "fuzzySelfJoin")
    val rows = df.select(col(idCol).cast("long").as("id"),
                         col(strCol).cast("string").as("s"))
    val uniq = rows.select(col("s")).distinct()
    val pairs = distinctStringPairs(
      uniq.select(col("s").as("sa")), uniq.select(col("s").as("sb")), maxDist)
      .where(col("sa") <= col("sb"))
    val a = rows.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = rows.select(col("id").as("id_b"), col("s").as("s_b"))
    // sa < sb: every (ids(sa) × ids(sb)) combination is one unordered id
    // pair — reorder with least/greatest. sa = sb (the identical-string
    // diagonal): both orientations appear, keep id_a < id_b only.
    pairs
      .join(a, col("sa") === col("s_a"))
      .join(b, col("sb") === col("s_b"))
      .where(col("sa") < col("sb") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo, SIGMOD 1995):
    * sort all records by the blocking key, then compare only records within
    * `window` positions of each other, scoring candidates with the
    * codegen'd `jaro_winkler` and keeping pairs at `sim ≥ minSim`.
    *
    * Distributed shape: ranks come from a DISTRIBUTED range sort with
    * shared-shuffle offset attachment ([[Rank.globalOrder]]; the
    * single-partition `row_number()` window is explicitly avoided — same
    * contract as `Curation.deterministicShuffle`); successor pairing
    * is an equi-join on rank after a bounded (window−1)-way fan-out. One
    * sort + one rank-keyed shuffle of (w−1)·n slim rows — never O(n²), and
    * the window is the method's published recall knob.
    *
    * Requires `Graft.install` (uses the registered `jaro_winkler`).
    * Output: (id_a, id_b, sim), id_a preceding id_b in sort order. */
  def sortedNeighborhood(df: DataFrame, idCol: String, strCol: String,
                         window: Int, minSim: Double): DataFrame = {
    require(window >= 2, "window >= 2")
    Dedup.requireIntegralIds(df, Seq(idCol), "sortedNeighborhood")
    val base = df.where(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(strCol).cast("string").as("s"))
    // Rank.globalOrder (r15): one shared range exchange, unsorted counting
    // pass, one in-partition sort, no external-Row conversion (the old
    // toRdd.zipWithIndex sorted twice and boxed every row).
    // localCheckpoint: ranked is joined against itself below — without the
    // lineage cut the rank attachment would run once per join side.
    val ranked = Rank.globalOrder(base, Seq(col("s"), col("id")), "rk")
      .select(col("rk"), col("id"), col("s"))
      .localCheckpoint()
    val fan = ranked
      .withColumn("off", explode(sequence(lit(1), lit(window - 1))))
      .select((col("rk") + col("off")).as("rk2"),
              col("id").as("id_a"), col("s").as("s_a"))
    val right = ranked.select(col("rk").as("rk2"),
      col("id").as("id_b"), col("s").as("s_b"))
    fan.join(right, "rk2")
      .withColumn("sim", expr("jaro_winkler(s_a, s_b)"))
      .where(col("sim") >= lit(minSim))
      .select("id_a", "id_b", "sim")
  }
}
