package graft.ops

import graft.functions.{GraftAggregate, Udf}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Mergeable summary sketches for corpus-scale profiling: HyperLogLog distinct
 * counting, count-min frequency estimation, and Bloom-filter membership.
 *
 * These are the operators a 100 TB pipeline reaches for when the exact
 * answer (COUNT(DISTINCT …), a full frequency table, a shuffled semi-join)
 * would itself be a corpus-sized shuffle. Each sketch here is:
 *
 *  - '''one pass, map-side combinable''': state is a small fixed-size array
 *    (HLL: 2^p bytes; CMS: d·w longs; Bloom: m/64 longs) that Spark's
 *    partial-aggregation split merges associatively — the shuffle carries
 *    one small state per partition, never the keys;
 *  - '''deterministic''': every hash is the engine-wide md5-prefix scheme
 *    ([[Hashing.md5_60]]), so results are reproducible across runs, engines,
 *    and the DuckDB oracle (which replays the same md5 arithmetic in SQL);
 *  - '''integer-exact where gated''': the HLL estimator is evaluated in
 *    exact BigInt arithmetic (a fixed rational alpha), not floating point,
 *    so the correctness gate hashes identical integers on both engines.
 *
 * Scale notes: the collected artifacts (an HLL register file, a CMS matrix,
 * a Bloom bit array) are kilobytes by construction, independent of corpus
 * size — safe to collect, broadcast, persist, or merge across days.
 */
object Sketches {

  // ---- shared hashing ------------------------------------------------------

  /** 60-bit md5 prefix of `i + ":" + key` — the salted row-hash family used
    * by CMS and Bloom (DuckDB replica:
    * `CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || key), 1, 15) AS BIGINT)`). */
  @inline private def saltedHash(i: Int, key: String): Long =
    Hashing.md5_60(i.toString + ":" + key)

  // ---- HyperLogLog ---------------------------------------------------------

  /** Registers of an HLL sketch with 2^p buckets over the 60-bit md5 hash:
    * bucket = low p bits, rho = 1-based position of the first set bit in the
    * remaining (60-p)-bit suffix (rho = 61-p for an all-zero suffix). */
  def hllRho(h: Long, p: Int): Int = {
    val wBits = 60 - p
    val w = h >>> p
    if (w == 0L) wBits + 1
    else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
  }

  /** Raw HLL estimator in EXACT integer arithmetic: with S = Σ_j 2^(62-M_j)
    * (so Σ 2^-M_j = S / 2^62) and the standard bias constant expressed as the
    * rational alpha_m = 7213·m / (10000·m + 10790),
    *
    *   E = floor( 7213 · m³ · 2^62  /  ((10000·m + 10790) · S) ).
    *
    * No floating point anywhere, so DuckDB reproduces it bit-for-bit in
    * HUGEINT. This is the RAW estimator (no small-range linear-counting
    * correction — that needs ln()); see [[hllEstimate]] for the corrected
    * estimate to use in application code. */
  def hllEstimateRaw(registers: Array[Byte]): Long = {
    val m = registers.length
    var s = BigInt(0)
    var j = 0
    while (j < m) { s += BigInt(1) << (62 - registers(j)); j += 1 }
    hllEstimateRawFromSum(s, m)
  }

  /** [[hllEstimateRaw]] from the precomputed S = Σ_j 2^(62-M_j) — the form
    * distributed register pipelines produce (absent buckets contribute
    * 2^62 each; add them before calling). Single source of truth for the
    * alpha constants the DuckDB oracles mirror. */
  def hllEstimateRawFromSum(s: BigInt, m: Int): Long = {
    val num = BigInt(7213) * BigInt(m).pow(3) * (BigInt(1) << 62)
    (num / (BigInt(10000 * m.toLong + 10790) * s)).toLong
  }

  /** Standard corrected estimate (linear counting below 2.5·m when empty
    * registers exist) — floats, for application use; the gated queries use
    * [[hllEstimateRaw]]. */
  def hllEstimate(registers: Array[Byte]): Double = {
    val m = registers.length
    val raw = hllEstimateRaw(registers).toDouble
    val zeros = registers.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Distributed register computation as a plain aggregation — the shape you
    * want when the registers themselves are the deliverable (merging across
    * days, unioning corpora): one groupBy over ≤2^p buckets, map-side
    * combined, rows = non-empty buckets only. Entirely built-in codegen'd
    * expressions (md5/conv/bin), no UDF in the path. */
  /** The 60-bit md5 hash column every HLL computation hashes with (DuckDB
    * replica: `CAST('0x' || substr(md5(key), 1, 15) AS BIGINT)`). */
  def hllHashCol(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** (bucket, rho) over a hash column NAMED `h` — the shared front half of
    * [[hllRegisters]] and the windowed register pipelines; keeping one
    * definition keeps the DuckDB oracle mirrors honest. */
  def hllBucketRhoCols(p: Int): (Column, Column) = {
    val wBits = 60 - p
    (col("h").bitwiseAND(lit((1 << p) - 1)).cast("int"),
      expr(s"CAST(CASE WHEN shiftrightunsigned(h, $p) = 0 THEN ${wBits + 1} " +
           s"ELSE ${wBits + 1} - length(bin(shiftrightunsigned(h, $p))) END AS INT)"))
  }

  def hllRegisters(df: DataFrame, key: Column, p: Int): DataFrame = {
    val (bucket, rho) = hllBucketRhoCols(p)
    df.where(key.isNotNull)
      .select(hllHashCol(key).as("h"))
      .select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("r"))
  }

  /** Union two register files produced by [[hllRegisters]] (the
    * incremental-pipeline shape: yesterday's persisted registers ∪ today's):
    * full-outer join on bucket, elementwise max. The result is EXACTLY the
    * register file of the concatenated corpora — HLL's defining property —
    * so unions are associative, idempotent, and re-run-safe. */
  def hllUnion(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("bucket").as("bucket2"), col("r").as("r2"))
    a.join(bb, a("bucket") === bb("bucket2"), "full_outer")
      .select(coalesce(a("bucket"), bb("bucket2")).as("bucket"),
        greatest(coalesce(a("r"), lit(0)), coalesce(bb("r2"), lit(0))).as("r"))
  }

  /** Elementwise max of two register arrays (the HLL union). */
  def hllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "register files must share p")
    val out = new Array[Byte](a.length)
    var j = 0
    while (j < a.length) { out(j) = if (a(j) >= b(j)) a(j) else b(j); j += 1 }
    out
  }

  /** Inclusion–exclusion intersection estimate from two register files:
    * |A ∩ B| ≈ E(A) + E(B) − E(A ∪ B), with the union's registers the
    * elementwise max. All three terms are the exact-integer raw estimator,
    * so the estimate is deterministic and oracle-replayable; it can be
    * negative for near-disjoint sets (estimator noise) — clamped at 0.
    * This is the join-cardinality profiling tool: registers for both key
    * columns cost one scan each, then any pairwise overlap is a driver-side
    * subtraction — no join is ever executed to estimate one. */
  def hllIntersectEstimate(a: Array[Byte], b: Array[Byte]): Long =
    math.max(0L, hllEstimateRaw(a) + hllEstimateRaw(b) - hllEstimateRaw(hllMerge(a, b)))

  /** Collect a register FILE (from [[hllRegisters]]) into a dense array. */
  def collectRegisters(regs: DataFrame, p: Int): Array[Byte] = {
    val out = new Array[Byte](1 << p)
    regs.collect().foreach { r => out(r.getInt(0)) = r.getInt(1).toByte }
    out
  }

  /** HLL as a mergeable aggregate function (`hll_distinct(string) -> bigint`,
    * p = 9 → 512 byte state): per-group approximate distinct with Spark's
    * partial/final split doing the register max-merge. */
  final class HllAgg(p: Int) extends GraftAggregate[Array[Byte], Long] {
    private val m = 1 << p
    override def createState(): Array[Byte] = new Array[Byte](m)
    override def accumulate(state: Array[Byte], input: Row): Array[Byte] = {
      if (!input.isNullAt(0)) {
        val h = Hashing.md5_60(input.getString(0))
        val bucket = (h & (m - 1)).toInt
        val r = hllRho(h, p)
        if (r > state(bucket)) state(bucket) = r.toByte
      }
      state
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < a.length) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
      a
    }
    override def finish(state: Array[Byte]): Long = hllEstimateRaw(state)
  }

  // ---- Count-min sketch ----------------------------------------------------

  /** Build the CMS matrix over `key` (optionally weighted) in one pass:
    * one partial matrix per partition, elementwise-added on the driver —
    * no key ever shuffles. Returned array is row-major (d rows × w slots),
    * kilobytes regardless of corpus size — safe to collect and broadcast. */
  def countMin(df: DataFrame, key: Column, weight: Option[Column], d: Int, w: Int): Array[Long] = {
    val hasW = weight.isDefined
    val in = weight match {
      case Some(wc) => df.select(key.cast("string").as("k"), wc.cast("long").as("wt"))
      case None => df.select(key.cast("string").as("k"))
    }
    val states = in.queryExecution.toRdd.mapPartitions { it =>
      val st = new Array[Long](d * w)
      it.foreach { ir =>
        if (!ir.isNullAt(0)) {
          val key = ir.getUTF8String(0).toString
          val wt = if (hasW && !ir.isNullAt(1)) ir.getLong(1) else 1L
          var i = 0
          while (i < d) { st(i * w + (saltedHash(i, key) % w).toInt) += wt; i += 1 }
        }
      }
      Iterator.single(st)
    }.collect()
    states.reduceOption { (a, b) =>
      var j = 0; while (j < a.length) { a(j) += b(j); j += 1 }; a
    }.getOrElse(new Array[Long](d * w))
  }

  /** Point-estimate ĉ(key) = min_i matrix[i][h_i(key) % w] — the classic CMS
    * overestimate (never an underestimate). */
  def cmsEstimate(matrix: Array[Long], d: Int, w: Int, key: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = matrix(i * w + (saltedHash(i, key) % w).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Frequency estimates for a candidate list in one corpus pass: build the
    * matrix, then evaluate each candidate driver-side (candidates are a
    * user-supplied bounded list — the corpus itself never leaves executors). */
  def cmsEstimates(spark: SparkSession, df: DataFrame, key: Column,
                   candidates: Seq[String], d: Int = 4, w: Int = 1024): DataFrame = {
    val matrix = countMin(df, key, None, d, w)
    import spark.implicits._
    candidates.map(c => (c, cmsEstimate(matrix, d, w, c))).toDF("key", "est")
  }

  /** Exact heavy hitters with a BOUNDED shuffle: pass 1 builds the CMS
    * matrix (kilobytes, no key shuffles); pass 2 prunes map-side under the
    * broadcast matrix — only keys whose ESTIMATE reaches `minCount` enter
    * the exact groupBy — then the exact count filter removes the CMS's
    * false positives. Because CMS never underestimates, no true heavy
    * hitter is pruned: over the NON-NULL keys the result is exactly
    * `groupBy.count ≥ minCount` (null keys are excluded, matching the
    * matrix build), but the shuffle carries only candidate keys instead of
    * the whole key universe (at 100 TB: heavy-hitter detection over
    * trillions of tokens with a shuffle bounded by the candidates).
    *
    * The prune verdict is memoized per partition (one d-hash probe per
    * DISTINCT key per partition, not per row — a 10^9-occurrence token
    * costs one probe per partition, not 10^9); past `memoCap` distinct
    * keys the memo stops growing and further keys probe directly, so
    * memory stays bounded on unbounded key universes. */
  def heavyHitters(df: DataFrame, key: Column, minCount: Long,
                   d: Int = 4, w: Int = 1024, memoCap: Int = 1 << 22): DataFrame = {
    val mat = countMin(df, key, None, d, w)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k")).as[String]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, java.lang.Boolean]()
        it.filter { k =>
          k != null && {
            val cached = memo.get(k)
            if (cached != null) cached.booleanValue()
            else {
              val v = cmsEstimate(mat, d, w, k) >= minCount
              if (memo.size < memoCap) memo.put(k, java.lang.Boolean.valueOf(v))
              v
            }
          }
        }
      }
      .groupBy(col("value").as("k")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .select(col("k"), col("cnt"))
  }

  // ---- Bloom filter --------------------------------------------------------

  /** Build the bit array over the build side's keys (one pass, per-partition
    * partial bitsets OR-merged on the driver — the build side never shuffles). */
  def bloomBits(build: DataFrame, key: Column, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val in = build.select(key.cast("string").as("k"))
    val states = in.queryExecution.toRdd.mapPartitions { it =>
      val st = new Array[Long](mBits / 64)
      it.foreach { ir =>
        if (!ir.isNullAt(0)) {
          val key = ir.getUTF8String(0).toString
          var i = 0
          while (i < k) {
            val pos = (saltedHash(i, key) % mBits).toInt
            st(pos >> 6) |= (1L << (pos & 63))
            i += 1
          }
        }
      }
      Iterator.single(st)
    }.collect()
    states.reduceOption { (a, b) =>
      var j = 0; while (j < a.length) { a(j) |= b(j); j += 1 }; a
    }.getOrElse(new Array[Long](mBits / 64))
  }

  @inline def bloomContains(bits: Array[Long], mBits: Int, k: Int, key: String): Boolean = {
    var i = 0
    while (i < k) {
      val pos = (saltedHash(i, key) % mBits).toInt
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Filter `probe` to rows whose key MIGHT be in the build set (no false
    * negatives; false-positive rate set by mBits/k vs build cardinality).
    * The bit array is broadcast in the task closure — the probe side is a
    * map-only scan, which is the entire point: at 100 TB this prunes a
    * corpus-sized shuffle down to the (small) candidate set before any join. */
  def bloomProbe(probe: DataFrame, key: Column, bits: Array[Long],
                 mBits: Int, k: Int): DataFrame = {
    val contains = udf { s: String => s != null && bloomContains(bits, mBits, k, s) }
    probe.where(contains(key.cast("string")))
  }

  // ---- log-binned quantile sketch ("qsketch") ------------------------------

  /** Mergeable quantile-sketch REGISTERS per group: `(key, bin, cnt)` over
    * NON-NEGATIVE integer values (negatives/NULLs excluded) with ≤ 1/16
    * relative bucket width — exact bins for v < 16, then 16 sub-bins per
    * power-of-two octave: `bin = (e−4)·16 + (v >> (e−4))`, e = bitlength−1
    * (computed as `length(bin(v)) − 1`, identical in Spark and DuckDB).
    * Like [[hllRegisters]], the artifact is engine-independent integers:
    * persist it, union shards, re-aggregate with `sum(cnt)` — quantiles of
    * a 100 TB corpus reduce to merging ≤ ~960 register rows per key.
    * One counted shuffle. */
  def qsketchRegisters(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    require(!keyCol.startsWith("__") && keyCol != "bin" && keyCol != "cnt",
      "qsketchRegisters: keyCol collides with intermediates/output")
    df.select(col(keyCol), col(valCol).cast("long").as("__v"))
      .where(col("__v").isNotNull && col("__v") >= 0)
      .withColumn("bin", expr("CASE WHEN __v < 16 THEN __v ELSE " +
        "(length(bin(__v)) - 5) * 16 + shiftright(__v, length(bin(__v)) - 5) END"))
      .groupBy(col(keyCol), col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile ESTIMATES from qsketch registers: the weighted-percentile
    * crossing bin ([[Profile.groupWeightedPercentilesDisc]] over
    * (bin, cnt) — registers per key are tiny) inverted to the bin's LOWER
    * BOUND (`(bin%16+16) << (bin div 16 − 1)` past the exact range) —
    * deterministic, merge-stable, within 1/16 relative error of the exact
    * discrete percentile (spec-asserted). Output: (keyCol, q<p> …). */
  def qsketchQuantiles(regs: DataFrame, keyCol: String, ps: Seq[Int]): DataFrame = {
    val picked = Profile.groupWeightedPercentilesDisc(regs, keyCol, "bin", "cnt", ps)
    picked.select(col(keyCol) +: ps.map { p =>
      expr(s"CASE WHEN p$p < 16 THEN p$p ELSE " +
        s"shiftleft(CAST(p$p % 16 + 16 AS BIGINT), CAST(p$p div 16 - 1 AS INT)) END")
        .as(s"q$p")
    }: _*)
  }

  // ---- registration --------------------------------------------------------

  def registerAll(): Unit = {
    Udf.aggregateNative("hll_distinct(string) -> bigint")(new HllAgg(9))
  }
}
