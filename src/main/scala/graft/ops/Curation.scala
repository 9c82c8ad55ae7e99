package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-construction operators for training-data pipelines: benchmark
 * decontamination, global sentence-level dedup, deterministic stratified
 * mixture sampling, and greedy token-budget sequence packing.
 *
 * These sit downstream of [[TextAnalysis]] (quality/language gates) and
 * [[Dedup]] (document-level dedup) in a typical pipeline:
 * filter → dedup → decontaminate → sample the mixture → pack sequences.
 *
 * == Scale design (100 TB) ==
 *
 *  - '''Decontamination''': the benchmark side (eval-set n-grams) is small by
 *    definition — a few thousand documents — so its distinct n-gram set is
 *    BROADCAST and the corpus side is a map-only scan + broadcast semi-join:
 *    no corpus-sized shuffle at all. The only exchange is the final
 *    `distinct` over contaminated doc ids (8 bytes/hit).
 *  - '''Sentence dedup''': one shuffle partitioned by sentence (the CCNet
 *    paragraph-dedup shape) to pick each sentence's global first occurrence,
 *    then one narrow shuffle by doc id to reassemble survivors in original
 *    order. Nothing is ever collected; skewed sentences (boilerplate) are
 *    split by AQE.
 *  - '''Mixture sampling''': a pure per-row filter on a salted md5 hash —
 *    no shuffle, no RNG state, reproducible across engines/runs/executors,
 *    and stable under re-partitioning (the sample is a function of the key,
 *    not of row placement).
 *  - '''Sequence packing''': greedy first-fit within each stratum, one
 *    shuffle on the stratum key. Packing is inherently sequential per
 *    stratum, so strata ARE the parallelism unit — at 100 TB you pack within
 *    (source, date-bucket) strata, thousands of independent groups. Uses
 *    `flatMapSortedGroups`, so Spark sorts each group spill-safely instead
 *    of buffering it in memory.
 */
object Curation {

  /**
   * Benchmark decontamination: ids of corpus docs sharing at least one word
   * `n`-gram with the benchmark set (the GPT-3-style n-gram overlap rule).
   * Emits one row per contaminated corpus doc: `(idCol)`.
   *
   * The benchmark n-gram set is deduplicated and broadcast; the corpus scan
   * explodes its own n-grams lazily and semi-joins — contaminated ids then
   * dedupe through the only real exchange (ids only).
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val benchNgrams = broadcast(
      benchmark.select(explode(expr(s"word_ngrams($textCol, $n)")).as("ng")).distinct())
    corpus
      .select(col(idCol), explode(expr(s"word_ngrams($textCol, $n)")).as("ng"))
      .join(benchNgrams, Seq("ng"), "left_semi")
      .select(idCol).distinct()
  }

  /**
   * Global sentence-level dedup (the CCNet paragraph-dedup shape at sentence
   * granularity): each distinct sentence survives only at its first global
   * occurrence — ordered by `(idCol, position)` — and every document is
   * reassembled from its surviving sentences in original order. Documents
   * whose sentences are ALL duplicates disappear from the output.
   *
   * Returns `(idCol, kept_text)`.
   */
  def dedupSentences(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val exploded = docs.select(
      col(idCol),
      posexplode(expr(s"sentence_array($textCol)")).as(Seq("pos", "sent")))
    // first global occurrence wins; partitioning by the sentence text is the
    // CCNet shape (the shuffle carries the sentence once, no join-back pass)
    val firstOcc = Window.partitionBy("sent").orderBy(col(idCol), col("pos"))
    exploded
      .withColumn("rn", row_number().over(firstOcc))
      .where(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("sent")))),
          p => p.getField("sent"))).as("kept_text"))
  }

  /**
   * Embedding-level decontamination: ids of corpus vectors within cosine
   * `tau` of ANY benchmark vector — the semantic sibling of the n-gram
   * [[decontaminate]] (catches paraphrased eval contamination that exact
   * n-grams miss). Emits one row per contaminated corpus id:
   * `(idCol, near_id, sim4)` where `near_id` is the SMALLEST matching
   * benchmark id and `sim4` its similarity ×10⁴ (integer-rounded).
   *
   * The benchmark side is small by definition, so it broadcasts and the
   * candidate scan is map-only (the n-gram decontamination shape, dense);
   * the only exchange is the winner aggregate over MATCHED rows — bounded
   * by contamination volume, not corpus size.
   *
   * Requires [[graft.Graft.install]] (uses `cosine_sim`).
   */
  def semanticDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, embCol: String, tau: Double): DataFrame = {
    val bench = broadcast(
      benchmark.selectExpr(s"$idCol AS near_id", s"$embCol AS be"))
    corpus.selectExpr(idCol, embCol).crossJoin(bench)
      .withColumn("sim", expr(s"cosine_sim($embCol, be)"))
      .where(col("sim") >= tau)
      .groupBy(col(idCol))
      .agg(min_by(struct(col("near_id"), col("sim")), col("near_id")).as("m"))
      .select(col(idCol), col("m.near_id").as("near_id"),
        expr("CAST(ROUND(m.sim * 10000) AS BIGINT)").as("sim4"))
  }

  /**
   * Repeated-span dedup (the exact-substring rule of Lee et al.,
   * "Deduplicating Training Data Makes Language Models Better"): any token
   * covered by a word `n`-gram whose first global occurrence — ordered by
   * `(idCol, position)` — is elsewhere in the corpus is removed, and each
   * document is reassembled from its surviving tokens in original order.
   * Documents shorter than `n` tokens carry no grams and survive intact;
   * documents whose every token is covered (exact duplicates) disappear.
   *
   * Returns `(idCol, kept_text)`. Documents that end up with NO surviving
   * tokens — fully-covered exact duplicates, but also docs whose text is
   * empty/whitespace-only/NULL — produce no output row (an empty document
   * has no place in a curated corpus; keep such rows upstream if they
   * matter).
   *
   * == Scale design ==
   * Gram instances ship as 60-bit md5 fingerprints (`doc_fingerprint` —
   * replicated exactly in the oracle, like every fingerprint operator here),
   * so the one corpus-sized exchange — the first-occurrence window — carries
   * ~20 B/gram instead of the gram text. Duplicate instances explode into at
   * most `n` covered positions each (never a per-doc range join) and
   * aggregate to one covered-position set per AFFECTED doc; that small
   * relation joins back (broadcast under AQE when it fits) and each doc is
   * rebuilt in place with an index-aware `filter` — the corpus's tokens
   * never ride a shuffle at all. Nothing is ever O(corpus²) and nothing
   * reaches the driver.
   *
   * Requires [[graft.Graft.install]] (uses the registered `doc_fingerprint`).
   */
  def dedupSpans(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 2, s"dedupSpans needs n >= 2, got $n")
    val ws = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val base = docs.select(col(idCol), ws.as("ws"))
    // gram_fingerprints streams token bytes through the digest once per
    // covering gram (r15) — value-identical to the previous
    // `doc_fingerprint(array_join(slice(ws, i+1, n), ' '))` transform, which
    // copied every token into ~n sliced-and-joined gram strings first
    val grams = base
      .where(size(col("ws")) >= n)
      .select(col(idCol), posexplode(expr(s"gram_fingerprints(ws, $n)"))
        .as(Seq("pos", "fp")))
    val firstOcc = Window.partitionBy("fp").orderBy(col(idCol), col("pos"))
    val covered = grams
      .withColumn("rn", row_number().over(firstOcc)).where(col("rn") > 1)
      .select(col(idCol), explode(expr(s"sequence(pos, pos + ${n - 1})")).as("pos"))
      .groupBy(col(idCol)).agg(collect_set(col("pos")).as("cov"))
    // set-probe rebuild: O(tokens) per doc even when cov is huge (an
    // array_contains-per-token filter would be O(tokens x |cov|) — quadratic
    // on a long heavily-duplicated document)
    val rebuild = udf { (ws: Seq[String], cov: Seq[Int]) =>
      if (cov == null) ws.mkString(" ")
      else {
        val s = cov.toSet
        ws.iterator.zipWithIndex.collect { case (t, i) if !s(i) => t }.mkString(" ")
      }
    }
    base.join(covered, Seq(idCol), "left")
      .select(col(idCol), rebuild(col("ws"), col("cov")).as("kept_text"))
      .where(col("kept_text") =!= "")
  }

  /**
   * Deterministic stratified sampling for mixture construction: keep a row
   * iff `md5_60(salt:key) mod 1000 < ratePermille`, where `ratePermille` may
   * be any per-row expression (per-source mixture weights). No RNG state —
   * the decision is a pure function of the key, so the sample is
   * reproducible across runs, engines, and partitionings, and two samples
   * with different salts are independent.
   */
  def stratifiedSample(df: DataFrame, idCol: String, salt: String,
      ratePermille: Column): DataFrame =
    df.where(
      expr(s"doc_fingerprint(concat('$salt:', CAST($idCol AS STRING))) % 1000")
        < ratePermille)

  /**
   * Deterministic upsampling for mixture construction — the >1-weight half
   * that [[stratifiedSample]] (a filter) cannot express: each row repeats
   * `copies` times (any per-row integer expression, e.g. a per-source epoch
   * weight), emitting a `copy` ordinal in `[0, copies)`. Rows with
   * `copies <= 0` — and NULL, which coalesces to 0 explicitly rather than
   * vanishing through NULL propagation — disappear, so one call expresses a
   * full mixture weighting (0/NULL = drop, 1 = keep, n = repeat). Pure
   * per-row generation: no shuffle, no RNG, stable under re-partitioning;
   * downstream packing/shuffling should treat `(idCol, copy)` as the
   * sequence key.
   */
  def upsample(df: DataFrame, copies: Column): DataFrame =
    df.withColumn("__n", coalesce(copies.cast("int"), lit(0)))
      .withColumn("copy", explode(when(col("__n") <= 0, array())
        .otherwise(sequence(lit(0), col("__n") - 1))))
      .drop("__n")

  /**
   * Deterministic weighted sampling WITHOUT replacement: exactly `k` rows
   * per stratum, inclusion odds proportional to an integer weight — the
   * fixed-size half of mixture construction ([[stratifiedSample]] gives a
   * fixed RATE, not a fixed count).
   *
   * Scheme: each row draws `weight` pseudo-uniform tickets
   * (`md5_60(salt:id:i)`) and keeps the minimum; the k smallest
   * min-tickets per stratum win. Min-of-w-uniforms is distributionally the
   * Efraimidis–Spirakis A-ES priority u^(1/w) (for any two rows,
   * P(a outranks b) = w_a/(w_a+w_b)), but the comparison is 60-bit INTEGER —
   * no `ln`/`pow`, whose last-ulp behavior differs across engines, so the
   * oracle replays the draw bit-for-bit.
   *
   * Scale design: the ticket min folds inside `array_min(transform(...))` —
   * map-only, nothing explodes, no shuffle; the per-stratum selection is the
   * bounded-heap TopKPerKey operator (partial heaps before the exchange, so
   * a 100 TB stratum ships k survivors per task, not the stratum).
   * Weights are capped — the ticket array is materialized per row.
   */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
      weight: Column, k: Int, salt: String, maxWeight: Int = 1024): DataFrame = {
    require(k >= 1 && maxWeight >= 1, "k and maxWeight must be positive")
    // ids ride the ticket hash as strings — a float id would render "1.0"
    // and silently draw different tickets than an integer-keyed replay
    Dedup.requireIntegralIds(df, Seq(idCol), "weightedSample")
    val prio = df
      .withColumn("__w", least(greatest(coalesce(weight.cast("int"), lit(0)), lit(0)),
        lit(maxWeight)))
      .where(col("__w") >= 1)
      .withColumn("priority", expr(
        s"""array_min(transform(sequence(0, __w - 1), i ->
           |  doc_fingerprint(concat('$salt:', CAST($idCol AS STRING), ':', CAST(i AS STRING)))))"""
          .stripMargin))
      .drop("__w")
    graft.plans.TopKPerKey.topKBy(prio, Seq(strataCol),
      Seq(("priority", true), (idCol, true)), k)
  }

  /**
   * Greedy first-fit sequence packing: within each stratum, walk documents
   * in `idCol` order and fill bins of at most `budget` tokens — the standard
   * pre-tokenization packing pass that turns documents into fixed-budget
   * training sequences. A document larger than `budget` gets a bin of its
   * own (never split, never dropped).
   *
   * Returns `(strataCol, idCol, bin, fill)` where `bin` numbers bins from 0
   * within each stratum and `fill` is the bin's running token count after
   * placing the document.
   */
  def packSequences(docs: DataFrame, strataCol: String, idCol: String,
      tokCol: String, budget: Int): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    docs
      .select(col(strataCol).cast("string"), col(idCol).cast("long"),
        col(tokCol).cast("int"))
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(idCol).asc) { (stratum, it) =>
        var bin = 0
        var fill = 0
        var first = true
        it.map { case (_, id, nTok) =>
          if (first) { fill = nTok; first = false }
          else if (fill + nTok <= budget) fill += nTok
          else { bin += 1; fill = nTok }
          (stratum, id, bin, fill)
        }
      }
      .toDF(strataCol, idCol, "bin", "fill")
  }

  /**
   * Deterministic global shuffle for training order: every row gets a
   * contiguous position `pos` (0-based) by rank of `md5(salt + ":" + id)`
   * with the id as tie-break — a reproducible permutation that is a pure
   * function of (salt, id), so re-runs, engine changes, and repartitioning
   * cannot change the order, and a new `salt` gives an independent epoch
   * permutation.
   *
   * Scale: one range-partitioned exchange shared by an (unsorted) counting
   * pass and the sorted output pass ([[Rank.globalOrder]]) — no
   * single-partition window, no driver materialization. (A bare
   * `row_number() OVER (ORDER BY …)` would collapse to one partition —
   * that is the anti-pattern this operator exists to replace.)
   */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String): DataFrame = {
    // a non-integral id would cast to null and NPE inside a task — fail
    // up-front instead (same guard as Dedup's integral-id operators)
    val idDt = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idDt.typeName),
      s"deterministicShuffle: id column '$idCol' must be integral, got $idDt")
    val h = saltedRank(idCol, salt)
    // Rank.globalOrder (r15): the old toRdd.zipWithIndex path executed the
    // distributed sort TWICE (zipWithIndex's counting job + the consuming
    // job) and converted every row out of Tungsten; globalOrder shares one
    // range exchange between an unsorted counting pass and the sorted
    // output, entirely codegen'd.
    Rank.globalOrder(
        df.where(col(idCol).isNotNull)
          .select(col(idCol).cast("long").as(idCol), h.as("__h")),
        Seq(col("__h"), col(idCol)), "pos")
      .select(col(idCol), col("pos"))
  }

  /**
   * Corpus profile as a tall `(stat, value)` report: doc/token/char totals,
   * token-count extremes, exact distinct vocabulary, and a doc-length
   * histogram (decade buckets). The report every pipeline run should log
   * before and after each gate.
   *
   * Exactly TWO corpus scans: (1) one map-side-combined aggregation keyed
   * by per-doc token count — the result is bounded by the token-count
   * DOMAIN (distinct doc lengths), not the corpus, so it is collected and
   * every scalar + histogram row derives from it driver-side (the same
   * bounded-collect contract as [[LangModel.adaptiveThreshold]]); (2) the
   * exact vocabulary distinct, the only term-keyed shuffle — swap in
   * [[Sketches.hllRegisters]] when ±2% is acceptable.
   */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val txt = coalesce(col(textCol), lit(""))
    val ws = LangModel.sharedTokensCol(textCol)
    val base = docs.select(size(ws).as("nt"), length(txt).as("nc"), ws.as("ws"))
    // Domain-bounded collect, now with a hard cap like every other bounded
    // collect site: distinct doc token counts can't realistically exceed a
    // few hundred thousand, but a corrupt tokenizer could explode the nt
    // domain — limit() bounds driver memory BEFORE the fetch and the
    // require turns overflow into a loud failure instead of a driver OOM.
    val maxLenBuckets = 4 << 20
    val perLen = base.groupBy("nt")
      .agg(count(lit(1)).as("cnt"), sum("nc").as("snc"))
      .limit(maxLenBuckets + 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(perLen.length <= maxLenBuckets,
      s"corpusStats: > $maxLenBuckets distinct doc token counts — the " +
        "token-count domain is corrupt; refusing an unbounded driver collect")
    val scalars: Seq[(String, Long)] =
      if (perLen.isEmpty) Seq("n_docs" -> 0L, "n_tokens" -> 0L, "n_chars" -> 0L)
      else Seq(
        "n_docs" -> perLen.map(_._2).sum,
        "n_tokens" -> perLen.map(p => p._1.toLong * p._2).sum,
        "n_chars" -> perLen.map(_._3).sum,
        "max_doc_tokens" -> perLen.map(_._1).max.toLong,
        "min_doc_tokens" -> perLen.map(_._1).min.toLong)
    val hist: Seq[(String, Long)] = perLen.groupBy(_._1 / 10).toSeq
      .map { case (b, rows) => (s"hist_$b", rows.map(_._2).sum) }
    val vocab = base.select(explode(col("ws")).as("term"))
      .agg(countDistinct("term").as("value"))
      .select(lit("distinct_terms").as("stat"), col("value"))
    (scalars ++ hist).toDF("stat", "value").union(vocab)
  }

  /**
   * The full Gopher/MassiveText document-quality rule battery (Rae et al.
   * 2021 §A1.1), one boolean column per rule plus the combined gate:
   *
   *  - `r_words`    word count within [minWords, maxWords]
   *  - `r_meanlen`  mean word length within [3, 10] characters
   *  - `r_symbol`   (hash + ellipsis) to word ratio ≤ 0.1
   *  - `r_bullet`   ≤ 90% of lines start with a bullet character
   *  - `r_ellipsis` ≤ 30% of lines end with an ellipsis
   *  - `r_alpha`    ≥ 80% of words contain at least one alphabetic character
   *  - `r_stop`     contains ≥ 2 distinct English stop words
   *  - `pass`       AND of all seven
   *
   * Every predicate is integer arithmetic on builtin expressions (ratio
   * bounds are cross-multiplied: `10·symbols ≤ words`, never a float), so
   * the whole battery is one map-only codegen'd projection — no shuffle, no
   * UDF — and the DuckDB oracle replays it bit-for-bit. At 100 TB this is
   * the first gate in the pipeline precisely because it costs one scan.
   */
  /** The seven gopher rule columns over a text Column — ONE definition
    * shared by the batch report ([[gopherRules]]) and the streaming gate
    * ([[gopherPass]]). Returns (n_words, named rules). */
  private def gopherRuleCols(textCol: Column, minWords: Int, maxWords: Int,
                             stopList: Seq[String]): (Column, Seq[(String, Column)]) = {
    val txt = coalesce(textCol, lit(""))
    val ws = filter(split(txt, "\\s+"), x => length(x) > 0)
    val nw = size(ws)
    val chars = aggregate(ws, lit(0), (acc, x) => acc + length(x))
    val alphaWords = size(filter(ws, x => x.rlike("[A-Za-z]")))
    val stops = array(stopList.map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(transform(ws, lower _)), stops))
    val lines = split(txt, "\n")
    val nLines = size(lines)
    val bullets = size(filter(lines, l => trim(l).startsWith("-") ||
      trim(l).startsWith("*") || trim(l).startsWith("•")))
    val ellLines = size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
    val hashes = length(txt) - length(regexp_replace(txt, "#", ""))
    val ellipses = ((length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3).cast("int")
    (nw, Seq(
      "r_words" -> (nw >= minWords && nw <= maxWords),
      "r_meanlen" -> (lit(3) * nw <= chars && chars <= lit(10) * nw),
      "r_symbol" -> (lit(10) * (hashes + ellipses) <= nw),
      "r_bullet" -> (lit(10) * bullets <= lit(9) * nLines),
      "r_ellipsis" -> (lit(10) * ellLines <= lit(3) * nLines),
      "r_alpha" -> (lit(5) * alphaWords >= lit(4) * nw),
      "r_stop" -> (stopHits >= 2)))
  }

  /** The whole battery as one boolean Column — usable as a stream filter or
    * scan predicate (sargable; the conjuncts fold into parquet DataFilters). */
  def gopherPass(textCol: Column, minWords: Int = 50, maxWords: Int = 100000,
                 stopList: Seq[String] = TextAnalysis.gopherStopwords): Column =
    gopherRuleCols(textCol, minWords, maxWords, stopList)._2
      .map(_._2).reduce(_ && _)

  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  stopList: Seq[String] = TextAnalysis.gopherStopwords): DataFrame = {
    val (nw, rules) = gopherRuleCols(col(textCol), minWords, maxWords, stopList)
    docs.select(col(idCol) +: nw.as("n_words") +:
        rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("pass", col("r_words") && col("r_meanlen") && col("r_symbol") &&
        col("r_bullet") && col("r_ellipsis") && col("r_alpha") && col("r_stop"))
  }

  /** Token-budget-aware mixture: take each stratum's documents in
    * deterministic-shuffle order (salted md5 rank — no RNG state, same
    * contract as [[stratifiedSample]]) until the stratum's cumulative token
    * count reaches `budget`. Because the running sum is monotone, the
    * `cum ≤ budget` filter IS the stop-at-first-overflow prefix — no
    * iteration. This is how training mixtures are actually cut: per-source
    * quotas in TOKENS (the unit models train on), not documents.
    *
    * One window pass partitioned by stratum (the per-stratum sort is the
    * only shuffle); the token column is a plain projection the caller
    * supplies, so at 100 TB the scan + window pipeline into one stage.
    * Output: (strataCol, idCol, nTokCol, cum) for the kept prefix. */
  def tokenBudgetMix(docs: DataFrame, strataCol: String, idCol: String,
                     nTokCol: String, budget: Long, salt: String): DataFrame = {
    require(budget >= 1, "budget >= 1")
    // the output running-total column would silently shadow an input column
    // of the same name (same guard class as runLength/groupPercentiles)
    require(!Seq(strataCol, idCol, nTokCol).contains("cum"),
      "tokenBudgetMix: 'cum' is reserved for the running total")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(saltedRank(idCol, salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null ids would make the sort key all-null (nondeterministic prefix) —
    // same up-front filter as deterministicShuffle, whose contract this
    // operator shares
    docs.where(col(idCol).isNotNull)
      .select(col(strataCol), col(idCol), col(nTokCol).cast("long").as(nTokCol))
      .withColumn("cum", sum(col(nTokCol)).over(w))
      .where(col("cum") <= budget)
  }

  /** Salted deterministic rank key — the 60-bit md5 prefix shared by
    * [[deterministicShuffle]], [[tokenBudgetMix]] and the DuckDB
    * `duckMd5_60` twin; ONE definition so the oracle parity of every
    * consumer moves together. */
  private def saltedRank(idCol: String, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")

  /** C4-style line-level page cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning", §2.2 — the C4 heuristics):
    *
    *  - keep only lines that end in a terminal punctuation mark
    *    (`.` `!` `?` or a closing quote);
    *  - keep only lines with at least `minLineWords` words;
    *  - drop any line containing the word "javascript";
    *  - drop the whole page if it contains "lorem ipsum" or a curly brace;
    *  - drop the whole page if fewer than `minSentences` sentences survive
    *    (sentence count = terminal `.!?` marks in the kept lines — the
    *    deterministic proxy, so the oracle replays it exactly).
    *
    * Complements [[gopherRules]] (document-level) with the line-level half
    * of a web-corpus cleaning stack. Pure map-only projection: array
    * lambdas over a split, no UDF, no shuffle — one scan at 100 TB, and the
    * `pass` predicate is sargable for downstream gates.
    *
    * Output: (idCol, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    * pass, clean_text) — report form, one row per input page; `clean_text`
    * is the surviving lines rejoined with `\n` (NULL when the page fails).
    */
  def c4Filter(pages: DataFrame, textCol: String, idCol: String,
               minSentences: Int = 3, minLineWords: Int = 5): DataFrame = {
    val (lines, kept, nSent, hasLorem, hasBrace, pass, cleanText) =
      c4Cols(col(textCol), minSentences, minLineWords)
    pages.select(col(idCol), size(lines).as("n_lines"),
        size(kept).as("n_kept"), nSent.as("n_sentences"),
        hasLorem.as("has_lorem"), hasBrace.as("has_brace"), pass.as("pass"),
        when(pass, cleanText).as("clean_text"))
  }

  /** The page-level C4 keep/kill verdict as ONE boolean Column — the exact
    * `pass` predicate [[c4Filter]] reports (one definition, shared), exposed
    * so multi-gate pipelines can fuse the C4 gate with their other map-only
    * gates into a single scan projection/filter instead of joining a
    * reported frame back by id (r16, guide §2.4 — and conjuncts
    * short-circuit, so a page killed by a cheap gate never pays the rest). */
  def c4Pass(pageCol: Column, minSentences: Int = 3, minLineWords: Int = 5): Column =
    c4Cols(pageCol, minSentences, minLineWords)._6

  private def c4Cols(pageCol: Column, minSentences: Int, minLineWords: Int) = {
    val page = coalesce(pageCol, lit(""))
    val lines = transform(split(page, "\n"), l => trim(l))
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => length(w) > lit(0))) >= minLineWords &&
        instr(lower(l), "javascript") === 0)
    val cleanText = array_join(kept, "\n")
    val nSent = length(cleanText) -
      length(regexp_replace(cleanText, "[.!?]", ""))
    val hasLorem = instr(lower(page), "lorem ipsum") > 0
    val hasBrace = instr(page, "{") > 0
    val pass = !hasLorem && !hasBrace && nSent >= minSentences
    (lines, kept, nSent, hasLorem, hasBrace, pass, cleanText)
  }

  /**
   * URL canonicalization for crawl dedup — the pre-step that makes
   * `http://Example.com:80/a/?b=2&utm_source=x&a=1#frag` and
   * `http://example.com/a?a=1&b=2` collide BEFORE any content hashing.
   * Entirely built-in Column functions (codegen'd, no UDF), so it runs as a
   * map-only projection at any scale and the oracle replays every step
   * independently in SQL.
   *
   * Contract (the common crawl-dedup canon, NOT a full RFC 3986 parser):
   *  1. trim; a value without `://` is opaque — returned trimmed, unchanged;
   *  2. strip the fragment (`#...`);
   *  3. lowercase the scheme and the authority ([user@]host[:port]);
   *  4. drop the default port (`:80` for http, `:443` for https) — the port
   *     is the EXACT suffix after the host (bracket-aware for IPv6
   *     literals, userinfo-aware), so a garbage `:80:80` tail is preserved
   *     rather than half-stripped;
   *  5. empty path → `/`; otherwise drop ALL trailing `/` (root keeps its);
   *  6. query: split on `&`, drop empty params and the tracking family
   *     (`utm_*` prefixes, `fbclid=`, `gclid=` — matched case-INsensitively,
   *     so `UTM_SOURCE=x` collapses too), sort the remaining `k=v` tokens
   *     bytewise (case-preserved), rejoin; an emptied query drops its `?`.
   * Path case and percent-encoding are preserved (paths are case-sensitive;
   * decoding is not canonical without charset knowledge). Userinfo is
   * preserved (lowercased with the rest of the authority): `u@host` and
   * `host` stay DISTINCT urls — but [[urlDomain]] groups both under `host`.
   *
   * Totality and idempotence are fuzz-gated (UrlPropertySpec): for any
   * non-null string the result is non-null, throws nothing, and
   * `normalizeUrl` is a fixpoint of itself; where `java.net.URI` parses a
   * hierarchical url the scheme and host agree with it.
   *
   * Composition note: the returned Column is a LARGE expression tree whose
   * stages re-reference each other — materialize it once
   * (`.select(normalizeUrl(col("u")).as("norm"))`) and derive downstream
   * columns (e.g. [[urlDomain]]) from the projected column, NOT by nesting
   * `urlDomain(normalizeUrl(u))`: nesting re-inlines the whole tree per
   * reference and can blow whole-stage codegen into interpreted fallback
   * (measured ~5× slower). CollapseProject will not re-inline a non-cheap
   * multiply-referenced projection, so the two-step select is safe.
   */
  def normalizeUrl(u: Column): Column = {
    val t = trim(u)
    val noFrag = substring_index(t, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val query = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + lit(1), length(noFrag))).otherwise(lit(""))
    val sep = instr(base, "://")
    val scheme = lower(base.substr(lit(1), sep - lit(1)))
    val rest = base.substr(sep + lit(3), length(base))
    val hostport = lower(substring_index(rest, "/", 1))
    val path0 = rest.substr(length(hostport) + lit(1), length(rest))
    // authority split: [userinfo@] host [port-suffix]. The port rule fires
    // only on the EXACT suffix after the host (never endsWith — ":80:80"
    // must survive untouched or re-normalizing would strip again), and the
    // host is bracket-aware so `[::80]` has no port and `[::1]:80` does.
    val afterAt = substring_index(hostport, "@", -1)
    val userPfx = hostport.substr(lit(1), length(hostport) - length(afterAt))
    val hostOnly = when(afterAt.startsWith("[") && instr(afterAt, "]") > 0,
        concat(substring_index(afterAt, "]", 1), lit("]")))
      .otherwise(substring_index(afterAt, ":", 1))
    val portSuf = afterAt.substr(length(hostOnly) + lit(1), length(afterAt))
    val hp = concat(userPfx, hostOnly,
      when((scheme === "http" && portSuf === ":80") ||
           (scheme === "https" && portSuf === ":443"), lit(""))
        .otherwise(portSuf))
    val path1 = when(path0 === "", lit("/")).otherwise(path0)
    // ALL trailing slashes (one pass of strip-one is not idempotent on
    // "/a//"); an all-slash path collapses to root
    val stripped = regexp_replace(path1, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    // tracking family matched on the LOWERCASED token (UTM_SOURCE=x must
    // collapse with utm_source=x); surviving params keep their case
    val toks = filter(split(query, "&"), tok => {
      val lt = lower(tok)
      tok =!= "" && !lt.startsWith("utm_") &&
        !lt.startsWith("fbclid=") && !lt.startsWith("gclid=")
    })
    val qNorm = array_join(array_sort(toks), "&")
    when(sep === 0, t).otherwise(concat(scheme, lit("://"), hp, path,
      when(qNorm === "", lit("")).otherwise(concat(lit("?"), qNorm))))
  }

  /** The host (authority minus userinfo and port, bracket-aware for IPv6
    * literals) of a NORMALIZED url — the group-by key for per-domain corpus
    * stats/budgets: `u@host:8080` and `host` both group under `host`.
    * Opaque (no `://`) values → NULL. */
  def urlDomain(normUrl: Column): Column = {
    val sep = instr(normUrl, "://")
    val auth = substring_index(
      normUrl.substr(sep + lit(3), length(normUrl)), "/", 1)
    val afterAt = substring_index(auth, "@", -1)
    val host = when(afterAt.startsWith("[") && instr(afterAt, "]") > 0,
        concat(substring_index(afterAt, "]", 1), lit("]")))
      .otherwise(substring_index(afterAt, ":", 1))
    when(sep > 0, host)
  }
}
