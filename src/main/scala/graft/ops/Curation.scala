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
}
