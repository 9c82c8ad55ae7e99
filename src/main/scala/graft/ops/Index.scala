package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Inverted-index construction and postings search — the retrieval-side
 * companion to the corpus-curation operators: build a term → postings map
 * over the corpus once, then answer conjunctive (AND) keyword queries from
 * the index without re-reading any document text.
 */
object Index {

  /** One row per DISTINCT (doc, term) — the document-frequency basis
    * (duplicates within a doc collapse). Tokenization is
    * [[LangModel.sharedTokensCol]], the engine-wide canonical split, so the
    * index can never drift from the LM/BPE/curation operators. */
  private def docTerms(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(LangModel.sharedTokensCol(textCol))).as("term"))

  /** Build an inverted index: one row per term with its document frequency
    * and sorted postings list, keeping only terms with df in [minDf, maxDf].
    *
    * Scale design — TWO passes over the term stream, on purpose:
    * pass 1 aggregates df counts only (a counted shuffle, ~bytes per
    * distinct term); the df filter then runs BEFORE any postings list is
    * materialized, so stopword-scale terms ("the" at 100 TB → billions of
    * doc ids) never build a giant array in an executor. Pass 2 collects
    * postings only for surviving terms. maxDf is the memory contract: a
    * term's postings array is ≤ maxDf ids. For web-scale retrieval shard
    * further by (term, hash(doc_id) % nSegments). */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
                    minDf: Long = 1L, maxDf: Long = 1000000L): DataFrame = {
    val toks = docTerms(docs, textCol, idCol)
    val kept = toks.groupBy("term").agg(count("*").as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    toks.join(kept, "term")
      .groupBy("term", "df")
      .agg(sort_array(collect_list("doc_id")).as("postings"))
      .select("term", "df", "postings")
  }

  /** Merge two inverted indexes (e.g. yesterday's persisted index and a new
    * increment's): full-outer join on term, postings unioned/deduped/sorted,
    * df recomputed from the merged postings. Because union-dedup-sort is
    * commutative, associative, and idempotent, merging per-increment indexes
    * in ANY order — including replaying an increment — yields exactly the
    * whole-corpus index (gated as such by q_index_increment). Build both
    * inputs WITHOUT a maxDf cap when merging incrementally: a df filter
    * applied per-increment would not commute with the merge (apply the cap
    * when querying instead). */
  def mergeIndex(a: DataFrame, b: DataFrame): DataFrame = {
    val empty = array().cast("array<bigint>")
    a.select(col("term"), col("postings").as("pa"))
      .join(b.select(col("term"), col("postings").as("pb")), Seq("term"), "full_outer")
      .select(col("term"),
        sort_array(array_union(coalesce(col("pa"), empty),
          coalesce(col("pb"), empty))).as("postings"))
      .select(col("term"), size(col("postings")).cast("long").as("df"), col("postings"))
  }

  /** Conjunctive (AND) search over an inverted index: documents containing
    * EVERY query term. Fully distributed — the index scan prunes to the
    * query terms (predicate pushdown on `term`), postings explode, and a
    * doc qualifies iff it appears under all of them. No document text is
    * read. */
  /** Frequent term-pair co-occurrence mining (the 2-itemset Apriori pass):
    * the `topK` most frequent unordered pairs of terms appearing in the
    * same document, among pairs whose count ≥ `minSup`.
    *
    * Scale design: the Apriori prune runs FIRST — a term can only be in a
    * frequent pair if the term itself is frequent (downward closure), so
    * term df counts (one counted shuffle) filter the stream before any
    * pairing, and the doc-keyed self-join pairs only frequent terms. Pair
    * cost is Σ_d f_d² with f_d = frequent-distinct terms in doc d — at web
    * scale raise `minSup` (which shrinks f_d) rather than capping docs.
    * The pair aggregation is map-side combined (≤ |frequent|² keys), and
    * top-k is a TakeOrdered, never a full sort. */
  /** The shared Apriori core: frequent single terms (`(term, sup)`, pruned
    * at `minSup`) and frequent unordered pairs (`(a, b, sup_pair)`, a < b,
    * pruned at `minSup`). Both relations are localCheckpointed — every
    * consumer reads them more than once, and an unmaterialized subtree
    * would re-execute the corpus scan per consumer. */
  private def frequentPairs(docs: DataFrame, textCol: String, idCol: String,
                            minSup: Long): (DataFrame, DataFrame) = {
    val toks = docTerms(docs, textCol, idCol)
    val items = toks.groupBy("term").agg(count(lit(1)).as("sup"))
      .where(col("sup") >= minSup).localCheckpoint()
    val ft = toks.join(items.select("term"), "term").localCheckpoint()
    val x = ft.select(col("doc_id"), col("term").as("a"))
    val y = ft.select(col("doc_id").as("doc_id2"), col("term").as("b"))
    val pairs = x.join(y, col("doc_id") === col("doc_id2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("sup_pair"))
      .where(col("sup_pair") >= minSup).localCheckpoint()
    (items, pairs)
  }

  def coOccurrence(docs: DataFrame, textCol: String, idCol: String,
                   minSup: Long, topK: Int): DataFrame = {
    require(minSup >= 1 && topK >= 1, "minSup and topK must be positive")
    val (_, pairs) = frequentPairs(docs, textCol, idCol, minSup)
    pairs.select(col("a"), col("b"), col("sup_pair").as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Association rules a → b over document co-occurrence: both directions
    * of every frequent pair, kept when support ≥ `minSup` and confidence
    * `sup(a,b)/sup(a)` ≥ `minConfPct`% — tested as the cross-multiplied
    * integer `100·sup_pair ≥ minConfPct·sup_ante`, never a float. Emits
    * `(ante, cons, sup_pair, sup_ante, sup_cons)`; lift/conviction are one
    * exact division away for the caller. Same Apriori prune and shuffle
    * shape as [[coOccurrence]]. */
  def assocRules(docs: DataFrame, textCol: String, idCol: String,
                 minSup: Long, minConfPct: Int): DataFrame = {
    require(minSup >= 1 && minConfPct >= 1 && minConfPct <= 100,
      "minSup >= 1, minConfPct in 1..100")
    val (items, pairs) = frequentPairs(docs, textCol, idCol, minSup)
    val rules = pairs.select(col("a").as("ante"), col("b").as("cons"), col("sup_pair"))
      .union(pairs.select(col("b").as("ante"), col("a").as("cons"), col("sup_pair")))
    rules
      .join(items.select(col("term").as("ante"), col("sup").as("sup_ante")), "ante")
      .join(items.select(col("term").as("cons"), col("sup").as("sup_cons")), "cons")
      .where(lit(100L) * col("sup_pair") >= lit(minConfPct.toLong) * col("sup_ante"))
      .select("ante", "cons", "sup_pair", "sup_ante", "sup_cons")
  }

  def searchAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    val qs = terms.map(_.toLowerCase).distinct
    require(qs.nonEmpty, "searchAll: empty term list")
    index.where(col("term").isin(qs: _*))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy("doc_id").agg(count("*").as("nt"))
      .where(col("nt") === qs.length)
      .select("doc_id")
  }
}
