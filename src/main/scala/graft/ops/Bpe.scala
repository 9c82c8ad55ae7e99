package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * Byte-pair-encoding tokenizer trained BY the engine — the real-merges
 * counterpart of [[TextAnalysis]]'s `token_count_bpe` pre-tokenizer and the
 * missing piece between curation and sequence packing: a training-data
 * pipeline that packs sequences by token budget needs an actual subword
 * tokenization, not a whitespace proxy.
 *
 * == Algorithm (classic Sennrich BPE, word-internal merges) ==
 * Words are lowercased whitespace tokens (the tokenization shared with
 * [[LangModel]]); each word starts as its code-point symbols (no end-of-word
 * marker — a documented simplification). Training repeatedly merges the most
 * frequent adjacent symbol pair, count-weighted over the word-count table;
 * ties break to the lexicographically smallest `(left, right)` pair, so the
 * merge list is a pure function of the corpus. Encoding applies the learned
 * merges IN RANK ORDER, each as one left-to-right non-overlapping pass.
 * Because training only ever learns a compound after its components exist,
 * sequential rank-order application is equivalent to the min-rank-rescan
 * formulation for any model this trainer produces (spec-checked against an
 * independent rescan encoder).
 *
 * == Determinism / oracle parity ==
 * The encoder's inner loop IS the SQL oracle's algorithm: each word is
 * rendered as `\u0001 sym \u0002` brackets and each merge is one plain
 * `String.replace` of `\u0001a\u0002\u0001b\u0002` with `\u0001ab\u0002` — left-to-right, non-overlapping,
 * exactly DuckDB's `replace`. The brackets make matches possible only at
 * whole-symbol boundaries (symbols never contain `\u0001`/`\u0002`; those
 * code points are stripped from input words), so flat string replacement is
 * bit-for-bit the pair-merge semantics, and a DuckDB oracle of nested
 * `replace(...)` calls reproduces the engine's tokens exactly.
 *
 * == Scale design (100 TB) ==
 *  - '''Training''' is one `groupBy(word)` counted shuffle (map-side partial
 *    aggregation: the exchange carries distinct words per map partition, not
 *    occurrences) + a driver-side bounded top-`maxWords` (`TakeOrdered`).
 *    The iterative merge loop runs on that ≤`maxWords` table on the driver —
 *    `O(numMerges · Σ|word|)` on at most a few MB — which is how production
 *    BPE trainers work: corpus-scale is absorbed by the word-count
 *    aggregation, never by the merge loop.
 *  - '''Encoding''' is map-only: the merge list (≤ numMerges pairs)
 *    broadcasts once and every document encodes in place — no join, no
 *    shuffle, full column pruning. A bounded per-executor memo cache
 *    short-circuits repeated words (Zipf makes the hit rate ~1), so the
 *    per-row cost approaches one hash probe per word.
 */
object Bpe {

  /** A trained merge list, highest-priority first. */
  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable

  /** Lowercased whitespace words, empties dropped; NULL text = no words —
    * the one tokenization shared with [[LangModel]] (single definition, so
    * BPE and LM tokenization can never drift apart). */
  private def wordsCol(textCol: String): Column = LangModel.sharedTokensCol(textCol)

  /** Train a BPE merge list on `corpus`: one counted shuffle, a bounded
    * top-`maxWords` collect, then the classic driver-side merge loop.
    * Stops early when no adjacent pair reaches `minCount` occurrences. */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000, minCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxWords > 0, "maxWords must be > 0")
    val top = corpus.select(explode(wordsCol(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var words: Array[(Array[String], Long)] =
      top.map { case (w, c) => (toSymbols(w), c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((a, b), best) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
        if (best < minCount) exhausted = true
        else {
          merges += ((a, b))
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c) else (mergePass(syms, a, b), c)
          }
          rank += 1
        }
      }
    }
    BpeModel(merges.toSeq)
  }

  /** One left-to-right non-overlapping merge pass over a symbol sequence. */
  private def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Code-point symbols of a word; the bracket code points `\u0001`/`\u0002`
    * are reserved by the encoder and stripped from input. */
  private def toSymbols(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      if (cp != 0x01 && cp != 0x02) out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Encode one word under a merge list — the oracle's exact algorithm:
    * bracket every symbol, then one flat left-to-right `String.replace` per
    * merge in rank order. */
  private[ops] def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    val sb = new java.lang.StringBuilder(word.length * 3)
    toSymbols(word).foreach { sym =>
      sb.append('\u0001'); sb.append(sym); sb.append('\u0002')
    }
    var s = sb.toString
    if (s.isEmpty) return Array.empty
    var j = 0
    while (j < merges.length) {
      val (a, b) = merges(j)
      val pat = "\u0001" + a + "\u0002\u0001" + b + "\u0002"
      if (s.contains(pat)) s = s.replace(pat, "\u0001" + a + b + "\u0002")
      j += 1
    }
    s.substring(1, s.length - 1).split("\u0002\u0001", -1)
  }

  /** Bounded per-executor word→tokens memo. Cleared wholesale past the cap:
    * crude, but correctness never depends on it and Zipfian corpora refill
    * the hot head immediately. Keyed by a content digest of the merge list,
    * so repeated queries over the SAME model share hot entries across
    * broadcasts while distinct models can never collide. */
  private object EncodeCache {
    private val MaxEntries = 1 << 17
    private val map =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Array[String]]()
    def getOrCompute(modelKey: String, w: String,
        f: String => Array[String]): Array[String] = {
      if (map.size > MaxEntries) map.clear()
      var v = map.get((modelKey, w))
      if (v == null) { v = f(w); map.put((modelKey, w), v) }
      v
    }
  }

  /** SHA-1 of the merge list — the cross-broadcast memo key. */
  private def modelKeyOf(merges: Array[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    merges.foreach { case (a, b) =>
      md.update(a.getBytes("UTF-8")); md.update(0.toByte)
      md.update(b.getBytes("UTF-8")); md.update(1.toByte)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest)
  }

  /** Broadcast-model tokens UDF shared by [[encode]] and [[nTokCol]]. */
  private def tokensUdf(docs: DataFrame, model: BpeModel) = {
    val merges0 = model.merges.toArray
    val bc = docs.sparkSession.sparkContext.broadcast((modelKeyOf(merges0), merges0))
    udf { (ws: Seq[String]) =>
      val (key, merges) = bc.value
      val out = mutable.ArrayBuffer.empty[String]
      ws.foreach { w =>
        out ++= EncodeCache.getOrCompute(key, w, encodeWord(_, merges))
      }
      out.toSeq
    }
  }

  /** Tokenize `docs` under a trained model: emits `(idCol, tokens, n_tok)`
    * where `tokens` is the concatenation of every word's subword tokens in
    * document order. Map-only (broadcast merges), memoized per executor. */
  def encode(docs: DataFrame, model: BpeModel, textCol: String,
      idCol: String): DataFrame =
    docs
      .withColumn("tokens", tokensUdf(docs, model)(wordsCol(textCol)))
      .withColumn("n_tok", size(col("tokens")))
      .select(col(idCol), col("tokens"), col("n_tok"))

  /** BPE token count of `textCol` as a bare Column, for composing with other
    * operators (e.g. token-budget sequence packing) without a join — the
    * count stays a map-only projection on the caller's plan. */
  def nTokCol(docs: DataFrame, model: BpeModel, textCol: String): Column =
    size(tokensUdf(docs, model)(wordsCol(textCol)))

  /** One-call train + encode on the same corpus. */
  def tokenize(docs: DataFrame, textCol: String, idCol: String,
      numMerges: Int, maxWords: Int = 50000): DataFrame =
    encode(docs, train(docs, textCol, numMerges, maxWords), textCol, idCol)
}
