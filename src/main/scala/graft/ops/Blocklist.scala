package graft.ops

/**
 * Aho–Corasick multi-pattern substring matcher — the scalable form of the
 * curation blocklist scan (bad-word / boilerplate-phrase / contaminated-URL
 * lists routinely run to tens of thousands of patterns; per-pattern
 * `contains` would re-scan the corpus once PER PATTERN, the automaton does
 * ONE pass per document regardless of list size).
 *
 * Reference analogue: the per-row scalar tier (a pure function of the text
 * column, `arrow-udf/src/lib.rs` scalar contract) — registered as
 * `blocklist_matches(string, string[]) -> string[]` and exposed column-wise,
 * so the scan stays map-only with full pushdown at 100 TB.
 *
 * The automaton is built ONCE PER EXECUTOR per distinct pattern list
 * (content-keyed memo, same per-executor-compile pattern as the BPE encoder
 * memo in [[Bpe]]); rows pay only the linear traversal. Matching is
 * case-sensitive raw-substring semantics — callers lowercase both sides for
 * case-insensitive lists — and returns the SORTED DISTINCT matched patterns,
 * so output order is deterministic and oracle-replayable with
 * `list_sort(list_filter(ps, p -> contains(text, p)))`.
 */
object Blocklist {

  final class Automaton(patterns: IndexedSeq[String]) extends Serializable {
    // goto tree
    private val next = scala.collection.mutable.ArrayBuffer(
      new scala.collection.mutable.HashMap[Char, Int]())
    private val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    private val fail = scala.collection.mutable.ArrayBuffer[Int](0)

    patterns.zipWithIndex.foreach { case (p, idx) =>
      // '' would "match every text" under the documented contains-replay
      // semantics but can never reach an automaton output — fail loudly
      // rather than silently diverge from the oracle (blocklist files with
      // trailing newlines produce exactly this)
      require(p.nonEmpty, "blocklist: empty pattern (strip blank list entries)")
      var s = 0
      p.foreach { ch =>
        s = next(s).getOrElseUpdate(ch, {
          next += new scala.collection.mutable.HashMap[Char, Int]()
          out += Nil
          fail += 0
          next.size - 1
        })
      }
      out(s) = idx :: out(s)
    }
    // BFS failure links; output sets merge along them
    locally {
      val q = scala.collection.mutable.Queue[Int]()
      next(0).values.foreach { s => fail(s) = 0; q.enqueue(s) }
      while (q.nonEmpty) {
        val r = q.dequeue()
        next(r).foreach { case (ch, s) =>
          q.enqueue(s)
          // deepest proper suffix of s present in the trie: walk r's fail
          // chain until a node with a ch-edge (s is at depth ≥ 2 here, so
          // the target can never be s itself)
          var f = fail(r)
          while (f != 0 && !next(f).contains(ch)) f = fail(f)
          fail(s) = next(f).getOrElse(ch, 0)
          out(s) = out(s) ++ out(fail(s))
        }
      }
    }

    /** Sorted distinct matched patterns in one pass over `text`. */
    def run(text: String): Seq[String] = {
      val hits = new java.util.BitSet(patterns.size)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !next(s).contains(ch)) s = fail(s)
        s = next(s).getOrElse(ch, 0)
        out(s).foreach(hits.set)
        i += 1
      }
      val b = Seq.newBuilder[String]
      var idx = hits.nextSetBit(0)
      while (idx >= 0) { b += patterns(idx); idx = hits.nextSetBit(idx + 1) }
      b.result().distinct.sorted
    }
  }

  /** Per-executor automaton memo, content-keyed; bounded so a pathological
    * stream of distinct lists cannot leak (lists are broadcast literals in
    * practice — one entry per query shape). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Automaton]()

  def matches(text: String, patterns: Seq[String]): Seq[String] = {
    // Bounded eviction: drop ONE arbitrary non-hot entry when over budget
    // (a whole-cache clear would evict the hot entry too, rebuilding the
    // automaton per batch for workloads cycling through >64 pattern lists;
    // remove() on a concurrently-absent key is a benign no-op).
    if (cache.size > 64) {
      val it = cache.keySet.iterator
      var evicted = false
      while (!evicted && it.hasNext) {
        val k = it.next()
        if (k != patterns) { cache.remove(k); evicted = true }
      }
    }
    cache.computeIfAbsent(patterns,
      p => new Automaton(p.toIndexedSeq)).run(text)
  }
}
