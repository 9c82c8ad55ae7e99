package graft.ops

import graft.functions.Udf

/**
 * Text-analysis operators for large-scale training-data pipelines: language
 * ID, quality scoring, token counting, document fingerprinting.
 *
 * Every function here is a pure, per-row scalar — embarrassingly parallel, no
 * shuffle, stays inside one WholeStageCodegen span per partition. At 100 TB the
 * cost model is a single pass over the corpus with full predicate/column
 * pushdown: `SELECT doc_id, quality_score(text) FROM corpus WHERE ...` reads
 * only the `text` column and never exchanges data.
 *
 * All functions are deterministic and intentionally expressible in portable
 * SQL, so the DuckDB oracle can replay them bit-for-bit (correctness gate).
 */
object TextAnalysis {

  /** Tiny per-language marker-word sets (frequent function words). The lists
    * are deliberately small and fixed: language ID at corpus scale is a
    * hash-set probe per token, ~O(doc length), no model weights needed. */
  val markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr" -> Set("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"),
    "zh" -> Set("的", "是", "不", "了", "在", "有", "我", "他", "这", "中"),
  )

  /** English stopwords used by the quality score. */
  val stopwords: Set[String] = markers("en")

  /** The Gopher rule stop list (Rae et al. 2021 §A1.1): a document must
    * contain at least two of these to pass the stop-word rule. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def tokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** Language ID over pre-lowercased tokens — the single implementation
    * shared by `lang_id` and `text_stats` (bit-parity by construction). */
  private def langOf(toks: Array[String]): String = {
    val scores = markers.view.mapValues(set => toks.count(set.contains)).toMap
    val maxN = scores.values.max
    if (maxN == 0) "und" else scores.filter(_._2 == maxN).keys.min
  }

  /** Word n-grams over raw tokens (duplicates preserved) — shared by
    * `word_ngrams`, `repetition_ratio`, and `text_stats`. */
  private def shinglesOf(ws: Array[String], n: Int): Seq[String] =
    if (ws.length < n) Seq(ws.mkString(" "))
    else ws.sliding(n).map(_.mkString(" ")).toSeq

  /** Repetition ratio (1 - distinct/total n-grams) — ONE implementation so
    * `repetition_ratio` and `text_stats.rep3` stay bit-parity by construction. */
  private def repetitionOf(s: String, n: Int): Double = {
    val sh = shinglesOf(tokens(s), n)
    if (sh.isEmpty) 0.0
    else 1.0 - sh.distinct.length.toDouble / sh.length.toDouble
  }

  /** Quality score over the raw text + its pre-lowercased tokens — shared by
    * `quality_score` and `text_stats`; arithmetic order is fixed for the
    * oracle. */
  private def qualityOf(s: String, toks: Array[String]): Double = {
    val nTok = toks.length
    if (nTok == 0) 0.0
    else {
      val nStop = toks.count(stopwords.contains)
      val nPunct = s.count(c => !Character.isLetterOrDigit(c) && !Character.isWhitespace(c))
      val stopRatio = nStop.toDouble / nTok.toDouble
      val lenScore = math.min(nTok.toDouble / 100.0, 1.0)
      val punctRatio = nPunct.toDouble / s.length.toDouble
      0.4 * stopRatio + 0.3 * lenScore + 0.3 * (1.0 - punctRatio)
    }
  }

  def registerAll(): Unit = {

    // token_count: whitespace tokenization (the BPE-ish regex variant is
    // token_count_bpe below — splits on word/number/punct boundaries).
    // Native codegen tier: byte-level count, no split allocation.
    Udf.native("token_count(string) -> int") { children =>
      graft.functions.TokenCountExpr(children(0))
    }

    // blocklist_matches: Aho-Corasick multi-pattern scan — ONE pass per
    // document regardless of pattern-list size (per-pattern contains would
    // re-scan the corpus once per pattern); sorted-distinct output so the
    // oracle replays with list_sort(list_filter(...))
    Udf.scalar2[String, Seq[String], Seq[String]](
      "blocklist_matches(string, string[]) -> string[]") { (s, ps) =>
      Blocklist.matches(s, ps)
    }

    // jaro_winkler: record-linkage similarity, native codegen tier;
    // bit-compatible with DuckDB's jaro_winkler_similarity (fuzz-verified),
    // so oracle gates compare raw doubles.
    Udf.native("jaro_winkler(string, string) -> double") { children =>
      graft.functions.JaroWinklerExpr(children(0), children(1))
    }

    Udf.scalar1[String, Int]("token_count_bpe(string) -> int") { s =>
      // letters runs, digit runs, and single punctuation marks — a cheap
      // BPE-style pre-tokenizer (no merges).
      java.util.regex.Pattern.compile("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]")
        .matcher(s).results().count().toInt
    }

    // lang_id: argmax of marker-word hits; ties broken lexicographically;
    // no hits at all -> 'und'.
    Udf.scalar1[String, String]("lang_id(string) -> string") { s =>
      langOf(tokens(s.toLowerCase))
    }

    // quality_score in [0,1]:
    //   0.4 * stopword_ratio  (fluency proxy)
    // + 0.3 * min(tokens/100, 1)  (length saturation)
    // + 0.3 * (1 - punct_ratio)  (noise proxy)
    // Exact arithmetic order is fixed so the SQL oracle reproduces it.
    Udf.scalar1[String, Double]("quality_score(string) -> double") { s =>
      qualityOf(s, tokens(s.toLowerCase))
    }

    // text_stats: language ID + quality score + token count in ONE pass over
    // ONE tokenization (lang_id/quality_score/token_count each re-tokenize).
    // Registered as a one-row table function deliberately: Catalyst cannot
    // push predicates below a Generate node, so when a curation query uses
    // the stats in both WHERE and SELECT they are computed exactly once per
    // document — scalar projections would be re-substituted into pushed-down
    // filter conjuncts and re-evaluated. Arithmetic order matches
    // quality_score/lang_id exactly (oracle parity).
    Udf.table1[String, org.apache.spark.sql.Row](
      "text_stats(string) ->> struct<lang: string, score: double, n_tok: int, rep3: double>") { s =>
      val toks = tokens(s.toLowerCase)
      Iterator.single(org.apache.spark.sql.Row(
        langOf(toks), qualityOf(s, toks), toks.length, repetitionOf(s, 3)))
    }

    // doc_fingerprint: 60-bit content hash = first 15 hex digits of md5.
    // Identical in DuckDB: CAST('0x'||substr(md5(text),1,15) AS BIGINT).
    // Native codegen tier: digest over UTF8String bytes directly.
    Udf.native("doc_fingerprint(string) -> bigint") { children =>
      graft.functions.DocFingerprintExpr(children(0))
    }

    // per-document gram fingerprints: value-identical to mapping
    // doc_fingerprint over joined n-gram slices, token bytes streamed
    // through the digest instead (the dedupSpans hot path — see
    // GramFingerprintsExpr)
    Udf.native("gram_fingerprints(string[], int) -> bigint[]") { children =>
      graft.functions.GramFingerprintsExpr(children(0), children(1))
    }

    // word n-grams (shingles), joined by single space.
    Udf.scalar2[String, Int, Seq[String]]("word_ngrams(string, int) -> string[]") { (s, n) =>
      shinglesOf(tokens(s), n)
    }

    // PII / URL redaction — standard pre-training scrub. Replacement order is
    // fixed (URL, then email, then phone) and each pattern is RE2-compatible
    // so the DuckDB oracle replays it exactly.
    val urlP = java.util.regex.Pattern.compile("https?://\\S+")
    val emailP = java.util.regex.Pattern.compile(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}")
    val phoneP = java.util.regex.Pattern.compile("[+]?[0-9][0-9()\\- ]{7,}[0-9]")
    Udf.scalar1[String, String]("redact_pii(string) -> string") { s =>
      phoneP.matcher(
        emailP.matcher(
          urlP.matcher(s).replaceAll("<URL>")).replaceAll("<EMAIL>")).replaceAll("<PHONE>")
    }

    // Canonical text normalization — the standard pre-dedup/pre-fingerprint
    // scrub: lowercase, Unicode NFC composition, whitespace runs collapsed
    // to single spaces, ends trimmed. Order is fixed (lower -> NFC ->
    // collapse -> trim) and the whitespace class is EXPLICIT — Java's \s
    // includes vertical tab, RE2's excludes it, so both sides spell out
    // [ \t\n\v\f\r] and the DuckDB oracle replays exactly with
    // trim(regexp_replace(nfc_normalize(lower(s)), '[\t\n\v\f\r ]+', ' ', 'g')).
    // (space-only trim, not String.trim: DuckDB's trim strips ' ' only,
    // java's also strips other controls <= U+0020 and would break parity)
    Udf.scalar1[String, String]("normalize_text(string) -> string") { s =>
      java.text.Normalizer
        .normalize(s.toLowerCase(java.util.Locale.ROOT), java.text.Normalizer.Form.NFC)
        .replaceAll("[ \\t\\n\\u000B\\f\\r]+", " ")
        .replaceAll("^ +| +$", "")
    }

    // Sentence segmentation as a set-returning function: split on terminal
    // punctuation runs, trim, drop empties. Trim char set is EXACTLY the
    // oracle's (space/tab/LF/CR/VT/FF) — String.trim would also strip other
    // control chars and break bit-parity.
    val trimChars = " \t\n\u000B\f\r"
    def trimWs(s: String): String = {
      var a = 0; var b = s.length
      while (a < b && trimChars.indexOf(s.charAt(a)) >= 0) a += 1
      while (b > a && trimChars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
      s.substring(a, b)
    }
    Udf.table1[String, String]("split_sentences(string) ->> string") { s =>
      s.split("[.!?]+").iterator.map(trimWs).filter(_.nonEmpty)
    }

    // Array form of the same segmentation — posexplode-able, for operators
    // that need sentence POSITIONS (global sentence-level dedup reassembles
    // documents in original order). Shares trimWs so the two splits can
    // never drift apart.
    Udf.scalar1[String, Seq[String]]("sentence_array(string) -> string[]") { s =>
      s.split("[.!?]+").iterator.map(trimWs).filter(_.nonEmpty).toSeq
    }

    // Document chunking: fixed-size character windows advancing by `stride`
    // (overlap = size - stride) — the context-window splitter every training
    // pipeline runs before tokenization. Emits (pos, chunk) so downstream
    // joins can reassemble order; the final window may be shorter. Char
    // windows (not token windows) keep the semantics engine-exact:
    // substr(text, pos, size) means the same thing in every SQL dialect.
    // size/stride are clamped to ≥ 1 (a stride of 0 would loop forever).
    Udf.table3[String, Int, Int, org.apache.spark.sql.Row](
      "chunk_text(string, int, int) ->> struct<pos: int, chunk: string>") { (s, size0, stride0) =>
      val size = math.max(1, size0)
      val stride = math.max(1, stride0)
      Iterator.range(0, s.length, stride).map { p =>
        org.apache.spark.sql.Row(p + 1, s.substring(p, math.min(s.length, p + size)))
      }
    }

    // Deterministic split assignment: hash-bucket a key into [0, buckets) —
    // the standard reproducible train/val/test partitioner (no RNG state,
    // stable across runs/engines, md5-based for oracle parity).
    Udf.scalar3[Long, String, Int, Int]("split_bucket(bigint, string, int) -> int") {
      (key, salt, buckets) => (Hashing.md5_60(salt + ":" + key) % buckets).toInt
    }

    // Repetition ratio: 1 - distinct/total word n-grams — high values flag
    // boilerplate/spam (a standard corpus-quality gate).
    Udf.scalar2[String, Int, Double]("repetition_ratio(string, int) -> double") {
      (s, n) => repetitionOf(s, n)
    }

    // Compression ratio: deflated bytes / raw UTF-8 bytes (level 6 zlib) —
    // the Gopher/MassiveText-style "compressibility" junk signal: highly
    // repetitive or templated text compresses far below natural prose.
    // Empty input -> 1.0 by convention. DEFLATE has no SQL-dialect replica,
    // so this is spec-gated + rows-only in the oracle (the one such scalar).
    Udf.scalar1[String, Double]("compress_ratio(string) -> double")(Zlib.ratio)

    // The oracle-facing self-check for the compression path: DEFLATE has no
    // SQL replica, but inflate(deflate(s)) == s is checkable ENGINE-side and
    // emitted as a value the oracle pins to 1 — if compression ever corrupts
    // a byte, the gate hash-fails instead of the row being oracle-blind.
    Udf.scalar1[String, Boolean]("compress_roundtrip_ok(string) -> boolean")(
      Zlib.roundtripOk)
  }

  /** Boilerplate HTML → text, as a chain of BUILTIN expressions (codegen'd,
    * no UDF — the whole strip stays inside WholeStageCodegen):
    *   1. drop `<script>` then `<style>` blocks WITH their content — TWO
    *      self-matched passes (case-insensitive dotall, non-greedy,
    *      backref-free so the same patterns run on Java regex and the
    *      oracle's RE2). A single alternation pass let `</style>` close a
    *      `<script>` block, leaking trailing script source into the text
    *      (found by HtmlPropertySpec's differential fuzz); self-matched
    *      passes agree with browser tokenization on the cross-nesting
    *      cases — a raw `<style>` inside script is data, not a closer;
    *   2. strip remaining tags (an unterminated trailing `<...` has no `>`
    *      to anchor on and survives as text — cross-engine identical);
    *   3. decode the six common entities (`&amp;` LAST, so `&amp;lt;`
    *      correctly yields the text `&lt;`, not `<`). Entity decode AFTER
    *      tag-strip means decoded `<`/`>` are literal text — a SECOND
    *      stripHtml application would eat them, so the operator is a
    *      fixpoint only on outputs free of `<` and `&`;
    *   4. collapse whitespace (explicit class — Java and RE2 disagree on
    *      `\v`/`\s`) and trim.
    * The DuckDB twin is the same chain with 'g' flags; order is part of the
    * contract. */
  def stripHtml(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noBlocks = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (from, to)) => replace(e, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "[\\t\\n\\x0B\\f\\r ]+", " "))
  }
}

/** Per-executor Deflater pool for `compress_ratio`: a per-row native stream
  * alloc/free would dominate the deflate cost of short documents at corpus
  * scale. A top-level object so UDF closures reference it statically —
  * a ThreadLocal captured in the closure is not serializable. */
private[graft] object Zlib {
  private val tl = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
  }

  def ratio(s: String): Double = {
    val raw = s.getBytes("UTF-8")
    if (raw.isEmpty) 1.0
    else {
      val d = tl.get()
      d.reset()
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / raw.length.toDouble
    }
  }

  /** Decompress∘compress identity: deflate then inflate and compare bytes.
    * The correctness gate for the whole zlib path (ratios themselves have no
    * cross-engine replica; this property does — it must ALWAYS hold). */
  def roundtripOk(s: String): Boolean = {
    val raw = s.getBytes("UTF-8")
    val d = tl.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val outBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); outBuf.write(buf, 0, n) }
    // same per-thread reuse as the Deflater above: a fresh native Inflater
    // per row would dominate the cost of short documents at corpus scale
    val inf = tlInf.get()
    inf.reset()
    inf.setInput(outBuf.toByteArray)
    val back = new java.io.ByteArrayOutputStream(raw.length + 16)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      // truncated stream: no output, input exhausted, and NOT at the
      // stream end (the final call legitimately hits n==0 + needsInput)
      if (n == 0 && inf.needsInput() && !inf.finished()) return false
      back.write(buf, 0, n)
    }
    java.util.Arrays.equals(back.toByteArray, raw)
  }

  private val tlInf = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater()
  }
}

/** md5-based hashing shared by text analysis, dedup, and similarity ops —
  * chosen over murmur/xxhash because both Spark and DuckDB expose md5, giving
  * the oracle a bit-exact replica (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`). */
object Hashing {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = tl.get()
    d.reset()
    val out = d.digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    out.foreach { b =>
      sb.append(hexChars((b >> 4) & 0xf)); sb.append(hexChars(b & 0xf))
    }
    sb.toString
  }

  /** First 60 bits of the digest, straight from the bytes — bit-identical to
    * `parseLong(md5Hex.substring(0, 15), 16)` (the first 15 hex chars are
    * bytes 0..6 plus the high nibble of byte 7) without the hex-string
    * round-trip; this is the hot path of every signature operator. */
  private def md5_60FromDigest(out: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (out(i) & 0xffL); i += 1 }
    (h << 4) | ((out(7) & 0xffL) >>> 4)
  }

  /** First 60 bits (15 hex chars) of md5 as a non-negative Long. */
  def md5_60(s: String): Long = {
    val d = tl.get()
    d.reset()
    md5_60FromDigest(d.digest(s.getBytes("UTF-8")))
  }

  private val cacheCap = 200000
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memoized md5_60 for bounded-vocabulary inputs (tokens): corpora repeat
    * words heavily, so per-executor caching removes most digest work. */
  def md5_60Cached(s: String): Long = {
    val hit = memo.get(s)
    if (hit != null) hit.longValue()
    else {
      val h = md5_60(s)
      if (memo.size < cacheCap) memo.put(s, h)
      h
    }
  }

  /** Same, over raw bytes (binary payloads; equals md5 of the equivalent
    * UTF-8 string when the bytes came from text). */
  def md5_60b(bytes: Array[Byte]): Long = {
    val d = tl.get()
    d.reset()
    md5_60FromDigest(d.digest(bytes))
  }

  /** Slice variant for hot loops that pack shingles into a reusable buffer —
    * equals [[md5_60b]] of the copied slice without materializing it. */
  def md5_60b(buf: Array[Byte], off: Int, len: Int): Long = {
    val d = tl.get()
    d.reset()
    d.update(buf, off, len)
    md5_60FromDigest(d.digest())
  }

  /** md5_60 of `parts[from ..< from+n]` joined by single spaces, streamed
    * through the digest — equals md5_60 of the joined string without ever
    * materializing it (the gram-fingerprint hot path). */
  def md5_60Joined(parts: Array[Array[Byte]], from: Int, n: Int): Long = {
    val d = tl.get()
    d.reset()
    var i = from
    while (i < from + n) {
      if (i > from) d.update(' '.toByte)
      d.update(parts(i))
      i += 1
    }
    md5_60FromDigest(d.digest())
  }

  /** Seeded variant: hash of (seed || s) — the minhash family h_i. */
  def md5_60(seed: Int, s: String): Long = md5_60(seed.toString + s)
}
