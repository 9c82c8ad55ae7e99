package graft.functions

/**
 * Static, primitive-typed kernels referenced from generated code
 * (`Expression.doGenCode`). Keeping these as static JVM methods lets
 * WholeStageCodegen inline the call — our analogue of the reference's SIMD
 * fast path (`codegen_utils.rs:517-540`): the JIT vectorizes the tight loop
 * the same way `arrow_arith::arity::binary` does.
 */
object Kernels {

  def gcd(a: Int, b: Int): Int = {
    var x = if (a < 0) -a else a
    var y = if (b < 0) -b else b
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def gcd(a: Long, b: Long): Long = {
    var x = if (a < 0) -a else a
    var y = if (b < 0) -b else b
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  /** 64-bit FNV-1a over a string's UTF-8 bytes — stable across JVMs, used by
    * dedup/fingerprint operators (cheap, deterministic, SQL-reproducible). */
  def fnv1a64(s: org.apache.spark.unsafe.types.UTF8String): Long = fnv1a64(s.getBytes)

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Double-precision cosine over two float arrays (Catalyst `ArrayData`),
    * fixed left-to-right order — primitive access, no per-element boxing.
    * Referenced from [[graft.functions.CosineSimExpr]] generated code. */
  def cosineSim(a: org.apache.spark.sql.catalyst.util.ArrayData,
                b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine with an int32 left side — the quantized-ANN hot path: int8
    * codes score directly against float queries (the per-vector scale
    * cancels in cosine), no dequantized array ever materializes. */
  def cosineSimIF(a: org.apache.spark.sql.catalyst.util.ArrayData,
                  b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getInt(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Whitespace token count straight off the UTF-8 bytes — exact match for
    * `split("\\s+").filter(_.nonEmpty).length` semantics (Java regex `\s` is
    * ASCII-only, and ASCII bytes never collide with UTF-8 continuation
    * bytes), with no split allocation. Referenced from
    * [[TokenCountExpr]] generated code. */
  def tokenCount(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  /** 60-bit md5 content fingerprint over the string's UTF-8 bytes — same
    * value as `Hashing.md5_60(s.toString)` without the String round-trip.
    * Referenced from [[DocFingerprintExpr]] generated code. */
  def md5_60(s: org.apache.spark.unsafe.types.UTF8String): Long =
    graft.ops.Hashing.md5_60b(s.getBytes)

  /** Per-document word-n-gram fingerprints (see GramFingerprintsExpr):
    * element i = md5_60 of tokens [i, i+n) space-joined. Token bytes are
    * extracted once; each gram streams them through the shared digest —
    * no sliced array, no joined gram string, no per-gram UTF8String. */
  def gramFingerprints(ws: org.apache.spark.sql.catalyst.util.ArrayData,
                       n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cnt = ws.numElements()
    if (n < 1 || cnt < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.emptyLongArray)
    val tok = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) { tok(i) = ws.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Long](cnt - n + 1)
    i = 0
    while (i < out.length) {
      out(i) = graft.ops.Hashing.md5_60Joined(tok, i, n)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Jaro-Winkler similarity in [0,1] — the record-linkage classic
    * (Winkler 1990): Jaro = (m/|a| + m/|b| + (m−t)/m)/3 with the match
    * window ⌊max/2⌋−1 and t = half the out-of-order matches, then the
    * prefix boost `J + ℓ·0.1·(1−J)` (ℓ = common prefix ≤ 4) applied only
    * when J > 0.7. This exact variant (boost threshold, floor'd
    * transpositions) was fuzz-verified bit-identical to DuckDB's
    * `jaro_winkler_similarity` over random pairs, so the oracle gate can
    * compare raw doubles. BYTE-level over UTF-8 (exactly DuckDB's unit —
    * a char-level variant diverges on any non-ASCII input, e.g.
    * 'héllo'/'hèllo' is 0.911… in bytes but 0.88 in UTF-16 chars), which
    * also skips the String round-trip entirely. */
  def jaroWinkler(a: org.apache.spark.unsafe.types.UTF8String,
                  b: org.apache.spark.unsafe.types.UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val w = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - w); val hi = math.min(l2 - 1, i + w)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      var p = 0
      while (p < 4 && p < l1 && p < l2 && s1(p) == s2(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    }
  }

  /** Polynomial rolling hash mod a prime — chosen because it is exactly
    * reproducible in the DuckDB oracle with `list_reduce` over `ascii()`
    * codes, giving the correctness gate a bit-exact target. */
  def polyHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31 + str.charAt(i)) % 1000000007L
      i += 1
    }
    h
  }
}
