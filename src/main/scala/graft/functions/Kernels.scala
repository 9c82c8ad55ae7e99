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
