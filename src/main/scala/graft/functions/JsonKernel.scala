package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.UTF8StringBuilder
import org.apache.spark.unsafe.types.UTF8String

/**
 * Writer-style JSON render over CATALYST values — the analogue of the
 * reference's string-writer technique (SURVEY §2.1 #4: build the output text
 * directly into the column buffer instead of materializing intermediate
 * objects). The boxed `Json.render` path converts MapData → external scala
 * Map (allocating keys, values, tuples, a Map and a String per row);
 * this kernel walks the internal representation and appends UTF-8 bytes into
 * one [[UTF8StringBuilder]], with a no-escape fast path that block-copies
 * string payloads. Semantics are byte-identical to `Builtins.Json.render`
 * (the DuckDB-matched rendering the oracle compares).
 */
object JsonKernel {

  def render(v: Any, dt: DataType): UTF8String = {
    val sb = new UTF8StringBuilder(64)
    renderInto(sb, v, dt)
    sb.build()
  }

  private def renderInto(sb: UTF8StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => quote(sb, v.asInstanceOf[UTF8String])
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case IntegerType | LongType | ShortType | ByteType => sb.append(v.toString)
      case DoubleType => renderDouble(sb, v.asInstanceOf[Double])
      case FloatType => renderDouble(sb, v.asInstanceOf[Float].toDouble)
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        sb.append("[")
        val n = a.numElements()
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(",")
          renderInto(sb, if (a.isNullAt(i)) null else a.get(i, et), et)
          i += 1
        }
        sb.append("]")
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        sb.append("{")
        val n = m.numElements()
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(",")
          kt match {
            case StringType => quote(sb, ks.getUTF8String(i))
            case _ => quote(sb, UTF8String.fromString(String.valueOf(ks.get(i, kt))))
          }
          sb.append(":")
          renderInto(sb, if (vs.isNullAt(i)) null else vs.get(i, vt), vt)
          i += 1
        }
        sb.append("}")
      case st: StructType =>
        val r = v.asInstanceOf[InternalRow]
        sb.append("{")
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(",")
          quote(sb, UTF8String.fromString(st(i).name))
          sb.append(":")
          renderInto(sb, if (r.isNullAt(i)) null else r.get(i, st(i).dataType), st(i).dataType)
          i += 1
        }
        sb.append("}")
      case other =>
        // semantics-preserving fallback for exotic scalars (date, timestamp,
        // decimal, ...): external convert + the boxed renderer
        sb.append(Builtins.Json.render(
          org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToScalaConverter(other)(v)))
    }
  }

  /** Matches `Json.render`'s double formatting: integral doubles under 1e15
    * print as integers (DuckDB-style), everything else as Double.toString. */
  private def renderDouble(sb: UTF8StringBuilder, d: Double): Unit =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) sb.append(d.toLong.toString)
    else sb.append(d.toString)

  /** Quoted string with JSON escapes. Fast path: a byte scan finds no
    * escapable byte → the whole payload block-copies; otherwise clean runs
    * between escapes block-copy via appendBytes. Escapes are all ASCII, so
    * byte-level processing is exactly the char-level semantics (multi-byte
    * UTF-8 sequences have no bytes < 0x80 and pass through untouched). */
  private def quote(sb: UTF8StringBuilder, s: UTF8String): Unit = {
    sb.append("\"")
    val n = s.numBytes()
    var i = 0
    var clean = true
    while (i < n && clean) {
      val b = s.getByte(i)
      if (b == '"' || b == '\\' || (b >= 0 && b < 0x20)) clean = false else i += 1
    }
    if (clean) sb.append(s)
    else {
      val bytes = s.getBytes
      var start = 0
      var j = 0
      while (j < bytes.length) {
        val b = bytes(j)
        val esc: String =
          if (b == '"') "\\\""
          else if (b == '\\') "\\\\"
          else if (b == '\n') "\\n"
          else if (b == '\r') "\\r"
          else if (b == '\t') "\\t"
          else if (b >= 0 && b < 0x20) f"\\u${b.toInt}%04x"
          else null
        if (esc != null) {
          if (j > start)
            sb.appendBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, j - start)
          sb.append(esc)
          start = j + 1
        }
        j += 1
      }
      if (bytes.length > start)
        sb.appendBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, bytes.length - start)
    }
    sb.append("\"")
  }
}
