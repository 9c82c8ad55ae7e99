package graft.remote.flight

import java.io.OutputStream
import java.nio.charset.StandardCharsets

/**
 * Shared HTTP/2 + gRPC wire leaves used by both the client ([[Http2Conn]])
 * and the server ([[FlightServer]]'s handler): frame constants, frame
 * header/payload writing, SETTINGS payloads, gRPC message framing, and the
 * `grpc-message` percent codec. The two pumps themselves stay separate —
 * the client drives ONE active stream, the server a stream map — but every
 * byte-layout rule lives here once.
 */
private[flight] object H2 {
  val FrameData = 0x0
  val FrameHeaders = 0x1
  val FrameRst = 0x3
  val FrameSettings = 0x4
  val FramePing = 0x6
  val FrameGoaway = 0x7
  val FrameWindowUpdate = 0x8
  val FrameContinuation = 0x9

  val FlagEndStream = 0x1
  val FlagAck = 0x1
  val FlagEndHeaders = 0x4
  val FlagPadded = 0x8
  val FlagPriority = 0x20

  def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def settingsPayload(kv: Seq[(Int, Long)]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(kv.size * 6)
    kv.foreach { case (k, v) => b.putShort(k.toShort).putInt(v.toInt) }
    b.array()
  }

  /** One frame: 9-byte header (24-bit length, type, flags, stream id) +
    * payload slice. The caller flushes. */
  def writeFrame(out: OutputStream, tpe: Int, flags: Int, streamId: Int,
                 payload: Array[Byte], off: Int = 0, len: Int = -1): Unit = {
    val n = if (len < 0) payload.length else len
    out.write((n >> 16) & 0xff); out.write((n >> 8) & 0xff); out.write(n & 0xff)
    out.write(tpe); out.write(flags)
    out.write(u32(streamId.toLong))
    out.write(payload, off, n)
  }

  /** gRPC length-prefixed message framing: [u8 compressed-flag][u32 BE len]. */
  def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val n = msg.length
    val out = new Array[Byte](5 + n)
    out(1) = ((n >> 24) & 0xff).toByte; out(2) = ((n >> 16) & 0xff).toByte
    out(3) = ((n >> 8) & 0xff).toByte; out(4) = (n & 0xff).toByte
    System.arraycopy(msg, 0, out, 5, n)
    out
  }

  /** `grpc-message` percent-encoding (spec: bytes outside 0x20–0x7E and
    * `%` itself are %XX-escaped). */
  def percentEncode(s: String): String = {
    val sb = new java.lang.StringBuilder()
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = b & 0xff
      if (c >= 0x20 && c <= 0x7e && c != '%') sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  def percentDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }
}
