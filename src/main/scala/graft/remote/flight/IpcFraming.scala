package graft.remote.flight

import java.io.{ByteArrayOutputStream, DataInputStream, OutputStream}

/**
 * Arrow IPC encapsulated-message framing, shared by the Flight client and
 * server: a stream is a sequence of `[0xFFFFFFFF][int32 LE length][flatbuffer
 * Message, padded to 8][body]` records terminated by a zero-length marker.
 * `FlightData` carries the SAME message with the 8-byte prefix stripped
 * (`data_header` = flatbuffer, `data_body` = body) — the public Flight↔IPC
 * mapping — so bridging is purely re-framing, never re-encoding.
 */
private[flight] object IpcFraming {
  val Eos: Array[Byte] = Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)

  /** Split one encapsulated record produced by `MessageSerializer` into
    * (flatbuffer metadata, body). */
  def split(all: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(all.length >= 8 && all(0) == -1 && all(1) == -1 && all(2) == -1 && all(3) == -1,
      "unexpected IPC framing")
    val metaLen = (all(4) & 0xff) | ((all(5) & 0xff) << 8) |
      ((all(6) & 0xff) << 16) | ((all(7) & 0xff) << 24)
    (java.util.Arrays.copyOfRange(all, 8, 8 + metaLen),
      java.util.Arrays.copyOfRange(all, 8 + metaLen, all.length))
  }

  /** Re-frame one (metadata, body) message, padding the metadata so the body
    * lands 8-byte aligned. */
  def write(out: OutputStream, header: Array[Byte], body: Array[Byte]): Unit = {
    val padded = (header.length + 7) / 8 * 8
    out.write(Array[Byte](-1, -1, -1, -1))
    out.write(padded & 0xff); out.write((padded >> 8) & 0xff)
    out.write((padded >> 16) & 0xff); out.write((padded >> 24) & 0xff)
    out.write(header)
    var i = header.length
    while (i < padded) { out.write(0); i += 1 }
    out.write(body)
  }

  /** Read ONE encapsulated message off a raw stream: None at the EOS marker.
    * The body length lives inside the flatbuffer `Message` table (public
    * Arrow format), so the stream can be re-framed without decoding any
    * vectors. */
  def readMessage(in: DataInputStream): Option[(Array[Byte], Array[Byte])] = {
    val cont = in.readInt()
    require(cont == -1, s"unexpected IPC continuation marker $cont")
    // length is little-endian on the wire
    val lenLe = in.readInt()
    val metaLen = java.lang.Integer.reverseBytes(lenLe)
    if (metaLen == 0) return None
    val meta = new Array[Byte](metaLen)
    in.readFully(meta)
    val bodyLen = org.apache.arrow.flatbuf.Message
      .getRootAsMessage(java.nio.ByteBuffer.wrap(meta)).bodyLength()
    val body = new Array[Byte](bodyLen.toInt)
    in.readFully(body)
    Some((meta, body))
  }

  /** Convenience: one message framed into a fresh byte array. */
  def toBytes(header: Array[Byte], body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(header.length + body.length + 16)
    write(bos, header, body)
    bos.toByteArray
  }
}
