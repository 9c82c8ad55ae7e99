package graft.remote.flight

import java.io.ByteArrayOutputStream

/**
 * Minimal protobuf wire codec + the Arrow Flight RPC messages graft's bridge
 * exchanges (reference client `arrow-udf-runtime/src/remote/mod.rs:36-156`
 * drives exactly these: `Action`/`Result`, `Criteria`, `FlightDescriptor`,
 * `FlightInfo`, `FlightData`). Only the wire features those messages use are
 * implemented: varint, 64-bit zigzag-free int64, and length-delimited fields.
 *
 * Field numbers are the public `Flight.proto` contract, pinned against
 * golden bytes from a real pyarrow build (see FlightUdfSpec "protobuf golden
 * bytes"): e.g. `FlightDescriptor.for_path("my_func")` serializes to
 * `08 01 1a 07 6d795f66756e63` — field 1 varint DescriptorType.PATH, field 3
 * length-delimited path element.
 */
private[graft] object Pb {
  // ---- writer ---------------------------------------------------------------
  final class Writer {
    private val out = new ByteArrayOutputStream(64)
    def toBytes: Array[Byte] = out.toByteArray

    def varint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      this
    }
    private def key(field: Int, wire: Int): this.type = varint((field.toLong << 3) | wire)
    /** varint-typed field; proto3 default (0) is omitted by the caller. */
    def int(field: Int, v: Long): this.type = { key(field, 0); varint(v) }
    def bytes(field: Int, v: Array[Byte]): this.type = {
      key(field, 2); varint(v.length.toLong); out.write(v, 0, v.length); this
    }
    def string(field: Int, v: String): this.type =
      bytes(field, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def message(field: Int, m: Writer): this.type = bytes(field, m.toBytes)
  }

  // ---- reader ---------------------------------------------------------------
  /** Single-pass cursor over one message's bytes; unknown fields are skipped
    * (forward-compatible, like any generated protobuf parser). */
  final class Reader(buf: Array[Byte], from: Int, until: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = from
    def hasNext: Boolean = pos < until

    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint overflow")
      }
      acc
    }
    /** Returns the field number of the next key and leaves the cursor at its
      * payload; payload readers below must match the wire type. */
    def nextField(): (Int, Int) = {
      val k = readVarint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
    def readString(): String =
      new String(readBytes(), java.nio.charset.StandardCharsets.UTF_8)
    /** Sub-reader over an embedded message without copying. */
    def readMessage(): Reader = {
      val n = readVarint().toInt
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // NOT `pos += readVarint()`: Scala loads the old `pos` before the
        // call, and readVarint() itself advances `pos` — the compound form
        // silently rewinds the cursor by the varint's width
        val n = readVarint().toInt
        pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---- Flight messages ------------------------------------------------------
  val Empty: Array[Byte] = Array.emptyByteArray

  /** `FlightDescriptor { DescriptorType type = 1; bytes cmd = 2; repeated string path = 3; }` */
  def descriptorPath(path: String): Array[Byte] =
    new Writer().int(1, 1L).string(3, path).toBytes

  def parseDescriptorPath(msg: Reader): Seq[String] = {
    val path = Seq.newBuilder[String]
    while (msg.hasNext) msg.nextField() match {
      case (3, 2) => path += msg.readString()
      case (_, w) => msg.skip(w)
    }
    path.result()
  }

  /** `Action { string type = 1; bytes body = 2; }` */
  def action(tpe: String, body: Array[Byte]): Array[Byte] = {
    val w = new Writer().string(1, tpe)
    if (body.nonEmpty) w.bytes(2, body)
    w.toBytes
  }

  /** `Result { bytes body = 1; }` */
  def parseResultBody(bytes: Array[Byte]): Array[Byte] = {
    val r = new Reader(bytes)
    var body = Empty
    while (r.hasNext) r.nextField() match {
      case (1, 2) => body = r.readBytes()
      case (_, w) => r.skip(w)
    }
    body
  }

  /** `Criteria { bytes expression = 1; }` — default (empty) criteria is the
    * reference's list-everything request (`remote/mod.rs:90`). */
  def criteria(expression: Array[Byte]): Array[Byte] =
    if (expression.isEmpty) Empty else new Writer().bytes(1, expression).toBytes

  /** `FlightData { FlightDescriptor flight_descriptor = 1; bytes data_header = 2;
    *   bytes app_metadata = 3; bytes data_body = 1000; }` */
  def flightData(descriptor: Option[Array[Byte]], dataHeader: Array[Byte],
                 dataBody: Array[Byte]): Array[Byte] = {
    val w = new Writer()
    descriptor.foreach(d => w.bytes(1, d))
    if (dataHeader.nonEmpty) w.bytes(2, dataHeader)
    if (dataBody.nonEmpty) w.bytes(1000, dataBody)
    w.toBytes
  }

  final case class FlightDataMsg(descriptorPath: Seq[String], dataHeader: Array[Byte],
                                 appMetadata: Array[Byte], dataBody: Array[Byte])
  def parseFlightData(bytes: Array[Byte]): FlightDataMsg = {
    val r = new Reader(bytes)
    var path = Seq.empty[String]
    var header = Empty; var app = Empty; var body = Empty
    while (r.hasNext) r.nextField() match {
      case (1, 2)    => path = parseDescriptorPath(r.readMessage())
      case (2, 2)    => header = r.readBytes()
      case (3, 2)    => app = r.readBytes()
      case (1000, 2) => body = r.readBytes()
      case (_, w)    => r.skip(w)
    }
    FlightDataMsg(path, header, app, body)
  }

  /** Server-side encodes/parses (graft AS the Flight UDF server). */
  def parseAction(bytes: Array[Byte]): (String, Array[Byte]) = {
    val r = new Reader(bytes)
    var tpe = ""; var body = Empty
    while (r.hasNext) r.nextField() match {
      case (1, 2) => tpe = r.readString()
      case (2, 2) => body = r.readBytes()
      case (_, w) => r.skip(w)
    }
    (tpe, body)
  }

  def result(body: Array[Byte]): Array[Byte] = new Writer().bytes(1, body).toBytes

  def flightInfo(schemaIpc: Array[Byte], name: String, totalRecords: Long): Array[Byte] =
    new Writer().bytes(1, schemaIpc)
      .bytes(2, descriptorPath(name))
      .int(4, totalRecords)
      .toBytes

  /** `FlightInfo { bytes schema = 1; FlightDescriptor flight_descriptor = 2;
    *   repeated FlightEndpoint endpoint = 3; int64 total_records = 4; ... }`
    * `schema` is an encapsulated Arrow IPC schema message; `total_records`
    * carries the reference's arg-count convention (`remote/mod.rs:182`,
    * python server `_make_flight_info`). */
  final case class FlightInfoMsg(schemaIpc: Array[Byte], path: Seq[String],
                                 totalRecords: Long)
  def parseFlightInfo(bytes: Array[Byte]): FlightInfoMsg = {
    val r = new Reader(bytes)
    var schema = Empty; var path = Seq.empty[String]; var records = 0L
    while (r.hasNext) r.nextField() match {
      case (1, 2) => schema = r.readBytes()
      case (2, 2) => path = parseDescriptorPath(r.readMessage())
      case (4, 0) => records = r.readVarint()
      case (_, w) => r.skip(w)
    }
    FlightInfoMsg(schema, path, records)
  }
}
