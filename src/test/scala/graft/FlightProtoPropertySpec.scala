package graft

import graft.remote.RemoteProtocol
import graft.remote.flight.Pb
import org.apache.arrow.vector.ipc.{ReadChannel, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.arrow.vector.types.pojo.{Schema => ASchema}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/**
 * Differential property gate for the hand-rolled Flight protobuf codec
 * ([[Pb]]) against pyarrow's OWN serializers — the reference implementation
 * of `Flight.proto` (`tools/flight_proto_diff.py`). Both directions, over
 * randomized names/arities/schemas drawn from the full wire type pool:
 * messages Pb encodes must deserialize exactly in pyarrow, and messages
 * pyarrow serializes must parse exactly in Pb (+ `MessageSerializer` for the
 * embedded IPC schema). The same differential-fuzz treatment normalizeUrl
 * (r11) and stripHtml (r12) received, applied to the wire codec.
 */
class FlightProtoPropertySpec extends AnyFunSuite {

  private val TypePool: Seq[(String, DataType)] = Seq(
    "i32" -> IntegerType, "i64" -> LongType, "f32" -> FloatType,
    "f64" -> DoubleType, "str" -> StringType, "bin" -> BinaryType,
    "dec" -> DecimalType(18, 2), "li64" -> ArrayType(LongType, containsNull = true),
    "date" -> DateType, "tsu" -> TimestampNTZType)

  private def schemaIpc(fields: Seq[(String, DataType)]): Array[Byte] = {
    val schema = new ASchema(fields.map { case (n, t) =>
      RemoteProtocol.toArrowField(n, t) }.asJava)
    val bos = new java.io.ByteArrayOutputStream()
    MessageSerializer.serialize(
      new WriteChannel(java.nio.channels.Channels.newChannel(bos)), schema)
    bos.toByteArray
  }

  test("400 randomized messages round-trip BOTH ways between Pb and pyarrow") {
    val script = new java.io.File(sys.props("user.dir"), "tools/flight_proto_diff.py")
    assert(script.isFile)
    val proc = new ProcessBuilder("python3", script.getAbsolutePath)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    val toPy = new java.io.PrintWriter(proc.getOutputStream, true)
    val fromPy = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream))
    def ask(line: String): String = {
      toPy.println(line)
      val r = fromPy.readLine()
      assert(r != null && !r.startsWith("ERR"), s"python side failed on '$line': $r")
      r
    }
    try {
      val rnd = new scala.util.Random(20260816L)
      def randName(): String =
        (1 to (1 + rnd.nextInt(24))).map(_ => "abcdefghijklmnopqrstuvwxyz0123456789_"(
          rnd.nextInt(37))).mkString match {
          case s if s.head.isDigit => "f" + s
          case s => s
        }

      (1 to 100).foreach { _ =>
        // descriptor: Pb -> pyarrow
        val name = randName()
        val d = ask(s"DESC2PY ${Pb.descriptorPath(name).map("%02x".format(_)).mkString}")
        assert(d == s"DESC $name")
        // descriptor: pyarrow -> Pb
        val hex = ask(s"PY2DESC $name").stripPrefix("HEX ")
        val parsed = Pb.parseDescriptorPath(new Pb.Reader(
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray))
        assert(parsed == Seq(name))
      }

      (1 to 100).foreach { _ =>
        val name = randName()
        val nFields = 1 + rnd.nextInt(8)
        val fields = (1 to nFields).map { i =>
          val (tag, dt) = TypePool(rnd.nextInt(TypePool.size))
          (s"${randName()}_$i", tag, dt)
        }
        val records = rnd.nextInt(nFields + 1).toLong // input arity convention

        // FlightInfo: Pb-encoded, pyarrow-decoded
        val infoBytes = Pb.flightInfo(
          schemaIpc(fields.map(f => (f._1, f._3))), name, records)
        val resp = ask(s"INFO2PY ${infoBytes.map("%02x".format(_)).mkString}").split(" ")
        assert(resp(1) == name, s"name: ${resp.mkString(" ")}")
        assert(resp(2).toLong == records)
        assert(resp(3) == fields.map(f => s"${f._1}:${f._2}").mkString(","),
          s"fields diverged: ${resp(3)}")

        // FlightInfo: pyarrow-encoded, Pb-decoded
        val spec = fields.map(f => s"${f._1}:${f._2}").mkString(",")
        val hex = ask(s"PY2INFO $name $records $spec").stripPrefix("HEX ")
        val info = Pb.parseFlightInfo(
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        assert(info.path == Seq(name))
        assert(info.totalRecords == records)
        val schema = MessageSerializer.deserializeSchema(new ReadChannel(
          java.nio.channels.Channels.newChannel(
            new java.io.ByteArrayInputStream(info.schemaIpc))))
        val got = schema.getFields.asScala.map { f =>
          (f.getName, RemoteProtocol.fromArrowField(f)._1) }
        assert(got == fields.map(f => (f._1, f._3)),
          s"schema diverged: $got vs ${fields.map(f => (f._1, f._3))}")
      }
    } finally {
      try { toPy.println("QUIT"); toPy.close() } finally proc.destroy()
    }
  }
}
