package graft.remote.flight

import org.scalatest.funsuite.AnyFunSuite

/**
 * Negative-path gates for graft's Flight server: verbs the UDF protocol does
 * not define and malformed requests must fail with CLEAN gRPC statuses —
 * UNIMPLEMENTED (12) for undefined verbs/actions, NOT_FOUND (5) for unknown
 * functions, INVALID_ARGUMENT (3) for client-side framing mistakes — never a
 * hung stream, a killed connection, or a misleading INTERNAL. Proven two
 * ways: a REAL `pyarrow.flight` client (`tools/flight_client_probe.py
 * --negative`) for everything a stock client can express, and the raw
 * transport ([[Http2Conn]]/[[GrpcConn]]) for malformed bytes a correct
 * client never produces.
 */
class FlightNegativeSpec extends AnyFunSuite {
  private val Service = "/arrow.flight.protocol.FlightService"

  test("pyarrow client: undefined verbs fail cleanly and the connection survives") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      val script = new java.io.File(sys.props("user.dir"), "tools/flight_client_probe.py")
      val proc = new ProcessBuilder("python3", script.getAbsolutePath,
        server.boundPort.toString, "--negative")
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      assert(rc == 0, s"probe exited $rc:\n$out")
      val lines = out.linesIterator.toSeq
      Seq("AGG_create_state True", "AGG_accumulate True", "AGG_merge True",
        "AGG_finish True", "LISTACTIONS True", "DOGET True",
        "INFO_UNKNOWN True", "EXCHANGE_NOPATH True", "SURVIVES True")
        .foreach(l => assert(lines.contains(l), s"missing '$l' in:\n$out"))
    } finally server.close()
  }

  test("Pb skips unknown length-delimited fields without cursor corruption") {
    // regression: `pos += readVarint()` loaded the pre-call cursor, so
    // skipping ANY length-delimited field (e.g. a command descriptor's
    // `cmd` bytes) rewound the cursor and corrupted the parse — a real
    // pyarrow `FlightDescriptor.for_command` tripped it
    val cmdDescriptor = // pyarrow: FlightDescriptor.for_command(b"not-a-path")
      "0802120a6e6f742d612d70617468".grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    val fd = Pb.flightData(Some(cmdDescriptor), Pb.Empty, Pb.Empty)
    val parsed = Pb.parseFlightData(fd)
    assert(parsed.descriptorPath.isEmpty) // cmd is not a path: skipped cleanly
    // trailing fields after the skipped one still parse
    val mixed = Pb.flightData(Some(cmdDescriptor), Array[Byte](1, 2, 3), Pb.Empty)
    assert(Pb.parseFlightData(mixed).dataHeader.toSeq == Seq[Byte](1, 2, 3))
  }

  test("malformed requests are INVALID_ARGUMENT (3), not INTERNAL; connection survives") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      val g = new GrpcConn("127.0.0.1", server.boundPort)
      try {
        // a FlightData whose data_header is NOT a flatbuffer IPC message
        val garbage = Array.fill[Byte](32)(0x7f)
        val fd = Pb.flightData(Some(Pb.descriptorPath("gcd")), garbage, Pb.Empty)
        val e1 = intercept[GrpcStatusException](
          g.call(s"$Service/DoExchange", Iterator(fd)).toSeq)
        assert(e1.code == 3, s"wanted INVALID_ARGUMENT, got ${e1.code}: ${e1.getMessage}")
        assert(e1.getMessage.contains("IPC"), e1.getMessage)
        // a DoExchange without any descriptor path
        val noDesc = Pb.flightData(None, Pb.Empty, Pb.Empty)
        val e2 = intercept[GrpcStatusException](
          g.call(s"$Service/DoExchange", Iterator(noDesc)).toSeq)
        assert(e2.code == 3, s"${e2.code}: ${e2.getMessage}")
        // the same connection still serves a well-formed RPC afterwards
        val ok = g.call(s"$Service/DoAction",
          Iterator(Pb.action("protocol_version", Pb.Empty))).toSeq
        assert(Pb.parseResultBody(ok.head).headOption.contains(2.toByte))
      } finally g.close()

      // raw h2: a compressed-flagged gRPC frame (unsupported) and a frame
      // whose declared length overruns the body — both INVALID_ARGUMENT
      def rawStatus(body: Array[Byte]): String = {
        val h = new Http2Conn("127.0.0.1", server.boundPort)
        try {
          h.startRpc(s"$Service/DoExchange")
          h.sendData(body, endStream = true)
          while (h.nextData().isDefined) {}
          val t = h.trailers().getOrElse(h.responseHeaders())
          Option(t.get("grpc-status")).map(_.toString).getOrElse("missing")
        } finally h.close()
      }
      assert(rawStatus(Array[Byte](1, 0, 0, 0, 0)) == "3") // compressed flag
      assert(rawStatus(Array[Byte](0, 0, 0, 0, 9, 1, 2)) == "3") // truncated
    } finally server.close()
  }
}
