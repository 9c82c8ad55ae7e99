package graft.remote.flight

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{IntVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{Schema => ASchema}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}
import scala.jdk.CollectionConverters._

/**
 * The incremental-dispatch hazard case: a client that writes its WHOLE
 * multi-batch request before reading anything, against a tiny receive
 * window. The server answers each batch as it arrives, so after ~64 KiB of
 * responses it write-blocks on the client's window MID-REQUEST — and must
 * keep CONSUMING the client's remaining batches from inside that wait
 * (frame pump → exchange backlog, drained at the top level), or the two
 * sides deadlock: the client won't read until it finishes writing, the
 * server can't write until the client reads. The buffered pre-r13 server
 * dodged this by never responding before end-of-request; the incremental
 * server has to handle it.
 */
class FlightBackpressureSpec extends AnyFunSuite
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.time.SpanSugar._

  /** One encapsulated IPC stream of gcd batches, re-split into FlightData
    * request messages (schema first, carrying the descriptor). */
  private def gcdRequests(batches: Int, n: Int): (Seq[Array[Byte]], RootAllocator) = {
    val alloc = new RootAllocator()
    val schema = new ASchema(Seq(
      graft.remote.RemoteProtocol.toArrowField("a", IntegerType),
      graft.remote.RemoteProtocol.toArrowField("b", IntegerType)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root, null, bos)
    w.start()
    for (b <- 0 until batches) {
      root.allocateNew()
      val va = root.getVector(0).asInstanceOf[IntVector]
      val vb = root.getVector(1).asInstanceOf[IntVector]
      for (i <- 0 until n) {
        val k = b * n + i
        va.setSafe(i, (k + 1) * 6)
        vb.setSafe(i, (k + 1) * 4)
      }
      root.setRowCount(n)
      w.writeBatch()
    }
    w.end()
    root.close()
    val msgIn = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    val ipcMsgs = Iterator.continually(IpcFraming.readMessage(msgIn))
      .takeWhile(_.isDefined).map(_.get).toSeq
    val requests = ipcMsgs.zipWithIndex.map { case ((h, b), i) =>
      Pb.flightData(if (i == 0) Some(Pb.descriptorPath("gcd")) else None, h, b)
    }
    (requests, alloc)
  }

  test("backlog overflow on a STARTED write-blocked exchange: clean " +
      "RESOURCE_EXHAUSTED, no duplicate :status, connection survives") {
    graft.functions.Builtins.ensureRegistered()
    // Tiny backlog cap + tiny client receive window: the server write-blocks
    // after ~64 KiB of responses mid-request, its nested frame pump keeps
    // consuming the client's remaining batches, and the backlog crosses the
    // cap INSIDE sendData's window wait for the same stream — the exact
    // hazard the r13 ADVICE flagged (pre-fix this looped forever: the
    // removed stream's send window could never replenish, and the trailers
    // carried a second :status after response HEADERS).
    val server = new FlightServer(maxBuffered = 256 << 10)
    try {
      val (requests, alloc) = gcdRequests(batches = 75, n = 1000) // ~600 KiB
      failAfter(120.seconds) {
        val g = new GrpcConn("127.0.0.1", server.boundPort, recvWindow = 65535)
        try {
          val e = intercept[GrpcStatusException] {
            g.call("/arrow.flight.protocol.FlightService/DoExchange",
              requests.iterator).toSeq
          }
          assert(e.code == 8, s"wanted RESOURCE_EXHAUSTED, got ${e.code}: ${e.getMessage}")
          assert(e.getMessage.contains("per-stream limit"), e.getMessage)
          // the SAME connection still serves an RPC: the overflow killed one
          // stream, not the h2 connection (no PROTOCOL_ERROR from a second
          // :status pseudo-header, no stuck nested pump)
          val ok = g.call("/arrow.flight.protocol.FlightService/DoAction",
            Iterator(Pb.action("protocol_version", Pb.Empty))).toSeq
          assert(Pb.parseResultBody(ok.head).headOption.contains(2.toByte))
        } finally g.close()
      }
      alloc.close()
    } finally server.close()
  }

  test("mid-request response backpressure: server keeps consuming while write-blocked") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      // one IPC stream: schema + 50 batches x 1000 rows (requests ~0.5 MiB,
      // responses ~0.3 MiB >> the 64 KiB client window)
      val alloc = new RootAllocator()
      val schema = new ASchema(Seq(
        graft.remote.RemoteProtocol.toArrowField("a", IntegerType),
        graft.remote.RemoteProtocol.toArrowField("b", IntegerType)).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      val bos = new ByteArrayOutputStream()
      val w = new ArrowStreamWriter(root, null, bos)
      w.start()
      val batches = 50
      val n = 1000
      for (b <- 0 until batches) {
        root.allocateNew()
        val va = root.getVector(0).asInstanceOf[IntVector]
        val vb = root.getVector(1).asInstanceOf[IntVector]
        for (i <- 0 until n) {
          val k = b * n + i
          va.setSafe(i, (k + 1) * 6)
          vb.setSafe(i, (k + 1) * 4)
        }
        root.setRowCount(n)
        w.writeBatch()
      }
      w.end()
      root.close()
      // re-split the encapsulated stream into per-message FlightData
      val msgIn = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
      val ipcMsgs = Iterator.continually(IpcFraming.readMessage(msgIn))
        .takeWhile(_.isDefined).map(_.get).toSeq
      assert(ipcMsgs.length == batches + 1) // schema + batches
      val requests = ipcMsgs.zipWithIndex.map { case ((h, b), i) =>
        Pb.flightData(if (i == 0) Some(Pb.descriptorPath("gcd")) else None, h, b)
      }

      val g = new GrpcConn("127.0.0.1", server.boundPort, recvWindow = 65535)
      try {
        // GrpcConn.call writes EVERY request message, then reads — the
        // write-everything-then-read shape that forces the server to buffer
        // backlog while write-blocked
        val out = g.call("/arrow.flight.protocol.FlightService/DoExchange",
          requests.iterator).toSeq
        // reassemble the response FlightData messages into one IPC stream
        val rbos = new ByteArrayOutputStream()
        out.foreach { m =>
          val fd = Pb.parseFlightData(m)
          if (fd.dataHeader.nonEmpty) IpcFraming.write(rbos, fd.dataHeader, fd.dataBody)
        }
        rbos.write(IpcFraming.Eos)
        val reader = new ArrowStreamReader(
          new ByteArrayInputStream(rbos.toByteArray), alloc)
        val rroot = reader.getVectorSchemaRoot
        var rows = 0
        var ok = true
        while (reader.loadNextBatch()) {
          val v = rroot.getVector(0).asInstanceOf[IntVector]
          for (i <- 0 until rroot.getRowCount) {
            // gcd(6(k+1), 4(k+1)) = 2(k+1)
            if (v.get(i) != 2 * (rows + i + 1)) ok = false
          }
          rows += rroot.getRowCount
        }
        reader.close()
        assert(rows == batches * n, s"expected ${batches * n} result rows, got $rows")
        assert(ok, "result values diverged from gcd(6(k+1), 4(k+1)) = 2(k+1)")
      } finally g.close()
      alloc.close()
    } finally server.close()
  }
}
