package graft.remote.flight

import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/**
 * Graceful-drain gates: a rolling restart of a UDF-server fleet must not
 * abort in-flight exchanges. `FlightServer.drain()` stops accepting
 * connections and advertises GOAWAY(NO_ERROR, last-accepted-stream);
 * `close(graceMillis)` then lets active streams run to completion before
 * hard-closing — while any NEW stream on a drained connection is refused
 * retryably (RST_STREAM REFUSED_STREAM, the refusal gRPC clients map to
 * UNAVAILABLE and replay on another endpoint).
 */
class FlightDrainSpec extends AnyFunSuite
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.time.SpanSugar._

  test("an active streamed exchange completes during close(); the listener refuses new connections") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    val port = server.boundPort
    failAfter(120.seconds) {
      val fc = new FlightClient("127.0.0.1", port)
      try {
        val es = fc.openExchange("gcd", Seq(IntegerType, IntegerType))
        assert(es.call(Seq(Seq(6, 4))) == Seq(Seq(2)))
        // begin the drain MID-EXCHANGE from another thread; the grace is
        // generous — close() must return as soon as the stream finishes,
        // not after the full grace
        val closer = new Thread(() => server.close(drainMillis = 30000L))
        closer.start()
        Thread.sleep(300) // GOAWAY sent; draining latched
        // the in-flight exchange still ping-pongs to completion
        assert(es.call(Seq(Seq(12, 8))) == Seq(Seq(4)))
        assert(es.call(Seq(Seq(9, 6))) == Seq(Seq(3)))
        es.close() // half-close + drain trailers: grpc-status 0 verified here
        val t0 = System.nanoTime()
        closer.join(10000)
        assert(!closer.isAlive, "close() did not return after the last stream drained")
        assert((System.nanoTime() - t0) < 10L * 1000 * 1000 * 1000)
      } finally fc.close()
      // drained listener: new connections are refused outright
      intercept[java.io.IOException](new FlightClient("127.0.0.1", port).close())
    }
  }

  test("a drained connection refuses NEW streams with GOAWAY semantics") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      failAfter(60.seconds) {
        val g = new GrpcConn("127.0.0.1", server.boundPort)
        try {
          // a completed RPC establishes the connection (stream 1)
          val ok = g.call("/arrow.flight.protocol.FlightService/DoAction",
            Iterator(Pb.action("protocol_version", Pb.Empty))).toSeq
          assert(Pb.parseResultBody(ok.head).headOption.contains(2.toByte))
          server.drain()
          // the next stream (id 3 > GOAWAY's last-stream-id 1) goes out
          // before the client processes the buffered GOAWAY — the server
          // refuses it with RST_STREAM, never a hang or a grpc-status
          val e = intercept[java.io.IOException] {
            g.call("/arrow.flight.protocol.FlightService/DoAction",
              Iterator(Pb.action("protocol_version", Pb.Empty))).toSeq
          }
          assert(!e.isInstanceOf[GrpcStatusException], s"unexpected status: $e")
          assert(e.getMessage.contains("reset") || e.getMessage.contains("GOAWAY"),
            e.getMessage)
          // and once GOAWAY is processed locally, the client refuses to even
          // start an RPC on this connection
          val e2 = intercept[java.io.IOException] {
            g.call("/arrow.flight.protocol.FlightService/DoAction",
              Iterator(Pb.action("protocol_version", Pb.Empty))).toSeq
          }
          assert(e2.getMessage.contains("GOAWAY"), e2.getMessage)
        } finally g.close()
      }
    } finally server.close(0L)
  }
}
