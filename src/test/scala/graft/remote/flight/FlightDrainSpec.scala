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

  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

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

  test("ROLLING drain mid-query on the Spark path: zero failures, work fails over") {
    // the end-to-end rolling-restart story the drain was built for: a
    // multi-endpoint pool serves a live withFlightColumn query; one server
    // drains MID-QUERY. GOAWAY/refused-streams surface as IOExceptions in
    // the partition chunk loops, which markDead the pooled client and fail
    // over to the surviving endpoint and replay the in-flight chunk — the
    // query must complete with every value correct, never a task failure.
    graft.functions.Builtins.ensureRegistered()
    val spark = graft.TestSpark.spark
    val s1 = new FlightServer()
    val s2 = new FlightServer()
    try {
      failAfter(300.seconds) {
        import spark.implicits._
        val eps = Seq(("127.0.0.1", s1.boundPort), ("127.0.0.1", s2.boundPort))
        val df = spark.range(0, 1000000).map(i => (i.toInt * 6 + 6, i.toInt * 4 + 4))
          .toDF("a", "b").repartition(16)
        val out = FlightUdf.withFlightColumn(df, eps, "gcd", Seq("a", "b"),
          org.apache.spark.sql.types.IntegerType)
        @volatile var drainedAtNs = 0L
        val drainer = new Thread(() => {
          // wait until s1 is actually serving the query, then drain it
          val t0 = System.nanoTime()
          while (s1.connectionsAccepted == 0 && System.nanoTime() - t0 < 60e9.toLong)
            Thread.sleep(10)
          Thread.sleep(300) // let exchanges get in flight
          drainedAtNs = System.nanoTime()
          s1.close(drainMillis = 5000L)
        })
        drainer.start()
        val bad = out.selectExpr("a", "b", "value").as[(Int, Int, Int)].collect()
          .count { case (a, b, v) => v != gcd(a, b) }
        val endNs = System.nanoTime()
        drainer.join(20000)
        assert(!drainer.isAlive)
        assert(bad == 0, s"$bad wrong values after rolling drain")
        // non-vacuous: the drain really happened while the query ran, and
        // the survivor actually served work
        assert(drainedAtNs != 0L && drainedAtNs < endNs,
          "drain did not overlap the query — enlarge the workload")
        assert(s1.connectionsAccepted > 0, "drained server never served")
        assert(s2.connectionsAccepted > 0, "survivor never served")
      }
    } finally { s1.close(0L); s2.close(0L) }
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
