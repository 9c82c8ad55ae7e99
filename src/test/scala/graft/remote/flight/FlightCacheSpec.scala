package graft.remote.flight

import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/**
 * Shared-client lifecycle gates for [[FlightClientCache]] / [[Http2Conn]]:
 *
 *  1. A read DEADLINE must not permanently poison a shared client: the RPC
 *     whose read hit the deadline sees SocketTimeoutException (containment —
 *     never retried), but every LATER use of the same client sees a plain
 *     IOException from the latched-dead connection and reconnects through
 *     the normal retry path. (Regression: STE was latched and rethrown from
 *     every future startRpc, nothing treated it as retryable, and the cache
 *     preferred the poisoned idle client for the executor lifetime.)
 *  2. Concurrent streams wedged behind the hung one fail over too, rather
 *     than inheriting the deadline verdict.
 *  3. [[FlightClientCache.acquire]] dials OUTSIDE the global cache monitor:
 *     a stalled connect to one endpoint must not block leases to healthy
 *     endpoints or lease release.
 *  4. An abandoned gRPC response iterator releases its h2 stream on close()
 *     (a leaked stream on a long-lived shared connection accumulates inbox
 *     bytes and counts against the server's concurrent-stream limit forever).
 */
class FlightCacheSpec extends AnyFunSuite
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.time.SpanSugar._

  private def ensureSleepy(): Unit = {
    graft.functions.Builtins.ensureRegistered()
    // sleeps `a` millis on the server, then returns a + b
    graft.functions.Udf.scalar2[Int, Int, Int]("sleepy_add(int, int) -> int") {
      (a, b) => Thread.sleep(a.toLong); a + b
    }
  }

  test("a read deadline aborts only its own RPC; the same client recovers on the next call") {
    ensureSleepy()
    val server = new FlightServer()
    try {
      failAfter(60.seconds) {
        val c = new FlightClient("127.0.0.1", server.boundPort, timeoutMs = 700)
        try {
          // server sleeps 3s > 700ms deadline: this RPC's own read times out
          intercept[java.net.SocketTimeoutException] {
            c.call("sleepy_add", Seq(IntegerType, IntegerType), Seq(Seq(3000, 1)))
          }
          // the SAME client object (what FlightClientCache would hand the
          // next task) must recover: the latched-dead connection surfaces as
          // a retryable IOException internally and withRetry re-dials
          val got = c.call("sleepy_add", Seq(IntegerType, IntegerType), Seq(Seq(0, 41)))
          assert(got == Seq(41))
        } finally c.close()
      }
    } finally server.close(0L)
  }

  test("a concurrent stream wedged behind the hung RPC reconnects instead of inheriting the deadline") {
    ensureSleepy()
    val server = new FlightServer()
    try {
      failAfter(60.seconds) {
        val c = new FlightClient("127.0.0.1", server.boundPort, timeoutMs = 700)
        try {
          @volatile var slow: Throwable = null
          val t = new Thread(() => {
            try c.call("sleepy_add", Seq(IntegerType, IntegerType), Seq(Seq(3000, 1)))
            catch { case e: Throwable => slow = e }
          })
          t.start()
          Thread.sleep(250) // the slow RPC holds the reader baton by now
          // this fast call shares the connection; when the slow RPC's read
          // deadline latches it dead, this one must NOT see STE — it gets
          // the retryable IOException path and replays on a fresh connection
          val got = c.call("gcd", Seq(IntegerType, IntegerType), Seq(Seq(12, 8)))
          assert(got == Seq(4))
          t.join()
          assert(slow != null, "slow RPC should have failed")
          assert(slow.isInstanceOf[java.net.SocketTimeoutException]
            || slow.isInstanceOf[java.io.IOException], s"unexpected: $slow")
        } finally c.close()
      }
    } finally server.close(0L)
  }

  test("acquire dials outside the cache lock: a stalled dial blocks neither healthy leases nor release") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val stalledPort = 1 // never dialed for real — the override blocks
    FlightClientCache.dialOverride = Some { (h, p) =>
      if (p == stalledPort) gate.await() // a dead endpoint mid-connect-timeout
      new FlightClient(h, p)
    }
    try {
      failAfter(30.seconds) {
        val staller = new Thread(() =>
          try FlightClientCache.acquire("127.0.0.1", stalledPort).release()
          catch { case _: Throwable => () })
        staller.start()
        Thread.sleep(200) // stuck inside the (now unlocked) dial
        // leases to the HEALTHY endpoint must proceed while that dial hangs
        val t0 = System.nanoTime()
        val l1 = FlightClientCache.acquire("127.0.0.1", server.boundPort)
        val l2 = FlightClientCache.acquire("127.0.0.1", server.boundPort)
        l1.release(); l2.release()
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        assert(elapsedMs < 5000, s"healthy acquire/release took ${elapsedMs}ms behind a stalled dial")
        gate.countDown()
        staller.join(10000)
        assert(!staller.isAlive)
      }
    } finally {
      FlightClientCache.dialOverride = None
      gate.countDown()
      server.close(0L)
    }
  }

  test("an abandoned response iterator releases its h2 stream on close()") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      failAfter(60.seconds) {
        val g = new GrpcConn("127.0.0.1", server.boundPort)
        try {
          // ListFlights streams one message per registered function (100+):
          // take one and walk away — the h2 stream must not leak
          val rs = g.call("/arrow.flight.protocol.FlightService/ListFlights",
            Iterator(Pb.criteria(Pb.Empty)))
          assert(rs.hasNext)
          rs.next()
          assert(g.activeStreams == 1)
          rs.close()
          assert(g.activeStreams == 0)
          // close is idempotent and the connection stays healthy
          rs.close()
          val ok = g.call("/arrow.flight.protocol.FlightService/DoAction",
            Iterator(Pb.action("protocol_version", Pb.Empty)))
          try assert(Pb.parseResultBody(ok.toSeq.head).headOption.contains(2.toByte))
          finally ok.close()
          assert(g.activeStreams == 0)
          // an abandoned bidi call releases on close() too
          val b = g.bidi("/arrow.flight.protocol.FlightService/DoExchange")
          assert(g.activeStreams == 1)
          b.close()
          assert(g.activeStreams == 0)
        } finally g.close()
      }
    } finally server.close(0L)
  }
}
