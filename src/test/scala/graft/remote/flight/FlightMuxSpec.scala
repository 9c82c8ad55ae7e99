package graft.remote.flight

import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/**
 * Client-side HTTP/2 MULTIPLEXING gates: concurrent RPCs interleave as h2
 * streams on ONE connection (the stock gRPC channel behavior), so a 32-core
 * executor keeps a few sockets per UDF endpoint instead of one per core.
 * The server's interleaved-stream handling was proven in r12 from grpc-core;
 * these gates prove graft's own client drives it the same way, with the
 * socket count asserted via `FlightServer.connectionsAccepted`.
 */
class FlightMuxSpec extends AnyFunSuite
    with org.scalatest.concurrent.TimeLimits {
  import org.scalatest.time.SpanSugar._

  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  test("8 threads interleave unary exchanges over ONE connection") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      failAfter(120.seconds) {
        val c = new FlightClient("127.0.0.1", server.boundPort)
        try {
          val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val threads = (0 until 8).map { t =>
            new Thread(() => {
              try {
                for (round <- 0 until 5) {
                  val n = 2000
                  val rows: Seq[Seq[Any]] =
                    (0 until n).map(i => Seq((t + 1) * (i + 1) * 6, (round + 1) * (i + 1) * 4))
                  val got = c.call("gcd", Seq(IntegerType, IntegerType), rows)
                  val want = (0 until n).map(i => gcd((t + 1) * (i + 1) * 6, (round + 1) * (i + 1) * 4))
                  if (got != want) throw new AssertionError(s"thread $t round $round diverged")
                }
              } catch { case e: Throwable => errs.add(e) }
            })
          }
          threads.foreach(_.start())
          threads.foreach(_.join())
          assert(errs.isEmpty, s"worker failures: ${errs.peek()}")
        } finally c.close()
      }
      assert(server.connectionsAccepted == 1,
        s"expected 1 multiplexed connection, got ${server.connectionsAccepted}")
    } finally server.close(0L)
  }

  test("concurrent STREAMED exchanges ping-pong over one connection") {
    graft.functions.Builtins.ensureRegistered()
    val server = new FlightServer()
    try {
      failAfter(120.seconds) {
        val c = new FlightClient("127.0.0.1", server.boundPort, timeoutMs = 60000)
        try {
          val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val threads = (0 until 6).map { t =>
            new Thread(() => {
              try {
                val ex = c.openExchange("gcd", Seq(IntegerType, IntegerType))
                try {
                  for (round <- 0 until 10) {
                    val rows: Seq[Seq[Any]] =
                      (0 until 300).map(i => Seq((t + 1) * (i + 1) * 6, (round + 1) * (i + 1) * 4))
                    val got = ex.call(rows)
                    val want = (0 until 300).map(i =>
                      Seq(gcd((t + 1) * (i + 1) * 6, (round + 1) * (i + 1) * 4)))
                    if (got != want) throw new AssertionError(s"stream $t round $round diverged")
                  }
                } finally ex.close()
              } catch { case e: Throwable => errs.add(e) }
            })
          }
          threads.foreach(_.start())
          threads.foreach(_.join())
          assert(errs.isEmpty, s"worker failures: ${errs.peek()}")
        } finally c.close()
      }
      assert(server.connectionsAccepted == 1,
        s"expected 1 multiplexed connection, got ${server.connectionsAccepted}")
    } finally server.close(0L)
  }

  test("STREAM-PARALLEL server dispatch: a slow exchange does not stall its neighbors") {
    // r15: each exchange runs on its own server-side worker. Pre-r15 the
    // per-connection handler stepped exchanges serially, so a slow guest on
    // stream A delayed stream B's ping-pong by A's whole backend round-trip
    // — the measured 0.31→0.54 s penalty that forced connection-per-task.
    graft.functions.Builtins.ensureRegistered()
    graft.functions.Udf.scalar2[Int, Int, Int]("mux_sleepy_add(int, int) -> int") {
      (a, b) => Thread.sleep(a.toLong); a + b
    }
    val server = new FlightServer()
    try {
      failAfter(60.seconds) {
        val c = new FlightClient("127.0.0.1", server.boundPort)
        try {
          @volatile var slowResult: Seq[Seq[Any]] = null
          val slow = new Thread(() => {
            val ex = c.openExchange("mux_sleepy_add",
              Seq(IntegerType, IntegerType))
            try slowResult = ex.call(Seq(Seq(2500, 7))) finally ex.close()
          })
          slow.start()
          Thread.sleep(200) // slow stream is now parked in its guest sleep
          // fast exchanges on the SAME connection must proceed meanwhile
          val t0 = System.nanoTime()
          val ex = c.openExchange("gcd", Seq(IntegerType, IntegerType))
          try {
            for (r <- 1 to 5)
              assert(ex.call(Seq(Seq(12 * r, 8 * r))) == Seq(Seq(4 * r)))
          } finally ex.close()
          val fastMs = (System.nanoTime() - t0) / 1000000
          assert(slow.isAlive, "slow stream finished too early for the gate to bite")
          assert(fastMs < 1500,
            s"fast stream took ${fastMs}ms behind a sleeping neighbor — dispatch serialized")
          slow.join(30000)
          assert(slowResult == Seq(Seq(2507)))
        } finally c.close()
      }
      assert(server.connectionsAccepted == 1)
    } finally server.close(0L)
  }

  test("Spark integration: many partitions share a few pooled connections") {
    graft.functions.Builtins.ensureRegistered()
    val spark = graft.TestSpark.spark
    val server = new FlightServer()
    try {
      failAfter(180.seconds) {
        import spark.implicits._
        val parts = 16
        val df = spark.range(0, 20000).map(i => (i.toInt * 6 + 6, i.toInt * 4 + 4))
          .toDF("a", "b").repartition(parts)
        val out = FlightUdf.withFlightColumn(df,
          Seq(("127.0.0.1", server.boundPort)), "gcd", Seq("a", "b"), IntegerType)
        val bad = out.selectExpr("a", "b", "value").as[(Int, Int, Int)].collect()
          .count { case (a, b, v) => v != gcd(a, b) }
        assert(bad == 0)
        // the point of the cache: FAR fewer sockets than partitions (local[4]
        // runs ≤4 tasks at once and leases allow 8 streams per connection,
        // so one connection serves every wave)
        assert(server.connectionsAccepted < parts,
          s"expected shared connections, got ${server.connectionsAccepted} for $parts partitions")
        assert(server.connectionsAccepted >= 1)
      }
    } finally server.close(0L)
  }
}
