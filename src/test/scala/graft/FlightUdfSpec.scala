package graft

import graft.remote.flight._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Drives graft's from-scratch gRPC/HTTP2 Arrow Flight client against a REAL
 * `pyarrow.flight` server (grpc-core — the same stack a reference
 * `arrow_udf.UdfServer` deployment runs, `tools/flightudf_server.py`). The
 * two sides share zero transport code: every HTTP/2 frame, HPACK block,
 * protobuf message, and Arrow IPC payload is produced by one independent
 * implementation and parsed by the other. This is the interop gate
 * `docs/FLIGHT_INTEROP.md` carried as blocked for 11 rounds.
 */
class FlightUdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val port = FlightWorker.port

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("protobuf golden bytes: descriptor + FlightInfo match a real pyarrow build") {
    // pyarrow: fl.FlightDescriptor.for_path("my_func").serialize().hex()
    assert(Pb.descriptorPath("my_func").map("%02x".format(_)).mkString ==
      "08011a076d795f66756e63")
    // pyarrow: fl.FlightInfo(schema=[x:int32, y:int32, gcd:int32],
    //   descriptor=for_path("my_func"), endpoints=[], total_records=2,
    //   total_bytes=0).serialize().hex()
    val golden = hex(
      "0ae001ffffffffd80000001000000000000a000c000600050008000a00000000010400" +
      "0c0000000800080000000400080000000400000003000000740000003400000004000000" +
      "a8ffffff000001021000000014000000040000000000000003000000676364009" +
      "8ffffff0000000120000000d4ffffff000001021000000014000000040000000000000001" +
      "00000079000000c4ffffff0000000120000000100014000800060007000c000000100010" +
      "00000000000102100000001c00000004000000000000000100000078000000080" +
      "00c0008000700080000000000000120000000120b08011a076d795f66756e632002")
    val info = Pb.parseFlightInfo(golden)
    assert(info.path == Seq("my_func"))
    assert(info.totalRecords == 2L)
    // the schema field is a complete encapsulated IPC schema message
    val schema = org.apache.arrow.vector.ipc.message.MessageSerializer.deserializeSchema(
      new org.apache.arrow.vector.ipc.ReadChannel(java.nio.channels.Channels.newChannel(
        new java.io.ByteArrayInputStream(info.schemaIpc))))
    assert(schema.getFields.size() == 3)
    assert(schema.getFields.get(0).getName == "x")
    assert(schema.getFields.get(2).getName == "gcd")
  }

  test("handshake + discovery: protocol_version, list, get") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      assert(c.protocolVersion() == 2)
      val fns = c.list()
      assert(fns.map(_.name).toSet ==
        Set("flight_gcd", "flight_len", "flight_len_bucket", "flight_mod", "flight_words",
          "flight_dec_add", "flight_divisors"))
      val gcd = c.get("flight_gcd")
      assert(gcd.args.map(_._2) == Seq(IntegerType, IntegerType))
      assert(gcd.returns.map(_._2) == Seq(IntegerType))
      val words = c.get("flight_words")
      assert(words.args.map(_._2) == Seq(StringType))
      // table fn result schema: (row_index, value)
      assert(words.returns.map(_._2) == Seq(IntegerType, StringType))
    } finally c.close()
  }

  test("scalar DoExchange: values, nulls, and sequential calls on one connection") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      assert(c.call("flight_gcd", Seq(IntegerType, IntegerType),
        Seq(Seq(12, 8), Seq(54, 24), Seq(null, 5), Seq(7, null))) ==
        Seq(4, 6, null, null))
      // a second RPC on the same connection (new h2 stream id)
      assert(c.call("flight_len", Seq(StringType),
        Seq(Seq("hello"), Seq(""), Seq(null))) == Seq(5, 0, null))
    } finally c.close()
  }

  test("dictionary-encoded RESULT columns from the pyarrow server decode to values") {
    // flight_len_bucket advertises dictionary<int32, string>: each result
    // batch is a DictionaryBatch + an index-typed RecordBatch on the wire.
    // Discovery must surface the VALUE type; reads must decode indices.
    assert(FlightUdf.returnTypeOf(("127.0.0.1", port), "flight_len_bucket") == StringType)
    val c = new FlightClient("127.0.0.1", port)
    try {
      assert(c.call("flight_len_bucket", Seq(StringType),
        Seq(Seq("x" * 10), Seq("y" * 60), Seq("z" * 200), Seq(null))) ==
        Seq("short", "medium", "long", null))
    } finally c.close()
  }

  test("table-function DoExchange: (row_index, value) explode semantics") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      assert(c.callTable("flight_words", Seq(StringType),
        Seq(Seq("big data engine"), Seq(null), Seq("x"))) ==
        Seq((0, "big"), (0, "data"), (0, "engine"), (2, "x")))
    } finally c.close()
  }

  test("flow control: a 60k-row exchange crosses the 64 KiB h2 windows both ways") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      val n = 60000
      val rows = (0 until n).map(i => Seq(i * 37 + 1, i % 97 + 1): Seq[Any])
      val got = c.call("flight_gcd", Seq(IntegerType, IntegerType), rows)
      assert(got.length == n)
      def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
      (0 until n by 7919).foreach { i =>
        assert(got(i) == gcd(i * 37 + 1, i % 97 + 1), s"row $i")
      }
    } finally c.close()
  }

  test("wide types over the wire: Decimal128 both ways, list<int64> return") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      // the reference's decimal scenario (tests/remote.rs test_decimal_add)
      val dec = c.get("flight_dec_add")
      assert(dec.args.map(_._2) == Seq(DecimalType(18, 2), DecimalType(18, 2)))
      val got = c.call("flight_dec_add", Seq(DecimalType(18, 2), DecimalType(18, 2)),
        Seq(Seq(new java.math.BigDecimal("1.25"), new java.math.BigDecimal("2.50")),
          Seq(new java.math.BigDecimal("-0.01"), new java.math.BigDecimal("0.01")),
          Seq(null, new java.math.BigDecimal("9.99"))))
      assert(got.map(v => Option(v).map(_.toString).orNull) == Seq("3.75", "0.00", null))
      // nested vector layout back from the guest
      val divs = c.get("flight_divisors")
      assert(divs.returns.map(_._2) == Seq(ArrayType(LongType, containsNull = true)))
      assert(c.call("flight_divisors", Seq(IntegerType), Seq(Seq(12), Seq(null))) ==
        Seq(Seq(1L, 2L, 3L, 4L, 6L, 12L), null))
    } finally c.close()
  }

  test("table-function correlation past BatchSize: per-chunk exchanges keep indices global") {
    // stock Flight servers emit row_index relative to each input batch; the
    // client must therefore never put two batches in one exchange for table
    // fns (it offsets per-chunk results by a running base instead)
    val c = new FlightClient("127.0.0.1", port)
    try {
      val n = graft.remote.RemoteProtocol.BatchSize + 500
      val rows = (0 until n).map(i => Seq(s"w$i"): Seq[Any])
      val got = c.callTable("flight_words", Seq(StringType), rows)
      assert(got.length == n)
      got.foreach { case (i, v) => assert(v == s"w$i", s"row $i got $v") }
    } finally c.close()
  }

  test("errors surface as gRPC statuses: unknown function, guest exception") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      val e = intercept[GrpcStatusException](
        c.call("definitely_not_there", Seq(IntegerType), Seq(Seq(1))))
      assert(e.code != 0)
      // the connection survives a failed RPC: the next stream works
      assert(c.call("flight_gcd", Seq(IntegerType, IntegerType), Seq(Seq(6, 4))) == Seq(2))
      // a guest-side exception mid-exchange fails that call with a status
      val e2 = intercept[Exception](
        c.call("flight_mod", Seq(LongType, LongType), Seq(Seq(10L, 0L))))
      assert(e2.isInstanceOf[GrpcStatusException] || e2.isInstanceOf[java.io.IOException])
    } finally c.close()
  }

  test("Spark integration: withFlightColumn + withFlightTableColumn, pooled per partition") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i * 21, i % 14 + 1)).toDF("x", "y")
    val out = FlightUdf.withFlightColumn(df, FlightWorker.endpoints, "flight_gcd",
      Seq("x", "y"), IntegerType)
    def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(got.length == 5000)
    got.foreach { case (x, y, v) => assert(v == gcd(x, y)) }

    val docs = Seq("alpha beta", "gamma", "").toDF("s")
    val words = FlightUdf.withFlightTableColumn(docs, FlightWorker.endpoints,
      "flight_words", Seq("s"), StringType)
    assert(words.collect().map(_.getString(1)).sorted.toSeq ==
      Seq("alpha", "beta", "gamma"))
    // discovery-driven typing resolves the return type without a schema hint
    assert(FlightUdf.returnTypeOf(FlightWorker.endpoints.head, "flight_gcd") == IntegerType)
  }

  test("long-lived DoExchange: many batches ping-pong over ONE exchange") {
    val c = new FlightClient("127.0.0.1", port)
    try {
      val s = c.openExchange("flight_gcd", Seq(IntegerType, IntegerType))
      try {
        def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
        // several bounded batches over the same stream, incl. a big one that
        // crosses the 64 KiB h2 windows mid-stream
        assert(s.call(Seq(Seq(12, 8), Seq(54, 24))) == Seq(Seq(4), Seq(6)))
        assert(s.call(Seq(Seq(null, 5))) == Seq(Seq(null)))
        val n = 30000
        val rows = (0 until n).map(i => Seq(i * 37 + 1, i % 97 + 1): Seq[Any])
        val big = s.call(rows)
        assert(big.length == n)
        (0 until n by 7919).foreach(i => assert(big(i).head == gcd(i * 37 + 1, i % 97 + 1)))
        assert(s.call(Seq(Seq(100, 75))) == Seq(Seq(25)))
      } finally s.close()
      // the connection is reusable after a streamed exchange completes
      assert(c.call("flight_len", Seq(StringType), Seq(Seq("abc"))) == Seq(3))
    } finally c.close()
  }

  test("Spark integration: withFlightColumnStreamed matches the per-chunk path") {
    import spark.implicits._
    val df = (1 to 30000).map(i => (i * 21, i % 14 + 1)).toDF("x", "y")
    val out = FlightUdf.withFlightColumnStreamed(df, FlightWorker.endpoints,
      "flight_gcd", Seq("x", "y"), IntegerType)
    def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
    val got = out.collect()
    assert(got.length == 30000)
    got.foreach(r => assert(r.getInt(2) == gcd(r.getInt(0), r.getInt(1))))
  }

  // ---- failure parity with the in-house wire (RemoteUdfSpec discipline) ----

  /** Spawn the REAL pyarrow fixture on a FIXED port and wait until it
    * serves (so a restart reappears at the same endpoint). */
  private def startFixture(port: Int): Process = {
    val script = new java.io.File(sys.props("user.dir"), "tools/flightudf_server.py")
    val p = new ProcessBuilder("python3", script.getAbsolutePath,
      "--port", port.toString)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    val br = new java.io.BufferedReader(new java.io.InputStreamReader(p.getInputStream))
    val line = br.readLine()
    assert(line != null && line.startsWith("PORT "), s"fixture failed: $line")
    p
  }

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("transient connection loss: client reconnects and replays the exchange") {
    val port = freePort()
    var proc = startFixture(port)
    val c = new FlightClient("127.0.0.1", port)
    try {
      assert(c.call("flight_gcd", Seq(IntegerType, IntegerType), Seq(Seq(12, 8))) == Seq(4))
      // kill the server under the established connection, restart SAME port
      proc.destroyForcibly().waitFor()
      proc = startFixture(port)
      // the EOF/reset is absorbed by withRetry: reconnect + replay, no task loss
      assert(c.call("flight_gcd", Seq(IntegerType, IntegerType), Seq(Seq(54, 24))) == Seq(6))
    } finally {
      c.close()
      proc.destroyForcibly()
    }
  }

  test("endpoint failover: a dead endpoint in the pool is skipped at connect time") {
    import spark.implicits._
    val dead = ("127.0.0.1", freePort()) // nothing listening
    val df = (1 to 2000).map(i => (i * 21, i % 14 + 1)).toDF("x", "y")
    val out = FlightUdf.withFlightColumn(df, dead +: FlightWorker.endpoints,
      "flight_gcd", Seq("x", "y"), IntegerType)
    def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
    val got = out.collect()
    assert(got.length == 2000)
    got.foreach(r => assert(r.getInt(2) == gcd(r.getInt(0), r.getInt(1))))
  }

  test("streamed mode: kill and restart the server mid-query, in-flight chunk replays") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val port = freePort()
    var proc = startFixture(port)
    try {
      val df = (1 to 600000).map(i => (i * 37 + 1, i % 97 + 1)).toDF("x", "y")
      val fut = Future {
        FlightUdf.withFlightColumnStreamed(df, Seq(("127.0.0.1", port)),
          "flight_gcd", Seq("x", "y"), IntegerType).collect()
      }
      Thread.sleep(500)
      assert(!fut.isCompleted, "query finished before the kill — grow the input")
      proc.destroyForcibly().waitFor()
      proc = startFixture(port)
      val got = Await.result(fut, 120.seconds)
      assert(got.length == 600000)
      def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
      (0 until 600000 by 7919).foreach { i =>
        val r = got(i)
        assert(r.getInt(2) == gcd(r.getInt(0), r.getInt(1)), s"row $i")
      }
    } finally proc.destroyForcibly()
  }

  test("kill and restart the pyarrow server MID-QUERY: the query completes") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val port = freePort()
    var proc = startFixture(port)
    try {
      // enough rows that the python-side per-row eval spans several seconds
      // across many BatchSize chunks — the kill lands between exchanges
      val df = (1 to 600000).map(i => (i * 37 + 1, i % 97 + 1)).toDF("x", "y")
      val fut = Future {
        FlightUdf.withFlightColumn(df, Seq(("127.0.0.1", port)),
          "flight_gcd", Seq("x", "y"), IntegerType).collect()
      }
      Thread.sleep(500) // let the exchanges start
      assert(!fut.isCompleted, "query finished before the kill — grow the input")
      proc.destroyForcibly().waitFor() // hard kill: every live exchange dies
      proc = startFixture(port)        // back at the same endpoint
      val got = Await.result(fut, 120.seconds)
      assert(got.length == 600000)
      def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)
      (0 until 600000 by 7919).foreach { i =>
        val r = got(i)
        assert(r.getInt(2) == gcd(r.getInt(0), r.getInt(1)), s"row $i")
      }
    } finally proc.destroyForcibly()
  }
}
