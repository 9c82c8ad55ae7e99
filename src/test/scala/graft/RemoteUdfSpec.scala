package graft

import graft.remote.{RemoteUdf, UdfClient, UdfServer}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

class RemoteUdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("client/server round trip: scalar call over Arrow IPC") {
    graft.functions.Builtins.ensureRegistered()
    val server = new UdfServer()
    try {
      val client = new UdfClient("127.0.0.1", server.boundPort)
      try {
        val res = client.call("add", Seq(IntegerType, IntegerType),
          Seq(Seq(12, 18), Seq(25, 15), Seq(null, 7)))
        assert(res == Seq(30, 40, null))
        // sequential second call on the same connection
        assert(client.call("add", Seq(IntegerType, IntegerType), Seq(Seq(9, 6))) == Seq(15))
      } finally client.close()
    } finally server.close()
  }

  test("unknown function reports ERR") {
    graft.functions.Builtins.ensureRegistered()
    val server = new UdfServer()
    try {
      val client = new UdfClient("127.0.0.1", server.boundPort)
      try {
        val e = intercept[RuntimeException](
          client.call("nope", Seq(IntegerType), Seq(Seq(1))))
        assert(e.getMessage.contains("no scalar function"))
      } finally client.close()
    } finally server.close()
  }

  test("mapPartitions integration computes remote column") {
    Graft.install(spark)
    val server = new UdfServer()
    try {
      val df = spark.range(100).selectExpr("CAST(id AS INT) AS a", "CAST(id % 7 AS INT) AS b")
      val out = RemoteUdf.withRemoteColumn(df, "127.0.0.1", server.boundPort,
        "add", Seq("a", "b"), IntegerType)
      val rows = out.collect()
      assert(rows.length == 100)
      val byId = rows.map(r => r.getInt(0) -> r.getInt(2)).toMap
      assert(byId(14) == 14) // 14 + 0
      assert(byId(12) == 17) // 12 + 5
      assert(byId(30) == 32) // 30 + 2
    } finally server.close()
  }
}
