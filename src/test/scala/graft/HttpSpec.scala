package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the fetch-analogue UDF against a local JDK HttpServer (the
  * reference tests `javascript_fetch.rs` against a local mock server the
  * same way). */
class HttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = ("pong:" + x.getRequestURI.getQuery).getBytes("UTF-8")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body)
        x.close()
      }
    })
    server.createContext("/boom", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(500, -1); x.close()
      }
    })
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("http_get: success body and error-column failure, executed in tasks") {
    graft.functions.Http.register()
    Graft.install(spark)
    withServer { port =>
      val rows = spark.range(3).selectExpr(
        s"http_get(concat('http://127.0.0.1:$port/ok?id=', id)) AS r")
        .selectExpr("r.value", "r.error").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("pong:id=0", "pong:id=1", "pong:id=2"))
      assert(rows.forall(_.isNullAt(1)))
      val err = spark.sql(s"SELECT http_get('http://127.0.0.1:$port/boom').error")
        .collect().head.getString(0)
      assert(err.contains("HTTP 500"))
    }
  }
}
