package graft

import graft.remote.Tls
import graft.remote.flight.{FlightClient, FlightServer}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/**
 * TLS on the Flight wire, both directions — the reference's channel-security
 * deployment shape (`UdfServer` with `tls_certificates`, clients with
 * `tls_root_certificates`). gRPC requires ALPN `h2` on TLS connections, so
 * these tests also pin the JDK-side ALPN negotiation against grpc-core.
 */
class FlightTlsSpec extends AnyFunSuite {

  private def sh(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"${cmd.head} failed: $out")
  }

  /** Self-signed cert + key PEM (SAN IP:127.0.0.1 — both grpc-core and the
    * JDK's endpoint identification verify the dialed address against it)
    * plus a PKCS12 bundle for the JVM server identity. */
  private lazy val certDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_flight_tls").toString
    sh("openssl", "req", "-x509", "-newkey", "rsa:2048",
      "-keyout", s"$dir/key.pem", "-out", s"$dir/cert.pem",
      "-days", "2", "-nodes", "-subj", "/CN=127.0.0.1",
      "-addext", "subjectAltName=IP:127.0.0.1")
    sh("openssl", "pkcs12", "-export", "-out", s"$dir/server.p12",
      "-inkey", s"$dir/key.pem", "-in", s"$dir/cert.pem",
      "-passout", "pass:changeit")
    dir
  }

  test("outbound TLS: graft client -> pyarrow grpc+tls server (ALPN h2)") {
    val script = new java.io.File(sys.props("user.dir"), "tools/flightudf_server.py")
    val proc = new ProcessBuilder("python3", script.getAbsolutePath, "--tls", certDir)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    try {
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream))
      val line = br.readLine()
      assert(line != null && line.startsWith("PORT "), s"fixture failed: $line")
      val port = line.stripPrefix("PORT ").trim.toInt
      val trust = Tls.trustContext(Tls.trustStoreFromPem(s"$certDir/cert.pem"))
      val c = new FlightClient("127.0.0.1", port, tls = Some(trust))
      try {
        assert(c.protocolVersion() == 2)
        assert(c.call("flight_gcd", Seq(IntegerType, IntegerType),
          Seq(Seq(54, 24), Seq(null, 5))) == Seq(6, null))
      } finally c.close()
      // a PLAINTEXT client against the TLS listener must fail the preface,
      // never silently downgrade
      intercept[java.io.IOException] {
        val plain = new FlightClient("127.0.0.1", port)
        try plain.protocolVersion() finally plain.close()
      }
    } finally proc.destroy()
  }

  test("inbound TLS: pyarrow grpc+tls client -> graft FlightServer (ALPN h2)") {
    graft.functions.Builtins.ensureRegistered()
    val identity = Tls.identityContext(
      Tls.loadKeyStore(s"$certDir/server.p12", "changeit".toCharArray),
      "changeit".toCharArray)
    val server = new FlightServer(tls = Some(identity))
    try {
      val script = new java.io.File(sys.props("user.dir"), "tools/flight_client_probe.py")
      val proc = new ProcessBuilder("python3", script.getAbsolutePath,
        server.boundPort.toString, "--tls", s"$certDir/cert.pem")
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      assert(rc == 0, s"probe exited $rc:\n$out")
      val lines = out.linesIterator.toSeq
      assert(lines.contains("VERSION 02"))
      assert(lines.exists(_.startsWith("GCD {'value': [4, 6, None]}")))
      assert(lines.contains("GCD50K True"))
      assert(lines.contains("DONE"))
    } finally server.close()
  }
}
