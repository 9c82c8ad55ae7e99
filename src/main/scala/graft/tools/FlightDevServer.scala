package graft.tools

/** Dev harness: start graft's Flight server on loopback and block, printing
  * `PORT <n>` — lets external Flight clients (pyarrow probes, reference
  * clients) be driven against the server outside the test suite. */
object FlightDevServer {
  def main(args: Array[String]): Unit = {
    graft.functions.Builtins.ensureRegistered()
    val server = new graft.remote.flight.FlightServer()
    println(s"PORT ${server.boundPort}")
    Console.flush()
    Thread.sleep(Long.MaxValue)
  }
}
