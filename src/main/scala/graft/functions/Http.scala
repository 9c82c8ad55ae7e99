package graft.functions

/**
 * HTTP access from UDFs — the engine's analogue of the reference's optional
 * JS `fetch()` API (`arrow-udf-runtime/src/javascript/fetch/mod.rs:35-119`),
 * re-expressed as a plain scalar function executing on the executors.
 *
 * Deliberately OFF by default (same posture as the reference's feature flag):
 * a UDF that performs network IO breaks determinism, retries, and speculative
 * execution assumptions, so the user must opt in explicitly via
 * `Http.register()` before installing graft into the session. Calls are
 * fallible — failures surface through the error column, never as task
 * failures. One `HttpClient` per executor JVM (instance-pool pattern), with a
 * per-call timeout (the reference's JS deadline limit).
 */
object Http {

  @volatile private var registered = false

  /** Opt-in registration of `http_get(url) -> struct<value, error>`. */
  def register(timeoutMillis: Long = 10000L): Unit = synchronized {
    if (registered) return
    registered = true
    val t = timeoutMillis
    Udf.fallible1[String, String]("http_get(string) -> string") { url =>
      val client = Http.pooledClient
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(t))
        .GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new RuntimeException(s"HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  @transient private lazy val pooledClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5))
      .build()
}
