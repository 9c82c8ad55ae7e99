package graft.remote

import java.io.FileInputStream
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/**
 * Mutual-TLS plumbing for the remote UDF wire — the JDK-native analogue of
 * the reference's Flight-over-gRPC channel security. A side builds its
 * [[SSLContext]] from two PKCS12 stores: its OWN key pair (identity) and the
 * peer certificates it trusts. [[UdfServer]] additionally requires a client
 * certificate (`setNeedClientAuth`), so both directions are authenticated
 * before the first protocol byte; the AUTH token verb composes on top for
 * caller-level identity.
 *
 * Certificates are ordinary PKCS12 keystores (e.g. from `keytool
 * -genkeypair` + `-exportcert`/`-importcert`); nothing here is
 * deployment-specific.
 */
object Tls {

  def loadKeyStore(path: String, password: Array[Char]): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(path)
    try ks.load(in, password) finally in.close()
    ks
  }

  /** Context presenting `identity` and trusting exactly `trusted`. */
  def context(identity: KeyStore, identityPassword: Array[Char],
              trusted: KeyStore): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(identity, identityPassword)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trusted)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  /** Trust-only context: a CLIENT verifying a server without presenting its
    * own certificate (one-way TLS — the Flight wire's default channel
    * security; the reference's `tls_root_certificates` client option). */
  def trustContext(trusted: KeyStore): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trusted)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Identity-only context: a SERVER presenting `identity` without
    * requesting client certificates (one-way TLS). */
  def identityContext(identity: KeyStore, identityPassword: Array[Char]): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(identity, identityPassword)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** In-memory trust store holding the X.509 certificate(s) in a PEM file —
    * the bridge between openssl/pyarrow-style PEM material and JDK stores. */
  def trustStoreFromPem(path: String): KeyStore = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = new FileInputStream(path)
    val certs = try cf.generateCertificates(in) finally in.close()
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    val it = certs.iterator()
    var i = 0
    while (it.hasNext) { ks.setCertificateEntry(s"cert$i", it.next()); i += 1 }
    ks
  }

}
