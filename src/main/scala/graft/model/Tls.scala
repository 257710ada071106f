package graft.model

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.{KeyFactory, KeyStore, PrivateKey, SecureRandom}
import java.security.spec.PKCS8EncodedKeySpec
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS material loading + context construction from the reference's
  * PEM-file credential (pkg/security/credential.go:106-153: ca-path /
  * cert-path / key-path, cert-allowed-cn, mtls) — the server side of
  * http_api_tls / cli_tls_with_auth and the client side the CLI's
  * --ca/--cert/--key flags feed.
  *
  * The JDK has no PEM loader, so this parses the two shapes the
  * reference's certificate fixtures use: X.509 certificates (the
  * CertificateFactory consumes PEM directly) and PKCS#8 private keys
  * ("BEGIN PRIVATE KEY" blocks; RSA and EC both tried, mirroring how
  * Go's tls.LoadX509KeyPair is algorithm-agnostic).
  */
object Tls {

  def loadCertificates(path: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    val in = new ByteArrayInputStream(Files.readAllBytes(Paths.get(path)))
    try {
      import scala.jdk.CollectionConverters._
      cf.generateCertificates(in).asScala.toSeq.map(_.asInstanceOf[X509Certificate])
    } finally in.close()
  }

  def loadPrivateKey(path: String): PrivateKey = {
    val pem = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    require(pem.contains("BEGIN PRIVATE KEY"),
      s"$path: expected a PKCS#8 'BEGIN PRIVATE KEY' block")
    val der = java.util.Base64.getDecoder.decode(body)
    val spec = new PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC").view.flatMap { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: Exception => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException(s"$path: not an RSA or EC PKCS#8 key"))
  }

  private def trustStoreOf(caPath: String): KeyStore = {
    val ts = KeyStore.getInstance(KeyStore.getDefaultType)
    ts.load(null, null)
    loadCertificates(caPath).zipWithIndex.foreach { case (c, i) =>
      ts.setCertificateEntry(s"ca-$i", c)
    }
    ts
  }

  /** SSLContext from a full PEM credential (ca + cert + key). Used on
    * both sides: the server's identity + client-cert trust, and the
    * CLI's client identity + server trust. */
  def sslContext(cred: Security.Credential): SSLContext = {
    require(cred.isTlsEnabled, "ca, cert and key files should all be supplied")
    val pw = Array.emptyCharArray
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    ks.setKeyEntry("key", loadPrivateKey(cred.keyPath), pw,
      loadCertificates(cred.certPath).toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trustStoreOf(cred.caPath))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, new SecureRandom())
    ctx
  }

  /** Server-side SSLContext: the credential's identity, trusting the
    * CA for client certs, with the cert-allowed-cn check enforced AT
    * HANDSHAKE (credential.go:189 ToTLSConfigWithVerify wires
    * VerifyPeerCertificate to check the leaf CN against the allowed
    * list) — a disallowed client never reaches a handler. */
  def serverSslContext(cred: Security.Credential): SSLContext = {
    val base = sslContext(cred)
    if (cred.certAllowedCN.isEmpty) base
    else {
      val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(trustStoreOf(cred.caPath))
      val wrapped = tmf.getTrustManagers.map {
        case x: javax.net.ssl.X509TrustManager =>
          new javax.net.ssl.X509TrustManager {
            override def checkClientTrusted(chain: Array[X509Certificate],
                                            authType: String): Unit = {
              x.checkClientTrusted(chain, authType)
              val cn = commonName(chain(0))
              if (!cn.exists(cred.certAllowedCN.contains))
                throw new java.security.cert.CertificateException(
                  s"client certificate CN '${cn.getOrElse("")}' is not allowed " +
                    s"(allowed: ${cred.certAllowedCN.mkString(",")})")
            }
            override def checkServerTrusted(chain: Array[X509Certificate],
                                            authType: String): Unit =
              x.checkServerTrusted(chain, authType)
            override def getAcceptedIssuers: Array[X509Certificate] =
              x.getAcceptedIssuers
          }
        case t => t
      }
      val pw = Array.emptyCharArray
      val ks = KeyStore.getInstance(KeyStore.getDefaultType)
      ks.load(null, null)
      ks.setKeyEntry("key", loadPrivateKey(cred.keyPath), pw,
        loadCertificates(cred.certPath).toArray)
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, pw)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kmf.getKeyManagers, wrapped, new SecureRandom())
      ctx
    }
  }

  /** Common-name of a certificate subject (verifyCommonName,
    * credential.go:214-231 checks the leaf cert's CN against
    * cert-allowed-cn). */
  def commonName(cert: X509Certificate): Option[String] = {
    val dn = cert.getSubjectX500Principal.getName // RFC 2253
    dn.split(",").map(_.trim).collectFirst {
      case kv if kv.startsWith("CN=") => kv.stripPrefix("CN=")
    }
  }
}
