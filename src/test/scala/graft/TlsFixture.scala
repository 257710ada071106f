package graft

import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** Test-time certificate authority mirroring the reference suite's
  * tests/integration_tests/_certificates fixture: a CA, a server cert
  * for 127.0.0.1, a client cert with CN=client, a client cert with a
  * disallowed CN, and a rogue client signed by an unrelated CA.
  * Generated once per JVM with the system openssl (PKCS#8 keys, the
  * shape Tls.loadPrivateKey consumes). */
object TlsFixture {

  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-tls").toString
    def sh(cmd: Seq[String]): Unit = {
      val rc = Process(cmd, new java.io.File(d)).!(ProcessLogger(_ => (), _ => ()))
      require(rc == 0, s"openssl failed: ${cmd.mkString(" ")}")
    }
    def genKey(name: String): Unit =
      sh(Seq("openssl", "genpkey", "-algorithm", "RSA",
        "-pkeyopt", "rsa_keygen_bits:2048", "-out", s"$name-key.pem"))
    def selfSignedCa(name: String, cn: String): Unit = {
      genKey(name)
      sh(Seq("openssl", "req", "-x509", "-new", "-key", s"$name-key.pem",
        "-days", "2", "-subj", s"/CN=$cn", "-out", s"$name.pem"))
    }
    def signed(name: String, cn: String, ca: String,
               san: Option[String] = None): Unit = {
      genKey(name)
      sh(Seq("openssl", "req", "-new", "-key", s"$name-key.pem",
        "-subj", s"/CN=$cn", "-out", s"$name.csr"))
      val ext = san.map { s =>
        val p = Paths.get(d, s"$name.ext")
        Files.writeString(p, s"subjectAltName=$s\n")
        Seq("-extfile", p.toString)
      }.getOrElse(Seq.empty)
      sh(Seq("openssl", "x509", "-req", "-in", s"$name.csr",
        "-CA", s"$ca.pem", "-CAkey", s"$ca-key.pem", "-CAcreateserial",
        "-days", "2", "-out", s"$name.pem") ++ ext)
    }
    selfSignedCa("ca", "graft-test-ca")
    signed("server", "127.0.0.1", "ca", san = Some("IP:127.0.0.1"))
    signed("client", "client", "ca")
    signed("client-other", "other-user", "ca")
    selfSignedCa("rogue-ca", "rogue-ca")
    signed("rogue-client", "client", "rogue-ca")
    d
  }

  def p(name: String): String = Paths.get(dir, name).toString

  def serverCredential(allowedCN: Seq[String] = Seq("client")) =
    graft.model.Security.Credential(
      caPath = p("ca.pem"), certPath = p("server.pem"),
      keyPath = p("server-key.pem"), certAllowedCN = allowedCN, mtls = true)

  def clientCredential(cert: String = "client.pem",
                       key: String = "client-key.pem",
                       ca: String = "ca.pem") =
    graft.model.Security.Credential(
      caPath = p(ca), certPath = p(cert), keyPath = p(key))
}
