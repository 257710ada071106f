package graft

import graft.model.{ConfigToml, ChangefeedConfig, Security}
import graft.model.Security._
import org.scalatest.funsuite.AnyFunSuite

/** Security config surface (VERDICT r5 item #3): mTLS credential +
  * SASL/SCRAM modeled after pkg/security/credential.go + sasl.go,
  * lossless through both config carriers (TOML and v2-API JSON), the
  * sink-URI merge rules of kafka/options.go:395-440, and the
  * projection onto Spark Kafka connector options. */
class SecuritySpec extends AnyFunSuite {

  private val full = SecurityConfig(
    enableTls = true,
    insecureSkipVerify = true,
    credential = Credential(
      caPath = "/certs/ca.pem", certPath = "/certs/cert.pem", keyPath = "/certs/key.pem",
      certAllowedCN = Seq("cdc-client"), mtls = true,
      clientUserRequired = true, clientAllowedUser = Seq("ticdc", "admin")),
    sasl = SaslConfig(
      user = "scram-user", password = "s3cr=t\"quote",
      mechanism = Some(SaslMechanism.Scram512),
      gssapi = GssapiConfig(authType = "user", serviceName = "kafka",
        user = "krb-user", password = "krb-pass", realm = "EXAMPLE.COM"),
      oauth2 = OAuth2Config(clientId = "cid", clientSecret = "csecret",
        tokenUrl = "https://idp.example.com/token", scopes = Seq("kafka.write"))))

  test("TOML round-trip is lossless for the security block") {
    val cfg = ChangefeedConfig(id = "sec-feed", security = full)
    val toml = ConfigToml.renderToml(cfg)
    assert(toml.contains("[security]") && toml.contains("[sink.kafka-config]"))
    val back = ConfigToml.toConfig(ConfigToml.parse(toml), "sec-feed")
    assert(back.security == full)
  }

  test("v2 JSON round-trip is lossless for the security block") {
    val cfg = ChangefeedConfig(id = "sec-feed", security = full)
    val back = ConfigToml.fromApiJson(ConfigToml.toApiJson(cfg))
    assert(back.security == full)
    // default security stays absent from the JSON
    assert(!ConfigToml.toApiJson(ChangefeedConfig(id = "x")).contains("security"))
  }

  test("sink-URI merge rules (options.go:395-440)") {
    // credential files imply TLS without enable-tls
    val implied = Security.fromUriParams(Map(
      "ca" -> "/ca.pem", "cert" -> "/c.pem", "key" -> "/k.pem"))
    assert(implied.enableTls && implied.credential.isTlsEnabled)
    // partial credential → error
    assertThrows[IllegalArgumentException] {
      Security.fromUriParams(Map("ca" -> "/ca.pem"))
    }
    // credentials + enable-tls=false → error
    assertThrows[IllegalArgumentException] {
      Security.fromUriParams(Map(
        "ca" -> "/ca.pem", "cert" -> "/c.pem", "key" -> "/k.pem", "enable-tls" -> "false"))
    }
    // insecure-skip-verify honored only when TLS on
    assert(!Security.fromUriParams(Map("insecure-skip-verify" -> "true")).insecureSkipVerify)
    assert(Security.fromUriParams(Map(
      "enable-tls" -> "true", "insecure-skip-verify" -> "true")).insecureSkipVerify)
    // SASL params parse + unknown mechanism rejected like the reference
    val s = Security.fromUriParams(Map(
      "sasl-user" -> "u", "sasl-password" -> "p", "sasl-mechanism" -> "scram-sha-256"))
    assert(s.sasl.mechanism.contains(SaslMechanism.Scram256) && s.sasl.user == "u")
    assertThrows[IllegalArgumentException] {
      Security.fromUriParams(Map("sasl-mechanism" -> "bogus"))
    }
  }

  test("kafka option map: protocol matrix, JAAS, PEM, identification") {
    def proto(sec: SecurityConfig) = Security.kafkaOptions(sec)("kafka.security.protocol")
    assert(proto(SecurityConfig()) == "PLAINTEXT")
    assert(proto(SecurityConfig(enableTls = true)) == "SSL")
    assert(proto(SecurityConfig(sasl = SaslConfig(mechanism = Some(SaslMechanism.Plain))))
      == "SASL_PLAINTEXT")
    assert(proto(full) == "SASL_SSL")
    val opts = Security.kafkaOptions(full)
    assert(opts("kafka.sasl.mechanism") == "SCRAM-SHA-512")
    val jaas = opts("kafka.sasl.jaas.config")
    assert(jaas.contains("ScramLoginModule required"))
    assert(jaas.contains("""username="scram-user""""))
    assert(jaas.contains("""password="s3cr=t\"quote""""), "quote escaped for JAAS")
    assert(opts("kafka.ssl.truststore.type") == "PEM")
    assert(opts("kafka.ssl.truststore.location") == "/certs/ca.pem")
    assert(opts("kafka.ssl.endpoint.identification.algorithm") == "",
      "insecure-skip-verify disables hostname verification")
    val plain = Security.kafkaOptions(SecurityConfig(
      sasl = SaslConfig(user = "u", password = "p", mechanism = Some(SaslMechanism.Plain))))
    assert(plain("kafka.sasl.jaas.config").contains("PlainLoginModule required"))
  }

  test("masking hides every secret, like MaskSensitiveData") {
    val m = Security.masked(full)
    assert(m.sasl.password == "******")
    assert(m.sasl.gssapi.password == "******")
    assert(m.sasl.oauth2.clientSecret == "******")
    assert(m.sasl.user == full.sasl.user, "non-secrets unchanged")
    assert(Security.masked(SecurityConfig()).sasl.password == "")
  }
}
