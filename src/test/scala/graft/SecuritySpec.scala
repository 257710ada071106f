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

  test("oauth2: client-credentials flow against the token-server fixture") {
    val srv = new graft.streaming.OAuth2Server(
      clientId = "cid", clientSecret = "csec").start()
    try {
      val cfg = OAuth2Config(clientId = "cid", clientSecret = "csec",
        tokenUrl = srv.tokenUrl, scopes = Seq("kafka.write"),
        audience = "brokers")
      val tok = Security.fetchOAuthToken(cfg, nowMs = 1000L)
        .fold(e => fail(s"fetch failed: $e"), identity)
      assert(tok.tokenType == "Bearer")
      assert(tok.expiresAtMs == 1000L + 7200L * 1000L)
      assert(srv.verify(tok.accessToken), "HS256 signature must verify")
      // aud claim carries the requested audience
      val payload = new String(java.util.Base64.getUrlDecoder.decode(
        tok.accessToken.split('.')(1)), "UTF-8")
      assert(payload.contains(""""aud":"brokers""""), payload)

      // wrong secret → invalid_client, surfaced as Left
      val bad = Security.fetchOAuthToken(cfg.copy(clientSecret = "nope"))
      assert(bad.isLeft && bad.left.exists(_.contains("invalid_client")))

      // provider reuse: two token() calls, one grant (the sarama
      // AccessTokenProvider reuse contract)
      var now = 10000L
      val provider = new Security.OAuthTokenProvider(cfg, clock = () => now)
      val t1 = provider.token(); val t2 = provider.token()
      assert(t1 == t2 && srv.issuedCount == 2, // 1 direct fetch above + 1 here
        s"reuse must not re-grant (issued=${srv.issuedCount})")
      // ...until expiry approaches
      now += 7200L * 1000L
      provider.token()
      assert(srv.issuedCount == 3)

      // discovery document advertises the token endpoint
      val conn = new java.net.URL(
        s"http://127.0.0.1:${srv.boundPort}/.well-known/openid-configuration")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val disc = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      assert(disc.contains(srv.tokenUrl))
    } finally srv.stop()
  }

  test("oauth2: OAUTHBEARER option rendering and mechanism validation") {
    val sec = SecurityConfig(sasl = SaslConfig(
      mechanism = Some(SaslMechanism.OAuth),
      oauth2 = OAuth2Config(clientId = "cid", clientSecret = "cs",
        tokenUrl = "https://idp/token", scopes = Seq("a", "b"))))
    val opts = Security.kafkaOptions(sec)
    assert(opts("kafka.sasl.mechanism") == "OAUTHBEARER")
    assert(opts("kafka.sasl.oauthbearer.token.endpoint.url") == "https://idp/token")
    assert(opts("kafka.sasl.login.callback.handler.class").contains("OAuthBearerLoginCallbackHandler"))
    val jaas = opts("kafka.sasl.jaas.config")
    assert(jaas.contains("OAuthBearerLoginModule required")
      && jaas.contains("""clientId="cid"""") && jaas.contains("""scope="a b""""), jaas)

    // incomplete oauth2 with the OAUTHBEARER mechanism → sasl.go Validate error
    assertThrows[IllegalArgumentException](Security.kafkaOptions(SecurityConfig(
      sasl = SaslConfig(mechanism = Some(SaslMechanism.OAuth)))))

    // oauth params with a non-OAUTHBEARER mechanism on the sink URI → options.go:521
    val b64 = java.util.Base64.getEncoder.encodeToString("cs".getBytes("UTF-8"))
    assertThrows[IllegalArgumentException](Security.fromUriParams(Map(
      "sasl-mechanism" -> "scram-sha-256", "sasl-oauth-client-id" -> "cid",
      "sasl-oauth-client-secret" -> b64, "sasl-oauth-token-url" -> "https://idp/token")))
    // ...and the check is on the merged state, not the param carrier: an
    // oauth2 block arriving via base config with a SCRAM mechanism errors
    // even when no sasl-oauth-* URI param is present (options.go checks
    // o.SASL.OAuth2.IsEnable() on the merged options)
    assertThrows[IllegalArgumentException](Security.fromUriParams(
      Map.empty,
      base = SecurityConfig(sasl = SaslConfig(
        mechanism = Some(SaslMechanism.Scram256),
        oauth2 = OAuth2Config(clientId = "cid", clientSecret = "cs",
          tokenUrl = "https://idp/token")))))
    // and WITH it, the params parse onto the config; the secret is
    // base64-decoded on ingest (options.go:498)
    val ok = Security.fromUriParams(Map(
      "sasl-mechanism" -> "oauthbearer", "sasl-oauth-client-id" -> "cid",
      "sasl-oauth-client-secret" -> b64, "sasl-oauth-token-url" -> "https://idp/token",
      "sasl-oauth-audience" -> "aud"))
    assert(ok.sasl.oauth2.clientId == "cid" && ok.sasl.oauth2.audience == "aud")
    assert(ok.sasl.oauth2.clientSecret == "cs", "secret base64-decoded on ingest")
    // a non-base64 secret is rejected, like the reference contract
    assertThrows[IllegalArgumentException](Security.fromUriParams(Map(
      "sasl-mechanism" -> "oauthbearer", "sasl-oauth-client-id" -> "cid",
      "sasl-oauth-client-secret" -> "not!base64%", "sasl-oauth-token-url" -> "https://idp/token")))
  }

  test("pulsar auth provider chain follows setupAuthentication order") {
    import Security.{PulsarConfig, PulsarOAuth2, pulsarOptions}
    val plugin = "pulsar.client.authPluginClassName"
    val params = "pulsar.client.authParams"

    // token beats everything (factory.go:96)
    val tokenFirst = PulsarConfig(
      authenticationToken = Some("tok"), tokenFromFile = Some("/f"),
      basicUserName = Some("u"), basicPassword = Some("p"))
    assert(pulsarOptions(tokenFirst)(params) == "token:tok")

    val fromFile = pulsarOptions(PulsarConfig(tokenFromFile = Some("/sec/token")))
    assert(fromFile(plugin).endsWith("AuthenticationToken")
      && fromFile(params) == "file:///sec/token")

    val basic = pulsarOptions(PulsarConfig(
      basicUserName = Some("usr"), basicPassword = Some("pwd")))
    assert(basic(plugin).endsWith("AuthenticationBasic")
      && basic(params).contains(""""userId":"usr""""))

    val oauth = pulsarOptions(PulsarConfig(oauth2 = Some(PulsarOAuth2(
      issuerUrl = "https://issuer", audience = "aud",
      privateKey = "/key.json", clientId = "cid"))))
    assert(oauth(plugin).endsWith("AuthenticationOAuth2"))
    assert(oauth(params).contains(""""type":"client_credentials""""))
    assert(oauth(params).contains(""""issuerUrl":"https://issuer""""))

    // incomplete oauth2 rejected (sink.go OAuth2.validate)
    intercept[IllegalArgumentException](pulsarOptions(
      PulsarConfig(oauth2 = Some(PulsarOAuth2(issuerUrl = "https://only")))))

    // mTLS is the last resort and REQUIRES trust certs (factory.go:57-62)
    intercept[IllegalArgumentException](pulsarOptions(PulsarConfig(
      authTlsCertificatePath = Some("/c.pem"), authTlsPrivateKeyPath = Some("/k.pem"))))
    val mtls = pulsarOptions(PulsarConfig(
      authTlsCertificatePath = Some("/c.pem"), authTlsPrivateKeyPath = Some("/k.pem"),
      tlsTrustCertsFilePath = Some("/trust.pem")))
    assert(mtls(plugin).endsWith("AuthenticationTls"))
    assert(mtls(params) == "tlsCertFile:/c.pem,tlsKeyFile:/k.pem")
    assert(mtls("pulsar.client.tlsTrustCertsFilePath") == "/trust.pem")

    // producer/client tuning carries through in connector units
    val tuned = pulsarOptions(PulsarConfig(
      compressionType = Some("zstd"), batchingMaxMessages = Some(500),
      batchingMaxPublishDelayMs = Some(10), sendTimeoutSec = Some(30)))
    assert(tuned("pulsar.producer.compressionType") == "ZSTD")
    assert(tuned("pulsar.producer.batchingMaxMessages") == "500")
    assert(tuned("pulsar.producer.batchingMaxPublishDelayMicros") == "10000")
    assert(tuned("pulsar.producer.sendTimeoutMs") == "30000")
    intercept[IllegalArgumentException](pulsarOptions(
      PulsarConfig(compressionType = Some("brotli"))))
  }

  test("pulsar config round-trips losslessly through TOML and v2 JSON") {
    import Security.{PulsarConfig, PulsarOAuth2}
    val pc = PulsarConfig(
      authenticationToken = Some("tok=abc"),
      tlsTrustCertsFilePath = Some("/trust.pem"),
      compressionType = Some("lz4"),
      producerCacheSize = Some(64),
      batchingMaxMessages = Some(1000),
      batchingMaxPublishDelayMs = Some(10),
      sendTimeoutSec = Some(30),
      connectionTimeoutSec = Some(5),
      operationTimeoutSec = Some(30),
      oauth2 = Some(PulsarOAuth2(
        issuerUrl = "https://issuer", audience = "aud", scope = "produce",
        privateKey = "/key.json", clientId = "cid")),
      outputRawChangeEvent = true)
    val cfg = graft.model.ChangefeedConfig(id = "pulsar-cf",
      sink = graft.model.SinkConfig(pulsarConfig = Some(pc)))

    val viaToml = graft.model.ConfigToml.toConfig(
      graft.model.ConfigToml.parse(graft.model.ConfigToml.renderToml(cfg)), "pulsar-cf")
    assert(viaToml.sink.pulsarConfig.contains(pc), s"toml: ${viaToml.sink.pulsarConfig}")

    val viaJson = graft.model.ConfigToml.fromApiJson(
      graft.model.ConfigToml.toApiJson(cfg))
    assert(viaJson.sink.pulsarConfig.contains(pc), s"json: ${viaJson.sink.pulsarConfig}")

    // masking (sink.go:682-693): token, basic password, oauth2 key
    val m = Security.maskedPulsar(pc.copy(basicPassword = Some("pw")))
    assert(m.authenticationToken.contains("******"))
    assert(m.basicPassword.contains("******"))
    assert(m.oauth2.get.privateKey == "******")
    assert(m.tlsTrustCertsFilePath == pc.tlsTrustCertsFilePath, "non-secrets unchanged")
  }
}
