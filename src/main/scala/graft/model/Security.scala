package graft.model

/** Security configuration surface — the reference's
  * pkg/security/credential.go:106-153 (mTLS credential),
  * pkg/security/sasl.go (SASL mechanisms incl. SCRAM/GSSAPI/OAuth2)
  * and the kafka sink-URI security parameters
  * (pkg/sink/kafka/options.go:110-139 urlConfig, :395-440 TLS merge
  * rules), as plain Scala data plus the option-map projection Spark's
  * Kafka connector consumes.
  */
object Security {

  /** TLS credential (credential.go:106-129; toml tags preserved). */
  final case class Credential(
      caPath: String = "",
      certPath: String = "",
      keyPath: String = "",
      certAllowedCN: Seq[String] = Nil,
      mtls: Boolean = false,
      clientUserRequired: Boolean = false,
      clientAllowedUser: Seq[String] = Nil) {
    /** credential.go:147 IsTLSEnabled: all three files present. */
    def isTlsEnabled: Boolean = caPath.nonEmpty && certPath.nonEmpty && keyPath.nonEmpty
    /** credential.go:152 IsEmpty. */
    def isEmpty: Boolean = caPath.isEmpty && certPath.isEmpty && keyPath.isEmpty
  }

  /** SASL mechanisms (sasl.go:27-40). */
  sealed abstract class SaslMechanism(val name: String)
  object SaslMechanism {
    case object Plain extends SaslMechanism("PLAIN")
    case object Scram256 extends SaslMechanism("SCRAM-SHA-256")
    case object Scram512 extends SaslMechanism("SCRAM-SHA-512")
    case object Gssapi extends SaslMechanism("GSSAPI")
    case object OAuth extends SaslMechanism("OAUTHBEARER")

    /** sasl.go:42-58 SASLMechanismFromString (lower-case match,
      * unknown → error). */
    def fromString(s: String): SaslMechanism = s.toLowerCase match {
      case "plain" => Plain
      case "scram-sha-256" => Scram256
      case "scram-sha-512" => Scram512
      case "gssapi" => Gssapi
      case "oauthbearer" => OAuth
      case other => throw new IllegalArgumentException(s"unknown $other SASL mechanism")
    }
  }

  /** OAuth2 parameters (sasl.go:70-97; grant type defaults to
    * client_credentials). */
  final case class OAuth2Config(
      clientId: String = "",
      clientSecret: String = "",
      tokenUrl: String = "",
      scopes: Seq[String] = Nil,
      grantType: String = "client_credentials",
      audience: String = "") {
    def isEnabled: Boolean = clientId.nonEmpty || clientSecret.nonEmpty || tokenUrl.nonEmpty
    /** sasl.go:80-91 Validate. */
    def validate(): Unit = {
      require(clientId.nonEmpty, "OAuth2 client id is empty")
      require(clientSecret.nonEmpty, "OAuth2 client secret is empty")
      require(tokenUrl.nonEmpty, "OAuth2 token url is empty")
    }
  }

  /** GSSAPI parameters (sasl.go:104-170; config surface only — no
    * Kerberos stack in the sandbox). */
  final case class GssapiConfig(
      authType: String = "",
      keytabPath: String = "",
      kerberosConfigPath: String = "",
      serviceName: String = "",
      user: String = "",
      password: String = "",
      realm: String = "",
      disablePafxfast: Boolean = false)

  /** SASL block (sasl.go:61-67). */
  final case class SaslConfig(
      user: String = "",
      password: String = "",
      mechanism: Option[SaslMechanism] = None,
      gssapi: GssapiConfig = GssapiConfig(),
      oauth2: OAuth2Config = OAuth2Config()) {
    def isEnabled: Boolean = mechanism.isDefined
  }

  /** Merged sink security (kafka options.go `options`): the outcome
    * of URI params + config, after the TLS inference rules. */
  final case class SecurityConfig(
      enableTls: Boolean = false,
      insecureSkipVerify: Boolean = false,
      credential: Credential = Credential(),
      sasl: SaslConfig = SaslConfig()) {
    def isEmpty: Boolean = !enableTls && !insecureSkipVerify &&
      credential.isEmpty && !sasl.isEnabled
  }

  /** Apply the sink-URI security query parameters with the reference's
    * merge rules (options.go:395-440):
    *  - partial credential (some of ca/cert/key) → error
    *  - credentials present + `enable-tls=false` → error
    *  - credentials present + enable-tls unset → TLS on
    *  - `insecure-skip-verify` honored only when TLS is on
    */
  def fromUriParams(params: Map[String, String],
                    base: SecurityConfig = SecurityConfig()): SecurityConfig = {
    def p(k: String): Option[String] = params.get(k).filter(_.nonEmpty)
    val cred = base.credential.copy(
      caPath = p("ca").getOrElse(base.credential.caPath),
      certPath = p("cert").getOrElse(base.credential.certPath),
      keyPath = p("key").getOrElse(base.credential.keyPath))
    if (!cred.isEmpty && !cred.isTlsEnabled)
      throw new IllegalArgumentException("ca, cert and key files should all be supplied")
    val enableTlsParam = p("enable-tls").map(_.toBoolean)
    val enableTls = enableTlsParam match {
      case Some(false) if cred.isTlsEnabled =>
        throw new IllegalArgumentException(
          "credential files are supplied, but 'enable-tls' is set to false")
      case Some(v) => v
      case None => cred.isTlsEnabled || base.enableTls
    }
    val sasl = base.sasl.copy(
      user = p("sasl-user").getOrElse(base.sasl.user),
      password = p("sasl-password").getOrElse(base.sasl.password),
      mechanism = p("sasl-mechanism").map(SaslMechanism.fromString)
        .orElse(base.sasl.mechanism),
      gssapi = base.sasl.gssapi.copy(
        authType = p("sasl-gssapi-auth-type").getOrElse(base.sasl.gssapi.authType),
        keytabPath = p("sasl-gssapi-keytab-path").getOrElse(base.sasl.gssapi.keytabPath),
        kerberosConfigPath = p("sasl-gssapi-kerberos-config-path")
          .getOrElse(base.sasl.gssapi.kerberosConfigPath),
        serviceName = p("sasl-gssapi-service-name").getOrElse(base.sasl.gssapi.serviceName),
        user = p("sasl-gssapi-user").getOrElse(base.sasl.gssapi.user),
        password = p("sasl-gssapi-password").getOrElse(base.sasl.gssapi.password),
        realm = p("sasl-gssapi-realm").getOrElse(base.sasl.gssapi.realm),
        disablePafxfast = p("sasl-gssapi-disable-pafxfast").map(_.toBoolean)
          .getOrElse(base.sasl.gssapi.disablePafxfast)),
      oauth2 = base.sasl.oauth2.copy(
        clientId = p("sasl-oauth-client-id").getOrElse(base.sasl.oauth2.clientId),
        // the reference base64-decodes the configured secret
        // (options.go:498 applyOAuth: DecodeString, error on non-base64)
        clientSecret = p("sasl-oauth-client-secret").map { enc =>
          try new String(java.util.Base64.getDecoder.decode(enc), "UTF-8")
          catch {
            case _: IllegalArgumentException => throw new IllegalArgumentException(
              "OAuth2 client secret is not base64 encoded")
          }
        }.getOrElse(base.sasl.oauth2.clientSecret),
        tokenUrl = p("sasl-oauth-token-url").getOrElse(base.sasl.oauth2.tokenUrl),
        scopes = p("sasl-oauth-scopes").map(_.split(",").toSeq)
          .getOrElse(base.sasl.oauth2.scopes),
        grantType = p("sasl-oauth-grant-type").getOrElse(base.sasl.oauth2.grantType),
        audience = p("sasl-oauth-audience").getOrElse(base.sasl.oauth2.audience)))
    // An enabled OAuth2 block demands the OAUTHBEARER mechanism no matter
    // which carrier configured it (options.go:521 checks the merged state,
    // not just URI params).
    if (sasl.oauth2.isEnabled && !sasl.mechanism.contains(SaslMechanism.OAuth))
      throw new IllegalArgumentException(
        s"OAuth2 is only supported with SASL mechanism type OAUTHBEARER, " +
          s"but got ${sasl.mechanism.map(_.name).getOrElse("")}")
    SecurityConfig(
      enableTls = enableTls,
      insecureSkipVerify =
        enableTls && p("insecure-skip-verify").exists(_.toBoolean),
      credential = cred,
      sasl = sasl)
  }

  /** Kafka client options for Spark's connector (`kafka.`-prefixed —
    * DataStreamWriter passes them to the Kafka client verbatim):
    * security.protocol from the TLS×SASL matrix, JAAS config for
    * PLAIN/SCRAM, PEM file options for the reference's ca/cert/key
    * paths (Kafka 2.7+ `ssl.*.type=PEM`). */
  def kafkaOptions(sec: SecurityConfig): Map[String, String] = {
    val protocol = (sec.enableTls, sec.sasl.isEnabled) match {
      case (true, true) => "SASL_SSL"
      case (true, false) => "SSL"
      case (false, true) => "SASL_PLAINTEXT"
      case (false, false) => "PLAINTEXT"
    }
    val base = Map("kafka.security.protocol" -> protocol)
    val tls: Map[String, String] =
      if (!sec.enableTls) Map.empty
      else {
        val files =
          if (sec.credential.isTlsEnabled) Map(
            "kafka.ssl.truststore.type" -> "PEM",
            "kafka.ssl.truststore.location" -> sec.credential.caPath,
            "kafka.ssl.keystore.type" -> "PEM",
            "kafka.ssl.keystore.location" -> sec.credential.certPath,
            "kafka.ssl.key.location" -> sec.credential.keyPath)
          else Map.empty[String, String]
        val verify =
          if (sec.insecureSkipVerify)
            Map("kafka.ssl.endpoint.identification.algorithm" -> "")
          else Map.empty[String, String]
        files ++ verify
      }
    val sasl: Map[String, String] = sec.sasl.mechanism match {
      case None => Map.empty
      case Some(m) =>
        def jaasEscape(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
        val jaas = m match {
          case SaslMechanism.Plain =>
            Some("org.apache.kafka.common.security.plain.PlainLoginModule required " +
              s"""username="${jaasEscape(sec.sasl.user)}" password="${jaasEscape(sec.sasl.password)}";""")
          case SaslMechanism.Scram256 | SaslMechanism.Scram512 =>
            Some("org.apache.kafka.common.security.scram.ScramLoginModule required " +
              s"""username="${jaasEscape(sec.sasl.user)}" password="${jaasEscape(sec.sasl.password)}";""")
          case SaslMechanism.OAuth =>
            val o = sec.sasl.oauth2
            o.validate()
            val scope = if (o.scopes.nonEmpty)
              s""" scope="${jaasEscape(o.scopes.mkString(" "))}"""" else ""
            Some("org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required " +
              s"""clientId="${jaasEscape(o.clientId)}" clientSecret="${jaasEscape(o.clientSecret)}"$scope;""")
          case _ => None // GSSAPI needs krb5 config beyond options
        }
        val oauthEndpoint = m match {
          // the Kafka client's own client-credentials provider — the
          // tokenProvider role (oauth2_token_provider.go:55-85) runs
          // inside the connector via the login callback handler
          case SaslMechanism.OAuth => Map(
            "kafka.sasl.oauthbearer.token.endpoint.url" -> sec.sasl.oauth2.tokenUrl,
            // the un-"secured" package location: present since Kafka 3.2,
            // the secured.* alias was removed in kafka-clients 4.0
            "kafka.sasl.login.callback.handler.class" ->
              "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginCallbackHandler")
          case _ => Map.empty[String, String]
        }
        Map("kafka.sasl.mechanism" -> m.name) ++
          jaas.map("kafka.sasl.jaas.config" -> _) ++ oauthEndpoint
    }
    base ++ tls ++ sasl
  }

  // ---- OAuth2 client-credentials token source
  //      (pkg/sink/kafka/oauth2_token_provider.go) ----

  final case class OAuthToken(accessToken: String, tokenType: String, expiresAtMs: Long)

  /** One client-credentials grant against `tokenUrl`
    * (oauth2_token_provider.go:55-85: grant_type and audience ride as
    * endpoint params, scopes space-join). Left(error body) on a
    * non-200. */
  def fetchOAuthToken(o: OAuth2Config,
                      nowMs: Long = System.currentTimeMillis()): Either[String, OAuthToken] = {
    o.validate()
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val form = Seq(
      "grant_type" -> (if (o.grantType.nonEmpty) o.grantType else "client_credentials"),
      "client_id" -> o.clientId,
      "client_secret" -> o.clientSecret) ++
      (if (o.audience.nonEmpty) Seq("audience" -> o.audience) else Nil) ++
      (if (o.scopes.nonEmpty) Seq("scope" -> o.scopes.mkString(" ")) else Nil)
    val body = form.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val conn = new java.net.URL(o.tokenUrl).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    // the sarama AccessTokenProvider contract forbids blocking
    // indefinitely; token() holds a lock across this fetch, so a hung
    // IdP must time out rather than wedge every caller
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(body.getBytes("UTF-8")) finally os.close()
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val resp = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    if (code != 200) Left(resp)
    else {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(resp)
      Right(OAuthToken(
        accessToken = n.get("access_token").asText(),
        tokenType = Option(n.get("token_type")).map(_.asText()).getOrElse("Bearer"),
        expiresAtMs = nowMs +
          Option(n.get("expires_in")).map(_.asLong()).getOrElse(3600L) * 1000L))
    }
  }

  /** Token source with reuse — the sarama AccessTokenProvider
    * contract ("ensure token reuse so that multiple calls at connect
    * time do not create multiple tokens", oauth2_token_provider.go:
    * 34-41): a cached token serves until 60s before expiry. */
  final class OAuthTokenProvider(o: OAuth2Config,
                                 clock: () => Long = () => System.currentTimeMillis()) {
    o.validate()
    @volatile private var cached: Option[OAuthToken] = None
    def token(): OAuthToken = synchronized {
      val now = clock()
      cached.filter(_.expiresAtMs - 60000L > now).getOrElse {
        val t = fetchOAuthToken(o, now) match {
          case Right(tok) => tok
          case Left(err) => throw new IllegalStateException(s"oauth2 token fetch failed: $err")
        }
        cached = Some(t)
        t
      }
    }
  }

  /** Masked copy for logs/API echoes (sink.go:509-525
    * MaskSensitiveData). */
  def masked(sec: SecurityConfig): SecurityConfig =
    sec.copy(sasl = sec.sasl.copy(
      password = if (sec.sasl.password.nonEmpty) "******" else "",
      gssapi = sec.sasl.gssapi.copy(
        password = if (sec.sasl.gssapi.password.nonEmpty) "******" else ""),
      oauth2 = sec.sasl.oauth2.copy(
        clientSecret = if (sec.sasl.oauth2.clientSecret.nonEmpty) "******" else "")))

  // ---- Pulsar sink client surface (pkg/config/sink.go:606-672
  //      PulsarConfig + pkg/sink/pulsar/factory.go:95
  //      setupAuthentication) ----

  /** Pulsar OAuth2 block (sink.go OAuth2: issuer-url, audience,
    * scope, private-key, client-id; grant type is always
    * client_credentials). */
  final case class PulsarOAuth2(
      issuerUrl: String = "", audience: String = "", scope: String = "",
      privateKey: String = "", clientId: String = "") {
    def isEnabled: Boolean =
      issuerUrl.nonEmpty || audience.nonEmpty || clientId.nonEmpty || privateKey.nonEmpty
    /** sink.go OAuth2.validate: all four non-scope fields required. */
    def validate(): Unit =
      if (isEnabled)
        require(issuerUrl.nonEmpty && audience.nonEmpty &&
          privateKey.nonEmpty && clientId.nonEmpty,
          "pulsar oauth2 requires oauth2-issuer-url, oauth2-audience, " +
            "oauth2-private-key and oauth2-client-id")
  }

  /** `[sink.pulsar-config]` (sink.go:606-672 toml tags). Client/
    * producer tuning carries through to the connector; the auth
    * fields feed [[pulsarOptions]]'s provider chain. */
  final case class PulsarConfig(
      authenticationToken: Option[String] = None,
      tokenFromFile: Option[String] = None,
      basicUserName: Option[String] = None,
      basicPassword: Option[String] = None,
      oauth2: Option[PulsarOAuth2] = None,
      authTlsCertificatePath: Option[String] = None,
      authTlsPrivateKeyPath: Option[String] = None,
      tlsTrustCertsFilePath: Option[String] = None,
      tlsCertificateFile: Option[String] = None,
      tlsKeyFilePath: Option[String] = None,
      compressionType: Option[String] = None, // lz4 | zlib | zstd
      producerCacheSize: Option[Int] = None,
      batchingMaxMessages: Option[Int] = None,
      batchingMaxPublishDelayMs: Option[Long] = None,
      sendTimeoutSec: Option[Long] = None,
      connectionTimeoutSec: Option[Long] = None,
      operationTimeoutSec: Option[Long] = None,
      outputRawChangeEvent: Boolean = false) {
    def isEmpty: Boolean = this == PulsarConfig()
    def validate(): Unit = {
      oauth2.foreach(_.validate())
      compressionType.foreach(c =>
        require(Seq("lz4", "zlib", "zstd").contains(c.toLowerCase),
          s"unknown pulsar compression type: $c"))
    }
    /** mTLS client auth selected (factory.go:123) — trust certs
      * required then (factory.go:57-62). */
    def isMtlsAuth: Boolean =
      authenticationToken.isEmpty && tokenFromFile.isEmpty &&
        basicUserName.isEmpty && oauth2.forall(!_.isEnabled) &&
        authTlsCertificatePath.nonEmpty && authTlsPrivateKeyPath.nonEmpty
  }

  /** Pulsar client/producer options for the pulsar-spark connector
    * (`pulsar.client.*` / `pulsar.producer.*` pass through to the
    * Java client's ClientConfigurationData/ProducerConfigurationData).
    * The auth provider chain follows factory.go:95 setupAuthentication
    * ORDER: token, token-from-file, basic, oauth2, mTLS — first
    * configured wins. */
  def pulsarOptions(cfg: PulsarConfig): Map[String, String] = {
    cfg.validate()
    val authPlugin = "pulsar.client.authPluginClassName"
    val authParams = "pulsar.client.authParams"
    val auth: Map[String, String] =
      if (cfg.authenticationToken.nonEmpty) Map(
        authPlugin -> "org.apache.pulsar.client.impl.auth.AuthenticationToken",
        authParams -> s"token:${cfg.authenticationToken.get}")
      else if (cfg.tokenFromFile.nonEmpty) Map(
        authPlugin -> "org.apache.pulsar.client.impl.auth.AuthenticationToken",
        authParams -> s"file://${cfg.tokenFromFile.get}")
      else if (cfg.basicUserName.nonEmpty && cfg.basicPassword.nonEmpty) Map(
        authPlugin -> "org.apache.pulsar.client.impl.auth.AuthenticationBasic",
        authParams -> s"""{"userId":"${cfg.basicUserName.get}","password":"${cfg.basicPassword.get}"}""")
      else cfg.oauth2.filter(_.isEnabled).map { o =>
        val scope = if (o.scope.nonEmpty) s""","scope":"${o.scope}"""" else ""
        Map(
          authPlugin -> "org.apache.pulsar.client.impl.auth.oauth2.AuthenticationOAuth2",
          authParams -> (s"""{"type":"client_credentials","issuerUrl":"${o.issuerUrl}",""" +
            s""""audience":"${o.audience}","privateKey":"${o.privateKey}",""" +
            s""""clientId":"${o.clientId}"$scope}"""))
      }.getOrElse {
        if (cfg.isMtlsAuth) {
          require(cfg.tlsTrustCertsFilePath.nonEmpty,
            "pulsar tls trust certs file path is not set when mTLS authentication is enabled")
          Map(
            authPlugin -> "org.apache.pulsar.client.impl.auth.AuthenticationTls",
            authParams -> (s"tlsCertFile:${cfg.authTlsCertificatePath.get}," +
              s"tlsKeyFile:${cfg.authTlsPrivateKeyPath.get}"))
        } else Map.empty[String, String]
      }
    val tls =
      cfg.tlsTrustCertsFilePath.map("pulsar.client.tlsTrustCertsFilePath" -> _).toMap
    val producer = Seq(
      cfg.compressionType.map(c => "pulsar.producer.compressionType" -> c.toUpperCase),
      cfg.batchingMaxMessages.map(n => "pulsar.producer.batchingMaxMessages" -> n.toString),
      cfg.batchingMaxPublishDelayMs.map(ms =>
        "pulsar.producer.batchingMaxPublishDelayMicros" -> (ms * 1000L).toString),
      cfg.sendTimeoutSec.map(s => "pulsar.producer.sendTimeoutMs" -> (s * 1000L).toString))
      .flatten.toMap
    val client = Seq(
      cfg.connectionTimeoutSec.map(s =>
        "pulsar.client.connectionTimeoutMs" -> (s * 1000L).toString),
      cfg.operationTimeoutSec.map(s =>
        "pulsar.client.operationTimeoutMs" -> (s * 1000L).toString))
      .flatten.toMap
    auth ++ tls ++ producer ++ client
  }

  /** Masked copy (sink.go:682-693 PulsarConfig.MaskSensitiveData:
    * token, basic password, oauth2 private key). */
  def maskedPulsar(cfg: PulsarConfig): PulsarConfig =
    cfg.copy(
      authenticationToken = cfg.authenticationToken.map(_ => "******"),
      basicPassword = cfg.basicPassword.map(_ => "******"),
      oauth2 = cfg.oauth2.map(o =>
        if (o.privateKey.nonEmpty) o.copy(privateKey = "******") else o))
}
