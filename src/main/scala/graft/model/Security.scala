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
          .getOrElse(base.sasl.gssapi.disablePafxfast)))
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
          case _ => None // GSSAPI/OAuth need krb5/callback config beyond options
        }
        Map("kafka.sasl.mechanism" -> m.name) ++
          jaas.map("kafka.sasl.jaas.config" -> _)
    }
    base ++ tls ++ sasl
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
}
