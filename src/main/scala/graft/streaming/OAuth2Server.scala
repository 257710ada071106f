package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process OAuth2 token server (reference cmd/oauth2-server/main.go
  * — the fixture the e2e suite runs so the Kafka OAUTHBEARER path has
  * an issuer to talk to). Client-credentials grant only, HS256-signed
  * JWT access tokens, plus the OpenID discovery document
  * (main.go:32-84).
  *
  * Like the reference fixture this is a TEST-SUPPORT server: one
  * static client, in-memory state, no persistence.
  */
class OAuth2Server(clientId: String = "1234",
                   clientSecret: String = "e0KVlA2EiBfjoN13olyZd2kv1KL",
                   signSecret: String = "graft-oauth2-sign-secret",
                   expiresInSec: Long = 7200L,
                   port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def tokenUrl: String = s"http://127.0.0.1:$boundPort/token"
  def issuer: String = s"http://127.0.0.1:$boundPort/"

  private val issued = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Tokens handed out so far — lets specs assert source-level reuse. */
  def issuedCount: Long = issued.get()

  private def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  /** HS256 JWT: header.payload.signature (the JWTAccessGenerate
    * shape; the reference signs HS512 — alg is discovery-advertised,
    * both are HMAC family). */
  private[streaming] def signToken(aud: String, nowSec: Long): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
    val payload = b64url(
      (s"""{"aud":"${if (aud.isEmpty) clientId else aud}","exp":${nowSec + expiresInSec},""" +
        s""""iat":$nowSec,"iss":"$issuer","sub":"$clientId"}""").getBytes(StandardCharsets.UTF_8))
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(signSecret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    val sig = b64url(mac.doFinal(s"$header.$payload".getBytes(StandardCharsets.UTF_8)))
    s"$header.$payload.$sig"
  }

  /** Signature check — the consumer-side verification a broker (or a
    * spec) performs on presented tokens. */
  def verify(jwt: String): Boolean = jwt.split('.') match {
    case Array(h, p, s) =>
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(signSecret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
      b64url(mac.doFinal(s"$h.$p".getBytes(StandardCharsets.UTF_8))) == s
    case _ => false
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def formParams(body: String): Map[String, String] =
    body.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap

  server.createContext("/.well-known/openid-configuration", (ex: HttpExchange) =>
    respond(ex, 200,
      s"""{"issuer":"$issuer","token_endpoint":"$tokenUrl",""" +
        s""""grant_types_supported":["client_credentials"],""" +
        s""""token_endpoint_auth_methods_supported":["client_secret_basic","client_secret_post"],""" +
        s""""id_token_signing_alg_values_supported":["HS256"]}"""))

  server.createContext("/token", (ex: HttpExchange) => {
    val body = scala.io.Source.fromInputStream(ex.getRequestBody, "UTF-8").mkString
    val form = formParams(body)
    // client authenticates via Basic header OR form fields
    // (ClientFormHandler in the reference fixture accepts both)
    val (cid, csec) = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Basic ")) match {
      case Some(h) =>
        val decoded = new String(Base64.getDecoder.decode(h.stripPrefix("Basic ").trim),
          StandardCharsets.UTF_8)
        decoded.split(":", 2) match {
          case Array(u, p) => (u, p)
          case _ => ("", "")
        }
      case None => (form.getOrElse("client_id", ""), form.getOrElse("client_secret", ""))
    }
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, """{"error":"invalid_request"}""")
    else if (form.getOrElse("grant_type", "") != "client_credentials")
      respond(ex, 400, """{"error":"unsupported_grant_type"}""")
    else if (cid != clientId || csec != clientSecret)
      respond(ex, 401, """{"error":"invalid_client"}""")
    else {
      issued.incrementAndGet()
      val token = signToken(form.getOrElse("audience", ""),
        System.currentTimeMillis() / 1000L)
      val scope = form.get("scope").map(s => s""","scope":"$s"""").getOrElse("")
      respond(ex, 200,
        s"""{"access_token":"$token","token_type":"Bearer","expires_in":$expiresInSec$scope}""")
    }
  })

  def start(): OAuth2Server = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
