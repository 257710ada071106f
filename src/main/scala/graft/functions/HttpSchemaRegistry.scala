package graft.functions

import java.net.{HttpURLConnection, URL, InetSocketAddress}
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import com.fasterxml.jackson.databind.ObjectMapper

/** Confluent schema-registry HTTP client + in-process server stub
  * (reference pkg/sink/codec/avro/confluent_schema_registry.go:1-499:
  * `POST /subjects/{subject}/versions` registers and returns the
  * global schema id, `GET /schemas/ids/{id}` resolves the writer
  * schema, `GET /subjects/{subject}/versions` lists versions).
  *
  * The client implements [[AvroRegistry.SchemaStore]], so the framed
  * encode/decode path ([[AvroRegistry.encodeFramed]]/`decodeFramed`)
  * runs unchanged over real HTTP — swapping the in-memory store for
  * the network one changes no data-path code, which was the design
  * contract. JSON in/out uses the jackson shipped with Spark.
  *
  * The stub serves the same three endpoints over the JDK HttpServer
  * backed by an [[AvroRegistry.InMemoryStore]] — the offline stand-in
  * for a real registry, honest about the wire: ids, subjects, and
  * error codes cross a real TCP socket.
  */
object HttpSchemaRegistry {

  private val mapper = new ObjectMapper()

  /** The reference's registry-API error identity
    * (errors.ErrAvroSchemaAPIError): what a changefeed reports when
    * the registry stays unreachable — NOT in FeedBackoff's fast-fail
    * set, so the feed goes WARNING and retries with backoff
    * (tests/integration_tests/avro_schema_registry_error). */
  final val RegistryErrorCode = "CDC:ErrAvroSchemaAPIError"

  final class RegistryUnavailableException(message: String)
      extends RuntimeException(message) {
    def code: String = RegistryErrorCode
    def asFeedError: graft.streaming.FeedError =
      graft.streaming.FeedError(RegistryErrorCode, message)
  }

  /** HTTP client speaking the Confluent subset the reference uses.
    * Registrations happen driver-side (encoder init / schema change —
    * confluent_schema_registry.go registers per schema version, not
    * per message), so a plain blocking client is the right shape.
    *
    * Transport errors AND 5xx responses retry with bounded
    * exponential backoff (confluent_schema_registry.go:420-485
    * `httpRetry`: NewExponentialBackOff, MaxInterval 30 s, stops at
    * MaxElapsedTime); 4xx client errors return immediately — they are
    * protocol answers (409 incompatible, 404 unknown), not outages.
    * Exhausted retries raise [[RegistryUnavailableException]], whose
    * [[FeedError]] form feeds the changefeed's
    * [[graft.streaming.FeedBackoff]] — the feed turns WARNING and
    * keeps its own restart schedule, exactly the
    * avro_schema_registry_error flow. `sleeper` is injectable so
    * specs assert the schedule without wall-clock sleeps. */
  final class ConfluentHttpClient(baseUrl: String,
                                  retryInitialMs: Long = 100L,
                                  retryMaxIntervalMs: Long = 30000L,
                                  retryMaxElapsedMs: Long = 30000L,
                                  sleeper: Long => Unit = Thread.sleep)
      extends AvroRegistry.SchemaStore {

    private def requestOnce(method: String, path: String,
                            body: Option[String]): (Int, String) = {
      val conn = new URL(baseUrl + path).openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod(method)
      conn.setRequestProperty("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      body.foreach { b =>
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (stream == null) "" else
        try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        finally stream.close()
      conn.disconnect()
      (code, text)
    }

    private def request(method: String, path: String,
                        body: Option[String] = None): (Int, String) = {
      var intervalMs = retryInitialMs
      var elapsedMs = 0L
      while (true) {
        val outcome: Either[String, (Int, String)] =
          try {
            val (code, text) = requestOnce(method, path, body)
            if (code >= 500) Left(s"HTTP $code $text") else Right((code, text))
          } catch {
            case e: java.io.IOException => Left(s"transport: ${e.getMessage}")
          }
        outcome match {
          case Right(r) => return r
          case Left(why) =>
            if (elapsedMs + intervalMs > retryMaxElapsedMs)
              throw new RegistryUnavailableException(
                s"schema registry unavailable after ${elapsedMs}ms of retries " +
                  s"($method $path): $why")
            sleeper(intervalMs)
            elapsedMs += intervalMs
            intervalMs = math.min(intervalMs * 2L, retryMaxIntervalMs)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    def register(subject: String, schemaJson: String): Int = {
      val payload = mapper.createObjectNode()
      payload.put("schema", schemaJson)
      val (code, body) = request("POST",
        s"/subjects/${enc(subject)}/versions", Some(mapper.writeValueAsString(payload)))
      if (code == 409) // the registry's incompatible-evolution reject
        throw new AvroRegistry.IncompatibleSchemaException(subject)
      require(code == 200, s"register failed: HTTP $code $body")
      mapper.readTree(body).get("id").asInt()
    }

    /** Compatibility pre-check against the subject's latest version
      * (POST /compatibility/subjects/{subject}/versions/latest). */
    def checkCompatibility(subject: String, schemaJson: String): Boolean = {
      val payload = mapper.createObjectNode()
      payload.put("schema", schemaJson)
      val (code, body) = request("POST",
        s"/compatibility/subjects/${enc(subject)}/versions/latest",
        Some(mapper.writeValueAsString(payload)))
      require(code == 200, s"compatibility check failed: HTTP $code $body")
      mapper.readTree(body).get("is_compatible").asBoolean()
    }

    def byId(id: Int): String = {
      val (code, body) = request("GET", s"/schemas/ids/$id")
      require(code == 200, s"unknown schema id $id: HTTP $code $body")
      mapper.readTree(body).get("schema").asText()
    }

    def versions(subject: String): Seq[Int] = {
      val (code, body) = request("GET", s"/subjects/${enc(subject)}/versions")
      require(code == 200, s"versions failed: HTTP $code $body")
      val arr = mapper.readTree(body)
      (0 until arr.size()).map(arr.get(_).asInt())
    }

    /** `GET /subjects/{s}/versions/latest` — the one call that
      * carries BOTH the global schema id and the schema text, so a
      * consumer never confuses version numbers with ids
      * (confluent_schema_registry.go resolves the latest the same
      * way). */
    def latest(subject: String): (Int, String) = {
      val (code, body) =
        request("GET", s"/subjects/${enc(subject)}/versions/latest")
      require(code == 200, s"versions/latest failed: HTTP $code $body")
      val node = mapper.readTree(body)
      (node.get("id").asInt(), node.get("schema").asText())
    }

    /** Version→global-id translation, one `GET
      * /subjects/{s}/versions/{v}` per version (the real API exposes
      * no bulk id listing). */
    def idsFor(subject: String): Seq[Int] = versions(subject).map { v =>
      val (code, body) = request("GET", s"/subjects/${enc(subject)}/versions/$v")
      require(code == 200, s"version $v lookup failed: HTTP $code $body")
      mapper.readTree(body).get("id").asInt()
    }

    private def enc(s: String): String =
      java.net.URLEncoder.encode(s, "UTF-8")
  }

  /** In-process registry stub: the Confluent endpoint subset over the
    * JDK HttpServer, backed by the content-addressed in-memory store.
    * 404 with the Confluent error codes (40401 subject, 40403 schema)
    * on unknowns. */
  final class Stub(port: Int = 0) {
    private val store = new AvroRegistry.InMemoryStore
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    def boundPort: Int = server.getAddress.getPort
    def baseUrl: String = s"http://127.0.0.1:$boundPort"

    /** Fault injection: the next `n` requests answer 500 (the
      * avro_schema_registry_error outage window); pass
      * `Int.MaxValue` for a persistent outage. */
    @volatile private var failRemaining: Int = 0
    @volatile private var served: Int = 0
    def failNextRequests(n: Int): Unit = failRemaining = n
    def requestsServed: Int = served

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

    server.createContext("/", (ex: HttpExchange) => {
      try {
        served += 1
        if (failRemaining > 0) {
          if (failRemaining != Int.MaxValue) failRemaining -= 1
          respond(ex, 500,
            """{"error_code":50001,"message":"Error in the backend datastore"}""")
        } else {
        val path = ex.getRequestURI.getPath.stripPrefix("/")
          .split("/").filter(_.nonEmpty).toSeq
        (ex.getRequestMethod, path) match {
          case ("POST", Seq("subjects", subject, "versions")) =>
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            val schema = mapper.readTree(body).get("schema").asText()
            try {
              val id = store.register(
                java.net.URLDecoder.decode(subject, "UTF-8"), schema)
              respond(ex, 200, s"""{"id":$id}""")
            } catch {
              // the Confluent reject path: 409 for a schema the
              // subject's compatibility level refuses
              case _: AvroRegistry.IncompatibleSchemaException =>
                respond(ex, 409,
                  """{"error_code":409,"message":"Schema being registered is incompatible with an earlier schema"}""")
            }

          // compatibility pre-check (POST /compatibility/subjects/
          // {subject}/versions/latest): would this schema be accepted
          // as the subject's next version?
          case ("POST", Seq("compatibility", "subjects", subject, "versions", "latest")) =>
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            val schema = mapper.readTree(body).get("schema").asText()
            val ok = store.compatibleWithLatest(
              java.net.URLDecoder.decode(subject, "UTF-8"), schema)
            respond(ex, 200, s"""{"is_compatible":$ok}""")
          case ("GET", Seq("schemas", "ids", id)) =>
            val schema = try Some(store.byId(id.toInt)) catch {
              case _: RuntimeException => scala.None
            }
            schema match {
              case Some(s) =>
                val node = mapper.createObjectNode(); node.put("schema", s)
                respond(ex, 200, mapper.writeValueAsString(node))
              case scala.None =>
                respond(ex, 404,
                  """{"error_code":40403,"message":"Schema not found"}""")
            }
          case ("GET", Seq("subjects", subject, "versions")) =>
            // Confluent contract: VERSION NUMBERS (1,2,3…), not ids
            val vs = store.versions(java.net.URLDecoder.decode(subject, "UTF-8"))
            if (vs.isEmpty)
              respond(ex, 404,
                """{"error_code":40401,"message":"Subject not found"}""")
            else respond(ex, 200, vs.mkString("[", ",", "]"))
          case ("GET", Seq("subjects", subject, "versions", v)) =>
            // `latest` or a concrete version number → the full version
            // record {subject, version, id, schema} (the only payload
            // that ties a version to its GLOBAL schema id)
            val sub = java.net.URLDecoder.decode(subject, "UTF-8")
            val ids = store.idsFor(sub)
            val idx =
              if (v == "latest") ids.size - 1
              else v.toIntOption.map(_ - 1).getOrElse(-1)
            if (idx < 0 || idx >= ids.size)
              respond(ex, 404,
                """{"error_code":40402,"message":"Version not found"}""")
            else {
              val node = mapper.createObjectNode()
              node.put("subject", sub)
              node.put("version", idx + 1)
              node.put("id", ids(idx))
              node.put("schema", store.byId(ids(idx)))
              respond(ex, 200, mapper.writeValueAsString(node))
            }
          case _ =>
            respond(ex, 404, """{"error_code":404,"message":"not found"}""")
        }
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, s"""{"error_code":500,"message":"${e.getMessage}"}""")
      }
    })

    def start(): Stub = { server.start(); this }
    def stop(): Unit = server.stop(0)
  }
}
