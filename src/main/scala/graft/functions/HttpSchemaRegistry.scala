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

  /** HTTP client speaking the Confluent subset the reference uses.
    * Registrations happen driver-side (encoder init / schema change —
    * confluent_schema_registry.go registers per schema version, not
    * per message), so a plain blocking client is the right shape. */
  final class ConfluentHttpClient(baseUrl: String) extends AvroRegistry.SchemaStore {

    private def request(method: String, path: String,
                        body: Option[String] = None): (Int, String) = {
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
            val vs = store.versions(java.net.URLDecoder.decode(subject, "UTF-8"))
            if (vs.isEmpty)
              respond(ex, 404,
                """{"error_code":40401,"message":"Subject not found"}""")
            else respond(ex, 200, vs.mkString("[", ",", "]"))
          case _ =>
            respond(ex, 404, """{"error_code":404,"message":"not found"}""")
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
