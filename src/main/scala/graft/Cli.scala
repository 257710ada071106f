package graft

import java.net.{HttpURLConnection, URL, URLEncoder}
import scala.io.Source

/** Command-line front-end over the API v2 HTTP surface — the `cdc cli`
  * equivalent (reference cmd/cdc/cli: changefeed
  * create/list/query/statistics/pause/resume/remove/update,
  * move-table/split-table/move-split-table/merge-table, unsafe
  * show-metadata). The CLI owns no state: every verb is one HTTP call
  * against a running [[graft.streaming.ApiServer]], the response body
  * prints verbatim, and the exit code reflects the HTTP status — so
  * it scripts exactly like the reference binary.
  *
  * Usage:
  * {{{
  *   graft.Cli changefeed list --server http://host:port
  *   graft.Cli changefeed create --server URL --changefeed-id cf1 \
  *     --source DIR --sink-uri URI --checkpoint DIR [--rules 'a.*,b.*']
  *   graft.Cli changefeed query|statistics|synced|pause|resume|remove \
  *     --server URL --changefeed-id cf1
  *   graft.Cli changefeed update --server URL --changefeed-id cf1 --rules 'a.*'
  *   graft.Cli changefeed move-table --server URL --changefeed-id cf1 \
  *     --schema app --table events_0 --target 3
  *   graft.Cli changefeed split-table ... --parts 4
  *   graft.Cli changefeed move-split-table ... --targets 1,2
  *   graft.Cli changefeed merge-table ... --schema app --table events_0
  *   graft.Cli changefeed list-tables --server URL --changefeed-id cf1
  *   graft.Cli unsafe show-metadata --server URL
  * }}}
  */
object Cli {

  /** Parse `--key value` / `--key=value` flags; returns
    * (positional words, flags). */
  private[graft] def parseArgs(args: Seq[String]): (Seq[String], Map[String, String]) = {
    val words = Seq.newBuilder[String]
    val flags = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val body = a.stripPrefix("--")
        body.split("=", 2) match {
          case Array(k, v) => flags += (k -> v)
          case Array(k) =>
            require(i + 1 < args.length, s"flag --$k needs a value")
            flags += (k -> args(i + 1)); i += 1
        }
      } else words += a
      i += 1
    }
    (words.result(), flags.result())
  }

  private def enc(v: String): String = URLEncoder.encode(v, "UTF-8")

  private def httpRaw(method: String, url: String, body: Option[String],
      ssl: Option[javax.net.ssl.SSLContext]): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    (conn, ssl) match {
      case (h: javax.net.ssl.HttpsURLConnection, Some(ctx)) =>
        h.setSSLSocketFactory(ctx.getSocketFactory)
      case _ => ()
    }
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val respBody =
      if (stream == null) "" else Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, respBody)
  }

  private def need(flags: Map[String, String], keys: String*): Seq[String] =
    keys.map(k => flags.getOrElse(k,
      throw new IllegalArgumentException(s"missing required flag --$k")))

  /** Resolve and execute one CLI invocation; returns (exit code,
    * response body). Pure function of the argument list + the remote
    * server, so specs drive it directly. */
  def run(args: Seq[String], out: String => Unit): Int =
    run(args, out, nextGen = sys.env.get("GRAFT_NEXT_GEN").contains("1"))

  /** `nextGen` = the multi-tenant kernel (the reference's build-time
    * kerneltype.IsNextGen()): changefeed commands must then name their
    * keyspace explicitly — cli_missing_keyspace_error pins both the
    * non-zero exit and the guidance text. */
  def run(args: Seq[String], out: String => Unit, nextGen: Boolean): Int = {
    // `-k` is the reference CLI's short form of --keyspace
    val (words, flags) = parseArgs(args.flatMap {
      case "-k" => Seq("--keyspace")
      case a if a.startsWith("-k=") => Seq("--keyspace=" + a.stripPrefix("-k="))
      case a => Seq(a)
    })
    if (nextGen && words.headOption.contains("changefeed") &&
        !flags.contains("keyspace")) {
      out("Error: please specify --keyspace or -k")
      return 1
    }
    val server = flags.getOrElse("server", "http://127.0.0.1:8300")
    // --ca/--cert/--key: TLS client credential for an https server
    // (cli_tls_with_auth; the reference CLI's security flag trio).
    // All three must come together, like credential.go's rule.
    val tlsFlags = Seq("ca", "cert", "key").flatMap(flags.get)
    require(tlsFlags.isEmpty || tlsFlags.size == 3,
      "--ca, --cert and --key must all be supplied together")
    val ssl: Option[javax.net.ssl.SSLContext] =
      if (tlsFlags.size == 3)
        Some(graft.model.Tls.sslContext(graft.model.Security.Credential(
          caPath = flags("ca"), certPath = flags("cert"), keyPath = flags("key"))))
      else None
    def http(method: String, url: String,
             body: Option[String] = None): (Int, String) =
      httpRaw(method, url, body, ssl)
    val base = s"$server/api/v2/changefeeds"
    def id: String = need(flags, "changefeed-id").head
    def tableArgs: (String, String) = {
      val Seq(s, t) = need(flags, "schema", "table")
      (s, t)
    }

    val (code, body) = words match {
      case Seq("changefeed", "list") => http("GET", base)
      case Seq("changefeed", "create") =>
        val Seq(cf, src, sink, ckpt) =
          need(flags, "changefeed-id", "source", "sink-uri", "checkpoint")
        val rules = flags.get("rules").map(r => s"&rules=${enc(r)}").getOrElse("")
        val ks = flags.get("keyspace").map(k => s"&keyspace=${enc(k)}").getOrElse("")
        // --config file.toml ships the full replica config as the v2
        // JSON body (reference `cli changefeed create --config`)
        val body = flags.get("config").map { path =>
          val text = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path)), "UTF-8")
          graft.model.ConfigToml.toApiJson(
            graft.model.ConfigToml.toConfig(graft.model.ConfigToml.parse(text), cf))
        }
        http("POST",
          s"$base?id=${enc(cf)}&source=${enc(src)}&sink=${enc(sink)}&ckpt=${enc(ckpt)}$rules$ks",
          body)
      case Seq("changefeed", "query") => http("GET", s"$base/${enc(id)}")
      case Seq("changefeed", "statistics") => http("GET", s"$base/${enc(id)}/status")
      case Seq("changefeed", "synced") => http("GET", s"$base/${enc(id)}/synced")
      case Seq("changefeed", "pause") => http("POST", s"$base/${enc(id)}/pause")
      case Seq("changefeed", "resume") =>
        // --overwrite-checkpoint-ts=<ts|now> rewrites the checkpoint
        // (cli_changefeed_resume; replication restarts from that ts)
        val ow = flags.get("overwrite-checkpoint-ts")
          .map(v => s"?overwrite_checkpoint_ts=${enc(v)}").getOrElse("")
        http("POST", s"$base/${enc(id)}/resume$ow")
      case Seq("changefeed", "remove") => http("DELETE", s"$base/${enc(id)}")
      case Seq("changefeed", "update") =>
        val rules = need(flags, "rules").head
        http("PUT", s"$base/${enc(id)}?rules=${enc(rules)}")
      case Seq("changefeed", "move-table") =>
        val (s, t) = tableArgs
        val target = need(flags, "target").head
        http("POST",
          s"$base/${enc(id)}/move_table?schema=${enc(s)}&table=${enc(t)}&target=${enc(target)}")
      case Seq("changefeed", "split-table") =>
        val (s, t) = tableArgs
        val parts = need(flags, "parts").head
        http("POST",
          s"$base/${enc(id)}/split_table?schema=${enc(s)}&table=${enc(t)}&parts=${enc(parts)}")
      case Seq("changefeed", "move-split-table") =>
        val (s, t) = tableArgs
        val targets = need(flags, "targets").head
        http("POST",
          s"$base/${enc(id)}/move_split_table?schema=${enc(s)}&table=${enc(t)}&targets=${enc(targets)}")
      case Seq("changefeed", "merge-table") =>
        val (s, t) = tableArgs
        http("POST",
          s"$base/${enc(id)}/merge_table?schema=${enc(s)}&table=${enc(t)}")
      case Seq("changefeed", "list-tables") =>
        http("GET", s"$base/${enc(id)}/tables")
      case Seq("unsafe", "show-metadata") =>
        http("GET", s"$server/api/v2/gc_safepoint")
      case other =>
        throw new IllegalArgumentException(
          s"unknown command: ${other.mkString(" ")} " +
            "(try: changefeed list|create|query|statistics|synced|pause|resume|" +
            "remove|update|move-table|split-table|move-split-table|merge-table|" +
            "list-tables, unsafe show-metadata)")
    }
    out(body)
    if (code >= 200 && code < 300) 0 else 1
  }

  def main(args: Array[String]): Unit = {
    val exit =
      try run(args.toSeq, println)
      catch {
        case e: IllegalArgumentException => System.err.println(e.getMessage); 2
      }
    sys.exit(exit)
  }
}
