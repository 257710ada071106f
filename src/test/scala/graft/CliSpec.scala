package graft

import java.nio.file.Files
import graft.streaming.{ApiServer, ChangefeedRegistry}

/** CLI front-end e2e: every verb drives the real HTTP server over a
  * real registry (the reference's cmd/cdc/cli surface — create, list,
  * query, statistics, pause/resume, span scheduling, remove; exit
  * codes track HTTP status). */
class CliSpec extends SparkFunSuite {

  private def cli(server: String, args: String*): (Int, String) = {
    val buf = new StringBuilder
    val code = Cli.run(args.toSeq :+ "--server" :+ server, s => buf.append(s))
    (code, buf.toString)
  }

  test("flag parsing: --k v, --k=v, positionals, missing value") {
    val (words, flags) = Cli.parseArgs(
      Seq("changefeed", "create", "--changefeed-id", "x", "--rules=a.*,b.*"))
    assert(words == Seq("changefeed", "create"))
    assert(flags == Map("changefeed-id" -> "x", "rules" -> "a.*,b.*"))
    intercept[IllegalArgumentException](Cli.parseArgs(Seq("--dangling")))
  }

  test("changefeed lifecycle end to end through the CLI") {
    val tmp = Files.createTempDirectory("graft-cli").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))

    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry).start()
    val server = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c0, b0) = cli(server, "changefeed", "list")
      assert(c0 == 0 && b0 == "[]")

      val (c1, b1) = cli(server, "changefeed", "create",
        "--changefeed-id", "cf-cli", "--source", src,
        "--sink-uri", s"$tmp/sink", "--checkpoint", s"$tmp/ckpt",
        "--rules", "app.*")
      assert(c1 == 0 && b1.contains("\"cf-cli\""), b1)

      val (c2, b2) = cli(server, "changefeed", "list")
      assert(c2 == 0 && b2.contains("cf-cli"))

      val (c3, b3) = cli(server, "changefeed", "statistics",
        "--changefeed-id", "cf-cli")
      assert(c3 == 0 && b3.contains("\"state\""), b3)

      val (c4, b4) = cli(server, "changefeed", "query",
        "--changefeed-id", "cf-cli")
      assert(c4 == 0 && b4.contains("\"cf-cli\""), b4)

      // span scheduling verbs
      val (c5, _) = cli(server, "changefeed", "move-table",
        "--changefeed-id", "cf-cli",
        "--schema", "app", "--table", "events_0", "--target", "2")
      assert(c5 == 0)
      val (c6, _) = cli(server, "changefeed", "split-table",
        "--changefeed-id", "cf-cli",
        "--schema", "app", "--table", "events_1", "--parts", "3")
      assert(c6 == 0)
      val (c7, b7) = cli(server, "changefeed", "list-tables",
        "--changefeed-id", "cf-cli")
      assert(c7 == 0 && b7.contains("events_1"), b7)
      val (c8, _) = cli(server, "changefeed", "merge-table",
        "--changefeed-id", "cf-cli",
        "--schema", "app", "--table", "events_1")
      assert(c8 == 0)

      val (c9, _) = cli(server, "changefeed", "pause",
        "--changefeed-id", "cf-cli")
      assert(c9 == 0)
      val (cA, bA) = cli(server, "changefeed", "statistics",
        "--changefeed-id", "cf-cli")
      assert(cA == 0 && bA.contains("paused"), bA)
      val (cB, _) = cli(server, "changefeed", "resume",
        "--changefeed-id", "cf-cli")
      assert(cB == 0)

      val (cC, bC) = cli(server, "unsafe", "show-metadata")
      assert(cC == 0 && bC.contains("gc_safepoint"), bC)

      // HTTP errors surface as exit code 1 with the server's body
      val (cD, bD) = cli(server, "changefeed", "query",
        "--changefeed-id", "nope")
      assert(cD == 1 && bD.contains("not found"))

      val (cE, _) = cli(server, "changefeed", "remove",
        "--changefeed-id", "cf-cli")
      assert(cE == 0)
      val (cF, bF) = cli(server, "changefeed", "list")
      assert(cF == 0 && !bF.contains("cf-cli"))

      // unknown verbs reject locally
      intercept[IllegalArgumentException](cli(server, "changefeed", "frobnicate"))
    } finally {
      try registry.remove("cf-cli") catch { case _: Throwable => () }
      api.stop()
    }
  }

  test("create --config ships the full replica config as the v2 JSON body") {
    val tmp = Files.createTempDirectory("graft-cli-cfg").toString
    val src = s"$tmp/source"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events.parquet"))
    val toml =
      """case-sensitive = false
        |[filter]
        |rules = ['app.*', '!app.skip']
        |[sink]
        |protocol = 'open-protocol'
        |""".stripMargin
    val cfgFile = java.nio.file.Paths.get(s"$tmp/cf.toml")
    Files.write(cfgFile, toml.getBytes)

    val registry = new graft.streaming.ChangefeedRegistry(spark)
    val api = new ApiServer(registry).start()
    val server = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = cli(server, "changefeed", "create",
        "--changefeed-id", "cf-toml", "--source", src,
        "--sink-uri", s"$tmp/sink", "--checkpoint", s"$tmp/ckpt",
        "--config", cfgFile.toString)
      assert(c1 == 0 && b1.contains("\"cf-toml\""), b1)
      val (c2, b2) = cli(server, "changefeed", "query",
        "--changefeed-id", "cf-toml")
      assert(c2 == 0 && b2.contains("!app.skip"),
        s"config from the TOML body must drive the feed: $b2")
    } finally {
      try registry.remove("cf-toml") catch { case _: Throwable => () }
      api.stop()
    }
  }

  test("CLI over TLS with --ca/--cert/--key (cli_tls_with_auth)") {
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry,
      security = TlsFixture.serverCredential(allowedCN = Seq("client"))).start()
    val server = s"https://127.0.0.1:${api.boundPort}"
    try {
      val (code, body) = cli(server, "changefeed", "list",
        "--ca", TlsFixture.p("ca.pem"),
        "--cert", TlsFixture.p("client.pem"),
        "--key", TlsFixture.p("client-key.pem"))
      assert(code == 0 && body == "[]", s"$code $body")

      // partial trio rejected up front (credential.go's all-or-nothing)
      intercept[IllegalArgumentException](
        cli(server, "changefeed", "list", "--ca", TlsFixture.p("ca.pem")))

      // no client credential at all: the handshake fails, surfaced as
      // the CLI's non-zero transport-error exit
      intercept[Exception](cli(server, "changefeed", "list"))
    } finally api.stop()
  }

  test("next-gen kernel: changefeed commands demand --keyspace / -k " +
      "(cli_missing_keyspace_error)") {
    val registry = new ChangefeedRegistry(spark)
    val api = new ApiServer(registry).start()
    val server = s"http://127.0.0.1:${api.boundPort}"
    try {
      // missing keyspace → non-zero exit with the exact guidance text
      val buf = new StringBuilder
      val code = Cli.run(
        Seq("changefeed", "pause", "--changefeed-id", "missing-keyspace",
          "--server", server),
        s => buf.append(s), nextGen = true)
      assert(code != 0, "must fail without --keyspace/-k")
      assert(buf.toString.contains("please specify --keyspace or -k"), buf)
      assert(buf.toString.trim.nonEmpty, "error output must not be empty")

      // with -k the command proceeds to the server (404: no such feed —
      // past the client-side gate)
      val buf2 = new StringBuilder
      val code2 = Cli.run(
        Seq("changefeed", "statistics", "--changefeed-id", "nope",
          "-k", "ks1", "--server", server),
        s => buf2.append(s), nextGen = true)
      assert(code2 != 0 && buf2.toString.contains("not found"), buf2)

      // classic kernel: no keyspace requirement
      val buf3 = new StringBuilder
      val code3 = Cli.run(Seq("changefeed", "list", "--server", server),
        s => buf3.append(s), nextGen = false)
      assert(code3 == 0 && buf3.toString == "[]")

      // --keyspace rides changefeed create through to the feed config
      val tmp = Files.createTempDirectory("graft-cli-ks").toString
      val src = s"$tmp/source"
      Files.createDirectories(java.nio.file.Paths.get(src))
      Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$src/events.parquet"))
      val buf4 = new StringBuilder
      val code4 = Cli.run(
        Seq("changefeed", "create", "--changefeed-id", "cf-ks",
          "--source", src, "--sink-uri", s"$tmp/sink",
          "--checkpoint", s"$tmp/ckpt", "--keyspace", "tenant-7",
          "--server", server),
        s => buf4.append(s), nextGen = true)
      assert(code4 == 0, buf4)
      assert(registry.config("cf-ks").keyspace == "tenant-7")
      registry.remove("cf-ks")
    } finally api.stop()
  }
}
