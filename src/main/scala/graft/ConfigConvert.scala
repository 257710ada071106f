package graft

import java.nio.file.{Files, Paths}
import graft.model.ConfigToml

/** Changefeed config ↔ API model converter — the reference's
  * cmd/config-converter/main.go: `--config file.toml` prints the v2
  * JSON model; `--model file.json` prints the TOML config; exactly
  * one must be given; exit codes mirror main.go:32-39 (execute
  * failed = 1, toml decode = 2, json marshal = 3, json decode = 4,
  * toml marshal = 5, invalid flag = 6).
  */
object ConfigConvert {

  /** Testable core: (exit code, output or error text). */
  def run(args: Seq[String]): (Int, String) = {
    val (_, flags) = Cli.parseArgs(args)
    val cfgPath = flags.get("config")
    val modelPath = flags.get("model")
    (cfgPath, modelPath) match {
      case (Some(_), Some(_)) => (ConfigToml.ExitInvalidFlag, "can't specify both config and model")
      case (None, None) => (ConfigToml.ExitInvalidFlag, "must specify either config or model")
      case (Some(p), None) =>
        val text =
          try new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
          catch { case e: Exception => return (ConfigToml.ExitExecuteFailed, s"read config file error: $e") }
        val cfg =
          try ConfigToml.toConfig(ConfigToml.parse(text),
            flags.getOrElse("changefeed-id", "changefeed"))
          catch { case e: Exception => return (ConfigToml.ExitDecodeTomlFailed, s"decode config file error: $e") }
        try (0, ConfigToml.toApiJson(cfg))
        catch { case e: Exception => (ConfigToml.ExitMarshalJson, s"marshal config error: $e") }
      case (None, Some(p)) =>
        val text =
          try new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
          catch { case e: Exception => return (ConfigToml.ExitExecuteFailed, s"read model file error: $e") }
        val cfg =
          try ConfigToml.fromApiJson(text)
          catch { case e: Exception => return (ConfigToml.ExitDecodeJsonFailed, s"unmarshal model error: $e") }
        try (0, ConfigToml.renderToml(cfg))
        catch { case e: Exception => (ConfigToml.ExitMarshalTomlFailed, s"marshal model error: $e") }
    }
  }

  def main(args: Array[String]): Unit = {
    val (code, out) = run(args.toSeq)
    if (code == 0) println(out)
    else { System.err.println(out); sys.exit(code) }
  }
}
