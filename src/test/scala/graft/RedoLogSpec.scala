package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.operators.Materialize
import graft.sinks.RedoLog

/** Redo-log write → crash → replay: the applier must restore exactly
  * the state the live sink would have produced (the reference's
  * eventual-consistency recovery contract, pkg/applier/redo.go). */
class RedoLogSpec extends SparkFunSuite {

  test("replay of an at-least-once log equals direct apply") {
    val tmp = Files.createTempDirectory("graft-redo").toString
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

    // two flushes, second re-appends an overlap (simulated re-delivery
    // after a writer crash mid-batch)
    val cut = env.select("_commit_ts").orderBy("_commit_ts")
      .collect().map(_.getLong(0)).apply(600)
    val first = env.filter(col("_commit_ts") <= cut)
    val second = env.filter(col("_commit_ts") > cut)
    val overlap = env.filter(col("_commit_ts") <= cut)
      .orderBy(col("_commit_ts").desc, col("_row_id")).limit(50)
    RedoLog.append(first, tmp)
    RedoLog.append(second.unionByName(overlap), tmp)

    // resolved-ts covers the whole stream
    val maxTs = env.agg(max("_commit_ts")).head().getLong(0)
    assert(RedoLog.resolvedTs(spark, tmp) == maxTs)

    // dedup restored exactly-once
    assert(RedoLog.read(spark, tmp).count() == env.count())

    // canonical multiset rendering for equality (exceptAll trips a
    // Spark attribute-rewrite bug on these windowed plans)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq

    // full replay == direct apply
    val replayed = RedoLog.replay(spark, tmp)
    val direct = Materialize.tableState(env)
    assert(canon(replayed) == canon(direct))

    // windowed replay (checkpoint, upTo] applies only that window
    val windowed = RedoLog.replay(spark, tmp, checkpointTs = cut)
    val directWindow = Materialize.tableState(env.filter(col("_commit_ts") > cut))
    assert(canon(windowed) == canon(directWindow))

    // GC below the checkpoint prunes whole segments without changing
    // the replayable window
    val removed = RedoLog.gc(spark, tmp, checkpointTs = cut)
    assert(removed > 0, "fully-below-checkpoint files pruned")
    val windowedAfterGc = RedoLog.replay(spark, tmp, checkpointTs = cut)
    assert(canon(windowedAfterGc) == canon(directWindow))
  }

  test("encrypted redo log: sealed at rest, exact roundtrip, rotation, wrong-key reject") {
    import graft.functions.AtRestEncryption
    val tmp = Files.createTempDirectory("graft-redo-enc").toString
    val master = AtRestEncryption.newDataKey()
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
      .limit(500)

    // at-least-once append (overlap re-delivery) like the plain log
    RedoLog.appendEncrypted(env, tmp, master)
    RedoLog.appendEncrypted(env.orderBy(col("_commit_ts")).limit(100), tmp, master)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val back = RedoLog.readEncrypted(spark, tmp, master)
    // from_json relaxes nullability; names+types must round-trip
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      env.schema.map(f => (f.name, f.dataType)),
      "schema must round-trip via KEYMETA")
    assert(canon(back) == canon(env), "sealed log must replay byte-equal rows")

    // the payload is actually opaque at rest: a value string present
    // in the plaintext envelope appears nowhere in the sealed files
    val marker = env.select(col("_table")).head().getString(0)
    assert(marker.nonEmpty)
    val slogBytes = java.nio.file.Files.list(
        java.nio.file.Paths.get(tmp, "slog")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .map(p => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(slogBytes.nonEmpty)
    assert(!slogBytes.exists(_.contains(s""""_table":"$marker"""")),
      "sealed files must not leak payload plaintext")

    // master-key rotation re-wraps the data key; old reads still work
    val master2 = AtRestEncryption.newDataKey()
    AtRestEncryption.rewrapKeyFile(tmp, master, master2)
    assert(canon(RedoLog.readEncrypted(spark, tmp, master2)) == canon(env))

    // a wrong master key is an authenticated failure, never garbage
    val wrong = AtRestEncryption.newDataKey()
    intercept[Exception] { RedoLog.readEncrypted(spark, tmp, wrong).collect() }
  }
}
