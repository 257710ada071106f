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
}
