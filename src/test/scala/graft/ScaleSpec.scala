package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.analytics.Bucketing
import graft.model._
import graft.streaming.Changefeed

/** Scale-technique checks: bucketed co-located joins and the protocol
  * matrix of the changefeed pipeline. */
class ScaleSpec extends SparkFunSuite {

  test("bucketed fact tables join without a shuffle") {
    val tmp = Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", s"$tmp/li", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", s"$tmp/ord", "o_orderkey", 8)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.hasShuffle(joined),
      s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
    // and it computes the right thing
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("every wire protocol flows through the changefeed pipeline") {
    val env = Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val prefixes = Map[Protocol, String](
      Protocol.CanalJson -> "{\"id\":0,\"database\":",
      Protocol.Open -> "{\"",
      Protocol.Debezium -> "{\"before\":",
      Protocol.Csv -> "\"")
    prefixes.foreach { case (proto, prefix) =>
      val cfg = ChangefeedConfig(id = s"cf-$proto",
        sink = SinkConfig(protocol = proto))
      val out = Changefeed.pipeline(spark, cfg)(env)
      val v = out.select("_value").head().getString(0)
      assert(v.startsWith(prefix), s"$proto => $v")
      assert(out.columns.contains("_partition"))
    }
  }
}
