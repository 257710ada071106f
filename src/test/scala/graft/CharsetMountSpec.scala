package graft

import graft.model._
import graft.model.DdlJobParser.DdlJob
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** TableInfo-version-only DDL actions (codes 15/22/26 — SetDefaultValue
  * and charset/collate converts): the reference stores a NEW TableInfo
  * version for them (updateFullTableInfoForSingleTableDDL,
  * persist_storage_ddl_handlers.go:247-318). The fold must bump the
  * registry version carrying the new column charset/default text, and —
  * under the `mysql-native` dialect — rows after a CONVERT TO CHARACTER
  * SET must TRANSCODE under the new charset. */
class CharsetMountSpec extends SparkFunSuite {

  private def job(id: Long, tpe: Int, q: String, ts: Long,
                  tableId: Long = 0L, infoId: Long = 0L): DdlJob =
    DdlJob(id = id, actionType = tpe, schemaName = "app", tableName = "g",
      query = q, startTs = ts - 1, finishedTs = ts, schemaVersion = ts,
      tableId = tableId, tableInfoId = infoId)

  test("SetDefaultValue (code 15) folds as a version bump carrying the new " +
      "default text; DROP DEFAULT clears it") {
    val st = SchemaStore().applyJobs(Seq(
      job(1L, 3, "CREATE TABLE app.g (id BIGINT, label VARCHAR(32) DEFAULT 'a')",
        10L, tableId = 800L, infoId = 800L),
      job(2L, 15, "ALTER TABLE app.g ALTER COLUMN label SET DEFAULT 'x'", 100L,
        tableId = 800L)))
    assert(st.registry.asOf("app", "g", 50L).get
      .columns.find(_.name == "label").get.default == Some("a"))
    val after = st.registry.asOf("app", "g", 100L).get
    assert(after.versionTs == 100L, "code 15 must store a NEW version")
    assert(after.columns.find(_.name == "label").get.default == Some("x"))
    // the mount-side meta carries it: a missing cell now fills 'x'
    assert(st.metaAsOf("app", "g", 100L).get
      .columns.find(_.name == "label").get.default == Some("x"))
    val st2 = st.applyJob(
      job(3L, 15, "ALTER TABLE app.g ALTER COLUMN label DROP DEFAULT", 200L,
        tableId = 800L))
    assert(st2.registry.asOf("app", "g", 200L).get
      .columns.find(_.name == "label").get.default.isEmpty)
  }

  test("CONVERT TO CHARACTER SET (code 22) folds as a version bump setting " +
      "the charset on every STRING column only") {
    val st = SchemaStore().applyJobs(Seq(
      job(1L, 3, "CREATE TABLE app.g (id BIGINT, label VARCHAR(32), n BIGINT)",
        10L, tableId = 800L, infoId = 800L),
      job(2L, 22, "ALTER TABLE app.g CONVERT TO CHARACTER SET gbk", 100L,
        tableId = 800L)))
    val pre = st.registry.asOf("app", "g", 50L).get
    assert(pre.columns.forall(_.charset == ""))
    val post = st.registry.asOf("app", "g", 100L).get
    assert(post.versionTs == 100L)
    assert(post.columns.find(_.name == "label").get.charset == "gbk")
    assert(post.columns.filter(_.name != "label").forall(_.charset == ""),
      "numeric columns carry no charset")
  }

  test("mysql-native mount across a CONVERT boundary: rows written before " +
      "decode as utf8, rows written after transcode from the NEW charset — " +
      "same logical text either side") {
    import graft.operators.RawKvMounter
    val text = "你好 café" // mixed CJK + latin-1 content
    val st = SchemaStore().applyJobs(Seq(
      job(1L, 3, "CREATE TABLE app.g (id BIGINT, label VARCHAR(32))", 10L,
        tableId = 800L, infoId = 800L),
      job(2L, 22, "ALTER TABLE app.g CONVERT TO CHARACTER SET gbk", 100L,
        tableId = 800L)))
    val plan = st.physicalPlan(dialect = "mysql-native")
    def rawRow(id: Long, bytes: Array[Byte], cts: Long): Row =
      Row(TiKvCodec.encodeRecordKey(800L, TiKvCodec.IntHandle(id)),
        TiKvCodec.encodeV2(Seq(2L -> Some(bytes))),
        null, "put", cts - 1L, cts)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("old_value",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("op_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("start_ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("commit_ts",
        org.apache.spark.sql.types.LongType)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // pre-convert row: mysql-native bytes in the PRE charset
        // (none declared = utf8 passthrough)
        rawRow(1L, text.getBytes("UTF-8"), 50L),
        // post-convert row: the writer now stores GBK bytes
        rawRow(2L, text.getBytes("GBK"), 150L)), 1), schema)
    val out = RawKvMounter.mountTablesPlan(raw, plan)
      .select(col("after.id"), col("after.label")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == text, s"pre-convert row decodes as utf8: ${out(1L)}")
    assert(out(2L) == text,
      s"post-convert row must transcode gbk -> utf8: ${out(2L)}")
    // and the SAME bytes without the convert fold would mis-decode —
    // the boundary is doing real work
    val noConvert = SchemaStore().applyJob(
      job(1L, 3, "CREATE TABLE app.g (id BIGINT, label VARCHAR(32))", 10L,
        tableId = 800L, infoId = 800L))
    val bad = RawKvMounter.mountTablesPlan(raw,
      noConvert.physicalPlan(dialect = "mysql-native"))
      .select(col("after.id"), col("after.label")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bad(2L) != text, "without the fold the GBK bytes mis-decode")
  }
}
