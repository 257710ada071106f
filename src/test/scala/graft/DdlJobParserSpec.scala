package graft

import graft.model.{ColumnDef, DdlJobParser, SchemaRegistry, TiKvCodec}
import graft.model.DdlAction._
import graft.model.DdlJobParser._
import org.scalatest.funsuite.AnyFunSuite

/** The DDL-job wire path: `mysql.tidb_ddl_job` record bytes → row
  * decode → model.Job JSON → Done-state gate → registry action
  * (mounter.go:175-231; ddl_job_fetcher.go job-table meta). */
class DdlJobParserSpec extends AnyFunSuite {

  private def jobJson(id: Long, tpe: Int, state: Int, schema: String,
                      table: String, query: String,
                      schemaVersion: Long = 42L): Array[Byte] =
    (s"""{"id":$id,"type":$tpe,"schema_id":1,"table_id":100,""" +
      s""""schema_name":"$schema","table_name":"$table","state":$state,""" +
      """"err":null,"err_count":0,"row_count":0,"schema_state":5,""" +
      """"snapshot_ver":0,"real_start_ts":1,"start_ts":1,"dependency_id":0,""" +
      s""""query":"$query",""" +
      s""""binlog":{"SchemaVersion":$schemaVersion,"DBInfo":null,"TableInfo":null,"FinishedTS":0},""" +
      """"version":1}""").getBytes("UTF-8")

  test("Done add-column job: bytes → row → JSON → AddColumn with ts stamping") {
    val meta = jobJson(103L, ActionAddColumn, JobStateDone, "app", "t1",
      "ALTER TABLE t1 ADD COLUMN c BIGINT DEFAULT 7")
    val (key, value) = encodeJobEntry(103L, meta, ActionAddColumn)
    val job = parseRawEntry(key, value, "put", startTs = 90L, commitTs = 100L)
      .getOrElse(fail("job not parsed"))
    assert(job.id == 103L && job.actionType == ActionAddColumn)
    assert(job.startTs == 90L && job.finishedTs == 100L)
    assert(job.schemaVersion == 42L)
    assert(toAction(job).contains(
      AddColumn("app", "t1", ColumnDef("c", "bigint", Some("7")), 100L)))
  }

  test("non-Done jobs are not replayed (normalized lifecycle gate)") {
    Seq(1 /* running */, 3 /* rollback done */, 6 /* synced */).foreach { st =>
      val meta = jobJson(1L, ActionAddColumn, st, "app", "t",
        "ALTER TABLE t ADD COLUMN c INT")
      val (key, value) = encodeJobEntry(1L, meta, ActionAddColumn)
      assert(parseRawEntry(key, value, "put", 1L, 2L).isEmpty, s"state $st leaked")
    }
  }

  test("non-shape actions classify to None; name-only actions skip text parse") {
    def act(tpe: Int, q: String) = {
      val (key, value) = encodeJobEntry(9L,
        jobJson(9L, tpe, JobStateDone, "app", "t9", q), tpe)
      parseRawEntry(key, value, "put", 1L, 2L).flatMap(toAction)
    }
    assert(act(7, "CREATE INDEX i ON t9 (c)").isEmpty, "add index")
    assert(act(34, "CREATE SEQUENCE s").isEmpty, "create sequence")
    assert(act(27, "LOCK TABLES t9 WRITE").isEmpty, "lock table")
    // DropTable classifies from the job fields alone — even with a
    // query text the registry parser would not need
    assert(act(ActionDropTable, "DROP TABLE `t9` /* comment */") ==
      Some(DropTable("app", "t9", 2L)))
    assert(act(ActionTruncateTable, "TRUNCATE t9") ==
      Some(TruncateTable("app", "t9", 2L)))
  }

  test("foreign-table keys, deletes, and non-record keys yield no job") {
    val meta = jobJson(5L, ActionAddColumn, JobStateDone, "a", "t", "ALTER TABLE t ADD COLUMN c INT")
    val (key, value) = encodeJobEntry(5L, meta, ActionAddColumn)
    assert(parseRawEntry(key, value, "delete", 1L, 2L).isEmpty)
    val userKey = TiKvCodec.encodeRecordKey(100L, TiKvCodec.IntHandle(5L))
    assert(parseRawEntry(userKey, value, "put", 1L, 2L).isEmpty)
    assert(parseRawEntry("m_meta".getBytes, value, "put", 1L, 2L).isEmpty)
  }

  test("a job stream folds into the schema registry end to end") {
    val jobs = Seq(
      (1L, ActionCreateTable, "CREATE TABLE t (id BIGINT, v DOUBLE)", 100L),
      (2L, ActionAddColumn, "ALTER TABLE t ADD COLUMN tag VARCHAR(10) DEFAULT 'x'", 200L),
      (3L, 7, "CREATE INDEX i ON t (v)", 300L), // ignored
      (4L, ActionModifyColumn, "ALTER TABLE t MODIFY COLUMN v DOUBLE", 400L),
      (5L, ActionDropColumn, "ALTER TABLE t DROP COLUMN v", 500L))
    val actions = jobs.flatMap { case (id, tpe, q, ts) =>
      val (key, value) = encodeJobEntry(id,
        jobJson(id, tpe, JobStateDone, "app", "t", q), tpe)
      parseRawEntry(key, value, "put", ts - 1, ts).flatMap(toAction)
    }
    assert(actions.size == 4, s"index job must be ignored: $actions")
    val reg = SchemaRegistry().applyAll(actions)
    val schema = reg.asOf("app", "t", 600L).getOrElse(fail("table missing"))
    assert(schema.columns.map(_.name) == Seq("id", "tag"))
    // as-of before the drop still sees v
    assert(reg.asOf("app", "t", 450L).get.columns.map(_.name) == Seq("id", "v", "tag"))
  }

  test("v1-format job row: parseRawEntry dispatches on the version byte " +
      "and decodes the old row format too") {
    import TiKvCodec._
    val meta = jobJson(77L, ActionAddColumn, JobStateDone, "app", "t1",
      "ALTER TABLE t1 ADD COLUMN c BIGINT")
    // the job table row in the PRE-v2 format: colID/datum pairs, the
    // job_meta blob under column 5
    val key = TiKvCodec.encodeRecordKey(DdlJobParser.JobTableId, IntHandle(77L))
    val v1Value = TiKvCodec.encodeV1(Seq(
      5L -> DBytes(meta),
      6L -> DInt(ActionAddColumn.toLong)))
    assert(!TiKvCodec.isNewFormat(v1Value), "fixture must be a v1 row")
    val job = parseRawEntry(key, v1Value, "put", startTs = 9L, commitTs = 10L)
      .getOrElse(fail("v1 job row not parsed"))
    assert(job.id == 77L && job.actionType == ActionAddColumn &&
      job.finishedTs == 10L)
  }

  test("v1 JSON datum raises a descriptive error, not a MatchError") {
    import TiKvCodec._
    // a v1 row whose second datum is a JSON cell (flag 10): decodeOne
    // must fail with a message naming the unsupported flag
    val bad = encodeValueDatum(DInt(1L)) ++ Array[Byte](JsonFlag, 0x01)
    val e = intercept[IllegalArgumentException] {
      TiKvCodec.decodeV1(encodeValueDatum(DInt(7L)) ++ bad)
    }
    assert(e.getMessage.contains("JSON"), e.getMessage)
  }
}
