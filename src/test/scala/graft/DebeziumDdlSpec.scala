package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DebeziumFull
import graft.model.MySqlDdl.{MySqlCol, MySqlTable}

/** Debezium schema-change (DDL) events — dbzCodec.EncodeDDLEvent
  * (debezium/codec.go:1223-1639): change-type classification, the
  * tableChanges table/column rendering, the rename two-part id, the
  * DROP/TRUNCATE shapes, and the full message with schema blocks. */
class DebeziumDdlSpec extends AnyFunSuite {

  private val t = MySqlTable("app", "orders", Seq(
    MySqlCol("id", "bigint", notNull = true, pk = true),
    MySqlCol("name", "varchar", flen = 64),
    MySqlCol("amount", "decimal", flen = 18, dec = 2),
    MySqlCol("ratio", "double"),
    MySqlCol("kind", "enum", elems = Seq("a", "b"),
      default = Some("a")),
    MySqlCol("created", "timestamp", dec = 3)))

  test("change-type classification mirrors the reference's action switch") {
    assert(DebeziumFull.ddlChangeType("CREATE TABLE t (id int)") == Some("CREATE"))
    assert(DebeziumFull.ddlChangeType("create view v as select 1") == Some("CREATE"))
    assert(DebeziumFull.ddlChangeType("ALTER TABLE t ADD COLUMN c int") == Some("ALTER"))
    // ADD INDEX is ALTER while DROP INDEX is DROP (codec.go:1258,1272)
    assert(DebeziumFull.ddlChangeType("CREATE INDEX i ON t (c)") == Some("ALTER"))
    assert(DebeziumFull.ddlChangeType("DROP INDEX i ON t") == Some("DROP"))
    assert(DebeziumFull.ddlChangeType("RENAME TABLE a TO b") == Some("ALTER"))
    assert(DebeziumFull.ddlChangeType("DROP TABLE t") == Some("DROP"))
    assert(DebeziumFull.ddlChangeType("TRUNCATE TABLE t") == Some("DROP"))
    // unsupported types error in the reference (ErrDDLUnsupportType)
    assert(DebeziumFull.ddlChangeType("RECOVER TABLE t") == None)
    assert(DebeziumFull.ddlChangeType("FLASHBACK CLUSTER TO TIMESTAMP '..'") == None)
  }

  test("jdbc types follow MySQLType2JdbcType (tinyint→SMALLINT, text→VARCHAR)") {
    def c(base: String) = MySqlCol("x", base)
    assert(DebeziumFull.jdbcTypeOf(c("tinyint")) == 5)
    assert(DebeziumFull.jdbcTypeOf(c("smallint")) == 5)
    assert(DebeziumFull.jdbcTypeOf(c("int")) == 4)
    assert(DebeziumFull.jdbcTypeOf(c("bigint")) == -5)
    assert(DebeziumFull.jdbcTypeOf(c("float")) == 6)
    assert(DebeziumFull.jdbcTypeOf(c("double")) == 8)
    assert(DebeziumFull.jdbcTypeOf(c("decimal")) == 3)
    assert(DebeziumFull.jdbcTypeOf(c("timestamp")) == 2014)
    assert(DebeziumFull.jdbcTypeOf(c("datetime")) == 93)
    assert(DebeziumFull.jdbcTypeOf(c("text")) == 12)
    assert(DebeziumFull.jdbcTypeOf(c("blob")) == 2004)
    assert(DebeziumFull.jdbcTypeOf(c("varbinary")) == -3)
    assert(DebeziumFull.jdbcTypeOf(c("enum")) == 1)
    assert(DebeziumFull.jdbcTypeOf(c("json")) == 1111)
  }

  test("type name/expression and length/scale per helper.go") {
    // varchar/char/decimal render the bare prefix (helper.go:276-277)
    assert(DebeziumFull.typeNameAndExpression(MySqlCol("x", "varchar", flen = 64)) ==
      ("VARCHAR", "VARCHAR"))
    assert(DebeziumFull.typeNameAndExpression(MySqlCol("x", "decimal", flen = 18, dec = 2)) ==
      ("DECIMAL", "DECIMAL"))
    // int with non-default display width carries the suffix in the
    // expression only
    assert(DebeziumFull.typeNameAndExpression(MySqlCol("x", "int", flen = 5)) ==
      ("INT", "INT(5)"))
    assert(DebeziumFull.typeNameAndExpression(MySqlCol("x", "int", flen = 11)) ==
      ("INT", "INT"))
    assert(DebeziumFull.typeNameAndExpression(
      MySqlCol("x", "int", flen = 10, unsigned = true)) ==
      ("INT UNSIGNED", "INT UNSIGNED"))
    assert(DebeziumFull.typeNameAndExpression(
      MySqlCol("x", "enum", elems = Seq("a", "b"))) ==
      ("ENUM", "ENUM('a','b')"))
    // lengths: fsp for temporals, declared-vs-default for numerics,
    // 2n-1 / 1 for SET/ENUM
    assert(DebeziumFull.lengthOf(MySqlCol("x", "timestamp", dec = 3)) == Some(3))
    assert(DebeziumFull.lengthOf(MySqlCol("x", "bigint")) == None)
    assert(DebeziumFull.lengthOf(MySqlCol("x", "bigint", flen = 25)) == Some(25))
    assert(DebeziumFull.lengthOf(MySqlCol("x", "varchar", flen = 64)) == Some(64))
    assert(DebeziumFull.lengthOf(MySqlCol("x", "set", elems = Seq("a", "b", "c"))) == Some(5))
    assert(DebeziumFull.lengthOf(MySqlCol("x", "enum", elems = Seq("a", "b"))) == Some(1))
    assert(DebeziumFull.scaleOf(MySqlCol("x", "decimal", flen = 18, dec = 2)) == Some(2))
    assert(DebeziumFull.scaleOf(MySqlCol("x", "bigint")) == None)
  }

  test("table block: charset on textual columns, pk names, positions") {
    val block = DebeziumFull.ddlTableBlockJson(t)
    assert(block.startsWith(
      """{"defaultCharsetName":"utf8mb4","primaryKeyColumnNames":["id"],"columns":["""))
    assert(block.contains(
      """{"name":"id","jdbcType":-5,"nativeType":null,"comment":null,""" +
        """"defaultValueExpression":null,"enumValues":null,"typeName":"BIGINT",""" +
        """"typeExpression":"BIGINT","charsetName":null,"length":null,"scale":null,""" +
        """"position":1,"optional":false,"autoIncremented":false,"generated":false}"""))
    assert(block.contains(
      """{"name":"kind","jdbcType":1,"nativeType":null,"comment":null,""" +
        """"defaultValueExpression":"a","enumValues":["'a'","'b'"],"typeName":"ENUM",""" +
        """"typeExpression":"ENUM('a','b')","charsetName":"utf8mb4","length":1,""" +
        """"scale":null,"position":5,"optional":true,"autoIncremented":false,"generated":false}"""))
    assert(block.endsWith("""],"comment":null}"""))
  }

  test("golden: full ALTER message with key and value schema blocks") {
    val key = DebeziumFull.ddlKeyJson("app")
    assert(key ==
      """{"payload":{"databaseName":"app"},"schema":{"type":"struct",""" +
        """"name":"io.debezium.connector.mysql.SchemaChangeKey","optional":false,""" +
        """"version":1,"fields":[{"field":"databaseName","optional":false,"type":"string"}]}}""")
    val v = DebeziumFull.ddlValueJson("graft", "app", "orders",
      "ALTER TABLE orders ADD COLUMN note text", commitTs = 123000000L,
      commitMs = 123L, tableBlock = Some(DebeziumFull.ddlTableBlockJson(t)))
    assert(v.startsWith(
      """{"payload":{"source":{"version":"2.4.0.Final","connector":"TiCDC",""" +
        """"name":"graft","ts_ms":123,"snapshot":"false","db":"app","table":"orders",""" +
        """"server_id":0,"gtid":null,"file":"","pos":0,"row":0,"thread":0,"query":null,""" +
        """"commit_ts":123000000,"cluster_id":"graft"},"ts_ms":123,"databaseName":"app",""" +
        """"schemaName":null,"ddl":"ALTER TABLE orders ADD COLUMN note text",""" +
        """"tableChanges":[{"type":"ALTER","id":"\"app\".\"orders\"","table":{"""))
    assert(v.contains(""""schema":{"optional":false,"type":"struct","version":1,""" +
      """"name":"io.debezium.connector.mysql.SchemaChangeValue","fields":["""))
    assert(v.contains("""io.debezium.connector.schema.Change"""))
    assert(v.contains("""io.debezium.connector.schema.Table"""))
    assert(v.contains("""io.debezium.connector.schema.Column"""))
  }

  test("DROP renders table:null, TRUNCATE an empty tableChanges") {
    val drop = DebeziumFull.ddlValueJson("graft", "app", "orders",
      "DROP TABLE orders", 1L, 0L, None, disableSchema = true)
    assert(drop.contains(
      """"tableChanges":[{"type":"DROP","id":"\"app\".\"orders\"","table":null}]"""))
    val trunc = DebeziumFull.ddlValueJson("graft", "app", "orders",
      "TRUNCATE TABLE orders", 1L, 0L, Some("{}"), disableSchema = true)
    assert(trunc.contains(""""tableChanges":[]"""))
  }

  test("RENAME carries the two-part old,new id") {
    val v = DebeziumFull.ddlValueJson("graft", "app", "orders_v2",
      "RENAME TABLE orders TO orders_v2", 1L, 0L,
      Some(DebeziumFull.ddlTableBlockJson(t)), oldId = Some(("app", "orders")),
      disableSchema = true)
    assert(v.contains(
      """"id":"\"app\".\"orders\",\"app\".\"orders_v2\""""))
  }

  test("watermark (checkpoint) envelope: empty-source op:m value, empty key payload") {
    val k = DebeziumFull.watermarkKeyJson("graft")
    assert(k == """{"payload":{},"schema":{"type":"struct",""" +
      """"name":"graft.watermark.Key","optional":false,"fields":[]}}""")
    val v = DebeziumFull.watermarkValueJson("graft", 5000000L)
    assert(v.contains(""""db":"","table":"""""))
    assert(v.contains(""""commit_ts":5000000"""))
    assert(v.contains(""""ts_ms":5"""))
    assert(v.contains(""""op":"m""""))
    assert(v.contains(""""name":"graft.watermark.Envelope""""))
    // resolvedMessageFor dispatches debezium to the watermark envelope
    val (rk, rv) = graft.functions.Codecs.resolvedMessageFor(
      graft.model.Protocol.Debezium, 5000000L)
    assert(rk == k && rv == v)
  }

  test("unsupported DDL types raise like ErrDDLUnsupportType") {
    intercept[IllegalArgumentException] {
      DebeziumFull.ddlValueJson("graft", "app", "t", "RECOVER TABLE t", 1L, 0L, None)
    }
  }

  test("registry schema renders the live post-fold table block") {
    import graft.model.{ColumnDef, TableSchema}
    val sch = TableSchema("app", "t", versionTs = 9L, columns = Seq(
      ColumnDef("id", "bigint"),
      ColumnDef("name", "varchar(64)"),
      ColumnDef("amount", "decimal(18,2)"),
      ColumnDef("cnt", "int(10) unsigned", default = Some("0"))))
    val t2 = DebeziumFull.tableFromRegistry(sch)
    assert(t2.cols.map(_.base) == Seq("bigint", "varchar", "decimal", "int"))
    assert(t2.cols(1).flen == 64)
    assert(t2.cols(2).dec == 2)
    assert(t2.cols(3).unsigned && t2.cols(3).default == Some("0"))
    assert(t2.cols.head.pk && t2.cols.head.notNull)
    val block = DebeziumFull.ddlTableBlockJson(t2)
    assert(block.contains(""""primaryKeyColumnNames":["id"]"""))
    assert(block.contains(""""name":"cnt","jdbcType":4""")) // INT UNSIGNED stays INTEGER jdbc
    assert(block.contains(""""typeName":"INT UNSIGNED""""))
  }

  test("evolving-store wiring: folded jobs render the POST-fold shape and " +
      "the consumer parses the schema-change form") {
    import graft.model.{DdlParser, SchemaStore}
    val store = SchemaStore()
      .applyAction(DdlParser.parse("CREATE TABLE app.t (id BIGINT, v BIGINT)", 10L).get)
      .applyAction(DdlParser.parse("ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7", 100L).get)
    // the Changefeed loop's resolution: registry latest → MySqlTable
    val liveShapes = Seq(("app", "t")).flatMap { case (s, t2) =>
      store.registry.latest(s, t2)
        .map(sch => ((s, t2), DebeziumFull.tableFromRegistry(sch)))
    }.toMap
    val spark = SparkSpec.spark
    import spark.implicits._
    val ddl = Seq(("app", "t", 100L, "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7"))
      .toDF("_schema", "_table", "version_ts", "query")
    val msg = graft.functions.Codecs.ddlMessageFor(ddl,
      graft.model.Protocol.Debezium,
      tableFor = (s, t2) => liveShapes.get((s, t2)))
      .select("_key", "_value").head()
    assert(msg.getString(0).contains(""""databaseName":"app""""))
    val v = msg.getString(1)
    // the tableChanges block carries the post-ALTER column with its default
    assert(v.contains(""""name":"k","jdbcType":-5"""))
    assert(v.contains(""""defaultValueExpression":"7""""))
    assert(v.contains(""""primaryKeyColumnNames":["id"]"""))
    // consumer half: wireDdls recognizes and parses the debezium form
    val parsed = MqConsume.wireDdls(Seq(v).toDF("_value"))
    assert(parsed == Seq((100L, "app", "t",
      "ALTER TABLE app.t ADD COLUMN k BIGINT DEFAULT 7")))
  }

  test("messages parse as JSON (escaping sound incl. quotes in DDL text)") {
    val v = DebeziumFull.ddlValueJson("graft", "app", "t",
      """ALTER TABLE t ADD COLUMN c varchar(10) DEFAULT "x\y"""",
      1L, 0L, Some(DebeziumFull.ddlTableBlockJson(t)))
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parsed = Seq(v).toDF("j")
      .select(
        get_json_object(col("j"), "$.payload.ddl").as("ddl"),
        get_json_object(col("j"), "$.payload.tableChanges[0].id").as("id"),
        get_json_object(col("j"), "$.schema.name").as("sn"))
      .head()
    assert(parsed.getString(0) == """ALTER TABLE t ADD COLUMN c varchar(10) DEFAULT "x\y"""")
    assert(parsed.getString(1) == "\"app\".\"t\"")
    assert(parsed.getString(2) == "io.debezium.connector.mysql.SchemaChangeValue")
  }
}
