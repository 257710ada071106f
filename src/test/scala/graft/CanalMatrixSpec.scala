package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.CanalFull
import graft.model.MySqlDdl
import graft.model.MySqlDdl.MySqlTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Canal-JSON fidelity against the reference's integration type
  * matrix (tests/integration_tests/canal_json_basic/data/data.sql and
  * data_gbk.sql): every CREATE TABLE + INSERT of the matrix is parsed
  * and encoded with [[CanalFull]], and the messages are checked
  * field-by-field against expectations hand-derived from the Go
  * encoder (canal/helper.go formatColumnValue + mysqlType2JavaType,
  * common/helper.go GetMySQLType) — NOT computed from the code under
  * test.
  *
  * The matrix has no golden output file in the reference (the
  * integration test verifies through a consumer + DB diff), so the
  * expectations here pin: mysqlType strings, sqlType codes including
  * the value-dependent unsigned promotions, pkNames, es = TSO>>18,
  * and the full data map for every INSERT row of every matrix table.
  *
  * Documented divergences (SURVEY §8): JSON values re-render compact
  * (TiDB spaces after `:`/`,`); float/double formatting goes
  * scientific beyond 1e7 (Go 'f' never does) — no matrix value hits
  * that range.
  */
class CanalMatrixSpec extends SparkFunSuite {
  private val mapper = new ObjectMapper()
  private val dataDir = "/root/reference/tests/integration_tests/canal_json_basic/data"
  private def available: Boolean = Files.isDirectory(Paths.get(dataDir))

  private val TSO = 1700000000000L << 18 // es must come out as the ms part

  /** Replay a script's CREATE TABLE + INSERT statements (auto_inc and
    * column defaults applied) and encode every insert row. Returns
    * table name → encoded messages in insert order. */
  private def encodeScript(script: String): Map[String, Seq[String]] = {
    val tables = scala.collection.mutable.Map.empty[String, MySqlTable]
    val counters = scala.collection.mutable.Map.empty[String, Long]
    val out = scala.collection.mutable.Map.empty[String, Vector[String]]
    MySqlDdl.splitStatements(script).foreach { stmt =>
      val lower = stmt.toLowerCase
      if (lower.startsWith("create table")) {
        MySqlDdl.parseCreateTable(stmt, "test").foreach(t => tables(t.table) = t)
      } else if (lower.startsWith("insert")) {
        val rows = MySqlDdl.parseInsert(stmt)
        rows.headOption.map(_.table).filter(tables.contains).foreach { tn =>
          val t = tables(tn)
          val resolved: Seq[Seq[Option[String]]] = rows.map { r =>
            val positional = r.values.keys.forall(_.startsWith("_"))
            t.cols.zipWithIndex.map { case (c, i) =>
              val given =
                if (positional && r.values.nonEmpty) r.values.get(s"_$i").flatten
                else r.values.getOrElse(c.name, None)
              given.orElse {
                if (c.autoInc) {
                  val n = counters.getOrElse(tn, 0L) + 1
                  counters(tn) = n
                  Some(n.toString)
                } else c.default
              }
            }
          }
          val img = StructType(t.cols.map(c => StructField(c.name, StringType, nullable = true)))
          val schema = StructType(Seq(
            StructField("before", img, nullable = true), StructField("after", img, nullable = true),
            StructField("_op", StringType), StructField("_schema", StringType),
            StructField("_table", StringType), StructField("_tso", LongType)))
          val sparkRows = resolved.map(vals =>
            Row(null, Row(vals.map(_.orNull): _*), "I", t.schema, t.table, TSO))
          val df = spark.createDataFrame(sparkRows.asJava, schema)
          val msgs = CanalFull.encode(df, t).select(col("_value"))
            .collect().map(_.getString(0)).toVector
          out(tn) = out.getOrElse(tn, Vector.empty) ++ msgs
        }
      }
    }
    out.toMap
  }

  private lazy val encoded: Map[String, Seq[String]] = {
    val bytes = Files.readAllBytes(Paths.get(s"$dataDir/data.sql"))
    encodeScript(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  private def parsed(table: String, i: Int) = mapper.readTree(encoded(table)(i))

  private def dataMap(table: String, i: Int): Map[String, Option[String]] = {
    val d = parsed(table, i).get("data").get(0)
    d.properties().asScala.map { e =>
      e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
    }.toMap
  }

  private def sqlTypeMap(table: String, i: Int): Map[String, Int] = {
    val d = parsed(table, i).get("sqlType")
    d.properties().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
  }

  private def mysqlTypeMap(table: String): Map[String, String] = {
    val d = parsed(table, 0).get("mysqlType")
    d.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  private def checkHeader(table: String, i: Int): Unit = {
    val n = parsed(table, i)
    assert(n.get("id").asLong == 0L)
    assert(n.get("database").asText == "test")
    assert(n.get("table").asText == table)
    assert(n.get("isDdl").asBoolean == false)
    assert(n.get("type").asText == "INSERT")
    assert(n.get("es").asLong == 1700000000000L, "es must be TSO >> 18")
    assert(n.get("sql").asText == "")
    assert(n.get("old").isNull)
    assert(n.get("pkNames").asScala.map(_.asText()).toSeq == Seq("id"))
  }

  test("tp_int: signed integer family") {
    assume(available)
    assert(mysqlTypeMap("tp_int") == Map("id" -> "int", "c_tinyint" -> "tinyint",
      "c_smallint" -> "smallint", "c_mediumint" -> "mediumint", "c_int" -> "int",
      "c_bigint" -> "bigint"))
    assert(sqlTypeMap("tp_int", 0) == Map("id" -> 4, "c_tinyint" -> -6,
      "c_smallint" -> 5, "c_mediumint" -> 4, "c_int" -> 4, "c_bigint" -> -5))
    (0 to 3).foreach(checkHeader("tp_int", _))
    assert(dataMap("tp_int", 0) == Map("id" -> Some("1"), "c_tinyint" -> None,
      "c_smallint" -> None, "c_mediumint" -> None, "c_int" -> None, "c_bigint" -> None))
    assert(dataMap("tp_int", 2) == Map("id" -> Some("3"), "c_tinyint" -> Some("127"),
      "c_smallint" -> Some("32767"), "c_mediumint" -> Some("8388607"),
      "c_int" -> Some("2147483647"), "c_bigint" -> Some("9223372036854775807")))
    assert(dataMap("tp_int", 3) == Map("id" -> Some("4"), "c_tinyint" -> Some("-128"),
      "c_smallint" -> Some("-32768"), "c_mediumint" -> Some("-8388608"),
      "c_int" -> Some("-2147483648"), "c_bigint" -> Some("-9223372036854775808")))
  }

  test("tp_unsigned_int: unsigned family with value-dependent sqlType promotions") {
    assume(available)
    assert(mysqlTypeMap("tp_unsigned_int") == Map("id" -> "int",
      "c_unsigned_tinyint" -> "tinyint unsigned", "c_unsigned_smallint" -> "smallint unsigned",
      "c_unsigned_mediumint" -> "mediumint unsigned", "c_unsigned_int" -> "int unsigned",
      "c_unsigned_bigint" -> "bigint unsigned"))
    // row 2: max values promote (tiny>127→SMALLINT, small>32767→INTEGER,
    // mediumint never promotes, int>MaxInt32→BIGINT, bigint>MaxInt64→DECIMAL)
    assert(sqlTypeMap("tp_unsigned_int", 2) == Map("id" -> 4, "c_unsigned_tinyint" -> 5,
      "c_unsigned_smallint" -> 4, "c_unsigned_mediumint" -> 4,
      "c_unsigned_int" -> -5, "c_unsigned_bigint" -> 3))
    // row 3: signed-max values do NOT promote
    assert(sqlTypeMap("tp_unsigned_int", 3) == Map("id" -> 4, "c_unsigned_tinyint" -> -6,
      "c_unsigned_smallint" -> 5, "c_unsigned_mediumint" -> 4,
      "c_unsigned_int" -> 4, "c_unsigned_bigint" -> -5))
    // row 4: first out-of-signed-range values promote again
    assert(sqlTypeMap("tp_unsigned_int", 4) == Map("id" -> 4, "c_unsigned_tinyint" -> 5,
      "c_unsigned_smallint" -> 4, "c_unsigned_mediumint" -> 4,
      "c_unsigned_int" -> -5, "c_unsigned_bigint" -> 3))
    assert(dataMap("tp_unsigned_int", 2) == Map("id" -> Some("3"),
      "c_unsigned_tinyint" -> Some("255"), "c_unsigned_smallint" -> Some("65535"),
      "c_unsigned_mediumint" -> Some("16777215"), "c_unsigned_int" -> Some("4294967295"),
      "c_unsigned_bigint" -> Some("18446744073709551615")))
  }

  test("tp_real and tp_unsigned_real: float/double/decimal rendering") {
    assume(available)
    assert(mysqlTypeMap("tp_real") == Map("id" -> "int", "c_float" -> "float",
      "c_double" -> "double", "c_decimal" -> "decimal", "c_decimal_2" -> "decimal"))
    assert(sqlTypeMap("tp_real", 0) == Map("id" -> 4, "c_float" -> 7,
      "c_double" -> 8, "c_decimal" -> 3, "c_decimal_2" -> 3))
    // DECIMAL (no args) = DECIMAL(10,0): 2020.0404 rounds to "2020";
    // DECIMAL(10,4) keeps declared scale: "-179394.2330"
    assert(dataMap("tp_real", 1) == Map("id" -> Some("2"), "c_float" -> Some("2020.0201"),
      "c_double" -> Some("2020.0303"), "c_decimal" -> Some("2020"),
      "c_decimal_2" -> Some("2021.1208")))
    assert(dataMap("tp_real", 2) == Map("id" -> Some("3"),
      "c_float" -> Some("-2.7182817"), // float32 shortest round-trip (Go FormatFloat(f,-1,32) prints the same)
      "c_double" -> Some("-3.1415926"), "c_decimal" -> Some("-8000"),
      "c_decimal_2" -> Some("-179394.2330")))
    assert(mysqlTypeMap("tp_unsigned_real") == Map("id" -> "int",
      "c_unsigned_float" -> "float unsigned", "c_unsigned_double" -> "double unsigned",
      "c_unsigned_decimal" -> "decimal unsigned", "c_unsigned_decimal_2" -> "decimal unsigned"))
    assert(dataMap("tp_unsigned_real", 1) == Map("id" -> Some("2"),
      "c_unsigned_float" -> Some("2020.0201"), "c_unsigned_double" -> Some("2020.0303"),
      "c_unsigned_decimal" -> Some("2020"), "c_unsigned_decimal_2" -> Some("2021.1208")))
  }

  test("tp_time: temporal literal forms") {
    assume(available)
    assert(mysqlTypeMap("tp_time") == Map("id" -> "int", "c_date" -> "date",
      "c_datetime" -> "datetime", "c_timestamp" -> "timestamp",
      "c_time" -> "time", "c_year" -> "year"))
    assert(sqlTypeMap("tp_time", 0) == Map("id" -> 4, "c_date" -> 91,
      "c_datetime" -> 93, "c_timestamp" -> 93, "c_time" -> 92, "c_year" -> 12))
    assert(dataMap("tp_time", 1) == Map("id" -> Some("2"), "c_date" -> Some("2020-02-20"),
      "c_datetime" -> Some("2020-02-20 02:20:20"), "c_timestamp" -> Some("2020-02-20 02:20:20"),
      "c_time" -> Some("02:20:20"), "c_year" -> Some("2020")))
  }

  test("tp_text and tp_blob: CLOB vs ISO-8859-1 BLOB framing") {
    assume(available)
    assert(mysqlTypeMap("tp_text") == Map("id" -> "int", "c_tinytext" -> "tinytext",
      "c_text" -> "text", "c_mediumtext" -> "mediumtext", "c_longtext" -> "longtext"))
    assert(sqlTypeMap("tp_text", 0) == Map("id" -> 4, "c_tinytext" -> 2005,
      "c_text" -> 2005, "c_mediumtext" -> 2005, "c_longtext" -> 2005))
    assert(dataMap("tp_text", 1)("c_text") == Some("89504E470D0A1A0A"))
    assert(mysqlTypeMap("tp_blob") == Map("id" -> "int", "c_tinyblob" -> "tinyblob",
      "c_blob" -> "blob", "c_mediumblob" -> "mediumblob", "c_longblob" -> "longblob"))
    assert(sqlTypeMap("tp_blob", 0) == Map("id" -> 4, "c_tinyblob" -> 2004,
      "c_blob" -> 2004, "c_mediumblob" -> 2004, "c_longblob" -> 2004))
    // x'89504E470D0A1A0A' framed as the ISO-8859-1 char view
    val png = "\u0089PNG\r\n\u001a\n"
    assert(dataMap("tp_blob", 1)("c_blob") == Some(png))
  }

  test("tp_char_binary: char/varchar text vs binary/varbinary BLOB with BINARY(n) padding") {
    assume(available)
    assert(mysqlTypeMap("tp_char_binary") == Map("id" -> "int", "c_char" -> "char",
      "c_varchar" -> "varchar", "c_binary" -> "binary", "c_varbinary" -> "varbinary"))
    assert(sqlTypeMap("tp_char_binary", 0) == Map("id" -> 4, "c_char" -> 1,
      "c_varchar" -> 12, "c_binary" -> 2004, "c_varbinary" -> 2004))
    val png = "\u0089PNG\r\n\u001a\n"
    val d = dataMap("tp_char_binary", 1)
    assert(d("c_char") == Some("89504E470D0A1A0A"))
    assert(d("c_varchar") == Some("89504E470D0A1A0A"))
    assert(d("c_binary") == Some(png + "\u0000" * 8), "BINARY(16) zero-pads to 16")
    assert(d("c_varbinary") == Some(png))
  }

  test("tp_other: enum index, set bitmask, bit value, json") {
    assume(available)
    assert(mysqlTypeMap("tp_other") == Map("id" -> "int", "c_enum" -> "enum",
      "c_set" -> "set", "c_bit" -> "bit", "c_json" -> "json"))
    assert(sqlTypeMap("tp_other", 0) == Map("id" -> 4, "c_enum" -> 4,
      "c_set" -> -7, "c_bit" -> -7, "c_json" -> 12))
    val d1 = dataMap("tp_other", 1)
    assert(d1("c_enum") == Some("1"), "enum 'a' = 1-based index 1")
    assert(d1("c_set") == Some("3"), "set 'a,b' = bitmask 1|2")
    assert(d1("c_bit") == Some("65"), "b'1000001' = 65")
    val d2 = dataMap("tp_other", 2)
    assert(d2("c_enum") == Some("2"))
    assert(d2("c_set") == Some("6"), "set 'b,c' = bitmask 2|4")
    // json: semantic equality (rendering is compact — documented divergence)
    val j = mapper.readTree(d1("c_json").get)
    assert(j.get("key1").asText == "value1" && j.get("key2").asText == "value2")
    assert(!d1("c_json").get.contains("\n"), "json value must be normalized to one line")
  }

  test("cs_gbk: utf8 text, gbk columns, tinyblob image") {
    assume(available)
    assert(mysqlTypeMap("cs_gbk") == Map("id" -> "int", "name" -> "varchar",
      "country" -> "char", "city" -> "varchar", "description" -> "text",
      "image" -> "tinyblob"))
    assert(sqlTypeMap("cs_gbk", 0) == Map("id" -> 4, "name" -> 12, "country" -> 1,
      "city" -> 12, "description" -> 2005, "image" -> 2004))
    val d = dataMap("cs_gbk", 0)
    assert(d("name") == Some("测试"))
    assert(d("country") == Some("中国"))
    assert(d("city") == Some("上海"))
    assert(d("description") == Some("你好,世界"))
    // 0xC4E3BAC3CAC0BDE7 ("你好世界" in GBK) as ISO-8859-1 char view
    assert(d("image") == Some("ÄãºÃÊÀ½ç"))
  }

  test("t_null: string forms of NULL stay strings; only SQL NULL is null") {
    assume(available)
    assert(mysqlTypeMap("t_null") == Map("id" -> "bigint unsigned", "col" -> "varchar"))
    assert(sqlTypeMap("t_null", 0) == Map("id" -> -5, "col" -> 12))
    val vals = (0 to 6).map(i => dataMap("t_null", i)("col"))
    assert(vals == Seq(Some("test"), Some("null"), Some("test2"), Some("Null"),
      Some("NULL"), Some(""), Some("nüll")))
  }

  test("DDL messages: matrix DDL statements classify and marshal like the reference") {
    assume(available)
    // the -- ddls section of data.sql exercises every canal EventType
    val cases = Seq(
      ("CREATE TABLE test_ddl1 (id INT AUTO_INCREMENT, c1 INT, PRIMARY KEY (id))", "CREATE"),
      ("RENAME TABLE test_ddl1 TO test_ddl", "RENAME"),
      ("ALTER TABLE test_ddl ADD INDEX test_add_index (c1)", "CINDEX"),
      ("DROP INDEX test_add_index ON test_ddl", "DINDEX"),
      ("ALTER TABLE test_ddl ADD COLUMN c2 INT NOT NULL", "ALTER"),
      ("TRUNCATE TABLE test_ddl", "TRUNCATE"),
      ("DROP TABLE test_ddl2", "ERASE"),
      ("CREATE DATABASE other", "QUERY"))
    cases.foreach { case (ddl, expected) =>
      assert(CanalFull.ddlEventType(ddl) == expected, ddl)
    }
    val msg = mapper.readTree(CanalFull.ddlMessage(
      "test", "test_ddl", "ALTER TABLE test_ddl ADD COLUMN c2 INT NOT NULL",
      tso = TSO, tidbExtension = true))
    assert(msg.get("isDdl").asBoolean)
    assert(msg.get("type").asText == "ALTER")
    assert(msg.get("es").asLong == 1700000000000L)
    assert(msg.get("sql").asText.contains("ADD COLUMN c2"))
    // row-level maps are null on DDL messages (json.Marshal of nil)
    Seq("pkNames", "sqlType", "mysqlType", "data", "old").foreach(f =>
      assert(msg.get(f).isNull, f))
    assert(msg.get("_tidb").get("commitTs").asLong == TSO)
  }

  test("watermark message: TIDB_WATERMARK layout with _tidb.watermarkTs") {
    val msg = mapper.readTree(CanalFull.watermarkMessage(TSO))
    assert(!msg.get("isDdl").asBoolean)
    assert(msg.get("type").asText == "TIDB_WATERMARK")
    assert(msg.get("database").asText == "" && msg.get("table").asText == "")
    assert(msg.get("es").asLong == 1700000000000L)
    assert(msg.get("_tidb").get("watermarkTs").asLong == TSO)
    assert(msg.get("data").isNull && msg.get("old").isNull)
  }

  test("_tidb extension block on DML when enabled") {
    assume(available)
    val t = MySqlDdl.parseCreateTable(
      "create table ext_t (id int primary key, v varchar(8))", "test").get
    val img = StructType(t.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true), StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_tso", LongType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(null, Row("1", "x"), "I", "test", "ext_t", TSO)), schema)
    val on = CanalFull.encode(df, t, tidbExtension = true).select(col("_value")).head().getString(0)
    val off = CanalFull.encode(df, t).select(col("_value")).head().getString(0)
    val n = mapper.readTree(on)
    assert(n.get("_tidb").get("commitTs").asLong == TSO)
    assert(mapper.readTree(off).get("_tidb") == null, "extension off omits _tidb")
  }

  test("data_gbk.sql (GBK-encoded bytes) produces identical cs_gbk messages") {
    assume(available)
    val gbk = new String(
      Files.readAllBytes(Paths.get(s"$dataDir/data_gbk.sql")),
      java.nio.charset.Charset.forName("GBK"))
    val viaGbk = encodeScript(gbk)
    assert(viaGbk("cs_gbk") == encoded("cs_gbk"),
      "GBK client bytes must decode to the same wire messages as utf8")
  }

  test("content-compatible mode renders the full TiDB type description " +
      "(canal_json_content_compatible)") {
    val t = MySqlDdl.parseCreateTable(
      """create table cc (
        |  id int primary key auto_increment,
        |  a tinyint, b tinyint unsigned,
        |  c bigint, d bigint unsigned,
        |  e varchar(20), f char(4),
        |  g decimal(10,2), h decimal,
        |  i datetime(3), j datetime,
        |  k bit(5), l year,
        |  m enum('x','y'), n set('p','q'),
        |  o float(10,3), p double, q text
        |)""".stripMargin, "test").get
    val desc = t.cols.map(c => c.name -> c.typeDesc).toMap
    // signedness-dependent default display widths (TiDB field_type.go)
    assert(desc("id") == "int(11)")
    assert(desc("a") == "tinyint(4)" && desc("b") == "tinyint(3) unsigned")
    assert(desc("c") == "bigint(20)" && desc("d") == "bigint(20) unsigned")
    assert(desc("e") == "varchar(20)" && desc("f") == "char(4)")
    assert(desc("g") == "decimal(10,2)" && desc("h") == "decimal(10,0)")
    assert(desc("i") == "datetime(3)" && desc("j") == "datetime")
    assert(desc("k") == "bit(5)" && desc("l") == "year(4)")
    assert(desc("m") == "enum('x','y')" && desc("n") == "set('p','q')")
    assert(desc("o") == "float(10,3)" && desc("p") == "double" && desc("q") == "text")

    // the encoder's mysqlType map switches form with the knob; the
    // short form stays the default
    val img = StructType(t.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true), StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_tso", LongType)))
    val row = Row(null, Row(t.cols.map(_ => "1"): _*), "I", "test", "cc", TSO)
    val df = spark.createDataFrame(Seq(row).asJava, schema)
    def mysqlTypes(contentCompatible: Boolean): Map[String, String] = {
      val msg = CanalFull.encode(df, t, contentCompatible = contentCompatible)
        .select(col("_value")).head().getString(0)
      val node = mapper.readTree(msg).get("mysqlType")
      t.cols.map(c => c.name -> node.get(c.name).asText()).toMap
    }
    assert(mysqlTypes(contentCompatible = true) == desc)
    val short = mysqlTypes(contentCompatible = false)
    assert(short("id") == "int" && short("b") == "tinyint unsigned" &&
      short("m") == "enum" && short("k") == "bit")
  }
}
