package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.functions.DebeziumFull
import graft.model.MySqlDdl
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-byte parity against the reference's own Debezium fixture
  * (pkg/sink/codec/debezium/testdata/): parse datatype.ddl.sql +
  * datatype.dml.sql, encode with [[DebeziumFull]], and compare the
  * produced key/value JSON against datatype.dbz.json /
  * datatype.dbz.key.json.
  *
  * Comparison contract = the reference suite's own
  * (debezium_test.go:77-103): full-tree equality — including the
  * entire schema block and schema field order — EXCEPT
  * `payload.source` and `payload.ts_ms`, which the reference ignores
  * because its golden bytes come from a live Debezium capture.
  */
class DebeziumGoldenSpec extends SparkFunSuite {
  private val mapper = new ObjectMapper()
  private val dir = "/root/reference/pkg/sink/codec/debezium/testdata"

  private def readFile(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)

  private def available: Boolean = Files.isDirectory(Paths.get(dir))

  /** Drop the reference-ignored paths from a parsed value message. */
  private def scrub(root: JsonNode): JsonNode = {
    root.path("payload") match {
      case o: ObjectNode => o.remove("source"); o.remove("ts_ms")
      case _ =>
    }
    root
  }

  private lazy val table = MySqlDdl
    .parseCreateTable(readFile(s"$dir/datatype.ddl.sql"), defaultSchema = "test")
    .getOrElse(fail("could not parse datatype.ddl.sql"))

  private lazy val encoded: (String, String) = {
    val rows = MySqlDdl.parseInsert(readFile(s"$dir/datatype.dml.sql"))
    assert(rows.nonEmpty, "could not parse datatype.dml.sql")
    // unnamed-column INSERT: literals align positionally with the DDL
    val lits = table.cols.indices.map(i => rows.head.values(s"_$i"))
    val img = StructType(table.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true), StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_commit_ts", LongType)))
    val row = Row(null, Row(lits.map(_.orNull): _*), "I", table.schema, table.table,
      1701673705263L * 1000000L)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row), schema)
    val out = DebeziumFull.encode(df, table, "dbserver1")
      .select(col("_key"), col("_value")).head()
    (out.getString(0), out.getString(1))
  }

  test("value message matches datatype.dbz.json (schema block + payload, reference ignore-set)") {
    assume(available)
    val golden = scrub(mapper.readTree(readFile(s"$dir/datatype.dbz.json")))
    val ours = scrub(mapper.readTree(encoded._2))
    // per-field diff first for a readable failure
    val gAfter = golden.path("payload").path("after")
    val oAfter = ours.path("payload").path("after")
    table.cols.foreach { c =>
      assert(oAfter.get(c.name) == gAfter.get(c.name),
        s"payload.after.${c.name}: ours=${oAfter.get(c.name)} golden=${gAfter.get(c.name)}")
    }
    val gFields = golden.path("schema").path("fields")
    val oFields = ours.path("schema").path("fields")
    (0 until math.max(gFields.size, oFields.size)).foreach { i =>
      assert(oFields.get(i) == gFields.get(i),
        s"schema.fields[$i]: ours=${oFields.get(i)} golden=${gFields.get(i)}")
    }
    assert(ours == golden)
  }

  test("debezium-disable-schema (sink.go:202): the DML envelope AND key " +
      "drop their schema block but keep the payload wrapper, and the " +
      "payloads are byte-identical to the schema-ful wire's") {
    assume(available)
    val rows = MySqlDdl.parseInsert(readFile(s"$dir/datatype.dml.sql"))
    val lits = table.cols.indices.map(i => rows.head.values(s"_$i"))
    val img = StructType(table.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true), StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_commit_ts", LongType)))
    val row = Row(null, Row(lits.map(_.orNull): _*), "I", table.schema, table.table,
      1701673705263L * 1000000L)
    val df = spark.createDataFrame(java.util.Arrays.asList(row), schema)
    val out = DebeziumFull.encode(df, table, "dbserver1", disableSchema = true)
      .select(col("_key"), col("_value")).head()
    val k = mapper.readTree(out.getString(0))
    val v = mapper.readTree(out.getString(1))
    assert(!k.has("schema") && !v.has("schema"),
      "schema-less wire carries no schema block")
    assert(k.has("payload") && v.has("payload"),
      "the {\"payload\":...} wrapper stays (codec.go:1023 — only the " +
        "schema field is gated)")
    // identical payloads to the schema-ful form — the gate touches
    // ONLY the schema block
    val full = (mapper.readTree(encoded._1), mapper.readTree(encoded._2))
    assert(k.get("payload") == full._1.get("payload"))
    assert(v.get("payload") == full._2.get("payload"))
  }

  test("key message matches datatype.dbz.key.json exactly") {
    assume(available)
    val golden = mapper.readTree(readFile(s"$dir/datatype.dbz.key.json"))
    val ours = mapper.readTree(encoded._1)
    assert(ours == golden, s"ours=${encoded._1}")
  }

  test("fixture DDL parses with the full type matrix intact") {
    assume(available)
    assert(table.cols.length == 51)
    assert(table.pkCols.map(_.name) == Seq("pk"))
    val byName = table.cols.map(c => c.name -> c).toMap
    assert(byName("col_bit_60").flen == 60)
    assert(byName("col_dt_fsp_4").fsp == 4)
    assert(byName("col_enum").elems == Seq("a", "b", "c"))
    assert(byName("col_bigint_unsigned").unsigned)
    assert(byName("col_decimal").flen == 10 && byName("col_decimal").dec == 5)
  }
}
