package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.{CanalFull, Codecs, DebeziumFull, Integrity}
import graft.model.MySqlDdl
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** TiDB VECTOR(n) through the codec matrix, replayed over the
  * reference's own vector integration corpus
  * (tests/integration_tests/vector/data/data.sql). The wire form is
  * everywhere the VectorFloat32.String() bracket rendering
  * (common/utils.go:364 `[1,2,3,4,5]`): canal maps it to
  * JavaSQLTypeVARCHAR (common/java.go:146), debezium names the field
  * io.debezium.data.TiDBVectorFloat32 with no version
  * (debezium/codec.go:575-580, value at :872-874), simple carries the
  * string (simple/message.go:401-402), and the row checksum includes
  * it in the varchar class (common/verify_checksum.go:138). */
class VectorMatrixSpec extends SparkFunSuite {
  private val mapper = new ObjectMapper()
  private val corpus = "/root/reference/tests/integration_tests/vector/data/data.sql"
  private def available: Boolean = Files.isRegularFile(Paths.get(corpus))

  private val TSO = 1700000000000L << 18

  private def envFor(t: MySqlDdl.MySqlTable, op: String,
                     rows: Seq[Seq[Option[String]]],
                     before: Seq[Seq[Option[String]]] = Nil) = {
    val img = StructType(t.cols.map(c => StructField(c.name, StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("before", img, nullable = true),
      StructField("after", img, nullable = true),
      StructField("_op", StringType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_tso", LongType),
      StructField("_commit_ts", LongType)))
    val data = rows.zipWithIndex.map { case (vals, i) =>
      val pre =
        if (before.isDefinedAt(i)) Row(before(i).map(_.orNull): _*) else null
      Row(pre, Row(vals.map(_.orNull): _*), op, t.schema, t.table, TSO, TSO)
    }
    spark.createDataFrame(data.asJava, schema)
  }

  /** The corpus's CREATE TABLEs + INSERT literal rows per table. */
  private lazy val script: (Map[String, MySqlDdl.MySqlTable],
    Map[String, Seq[Seq[Option[String]]]]) = {
    val text = new String(Files.readAllBytes(Paths.get(corpus)), "UTF-8")
    val tables = scala.collection.mutable.Map.empty[String, MySqlDdl.MySqlTable]
    val rows = scala.collection.mutable.Map.empty[String, Vector[Seq[Option[String]]]]
    MySqlDdl.splitStatements(text).foreach { stmt =>
      val lower = stmt.trim.toLowerCase
      if (lower.startsWith("create table"))
        MySqlDdl.parseCreateTable(stmt, "test").foreach(t => tables(t.table) = t)
      else if (lower.startsWith("insert") && !lower.contains("alter")) {
        MySqlDdl.parseInsert(stmt).foreach { r =>
          tables.get(r.table).foreach { t =>
            // only pre-ALTER inserts match the CREATE's column count
            if (r.values.size == 0 || r.values.keys.forall(k =>
              t.cols.exists(_.name == k) || k.startsWith("_"))) {
              val vals = t.cols.zipWithIndex.map { case (c, i) =>
                val positional = r.values.keys.forall(_.startsWith("_"))
                if (positional) r.values.get(s"_$i").flatten
                else r.values.getOrElse(c.name, None)
              }
              if (vals.flatten.nonEmpty && r.values.size <= t.cols.size)
                rows(r.table) = rows.getOrElse(r.table, Vector.empty) :+ vals
            }
          }
        }
      }
    }
    (tables.toMap, rows.toMap)
  }

  test("DDL parse: VECTOR(n) columns, including COMMENT attributes") {
    assume(available)
    val (tables, _) = script
    val s1 = tables("simple1")
    assert(s1.cols.map(_.name) == Seq("id", "data"))
    val vec = s1.cols(1)
    assert(vec.base == "vector" && vec.flen == 5, vec)
    assert(s1.pkCols.map(_.name) == Seq("id"))
    // simple2 carries a second vector column with a COMMENT attribute
    val s2 = tables("simple2")
    assert(s2.cols.map(_.base) == Seq("int", "vector", "vector"))
    assert(s2.cols(2).name == "embedding" && s2.cols(2).flen == 5)
  }

  test("canal-json: corpus rows encode with VARCHAR sqlType and bracket values") {
    assume(available)
    val (tables, rows) = script
    val t = tables("simple1")
    val msgs = CanalFull.encode(envFor(t, "I", rows("simple1")), t)
      .select(col("_value")).collect().map(r => mapper.readTree(r.getString(0)))
    assert(msgs.length == 4)
    val expected = Seq("[1,2,3,4,5]", "[2,3,4,5,6]",
      "[0.1,0.2,0.3,0.4,0.5]", "[0,-0.1,-2,2,0.1]")
    msgs.zip(expected).foreach { case (m, want) =>
      assert(m.get("data").get(0).get("data").asText() == want)
      assert(m.get("sqlType").get("data").asInt() == 12,
        "TypeTiDBVectorFloat32 -> JavaSQLTypeVARCHAR (java.go:146)")
      assert(m.get("mysqlType").get("data").asText() == "vector")
    }
    // the corpus UPDATE value '[0,-0.1,-2,2.0,0.1]': float32 'g'
    // rendering drops the trailing .0 (2.0 -> 2)
    val upd = CanalFull.encode(envFor(t, "U",
      Seq(Seq(Some("3"), Some("[0,-0.1,-2,2.0,0.1]"))),
      before = Seq(Seq(Some("3"), Some("[0.1,0.2,0.3,0.4,0.5]")))), t)
      .select(col("_value")).head().getString(0)
    val un = mapper.readTree(upd)
    assert(un.get("data").get(0).get("data").asText() == "[0,-0.1,-2,2,0.1]")
    assert(un.get("old").get(0).get("data").asText() == "[0.1,0.2,0.3,0.4,0.5]")
  }

  test("debezium: TiDBVectorFloat32 semantic field schema + string value") {
    assume(available)
    val (tables, rows) = script
    val t = tables("simple1")
    val vecCol = t.cols.find(_.base == "vector").get
    val fieldSchema = DebeziumFull.fieldSchemaJson(vecCol)
    assert(fieldSchema.contains("\"name\":\"io.debezium.data.TiDBVectorFloat32\""),
      fieldSchema)
    assert(!fieldSchema.contains("\"version\""),
      "codec.go:575-580 writes no version for the vector type")
    assert(fieldSchema.contains("\"type\":\"string\""))

    val msg = DebeziumFull.encode(envFor(t, "I", rows("simple1").take(1)),
      t, serverName = "graft").select(col("_value")).head().getString(0)
    val n = mapper.readTree(msg)
    assert(n.get("payload").get("after").get("data").asText() == "[1,2,3,4,5]", msg)
    val sch = n.get("schema").toString
    assert(sch.contains("io.debezium.data.TiDBVectorFloat32"), sch)
  }

  test("simple protocol: vector rides as its bracket string") {
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("vec", ArrayType(FloatType))))
    val envSchema = StructType(Seq(
      StructField("_row_id", LongType), StructField("_schema", StringType),
      StructField("_table", StringType), StructField("_op", StringType),
      StructField("_commit_ts", LongType), StructField("_start_ts", LongType),
      StructField("before", payload), StructField("after", payload)))
    val df = spark.createDataFrame(Seq(
      Row(1L, "test", "simple1", "I", TSO, TSO - 1L, null,
        Row(1L, Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f)))).asJava, envSchema)
    val v = Codecs.simpleProtocolFor(df).select(col("_value")).head().getString(0)
    val n = mapper.readTree(v)
    assert(n.get("data").get("vec").asText() == "[1.0,2.0,3.0,4.0,5.0]", v)
    assert(n.get("type").asText() == "INSERT")
  }

  test("typed checksum includes the vector column (verify_checksum.go:138)") {
    assume(available)
    val (tables, rows) = script
    val t = tables("simple1")
    def sums(rws: Seq[Seq[Option[String]]]): Seq[Long] =
      CanalFull.encode(envFor(t, "I", rws), t)
        .withColumn("_ck", Integrity.checksumColumnFor(t.cols))
        .select(col("_ck")).collect().map(_.getLong(0)).toSeq
    val base = sums(rows("simple1"))
    assert(base.distinct.size == base.size,
      "distinct vector values produce distinct checksums")
    // changing ONLY the vector changes the checksum
    val mutated = sums(Seq(Seq(Some("1"), Some("[1,2,3,4,6]"))))
    assert(mutated.head != base.head)
    // canonical rendering: '2.0' and '2' are the same MySQL value and
    // must checksum identically
    assert(sums(Seq(Seq(Some("1"), Some("[1,2.0,3,4,5]")))).head == base.head)
  }

  test("SqlBuilder renders the vector literal as a quoted string") {
    import graft.sinks.SqlBuilder
    assert(SqlBuilder.literal("[1,2,3,4,5]") == "'[1,2,3,4,5]'")
    val sql = SqlBuilder.insert("test", "simple1", Seq("id", "data"),
      Seq(1L, "[1,2,3,4,5]"), replace = false)
    assert(sql.contains("'[1,2,3,4,5]'"), sql)
  }
}
