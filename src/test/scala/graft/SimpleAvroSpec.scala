package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.{Schema, SchemaNormalization}
import graft.functions.SimpleAvro
import graft.functions.SimpleAvro.{ColumnDef, IndexDef, TableDef, Val}

/** Simple-protocol Avro marshalling against the reference's OWN wire
  * schema (pkg/sink/codec/simple/message.json): the programmatically
  * built schema must be parsing-form-identical to the shipped file,
  * and our bytes must decode through a codec parsed from that file. */
class SimpleAvroSpec extends AnyFunSuite {

  private lazy val referenceSchema: Schema = new Schema.Parser().parse(
    new java.io.File("/root/reference/pkg/sink/codec/simple/message.json"))

  test("wire schema is parsing-form identical to the reference message.json") {
    assert(SchemaNormalization.parsingFingerprint64(SimpleAvro.wireSchema)
      == SchemaNormalization.parsingFingerprint64(referenceSchema),
      "canonical parsing forms must match — any drift breaks cross-engine decode")
  }

  test("watermark round-trips and carries the goavro union framing") {
    val bytes = SimpleAvro.encodeWatermark(commitTs = 449999L, buildTs = 1700000000123L)
    // union branch index of Message (12th entry) = 11 → zigzag 22
    assert(bytes(0) == 22, s"first wire byte must be the Message union index, got ${bytes(0)}")
    // decode with the REFERENCE schema as reader — cross-implementation read
    val msg = SimpleAvro.decode(bytes, referenceSchema)
    assert(msg.get("type").toString == "WATERMARK")
    val p = msg.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(p.getSchema.getFullName == "com.pingcap.simple.avro.Watermark")
    assert(p.get("commitTs") == 449999L && p.get("buildTs") == 1700000000123L)
  }

  test("bootstrap carries the full table schema through the reference reader") {
    val table = TableDef("app", "events_1", tableId = 107L, version = 445566L,
      columns = Seq(
        ColumnDef("user_id", "bigint", charset = "binary", collate = "binary",
          length = 20, unsigned = Some(false), zerofill = Some(false), nullable = false),
        ColumnDef("value", "double", length = 22, unsigned = Some(false),
          zerofill = Some(false)),
        ColumnDef("tag", "enum", elements = Seq("a", "b"), length = 1),
        ColumnDef("price", "decimal", length = 10, decimalDigits = Some(2),
          unsigned = Some(false), zerofill = Some(false), default = Some("0.00"))),
      indexes = Seq(IndexDef("primary", unique = true, primary = true,
        nullable = false, columns = Seq("user_id"))))
    val msg = SimpleAvro.decode(
      SimpleAvro.encodeBootstrap(table, buildTs = 1700000000456L), referenceSchema)
    assert(msg.get("type").toString == "BOOTSTRAP")
    val ts = msg.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("tableSchema").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(ts.get("database").toString == "app" && ts.get("tableID") == 107L)
    val cols = ts.get("columns").asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
    assert(cols.size == 4)
    val enumCol = cols.get(2).get("dataType").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(enumCol.get("elements").toString.contains("a"))
    val decCol = cols.get(3).get("dataType").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(decCol.get("decimal") == 2)
    assert(cols.get(3).get("default").toString == "0.00")
    val idx = ts.get("indexes").asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
    assert(idx.get(0).get("primary") == true && idx.get(0).get("columns").toString.contains("user_id"))
  }

  test("DML exercises every value branch of the column union") {
    val data = Map[String, Val](
      "id" -> Val.L(42L),
      "ratio" -> Val.F(1.5f),
      "score" -> Val.D(2.25),
      "name" -> Val.S("graft"),
      "blob" -> Val.B(Array[Byte](1, 2, 0, -1)),
      "created" -> Val.Ts("UTC", "2023-11-14 12:00:00"),
      "big" -> Val.UBig(-1L), // max uint64, reinterpreted bits
      "note" -> Val.Null)
    val bytes = SimpleAvro.encodeDml("UPDATE", "app", "events_1", tableId = 107L,
      commitTs = 450000L, buildTs = 1700000000789L, schemaVersion = 445566L,
      data = data, old = Map("id" -> Val.L(42L), "score" -> Val.D(2.0)),
      checksum = Some((1, false, 0xCAFEL, 0xBEEFL)))
    val msg = SimpleAvro.decode(bytes, referenceSchema)
    assert(msg.get("type").toString == "DML")
    val dml = msg.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(dml.get("type").toString == "UPDATE")
    val m = dml.get("data").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
    def v(k: String): AnyRef = {
      // avro map keys decode as Utf8 — compare by toString
      val it = m.entrySet().iterator()
      var out: AnyRef = null
      while (it.hasNext) { val e = it.next(); if (e.getKey.toString == k) out = e.getValue }
      out
    }
    assert(v("id") == 42L)
    assert(v("ratio") == 1.5f && v("score") == 2.25)
    assert(v("name").toString == "graft")
    assert(v("blob").asInstanceOf[java.nio.ByteBuffer].array().length >= 4
      || v("blob").isInstanceOf[java.nio.ByteBuffer])
    val tsRec = v("created").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(tsRec.getSchema.getFullName == "com.pingcap.simple.avro.Timestamp")
    assert(tsRec.get("location").toString == "UTC")
    val big = v("big").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(big.getSchema.getFullName == "com.pingcap.simple.avro.UnsignedBigint")
    assert(big.get("value") == -1L)
    assert(v("note") == null)
    val ck = dml.get("checksum").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(ck.get("current") == 0xCAFEL && ck.get("corrupted") == false)
    val old = dml.get("old").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
    assert(old.size() == 2)
  }

  test("DDL with pre/post schemas; DELETE carries only old") {
    val t = TableDef("app", "t1", 7L, 100L,
      columns = Seq(ColumnDef("id", "bigint", nullable = false)),
      indexes = Nil)
    val ddl = SimpleAvro.decode(SimpleAvro.encodeDdl(
      "ALTER", "ALTER TABLE t1 ADD COLUMN c int", 451000L, 1700000001000L,
      schema = Some(t.copy(version = 101L)), preSchema = Some(t)), referenceSchema)
    val dp = ddl.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(dp.get("type").toString == "ALTER" && dp.get("sql").toString.contains("ADD COLUMN"))
    assert(dp.get("tableSchema") != null && dp.get("preTableSchema") != null)

    val del = SimpleAvro.decode(SimpleAvro.encodeDml(
      "DELETE", "app", "t1", 7L, 452000L, 1700000002000L, 101L,
      old = Map("id" -> Val.L(9L))), referenceSchema)
    val delP = del.get("payload").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(delP.get("data") == null && delP.get("old") != null)
  }
}
