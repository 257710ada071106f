package graft

import org.apache.spark.sql.functions._
import graft.functions.{AvroCodec, AvroRegistry}
import graft.model.Envelope

/** Registry-framed Avro: content-addressed ids, Confluent wire
  * framing, id-resolved decode with schema evolution (new reader,
  * old writer). */
class AvroRegistrySpec extends SparkFunSuite {

  private lazy val env =
    Envelope.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

  test("register is content-addressed and versions chain per subject") {
    val store = new AvroRegistry.InMemoryStore
    val id1 = store.register("events-app.events_0-value", AvroCodec.envelopeSchemaJson)
    val id2 = store.register("events-app.events_0-value", AvroCodec.envelopeSchemaJson)
    assert(id1 == id2, "same schema text -> same global id")
    val id3 = store.register("events-app.events_0-value", AvroRegistry.evolvedSchemaJson)
    assert(id3 != id1)
    assert(store.idsFor("events-app.events_0-value") == Seq(id1, id3))
    assert(store.versions("events-app.events_0-value") == Seq(1, 2),
      "versions are 1-based version NUMBERS, not global ids")
    assert(store.byId(id1) != store.byId(id3))
  }

  test("wire framing is confluent-shaped and invertible") {
    val payload = Array[Byte](1, 2, 3)
    val framed = AvroRegistry.frame(42, payload)
    assert(framed(0) == 0.toByte && framed.length == 8)
    val (id, p) = AvroRegistry.unframe(framed)
    assert(id == 42 && p.toSeq == payload.toSeq)
  }

  test("glue framing: versioned header + deterministic schema uuid, invertible") {
    val u1 = AvroRegistry.glueSchemaUuid(AvroCodec.envelopeSchemaJson)
    val u2 = AvroRegistry.glueSchemaUuid(AvroCodec.envelopeSchemaJson)
    assert(u1 == u2, "uuid is content-addressed")
    assert(u1 != AvroRegistry.glueSchemaUuid(AvroRegistry.evolvedSchemaJson))
    val payload = Array[Byte](9, 8, 7)
    val framed = AvroRegistry.glueFrame(u1, payload)
    assert(framed(0) == 3.toByte && framed(1) == 0.toByte && framed.length == 21)
    val (u, p) = AvroRegistry.glueUnframe(framed)
    assert(u == u1 && p.toSeq == payload.toSeq)
  }

  test("glue zlib compression byte round-trips the payload") {
    val u = AvroRegistry.glueSchemaUuid(AvroCodec.envelopeSchemaJson)
    val payload = Array.tabulate(2048)(i => (i % 17).toByte) // compressible
    val framed = AvroRegistry.glueFrame(u, payload, compress = true)
    assert(framed(1) == AvroRegistry.GlueCompressionZlib)
    assert(framed.length < payload.length + 18, "zlib actually shrank it")
    val (u2, p2) = AvroRegistry.glueUnframe(framed)
    assert(u2 == u && p2.toSeq == payload.toSeq)
  }

  test("confluent HTTP client round-trips through the in-process registry") {
    import graft.functions.HttpSchemaRegistry
    val stub = new HttpSchemaRegistry.Stub().start()
    try {
      val client = new HttpSchemaRegistry.ConfluentHttpClient(stub.baseUrl)
      val subject = "events-app-value"
      // content-addressing holds over the wire
      val id1 = client.register(subject, AvroCodec.envelopeSchemaJson)
      val id2 = client.register(subject, AvroCodec.envelopeSchemaJson)
      assert(id1 == id2)
      val id3 = client.register(subject, AvroRegistry.evolvedSchemaJson)
      assert(id3 != id1)
      assert(client.idsFor(subject) == Seq(id1, id3),
        "per-version id translation crosses the wire")
      assert(client.versions(subject) == Seq(1, 2),
        "GET /versions returns version numbers per the Confluent contract")
      assert(client.latest(subject)._1 == id3,
        "versions/latest carries the GLOBAL id")
      // byId resolves canonicalized schema text
      assert(client.byId(id1).contains("ChangeEvent"))
      // unknowns are 4xx, surfaced as failures client-side
      intercept[IllegalArgumentException](client.byId(9999))
      intercept[IllegalArgumentException](client.versions("ghost-subject"))

      // the FULL framed encode/decode path over the HTTP store — no
      // data-path code changes vs the in-memory store
      val framed = AvroRegistry.encodeFramed(env, client, subject)
      val writerId = client.idsFor(subject).head
      val idMap = Map(writerId -> client.byId(writerId))
      val decoded = AvroRegistry.decodeFramed(framed, idMap,
        AvroRegistry.evolvedSchemaJson)
      assert(decoded.count() == env.count())
      assert(decoded.filter(col("origin") =!= "upstream").count() == 0)
    } finally stub.stop()
  }

  test("incompatible schema evolution is rejected: 409 over HTTP, compat check says no") {
    import graft.functions.HttpSchemaRegistry
    // adds a field WITHOUT a default: a BACKWARD reader cannot fill it
    // from old-writer messages, so the registry must refuse it as the
    // subject's next version (the Confluent 409,
    // confluent_schema_registry.go:176)
    val incompatible = AvroCodec.envelopeSchemaJson.stripSuffix("]}") +
      """,{"name":"required_new","type":"string"}]}"""

    // store-level enforcement
    val store = new AvroRegistry.InMemoryStore
    val v1 = store.register("s1", AvroCodec.envelopeSchemaJson)
    assert(store.compatibleWithLatest("s1", AvroRegistry.evolvedSchemaJson))
    assert(!store.compatibleWithLatest("s1", incompatible))
    intercept[AvroRegistry.IncompatibleSchemaException](
      store.register("s1", incompatible))
    // the failed register leaves the subject chain untouched
    assert(store.idsFor("s1") == Seq(v1))
    // a NONE-level store accepts anything (per-subject config analog)
    val permissive = new AvroRegistry.InMemoryStore("NONE")
    permissive.register("s1", AvroCodec.envelopeSchemaJson)
    permissive.register("s1", incompatible)
    assert(permissive.versions("s1").size == 2)

    // wire-level enforcement: compatibility endpoint + 409 register
    val stub = new HttpSchemaRegistry.Stub().start()
    try {
      val client = new HttpSchemaRegistry.ConfluentHttpClient(stub.baseUrl)
      val subject = "events-compat-value"
      client.register(subject, AvroCodec.envelopeSchemaJson)
      assert(client.checkCompatibility(subject, AvroRegistry.evolvedSchemaJson))
      assert(!client.checkCompatibility(subject, incompatible))
      intercept[AvroRegistry.IncompatibleSchemaException](
        client.register(subject, incompatible))
      // compatible evolution still registers fine after the reject
      val evolved = client.register(subject, AvroRegistry.evolvedSchemaJson)
      assert(client.idsFor(subject).last == evolved)
    } finally stub.stop()
  }

  test("framed round trip decodes by id; evolved reader fills defaults") {
    val store = new AvroRegistry.InMemoryStore
    val subject = "events-app-value"
    val framed = AvroRegistry.encodeFramed(env, store, subject)
    val writerId = store.idsFor(subject).head

    // every message carries the registered id
    val ids = framed.select(col("_value")).limit(10).collect()
      .map(r => AvroRegistry.unframe(r.getAs[Array[Byte]](0))._1).toSet
    assert(ids == Set(writerId))

    // decode with the EVOLVED reader schema: old-writer messages
    // resolve, the new `origin` field surfaces its default
    val idMap = Map(writerId -> store.byId(writerId))
    val decoded = AvroRegistry.decodeFramed(framed, idMap,
      AvroRegistry.evolvedSchemaJson)
    assert(decoded.count() == env.count())
    assert(decoded.filter(col("origin") =!= "upstream").count() == 0)
    assert(decoded.filter(col("_schema_id") =!= writerId).count() == 0)

    // payload fields survive the trip
    val src = env.filter(col("_op") =!= "D")
      .select(col("_row_id"), col("after.user_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val back = decoded.filter(col("_op") =!= "D")
      .select(col("_row_id"), col("after_user_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == src)
  }

  test("registry outage: 5xx retries with exponential backoff, then succeeds " +
      "(avro_schema_registry_error)") {
    import graft.functions.HttpSchemaRegistry
    val stub = new HttpSchemaRegistry.Stub().start()
    try {
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val client = new HttpSchemaRegistry.ConfluentHttpClient(stub.baseUrl,
        retryInitialMs = 100L, retryMaxIntervalMs = 30000L,
        retryMaxElapsedMs = 30000L, sleeper = sleeps += _)
      // two 500s, then the registry recovers: the call must succeed
      stub.failNextRequests(2)
      val id = client.register("flaky-value", AvroCodec.envelopeSchemaJson)
      assert(id > 0)
      assert(sleeps.toSeq == Seq(100L, 200L), "exponential schedule: 100ms, 200ms")
      // recovered registry serves reads with no further retries
      sleeps.clear()
      assert(client.byId(id).contains("ChangeEvent"))
      assert(sleeps.isEmpty)
    } finally stub.stop()
  }

  test("persistent registry outage: bounded retries exhaust and the feed " +
      "goes WARNING through FeedBackoff, recovering on progress") {
    import graft.functions.HttpSchemaRegistry
    import graft.streaming.{FeedBackoff, FeedState}
    val stub = new HttpSchemaRegistry.Stub().start()
    try {
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val client = new HttpSchemaRegistry.ConfluentHttpClient(stub.baseUrl,
        retryInitialMs = 100L, retryMaxIntervalMs = 400L,
        retryMaxElapsedMs = 1000L, sleeper = sleeps += _)
      stub.failNextRequests(Int.MaxValue)
      val e = intercept[HttpSchemaRegistry.RegistryUnavailableException](
        client.register("down-value", AvroCodec.envelopeSchemaJson))
      // bounded: 100+200+400 = 700ms spent; +400 would exceed 1000ms
      assert(sleeps.toSeq == Seq(100L, 200L, 400L))
      assert(e.code == HttpSchemaRegistry.RegistryErrorCode)

      // the surfaced error is NOT fast-fail: the changefeed warns and
      // schedules its own restart instead of failing
      val backoff = new FeedBackoff()
      assert(backoff.checkStatus(100L, Nil, nowMs = 0L) == FeedState.Normal)
      // checkpoint stuck at 100 + registry error since the last report
      val state = backoff.checkStatus(100L, Seq(e.asFeedError), nowMs = 0L)
      assert(state == FeedState.Warning)
      assert(!backoff.shouldRun(5000L) && backoff.shouldRun(10001L))
      assert(backoff.lastError.exists(_.code == HttpSchemaRegistry.RegistryErrorCode))
      // registry comes back + checkpoint advances → NORMAL again
      stub.failNextRequests(0)
      assert(client.register("down-value", AvroCodec.envelopeSchemaJson) > 0)
      assert(backoff.checkStatus(101L, Nil, nowMs = 20000L) == FeedState.Normal)
    } finally stub.stop()
  }

  test("avro control events: DDL is 0x01 + compact json, checkpoint is " +
      "0x02 + BE u64, row magic 0 is neither (encoder.go:104-147)") {
    import graft.functions.AvroRegistry
    val ddl = AvroRegistry.ddlEventBytes(
      """ALTER TABLE t ADD COLUMN c varchar(8) DEFAULT "x"""",
      5, "app", "t", 123456789L)
    assert(ddl(0) == 1.toByte)
    assert(AvroRegistry.decodeControlEvent(ddl) == Some(Left((
      """ALTER TABLE t ADD COLUMN c varchar(8) DEFAULT "x"""",
      5, "app", "t", 123456789L))))
    val cp = AvroRegistry.checkpointEventBytes(0x0102030405060708L)
    assert(cp.toSeq == Seq[Byte](2, 1, 2, 3, 4, 5, 6, 7, 8))
    assert(AvroRegistry.decodeControlEvent(cp) == Some(Right(0x0102030405060708L)))
    // a confluent-framed row message (magic byte 0) is not a control event
    val row = AvroRegistry.frame(7, Array[Byte](9, 9))
    assert(AvroRegistry.decodeControlEvent(row).isEmpty)
  }
}
