package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Envelope, EnvelopeSql}
import graft.operators.EventOrder
import graft.functions.{Codecs, Decoders, Integrity, LargeMessage, RowChecksum}

/** Oracle-checked queries for the consumer/integrity/large-message
  * surface: codec round-trips (the reference's consumer-harness
  * verification model, SURVEY §5.2), checksum verify, claim-check,
  * DDL↔DML interleave.
  */
object ExtQueries {

  /** Envelope over the events fixture — UN-spread, the default.
    * Round 16 measured the blanket spread regressing the cheap
    * (filter/dispatch/state) consumers here 15-50% at both core
    * counts: one extra exchange under kernels that don't need it. */
  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.fromEvents(Tables.events(s, dir))

  /** Envelope re-spread across cores when the fixture layout
    * under-parallelizes the scan ([[Tables.spreadSmallScan]]) —
    * OPT-IN for the queries stacking heavy per-row codec/roundtrip
    * kernels on top, which otherwise fuse into a single-row-group
    * scan's ONE task. No-op on naturally parallel layouts. */
  private def envSpread(s: SparkSession, dir: String): DataFrame =
    Tables.spreadSmallScan(env(s, dir))

  /** The avro changefeed wire end-to-end across a schema evolution:
    * era-1 rows encode under the original table version, era-2 rows
    * (µs-parity split) under an ADD-COLUMN-evolved version — each
    * registering its own content-addressed version — and ONE consumer
    * reader (the post-DDL shape) decodes BOTH eras by registry
    * reference via Avro schema resolution (old-era rows fill the new
    * column's null default), deletes riding the key-only tombstone
    * form (avro/encoder.go:68 registry round trip; decoder.go by-id
    * read). The URI scheme picks the framing: confluent magic-0 ids
    * or glue header-3 version UUIDs. */
  private def avroEvolveRoundtrip(s: SparkSession, d: String,
                                  uri: String, topic: String): DataFrame = {
    import org.apache.spark.sql.types._
    val e = envSpread(s, d)
    def img2(c: String) = when(col(c).isNull, lit(null)).otherwise(
      struct(col(s"$c.user_id").as("user_id"), col(s"$c.value").as("value"),
        col(s"$c.k").as("k"), (col(s"$c.k") * 2L).as("k2")))
    val era1 = e.filter(pmod(col("_commit_ts"), lit(2000L)) === 0L)
    val era2 = e.filter(pmod(col("_commit_ts"), lit(2000L)) === 1000L)
      .withColumn("before", img2("before"))
      .withColumn("after", img2("after"))
    val frames = graft.functions.AvroWire
      .encodeFeed(era1, Seq("user_id"), uri, topic)
      .unionByName(graft.functions.AvroWire
        .encodeFeed(era2, Seq("user_id"), uri, topic))
    graft.functions.AvroWire.decodeFeedAs(frames, uri, StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType),
      StructField("k", LongType), StructField("k2", LongType))))
  }

  val largeMsgMaxBytes = 210

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_roundtrip_canal" -> ((s, d) => {
      val decoded = Decoders.decodeCanal(Codecs.canalJson(envSpread(s, d)))
      decoded.select(
        col("_schema"), col("_table"), col("_op"), col("_commit_ms"),
        col("before.user_id").as("before_user_id"),
        col("before.value").as("before_value"),
        col("before.k").as("before_k"),
        col("after.user_id").as("after_user_id"),
        col("after.value").as("after_value"),
        col("after.k").as("after_k"))
    }),

    "q_roundtrip_canal_txn" -> ((s, d) => {
      // txn-grouped messages split back into per-row canal messages on
      // the consumer side, then decode — exercising the txn framing
      val txn = CdcQueries.txnifiedPublic(envSpread(s, d))
      val exploded = Codecs.canalJsonTxn(txn)
        .select(explode(split(col("_value"), "\n")).as("_value"))
      val decoded = Decoders.decodeCanal(exploded)
      decoded.select(
        col("_schema"), col("_table"), col("_op"), col("_commit_ms"),
        col("before.user_id").as("before_user_id"),
        col("before.value").as("before_value"),
        col("before.k").as("before_k"),
        col("after.user_id").as("after_user_id"),
        col("after.value").as("after_value"),
        col("after.k").as("after_k"))
    }),

    "q_roundtrip_open" -> ((s, d) => {
      val decoded = Decoders.decodeOpen(Codecs.openProtocol(envSpread(s, d)))
      decoded.select(
        col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before.user_id").as("before_user_id"),
        col("before.value").as("before_value"),
        col("before.k").as("before_k"),
        col("after.user_id").as("after_user_id"),
        col("after.value").as("after_value"),
        col("after.k").as("after_k"))
    }),

    "q_open_batch" -> ((s, d) => {
      // the reference's REAL Kafka wire: many events per message under
      // the batch framing (open/encoder.go:40-224) — pack per
      // partition in commit order, unpack, decode; batch coordinates
      // must land exactly where the greedy count rule puts them
      val routed = graft.operators.Routing
        .partitionByKeyColumns(envSpread(s, d), Seq("user_id"), 4)
      val msgs = Codecs.openProtocol(routed)
      val packed = graft.functions.OpenBatch.packOpenBatches(msgs, maxBatchSize = 7)
      val unpacked = graft.functions.OpenBatch.unpackOpenBatches(packed)
      Decoders.decodeOpen(unpacked,
        carry = Seq("_partition", "_batch_seq", "_batch_idx"))
        .select(
          col("_partition"),
          col("_batch_seq").cast("long").as("_batch_seq"),
          col("_batch_idx").cast("long").as("_batch_idx"),
          col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
          col("before.user_id").as("before_user_id"),
          col("before.value").as("before_value"),
          col("before.k").as("before_k"),
          col("after.user_id").as("after_user_id"),
          col("after.value").as("after_value"),
          col("after.k").as("after_k"))
    }),

    "q_open_batch_frame" -> ((s, d) => {
      // byte-level framing check: each message's key/value byte
      // lengths are fully determined by the wire spec (8-byte version
      // head + per-event 8-byte length prefixes) — the oracle
      // recomputes them from the reconstructed JSON text
      val routed = graft.operators.Routing
        .partitionByKeyColumns(envSpread(s, d), Seq("user_id"), 4)
      val msgs = Codecs.openProtocol(routed)
      graft.functions.OpenBatch.packOpenBatches(msgs, maxBatchSize = 7)
        .select(
          col("_partition"),
          col("_batch_seq").cast("long").as("_batch_seq"),
          col("_batch_rows").cast("long").as("_batch_rows"),
          length(col("_key_bytes")).cast("long").as("key_len"),
          length(col("_value_bytes")).cast("long").as("value_len"))
    }),

    "q_roundtrip_csv" -> ((s, d) =>
      Decoders.decodeCsv(Codecs.csvLine(envSpread(s, d)))),

    // output-old-value csv: updates become a two-record D+I message
    // with the is-updated flag (csv_message.go:104-140); the roundtrip
    // proves record splitting + flag semantics end to end
    "q_roundtrip_csv_oldvalue" -> ((s, d) =>
      Decoders.decodeCsvOldValue(Codecs.csvLineOldValue(envSpread(s, d)))),

    "q_roundtrip_vector" -> ((s, d) => {
      // VECTOR(n) end to end through the DDL-typed canal encoder
      // (vector integration test; TypeTiDBVectorFloat32 → VARCHAR wire
      // with the VectorFloat32.String() bracket form): a synthetic
      // 3-dim vector derived from each insert's integers rides
      // encode → wire JSON → decode, and must come back byte-equal.
      import graft.model.MySqlDdl.{MySqlCol, MySqlTable}
      import graft.functions.CanalFull
      import org.apache.spark.sql.types._
      val t = MySqlTable("app", "vec", Seq(
        MySqlCol("id", "bigint", pk = true, notNull = true),
        MySqlCol("emb", "vector", flen = 3)))
      val vecStr = concat(lit("["), pmod(col("after.user_id"), lit(10L)),
        lit(","), pmod(col("after.k"), lit(7L)),
        lit(".5,-"), pmod(col("after.user_id"), lit(5L)), lit("]"))
      val typed = envSpread(s, d).filter(col("_op") === "I").select(
        lit(null).cast(StructType(Seq(
          StructField("id", StringType), StructField("emb", StringType)))).as("before"),
        struct(col("after.user_id").cast("string").as("id"),
          vecStr.as("emb")).as("after"),
        col("_op"), col("_schema"), lit("vec").as("_table"),
        col("_commit_ts").as("_tso"), col("_commit_ts"))
      val wire = StructType(Seq(
        StructField("data", ArrayType(StructType(Seq(
          StructField("id", StringType), StructField("emb", StringType))))),
        StructField("es", LongType)))
      CanalFull.encode(typed, t)
        .select(from_json(col("_value"), wire).as("m"))
        .select(
          element_at(col("m.data"), 1).getField("id").cast("long").as("id"),
          element_at(col("m.data"), 1).getField("emb").as("emb"))
    }),

    "q_roundtrip_simple" -> ((s, d) => {
      val decoded = Decoders.decodeSimple(Codecs.simpleProtocol(envSpread(s, d)))
      decoded.select(
        col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before.user_id").as("before_user_id"),
        col("before.value").as("before_value"),
        col("before.k").as("before_k"),
        col("after.user_id").as("after_user_id"),
        col("after.value").as("after_value"),
        col("after.k").as("after_k"))
    }),

    // simple protocol under encoding-format=avro (sink.go:456;
    // kafka_simple_basic_avro): DML messages ride the official
    // com.pingcap.simple.avro union — doubles travel as avro doubles,
    // so the roundtrip is EXACT (no money-decimal re-rendering)
    "q_roundtrip_simple_avro" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val reader = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("k", LongType)))
      val decoded = graft.functions.SimpleAvroWire.decodeFeed(
        graft.functions.SimpleAvroWire.encodeFeed(envSpread(s, d)), reader)
      decoded.select(
        col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before.user_id").as("before_user_id"),
        col("before.value").as("before_value"),
        col("before.k").as("before_k"),
        col("after.user_id").as("after_user_id"),
        col("after.value").as("after_value"),
        col("after.k").as("after_k"))
    }),

    "q_checksum" -> ((s, d) => {
      val sealed0 = Integrity.withChecksum(envSpread(s, d))
      // bit-flip fixture: corrupt the in-flight payload of every
      // 1009th row, then re-verify — corrupt rows must flag false
      val corrupt = pmod(col("_row_id"), lit(1009L)) === 0
      val corrupted = sealed0
        .withColumn("after",
          when(corrupt && col("after").isNotNull, struct(
            col("after.user_id").as("user_id"),
            (col("after.value") + 1.0).as("value"),
            col("after.k").as("k"))).otherwise(col("after")))
        .withColumn("before",
          when(corrupt && col("_op") === "D", struct(
            col("before.user_id").as("user_id"),
            (col("before.value") + 1.0).as("value"),
            col("before.k").as("k"))).otherwise(col("before")))
      Integrity.verify(corrupted).select(col("_row_id"), col("_checksum_ok"))
    }),

    "q_checksum_crc32" -> ((s, d) => {
      // the WIRE-compatible CRC32-IEEE checksum (verify_checksum.go
      // parity, functions/RowChecksum) under the same bit-flip
      // fixture as q_checksum: seal, corrupt every 1009th row's
      // in-flight payload, re-verify
      val cols = Codecs.envelopeCols
      val sealed0 = RowChecksum.withRowChecksum(envSpread(s, d), cols)
      val corrupt = pmod(col("_row_id"), lit(1009L)) === 0
      val corrupted = sealed0
        .withColumn("after",
          when(corrupt && col("after").isNotNull, struct(
            col("after.user_id").as("user_id"),
            (col("after.value") + 1.0).as("value"),
            col("after.k").as("k"))).otherwise(col("after")))
        .withColumn("before",
          when(corrupt && col("_op") === "D", struct(
            col("before.user_id").as("user_id"),
            (col("before.value") + 1.0).as("value"),
            col("before.k").as("k"))).otherwise(col("before")))
      RowChecksum.verify(corrupted, cols)
        .select(col("_row_id"), col("_checksum_ok"))
    }),

    "q_large_message" -> ((s, d) =>
      LargeMessage.handleKeyOnly(Codecs.canalJson(envSpread(s, d)), largeMsgMaxBytes)
        .select(col("_row_id"), col("_large"), col("_value"))),

    "q_ddl_interleave" -> ((s, d) => {
      val e = env(s, d)
        .select("_row_id", "_schema", "_table", "_commit_ts", "_start_ts")
      val dml = e.withColumn("_event_type", lit("dml"))
      val ddl = e.filter(pmod(col("_row_id"), lit(97L)) === 0)
        .withColumn("_event_type", lit("ddl"))
      EventOrder.withInterleaveSequence(dml.unionByName(ddl))
    }),

    "q_encode_simple" -> ((s, d) =>
      Codecs.simpleProtocol(envSpread(s, d)).select(col("_row_id"), col("_value"))),

    "q_bootstrap" -> ((s, d) => Codecs.bootstrapMessages(env(s, d))),

    "q_encode_ddl" -> ((s, d) => {
      val ddl = graft.operators.SchemaAsOf.sampleVersions(env(s, d))
        .withColumn("query", concat(lit("ALTER TABLE "), col("_table")))
      Codecs.ddlMessage(ddl)
    }),

    // per-protocol DDL wire shapes (codec/common/ddl.go dispatch):
    // canal JSONMessage DDL (isDdl true, canal EventType string, null
    // row blocks, _tidb commitTs extension) and the simple message
    // with the DDL subtype — both over the rotating statement fixture
    "q_encode_ddl_canal" -> ((s, d) =>
      Codecs.ddlMessageFor(ddlFixture(s, d), graft.model.Protocol.CanalJson)),
    "q_encode_ddl_simple" -> ((s, d) =>
      Codecs.ddlMessageFor(ddlFixture(s, d), graft.model.Protocol.Simple)),
    // debezium schema-change events (dbzCodec.EncodeDDLEvent): the
    // payload form (schema block spec-pinned in DebeziumDdlSpec) over
    // the same rotating statement fixture; tableChanges carries the
    // fixture table's definition, DROP renders table:null, TRUNCATE an
    // empty array
    "q_encode_ddl_debezium" -> ((s, d) =>
      Codecs.ddlMessageFor(ddlFixture(s, d), graft.model.Protocol.Debezium,
        tableFor = (_, _) => Some(debeziumDdlTable),
        debeziumDisableSchema = true)
        .select(col("_schema"), col("_table"), col("version_ts"),
          col("query"), col("_key"), col("_value"))),

    "q_materialize" -> ((s, d) =>
      graft.operators.Materialize.tableState(env(s, d))),

    // time-travel: state as of the midpoint commit ts (the syncpoint
    // consistency-check primitive); the cut is data-derived so both
    // engines compute the same snapshot point
    // sync-diff: src vs a deterministically-drifted downstream copy
    // (dropped keys, corrupted values, extra keys) — chunk checksums
    // prune, row compare classifies; oracle is the UNPRUNED full
    // compare, so it also proves pruning loses nothing
    "q_table_diff" -> ((s, d) => {
      val src = Tables.documents(s, d)
      val base = src.filter(pmod(col("doc_id"), lit(97L)) =!= 3)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(89L)) === 5,
            concat(col("text"), lit(" CORRUPTED"))).otherwise(col("text")))
      val extra = src.filter(pmod(col("doc_id"), lit(101L)) === 7)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      graft.operators.TableDiff.diff(
        src, base.unionByName(extra), Seq("doc_id"), nChunks = 32)
    }),

    "q_snapshot_asof" -> ((s, d) => {
      val e = env(s, d)
      val mm = e.agg(min(col("_commit_ts")), max(col("_commit_ts"))).head()
      graft.operators.Materialize.snapshotAt(
        e, (mm.getLong(0) + mm.getLong(1)) / 2L)
    }),

    "q_roundtrip_avro" -> ((s, d) =>
      graft.functions.AvroCodec.decode(graft.functions.AvroCodec.encode(envSpread(s, d)))),

    // the csv codec config surface as a WIRE query (pkg/config/sink.go
    // :270-290 CSVConfig): include-commit-ts, binary-encoding-method=
    // hex, and output-field-header together — the ticdc-meta$ header
    // line leads the feed (encodeHeader, csv_message.go:418-446) and
    // binary cells ship hex instead of base64
    "q_encode_csv_header" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val csvCfg = graft.model.CsvConfig(includeCommitTs = true,
        binaryEncodingMethod = "hex", outputFieldHeader = true)
      def img(c: String) = when(col(c).isNull, lit(null)).otherwise(struct(
        col(s"$c.user_id").as("user_id"),
        col(s"$c.value").cast(DecimalType(18, 2)).as("price"),
        col(s"$c.k").as("k"),
        encode(concat(lit("b:"), col(s"$c.k").cast("string")), "UTF-8").as("bin")))
      val shaped = envSpread(s, d)
        .withColumn("before", img("before"))
        .withColumn("after", img("after"))
      val lines = graft.functions.Codecs.csvLineFor(shaped, csvCfg)
        .select(col("_value").as("line"))
      val header = s.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(graft.functions.Codecs.csvHeaderFor(
          Seq("user_id", "price", "k", "bin"), csvCfg))),
        StructType(Seq(StructField("line", StringType))))
      header.unionAll(lines)
    }),

    // avro value-mapping modes as a WIRE query (arvo.go:551,637,657):
    // under avro-decimal-handling-mode=string and
    // avro-bigint-unsigned-handling-mode=string, DECIMAL columns and
    // the DecimalType(20,0) unsigned-bigint carrier ship as PLAIN
    // STRINGS (no logical-decimal bytes, no u64 bits), and the
    // consumer reads them back into the exact decimal domain
    "q_avro_string_modes" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val uri = "mem://q_avro_string_modes"
      graft.functions.AvroWire.dropRegistry(uri)
      val u64base = lit(new java.math.BigDecimal("18446744073709551615"))
      def img(c: String) = when(col(c).isNull, lit(null)).otherwise(struct(
        col(s"$c.user_id").as("user_id"),
        col(s"$c.value").cast(DecimalType(18, 2)).as("price"),
        (u64base - abs(col(s"$c.k")) % 1000L).cast(DecimalType(20, 0)).as("u64")))
      val shaped = envSpread(s, d)
        .withColumn("before", img("before"))
        .withColumn("after", img("after"))
      val frames = graft.functions.AvroWire.encodeFeed(shaped,
        Seq("user_id"), uri, "q-modes",
        modes = graft.functions.AvroWire.AvroModes(
          decimal = "string", unsignedBigint = "string"))
      val reader = StructType(Seq(StructField("user_id", LongType),
        StructField("price", DecimalType(18, 2)),
        StructField("u64", DecimalType(20, 0))))
      graft.functions.AvroWire.decodeFeedAs(frames, uri, reader)
        .select(col("_schema"), col("_table"), col("_op"), col("_commit_ts"),
          col("user_id"),
          col("price").cast("string").as("price"),
          col("u64").cast("string").as("u64"))
    }),

    // the avro CHANGEFEED wire end-to-end across a schema evolution:
    // era-1 rows encode under the original table version, era-2 rows
    // (µs-parity split) under an ADD-COLUMN-evolved version — each
    // registering its own content-addressed id — and ONE consumer
    // reader (the post-DDL shape) decodes BOTH eras by id via Avro
    // schema resolution (old-era rows fill the new column's null
    // default), deletes riding the key-only tombstone form
    // (avro/encoder.go:68 registry round trip; decoder.go by-id read)
    "q_avro_evolve" -> ((s, d) =>
      avroEvolveRoundtrip(s, d, "mem://q_avro_evolve", "q-avro-evolve")),

    // the same two-era evolving roundtrip over the AWS GLUE wire
    // framing (header version 3 + compression byte + content-derived
    // schema-version UUID, glue_schema_registry.go:1-352) — the
    // registry pair's other half; decode dispatches PER FRAME on the
    // leading byte (0 confluent / 3 glue), so the consumer needs no
    // out-of-band framing hint
    "q_avro_glue_evolve" -> ((s, d) =>
      avroEvolveRoundtrip(s, d, "glue://q_avro_glue_evolve", "q-avro-glue")),

    // Debezium envelope over Confluent-framed Avro: key = handle key,
    // value = before/after/source/op/ts_ms (Kafka-Connect wire format)
    "q_roundtrip_debezium_avro" -> ((s, d) => {
      val store = new graft.functions.AvroRegistry.InMemoryStore
      graft.functions.DebeziumAvroCodec.decode(
        graft.functions.DebeziumAvroCodec.encode(
          envSpread(s, d), "dbz-events", "graft-cluster", store),
        store)
    }),

    // debezium as a STREAMING avro wire (encoding-format=avro, the
    // debezium_avro scenario): schema-driven Envelope records under
    // Confluent framing, subjects per table, delete on the before
    // image — encode and decode resolve the registry BY URI inside
    // the task, the second-process consumer shape
    "q_debezium_avro_feed" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val uri = "mem://q_debezium_avro_feed"
      val reader = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("k", LongType)))
      val decoded = graft.functions.DebeziumAvroWire.decodeFeed(
        graft.functions.DebeziumAvroWire.encodeFeed(
          envSpread(s, d), Seq("user_id"), uri, topic = "dbz-feed"),
        uri, reader)
      decoded.select(
        col("_schema"), col("_table"), col("_commit_ts"), col("_op"),
        col("before.user_id").as("before_user_id"),
        col("before.value").as("before_value"),
        col("before.k").as("before_k"),
        col("after.user_id").as("after_user_id"),
        col("after.value").as("after_value"),
        col("after.k").as("after_k"))
    }),

    "q_filter_ddl" -> ((s, d) =>
      graft.operators.Filters
        .ddlFilter(ddlFixture(s, d), Seq("drop table", "truncate table"), Seq("^CREATE INDEX"))
        .withColumn("ddl_class", graft.operators.Filters.ddlClass(col("query")))),

    "q_msg_batches" -> ((s, d) => {
      val encoded = Codecs.canalJson(
        graft.operators.Routing.partitionByKeyColumns(envSpread(s, d), Seq("user_id"), 8))
      LargeMessage.messageBatches(encoded, 4000L)
        .select(col("_row_id"), col("_partition"), col("_msg_bytes"), col("_msg_batch"))
    }),

    "q_ddl_dispatch" -> ((s, d) =>
      graft.operators.Filters.ddlDispatch(ddlFixture(s, d),
        Seq("app.events_*", "!app.events_3"),
        Seq("truncate table"), Seq("^CREATE INDEX"))),

    // the evolving feed's per-batch DDL EMISSION surface in batch form
    // (Changefeed.runMqFromRaw2pcEvolving's loop): each DDL rides the
    // job table as RAW KV BYTES (encodeJobEntry), wire-parses
    // (DdlJobParser.parseRawEntry, the mounter's ParseDDLJob), runs the
    // two-level dispatch (discard unreplicated/other-ddl, ignore by
    // class/regex — Changefeed.dispatchDdlJob), and the emitted
    // remainder encodes as the DDL wire message (Codecs.ddlMessage,
    // the reference's WriteBlockEvent payload, codec/common/ddl.go)
    "q_ddl_emit_evolve" -> ((s, d) => {
      val filterCfg = graft.model.FilterConfig(
        rules = Seq("app.events_*", "!app.events_3"))
      // control-plane sized: the DDL fixture is ~1/97th of the corpus
      val fixture = ddlFixture(s, d)
        .select(col("_schema"), col("_table"), col("version_ts"), col("query"))
        .collect().toSeq.map(r =>
          (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
        .sortBy(x => (x._3, x._2))
      val emitted = fixture.zipWithIndex.flatMap {
        case ((sc, tb, ts, qq), i) =>
          val meta = (s"""{"id":${i + 1},"type":0,"schema_id":1,"table_id":0,""" +
            s""""schema_name":"$sc","table_name":"$tb","state":4,""" +
            s""""query":"$qq","binlog":{"SchemaVersion":$ts},"version":1}""")
            .getBytes("UTF-8")
          val (k, v) = graft.model.DdlJobParser.encodeJobEntry(i + 1L, meta, 0)
          graft.model.DdlJobParser.parseRawEntry(k, v, "put", ts - 1L, ts)
            .flatMap(job => graft.streaming.Changefeed.dispatchDdlJob(
              job, filterCfg,
              ignoreClasses = Seq("truncate table"),
              ignoreSqlRegexps = Seq("^CREATE INDEX")))
            .map(eq => (sc, tb, ts, eq))
      }
      import s.implicits._
      Codecs.ddlMessage(
        emitted.toDF("_schema", "_table", "version_ts", "query"))
    }),

    // rename-under-filter decision table (buildDDLEventForRenameTable/
    // -Tables; tests/integration_tests/multi_tables_ddl): renames that
    // stay in the feed emit, renames OUT of the feed emit + drop the
    // table from tracking, renames INTO the feed error
    // (CDC:ErrSyncRenameTableFailed — a table cannot enter a
    // changefeed through a rename), both-filtered pairs are skipped
    // and the emitted query is rebuilt from the surviving pairs. The
    // Spark side parses the raw RENAME statement text; the oracle
    // recomputes the decisions from the name columns.
    "q_rename_dispatch" -> ((s, d) => {
      val sel = (pmod(col("version_ts"), lit(6000L)) / lit(1000L)).cast("long")
      val t = col("_table")
      val stmts =
        when(sel === 0, concat(lit("RENAME TABLE "), t, lit(" TO "), t, lit("0")))
          .when(sel === 1, concat(lit("RENAME TABLE "), t, lit(" TO archived_"), t))
          .when(sel === 2, concat(lit("RENAME TABLE legacy_"), t, lit(" TO "), t))
          .when(sel === 3, concat(lit("RENAME TABLE legacy_"), t,
            lit(" TO archived_"), t))
          .when(sel === 4, concat(lit("RENAME TABLE "), t, lit(" TO "), t,
            lit("0, legacy_"), t, lit(" TO archived_"), t))
          .otherwise(concat(lit("RENAME TABLE "), t, lit(" TO "), t,
            lit("0, legacy_"), t, lit(" TO "), t, lit("0x")))
      graft.operators.Filters.ddlDispatchRenameAware(
        graft.operators.SchemaAsOf.sampleVersions(env(s, d))
          .withColumn("query", stmts),
        Seq("app.events_*", "!app.events_3"), Nil, Nil)
        .select(col("version_ts"), col("_schema"), col("_table"),
          col("query"), col("_ddl_action"), col("_ddl_query"))
    }),

    // replication whitelist (pkg/filter/ddl.go:38-103 + the
    // not-supported block :138-151): statement classes TiCDC never
    // replicates — sequences, savepoints, ANALYZE, GRANT, placement
    // policies, table ATTRIBUTES — discard even on a fully-replicated
    // table; TTL alters ARE whitelisted (ddl_sequence / savepoint /
    // ddl_attributes integration scenarios). Case 11 is the misroute
    // trap: ANALYZE..PARTITION must not read as 'alter partition'.
    "q_ddl_whitelist" -> ((s, d) => {
      val sel = (pmod(col("version_ts"), lit(12000L)) / lit(1000L)).cast("long")
      val stmts =
        when(sel === 0, concat(lit("CREATE TABLE "), col("_table")))
          .when(sel === 1, concat(lit("ALTER TABLE "), col("_table"),
            lit(" ADD COLUMN c INT")))
          .when(sel === 2, concat(lit("CREATE SEQUENCE seq_"), col("_table")))
          .when(sel === 3, lit("SAVEPOINT sp1"))
          .when(sel === 4, concat(lit("ANALYZE TABLE "), col("_table")))
          .when(sel === 5, concat(lit("DROP VIEW v_"), col("_table")))
          .when(sel === 6, concat(lit("RECOVER TABLE "), col("_table")))
          .when(sel === 7, concat(lit("GRANT SELECT ON "), col("_table"), lit(" TO 'u'")))
          .when(sel === 8, concat(lit("ALTER TABLE "), col("_table"),
            lit(" ATTRIBUTES='merge_option=deny'")))
          .when(sel === 9, lit("CREATE PLACEMENT POLICY p1 FOLLOWERS=2"))
          .when(sel === 10, concat(lit("ALTER TABLE "), col("_table"),
            lit(" TTL_ENABLE='ON'")))
          .otherwise(concat(lit("ANALYZE TABLE "), col("_table"),
            lit(" PARTITION p0")))
      graft.operators.Filters.ddlDispatch(
        graft.operators.SchemaAsOf.sampleVersions(env(s, d))
          .withColumn("query", stmts),
        Seq("*.*"), Nil, Nil)
    }),

    "q_ddl_modify" -> ((s, d) => {
      // rotating ALTER mix over the sparse version stream, parsed by
      // the REAL DdlParser driver-side (DDL lists are control-plane-
      // sized — the reference's schema store holds them in memory too)
      // and re-emitted as rows: exercises MODIFY/CHANGE COLUMN,
      // partition DDLs, and the constraint-head rejection (ADD INDEX
      // parses to nothing) end-to-end against a textual oracle.
      import graft.model.DdlAction._
      val ddl = graft.operators.SchemaAsOf.sampleVersions(env(s, d))
        .withColumn("query", ddlModifyQuery)
      val parsed = ddl.select("_schema", "_table", "version_ts", "query")
        .collect().toSeq.flatMap { r =>
          val (sc, ts) = (r.getString(0), r.getLong(2))
          graft.model.DdlParser.parse(r.getString(3), ts, sc).map { a =>
            val (kind, colName, newName, newType) = a match {
              case ModifyColumn(_, _, c, _) => ("modify", c.name, c.name, c.dataType)
              case ChangeColumn(_, _, o, c, _) => ("change", o, c.name, c.dataType)
              case TruncateTablePartition(_, _, ps, _) =>
                ("truncate_partition", ps.mkString(","), "", "")
              case DropTablePartition(_, _, ps, _) =>
                ("drop_partition", ps.mkString(","), "", "")
              case other => (other.getClass.getSimpleName, "", "", "")
            }
            (sc, r.getString(1), ts, kind, colName, newName, newType)
          }
        }
      import s.implicits._
      parsed.toDF("_schema", "_table", "version_ts", "kind",
        "col_name", "new_name", "new_type")
    }),

    "q_filter_virtual" -> ((s, d) => {
      // generated column vk = value * 2 + k evaluated into both
      // images, then the expression filter predicates over it
      val withV = graft.operators.Filters.withVirtualColumns(s, env(s, d),
        Seq("vk" -> "value * 2 + k"))
      val filtered = graft.operators.Filters.exprFilter(s, withV,
        ignoreInsert = Some("vk > 300"))
      filtered.select(
        col("_row_id"), col("_schema"), col("_table"), col("_op"),
        col("_commit_ts"), col("_start_ts"),
        col("before.vk").as("before_vk"), col("after.vk").as("after_vk"))
    }),

    "q_dedup_embedding" -> ((s, d) => {
      // embedding-cosine near-dup: same LSH machinery as ANN, higher bar
      val emb = Tables.embeddings(s, d)
      val planes = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("plane_id"), col("embedding"))
      graft.operators.Similarity.lshNeighbors(emb, planes, 0.8)
    }),

    "q_multimodal_frames" -> ((s, d) =>
      graft.operators.Multimodal.frameSamplePlan(
        graft.operators.Multimodal.blobMeta(
          graft.operators.Multimodal.withBlob(Tables.documents(s, d))))
        .drop("frame_indices")),

    "q_multimodal_resize" -> ((s, d) =>
      graft.operators.Multimodal.resizePlan(
        graft.operators.Multimodal.blobMeta(
          graft.operators.Multimodal.withBlob(Tables.documents(s, d))))),

    "q_sessionize" -> ((s, d) =>
      graft.operators.Sessionize.sessions(Tables.events(s, d), sessionGapNs)),

    // common-journeys report: top-20 ordered event-type paths
    "q_session_paths" -> ((s, d) =>
      graft.operators.Sessionize.sessionPaths(Tables.events(s, d),
        sessionGapNs, sessionPathsK)),

    // market-basket lift over (user, event_type), exact integer micro
    "q_event_lift" -> ((s, d) =>
      graft.analytics.Funnel.eventLift(Tables.events(s, d))),

    // multimodal → ANN bridge: blob bytes → extracted feature vector
    // (mapPartitions batch "model", deterministic stub) → the
    // unchanged ANN stack. Feature sums are small exact integers, so
    // the float vectors are engine-portable.
    "q_multimodal_ann" -> ((s, d) => {
      val feats = graft.operators.Multimodal.featureExtractBatch(
        graft.operators.Multimodal.withBlob(Tables.documents(s, d)))
      val emb = feats.select(col("doc_id").as("vec_id"),
        transform(col("features"), f => f.cast("float")).as("embedding"))
      graft.operators.Similarity.bruteForceTopK(emb, numQueries = 5, k = 10)
    }),

    // signup → purchase conversion within 3 days of first signup
    "q_funnel" -> ((s, d) =>
      graft.analytics.Funnel.funnel(Tables.events(s, d),
        "signup", "purchase", funnelWindowNs)),

    // big-big interval-containment join: traffic inside each sampled
    // signup's 30-min window — bucketed equi-join, no nested loop,
    // neither side broadcast (PlanSpec-guarded)
    "q_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(1000L)))
          .as("ts_ns"),
        col("event_type"))
      val iv = ev
        .filter(col("event_type") === "signup" &&
          pmod(col("user_id"), lit(10L)) === 0)
        .select(col("event_id").as("interval_id"), col("ts_ns").as("s"),
          (col("ts_ns") + lit(ivWindowNs)).as("e"))
      graft.operators.IntervalJoin
        .containment(ev.select(col("event_id"), col("user_id"), col("ts_ns")),
          "ts_ns", iv, "s", "e", bucketNs = ivWindowNs)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // 3-step funnel: signup → click → purchase, ordered, within 3
    // days of first signup
    "q_funnel_steps" -> ((s, d) =>
      graft.analytics.Funnel.funnelSteps(Tables.events(s, d),
        Seq("signup", "click", "purchase"), funnelWindowNs)),

    // daily retention triangle (cohort = first-seen day)
    "q_retention" -> ((s, d) =>
      graft.analytics.Funnel.retention(Tables.events(s, d), dayNs)),

    // big-big as-of join: attribute each click/view to the latest
    // preceding signup/purchase of the same user — union + running
    // window, join-free (one key shuffle; both sides data-scaled)
    "q_asof_attrib" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(1000L)))
          .as("ts_ns"),
        col("event_type"), col("value"))
      val probe = ev.filter(col("event_type").isin("click", "view"))
      // one build row per (user, ts): keep max event_id for equal-ts
      // determinism (mirrored in the oracle)
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts_ns"))
        .orderBy(col("event_id").desc)
      val build = ev.filter(col("event_type").isin("signup", "purchase"))
        .withColumn("__rn", row_number().over(wd))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsOfJoin.asof(probe, build, "user_id", "ts_ns",
          payloadCols = Seq("event_id", "value"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
          col("event_type"), col("asof_event_id"), col("asof_value"))
    }),

    "q_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // coarse quantizer: 8 deterministic sample vectors as centroids
      val centroids = emb
        .filter(pmod(col("vec_id"), lit(61L)) === 0 && col("vec_id") < 61L * 8)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.operators.Similarity.ivfTopK(emb, centroids, numQueries = 5, k = 10)
    }),

    "q_ann_ivf_probe2" -> ((s, d) => {
      // multi-probe recall path: same quantizer, queries probe their
      // 2 nearest cells
      val emb = Tables.embeddings(s, d)
      val centroids = emb
        .filter(pmod(col("vec_id"), lit(61L)) === 0 && col("vec_id") < 61L * 8)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.operators.Similarity.ivfTopK(emb, centroids, numQueries = 5, k = 10,
        nprobe = 2)
    }),

    // big-big kNN join: a QUARTER of the corpus as the query side
    // (data-scaled — nothing broadcastable), every query's top-5 by
    // cell-partitioned equi-join
    "q_knn_join" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb
        .filter(pmod(col("vec_id"), lit(61L)) === 0 && col("vec_id") < 61L * 8)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.operators.Similarity.knnJoin(
        emb.filter(pmod(col("vec_id"), lit(4L)) === 1), emb, centroids, k = 5)
    }),

    // kNN label classification on top of the big-big join: majority
    // label of the 5 nearest neighbors, deterministic tie-break
    "q_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb
        .filter(pmod(col("vec_id"), lit(61L)) === 0 && col("vec_id") < 61L * 8)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      graft.operators.Similarity.knnClassify(
        emb.filter(pmod(col("vec_id"), lit(5L)) === 2), emb, centroids, k = 5)
    }),

    "q_ann_recall" -> ((s, d) => {
      // recall@k of the IVF path against exact brute force — the
      // quality metric every approximate index ships with
      val emb = Tables.embeddings(s, d)
      val centroids = emb
        .filter(pmod(col("vec_id"), lit(61L)) === 0 && col("vec_id") < 61L * 8)
        .select(col("vec_id").as("centroid_id"), col("embedding"))
      val exact = graft.operators.Similarity.bruteForceTopK(emb, 5, 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = graft.operators.Similarity.ivfTopK(emb, centroids, 5, 10)
        .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
      exact.join(approx,
          col("query_id") === col("aq") && col("neighbor_id") === col("an"), "left")
        .groupBy(col("query_id"))
        .agg((sum(when(col("an").isNotNull, 1.0).otherwise(0.0)) / lit(10.0))
          .as("recall_at_k"))
    }),

    // metric-outlier gate over ingest telemetry: per (event_type,
    // UTC-day) z-score in exact milli units (analytics/Anomaly.scala)
    "q_anomaly" -> ((s, d) =>
      graft.analytics.Anomaly.zOutliers(Tables.events(s, d), anomalyZMilli))
  )

  // z threshold in milli-sigmas (2.5σ); the events fixture's value
  // tail reaches ~10σ, so the outlier set is non-empty at every SF
  val anomalyZMilli: Long = 2500L

  val sessionGapNs: Long = 30L * 60 * 1000 * 1000 * 1000 // 30 min
  val sessionPathsK = 20
  val dayNs: Long = 24L * 3600 * 1000 * 1000 * 1000
  val funnelWindowNs: Long = 3L * dayNs
  // interval-join fixture: 30-min windows, bucket = window width
  val ivWindowNs: Long = 30L * 60 * 1000 * 1000 * 1000

  /** DDL fixture: sparse version stream with a rotating statement
    * mix. The control stream is tiny (1/97 of events), so pin it
    * behind a lazy per-invocation checkpoint ([[Tables.pinTrunk]]):
    * the materialization barrier stops project-collapse from inlining
    * the synthesized `query` CASE into every classifier branch (which
    * made codegen of the combined tree the dominant cost) — and
    * mirrors reality, where DDL arrives materialized from the job
    * table. Unlike the earlier memoized `.cache()` (flagged as a
    * cross-invocation cache), every invocation rebuilds the fixture
    * from parquet and its blocks are GC'd with the run. */
  private def ddlFixture(s: SparkSession, d: String): DataFrame =
    Tables.pinTrunk(
      graft.operators.SchemaAsOf.sampleVersions(env(s, d))
        .withColumn("query", ddlFixtureQuery))

  /** The debezium DDL fixture table — the envelope payload's shape
    * (shared between q_encode_ddl_debezium's tableFor and the oracle's
    * interpolated table block, so the two sides cannot drift). */
  private[graft] lazy val debeziumDdlTable: graft.model.MySqlDdl.MySqlTable = {
    import graft.model.MySqlDdl.{MySqlCol, MySqlTable}
    MySqlTable("app", "t", Seq(
      MySqlCol("user_id", "bigint", notNull = true, pk = true),
      MySqlCol("value", "double"),
      MySqlCol("k", "bigint")))
  }

  /** Rotating DDL statement fixture (shared with the oracle below).
    * Selector uses the µs digit of the version ts (commit ts is
    * µs-truncated ns, so `ts % 5` alone would always be 0). */
  private def ddlSel =
    (pmod(col("version_ts"), lit(5000L)) / lit(1000L)).cast("long")
  private def ddlFixtureQuery =
    when(ddlSel === 0, concat(lit("CREATE TABLE "), col("_table")))
      .when(ddlSel === 1, concat(lit("ALTER TABLE "), col("_table"), lit(" ADD COLUMN c INT")))
      .when(ddlSel === 2, concat(lit("DROP TABLE "), col("_table")))
      .when(ddlSel === 3, concat(lit("TRUNCATE TABLE "), col("_table")))
      .otherwise(concat(lit("CREATE INDEX idx ON "), col("_table")))

  /** Rotating ALTER mix for q_ddl_modify (selector shared with the
    * oracle): selector 2 is a constraint DDL that must parse to
    * nothing. */
  private def ddlModifyQuery =
    when(ddlSel === 0, concat(lit("ALTER TABLE "), col("_table"),
        lit(" MODIFY COLUMN value DECIMAL(18,2)")))
      .when(ddlSel === 1, concat(lit("ALTER TABLE "), col("_table"),
        lit(" CHANGE COLUMN k k2 BIGINT")))
      .when(ddlSel === 2, concat(lit("ALTER TABLE "), col("_table"),
        lit(" ADD INDEX idx (k)")))
      .when(ddlSel === 3, concat(lit("ALTER TABLE "), col("_table"),
        lit(" TRUNCATE PARTITION p0")))
      .otherwise(concat(lit("ALTER TABLE "), col("_table"),
        lit(" DROP PARTITION p1, p2")))

  private def q(body: String): String = EnvelopeSql.query(body)

  /** Simple-protocol quoted-string image (encodeValue stringifies
    * every scalar; doubles keep the money-decimal convention). */
  private def simpleImgSql(img: String): String =
    s"""CASE WHEN ${img}_user_id IS NULL THEN 'null' ELSE
       |  '{"user_id":"' || CAST(${img}_user_id AS VARCHAR) ||
       |  '","value":' || COALESCE('"' || CAST(CAST(${img}_value AS DECIMAL(18,2)) AS VARCHAR) || '"', 'null') ||
       |  ',"k":' || COALESCE('"' || CAST(${img}_k AS VARCHAR) || '"', 'null') || '}' END""".stripMargin
      .replace("\n", " ")

  /** Payload image recovered from a ms-precision JSON protocol:
    * value passes through DECIMAL(18,2) then back to double. */
  private def recovered(img: String): String =
    s"""${img}_user_id,
       |  CAST(CAST(${img}_value AS DECIMAL(18,2)) AS DOUBLE) AS ${img}_value,
       |  ${img}_k""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_roundtrip_canal" -> q(
      s"""SELECT _schema, _table, _op,
         |  _commit_ts // 1000000 AS _commit_ms,
         |  ${recovered("before")},
         |  ${recovered("after")}
         |FROM env""".stripMargin),

    "q_roundtrip_canal_txn" -> q(
      s""", ${CdcQueries.txnifiedSqlPublic}
         |SELECT _schema, _table, _op,
         |  _commit_ts // 1000000 AS _commit_ms,
         |  ${recovered("before")},
         |  ${recovered("after")}
         |FROM txn""".stripMargin),

    "q_roundtrip_open" -> q(
      s"""SELECT _schema, _table, _commit_ts, _op,
         |  ${recovered("before")},
         |  ${recovered("after")}
         |FROM env""".stripMargin),

    "q_open_batch" -> q(
      s""", part AS (
         |  SELECT *, ${graft.operators.Routing.stableHashSql(Seq("_schema", "_table",
              "CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END"))} % 4 AS _partition
         |  FROM env),
         |seq AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY _partition ORDER BY _commit_ts, _row_id) - 1 AS rn
         |  FROM part)
         |SELECT _partition, rn // 7 AS _batch_seq, rn % 7 AS _batch_idx,
         |  _schema, _table, _commit_ts, _op,
         |  ${recovered("before")},
         |  ${recovered("after")}
         |FROM seq""".stripMargin),

    "q_open_batch_frame" -> q(
      s""", part AS (
         |  SELECT *, ${graft.operators.Routing.stableHashSql(Seq("_schema", "_table",
              "CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END"))} % 4 AS _partition
         |  FROM env),
         |msg AS (
         |  SELECT _partition, _commit_ts, _row_id,
         |    '{"ts":' || CAST(_commit_ts AS VARCHAR) || ',"scm":"' || _schema ||
         |      '","tbl":"' || _table || '","t":1}' AS kj,
         |    CASE WHEN _op = 'I' THEN '{"u":' || ${CdcQueries.imgSqlPublic("after")} || '}'
         |         WHEN _op = 'U' THEN '{"u":' || ${CdcQueries.imgSqlPublic("after")} || ',"p":' || ${CdcQueries.imgSqlPublic("before")} || '}'
         |         ELSE '{"d":' || ${CdcQueries.imgSqlPublic("before")} || '}' END AS vj
         |  FROM part),
         |seq AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY _partition ORDER BY _commit_ts, _row_id) - 1 AS rn
         |  FROM msg)
         |SELECT _partition, rn // 7 AS _batch_seq,
         |  CAST(COUNT(*) AS BIGINT) AS _batch_rows,
         |  CAST(8 + SUM(8 + strlen(kj)) AS BIGINT) AS key_len,
         |  CAST(SUM(8 + strlen(vj)) AS BIGINT) AS value_len
         |FROM seq GROUP BY 1, 2""".stripMargin),

    "q_roundtrip_simple" -> q(
      s"""SELECT _schema, _table, _commit_ts, _op,
         |  ${recovered("before")},
         |  ${recovered("after")}
         |FROM env""".stripMargin),

    // avro doubles are exact — the roundtrip is the identity on the
    // envelope (no DECIMAL re-rendering like the JSON form above)
    "q_roundtrip_simple_avro" -> q(
      """SELECT _schema, _table, _commit_ts, _op,
        |  before_user_id, before_value, before_k,
        |  after_user_id, after_value, after_k
        |FROM env""".stripMargin),

    "q_debezium_avro_feed" -> q(
      """SELECT _schema, _table, _commit_ts, _op,
        |  before_user_id, before_value, before_k,
        |  after_user_id, after_value, after_k
        |FROM env""".stripMargin),

    // the wire round trip is the identity on the constructed bracket
    // string (integer-derived components render identically through
    // float32 shortest-form), so the oracle is the construction itself
    "q_roundtrip_vector" -> q(
      """SELECT after_user_id AS id,
        |  '[' || (after_user_id % 10) || ',' || (after_k % 7) ||
        |  '.5,-' || (after_user_id % 5) || ']' AS emb
        |FROM env WHERE _op = 'I'""".stripMargin),

    "q_roundtrip_csv" -> q(
      """SELECT _op, _schema, _table, _commit_ts,
        |  CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS user_id,
        |  CAST(CAST(CASE WHEN _op = 'D' THEN before_value ELSE after_value END AS DECIMAL(18,2)) AS DOUBLE) AS value,
        |  CASE WHEN _op = 'D' THEN before_k ELSE after_k END AS k
        |FROM env""".stripMargin),

    "q_roundtrip_csv_oldvalue" -> q(
      """SELECT 'D' AS _op, _table, _schema, _commit_ts, TRUE AS is_updated,
        |  before_user_id AS user_id,
        |  CAST(CAST(before_value AS DECIMAL(18,2)) AS DOUBLE) AS value,
        |  before_k AS k
        |FROM env WHERE _op = 'U'
        |UNION ALL
        |SELECT 'I', _table, _schema, _commit_ts, TRUE,
        |  after_user_id,
        |  CAST(CAST(after_value AS DECIMAL(18,2)) AS DOUBLE),
        |  after_k
        |FROM env WHERE _op = 'U'
        |UNION ALL
        |SELECT 'D', _table, _schema, _commit_ts, FALSE,
        |  before_user_id,
        |  CAST(CAST(before_value AS DECIMAL(18,2)) AS DOUBLE),
        |  before_k
        |FROM env WHERE _op = 'D'
        |UNION ALL
        |SELECT 'I', _table, _schema, _commit_ts, FALSE,
        |  after_user_id,
        |  CAST(CAST(after_value AS DECIMAL(18,2)) AS DOUBLE),
        |  after_k
        |FROM env WHERE _op = 'I'""".stripMargin),

    "q_checksum" -> q(
      """SELECT _row_id,
        |  CASE WHEN _row_id % 1009 = 0 THEN FALSE ELSE TRUE END AS _checksum_ok
        |FROM env""".stripMargin),

    // the CRC32 value itself is not SQL-expressible (typed-LE-byte
    // fold); the oracle pins the verification OUTCOME, which is fully
    // determined by the corruption fixture
    "q_checksum_crc32" -> q(
      """SELECT _row_id,
        |  CASE WHEN _row_id % 1009 = 0 THEN FALSE ELSE TRUE END AS _checksum_ok
        |FROM env""".stripMargin),

    "q_large_message" -> q(
      s"""SELECT _row_id,
         |  length(${CdcQueries.canalValueSql}) > $largeMsgMaxBytes AS _large,
         |  CASE WHEN length(${CdcQueries.canalValueSql}) > $largeMsgMaxBytes THEN
         |    '{"_hk":true,"database":"' || _schema || '","table":"' || _table ||
         |    '","user_id":' ||
         |    COALESCE(CAST(CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS VARCHAR), 'null') || '}'
         |  ELSE ${CdcQueries.canalValueSql} END AS _value
         |FROM env""".stripMargin),

    "q_ddl_interleave" -> q(
      """, un AS (
        |  SELECT _row_id, _schema, _table, _commit_ts, _start_ts, 'dml' AS _event_type FROM env
        |  UNION ALL
        |  SELECT _row_id, _schema, _table, _commit_ts, _start_ts, 'ddl' FROM env WHERE _row_id % 97 = 0
        |)
        |SELECT *, CAST(ROW_NUMBER() OVER (
        |  PARTITION BY _schema, _table
        |  ORDER BY _commit_ts,
        |    CASE WHEN _event_type = 'ddl' THEN 0 ELSE 1 END,
        |    _start_ts, _row_id) AS BIGINT) AS _seq
        |FROM un""".stripMargin),

    "q_encode_simple" -> q(
      s"""SELECT _row_id,
         |  '{"version":1,"database":"' || _schema || '","table":"' || _table ||
         |  '","type":"' ||
         |  CASE WHEN _op = 'I' THEN 'INSERT' WHEN _op = 'U' THEN 'UPDATE' ELSE 'DELETE' END ||
         |  '","commitTs":' || CAST(_commit_ts AS VARCHAR) ||
         |  ',"buildTs":' || CAST(_commit_ts // 1000000 AS VARCHAR) ||
         |  CASE WHEN _op <> 'D' THEN ',"data":' || ${simpleImgSql("after")} ELSE '' END ||
         |  CASE WHEN _op <> 'I' THEN ',"old":' || ${simpleImgSql("before")} ELSE '' END ||
         |  '}' AS _value
         |FROM env""".stripMargin),

    "q_bootstrap" -> q(
      """SELECT DISTINCT _schema, _table,
        |  '{"version":1,"type":"BOOTSTRAP","commitTs":0,"buildTs":0,"tableSchema":{"schema":"' || _schema ||
        |  '","table":"' || _table || '","tableID":0,"version":0,"columns":[' ||
        |  '{"name":"user_id","dataType":{"mysqlType":"bigint","charset":"binary","collate":"binary","length":20},"nullable":false,"default":null},' ||
        |  '{"name":"value","dataType":{"mysqlType":"double","charset":"binary","collate":"binary","length":22},"nullable":true,"default":null},' ||
        |  '{"name":"k","dataType":{"mysqlType":"bigint","charset":"binary","collate":"binary","length":20},"nullable":true,"default":null}' ||
        |  '],"indexes":[{"name":"primary","unique":true,"primary":true,"nullable":false,"columns":["user_id"]}]}}' AS _value
        |FROM env""".stripMargin),

    "q_encode_ddl" -> q(
      """SELECT _schema, _table, _commit_ts AS version_ts,
        |  'ALTER TABLE ' || _table AS query,
        |  '{"type":"DDL","actionType":"alter table","commitTs":' || CAST(_commit_ts AS VARCHAR) ||
        |  ',"schema":"' || _schema || '","table":"' || _table ||
        |  '","query":"ALTER TABLE ' || _table || '"}' AS _value
        |FROM env WHERE _row_id % 97 = 0""".stripMargin),

    "q_encode_ddl_canal" -> q(
      """, ddl AS (
        |  SELECT _schema, _table, _commit_ts AS version_ts,
        |    CASE (_commit_ts % 5000) // 1000
        |      WHEN 0 THEN 'CREATE TABLE ' || _table
        |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
        |      WHEN 2 THEN 'DROP TABLE ' || _table
        |      WHEN 3 THEN 'TRUNCATE TABLE ' || _table
        |      ELSE 'CREATE INDEX idx ON ' || _table END AS query,
        |    CASE (_commit_ts % 5000) // 1000
        |      WHEN 0 THEN 'CREATE' WHEN 1 THEN 'ALTER' WHEN 2 THEN 'ERASE'
        |      WHEN 3 THEN 'TRUNCATE' ELSE 'CINDEX' END AS ty
        |  FROM env WHERE _row_id % 97 = 0
        |)
        |SELECT _schema, _table, version_ts, query,
        |  '{"id":0,"database":"' || _schema || '","table":"' || _table ||
        |  '","pkNames":null,"isDdl":true,"type":"' || ty ||
        |  '","es":' || CAST(version_ts // 1000000 AS VARCHAR) ||
        |  ',"ts":' || CAST(version_ts // 1000000 AS VARCHAR) ||
        |  ',"sql":"' || query ||
        |  '","sqlType":null,"mysqlType":null,"data":null,"old":null,' ||
        |  '"_tidb":{"commitTs":' || CAST(version_ts AS VARCHAR) || '}}' AS _value
        |FROM ddl""".stripMargin),

    "q_encode_ddl_simple" -> q(
      """, ddl AS (
        |  SELECT _schema, _table, _commit_ts AS version_ts,
        |    CASE (_commit_ts % 5000) // 1000
        |      WHEN 0 THEN 'CREATE TABLE ' || _table
        |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
        |      WHEN 2 THEN 'DROP TABLE ' || _table
        |      WHEN 3 THEN 'TRUNCATE TABLE ' || _table
        |      ELSE 'CREATE INDEX idx ON ' || _table END AS query,
        |    CASE (_commit_ts % 5000) // 1000
        |      WHEN 0 THEN 'CREATE' WHEN 1 THEN 'ALTER' WHEN 2 THEN 'ERASE'
        |      WHEN 3 THEN 'TRUNCATE' ELSE 'CINDEX' END AS ty
        |  FROM env WHERE _row_id % 97 = 0
        |)
        |SELECT _schema, _table, version_ts, query,
        |  '{"version":1,"type":"' || ty || '","sql":"' || query ||
        |  '","commitTs":' || CAST(version_ts AS VARCHAR) ||
        |  ',"buildTs":' || CAST(version_ts // 1000000 AS VARCHAR) || '}' AS _value
        |FROM ddl""".stripMargin),

    "q_encode_ddl_debezium" -> q(
      s""", ddl AS (
         |  SELECT _schema, _table, _commit_ts AS version_ts,
         |    CASE (_commit_ts % 5000) // 1000
         |      WHEN 0 THEN 'CREATE TABLE ' || _table
         |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
         |      WHEN 2 THEN 'DROP TABLE ' || _table
         |      WHEN 3 THEN 'TRUNCATE TABLE ' || _table
         |      ELSE 'CREATE INDEX idx ON ' || _table END AS query,
         |    CASE (_commit_ts % 5000) // 1000
         |      WHEN 0 THEN 'CREATE' WHEN 1 THEN 'ALTER' WHEN 2 THEN 'DROP'
         |      WHEN 3 THEN 'DROP' ELSE 'ALTER' END AS ct,
         |    (_commit_ts % 5000) // 1000 AS sel
         |  FROM env WHERE _row_id % 97 = 0
         |)
         |SELECT _schema, _table, version_ts, query,
         |  '{"payload":{"databaseName":"' || _schema || '"}}' AS _key,
         |  '{"payload":{"source":{"version":"2.4.0.Final","connector":"TiCDC","name":"graft","ts_ms":' ||
         |    CAST(version_ts // 1000000 AS VARCHAR) ||
         |    ',"snapshot":"false","db":"' || _schema ||
         |    '","table":"' || _table ||
         |    '","server_id":0,"gtid":null,"file":"","pos":0,"row":0,"thread":0,"query":null,"commit_ts":' ||
         |    CAST(version_ts AS VARCHAR) || ',"cluster_id":"graft"},"ts_ms":' ||
         |    CAST(version_ts // 1000000 AS VARCHAR) ||
         |    ',"databaseName":"' || _schema ||
         |    '","schemaName":null,"ddl":"' || query || '","tableChanges":' ||
         |    CASE WHEN sel = 3 THEN '[]'
         |         WHEN sel = 2 THEN '[{"type":"DROP","id":"\\"' || _schema || '\\".\\"' || _table || '\\"","table":null}]'
         |         ELSE '[{"type":"' || ct || '","id":"\\"' || _schema || '\\".\\"' || _table ||
         |           '\\"","table":${graft.functions.DebeziumFull.ddlTableBlockJson(debeziumDdlTable)}}]'
         |    END || '}}' AS _value
         |FROM ddl""".stripMargin),

    "q_roundtrip_avro" -> q("SELECT * FROM env"),

    "q_encode_csv_header" -> q(
      """SELECT 'ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema,ticdc-meta$commit-ts,user_id,price,k,bin' AS line
        |UNION ALL
        |SELECT '"' ||
        |  CASE _op WHEN 'I' THEN 'I' WHEN 'U' THEN 'U' ELSE 'D' END ||
        |  '","' || _table || '","' || _schema || '",' ||
        |  CAST(_commit_ts AS VARCHAR) || ',' ||
        |  CAST(CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS VARCHAR) || ',' ||
        |  CAST(CAST(CASE WHEN _op = 'D' THEN before_value ELSE after_value END AS DECIMAL(18,2)) AS VARCHAR) || ',' ||
        |  CAST(CASE WHEN _op = 'D' THEN before_k ELSE after_k END AS VARCHAR) || ',' ||
        |  lower(hex('b:' || CAST(CASE WHEN _op = 'D' THEN before_k ELSE after_k END AS VARCHAR)))
        |FROM env""".stripMargin),

    "q_avro_string_modes" -> q(
      """SELECT _schema, _table,
        |  CASE _op WHEN 'I' THEN 'c' WHEN 'D' THEN 'd' ELSE 'u' END AS _op,
        |  _commit_ts,
        |  CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS user_id,
        |  CASE WHEN _op = 'D' THEN NULL
        |       ELSE CAST(CAST(after_value AS DECIMAL(18,2)) AS VARCHAR) END AS price,
        |  CASE WHEN _op = 'D' THEN NULL
        |       ELSE CAST(18446744073709551615 - abs(after_k) % 1000 AS VARCHAR) END AS u64
        |FROM env""".stripMargin),

    "q_avro_glue_evolve" -> q(
      """SELECT _schema, _table,
        |  CASE _op WHEN 'I' THEN 'c' WHEN 'D' THEN 'd' ELSE 'u' END AS _op,
        |  _commit_ts,
        |  CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS user_id,
        |  CASE WHEN _op = 'D' THEN NULL ELSE after_value END AS value,
        |  CASE WHEN _op = 'D' THEN NULL ELSE after_k END AS k,
        |  CASE WHEN _op = 'D' OR _commit_ts % 2000 = 0 THEN NULL
        |       ELSE after_k * 2 END AS k2
        |FROM env""".stripMargin),

    "q_avro_evolve" -> q(
      """SELECT _schema, _table,
        |  CASE _op WHEN 'I' THEN 'c' WHEN 'D' THEN 'd' ELSE 'u' END AS _op,
        |  _commit_ts,
        |  CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS user_id,
        |  CASE WHEN _op = 'D' THEN NULL ELSE after_value END AS value,
        |  CASE WHEN _op = 'D' THEN NULL ELSE after_k END AS k,
        |  CASE WHEN _op = 'D' OR _commit_ts % 2000 = 0 THEN NULL
        |       ELSE after_k * 2 END AS k2
        |FROM env""".stripMargin),

    "q_roundtrip_debezium_avro" -> q(
      """SELECT CASE _op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u' ELSE 'd' END AS op,
        |  _commit_ts AS commit_ts,
        |  _commit_ts // 1000000 AS ts_ms,
        |  _schema AS db, _table AS tbl,
        |  'graft-cluster' AS cluster_id,
        |  CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END AS key_user_id,
        |  before_user_id, before_value, before_k,
        |  after_user_id, after_value, after_k
        |FROM env""".stripMargin),

    "q_filter_ddl" -> q(
      """, ddl AS (
        |  SELECT _schema, _table, _commit_ts AS version_ts,
        |    CASE (_commit_ts % 5000) // 1000
        |      WHEN 0 THEN 'CREATE TABLE ' || _table
        |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
        |      WHEN 2 THEN 'DROP TABLE ' || _table
        |      WHEN 3 THEN 'TRUNCATE TABLE ' || _table
        |      ELSE 'CREATE INDEX idx ON ' || _table END AS query
        |  FROM env WHERE _row_id % 97 = 0
        |)
        |SELECT *,
        |  CASE (version_ts % 5000) // 1000
        |    WHEN 0 THEN 'create table' ELSE 'add column' END AS ddl_class
        |FROM ddl
        |WHERE (version_ts % 5000) // 1000 IN (0, 1)""".stripMargin),

    "q_msg_batches" -> q(
      s""", part AS (
         |  SELECT *,
         |    ${graft.operators.Routing.stableHashSql(Seq("_schema", "_table",
              "CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END"))} % 8 AS _partition,
         |    length(${CdcQueries.canalValueSql}) AS len
         |  FROM env
         |)
         |SELECT _row_id, _partition,
         |  CAST(len AS BIGINT) AS _msg_bytes,
         |  CAST((SUM(len) OVER (PARTITION BY _partition
         |    ORDER BY _commit_ts, _start_ts,
         |      CASE WHEN _op = 'D' THEN 1 WHEN _op = 'U' THEN 2 ELSE 3 END,
         |      _row_id) - len) // 4000 AS BIGINT) AS _msg_batch
         |FROM part""".stripMargin),

    "q_ddl_dispatch" -> q(
      s""", ddl AS (
         |  SELECT _schema, _table, _commit_ts AS version_ts,
         |    CASE (_commit_ts % 5000) // 1000
         |      WHEN 0 THEN 'CREATE TABLE ' || _table
         |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
         |      WHEN 2 THEN 'DROP TABLE ' || _table
         |      WHEN 3 THEN 'TRUNCATE TABLE ' || _table
         |      ELSE 'CREATE INDEX idx ON ' || _table END AS query
         |  FROM env WHERE _row_id % 97 = 0
         |)
         |SELECT *,
         |  CASE WHEN NOT (${graft.operators.TableMatcher.matchesSql("_schema", "_table",
                Seq("app.events_*", "!app.events_3"))}) THEN 'discard'
         |       WHEN (version_ts % 5000) // 1000 IN (3, 4) THEN 'ignore'
         |       ELSE 'emit' END AS _ddl_action
         |FROM ddl""".stripMargin),

    "q_ddl_emit_evolve" -> q(
      s""", ddl AS (
         |  SELECT _schema, _table, _commit_ts AS version_ts,
         |    CASE (_commit_ts % 5000) // 1000
         |      WHEN 0 THEN 'CREATE TABLE ' || _table
         |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
         |      WHEN 2 THEN 'DROP TABLE ' || _table
         |      WHEN 3 THEN 'TRUNCATE TABLE ' || _table
         |      ELSE 'CREATE INDEX idx ON ' || _table END AS query
         |  FROM env WHERE _row_id % 97 = 0
         |)
         |SELECT _schema, _table, version_ts, query,
         |  '{"type":"DDL","actionType":"alter table","commitTs":' ||
         |  CAST(version_ts AS VARCHAR) ||
         |  ',"schema":"' || _schema || '","table":"' || _table ||
         |  '","query":"' || query || '"}' AS _value
         |FROM ddl
         |WHERE (${graft.operators.TableMatcher.matchesSql("_schema", "_table",
              Seq("app.events_*", "!app.events_3"))})
         |  AND (version_ts % 5000) // 1000 IN (0, 1, 2)""".stripMargin),

    "q_rename_dispatch" -> {
      import graft.operators.TableMatcher.matchesSql
      val rules = Seq("app.events_*", "!app.events_3")
      val mOld = matchesSql("_schema", "_table", rules)
      val mNew0 = matchesSql("_schema", "(_table || '0')", rules)
      val mArch = matchesSql("_schema", "('archived_' || _table)", rules)
      val mLegacy = matchesSql("_schema", "('legacy_' || _table)", rules)
      val mNew0x = matchesSql("_schema", "(_table || '0x')", rules)
      val emit0 = "'RENAME TABLE `' || _schema || '`.`' || _table || '` TO `' || _schema || '`.`' || _table || '0`'"
      val emit1 = "'RENAME TABLE `' || _schema || '`.`' || _table || '` TO `' || _schema || '`.`archived_' || _table || '`'"
      q(s""", ddl AS (
         |  SELECT _schema, _table, _commit_ts AS version_ts,
         |    (_commit_ts % 6000) // 1000 AS sel,
         |    CASE (_commit_ts % 6000) // 1000
         |      WHEN 0 THEN 'RENAME TABLE ' || _table || ' TO ' || _table || '0'
         |      WHEN 1 THEN 'RENAME TABLE ' || _table || ' TO archived_' || _table
         |      WHEN 2 THEN 'RENAME TABLE legacy_' || _table || ' TO ' || _table
         |      WHEN 3 THEN 'RENAME TABLE legacy_' || _table || ' TO archived_' || _table
         |      WHEN 4 THEN 'RENAME TABLE ' || _table || ' TO ' || _table || '0, legacy_' || _table || ' TO archived_' || _table
         |      ELSE 'RENAME TABLE ' || _table || ' TO ' || _table || '0, legacy_' || _table || ' TO ' || _table || '0x'
         |    END AS query
         |  FROM env WHERE _row_id % 97 = 0
         |), decided AS (
         |  SELECT *,
         |    CASE
         |      WHEN sel = 0 OR sel = 4 THEN
         |        CASE WHEN NOT ($mOld) AND ($mNew0) THEN 'error'
         |             WHEN ($mOld) THEN 'emit' ELSE 'discard' END
         |      WHEN sel = 1 THEN
         |        CASE WHEN NOT ($mOld) AND ($mArch) THEN 'error'
         |             WHEN ($mOld) THEN 'emit' ELSE 'discard' END
         |      WHEN sel = 2 THEN
         |        CASE WHEN NOT ($mLegacy) AND ($mOld) THEN 'error'
         |             WHEN ($mLegacy) THEN 'emit' ELSE 'discard' END
         |      WHEN sel = 3 THEN
         |        CASE WHEN NOT ($mLegacy) AND ($mArch) THEN 'error'
         |             WHEN ($mLegacy) THEN 'emit' ELSE 'discard' END
         |      ELSE
         |        CASE WHEN (NOT ($mOld) AND ($mNew0)) OR (NOT ($mLegacy) AND ($mNew0x))
         |             THEN 'error'
         |             WHEN ($mOld) OR ($mLegacy) THEN 'emit' ELSE 'discard' END
         |    END AS _ddl_action
         |  FROM ddl
         |)
         |SELECT version_ts, _schema, _table, query, _ddl_action,
         |  CASE WHEN _ddl_action = 'emit' AND (sel = 0 OR sel = 4) THEN $emit0
         |       WHEN _ddl_action = 'emit' AND sel = 1 THEN $emit1
         |       ELSE query END AS _ddl_query
         |FROM decided""".stripMargin)
    },

    "q_ddl_whitelist" -> q(
      s""", ddl AS (
         |  SELECT _schema, _table, _commit_ts AS version_ts,
         |    CASE (_commit_ts % 12000) // 1000
         |      WHEN 0 THEN 'CREATE TABLE ' || _table
         |      WHEN 1 THEN 'ALTER TABLE ' || _table || ' ADD COLUMN c INT'
         |      WHEN 2 THEN 'CREATE SEQUENCE seq_' || _table
         |      WHEN 3 THEN 'SAVEPOINT sp1'
         |      WHEN 4 THEN 'ANALYZE TABLE ' || _table
         |      WHEN 5 THEN 'DROP VIEW v_' || _table
         |      WHEN 6 THEN 'RECOVER TABLE ' || _table
         |      WHEN 7 THEN 'GRANT SELECT ON ' || _table || ' TO ''u'''
         |      WHEN 8 THEN 'ALTER TABLE ' || _table || ' ATTRIBUTES=''merge_option=deny'''
         |      WHEN 9 THEN 'CREATE PLACEMENT POLICY p1 FOLLOWERS=2'
         |      WHEN 10 THEN 'ALTER TABLE ' || _table || ' TTL_ENABLE=''ON'''
         |      ELSE 'ANALYZE TABLE ' || _table || ' PARTITION p0' END AS query
         |  FROM env WHERE _row_id % 97 = 0)
         |SELECT *,
         |  CASE WHEN (version_ts % 12000) // 1000 IN (2, 3, 4, 7, 8, 9, 11)
         |    THEN 'discard' ELSE 'emit' END AS _ddl_action
         |FROM ddl""".stripMargin),

    "q_ddl_modify" -> q(
      """, ddl AS (
        |  SELECT _schema, _table, _commit_ts AS version_ts,
        |    (_commit_ts % 5000) // 1000 AS sel
        |  FROM env WHERE _row_id % 97 = 0
        |)
        |SELECT _schema, _table, version_ts,
        |  CASE sel WHEN 0 THEN 'modify' WHEN 1 THEN 'change'
        |    WHEN 3 THEN 'truncate_partition' ELSE 'drop_partition' END AS kind,
        |  CASE sel WHEN 0 THEN 'value' WHEN 1 THEN 'k'
        |    WHEN 3 THEN 'p0' ELSE 'p1,p2' END AS col_name,
        |  CASE sel WHEN 0 THEN 'value' WHEN 1 THEN 'k2' ELSE '' END AS new_name,
        |  CASE sel WHEN 0 THEN 'decimal(18,2)' WHEN 1 THEN 'bigint' ELSE '' END AS new_type
        |FROM ddl WHERE sel <> 2""".stripMargin),

    "q_filter_virtual" -> q(
      """SELECT _row_id, _schema, _table, _op, _commit_ts, _start_ts,
        |  before_value * 2 + before_k AS before_vk,
        |  after_value * 2 + after_k AS after_vk
        |FROM env
        |WHERE NOT (_op = 'I'
        |  AND COALESCE(after_value * 2 + after_k > 300, FALSE))""".stripMargin),

    "q_dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |p AS (SELECT vec_id AS plane_id, emb AS pe FROM e WHERE vec_id < 4),
         |b AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CASE WHEN list_dot_product(e.emb, p.pe) > 0
         |      THEN (1 << plane_id) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e CROSS JOIN p GROUP BY 1
         |), wb AS (
         |  SELECT e.vec_id, e.emb, b.bucket FROM e JOIN b USING (vec_id)
         |)
         |SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.bucket,
         |  round(list_dot_product(a.emb, b2.emb) /
         |    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b2.emb, b2.emb))), 6) AS cos_sim
         |FROM wb a JOIN wb b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE round(list_dot_product(a.emb, b2.emb) /
         |    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b2.emb, b2.emb))), 6) >= 0.8""".stripMargin,

    "q_multimodal_frames" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames,
        |  array_to_string(generate_series(0, n_frames - 1, greatest(1, n_frames // 4)), ',') AS frame_plan
        |FROM meta""".stripMargin,

    "q_multimodal_resize" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |    CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN width <= 64 THEN width ELSE 64 END AS out_width,
        |  CASE WHEN width <= 64 THEN height ELSE (height * 64) // width END AS out_height
        |FROM meta""".stripMargin,

    "q_sessionize" -> graft.operators.Sessionize.oracleSql(sessionGapNs),

    "q_session_paths" ->
      graft.operators.Sessionize.pathsOracleSql(sessionGapNs, sessionPathsK),

    // pure integer lift: n_ab*N*1e6 // (n_a*n_b), all positive
    "q_event_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
        |nt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, n_ab, na.n_t AS n_a, nb.n_t AS n_b,
        |  CAST((n_ab * n_users * 1000000) // (na.n_t * nb.n_t) AS BIGINT) AS lift_micro
        |FROM p
        |JOIN nt na ON na.event_type = ta
        |JOIN nt nb ON nb.event_type = tb
        |CROSS JOIN n""".stripMargin,

    // features: byte-value sums by position mod 4 (ASCII text = bytes)
    "q_multimodal_ann" ->
      """WITH pos AS (
        |  SELECT doc_id, text, CAST(unnest(range(0, length(text))) AS BIGINT) AS p
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, p % 4 AS j,
        |    SUM(unicode(substring(text, CAST(p AS INT) + 1, 1))) AS f
        |  FROM pos GROUP BY 1, 2),
        |vec AS (
        |  SELECT doc_id AS vec_id,
        |    [CAST(SUM(CASE WHEN j = 0 THEN f END) AS DOUBLE),
        |     CAST(SUM(CASE WHEN j = 1 THEN f END) AS DOUBLE),
        |     CAST(SUM(CASE WHEN j = 2 THEN f END) AS DOUBLE),
        |     CAST(SUM(CASE WHEN j = 3 THEN f END) AS DOUBLE)] AS emb
        |  FROM feat GROUP BY doc_id),
        |wc AS (
        |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS n FROM vec),
        |q AS (
        |  SELECT vec_id AS query_id, emb AS q_emb, n AS qn FROM wc
        |  WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, wc.vec_id,
        |    list_dot_product(q.q_emb, wc.emb) / (q.qn * wc.n) AS cos
        |  FROM wc CROSS JOIN q WHERE wc.vec_id <> q.query_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim FROM (
        |  SELECT query_id, vec_id AS neighbor_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // epoch_ns(ts) is µs-truncated in DuckDB, matching the Spark-side
    // ts - ts % 1000 truncation
    "q_funnel" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
         |f AS (
         |  SELECT user_id, MIN(ts_ns) AS from_ts FROM ev
         |  WHERE event_type = 'signup' GROUP BY 1),
         |c AS (
         |  SELECT e.user_id, MIN(e.ts_ns) AS to_ts
         |  FROM ev e JOIN f USING (user_id)
         |  WHERE e.event_type = 'purchase'
         |    AND e.ts_ns >= f.from_ts AND e.ts_ns <= f.from_ts + $funnelWindowNs
         |  GROUP BY 1)
         |SELECT f.user_id, f.from_ts, c.to_ts,
         |  c.to_ts IS NOT NULL AS converted,
         |  c.to_ts - f.from_ts AS ns_to_convert
         |FROM f LEFT JOIN c USING (user_id)""".stripMargin,

    // plain inequality join — DuckDB's IEJoin handles it natively;
    // the Spark side proves the bucketed equi-join loses no pairs
    "q_interval_join" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, event_type
         |  FROM events),
         |iv AS (
         |  SELECT event_id AS interval_id, ts_ns AS s,
         |    ts_ns + $ivWindowNs AS e
         |  FROM ev WHERE event_type = 'signup' AND user_id % 10 = 0),
         |j AS (
         |  SELECT iv.interval_id, ev.event_id, ev.user_id
         |  FROM iv JOIN ev ON ev.ts_ns >= iv.s AND ev.ts_ns <= iv.e)
         |SELECT interval_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM j GROUP BY 1""".stripMargin,

    // chained step CTEs: each step's min ts after the previous step,
    // inside the anchor window
    "q_funnel_steps" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
         |s0 AS (
         |  SELECT user_id, MIN(ts_ns) AS ts_0 FROM ev
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s1 AS (
         |  SELECT e.user_id, MIN(e.ts_ns) AS ts_1
         |  FROM ev e JOIN s0 USING (user_id)
         |  WHERE e.event_type = 'click'
         |    AND e.ts_ns >= s0.ts_0 AND e.ts_ns <= s0.ts_0 + $funnelWindowNs
         |  GROUP BY 1),
         |s2 AS (
         |  SELECT e.user_id, MIN(e.ts_ns) AS ts_2
         |  FROM ev e JOIN s0 USING (user_id) JOIN s1 USING (user_id)
         |  WHERE e.event_type = 'purchase'
         |    AND e.ts_ns >= s1.ts_1 AND e.ts_ns <= s0.ts_0 + $funnelWindowNs
         |  GROUP BY 1)
         |SELECT s0.user_id, ts_0, ts_1, ts_2,
         |  CAST(CASE WHEN ts_2 IS NOT NULL THEN 2
         |            WHEN ts_1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
         |FROM s0
         |LEFT JOIN s1 USING (user_id)
         |LEFT JOIN s2 USING (user_id)""".stripMargin,

    "q_retention" ->
      s"""WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts_ns FROM events),
         |f AS (SELECT user_id, MIN(ts_ns) AS first_ts FROM ev GROUP BY 1)
         |SELECT first_ts // $dayNs AS cohort,
         |  ts_ns // $dayNs - first_ts // $dayNs AS age,
         |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
         |FROM ev JOIN f USING (user_id)
         |GROUP BY 1, 2""".stripMargin,

    // DuckDB's native ASOF JOIN is the oracle for the union+window
    // implementation (equal-ts build rows visible: >=; build deduped
    // per (user, ts) to max event_id on both sides)
    "q_asof_attrib" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, event_type, value
        |  FROM events),
        |probe AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
        |build AS (
        |  SELECT user_id, ts_ns, event_id, value FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts_ns
        |      ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type IN ('signup', 'purchase'))
        |  WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts_ns, p.event_type,
        |  b.event_id AS asof_event_id, b.value AS asof_value
        |FROM probe p ASOF LEFT JOIN build b
        |  ON p.user_id = b.user_id AND p.ts_ns >= b.ts_ns""".stripMargin,

    "q_ann_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e
        |      WHERE vec_id % 61 = 0 AND vec_id < 488),
        |cells AS (
        |  SELECT e.vec_id, arg_max(c.centroid_id, list_dot_product(e.emb, c.c_emb)) AS cell
        |  FROM e CROSS JOIN c GROUP BY e.vec_id
        |), wc AS (
        |  SELECT e.vec_id, e.emb, cells.cell,
        |    sqrt(list_dot_product(e.emb, e.emb)) AS n
        |  FROM e JOIN cells USING (vec_id)
        |), q AS (
        |  SELECT vec_id AS query_id, emb AS q_emb, cell AS q_cell, n AS qn
        |  FROM wc WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, wc.vec_id,
        |    list_dot_product(q.q_emb, wc.emb) / (q.qn * wc.n) AS cos
        |  FROM wc JOIN q ON wc.cell = q.q_cell AND wc.vec_id <> q.query_id
        |)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim FROM (
        |  SELECT query_id, vec_id AS neighbor_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // same cell logic as q_ann_ivf; query side is vec_id % 4 = 1
    // (the data-scaled query set), k = 5
    "q_knn_join" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e
        |      WHERE vec_id % 61 = 0 AND vec_id < 488),
        |cells AS (
        |  SELECT e.vec_id, arg_max(c.centroid_id, list_dot_product(e.emb, c.c_emb)) AS cell
        |  FROM e CROSS JOIN c GROUP BY e.vec_id
        |), wc AS (
        |  SELECT e.vec_id, e.emb, cells.cell,
        |    sqrt(list_dot_product(e.emb, e.emb)) AS n
        |  FROM e JOIN cells USING (vec_id)
        |), q AS (
        |  SELECT vec_id AS query_id, emb AS q_emb, cell AS q_cell, n AS qn
        |  FROM wc WHERE vec_id % 4 = 1
        |), scored AS (
        |  SELECT q.query_id, wc.vec_id,
        |    list_dot_product(q.q_emb, wc.emb) / (q.qn * wc.n) AS cos
        |  FROM wc JOIN q ON wc.cell = q.q_cell AND wc.vec_id <> q.query_id
        |)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim FROM (
        |  SELECT query_id, vec_id AS neighbor_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // neighbor ranking identical to q_knn_join (query side vec_id % 5
    // = 2, k = 5), then majority vote with (votes desc, best rank,
    // label) tie-break
    "q_knn_classify" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e
        |      WHERE vec_id % 61 = 0 AND vec_id < 488),
        |cells AS (
        |  SELECT e.vec_id, arg_max(c.centroid_id, list_dot_product(e.emb, c.c_emb)) AS cell
        |  FROM e CROSS JOIN c GROUP BY e.vec_id
        |), wc AS (
        |  SELECT e.vec_id, e.emb, cells.cell,
        |    sqrt(list_dot_product(e.emb, e.emb)) AS n
        |  FROM e JOIN cells USING (vec_id)
        |), q AS (
        |  SELECT vec_id AS query_id, emb AS q_emb, cell AS q_cell, n AS qn
        |  FROM wc WHERE vec_id % 5 = 2
        |), scored AS (
        |  SELECT q.query_id, wc.vec_id,
        |    list_dot_product(q.q_emb, wc.emb) / (q.qn * wc.n) AS cos
        |  FROM wc JOIN q ON wc.cell = q.q_cell AND wc.vec_id <> q.query_id
        |), nn AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT query_id, vec_id AS neighbor_id,
        |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |    FROM scored)
        |  WHERE rank <= 5
        |), votes AS (
        |  SELECT nn.query_id, CAST(emb2.label AS BIGINT) AS label,
        |    CAST(COUNT(*) AS BIGINT) AS votes, MIN(nn.rank) AS best_rank
        |  FROM nn JOIN embeddings emb2 ON emb2.vec_id = nn.neighbor_id
        |  GROUP BY 1, 2)
        |SELECT query_id, label AS pred_label, votes FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY votes DESC, best_rank, label) AS rn
        |  FROM votes)
        |WHERE rn = 1""".stripMargin,

    "q_ann_ivf_probe2" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e
        |      WHERE vec_id % 61 = 0 AND vec_id < 488),
        |scored_cells AS (
        |  SELECT e.vec_id, c.centroid_id,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_dot_product(e.emb, c.c_emb) DESC, c.centroid_id DESC) AS rn
        |  FROM e CROSS JOIN c
        |),
        |cells AS (SELECT vec_id, centroid_id AS cell FROM scored_cells WHERE rn = 1),
        |wc AS (
        |  SELECT e.vec_id, e.emb, cells.cell,
        |    sqrt(list_dot_product(e.emb, e.emb)) AS n
        |  FROM e JOIN cells USING (vec_id)
        |),
        |qcells AS (SELECT vec_id AS query_id, centroid_id AS cell
        |           FROM scored_cells WHERE rn <= 2 AND vec_id < 5),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb,
        |        sqrt(list_dot_product(emb, emb)) AS qn
        |      FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, wc.vec_id,
        |    list_dot_product(q.q_emb, wc.emb) / (q.qn * wc.n) AS cos
        |  FROM wc
        |  JOIN qcells ON wc.cell = qcells.cell
        |  JOIN q ON q.query_id = qcells.query_id AND wc.vec_id <> q.query_id
        |)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim FROM (
        |  SELECT query_id, vec_id AS neighbor_id, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 10""".stripMargin,

    "q_ann_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, emb AS c_emb FROM e
        |      WHERE vec_id % 61 = 0 AND vec_id < 488),
        |cells AS (
        |  SELECT e.vec_id, arg_max(c.centroid_id, list_dot_product(e.emb, c.c_emb)) AS cell
        |  FROM e CROSS JOIN c GROUP BY e.vec_id
        |), wc AS (
        |  SELECT e.vec_id, e.emb, cells.cell,
        |    sqrt(list_dot_product(e.emb, e.emb)) AS n
        |  FROM e JOIN cells USING (vec_id)
        |), qv AS (
        |  SELECT vec_id AS query_id, emb AS q_emb, cell AS q_cell, n AS qn
        |  FROM wc WHERE vec_id < 5
        |), ivf_topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT qv.query_id, wc.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY qv.query_id
        |        ORDER BY list_dot_product(qv.q_emb, wc.emb) / (qv.qn * wc.n) DESC,
        |          wc.vec_id) AS rank
        |    FROM wc JOIN qv ON wc.cell = qv.q_cell AND wc.vec_id <> qv.query_id)
        |  WHERE rank <= 10
        |), exact_topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q2.query_id, e2.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY q2.query_id
        |        ORDER BY list_dot_product(q2.q_emb, e2.emb)
        |          / (q2.qn * sqrt(list_dot_product(e2.emb, e2.emb))) DESC,
        |          e2.vec_id) AS rank
        |    FROM e e2 JOIN (SELECT vec_id AS query_id, emb AS q_emb,
        |        sqrt(list_dot_product(emb, emb)) AS qn FROM e WHERE vec_id < 5) q2
        |      ON e2.vec_id <> q2.query_id)
        |  WHERE rank <= 10
        |)
        |SELECT x.query_id,
        |  CAST(COUNT(a.query_id) AS DOUBLE) / 10.0 AS recall_at_k
        |FROM exact_topk x
        |LEFT JOIN ivf_topk a
        |  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
        |GROUP BY 1""".stripMargin,

    "q_materialize" -> q(
      """SELECT _schema, _table,
        |  after_user_id AS user_id, after_value AS value, after_k AS k,
        |  _commit_ts AS _applied_ts
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY _schema, _table,
        |      CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END
        |    ORDER BY _commit_ts DESC, _start_ts DESC,
        |      CASE WHEN _op = 'D' THEN 1 WHEN _op = 'U' THEN 2 ELSE 3 END DESC,
        |      _row_id DESC) AS rn
        |  FROM env)
        |WHERE rn = 1 AND _op <> 'D'""".stripMargin),

    // the full (unchunked) compare — identical classification
    "q_table_diff" ->
      """WITH dst AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 89 = 5 THEN text || ' CORRUPTED' ELSE text END AS text,
        |    lang, source, n_chars
        |  FROM documents WHERE doc_id % 97 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 101 = 7),
        |cmp AS (
        |  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
        |    CASE WHEN d.doc_id IS NULL THEN 'missing_dst'
        |         WHEN s.doc_id IS NULL THEN 'extra_dst'
        |         WHEN s.text <> d.text OR s.lang <> d.lang
        |           OR s.source <> d.source OR s.n_chars <> d.n_chars THEN 'mismatch'
        |    END AS diff_kind
        |  FROM documents s FULL OUTER JOIN dst d ON s.doc_id = d.doc_id)
        |SELECT doc_id, diff_kind FROM cmp WHERE diff_kind IS NOT NULL""".stripMargin,

    "q_snapshot_asof" -> q(
      """SELECT _schema, _table,
        |  after_user_id AS user_id, after_value AS value, after_k AS k,
        |  _commit_ts AS _applied_ts
        |FROM (
        |  SELECT e.*, ROW_NUMBER() OVER (
        |    PARTITION BY _schema, _table,
        |      CASE WHEN _op = 'D' THEN before_user_id ELSE after_user_id END
        |    ORDER BY _commit_ts DESC, _start_ts DESC,
        |      CASE WHEN _op = 'D' THEN 1 WHEN _op = 'U' THEN 2 ELSE 3 END DESC,
        |      _row_id DESC) AS rn
        |  FROM env e
        |  CROSS JOIN (SELECT CAST((MIN(_commit_ts) + MAX(_commit_ts)) // 2 AS BIGINT)
        |                AS snap FROM env) s
        |  WHERE e._commit_ts <= s.snap)
        |WHERE rn = 1 AND _op <> 'D'""".stripMargin),

    // mean/variance CTE shapes mirror analytics/Anomaly.scala
    // expression-for-expression (IEEE determinism needs equal shape)
    "q_anomaly" ->
      s"""WITH vm AS (
         |  SELECT event_id, event_type,
         |    epoch_ns(ts) // 86400000000000 AS day,
         |    CAST(round(value * 1000.0) AS BIGINT) AS value_milli
         |  FROM events),
         |stats AS (
         |  SELECT event_type, day, COUNT(*) AS n,
         |    CAST(SUM(value_milli) AS BIGINT) AS s,
         |    CAST(SUM(value_milli * value_milli) AS BIGINT) AS ss
         |  FROM vm GROUP BY 1, 2),
         |m AS (
         |  SELECT event_type, day, n, ss,
         |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
         |  FROM stats),
         |sd AS (
         |  SELECT event_type, day, mean,
         |    sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean) AS sdv
         |  FROM m
         |  WHERE CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean > 0.0)
         |SELECT event_id, event_type, day, value_milli, z_milli FROM (
         |  SELECT vm.event_id, vm.event_type, vm.day, vm.value_milli,
         |    CAST(round(((CAST(value_milli AS DOUBLE) - mean) / sdv) * 1000.0)
         |      AS BIGINT) AS z_milli
         |  FROM vm JOIN sd USING (event_type, day))
         |WHERE abs(z_milli) >= $anomalyZMilli""".stripMargin
  )
}
