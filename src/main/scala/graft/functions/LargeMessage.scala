package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-message handling (SURVEY §2.5; reference
  * pkg/config/large_message.go:22-35 — options none /
  * handle-key-only / claim-check, applied in the open & canal
  * encoders; pointer message `ClaimCheckLocation` open/message.go:39).
  */
object LargeMessage {

  /** handle-key-only: oversized messages are re-encoded with only the
    * handle key (the consumer fetches the full row upstream). */
  def handleKeyOnly(encoded: DataFrame, maxBytes: Int): DataFrame = {
    val keyVal = when(col("_op") === "D", col("before.user_id"))
      .otherwise(col("after.user_id"))
    val compact = concat(
      lit("{\"_hk\":true,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"user_id\":"), coalesce(keyVal.cast("string"), lit("null")),
      lit("}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_value", when(col("_large"), compact).otherwise(col("_value")))
  }

  // ---- protocol-faithful handle-key-only forms (the generic `_hk`
  //      compact above predates them and stays for the oracle query;
  //      these mirror each protocol's own oversize re-encode:
  //      open_protocol_handle_key_only / kafka_simple_handle_key_only
  //      / canal_json_handle_key_only integration scenarios) ----

  private def hkKeyVal: Column =
    coalesce(when(col("_op") === "D", col("before.user_id"))
      .otherwise(col("after.user_id")).cast("string"), lit("null"))

  /** Open protocol: the key gains `"ohk":true` (codec.go:52-53), the
    * value re-encodes with only the handle-key column. */
  def openHandleKeyOnly(encoded: DataFrame, maxBytes: Int): DataFrame = {
    val hkKey = concat(
      lit("{\"ts\":"), col("_commit_ts"),
      lit(",\"scm\":\""), col("_schema"),
      lit("\",\"tbl\":\""), col("_table"),
      lit("\",\"t\":1,\"ohk\":true}"))
    val img = concat(lit("{\"user_id\":"), hkKeyVal, lit("}"))
    val hkValue =
      when(col("_op") === "D", concat(lit("{\"d\":"), img, lit("}")))
        .otherwise(concat(lit("{\"u\":"), img, lit("}")))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_key", when(col("_large"), hkKey).otherwise(col("_key")))
      .withColumn("_value", when(col("_large"), hkValue).otherwise(col("_value")))
  }

  /** Simple protocol: the row message re-marshals with
    * `handleKeyOnly:true` and handle-key-only images
    * (simple/encoder.go:88 MarshalRowChangedEvent(event, true, "")). */
  def simpleHandleKeyOnly(encoded: DataFrame, maxBytes: Int): DataFrame = {
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    val img = concat(lit("{\"user_id\":\""), hkKeyVal, lit("\"}"))
    val hkValue = concat(
      lit("{\"version\":1,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"type\":\""), typ,
      lit("\",\"commitTs\":"), col("_commit_ts"),
      lit(",\"buildTs\":"), (col("_commit_ts") / 1000000L).cast("long"),
      lit(",\"handleKeyOnly\":true,"),
      when(col("_op") === "D", concat(lit("\"old\":"), img))
        .otherwise(concat(lit("\"data\":"), img)),
      lit("}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_value", when(col("_large"), hkValue).otherwise(col("_value")))
  }

  /** Canal-JSON (TiDB-extension form): full canal message with
    * handle-key-only data and `_tidb.onlyHandleKey:true`
    * (canal_json_encoder.go:328-332). */
  def canalHandleKeyOnly(encoded: DataFrame, maxBytes: Int): DataFrame = {
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    val msRender = (col("_commit_ts") / 1000000L).cast("long")
    val hkValue = concat(
      lit("{\"id\":0,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"pkNames\":[\"user_id\"],\"isDdl\":false,\"type\":\""), typ,
      lit("\",\"es\":"), msRender,
      lit(",\"ts\":"), msRender,
      lit(",\"data\":[{\"user_id\":"), hkKeyVal,
      lit("}],\"old\":null,\"_tidb\":{\"commitTs\":"), col("_commit_ts"),
      lit(",\"onlyHandleKey\":true}}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_value", when(col("_large"), hkValue).otherwise(col("_value")))
  }

  /** MQ message batching under max-message-bytes — the encoder-group
    * packing (pkg/sink/codec/encoder_group.go; open-protocol batches
    * several events per MQ message, flushing when the next event
    * would exceed max-message-bytes, pkg/config/sink.go
    * MaxMessageBytes).
    *
    * Deterministic formulation: within each routing partition, events
    * take wire order (commit, start, DMLOrder, row id) and the batch
    * index is floor(exclusive-running-bytes / maxBytes) — a soft cap
    * (a batch may overflow by at most one message) that is
    * expressible identically in any engine, unlike the writer's
    * stateful greedy loop; the batch-count difference vs greedy is at
    * most the overflow messages. One window per partition — the same
    * per-partition sequencing the MQ producer itself needs. */
  def messageBatches(encoded: DataFrame, maxBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_partition"))
      .orderBy(col("_commit_ts"), col("_start_ts"),
        graft.model.Envelope.opOrder(col("_op")), col("_row_id"))
    encoded
      .withColumn("_msg_bytes", length(col("_value")).cast("long"))
      .withColumn("_msg_batch",
        floor((sum(col("_msg_bytes")).over(w) - col("_msg_bytes")) / maxBytes))
  }

  /** Per-message compression of the wire value
    * (`large-message-handle-compression`, large_message.go:33 +
    * pkg/compression): `_value` → compressed `_value_bin` binary with
    * the codec recorded on the row (the consumer reads the codec from
    * sink config / message header, here a column). Compose AFTER
    * handle-key-only / claim-check — the reference compresses whatever
    * payload survives the large-message handling. */
  def compressed(encoded: DataFrame, codec: String): DataFrame =
    encoded
      .withColumn("_codec", lit(codec))
      .withColumn("_value_bin",
        Compression.compressCol(codec)(col("_value").cast("binary")))

  /** Consumer-side inverse of [[compressed]]. */
  def decompressed(msgs: DataFrame, codec: String): DataFrame =
    msgs.withColumn("_value",
      Compression.decompressCol(codec)(col("_value_bin")).cast("string"))

  // ---- claim-check end to end (open + simple; the reference's
  //      kafka_simple_claim_check_avro / open_protocol_claim_check
  //      integration scenarios) ----

  /** ClaimCheckMessage storage wrapper — the object body the producer
    * uploads (pkg/sink/kafka/claimcheck/claim_check.go WriteMessage:
    * Go json.Marshal of {Key, Value []byte}, so both sides ride as
    * base64 strings). */
  def claimCheckWrap(key: Column, value: Column): Column = {
    // Spark's base64() is the MIME form (76-char lines, CRLF); strip
    // the line breaks so the wrapper is the single-line Go encoding
    def b64(c: Column): Column =
      regexp_replace(base64(coalesce(c, lit("")).cast("binary")), "[\\r\\n]", "")
    concat(lit("{\"key\":\""), b64(key),
      lit("\",\"value\":\""), b64(value), lit("\"}"))
  }

  /** Deterministic per-row object location (the reference names
    * objects with a fresh UUID, claim_check.go:NewFileName; a
    * row-derived name makes checkpoint replays overwrite instead of
    * leak). */
  private def claimLocation(prefix: String): Column =
    concat(lit(prefix.stripSuffix("/")), lit("/"), col("_schema"), lit("/"),
      col("_table"), lit("/"), col("_row_id").cast("string"), lit(".json"))

  /** Upload every oversized message's wrapped (key, value) to
    * `storageUri` — executor-side through the Hadoop FS API (one
    * object per message, exactly the reference's
    * claimCheck.WriteMessage against its external storage; file://,
    * hdfs:// and s3a:// all resolve through the same interface).
    * Returns the number of objects written. */
  def writeClaimChecks(encoded: DataFrame, maxBytes: Int, storageUri: String,
                      keyCol: Option[String] = None,
                      rawValue: Boolean = false): Long = {
    val key = keyCol.map(col).getOrElse(lit(""))
    // claim-check-raw-value (large_message.go:34): the object is the
    // bare value, no {key,value} wrapper — consumers that only need
    // the payload skip a decode hop (rejected for open, whose key is
    // load-bearing)
    val body =
      if (rawValue) col("_value")
      else claimCheckWrap(key, col("_value"))
    val objects = encoded
      .filter(length(col("_value")) > maxBytes)
      .select(claimLocation(storageUri).as("_loc"), body.as("_body"))
    val written = objects.rdd.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      var n = 0L
      it.foreach { r =>
        val path = new org.apache.hadoop.fs.Path(r.getString(0))
        val fs = path.getFileSystem(conf)
        val out = fs.create(path, true)
        try out.write(r.getString(1).getBytes("UTF-8")) finally out.close()
        n += 1
      }
      Iterator.single(n)
    }.fold(0L)(_ + _)
    written
  }

  /** Open-protocol claim-check (encoder.go:100-116 + codec.go:52-58):
    * the oversized message's full (key, value) is uploaded wrapped;
    * the stream message's KEY gains `"ohk":false,"ccl":"<location>"`
    * and its value shrinks to the handle-key-only image. Call on the
    * output of Codecs.openProtocol. */
  def openClaimCheck(encoded: DataFrame, maxBytes: Int, storageUri: String,
                     onStored: Long => Unit = _ => ()): DataFrame = {
    onStored(writeClaimChecks(encoded, maxBytes, storageUri, keyCol = Some("_key")))
    val loc = claimLocation(storageUri)
    val pointerKey = concat(
      lit("{\"ts\":"), col("_commit_ts"),
      lit(",\"scm\":\""), col("_schema"),
      lit("\",\"tbl\":\""), col("_table"),
      lit("\",\"t\":1,\"ohk\":false,\"ccl\":\""), loc, lit("\"}"))
    val hkImage = concat(lit("{\"user_id\":"),
      coalesce(when(col("_op") === "D", col("before.user_id"))
        .otherwise(col("after.user_id")).cast("string"), lit("null")),
      lit("}"))
    val pointerValue =
      when(col("_op") === "D", concat(lit("{\"d\":"), hkImage, lit("}")))
        .otherwise(concat(lit("{\"u\":"), hkImage, lit("}")))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_claim_location", when(col("_large"), loc))
      .withColumn("_key", when(col("_large"), pointerKey).otherwise(col("_key")))
      .withColumn("_value", when(col("_large"), pointerValue).otherwise(col("_value")))
  }

  /** Simple-protocol claim-check (simple/encoder.go:79-88: the
    * pointer is the row message re-marshaled handle-key-only with
    * `claimCheckLocation` set; the stored object wraps the FULL
    * original message). Call on the output of Codecs.simpleProtocol. */
  def simpleClaimCheck(encoded: DataFrame, maxBytes: Int, storageUri: String,
                       rawValue: Boolean = false,
                       onStored: Long => Unit = _ => ()): DataFrame = {
    onStored(writeClaimChecks(encoded, maxBytes, storageUri, rawValue = rawValue))
    val loc = claimLocation(storageUri)
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    val keyVal = coalesce(when(col("_op") === "D", col("before.user_id"))
      .otherwise(col("after.user_id")).cast("string"), lit("null"))
    val hkImg = concat(lit("{\"user_id\":\""), keyVal, lit("\"}"))
    val pointer = concat(
      lit("{\"version\":1,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"type\":\""), typ,
      lit("\",\"commitTs\":"), col("_commit_ts"),
      lit(",\"buildTs\":"), (col("_commit_ts") / 1000000L).cast("long"),
      lit(",\"handleKeyOnly\":true,\"claimCheckLocation\":\""), loc, lit("\","),
      when(col("_op") === "D", concat(lit("\"old\":"), hkImg))
        .otherwise(concat(lit("\"data\":"), hkImg)),
      lit("}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_claim_location", when(col("_large"), loc))
      .withColumn("_value", when(col("_large"), pointer).otherwise(col("_value")))
  }

  /** Simple-protocol oversize forms under `encoding-format = avro`
    * (kafka_simple_handle_key_only_avro / kafka_simple_claim_check_avro):
    * the wire is the official com.pingcap.simple.avro binary in the
    * string frame, so the re-encode DECODES the frame and re-marshals
    * the DML with both images trimmed to the handle keys — a column
    * expression cannot express the avro re-marshal (the library-codec
    * justification tier, same as the encoder itself). */
  def simpleAvroHandleKeyOnly(encoded: DataFrame, maxBytes: Int,
                              handleKeys: Seq[String]): DataFrame = {
    val hk = handleKeys
    val re = udf((v: String) => SimpleAvroWire.oversizeReencode(v, hk, None))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_value",
        when(col("_large"), re(col("_value"))).otherwise(col("_value")))
  }

  /** Claim-check form: the FULL avro message stores first (a pointer
    * is never visible before its object is durable — every form's
    * ordering), then oversize frames become handleKeyOnly pointers
    * carrying `claimCheckLocation`; locations are content-addressed so
    * the two passes agree with no driver state. */
  def simpleAvroClaimCheck(encoded: DataFrame, maxBytes: Int,
                           storageUri: String, handleKeys: Seq[String],
                           onStored: Long => Unit = _ => ()): DataFrame = {
    val uri = storageUri.stripSuffix("/")
    val acc = encoded.sparkSession.sparkContext
      .longAccumulator("graft.simpleAvroClaimChecks")
    encoded.filter(length(col("_value")) > maxBytes).select(col("_value"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val frame = r.getString(0)
          SimpleAvroWire.dmlOf(frame).foreach { case (db, tb, bytes) =>
            storeClaimCheck(
              SimpleAvroWire.claimLocationOf(uri, db, tb, frame),
              Array.emptyByteArray, bytes)
            acc.add(1L)
          }
        }
      }
    onStored(acc.value)
    val hk = handleKeys
    val re = udf((v: String) => SimpleAvroWire.oversizeReencode(v, hk, Some(uri)))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_value",
        when(col("_large"), re(col("_value"))).otherwise(col("_value")))
  }

  /** Canal-JSON claim-check (canal_json_encoder.go:506-521 +
    * newJSONMessageForDML:318-338): the pointer is a full canal
    * message rendered handle-key-only whose `_tidb` extension carries
    * commitTs + claimCheckLocation (the TiDB-extension form the
    * validation demands for canal). Call on Codecs.canalJson output. */
  def canalClaimCheck(encoded: DataFrame, maxBytes: Int, storageUri: String,
                      rawValue: Boolean = false,
                      onStored: Long => Unit = _ => ()): DataFrame = {
    onStored(writeClaimChecks(encoded, maxBytes, storageUri, rawValue = rawValue))
    val loc = claimLocation(storageUri)
    val typ = when(col("_op") === "I", "INSERT")
      .when(col("_op") === "U", "UPDATE").otherwise("DELETE")
    val keyVal = coalesce(when(col("_op") === "D", col("before.user_id"))
      .otherwise(col("after.user_id")).cast("string"), lit("null"))
    val msRender = (col("_commit_ts") / 1000000L).cast("long")
    val pointer = concat(
      lit("{\"id\":0,\"database\":\""), col("_schema"),
      lit("\",\"table\":\""), col("_table"),
      lit("\",\"pkNames\":[\"user_id\"],\"isDdl\":false,\"type\":\""), typ,
      lit("\",\"es\":"), msRender,
      lit(",\"ts\":"), msRender,
      lit(",\"data\":[{\"user_id\":"), keyVal,
      lit("}],\"old\":null,\"_tidb\":{\"commitTs\":"), col("_commit_ts"),
      lit(",\"claimCheckLocation\":\""), loc, lit("\"}}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_claim_location", when(col("_large"), loc))
      .withColumn("_value", when(col("_large"), pointer).otherwise(col("_value")))
  }

  /** Consumer side: follow every pointer back to storage and restore
    * the full original (key, value) — the decoder's
    * assembleEventFromClaimCheckStorage (open/decoder.go:341-358,
    * simple/decoder.go:194). `locCol` carries each row's
    * claim-check location (null for plain rows): open consumers take
    * it from the key's `ccl`, simple consumers from the value's
    * `claimCheckLocation`. Per-pointer object reads happen
    * executor-side, matching the reference's per-message ReadFile. */
  def resolveClaimChecks(msgs: DataFrame, locCol: Column,
                         keyCol: String = "_key",
                         valueCol: String = "_value",
                         rawValue: Boolean = false): DataFrame = {
    val fetch = udf { (loc: String) =>
      if (loc == null) null
      else {
        val conf = new org.apache.hadoop.conf.Configuration()
        val path = new org.apache.hadoop.fs.Path(loc)
        val fs = path.getFileSystem(conf)
        val in = fs.open(path)
        val body =
          try {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
            bos.toString("UTF-8")
          } finally in.close()
        if (rawValue) Array(null: String, body)
        else {
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
          def b64(f: String): String = Option(node.get(f)).map(v =>
            new String(java.util.Base64.getDecoder.decode(v.asText()), "UTF-8")).orNull
          Array(b64("key"), b64("value"))
        }
      }
    }
    val resolved = msgs.withColumn("__cc", fetch(locCol))
    val withKey =
      if (msgs.columns.contains(keyCol))
        resolved.withColumn(keyCol,
          coalesce(element_at(col("__cc"), 1), col(keyCol)))
      else resolved
    withKey
      .withColumn(valueCol, coalesce(element_at(col("__cc"), 2), col(valueCol)))
      .drop("__cc")
  }

  /** Scalar claim-check fetch + unwrap for BINARY wire protocols
    * (simple-over-Avro: the stored value is raw Avro, not UTF-8 text,
    * so the string-typed [[resolveClaimChecks]] cannot carry it).
    * Returns (key bytes, value bytes). */
  def fetchClaimCheck(location: String): (Array[Byte], Array[Byte]) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    val body =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    def b64(f: String): Array[Byte] = Option(node.get(f))
      .map(v => java.util.Base64.getDecoder.decode(v.asText()))
      .getOrElse(Array.emptyByteArray)
    (b64("key"), b64("value"))
  }

  /** Producer-side scalar store for binary protocols: upload one
    * wrapped (key, value) object at `location`. */
  def storeClaimCheck(location: String, key: Array[Byte],
                      value: Array[Byte]): Unit = {
    val b64 = java.util.Base64.getEncoder
    val body = s"""{"key":"${b64.encodeToString(key)}","value":"${b64.encodeToString(value)}"}"""
    val conf = new org.apache.hadoop.conf.Configuration()
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** claim-check: oversized payloads go to external storage; the
    * message becomes a pointer. `locationPrefix` is the storage URI
    * prefix; the uploaded object path is deterministic per row. */
  def claimCheck(encoded: DataFrame, maxBytes: Int, locationPrefix: String): DataFrame = {
    val location = concat(lit(locationPrefix), lit("/"), col("_schema"), lit("/"),
      col("_table"), lit("/"), col("_row_id").cast("string"), lit(".json"))
    val pointer = concat(
      lit("{\"claimCheckLocation\":\""), location, lit("\"}"))
    encoded
      .withColumn("_large", length(col("_value")) > maxBytes)
      .withColumn("_claim_location", when(col("_large"), location))
      .withColumn("_value", when(col("_large"), pointer).otherwise(col("_value")))
  }
}
