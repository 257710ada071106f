package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Open-protocol BATCH wire format — the reference's actual Kafka
  * message layout (pkg/sink/codec/open/encoder.go:32-224,
  * decoder.go:92-135). One Kafka message carries MANY row events:
  *
  * {{{
  *   message.Key   = version:8 (big-endian, = 1)
  *                   ++ [ keyLen:8 ++ keyJson ]*
  *   message.Value = [ valueLen:8 ++ valueJson ]*
  * }}}
  *
  * Packing is GREEDY in event order (encoder.go:157-167 pushMessage):
  * a new message starts when the current one would exceed
  * `maxBatchedBytes` (counting the sarama record overhead the
  * reference budgets per message, message.go:26) or already holds
  * `maxBatchSize` events. A single event larger than the byte cap
  * still ships as its own one-event message (the reference's size
  * check rejects oversized SINGLE messages one layer up, in the
  * large-message handle — [[LargeMessage]]).
  *
  * DDL and checkpoint (resolved-ts) events are NEVER batched: each is
  * its own message in the same framing with exactly one frame
  * (encoder.go:226-273 — `enhancedKeyValue` shape). A checkpoint's
  * value is the single 8-byte zero length prefix (no payload).
  *
  * Scale: the DataFrame packer groups by (topic, partition) — one
  * group per Kafka partition per micro-batch, which is exactly the
  * reference encoder-group's in-memory buffer (encoder_group.go). The
  * per-group collect holds one partition's admission-capped slice
  * (flow control bounds it, SURVEY §4); parallelism = partition
  * count, the same knob the reference has.
  */
object OpenBatch {

  val batchVersion1: Long = 1L

  /** sarama's per-record size budget the reference adds to a
    * message's length when checking the byte cap
    * (common/message.go:21-26: 5*MaxVarintLen32 + MaxVarintLen64 + 1). */
  val maxRecordOverhead: Int = 5 * 5 + 10 + 1

  /** One packed wire message: framed key/value bytes + event count. */
  case class Packed(key: Array[Byte], value: Array[Byte], rows: Int)

  def be64(n: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((n >>> (8 * (7 - i))) & 0xffL).toByte; i += 1 }
    b
  }

  def readBe64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Greedy batch packing over (keyBytes, valueBytes) events in
    * order — byte-true to pushMessage (encoder.go:157-192): the
    * boundary check uses the CURRENT message length including the
    * version head and all framing, plus [[maxRecordOverhead]], against
    * `maxBatchedBytes`; the event's own cost is key+value+16 (its two
    * length prefixes). */
  def packBatches(events: Seq[(Array[Byte], Array[Byte])],
                  maxBatchSize: Int, maxBatchedBytes: Int): Seq[Packed] = {
    require(maxBatchSize > 0, "maxBatchSize must be positive")
    val out = scala.collection.mutable.ArrayBuffer.empty[Packed]
    var keyBuf: ByteArrayOutputStream = null
    var valBuf: ByteArrayOutputStream = null
    var rows = 0
    def flush(): Unit =
      if (rows > 0) out += Packed(keyBuf.toByteArray, valBuf.toByteArray, rows)
    events.foreach { case (k, v) =>
      val eventLen = k.length + v.length + 16
      val boundary = rows == 0 ||
        keyBuf.size + valBuf.size + maxRecordOverhead + eventLen > maxBatchedBytes ||
        rows >= maxBatchSize
      if (boundary) {
        flush()
        keyBuf = new ByteArrayOutputStream()
        valBuf = new ByteArrayOutputStream()
        rows = 0
        keyBuf.write(be64(batchVersion1), 0, 8)
      }
      keyBuf.write(be64(k.length.toLong), 0, 8)
      keyBuf.write(k, 0, k.length)
      valBuf.write(be64(v.length.toLong), 0, 8)
      valBuf.write(v, 0, v.length)
      rows += 1
    }
    flush()
    out.toSeq
  }

  /** Inverse of [[packBatches]] for one message — the consumer's walk
    * (decoder.go:92-135 AddKeyValue + HasNext + next*Event). */
  def unpackBatch(key: Array[Byte], value: Array[Byte]): Seq[(Array[Byte], Array[Byte])] = {
    val version = readBe64(key, 0)
    require(version == batchVersion1, s"unsupported open batch version $version")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
    var ko = 8
    var vo = 0
    while (ko < key.length) {
      val kl = readBe64(key, ko).toInt; ko += 8
      val k = java.util.Arrays.copyOfRange(key, ko, ko + kl); ko += kl
      val vl = readBe64(value, vo).toInt; vo += 8
      val v = java.util.Arrays.copyOfRange(value, vo, vo + vl); vo += vl
      out += ((k, v))
    }
    require(vo == value.length,
      s"open batch value trailing bytes: consumed $vo of ${value.length}")
    out.toSeq
  }

  /** Single-event framing — the shape DDL and checkpoint messages use
    * (encoder.go:206-224 enhancedKeyValue / :241-273
    * EncodeCheckpointEvent): exactly one frame per message. An empty
    * value still carries its 8-byte zero length prefix. */
  def singleMessage(key: Array[Byte], value: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val k = new ByteArrayOutputStream(16 + key.length)
    k.write(be64(batchVersion1), 0, 8)
    k.write(be64(key.length.toLong), 0, 8)
    k.write(key, 0, key.length)
    val v = new ByteArrayOutputStream(8 + value.length)
    v.write(be64(value.length.toLong), 0, 8)
    v.write(value, 0, value.length)
    (k.toByteArray, v.toByteArray)
  }

  private def jsEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Open-protocol DDL wire message, two-part key/value framed form
    * (encodeDDLEvent, open/codec.go:121-165): key carries the DDL's
    * finishedTs with t=2 (MessageTypeDDL), value is {"q": query,
    * "t": job action type}. */
  def ddlMessage(finishedTs: Long, schema: String, table: String,
                 query: String, actionType: Int,
                 valueCodec: String = "none"): (Array[Byte], Array[Byte]) =
    singleMessage(
      s"""{"ts":$finishedTs,"scm":"${jsEsc(schema)}","tbl":"${jsEsc(table)}","t":2}"""
        .getBytes(UTF_8),
      Compression.encode(valueCodec,
        s"""{"q":"${jsEsc(query)}","t":$actionType}""".getBytes(UTF_8)))

  /** Checkpoint (resolved-ts) wire message (EncodeCheckpointEvent,
    * encoder.go:241-273): key {"ts",..,"t":3}, value EMPTY — on the
    * wire the value is just its zero length prefix. */
  def resolvedMessage(ts: Long): (Array[Byte], Array[Byte]) =
    singleMessage(s"""{"ts":$ts,"t":3}""".getBytes(UTF_8), Array.emptyByteArray)

  // ---------------------------------------------------------------
  // DataFrame layer
  // ---------------------------------------------------------------

  /** Pack per-event open messages (`_key`/`_value` string columns,
    * e.g. [[Codecs.openProtocol]] output) into batch wire frames.
    *
    * One output row per Kafka message:
    * (groupCols…, _batch_seq, _key_bytes, _value_bytes, _batch_rows).
    *
    * Events order within a group by `orderCols` (then key/value text
    * as a total-order tiebreak), the commit-ts order the reference's
    * per-partition encoder receives. The per-group collect is one
    * Kafka partition's micro-batch slice — the reference encoder
    * group's in-memory buffer, admission-bounded (never corpus-sized). */
  def packOpenBatches(msgs: DataFrame, maxBatchSize: Int,
                      maxBatchedBytes: Int = Int.MaxValue,
                      groupCols: Seq[String] = Seq("_partition"),
                      orderCols: Seq[String] = Seq("_commit_ts", "_row_id"),
                      valueCodec: String = "none"): DataFrame =
    if (maxBatchedBytes == Int.MaxValue)
      packOpenBatchesPositional(msgs, maxBatchSize, groupCols, orderCols,
        valueCodec)
    else packOpenBatchesGreedy(msgs, maxBatchSize, maxBatchedBytes, groupCols,
      orderCols, valueCodec)

  /** Byte-cap path: the boundary depends on accumulated bytes, so the
    * whole group must be walked in order by ONE packer. The per-group
    * collect is one Kafka partition's micro-batch slice — the
    * reference encoder group's in-memory buffer, admission-bounded
    * (never corpus-sized). */
  private def packOpenBatchesGreedy(msgs: DataFrame, maxBatchSize: Int,
                                    maxBatchedBytes: Int,
                                    groupCols: Seq[String],
                                    orderCols: Seq[String],
                                    valueCodec: String): DataFrame = {
    // order fields get positional aliases so an orderCol named _key/
    // _value cannot collide with the payload fields
    val ev = struct((orderCols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__o$i")
    } :+ col("_key").as("_key") :+ col("_value").as("_value")): _*)
    // per-event VALUE compression happens before framing, exactly where
    // the reference compresses (encodeRowChangedEvent → common.Compress
    // → pushMessage); keys stay plain — the consumer reads the type
    // field before touching the value
    val packer = udf((keys: Seq[String], values: Seq[String]) =>
      packBatches(keys.zip(values).map { case (k, v) =>
        (k.getBytes(UTF_8),
          Compression.encode(valueCodec, v.getBytes(UTF_8)))
      }, maxBatchSize, maxBatchedBytes))
    msgs.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(ev)).as("__evs"))
      .withColumn("__batches", packer(
        expr("transform(__evs, e -> e._key)"),
        expr("transform(__evs, e -> e._value)")))
      .select((groupCols.map(col) :+ posexplode(col("__batches"))): _*)
      .select(groupCols.map(col) :+ col("pos").as("_batch_seq") :+
        col("col.key").as("_key_bytes") :+ col("col.value").as("_value_bytes") :+
        col("col.rows").as("_batch_rows"): _*)
  }

  /** Count-cap-only path: when the byte cap cannot bind, the greedy
    * boundary is POSITIONAL — event i (in group order) belongs to
    * batch i/maxBatchSize. A window ranks events, a per-BATCH grouping
    * collects each ≤maxBatchSize slice, and the frame build + value
    * compression parallelize across batches instead of serializing in
    * one packer task per Kafka partition (the old shape held an entire
    * partition's events in ONE aggregation buffer — a memory hazard at
    * scale — and packed them single-threaded). Byte-identical to the
    * greedy path: same total order, same slicing, same framing. */
  private def packOpenBatchesPositional(msgs: DataFrame, maxBatchSize: Int,
                                        groupCols: Seq[String],
                                        orderCols: Seq[String],
                                        valueCodec: String): DataFrame = {
    require(maxBatchSize > 0, "maxBatchSize must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy((orderCols.map(col) :+ col("_key") :+ col("_value")): _*)
    val rn = row_number().over(w) - 1
    val ev = struct(col("__idx"), col("_key").as("_key"),
      col("_value").as("_value"))
    // one batch per row: reuse the greedy packer for byte-exactness
    // (version head + per-frame length prefixes); a ≤maxBatchSize
    // slice always packs to exactly one message
    val packer = udf((keys: Seq[String], values: Seq[String]) => {
      packBatches(keys.zip(values).map { case (k, v) =>
        (k.getBytes(UTF_8),
          Compression.encode(valueCodec, v.getBytes(UTF_8)))
      }, maxBatchSize, Int.MaxValue).head
    })
    msgs
      .withColumn("__idx", pmod(rn, lit(maxBatchSize)))
      .withColumn("__seq", floor(rn / lit(maxBatchSize)).cast("int"))
      .groupBy((groupCols.map(col) :+ col("__seq")): _*)
      .agg(sort_array(collect_list(ev)).as("__evs"))
      .withColumn("__b", packer(
        expr("transform(__evs, e -> e._key)"),
        expr("transform(__evs, e -> e._value)")))
      .select(groupCols.map(col) :+ col("__seq").as("_batch_seq") :+
        col("__b.key").as("_key_bytes") :+ col("__b.value").as("_value_bytes") :+
        col("__b.rows").as("_batch_rows"): _*)
  }

  /** Explode batch frames back into per-event (`_key`, `_value`)
    * strings with their in-batch index — the consumer side. */
  def unpackOpenBatches(batches: DataFrame,
                        groupCols: Seq[String] = Seq("_partition"),
                        valueCodec: String = "none"): DataFrame = {
    val un = udf((k: Array[Byte], v: Array[Byte]) =>
      unpackBatch(k, v).map { case (kb, vb) =>
        (new String(kb, UTF_8),
          new String(Compression.decode(valueCodec, vb), UTF_8))
      })
    batches.withColumn("__evs", un(col("_key_bytes"), col("_value_bytes")))
      .select((groupCols.map(col) :+ col("_batch_seq") :+
        posexplode(col("__evs"))): _*)
      .select(groupCols.map(col) :+ col("_batch_seq") :+
        col("pos").as("_batch_idx") :+
        col("col._1").as("_key") :+ col("col._2").as("_value"): _*)
  }

  /** Kafka writer frame for packed batches: topic/partition/key/value
    * with the batch bytes as the record key/value ([[graft.sinks.KafkaSink]]
    * contract — the connector consumes binary columns directly). */
  def kafkaFrame(packed: DataFrame, topic: String): DataFrame =
    packed.select(
      lit(topic).as("topic"),
      col("_partition").cast("int").as("partition"),
      col("_key_bytes").as("key"),
      col("_value_bytes").as("value"))

  // ---------------------------------------------------------------
  // FileMq record wrapper: the parquet MQ stand-in carries a STRING
  // `_value` per record, so a binary Kafka record (key+value bytes)
  // rides as a compact {"k":base64,"v":base64} wrapper — the
  // transport-level record, nothing protocol-visible.
  // ---------------------------------------------------------------

  def frameJson(key: Array[Byte], value: Array[Byte]): String = {
    val e = java.util.Base64.getEncoder
    s"""{"k":"${e.encodeToString(key)}","v":"${e.encodeToString(value)}"}"""
  }

  def parseFrame(s: String): (Array[Byte], Array[Byte]) = {
    // MIME decoder: tolerant of line breaks should an encoder chunk
    val d = java.util.Base64.getMimeDecoder
    val re = """\{"k":"([^"]*)","v":"([^"]*)"\}""".r
    s match {
      case re(k, v) => (d.decode(k), d.decode(v))
      case _ => throw new IllegalArgumentException(s"not a record frame: $s")
    }
  }

  /** Column form of [[frameJson]] (codegen'd — the per-batch wrapper
    * stays inside the write projection). Spark's base64 chunks MIME
    * line breaks every 76 chars; strip them so the wrapper stays valid
    * single-line JSON. */
  def frameJsonCol(key: org.apache.spark.sql.Column,
                   value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def b64(c: org.apache.spark.sql.Column) =
      regexp_replace(base64(c), "[\\r\\n]", "")
    concat(lit("{\"k\":\""), b64(key), lit("\",\"v\":\""), b64(value), lit("\"}"))
  }
}
