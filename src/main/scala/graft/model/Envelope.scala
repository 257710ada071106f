package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The universal change-event IR (SURVEY §7.1).
  *
  * One row = one row-change, Debezium-shaped: pre/post images as nested
  * structs instead of the reference's two-physical-rows chunk layout
  * (reference: pkg/common/event/row_change.go:24-51,
  * dml_event.go:382-384). Insert → `before` null; delete → `after`
  * null; update → both populated (row_change.go:64-78).
  *
  * Columns:
  *   _row_id     long    source record id (stable, for tests/ordering)
  *   _schema     string  upstream schema name
  *   _table      string  upstream table name
  *   _op         string  I | U | D
  *   _commit_ts  long    commit timestamp, ns (resolved-ts domain)
  *   _start_ts   long    txn start timestamp, ns (< _commit_ts)
  *   before      struct  pre-image  (null for I)
  *   after       struct  post-image (null for D)
  */
object Envelope {

  val metaCols: Seq[String] =
    Seq("_row_id", "_schema", "_table", "_op", "_commit_ts", "_start_ts")

  /** The events-fixture payload shape (user_id, value, k) — the struct
    * type of `before`/`after` in [[fromEvents]] output. */
  val payloadSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("k", LongType)))
  }

  /** DMLOrder within a txn: Delete < Update < Insert — mirrors the
    * eventstore sort-key byte (logservice/eventstore/format.go:26-60). */
  def opOrder(op: Column): Column =
    when(op === "D", 1).when(op === "U", 2).otherwise(3)

  /** Deterministic change-log derivation from the driver's `events`
    * table (TESTDATA.md): signup/purchase → insert, error → delete,
    * click/view → update. The payload row is (user_id, value, k) with
    * k extracted from the JSON props. Updates synthesize a pre-image
    * (value-1.0, k-1); deletes carry only the pre-image.
    *
    * `ts` enters the envelope as long nanos regardless of how the
    * source parquet encodes it (raw int64 ns via
    * spark.sql.legacy.parquet.nanosAsLong, or timestamp[us] — the
    * driver's testdata has shipped both), so commit-ts arithmetic is
    * exact and matches the DuckDB oracle's epoch_ns().
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val tsNs = graft.Tables.nsExpr(
      events.schema.fields.find(_.name == "ts")
        .map(_.dataType).getOrElse(org.apache.spark.sql.types.LongType),
      col("ts"))
    val k = get_json_object(col("props"), "$.k").cast("long")
    val op = when(col("event_type").isin("signup", "purchase"), "I")
      .when(col("event_type") === "error", "D")
      .otherwise("U")
    val img = struct(
      col("user_id").as("user_id"),
      col("value").as("value"),
      k.as("k"))
    val preImg = struct(
      col("user_id").as("user_id"),
      (col("value") - lit(1.0)).as("value"),
      (k - lit(1L)).as("k"))
    events.select(
      col("event_id").as("_row_id"),
      lit("app").as("_schema"),
      concat(lit("events_"), pmod(col("user_id"), lit(4L)).cast("string")).as("_table"),
      op.as("_op"),
      // truncate ns → µs boundary: the oracle engine (DuckDB) reads
      // parquet ns-timestamps at µs precision, and downstream protocol
      // encoders only carry ms/µs anyway.
      (tsNs - pmod(tsNs, lit(1000L))).as("_commit_ts"),
      (tsNs - pmod(tsNs, lit(1000L))
        - pmod(col("event_id"), lit(1000L)) - lit(1L)).as("_start_ts"),
      when(op === "I", lit(null)).otherwise(when(op === "D", img).otherwise(preImg)).as("before"),
      when(op === "D", lit(null)).otherwise(img).as("after")
    )
  }

  /** Envelope from a FLAT change-row frame (meta columns + payload
    * columns at top level — the shape the DSv2 changelog generator
    * emits): images nest per op. Payload columns default to every
    * non-meta column of the frame, so any flat change-row shape
    * nests without hardcoding. The generator carries no old value,
    * so updates reuse the post-image as pre-image (a delete-safe
    * approximation; sources with true old-value emit both). */
  def fromFlat(df: DataFrame, payloadCols: Seq[String] = Nil): DataFrame = {
    val payload =
      if (payloadCols.nonEmpty) payloadCols
      else df.columns.toSeq.filterNot(metaCols.contains)
    require(payload.nonEmpty, "flat change-row frame has no payload columns")
    val img = struct(payload.map(col): _*)
    df.select(
      col("_row_id"), col("_schema"), col("_table"), col("_op"),
      col("_commit_ts"), col("_start_ts"),
      when(col("_op") === "I", lit(null)).otherwise(img).as("before"),
      when(col("_op") === "D", lit(null)).otherwise(img).as("after"))
  }

  /** Pre-decode type filter (event_scanner.go:802-820
    * `dmlTypeFilterCache`; filter.go:52 `ShouldIgnoreDMLByEventType`):
    * dropping by DML type must happen BEFORE decode, on the raw
    * source column, so the predicate reaches the parquet scan
    * (PushedFilters) and skipped rows never deserialize. Maps the
    * envelope ops back to their raw event types and filters the
    * events frame itself — compose as
    * `fromEvents(preDecodeTypeFilter(events, ignoreOps))`. */
  /** The ops with CLOSED type sets in [[fromEvents]]; "U" is the
    * `.otherwise` branch, so its type set is open-ended by
    * construction and must never be enumerated here. */
  private val explicitOpTypes: Map[String, Seq[String]] =
    Map("I" -> Seq("signup", "purchase"), "D" -> Seq("error"))

  def preDecodeTypeFilter(events: DataFrame, ignoreOps: Seq[String]): DataFrame = {
    ignoreOps.foreach(op =>
      require(op == "U" || explicitOpTypes.contains(op), s"unknown op $op"))
    if (ignoreOps.isEmpty) events
    else if (ignoreOps.contains("U")) {
      // dropping "U" = keeping only the retained ops' explicit sets —
      // the complement form, so a new event_type in the fixture still
      // classifies identically to the post-decode eventTypeFilter
      val keepTypes = explicitOpTypes.collect {
        case (op, types) if !ignoreOps.contains(op) => types
      }.flatten.toSeq
      events.filter(col("event_type").isin(keepTypes: _*))
    } else {
      val ignoreTypes = ignoreOps.flatMap(explicitOpTypes)
      events.filter(!col("event_type").isin(ignoreTypes: _*))
    }
  }

  /** Flatten before/after structs into prefixed columns — the shape the
    * DuckDB oracle compares (nested structs hash differently across
    * engines; scalars don't). */
  def flat(env: DataFrame): DataFrame =
    env.select(
      col("_row_id"), col("_schema"), col("_table"), col("_op"),
      col("_commit_ts"), col("_start_ts"),
      col("before.user_id").as("before_user_id"),
      col("before.value").as("before_value"),
      col("before.k").as("before_k"),
      col("after.user_id").as("after_user_id"),
      col("after.value").as("after_value"),
      col("after.k").as("after_k"))
}

/** DuckDB-dialect SQL fragments mirroring [[Envelope]] — composed into
  * SparkEntry.oracleSql entries so every operator query has a textual
  * oracle over the same parquet tables. */
object EnvelopeSql {

  /** CTE producing the flattened envelope (DuckDB dialect). */
  val cte: String =
    """WITH env AS (
      |  SELECT
      |    event_id AS _row_id,
      |    'app' AS _schema,
      |    'events_' || CAST(user_id % 4 AS VARCHAR) AS _table,
      |    CASE WHEN event_type IN ('signup','purchase') THEN 'I'
      |         WHEN event_type = 'error' THEN 'D'
      |         ELSE 'U' END AS _op,
      |    epoch_ns(ts) AS _commit_ts,
      |    epoch_ns(ts) - (event_id % 1000) - 1 AS _start_ts,
      |    CASE WHEN event_type IN ('signup','purchase') THEN NULL ELSE user_id END AS before_user_id,
      |    CASE WHEN event_type IN ('signup','purchase') THEN NULL
      |         WHEN event_type = 'error' THEN value
      |         ELSE value - 1.0 END AS before_value,
      |    CASE WHEN event_type IN ('signup','purchase') THEN NULL
      |         WHEN event_type = 'error' THEN CAST(props->>'$.k' AS BIGINT)
      |         ELSE CAST(props->>'$.k' AS BIGINT) - 1 END AS before_k,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS after_user_id,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS after_value,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE CAST(props->>'$.k' AS BIGINT) END AS after_k
      |  FROM events
      |)""".stripMargin

  /** Compose the envelope CTE with a body query (body refers to `env`). */
  def query(body: String): String = s"$cte\n$body"
}
