package graft.model

/** Changefeed configuration ADT — mirrors the reference's user-facing
  * config surface (FilterConfig pkg/config/filter.go:21-47, SinkConfig
  * pkg/config/sink.go:139-200, DispatchRule pkg/config/sink.go:409-440)
  * re-expressed as plain Scala data.
  */
final case class FilterConfig(
    rules: Seq[String] = Seq("*.*"),
    caseSensitive: Boolean = false,
    ignoreOps: Seq[String] = Nil,
    ignoreTxnStartTs: Seq[Long] = Nil,
    ignoreInsertValueExpr: Option[String] = None,
    ignoreUpdateOldValueExpr: Option[String] = None,
    ignoreUpdateNewValueExpr: Option[String] = None,
    ignoreDeleteValueExpr: Option[String] = None,
    ignoreUpdateOnlyColumns: Seq[String] = Nil)

sealed trait PartitionRule
object PartitionRule {
  case object Table extends PartitionRule
  case object Ts extends PartitionRule
  final case class KeyColumns(cols: Seq[String]) extends PartitionRule
  /** Pin a table's rows to one worker partition — the data-plane
    * effect of api/v2 move_table (a span moves to a chosen node). */
  final case class Fixed(partition: Int) extends PartitionRule
  /** Fan a table's rows over `parts` sub-partitions (span split —
    * api/v2 split_table / the write-bytes splitter,
    * maintainer/split/splitter.go:41-65). Per-table ordering is
    * intentionally given up, exactly like a split table span. */
  final case class TableSplit(parts: Int) extends PartitionRule
  /** Split a table's rows across CHOSEN worker partitions — the
    * data-plane effect of api/v2 move_split_table (split a hot span
    * AND pin where the pieces land). */
  final case class SplitFixed(targets: Seq[Int]) extends PartitionRule
}

final case class DispatchRule(
    matcher: Seq[String] = Seq("*.*"),
    partition: PartitionRule = PartitionRule.Table,
    topic: Option[String] = None,
    targetSchema: Option[String] = None,
    targetTable: Option[String] = None)

sealed trait Protocol
object Protocol {
  case object CanalJson extends Protocol
  case object Open extends Protocol
  case object Debezium extends Protocol
  case object Csv extends Protocol
  case object Simple extends Protocol
}

final case class SinkConfig(
    protocol: Protocol = Protocol.CanalJson,
    numPartitions: Int = 16,
    safeMode: Boolean = false,
    columnSelector: Option[Seq[String]] = None,
    onlyOutputUpdatedColumns: Boolean = false,
    deleteOnlyOutputHandleKey: Boolean = false,
    dispatch: Seq[DispatchRule] = Seq(DispatchRule()),
    bdrMode: Boolean = false,
    /** Simple-protocol bootstrap re-send cadence (sink.go:191-200 +
      * bootstraper.go): a table's schema handshake is re-sent once
      * either the interval elapses or this many row messages have gone
      * out since the last one, so a consumer joining mid-stream gets a
      * handshake within a bounded message window. Either knob ≤ 0
      * disables re-sending (the reference's negative-disables rule). */
    sendBootstrapIntervalInSec: Long = 120L,
    sendBootstrapInMsgCount: Int = 10000,
    /** false → the handshake goes only to partition 0 of each topic
      * (bootstraper.go:173-176). */
    sendBootstrapToAllPartition: Boolean = true,
    /** true → bootstrap every replicated table once at changefeed
      * start (DefaultSendAllBootstrapAtStart). */
    sendAllBootstrapAtStart: Boolean = false,
    /** Pulsar client/producer block (sink.go:606-672 PulsarConfig),
      * rendered to connector options by Security.pulsarOptions. */
    pulsarConfig: Option[Security.PulsarConfig] = None)

final case class ChangefeedConfig(
    id: String,
    filter: FilterConfig = FilterConfig(),
    sink: SinkConfig = SinkConfig(),
    handleKeys: Seq[String] = Seq("user_id"),
    splitUpdateOnKeyChange: Boolean = true,
    syncPointIntervalNs: Option[Long] = None,
    /** Per-trigger admission cap — the flow-control role of the
      * reference's adaptive scan window / dynstream memory quota
      * (pkg/eventservice/scan_window.go:160-210,
      * docs/design/2024-12-20-ticdc-flow-control.md:36-58): bound how
      * much source data one micro-batch admits so memory stays flat;
      * Spark's backpressure replaces the pause/resume thresholds. */
    maxFilesPerTrigger: Option[Int] = None,
    /** Replication end ts (the reference's target-ts): once the
      * checkpoint reaches it the feed FINISHES — stops cleanly and no
      * longer blocks GC (StateFinished, config/changefeed.go:321). */
    targetTs: Option[Long] = None,
    /** Upstream keyspace (multi-tenant cluster): GC barriers compute
      * per keyspace (changefeed_db.go:345-368). */
    keyspace: String = "default",
    /** Sink security: mTLS credential + SASL
      * (pkg/security/credential.go:106-129, sasl.go:61-67; kafka
      * sink-URI params options.go:110-139). */
    security: Security.SecurityConfig = Security.SecurityConfig())
