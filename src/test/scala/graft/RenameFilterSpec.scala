package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Filters
import graft.model.MySqlDdl

/** Rename-under-filter decision table
  * (buildDDLEventForRenameTable/-Tables, logservice/schemastore/
  * persist_storage_ddl_handlers.go:2354-2518,:2792-2900;
  * tests/integration_tests/multi_tables_ddl): a table can leave a
  * changefeed through a rename but can never ENTER one — that rename
  * errors the feed with CDC:ErrSyncRenameTableFailed, which
  * FeedBackoff classifies unretryable. No Spark session needed: the
  * DataFrame path is oracle-checked by q_rename_dispatch. */
class RenameFilterSpec extends AnyFunSuite {

  private val rules = Seq("app.events_*", "!app.events_3")

  test("four-way single-pair table") {
    // stays in feed
    val keep = Filters.renameDispatch(
      "RENAME TABLE `events_1` TO `events_10`", "app", rules)
    assert(keep.action == "emit")
    assert(keep.query == "RENAME TABLE `app`.`events_1` TO `app`.`events_10`")
    assert(keep.addNames == Seq(("app", "events_10")))
    assert(keep.dropNames == Seq(("app", "events_1")))
    assert(keep.feedDrops.isEmpty)
    // leaves the feed: still emits (downstream executes the rename),
    // but the table drops out of tracking
    val leave = Filters.renameDispatch(
      "RENAME TABLE events_1 TO old_events_1", "app", rules)
    assert(leave.action == "emit")
    assert(leave.addNames.isEmpty)
    assert(leave.feedDrops == Seq(("app", "events_1")))
    // enters the feed: not allowed
    val enter = Filters.renameDispatch(
      "RENAME TABLE old_events_1 TO events_1", "app", rules)
    assert(enter.action == "error")
    // outside the feed entirely
    val out = Filters.renameDispatch(
      "RENAME TABLE foo TO bar", "app", rules)
    assert(out.action == "discard")
  }

  test("excluded-by-negation table behaves as filtered") {
    // events_3 is excluded: renaming it to a matching name = entering
    assert(Filters.renameDispatch(
      "RENAME TABLE events_3 TO events_30", "app", rules).action == "error")
    // renaming it to another non-matching name = both filtered
    assert(Filters.renameDispatch(
      "RENAME TABLE events_3 TO old_events_3", "app", rules).action == "discard")
  }

  test("multi-pair: skipped pairs drop from the rebuilt query; any entering pair errors all") {
    val mixed = Filters.renameDispatch(
      "RENAME TABLE events_1 TO events_10, foo TO bar", "app", rules)
    assert(mixed.action == "emit")
    assert(mixed.query == "RENAME TABLE `app`.`events_1` TO `app`.`events_10`")
    val err = Filters.renameDispatch(
      "RENAME TABLE events_1 TO events_10, foo TO events_20", "app", rules)
    assert(err.action == "error")
    val none = Filters.renameDispatch(
      "RENAME TABLE foo TO bar, baz TO qux", "app", rules)
    assert(none.action == "discard")
    // two surviving pairs keep statement order
    val two = Filters.renameDispatch(
      "RENAME TABLE events_1 TO events_10, events_2 TO old_events_2", "app", rules)
    assert(two.action == "emit")
    assert(two.query == "RENAME TABLE `app`.`events_1` TO `app`.`events_10`, " +
      "`app`.`events_2` TO `app`.`old_events_2`")
    assert(two.addNames == Seq(("app", "events_10")))
    assert(two.feedDrops == Seq(("app", "events_2")))
  }

  test("cross-schema rename qualifies with the event schema as default") {
    val pairs = MySqlDdl.parseRenameTableQualified(
      "RENAME TABLE t TO test2.t", "test")
    assert(pairs == Seq(("test", "t") -> ("test2", "t")))
    // moving out of a replicated schema = leaving the feed
    val cross = Filters.renameDispatch(
      "RENAME TABLE events_1 TO other.events_1", "app", rules)
    assert(cross.action == "emit")
    assert(cross.feedDrops == Seq(("app", "events_1")))
    // moving INTO the replicated schema = entering: error
    assert(Filters.renameDispatch(
      "RENAME TABLE other.events_9 TO `app`.`events_9`", "app", rules)
      .action == "error")
  }

  test("the error surfaces as the unretryable CDC error code") {
    assert(graft.streaming.FeedBackoff.defaultFastFailCodes
      .contains("CDC:ErrSyncRenameTableFailed"))
  }
}
