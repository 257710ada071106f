package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Big-big AS-OF join: each probe row picks up the payload of the
  * latest build row with the same key and `ts_build <= ts_probe`.
  *
  * [[SchemaAsOf.resolve]] is the broadcast form (dimension small by
  * definition — DDL-rate-sized). This is the form for when BOTH sides
  * are data-scaled (attribute events to the latest preceding signup,
  * join readings to the latest calibration, price ticks to trades):
  * tag the two inputs, union them, and run ONE running window per
  * key — `last(payload, ignoreNulls)` over (ts, side) order carries
  * the most recent build payload forward into every probe row.
  *
  * Scale properties (the reason this beats the textbook range join):
  *  - exactly one hash exchange (on the key) + one in-partition sort —
  *    the same cost as the eventstore's sorted scan;
  *  - no range-condition join, so no per-key quadratic candidate
  *    explosion and nothing to broadcast;
  *  - the window is a running frame — state per partition is one
  *    payload, never a buffered range.
  *
  * Determinism: window order is (ts, side, tieBreak...) — build rows
  * (side 0) sort before probe rows at equal ts, so an equal-ts build
  * row IS visible to the probe (`<=` semantics, matching DuckDB's
  * ASOF JOIN). If the build side can hold several rows per (key, ts),
  * pass `tieBreak` to make `last` pick one deterministically.
  */
object AsOfJoin {

  /** @param probe       rows to enrich (kept 1:1)
    * @param build       rows providing the as-of payload
    * @param keyCol      equality key column (same name both sides)
    * @param tsCol       ordering column (same name/type both sides)
    * @param payloadCols build columns to carry onto probe rows
    * @param tieBreak    extra build-side order columns for equal-ts
    *                    determinism (highest wins)
    */
  def asof(probe: DataFrame, build: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "asof join needs at least one payload column")
    val pay = struct(payloadCols.map(col): _*)
    val tagged = probe
      .withColumn("__side", lit(1))
      .unionByName(
        build.select(
          Seq(col(keyCol), col(tsCol), lit(0).as("__side"), pay.as("__pay")) ++
            tieBreak.map(c => col(c).as(s"__tb_$c")): _*),
        allowMissingColumns = true)
    val order: Seq[Column] =
      Seq(col(tsCol).asc, col("__side").asc) ++
        tieBreak.map(c => col(s"__tb_$c").asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged.withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
    val outCols = probe.columns.map(col) ++
      payloadCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    carried.filter(col("__side") === 1).select(outCols.toIndexedSeq: _*)
  }
}
