package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Row-shape transforms (SURVEY §2.5): column selection, update-image
  * minimization, delete minimization, and the unique-key-change
  * update→delete+insert split.
  */
object Transforms {

  private def payloadFields(env: DataFrame): Seq[String] =
    env.schema("after").dataType.asInstanceOf[StructType].fieldNames.toSeq

  private def imageStruct(img: String, keep: Seq[String]): Column =
    struct(keep.map(f => col(s"$img.$f").as(f)): _*)

  /** Per-table column whitelist for MQ sinks
    * (downstreamadapter/sink/columnselector/column_selector.go:29-120).
    * Rebuilds both images with only `keep` fields; null images stay
    * null. */
  def columnSelector(env: DataFrame, keep: Seq[String]): DataFrame =
    env
      .withColumn("before",
        when(col("before").isNull, lit(null)).otherwise(imageStruct("before", keep)))
      .withColumn("after",
        when(col("after").isNull, lit(null)).otherwise(imageStruct("after", keep)))

  /** Per-table-MATCHER column selection rules — the reference's
    * selector is a rule LIST (matcher → columns), first matching rule
    * wins, unmatched tables keep every column
    * (column_selector.go:29-120). Field retention is decided per row
    * by the codegen'd matcher chain (no per-rule passes); fields a
    * row's rule drops become null in both images, preserving one
    * schema across tables. Every rule must keep the handle keys
    * (column_selector.go:162). */
  def columnSelectorRules(env: DataFrame, rules: Seq[(Seq[String], Seq[String])],
                          handleKeys: Seq[String]): DataFrame = {
    rules.foreach { case (m, cols) =>
      require(verifyKeySurvives(cols, handleKeys),
        s"column selector rule $m -> $cols drops handle keys $handleKeys")
    }
    val fields = payloadFields(env)
    def keepField(f: String): Column =
      rules.foldRight(lit(true)) { case ((matcher, cols), acc) =>
        when(TableMatcher.matches(col("_schema"), col("_table"), matcher),
          lit(cols.contains(f))).otherwise(acc)
      }
    def conform(img: String): Column = struct(fields.map { f =>
      when(keepField(f), col(s"$img.$f")).otherwise(lit(null)).as(f)
    }: _*)
    env
      .withColumn("before",
        when(col("before").isNull, lit(null)).otherwise(conform("before")))
      .withColumn("after",
        when(col("after").isNull, lit(null)).otherwise(conform("after")))
  }

  /** Verify a handle/unique key survives column selection — the
    * reference refuses configs that would strip all unique keys
    * (column_selector.go:162). */
  def verifyKeySurvives(keep: Seq[String], handleKeys: Seq[String]): Boolean =
    handleKeys.forall(keep.contains)

  /** only-output-updated-columns (pkg/config/sink.go:163-164): in
    * update post-images, null out fields that did not change; handle
    * keys always kept. */
  def updatedColumnsOnly(env: DataFrame, handleKeys: Seq[String]): DataFrame = {
    val fields = payloadFields(env)
    val minimized = struct(fields.map { f =>
      if (handleKeys.contains(f)) col(s"after.$f").as(f)
      else when(col(s"before.$f") <=> col(s"after.$f"), lit(null))
        .otherwise(col(s"after.$f")).as(f)
    }: _*)
    env.withColumn("after",
      when(col("_op") === "U", minimized).otherwise(col("after")))
  }

  /** delete-only-output-handle-key (pkg/config/sink.go:166-167):
    * deletes carry only the handle-key columns in the pre-image. */
  def deleteHandleKeyOnly(env: DataFrame, handleKeys: Seq[String]): DataFrame = {
    val fields = payloadFields(env)
    val stripped = struct(fields.map { f =>
      if (handleKeys.contains(f)) col(s"before.$f").as(f)
      else lit(null).cast(env.schema("before").dataType.asInstanceOf[StructType](f).dataType).as(f)
    }: _*)
    env.withColumn("before",
      when(col("_op") === "D", stripped).otherwise(col("before")))
  }

  /** Update that modifies a unique key splits into delete+insert so
    * downstream unique-key conflicts resolve (ordering-safe: delete
    * sorts before insert at the same commit via Envelope.opOrder;
    * reference pkg/eventservice/txn_scan_strategy.go:14-20,
    * mysql_writer_dml_batch.go:340-390).
    *
    * Single-pass, no self-union: each row becomes an array of one or
    * two envelope structs, exploded inline (whole-stage codegen'd).
    */
  def updateSplit(env: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keyChanged = keyCols
      .map(f => !(col(s"before.$f") <=> col(s"after.$f")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val asIs = struct(
      col("_op").as("_op"), col("before").as("before"), col("after").as("after"))
    val delHalf = struct(
      lit("D").as("_op"), col("before").as("before"),
      lit(null).cast(env.schema("after").dataType).as("after"))
    val insHalf = struct(
      lit("I").as("_op"),
      lit(null).cast(env.schema("before").dataType).as("before"),
      col("after").as("after"))
    env
      .withColumn("__split",
        when(col("_op") === "U" && keyChanged, array(delHalf, insHalf))
          .otherwise(array(asIs)))
      .withColumn("__e", explode(col("__split")))
      .select(
        col("_row_id"), col("_schema"), col("_table"),
        col("__e._op").as("_op"),
        col("_commit_ts"), col("_start_ts"),
        col("__e.before").as("before"), col("__e.after").as("after"))
  }
}
