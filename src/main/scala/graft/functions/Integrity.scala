package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Routing

/** Row-level checksum integrity (SURVEY §2.1; reference
  * pkg/integrity/checksum.go, pkg/common/event/checksum.go, levels
  * none/correctness pkg/config/integrity.go:24-33).
  *
  * The checksum is the stable 60-bit hash over the canonical rendering
  * of both images — portable across engines/languages like the
  * routing hash, so downstream consumers can re-verify.
  */
object Integrity {

  /** Canonical checksum of an envelope row's payload. */
  def checksumColumn: Column = {
    def img(i: String): Column = concat_ws(";",
      coalesce(col(s"$i.user_id").cast("string"), lit("")),
      coalesce(col(s"$i.value").cast(DecimalType(18, 2)).cast("string"), lit("")),
      coalesce(col(s"$i.k").cast("string"), lit("")))
    Routing.stableHash(Seq(col("_op"), img("before"), img("after")))
  }

  /** DuckDB mirror over the flattened envelope. */
  def checksumSql: String = {
    def img(i: String): String =
      s"concat_ws(';', COALESCE(CAST(${i}_user_id AS VARCHAR), '')," +
        s" COALESCE(CAST(CAST(${i}_value AS DECIMAL(18,2)) AS VARCHAR), '')," +
        s" COALESCE(CAST(${i}_k AS VARCHAR), ''))"
    Routing.stableHashSql(Seq("_op", img("before"), img("after")))
  }

  def withChecksum(env: DataFrame): DataFrame =
    env.withColumn("_checksum", checksumColumn)

  /** Re-compute and compare (mounter-side verification,
    * pkg/common/event/mounter.go checksum path): adds `_checksum_ok`;
    * corrupt rows are flagged, not dropped — the reference's
    * correctness level errors out, ours side-channels. */
  def verify(env: DataFrame): DataFrame =
    env.withColumn("_checksum_ok", col("_checksum") === checksumColumn)

  /** Typed checksum over a DDL-defined column model — the generic form
    * of [[checksumColumn]] for arbitrary CREATE TABLE schemas
    * (verify_checksum.go:96-145 buildChecksumBytes: integer-class
    * values fold by value, floats as float64, and the varchar class —
    * explicitly including JSON and TypeTiDBVectorFloat32 at :138 — by
    * their canonical string). Canonical token per column is the
    * wire-fidelity rendering ([[CanalFull.valueToken]]: bit/enum/set
    * as numeric value, vector via its VectorFloat32 bracket form,
    * binary charset-decoded), so equal MySQL values checksum equal
    * however they were written. Stable-hash over canonical strings
    * rather than crc32-of-LE-bytes — the repo's documented checksum
    * stance, portable to any engine that can render the same tokens.
    */
  def checksumColumnFor(cols: Seq[graft.model.MySqlDdl.MySqlCol]): Column = {
    def img(i: String): Seq[Column] =
      cols.map(c => CanalFull.valueToken(c, col(s"$i.${c.name}")))
    Routing.stableHash(col("_op") +: (img("before") ++ img("after")))
  }
}
