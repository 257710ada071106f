package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  * All graft queries take the sf directory as a parameter so the same
  * plan runs at any scale factor (and, on a cluster, against a
  * partitioned table layout instead of one file).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = read(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = read(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = read(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = read(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame = read(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")
}
