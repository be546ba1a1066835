package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the shared parquet test tables (TESTDATA.md).
  *
  * All `SparkEntry.queries` entries take `(spark, sfDir)` and read these
  * tables; the driver's DuckDB oracle reads the same files, so results must
  * be bit-comparable (see [[graft.ops.Parity]] for the numeric discipline).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which the vectorized Parquet
    * reader rejects; read nanos as long and convert losslessly (the data is
    * microsecond-aligned) to a session-TZ timestamp. `div` is integer
    * division — a double division would lose precision on epoch-nanos. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn(
      "ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
