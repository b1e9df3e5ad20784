package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver fixture tables (TESTDATA.md).
  *
  * All tables are plain parquet under `\$dir/<name>.parquet`. The `events`
  * table carries a nanosecond-precision parquet timestamp, which Spark's
  * vectorized reader rejects by default; we flip
  * `spark.sql.legacy.parquet.nanosAsLong` and normalize to epoch
  * microseconds (`ts_us`, BIGINT) — the same value DuckDB's `epoch_us(ts)`
  * yields (DuckDB truncates parquet ns → µs on read), so oracle comparisons
  * line up exactly.
  *
  * Scale note: these helpers never cache or collect; every reader is a
  * plain parquet scan so Catalyst can push filters/prune columns into the
  * scan at any SF.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Runtime SQL conf: safe to set repeatedly; needed before any scan of
    // a nanos-timestamp parquet (events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with a normalized `ts_us` column (epoch microseconds,
    * matches DuckDB `epoch_us(ts)`), robust to the fixture's timestamp
    * physical type — the generator has shipped BOTH nanosecond parquet
    * timestamps (read as raw-ns LongType under `nanosAsLong`; integer
    * `div` because a double division would lose precision above 2^53 ns)
    * and microsecond timestamps (read as TIMESTAMP/ TIMESTAMP_NTZ;
    * `unix_micros` after a cast that binds the session's UTC zone, the
    * same instant DuckDB's `epoch_us` yields on the naive value).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    val tsUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    df.withColumn("ts_us", tsUs)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
