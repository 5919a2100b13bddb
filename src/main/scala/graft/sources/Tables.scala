package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All operators take a scale-factor directory (e.g. `/root/testdata/sf0.01`)
  * and read parquet through the DataSource V2 path so Catalyst can push
  * filters and prune columns into the scan. At cluster scale the same calls
  * work against any HDFS/S3 URI — nothing here assumes a local filesystem.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark's reader
    * only surfaces as a raw Long (spark.sql.legacy.parquet.nanosAsLong —
    * set in every graft session). Convert to microsecond TimestampType
    * with integer `div` (a double division would lose precision above
    * 2^53 ns). Sub-microsecond truncation is harmless downstream: every
    * oracle-checked query compares at second-or-coarser granularity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
