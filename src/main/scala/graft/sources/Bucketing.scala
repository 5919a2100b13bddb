package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout for co-located fact-fact joins — the storage
  * arrangement that removes the shuffle from `orders ⋈ lineitem` at
  * 100 TB. Both facts are written bucketed AND sorted by the join key;
  * a join between them then plans as SortMergeJoin with NO Exchange on
  * either side (the spec asserts this on the physical plan).
  *
  * At warehouse scale you'd bucket by the highest-fanout join key at
  * ingest time and size `numBuckets` so each bucket file stays in the
  * 128-512 MB range per partition.
  */
object Bucketing {

  /** Write orders + lineitem as bucketed tables into the session
    * catalog (idempotent; `spark.sql.warehouse.dir` controls where).
    */
  def writeBucketedFacts(spark: SparkSession, dir: String,
      numBuckets: Int = 8): Unit = {
    // drop both catalog entry AND any orphaned managed location (a
    // fresh in-memory catalog forgets tables but their dirs survive)
    Seq("orders_bucketed", "lineitem_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Tables.orders(spark, dir).write
      .bucketBy(numBuckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").mode("overwrite").saveAsTable("orders_bucketed")
    Tables.lineitem(spark, dir).write
      .bucketBy(numBuckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").mode("overwrite").saveAsTable("lineitem_bucketed")
  }

  /** Revenue per order status over the bucketed facts. With both sides
    * bucketed+sorted on the key, the join runs shuffle-free.
    */
  def bucketedOrderRevenue(spark: SparkSession): DataFrame =
    spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))
}
