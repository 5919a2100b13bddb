package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.sources.Bucketing

class BucketingSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bucketed fact-fact join plans without a shuffle and agrees with the plain join") {
    Bucketing.writeBucketedFacts(spark, sf("sf0.001"), numBuckets = 4)
    val df = Bucketing.bucketedOrderRevenue(spark)
    val result = df.collect() // materialize so AQE finalizes the plan

    val shuffles = collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }
    // the groupBy (status hash) and orderBy (range) each shuffle, but
    // the JOIN must not shuffle either bucketed side: no exchange may
    // partition on the join key
    assert(shuffles.size <= 2,
      s"unexpected shuffles:\n${df.queryExecution.executedPlan}")
    assert(shuffles.forall(s =>
      !s.outputPartitioning.toString.toLowerCase.contains("orderkey")),
      s"join-key shuffle found:\n${df.queryExecution.executedPlan}")

    val plain = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .join(graft.sources.Tables.orders(spark, sf("sf0.001")),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy(org.apache.spark.sql.functions.col("o_orderstatus"))
      .agg(
        org.apache.spark.sql.functions.sum(
          (org.apache.spark.sql.functions.col("l_extendedprice") *
            (org.apache.spark.sql.functions.lit(1.0) -
              org.apache.spark.sql.functions.col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_items"))
      .orderBy("o_orderstatus").collect()
    assert(result.sameElements(plain))
  }
}
