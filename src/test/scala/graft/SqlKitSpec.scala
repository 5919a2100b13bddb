package graft

import org.apache.spark.sql.functions._
import graft.operators.SqlKit

/** Pins the SqlKit operators to Spark built-ins where the oracle had
  * to use a portable formulation instead: the explicit histogram
  * bucket formula vs width_bucket, and the decimal-moment skewness/
  * kurtosis vs the native aggregates.
  */
class SqlKitSpec extends SparkTestBase {
  import spark.implicits._

  test("histogram bucket formula == built-in width_bucket - 1") {
    // parity holds on [lo, hi); at x >= hi width_bucket reports the
    // overflow bucket (n+1) while the histogram clamps into the top
    // bucket by design — so compare inside the domain only
    val mismatches = graft.sources.Tables.orders(spark, sf("sf0.001"))
      .filter(col("o_totalprice") < 500000.0)
      .select(
        least(floor(col("o_totalprice") / 50000.0), lit(9L)).cast("long")
          .as("formula"),
        (width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0), lit(10)) - 1)
          .cast("long").as("builtin"))
      .filter(col("formula") =!= col("builtin"))
      .count()
    assert(mismatches === 0)
  }

  test("decimal-moment skewness/kurtosis agree with the native aggregates") {
    val ours = SqlKit.robustStats(spark, sf("sf0.001"))
      .select("l_returnflag", "skewness_qty", "kurtosis_qty")
      .as[(String, Double, Double)].collect()
        .map { case (k, s, kk) => k -> ((s, kk)) }.toMap
    val native = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("s"),
        kurtosis(col("l_quantity")).as("k"))
      .as[(String, Double, Double)].collect()
        .map { case (k, s, kk) => k -> ((s, kk)) }.toMap
    assert(ours.keySet === native.keySet)
    ours.foreach { case (flag, (s, k)) =>
      assert(math.abs(s - native(flag)._1) < 1e-6, s"skewness($flag)")
      assert(math.abs(k - native(flag)._2) < 1e-6, s"kurtosis($flag)")
    }
  }

  test("unpivot is the inverse of the pivot that built the wide frame") {
    // melt(wide) must reproduce the direct long-form aggregation
    val long = SqlKit.unpivotOrders(spark, sf("sf0.001"))
      .as[(String, String, Long)].collect().toSet
    val direct = graft.sources.Tables.orders(spark, sf("sf0.001"))
      .withColumn("metric",
        when(col("o_orderpriority") === "1-URGENT", "n_urgent")
          .when(col("o_orderpriority") === "2-HIGH", "n_high")
          .otherwise("n_other"))
      .groupBy(col("o_orderstatus"), col("metric"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    // zero-count cells exist only in the unpivoted frame
    assert(direct.subsetOf(long))
    assert((long -- direct).forall(_._3 == 0L))
  }

  test("pii patterns: counts and redaction on synthetic edge cases") {
    val df = Seq(
      (1L, "contact me at bob@example.com or https://a.example.com/x?id=123456789"),
      (2L, "card 4111111122223333 pin 12345"),
      (3L, "plain text, no pii at all")).toDF("doc_id", "text")
    val got = df.select(
      col("doc_id"),
      regexp_count(col("text"), lit(graft.operators.TextQuality.UrlRe)).as("u"),
      regexp_count(col("text"), lit(graft.operators.TextQuality.EmailRe)).as("e"),
      regexp_count(col("text"), lit(graft.operators.TextQuality.LongNumRe)).as("n"))
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    // URL swallows its query-string digits only in the REPLACE pass;
    // the count pass counts both independently (documented order)
    assert(got(0) === ((1L, 1, 1, 1)))
    assert(got(1) === ((2L, 0, 0, 1))) // 12345 is below the 6-digit floor
    assert(got(2) === ((3L, 0, 0, 0)))
  }

  test("observe() audit metrics match the pipeline's actual output") {
    val obs = org.apache.spark.sql.Observation("curated_audit")
    val df = graft.operators.Pipeline.curatedCorpus(
      spark, sf("sf0.001"), audit = Some(obs))
    df.write.format("noop").mode("overwrite").save()
    val metrics = obs.get
    val rows = df.count()
    val tokens = df.agg(sum(col("n_tokens"))).as[Long].head()
    assert(metrics("rows_out") === rows)
    assert(metrics("tokens_out") === tokens)
  }

  test("month spine zero-fills months with no orders") {
    val dir = java.nio.file.Files.createTempDirectory("spine").toString
    Seq(
      (1L, 10L, "O", 100.0, java.sql.Timestamp.valueOf("1996-01-15 00:00:00"), "1-URGENT"),
      (2L, 11L, "O", 200.0, java.sql.Timestamp.valueOf("1996-04-02 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SqlKit.monthSpine(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("1996-01", 1L, 100.0), ("1996-02", 0L, 0.0),
      ("1996-03", 0L, 0.0), ("1996-04", 1L, 200.0)),
      s"spine must cover the gap months: $got")
  }

  test("from_json with explicit schema agrees with the regexp extraction") {
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val mismatches = ev.select(
      expr("from_json(props, 'k INT').k").as("typed"),
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int")
        .as("rx"))
      .filter(!(col("typed") <=> col("rx")))
      .count()
    assert(mismatches === 0)
  }
}
