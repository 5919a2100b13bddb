package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Ranks, TextAnalysis => TA}

/** Ranks.percentRankByKey must be a bit-identical drop-in for
  * `percent_rank() OVER (PARTITION BY kind ORDER BY v, id)` — the
  * ccnet_buckets oracle hashes its 9-dp rounding, so "close" is not a
  * contract. Every case compares full-precision doubles with ===.
  */
class RanksSpec extends SparkTestBase {
  import spark.implicits._

  private def windowPct(df: DataFrame): DataFrame =
    df.withColumn("pct", percent_rank().over(
      Window.partitionBy(col("k")).orderBy(col("v"), col("id"))))

  private def check(df: DataFrame): Unit = {
    val expected = windowPct(df)
      .select(col("k"), col("v"), col("id"), col("pct"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val got = Ranks.percentRankByKey(df, col("k"), col("v"), col("id"))
      .select(col("k"), col("v"), col("id"), col("pct"))
      .collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getDouble(1), r.getLong(2))
      assert(r.getDouble(3) === expected(key), s"at $key")
    }
  }

  test("matches window percent_rank on adversarial tie shapes") {
    // one kind dominated by a mega-tie at v=0 (the zero-filled-docs
    // shape), ids deliberately unordered; a singleton kind (Spark's
    // 0/0 -> 0.0 corner); a two-row kind; a kind of nothing but ties
    val rows =
      (1 to 200).map(i => ("en", 0.0, (997L * i) % 1000)) ++      // mega-tie
      (1 to 50).map(i => ("en", i / 10.0 + 1.0, 2000L + i)) ++     // spread
      Seq(("solo", 5.0, 1L)) ++                                    // singleton
      Seq(("two", 1.0, 2L), ("two", 1.0, 1L)) ++                   // pure tie pair
      (1 to 30).map(i => ("tie", 7.0, i.toLong))                   // all one group
    check(rows.toDF("k", "v", "id"))
  }

  test("rankByKey matches window rank()-1 on the tie-shape battery") {
    // the integer form feeding SuffixRanks' doubling: must equal
    // rank() OVER (PARTITION BY k ORDER BY v, id) - 1 exactly — and on
    // a DISTINCT-(v, id) input that is also the dense rank of pairs
    val rows =
      (1 to 200).map(i => ("en", 0.0, (997L * i) % 1000)) ++
      (1 to 50).map(i => ("en", i / 10.0 + 1.0, 2000L + i)) ++
      Seq(("solo", 5.0, 1L)) ++
      Seq(("two", 1.0, 2L), ("two", 1.0, 1L)) ++
      (1 to 30).map(i => ("tie", 7.0, i.toLong))
    val df = rows.toDF("k", "v", "id")
    val expected = df.withColumn("r0",
        rank().over(Window.partitionBy(col("k"))
          .orderBy(col("v"), col("id"))).cast("long") - 1L)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val got = Ranks.rankByKey(df, col("k"), col("v"), col("id"), "r0")
      .collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getDouble(1), r.getLong(2))
      assert(r.getLong(3) === expected(key), s"at $key")
    }
  }

  test("matches window percent_rank on the real scoring output (sf0.001)") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(TA.docPerplexity(spark, sf("sf0.001"))
        .select(col("doc_id"), col("cross_entropy")), Seq("doc_id"))
      .select(col("lang").as("k"), col("cross_entropy").as("v"),
        col("doc_id").as("id"))
    check(scored)
  }

  test("no corpus-scale single-key window in the plan") {
    // The helper's windows run over the distinct-value table, the
    // per-(kind,bucket) slices, and tie-group cells — never over raw
    // rows partitioned by the kind alone. Guard: every Window node in
    // the physical plan partitions by at least two expressions, except
    // the offsets window, whose input is the nB-row per-(kind, bucket)
    // count table (detectable: its child aggregates on exactly
    // (_k, _b)).
    val df = Ranks.percentRankByKey(
      (1 to 100).map(i => ("en", i / 7.0, i.toLong)).toDF("k", "v", "id"),
      col("k"), col("v"), col("id"))
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val wide = w.partitionSpec.size >= 2
      val overBucketCounts = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.size == 2 => a
      }.nonEmpty
      assert(wide || overBucketCounts,
        s"single-key window over non-aggregated input: $w")
    }
  }
}
