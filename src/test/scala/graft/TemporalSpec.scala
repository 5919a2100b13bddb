package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left time") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "lp")
    val right = Seq((1L, 90L, "r1"), (1L, 150L, "r2"), (2L, 60L, "r3"))
      .toDF("k", "t", "rp")
    val r = Temporal.asofJoin(left, right, "k", "t",
      leftCols = Seq("lp"), rightCols = Seq("rp"))
      .select("lp", "r_rp").as[(String, String)].collect().toMap
    assert(r === Map("p1" -> "r1", "p2" -> "r2")) // p3 has no preceding right
  }

  test("simultaneous right row is visible (>= semantics)") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 100L, "exact")).toDF("k", "t", "rp")
    val r = Temporal.asofJoin(left, right, "k", "t", Seq("lp"), Seq("rp"))
      .select("r_rp").as[String].collect()
    assert(r === Array("exact"))
  }

  test("ties among right rows resolve deterministically under any partitioning") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 90L, "a"), (1L, 90L, "z"), (1L, 90L, "m"))
      .toDF("k", "t", "rp")
    val results = Seq(1, 3, 7).map { p =>
      Temporal.asofJoin(left.repartition(p), right.repartition(p),
        "k", "t", Seq("lp"), Seq("rp"))
        .select("r_rp").as[String].collect().toSeq
    }
    assert(results.distinct.size === 1, s"tie nondeterminism: $results")
    assert(results.head === Seq("z")) // greatest payload wins the tie
  }

  test("forward asof picks the earliest right row at or after each left time") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 500L, "p3"))
      .toDF("k", "t", "lp")
    val right = Seq((1L, 150L, "r1"), (1L, 250L, "r2"), (2L, 400L, "r3"))
      .toDF("k", "t", "rp")
    val r = Temporal.asofJoinForward(left, right, "k", "t",
      leftCols = Seq("lp"), rightCols = Seq("rp"))
      .select("lp", "r_rp").as[(String, String)].collect().toMap
    assert(r === Map("p1" -> "r1", "p2" -> "r2")) // p3 has no following right
  }

  test("forward asof: simultaneous right row is visible and plan has no join nodes") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "lp")
    val right = Seq((1L, 100L, "exact")).toDF("k", "t", "rp")
    val df = Temporal.asofJoinForward(left, right, "k", "t", Seq("lp"), Seq("rp"))
    assert(df.select("r_rp").as[String].collect() === Array("exact"))
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "forward asof must be a window formulation, not a join")
  }

  test("native merge as-of join: plans AsOfMergeJoinExec and matches the window formulation") {
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    // same shaping as purchaseAsofClick so the comparison is end-to-end
    val native = Temporal.purchaseAsofClickNative(spark, sf("sf0.001"))
    val window = Temporal.purchaseAsofClick(spark, sf("sf0.001"))
    val n = native.collect().map(_.toSeq).toSet
    val w = window.collect().map(_.toSeq).toSet
    assert(ev.count() > 0 && n.nonEmpty)
    assert(n === w, "native merge as-of must reproduce the window rows")
    val hasExec = native.queryExecution.executedPlan.toString
      .contains("AsOfMergeJoin")
    assert(hasExec, "expected AsOfMergeJoinExec in the physical plan:\n" +
      native.queryExecution.executedPlan)
  }

  test("native as-of: unit semantics (latest-at-or-before, >=, greatest-payload tie)") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"),
      (3L, 10L, "p4")).toDF("k", "t", "lp")
    val right = Seq((1L, 90L, "r1"), (1L, 150L, "r2"), (1L, 150L, "z2"),
      (2L, 50L, "exact"), (9L, 1L, "other")).toDF("k", "t", "rp")
    val r = Temporal.asofJoinNative(left, right, "k", "t",
      leftCols = Seq("lp"), rightCols = Seq("rp"))
      .select("lp", "r_rp").as[(String, String)].collect().toMap
    // p1: r1; p2: greatest payload among the t=150 tie (z2); p3: exact
    // simultaneous match; p4: no right row on key 3 -> dropped
    assert(r === Map("p1" -> "r1", "p2" -> "z2", "p3" -> "exact"))
  }

  test("native FORWARD merge as-of: plans AsOfMergeJoinExec and matches the window formulation") {
    val native = Temporal.errorNextPurchaseNative(spark, sf("sf0.001"))
    val window = Temporal.errorNextPurchase(spark, sf("sf0.001"))
    val n = native.collect().map(_.toSeq).toSet
    val w = window.collect().map(_.toSeq).toSet
    assert(n.nonEmpty)
    assert(n === w, "native forward as-of must reproduce the window rows")
    assert(native.queryExecution.executedPlan.toString
      .contains("AsOfMergeJoin"),
      "expected AsOfMergeJoinExec in the physical plan:\n" +
        native.queryExecution.executedPlan)
  }

  test("native forward as-of: unit semantics (earliest-at-or-after, >=, least-payload tie)") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"),
      (3L, 10L, "p4")).toDF("k", "t", "lp")
    val right = Seq((1L, 150L, "r2"), (1L, 150L, "z2"), (1L, 90L, "early"),
      (2L, 50L, "exact"), (9L, 1L, "other")).toDF("k", "t", "rp")
    val r = Temporal.asofJoinNative(left, right, "k", "t",
      leftCols = Seq("lp"), rightCols = Seq("rp"), forward = true)
      .select("lp", "r_rp").as[(String, String)].collect().toMap
    // p1: the t=150 tie resolves to the LEAST payload (r2 < z2), and
    // the t=90 row is strictly before so invisible; p2: nothing at or
    // after 200 on key 1 -> dropped; p3: exact simultaneous match;
    // p4: no right row on key 3 -> dropped
    assert(r === Map("p1" -> "r2", "p3" -> "exact"))
  }

  test("native forward as-of: one right row serves multiple left rows") {
    // the forward merge must NOT consume its match: three left rows at
    // ascending times all resolve to the same later right row
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"))
      .toDF("k", "t", "lp")
    val right = Seq((1L, 30L, "hit")).toDF("k", "t", "rp")
    val r = Temporal.asofJoinNative(left, right, "k", "t",
      leftCols = Seq("lp"), rightCols = Seq("rp"), forward = true)
      .select("lp", "r_rp").as[(String, String)].collect().toMap
    assert(r === Map("a" -> "hit", "b" -> "hit", "c" -> "hit"))
  }

  test("range join honors the (a.t, a.t + window] bound across bucket edges") {
    val a = Seq((1L, 1000L, 10L), (1L, 3_600_000_000_000L - 1000L, 11L))
      .toDF("user_id", "ts", "event_id")
    val b = Seq(
      (1L, 2000L, 20L),                       // 1000 ns after event 10
      (1L, 3_600_000_000_000L + 500L, 21L),   // crosses the bucket edge
      (1L, 999L, 22L))                        // before: excluded
      .toDF("user_id", "ts", "event_id")
    val pairs = Temporal.rangeJoin(a, b, "user_id", "ts", 3600L * 1000000000L)
      .select(col("a.event_id"), col("b.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 20L)))
    assert(pairs.contains((11L, 21L)), "bucket-edge pair missed")
    assert(!pairs.exists(_._2 == 22L))
  }
}
