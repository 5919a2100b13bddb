package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Physical-plan shape assertions — the properties that decide whether
  * these operators survive a 100x scale-up. A green result here means:
  * filters reach the parquet scan, dimension joins broadcast, top-k
  * never globally sorts, and the flagship pipeline shuffles exactly
  * once before its final order.
  */
class PlanShapeSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def planOf(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan
  }

  test("q1: shipdate predicate is pushed into the parquet scan") {
    val scans = planOf("q1_pricing").collectLeaves().map(_.toString)
    assert(scans.exists(s =>
      s.contains("PushedFilters") && s.contains("l_shipdate")),
      s"no pushed filter on l_shipdate:\n${scans.mkString("\n")}")
  }

  test("q1: scan reads only the needed columns") {
    val scan = planOf("q1_pricing").collectLeaves()
      .map(_.toString).find(_.contains("lineitem")).get
    assert(!scan.contains("l_partkey") && !scan.contains("l_suppkey"),
      s"scan reads pruned columns:\n$scan")
  }

  test("q5: nation and region join via broadcast, not shuffle") {
    val plan = planOf("q5_local_volume")
    val bcasts = collect(plan) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size >= 2, s"expected broadcast dims:\n$plan")
  }

  test("top_orders: top-k plans as TakeOrderedAndProject (no global sort)") {
    val df = SparkEntry.queries("top_orders")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("inverted index: exactly one shuffle before the final sort") {
    val df = graft.operators.InvertedIndex(
      graft.sources.Tables.documents(spark, sf("sf0.001")))
    df.write.format("noop").mode("overwrite").save()
    val shuffles = collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }
    assert(shuffles.size === 1,
      s"flagship must shuffle once (collect_set partial agg), got " +
        s"${shuffles.size}:\n${df.queryExecution.executedPlan}")
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    assert(planOf("semi_join_customers").toString.contains("LeftSemi"))
    assert(planOf("anti_join_customers").toString.contains("LeftAnti"))
  }

  test("conditional_agg: the nation dim joins via broadcast") {
    val bcasts = collect(planOf("conditional_agg")) {
      case b: BroadcastExchangeLike => b
    }
    assert(bcasts.nonEmpty, "nation should broadcast, not shuffle")
  }

  test("order_ship_latency: lineitem scan is pruned to the two needed columns") {
    val scan = planOf("order_ship_latency").collectLeaves()
      .map(_.toString).find(_.contains("lineitem")).get
    assert(scan.contains("l_orderkey") && scan.contains("l_shipdate"), scan)
    assert(!scan.contains("l_quantity") && !scan.contains("l_extendedprice"),
      s"scan reads pruned columns:\n$scan")
  }

  test("rolling_7d_qty: supplier predicate is pushed into the parquet scan") {
    val scans = planOf("rolling_7d_qty").collectLeaves().map(_.toString)
    assert(scans.exists(s =>
      s.contains("PushedFilters") && s.contains("l_suppkey")),
      s"no pushed filter on l_suppkey:\n${scans.mkString("\n")}")
  }

  test("upsert_snapshot: the merge keeps its anti-join (no rewrite to NLJ)") {
    val plan = planOf("upsert_snapshot").toString
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("levenshtein_pairs: brand blocking yields an equi-join, never a cross join") {
    val plan = planOf("levenshtein_pairs").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocked similarity join degenerated to a cross join:\n$plan")
  }

  test("q6: all three predicates are pushed into the parquet scan") {
    val scans = planOf("q6_revenue_delta").collectLeaves().map(_.toString)
    assert(scans.exists(s => s.contains("PushedFilters") &&
      s.contains("l_shipdate") && s.contains("l_discount") &&
      s.contains("l_quantity")),
      s"q6 predicates not pushed:\n${scans.mkString("\n")}")
  }

  test("q4: EXISTS plans as a left-semi join, never a pair fanout") {
    val plan = planOf("q4_priority_exists").toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q16: supplier blacklist is a broadcast anti-join; part dim broadcasts") {
    val plan = planOf("q16_supplier_variety")
    assert(plan.toString.contains("LeftAnti"), plan.toString)
    val bcasts = collect(plan) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size >= 2,
      s"part + blacklist should both broadcast:\n$plan")
  }

  test("q19: disjunctive predicate keeps the partkey equi-join (no cross join)") {
    val plan = planOf("q19_disjunctive").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q19 degenerated to a cross join:\n$plan")
  }

  test("q13: the priority filter stays in the outer join's ON clause") {
    // a WHERE would make the join inner and lose zero-order customers;
    // the physical plan must keep LeftOuter with the pushed condition
    val plan = planOf("q13_cust_distribution").toString
    assert(plan.contains("LeftOuter"), plan)
  }

  test("q18: the quantity HAVING runs before the joins (fact side filtered first)") {
    // the join's probe side must be the filtered aggregate, so the
    // aggregate appears below the first join in the plan tree
    val plan = planOf("q18_large_orders")
    val joins = plan.toString.linesIterator.zipWithIndex
      .filter(_._1.contains("Join")).map(_._2).toSeq
    val aggFilter = plan.toString.linesIterator.zipWithIndex
      .filter { case (l, _) => l.contains("Filter") && l.contains("sum_qty") }
      .map(_._2).toSeq
    assert(joins.nonEmpty && aggFilter.nonEmpty &&
      aggFilter.head > joins.last,
      s"HAVING should sit below the joins:\n$plan")
  }

  test("q8: all five dimension joins broadcast (no fact-side shuffle joins)") {
    // collect() (AdaptiveSparkPlanHelper) traverses INTO the finalized
    // adaptive plan — a tree-string substring match would see the
    // pre-AQE initial plan and flag joins AQE already demoted
    val plan = planOf("q8_market_share")
    val bcasts = collect(plan) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size >= 4,
      s"part/customer-nation/supplier-nation (+supplier) should broadcast:\n$plan")
    val smjs = collect(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smjs.isEmpty, s"q8 fell back to a sort-merge join:\n$plan")
  }

  test("month_spine: the spine comes from a 1-row aggregate, not a fact re-scan") {
    // at most two scans of orders: the bounds aggregate and the
    // monthly rollup (exchange reuse may collapse them to one) — the
    // generated series itself reads nothing. collectLeaves must be the
    // AdaptiveSparkPlanHelper one: AdaptiveSparkPlanExec is itself a
    // leaf to TreeNode.collectLeaves, which would always count 1
    val scans = collectLeaves(planOf("month_spine"))
      .map(_.toString).count(_.contains("orders"))
    assert(scans >= 1 && scans <= 2,
      s"spine must not re-scan the fact table, got $scans orders scans")
  }

  test("decontaminate: the benchmark side broadcasts (train corpus never shuffles to it)") {
    val plan = planOf("decontaminate")
    val bcasts = collect(plan) { case b: BroadcastExchangeLike => b }
    assert(bcasts.nonEmpty,
      s"eval-set n-grams should broadcast to the training scan:\n$plan")
  }

  test("weighted_sample: top-k by A-ES key plans TakeOrdered with zero shuffles") {
    val plan = planOf("weighted_sample")
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
    val shuffles = collect(plan) { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"per-row keys + TakeOrdered must not shuffle:\n$plan")
  }

  test("bpe_pairs: the pair ranking plans TakeOrderedAndProject") {
    assert(planOf("bpe_pairs").toString.contains("TakeOrderedAndProject"))
  }

  test("dup_span_coverage: every documents scan is pruned (no lang/source)") {
    // the gram pipeline sits behind the lazy checkpoint of the
    // combined (doc_id, gh, tf) table, so it surfaces as an RDD leaf,
    // not a parquet scan; the only parquet documents scan left is the
    // zero-fill left-join base, which must read doc_id alone
    val leaves = collectLeaves(planOf("dup_span_coverage")).map(_.toString)
    val scans = leaves.filter(_.contains("documents"))
    assert(scans.nonEmpty)
    assert(leaves.exists(_.contains("ExistingRDD")),
      "combined gram table should be checkpointed (one corpus pass)")
    scans.foreach(s =>
      assert(!s.contains("text") && !s.contains("lang") &&
        !s.contains("source"),
        s"scan reads pruned columns:\n$s"))
  }

  test("dedup_span_removal: documents scans read (doc_id, text) at most") {
    // two scans: the word pipeline reads (doc_id, text); the zero-fill
    // left-join base reads doc_id alone — neither may read the rest
    val scans = collectLeaves(planOf("dedup_span_removal"))
      .map(_.toString).filter(_.contains("documents"))
    assert(scans.nonEmpty)
    assert(scans.exists(s => s.contains("doc_id") && s.contains("text")))
    scans.foreach(s =>
      assert(!s.contains("lang") && !s.contains("source"),
        s"scan reads pruned columns:\n$s"))
  }

  test("rank_corr: lineitem scan is pruned to the two correlated columns") {
    val scan = collectLeaves(planOf("rank_corr"))
      .map(_.toString).find(_.contains("lineitem")).get
    assert(scan.contains("l_quantity") && scan.contains("l_extendedprice"),
      scan)
    assert(!scan.contains("l_orderkey") && !scan.contains("l_shipdate"),
      s"scan reads pruned columns:\n$scan")
  }

  test("q21 cluster regime: one fact shuffle feeds aggregate AND window") {
    // the q21 docstring's scale claim, asserted: when the orders side
    // stops broadcasting (emulated by disabling auto-broadcast — the
    // 100 TB regime), the orderkey join's shuffle must be the ONLY
    // exchange under the window — the (orderkey, suppkey) aggregate
    // rides the join partitioning (orderkey is a prefix of its keys)
    // and the window needs just a local sort. natSupp stays broadcast
    // by explicit hint, and only the final tiny s_name rollup may add
    // exchanges above the window.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.TpcH.q21WaitingSuppliers(spark, sf("sf0.001"))
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan
      val windows = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "q21 lost its window formulation")
      val joins = collect(windows.head) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.size === 1,
        s"expected the orderkey SMJ under the window:\n${windows.head}")
      // the join's own two input shuffles (fact + orders) are the only
      // exchanges under the window: the aggregate and the window both
      // ride the join's orderkey partitioning
      val belowWindow = collect(windows.head) {
        case e: ShuffleExchangeLike => e
      }
      val belowJoin = collect(joins.head) {
        case e: ShuffleExchangeLike => e
      }
      assert(belowWindow.size === belowJoin.size,
        s"found an exchange BETWEEN the orderkey join and the window " +
          s"(aggregate or window re-shuffled):\n${windows.head}")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("rank machinery buckets via the codegen binary search, not the interpreted HOF") {
    // a regression back to size(filter(splits, ...)) would be silent
    // (identical results) but reintroduce O(nB)-interpreted bucket
    // assignment — at 10k cluster shuffle partitions that is 10k
    // lambda evals per distinct value
    Seq("rank_corr", "zorder_key").foreach { q =>
      val plan = planOf(q).toString
      assert(plan.contains("array_count_less"),
        s"$q plan lost the ArrayCountLess bucket expression")
      assert(!plan.contains("filter(splits"),
        s"$q plan fell back to the interpreted HOF bucketing")
    }
  }

  test("cms_heavy_hitters: the sketch aggregate partial-combines map-side") {
    // the UDAF must show up as a partial/final ObjectHashAggregate pair —
    // one grid per task merged by elementwise sum, not rows to one reducer
    val aggs = collect(planOf("cms_heavy_hitters")) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.size >= 2,
      "expected partial+final ObjectHashAggregate for the CMS UDAF")
  }

  test("media_decode: decode is a narrow map — no shuffle before the final sort") {
    // decode + featurize must be mapPartitions over the scan; the only
    // exchange is the presentation-order range partitioning
    val plan = planOf("media_decode")
    val shuffles = collect(plan) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 1,
      s"decode path must not shuffle (got ${shuffles.size}):\n$plan")
    val scans = collectLeaves(plan).map(_.toString)
      .filter(_.contains("documents"))
    scans.foreach(s =>
      assert(!s.contains("lang") && !s.contains("source"),
        s"scan reads pruned columns:\n$s"))
  }

  test("unigram_tokenize: no pair fanout; documents scans pruned") {
    val plan = planOf("unigram_tokenize")
    val str = plan.toString
    assert(!str.contains("CartesianProduct") &&
      !str.contains("BroadcastNestedLoopJoin"),
      s"tokenize must stay equi-joined:\n$str")
    val scans = collectLeaves(plan).map(_.toString)
      .filter(_.contains("documents"))
    assert(scans.nonEmpty)
    scans.foreach(s =>
      assert(!s.contains("lang") && !s.contains("source"),
        s"scan reads pruned columns:\n$s"))
  }

  test("tokenizer_compare: both accountings compose without pair fanout") {
    val str = planOf("tokenizer_compare").toString
    assert(!str.contains("CartesianProduct") &&
      !str.contains("BroadcastNestedLoopJoin"),
      s"compare must stay equi-joined:\n$str")
  }

  test("dpp_star_revenue: fact scan carries a dynamicpruning PartitionFilter") {
    val df = SparkEntry.queries("dpp_star_revenue")(spark, sf("sf0.001"))
    df.write.format("noop").mode("overwrite").save()
    val scans = collectLeaves(df.queryExecution.executedPlan).map(_.toString)
    val fact = scans.filter(_.contains("fact_orders_by_nation"))
    assert(fact.nonEmpty, s"no fact scan found:\n${scans.mkString("\n")}")
    assert(fact.exists(s => s.contains("PartitionFilters") &&
      s.contains("dynamicpruning")),
      s"fact scan is not dynamically pruned:\n${fact.mkString("\n")}")
  }

  test("dpp_star_revenue: runtime pruning actually skips non-region partitions") {
    // 5 of 25 nations are in region 1 — the executed scan must read
    // only those partition directories (the IO claim, not just the
    // plan-string claim)
    val df = SparkEntry.queries("dpp_star_revenue")(spark, sf("sf0.001"))
    // execute the dataset's OWN cached QueryExecution (a write would
    // re-plan into a fresh tree whose metrics never populate)
    df.collect()
    val scan = collectLeaves(df.queryExecution.executedPlan).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("fact_orders_by_nation")) => f
    }.get
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.exists(n => n > 0 && n <= 5),
      s"expected <=5 of 25 partitions read, got $partsRead")
  }

  test("bloom_join_revenue: might_contain filters lineitem before the shuffle join") {
    val df = graft.operators.StarSchema.bloomJoinPlan(spark, sf("sf0.001"))
    val str = df.queryExecution.executedPlan.toString
    assert(str.toLowerCase.contains("might_contain"),
      s"no runtime bloom filter in plan:\n$str")
    assert(str.contains("SortMergeJoin") || str.contains("ShuffledHashJoin"),
      s"bloom demo join must be a shuffle join:\n$str")
    // and the registry entry EXECUTES that plan: its checkpoint runs
    // inside the conf scope, so the handed-on result is the
    // bloom-planned join's output (row-equal to the plain join)
    val viaEntry = SparkEntry.queries("bloom_join_revenue")(
      spark, sf("sf0.001")).collect().toSeq
    val plain = df.collect().toSeq
    assert(viaEntry === plain)
  }

  test("bloom_join_revenue: scoped confs are restored after plan build") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    SparkEntry.queries("bloom_join_revenue")(spark, sf("sf0.001"))
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") === before)
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      !== "0")
  }

  test("join strategy hints are honored (shuffle_hash / merge / broadcast)") {
    import org.apache.spark.sql.functions.col
    val o = graft.sources.Tables.orders(spark, sf("sf0.001"))
    val c = graft.sources.Tables.customer(spark, sf("sf0.001"))
    def planWith(hint: String) = {
      val df = o.join(c.hint(hint), col("o_custkey") === col("c_custkey"))
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    assert(planWith("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planWith("merge").contains("SortMergeJoin"))
    assert(planWith("broadcast").contains("BroadcastHashJoin"))
  }
}
