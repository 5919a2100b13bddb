package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity}

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  test("centroid build is deterministic under repartitioning") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val a = Ivf.buildCentroids(emb.repartition(2), k = 8, iters = 2)
      .orderBy("cid").collect()
    val b = Ivf.buildCentroids(emb.repartition(7), k = 8, iters = 2)
      .orderBy("cid").collect()
    assert(a.sameElements(b))
  }

  test("IVF top-k recall vs brute force") {
    val exact = Similarity.cosineTopK(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.ivfTopK(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@5 (4/16 cells probed) = $recall%.2f")
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("IVF prebuilt index: parquet round-trip matches the built-index run") {
    // the 100 TB posture: build once, persist, every query job reloads.
    // The reloaded index must produce bit-identical search results.
    val dir = sf("sf0.001")
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString + "/centroids.parquet"
    Ivf.cachedCentroids(spark, dir, 16, 2)
      .write.mode("overwrite").parquet(idxPath)
    val reloaded = spark.read.parquet(idxPath)
    val fromPrebuilt = Ivf.ivfTopK(spark, dir, prebuilt = Some(reloaded))
      .collect()
    val fromBuild = Ivf.ivfTopK(spark, dir).collect()
    assert(fromPrebuilt.sameElements(fromBuild))
  }

  test("centroid cache returns the same table as a fresh build") {
    val dir = sf("sf0.001")
    val fresh = Ivf.buildCentroids(
      spark.read.parquet(dir + "/embeddings.parquet"), 16, 2)
      .orderBy("cid").collect()
    val cached = Ivf.cachedCentroids(spark, dir, 16, 2)
      .orderBy("cid").collect()
    assert(cached.length === fresh.length)
    cached.zip(fresh).foreach { case (c, f) =>
      assert(c.getInt(0) === f.getInt(0))
      assert(c.getSeq[Float](1) === f.getSeq[Float](1))
    }
  }

  test("HLL sketch rollup: merging partial sketches == sketching raw rows") {
    // the mergeability contract pre-aggregation relies on: union of
    // fine-grained sketches must equal a direct coarse sketch
    val merged = graft.operators.Relational.hllRollup(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toMap
    val direct = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct,
      "sketch union is not lossless vs direct sketching")
    // and the estimate itself is close to exact
    val exact = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    merged.foreach { case (flag, est) =>
      assert(math.abs(est - exact(flag)).toDouble / exact(flag) < 0.05,
        s"$flag: $est vs exact ${exact(flag)}")
    }
  }

  test("rolling 7d users: HLL day-sketch union lands within 5% of exact") {
    val approx = graft.operators.EventOps.rollingUsers7d(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
      .select(
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        col("user_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val days = ev.map(_._1).distinct
    assert(approx.keySet === days.toSet)
    days.foreach { d =>
      val exact = ev.filter { case (dd, _) => dd >= d - 6 && dd <= d }
        .map(_._2).distinct.length.toLong
      val (est, nDays) = approx(d)
      assert(nDays === days.count(dd => dd >= d - 6 && dd <= d))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"day $d: est $est vs exact $exact")
    }
  }

  test("approximate aggregates land within 5% of exact") {
    val approx = graft.operators.Relational.approxStats(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a.getLong(1) - e.getLong(1)).toDouble / e.getLong(1) < 0.05)
      assert(math.abs(a.getLong(2) - e.getLong(2)).toDouble / e.getLong(2) < 0.05)
    }
    // the histogram-sketch median carries its documented error bound:
    // the true median lies inside the reported unit bin, so the
    // midpoint estimate is within 1.0 of the exact interpolated median
    val exactMed = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(org.apache.spark.sql.functions.expr(
        "percentile(l_quantity, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exactMed.foreach { case (flag, m) =>
      assert(math.abs(approx(flag).getDouble(3) - m) <= 1.0,
        s"$flag: histogram median ${approx(flag).getDouble(3)} vs exact $m")
    }
  }
}
