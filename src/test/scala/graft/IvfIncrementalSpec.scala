package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity}

/** Incremental IVF centroid maintenance ([[Ivf.incrementalCentroids]])
  * — the embedding-side analog of SuffixRanksIncrementalSpec. k-means
  * is not algebraically incremental (a rebuild re-seeds), so the
  * contract is NOT incremental==rebuild bit-parity; it is:
  *   1. the update RULE is exact (closed-form check on fixtures),
  *   2. maintenance is deterministic under partitioning,
  *   3. the maintained index SERVES as well as a rebuild (recall over
  *      the merged corpus within a small margin of the rebuilt index's
  *      recall, both against the brute-force truth),
  *   4. the drift gate falls back to a true rebuild bit-for-bit,
  *   5. install-under-stamp makes a mutated corpus serve the
  *      maintained table instead of rebuilding (the staleness-contract
  *      wiring an ingest pipeline uses).
  */
class IvfIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def bd(d: Double) = new java.math.BigDecimal(d)

  test("mergeCentroids: closed-form occupancy-weighted mean") {
    val old = Seq(0 -> Seq(1.0f, 0.0f), 1 -> Seq(0.0f, 2.0f))
    val counts = Map(0 -> 3L, 1 -> 1L)
    // cell 0 gets delta mass m=1 with sum (0, 4): c' = ((3*1+0)/4, (3*0+4)/4)
    val stats = Map(0 -> (1L, Seq(bd(0.0), bd(4.0))))
    val merged = Ivf.mergeCentroids(old, counts, stats).toMap
    assert(merged(0) === Seq(0.75f, 1.0f))
    // untouched cell keeps its centroid bit-for-bit
    assert(merged(1) === Seq(0.0f, 2.0f))
    // empty old cell: c' = delta mean
    val stats1 = Map(1 -> (2L, Seq(bd(6.0), bd(0.0))))
    val merged1 = Ivf.mergeCentroids(old, Map(1 -> 0L), stats1).toMap
    assert(merged1(1) === Seq(3.0f, 0.0f))
  }

  test("maintenance is deterministic under delta repartitioning") {
    val dir = sf("sf0.001")
    val delta = Ivf.syntheticDelta(spark, dir)
    val a = Ivf.incrementalCentroids(spark, dir, delta.repartition(2), 16, 2)
      .orderBy("cid").collect()
    val b = Ivf.incrementalCentroids(spark, dir, delta.repartition(7), 16, 2)
      .orderBy("cid").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  /** Recall floor at BOTH committed SFs: a future fold bug that
    * degrades the merged GEOMETRY while staying oracle-consistent with
    * its own exported index (the oracle replays probe/score/rank FROM
    * the maintained centroids, so it cannot see geometric decay)
    * cannot land silently. */
  private def recallCase(sfName: String): Unit = {
    val dir = sf(sfName)
    val delta = Ivf.syntheticDelta(spark, dir)
    val merged = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").unionByName(delta)
    def recallOf(centroids: org.apache.spark.sql.DataFrame): Double = {
      val got = Ivf.ivfTopKOver(merged, centroids)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val truth = Similarity.topKPerQuery(
        merged.as("corpus")
          .join(broadcast(merged.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"),
              col("embedding").as("qv"))),
            col("vec_id") =!= col("query_id"))
          .withColumn("cos", Similarity.cosine(col("qv"), col("embedding"))),
        5).select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val maintained = Ivf.incrementalCentroids(spark, dir, delta, 16, 2)
    val rebuilt = Ivf.buildCentroids(merged, 16, 2)
    val rMaint = recallOf(maintained)
    val rRebuild = recallOf(rebuilt)
    info(f"[$sfName] recall@5 over merged corpus: " +
      f"maintained $rMaint%.2f, rebuilt $rRebuild%.2f")
    assert(rMaint >= 0.3, s"maintained recall too low: $rMaint")
    assert(rMaint >= rRebuild - 0.15,
      s"maintained index serves materially worse than a rebuild " +
        f"($rMaint%.2f vs $rRebuild%.2f)")
  }

  test("maintained index serves at rebuild-grade recall (sf0.001)") {
    recallCase("sf0.001")
  }

  test("maintained index serves at rebuild-grade recall (sf0.01)") {
    recallCase("sf0.01")
  }

  test("drift gate: an outweighing delta falls back to a true rebuild") {
    val dir = sf("sf0.001")
    val delta = Ivf.syntheticDelta(spark, dir)
    val merged = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").unionByName(delta)
    // maxDeltaFrac = 0 trips the gate for any non-empty delta
    val fallback = Ivf.incrementalCentroids(spark, dir, delta, 16, 2,
      maxDeltaFrac = 0.0).orderBy("cid").collect()
    val rebuild = Ivf.buildCentroids(merged, 16, 2)
      .orderBy("cid").collect()
    assert(fallback.sameElements(rebuild),
      "drift-gated fallback must be the full rebuild, bit-for-bit")
  }

  test("installCentroids: a mutated corpus serves the maintained table") {
    val dir = sf("sf0.001")
    // mutated corpus: original + the synthetic delta, in a fresh dir
    val mutated = java.nio.file.Files
      .createTempDirectory("graft_ivf_incr").toString
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .unionByName(Ivf.syntheticDelta(spark, dir))
      .withColumn("label", lit("x"))
      .write.mode("overwrite").parquet(s"$mutated/embeddings.parquet")
    val maintained = Ivf.incrementalCentroids(
      spark, dir, Ivf.syntheticDelta(spark, dir), 16, 2)
    Ivf.installCentroids(spark, mutated, 16, 2, maintained)
    // served = installed (NOT a fresh rebuild over the mutated corpus,
    // which re-seeds and lands on different floats)
    val served = Ivf.cachedCentroids(spark, mutated, 16, 2)
      .orderBy("cid").collect()
    assert(served.sameElements(maintained.orderBy("cid").collect()),
      "stamped install must be served without a rebuild")
    // the staleness contract still holds: invalidating forces a fresh
    // build, which differs from the maintained table (k-means re-seed)
    Ivf.invalidateCentroids(mutated, 16, 2)
    val fresh = Ivf.cachedCentroids(spark, mutated, 16, 2)
      .orderBy("cid").collect()
    assert(!fresh.sameElements(served),
      "sanity: a fresh rebuild should differ from the maintained table")
  }
}
