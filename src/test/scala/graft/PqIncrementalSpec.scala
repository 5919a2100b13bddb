package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Pq, Similarity}

/** Incremental PQ codebook maintenance ([[Pq.incrementalCodebook]]) —
  * the [[IvfIncrementalSpec]] contract per subspace: exact closed-form
  * update rule, bit-determinism under partitioning, rebuild-grade
  * serving quality over the merged corpus, bit-for-bit drift-gate
  * fallback, and stamped-install staleness wiring.
  */
class PqIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def bd(d: Double) = new java.math.BigDecimal(d)

  test("mergeCodebook: closed-form occupancy-weighted mean per (sub, code)") {
    val old = Seq((0, 0, Seq(1.0, 0.0)), (0, 1, Seq(0.0, 2.0)),
      (1, 0, Seq(5.0, 5.0)))
    val counts = Map((0, 0) -> 3L, (0, 1) -> 1L, (1, 0) -> 4L)
    val stats = Map((0, 0) -> (1L, Seq(bd(0.0), bd(4.0))))
    val merged = Pq.mergeCodebook(old, counts, stats)
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(merged((0, 0)) === Seq(0.75, 1.0))
    // untouched codewords are unchanged (bit-for-bit)
    assert(merged((0, 1)) === Seq(0.0, 2.0))
    assert(merged((1, 0)) === Seq(5.0, 5.0))
    // empty old cell: codeword = delta mean
    val stats1 = Map((0, 1) -> (2L, Seq(bd(6.0), bd(0.0))))
    val m1 = Pq.mergeCodebook(old, Map((0, 1) -> 0L), stats1)
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(m1((0, 1)) === Seq(3.0, 0.0))
  }

  test("maintenance is deterministic under delta repartitioning") {
    val dir = sf("sf0.001")
    val delta = Ivf.syntheticDelta(spark, dir)
    val a = Pq.incrementalCodebook(spark, dir, delta.repartition(2), 8, 16, 1)
      .orderBy("sub", "code").collect()
    val b = Pq.incrementalCodebook(spark, dir, delta.repartition(7), 8, 16, 1)
      .orderBy("sub", "code").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  /** Recall floor at BOTH committed SFs — see IvfIncrementalSpec's
    * rationale: the oracle replays from the exported maintained
    * codebook and cannot see geometric decay; this can. */
  private def recallCase(sfName: String): Unit = {
    val dir = sf(sfName)
    val delta = Ivf.syntheticDelta(spark, dir)
    val merged = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").unionByName(delta)
    def recallOf(cb: org.apache.spark.sql.DataFrame): Double = {
      val got = Pq.pqTopKOver(merged, cb)
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
    val maintained = Pq.incrementalCodebook(spark, dir, delta, 8, 16, 1)
    val rebuilt = Pq.buildCodebook(Pq.subvectors(merged, 8, 64), 16, 1)
    val rMaint = recallOf(maintained)
    val rRebuild = recallOf(rebuilt)
    info(f"[$sfName] PQ recall@5 over merged corpus: " +
      f"maintained $rMaint%.2f, rebuilt $rRebuild%.2f")
    assert(rMaint >= 0.3, s"maintained PQ recall too low: $rMaint")
    assert(rMaint >= rRebuild - 0.15,
      f"maintained codebook serves materially worse than a rebuild " +
        f"($rMaint%.2f vs $rRebuild%.2f)")
  }

  test("maintained codebook serves at rebuild-grade recall (sf0.001)") {
    recallCase("sf0.001")
  }

  test("maintained codebook serves at rebuild-grade recall (sf0.01)") {
    recallCase("sf0.01")
  }

  test("drift gate: an outweighing delta falls back to a true rebuild") {
    val dir = sf("sf0.001")
    val delta = Ivf.syntheticDelta(spark, dir)
    val merged = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").unionByName(delta)
    val fallback = Pq.incrementalCodebook(spark, dir, delta, 8, 16, 1,
      maxDeltaFrac = 0.0).orderBy("sub", "code").collect()
    val rebuild = Pq.buildCodebook(Pq.subvectors(merged, 8, 64), 16, 1)
      .orderBy("sub", "code").collect()
    assert(fallback.sameElements(rebuild),
      "drift-gated fallback must be the full rebuild, bit-for-bit")
  }

  test("installCodebook: a mutated corpus serves the maintained table") {
    val dir = sf("sf0.001")
    val mutated = java.nio.file.Files
      .createTempDirectory("graft_pq_incr").toString
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .unionByName(Ivf.syntheticDelta(spark, dir))
      .withColumn("label", lit("x"))
      .write.mode("overwrite").parquet(s"$mutated/embeddings.parquet")
    val maintained = Pq.incrementalCodebook(
      spark, dir, Ivf.syntheticDelta(spark, dir), 8, 16, 1)
    Pq.installCodebook(spark, mutated, 8, 16, 1, maintained)
    val served = Pq.cachedCodebook(spark, mutated, 8, 16, 1)
      .orderBy("sub", "code").collect()
    assert(served.sameElements(maintained.orderBy("sub", "code").collect()),
      "stamped install must be served without a rebuild")
    Pq.invalidateCodebook(mutated, 8, 16, 1)
    val fresh = Pq.cachedCodebook(spark, mutated, 8, 16, 1)
      .orderBy("sub", "code").collect()
    assert(!fresh.sameElements(served),
      "sanity: a fresh rebuild should differ from the maintained table")
  }
}
