package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

class PqSpec extends SparkTestBase {
  import spark.implicits._

  test("PQ+ADC+rerank recall vs brute force, and emitted scores are exact") {
    val exact = Similarity.cosineTopK(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Pq.pqTopK(spark, sf("sf0.001")).collect()
    val pqPairs = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pqPairs).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.2f (M=8, ks=16, rerank=50)")
    assert(recall > 0.5, s"PQ recall too low: $recall")
    // re-rank contract: every emitted cos_sim is the EXACT cosine
    val exactScores = Similarity.cosineTopK(spark, sf("sf0.001"), k = 50)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactScores.get(key).foreach { c =>
        assert(math.abs(r.getDouble(3) - c) < 1e-12,
          s"$key score ${r.getDouble(3)} != exact $c")
      }
    }
  }

  test("PQ search is deterministic run-to-run") {
    val a = Pq.pqTopK(spark, sf("sf0.001")).collect()
    val b = Pq.pqTopK(spark, sf("sf0.001")).collect()
    assert(a.sameElements(b), "PQ search is not reproducible")
  }

  test("encoding emits exactly M codes per vector, one per subspace") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val subs = Pq.subvectors(emb, 8, 64)
    val codes = Pq.assign(subs,
      Pq.buildCodebook(subs, ks = 16, iters = 1))
    val nVecs = emb.count()
    assert(codes.count() === nVecs * 8)
    assert(codes.select("vec_id", "sub").distinct().count() === nVecs * 8,
      "duplicate (vec_id, sub) code rows")
    val codeRange = codes.agg(min(col("code")), max(col("code")))
      .collect().head
    assert(codeRange.getInt(0) >= 0 && codeRange.getInt(1) < 16,
      s"codes outside [0, ks): $codeRange")
  }

  test("persisted codebook: write to parquet, reload, search is identical") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    Pq.buildCodebook(Pq.subvectors(emb, 8, 64), ks = 16, iters = 1)
      .write.mode("overwrite").parquet(s"$dir/codebook.parquet")
    val reloaded = spark.read.parquet(s"$dir/codebook.parquet")
    val fresh = Pq.pqTopK(spark, sf("sf0.001")).collect()
    val fromDisk = Pq.pqTopK(spark, sf("sf0.001"), prebuilt = Some(reloaded))
      .collect()
    assert(fresh.sameElements(fromDisk),
      "search from the persisted index diverged from the fresh build")
  }
}
