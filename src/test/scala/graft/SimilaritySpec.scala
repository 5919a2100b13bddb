package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("custom VecDot expression is bit-equal to the HOF fold on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val cmp = emb.as("a").crossJoin(emb.as("b").limit(3))
      .select(
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(cmp.count() === 0)
  }

  test("dot/cosine basics") {
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(3.0f, 4.0f, 0.5f)))
      .toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.cosine(col("a"), col("a")).as("self"))
      .as[(Double, Double)].head()
    assert(r._1 === 4.0)
    assert(math.abs(r._2 - 1.0) < 1e-12)
  }

  test("brute-force top-k: ranks are 1..k, cos within [-1,1], deterministic") {
    val a = Similarity.cosineTopK(spark, sf("sf0.001")).collect()
    val b = Similarity.cosineTopK(spark, sf("sf0.001")).collect()
    assert(a.sameElements(b))
    val byQuery = a.groupBy(_.getLong(0))
    assert(byQuery.size === 10)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to rows.length))
      assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    }
  }

  test("ANN recall vs brute force is nontrivial and ANN is a subset-ranking") {
    val exact = Similarity.cosineTopK(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(spark, sf("sf0.001"))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty)
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(f"multi-probe (6 planes, <=2 flips) ANN recall@5 = $recall%.2f")
    assert(recall > 0.1, s"ANN recall suspiciously low: $recall")
  }

  test("probeBuckets covers the full Hamming ball at any maxFlips") {
    // evaluate each probe expression against a concrete bucket value
    // and check the set of keys == all values within hamming distance
    def ball(bucket: Long, nPlanes: Int, maxFlips: Int): Set[Long] =
      (0L until (1L << nPlanes))
        .filter(v => java.lang.Long.bitCount(v ^ bucket) <= maxFlips).toSet
    for (flips <- 0 to 4) {
      val probes = Similarity.probeBuckets(lit(5L), nPlanes = 6, maxFlips = flips)
      val got = spark.range(1)
        .select(array(probes: _*).as("p"))
        .as[Seq[Long]].head().toSet
      assert(got === ball(5L, 6, flips),
        s"maxFlips=$flips probe set is not the hamming ball")
    }
    // widening maxFlips must strictly widen the probe set (3 > 2 — the
    // old implementation silently capped at 2)
    assert(Similarity.probeBuckets(lit(5L), 6, 3).size >
      Similarity.probeBuckets(lit(5L), 6, 2).size)
  }

  test("LSH near-dup output is a subset of exact with measured recall") {
    val exact = Similarity.cosineNearDupExact(spark, sf("sf0.001"))
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupLsh(spark, sf("sf0.001"))
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = if (exact.isEmpty) 1.0
      else (exact intersect lsh).size.toDouble / exact.size
    info(f"LSH near-dup recall = $recall%.2f")
    assert(recall > 0.3, s"recall too low: $recall")
  }

  test("near-dup pairs are symmetric-free (id1 < id2) and thresholded") {
    val pairs = Similarity.cosineNearDupExact(spark, sf("sf0.001")).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4 - 1e-6)
    }
  }
}
