package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.operators.Dedup

/** Property tests for the connected-components operator: the oracle
  * query only exercises the real doc graph's near-clique shapes, so
  * seeded random graphs (plus a worst-case chain, whose diameter
  * stresses the convergence loop) are checked against a reference
  * union-find.
  */
class GraphClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 15)
    edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
  } yield edges.filter { case (a, b) => a != b }

  private val graphs: Seq[List[(Long, Long)]] =
    (1 to 12).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
      .filter(_.nonEmpty)

  test("connected components match union-find on seeded random graphs") {
    assert(graphs.size >= 8, "generator produced too few graphs")
    graphs.foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(edges)
      assert(got === want, s"edges: $edges")
    }
  }

  test("a worst-case chain converges to one component (diameter > clique)") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 12L).toSet)
  }

  test("pointer jumping: a 120-node chain converges within 10 rounds") {
    // plain one-hop propagation would need ~120 rounds; the pointer-
    // jump step makes rounds O(log diameter). maxIters=10 would throw
    // (non-convergence is a hard error now) if jumping regressed.
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("a", "b"), maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 120L).toSet)
  }

  test("non-convergence throws instead of returning wrong labels") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain.toDF("a", "b"), maxIters = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("large-star/small-star matches union-find on seeded random graphs") {
    graphs.foreach { edges =>
      val got = Dedup.connectedComponentsStar(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(edges)
      assert(got === want, s"edges: $edges")
    }
  }

  test("large-star/small-star == label propagation on every seeded graph") {
    // the two formulations must be interchangeable: same (node, rep)
    // map, not merely the same partition of nodes
    graphs.foreach { edges =>
      val star = Dedup.connectedComponentsStar(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val prop = Dedup.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(star === prop, s"edges: $edges")
    }
  }

  test("large-star/small-star: adversarial 120-node chain converges in few rounds") {
    // chains are the case the formulation exists for: edge-table
    // contraction makes rounds O(log^2 n); maxIters=10 would throw if
    // the contraction regressed to one-hop behavior
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = Dedup.connectedComponentsStar(chain.toDF("a", "b"), maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 120L).toSet)
  }

  test("large-star/small-star: descending-id chain (worst-case orientation)") {
    // ids ordered AGAINST the chain direction — the min lives at the
    // far end from every high-id node, the orientation that defeats
    // naive min-propagation shortcuts
    val chain = (0L until 60L).map(i => (60L - i, 60L - i - 1))
    val got = Dedup.connectedComponentsStar(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 60L).toSet)
  }

  test("large-star/small-star: non-convergence throws") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponentsStar(chain.toDF("a", "b"), maxIters = 1)
        .collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("winnowing guarantee: docs sharing a 6-word run share a fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val shared = "alpha beta gamma delta epsilon zeta"
    Seq(
      (1L, s"one two three $shared four five", "en", "src0", 0L),
      (2L, s"completely different words here $shared and more tail", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sets = graft.operators.TextAnalysis
      .winnowedFingerprints(spark.read.parquet(s"$dir/documents.parquet"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sets.keySet === Set(1L, 2L))
    // the winnowing guarantee: a shared run of >= w + gram - 1 = 6
    // words forces at least one common selected fingerprint
    assert((sets(1L) intersect sets(2L)).nonEmpty,
      s"no shared fingerprint despite a 6-word shared run:\n$sets")
  }
}
