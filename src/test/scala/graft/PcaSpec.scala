package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** pcaTopComponent: the distributed power iteration must (a) find a
  * genuinely dominant direction on anisotropic data, (b) equal a
  * pure-Scala replay of the same fixed-iteration algorithm (the local
  * mirror of what the DuckDB oracle does in SQL), and (c) honor the
  * degenerate-input contracts (empty corpus, all-zero vectors).
  */
class PcaSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val tempDirs = scala.collection.mutable.ArrayBuffer[String]()

  override def afterAll(): Unit = {
    tempDirs.foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    super.afterAll()
  }

  private def corpus(vecs: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString
    tempDirs += dir
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The same fixed-iteration algorithm in plain Scala, mirroring the
    * operator's numeric contract step by step (6dp-quantized decimal
    * mean sums, 12dp-quantized per-row product sums, left-to-right
    * folds). Agreement is over the algorithm, not a tolerance band.
    */
  private def localPca(xs: Seq[Array[Float]], iters: Int)
      : (Array[Double], Array[Double]) = {
    val dim = xs.head.length
    val n = xs.size
    // valueOf = shortest decimal repr, matching Spark's double->decimal
    // cast semantics (new BigDecimal(d) would use the exact binary
    // expansion, which differs at representation-boundary ties)
    def dec(v: Double, scale: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(v)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
    val mu = Array.tabulate(dim) { j =>
      xs.map(x => dec(x(j).toDouble, 6))
        .reduce(_.add(_)).doubleValue / n
    }
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    (1 to iters).foreach { _ =>
      var mdv = 0.0
      (0 until dim).foreach(j => mdv += mu(j) * v(j))
      val ds = xs.map { x =>
        var d = 0.0
        (0 until dim).foreach(j => d += x(j).toDouble * v(j))
        d - mdv
      }
      val b = ds.map(dec(_, 12)).reduce(_.add(_)).doubleValue
      val s = Array.tabulate(dim) { j =>
        xs.zip(ds).map { case (x, d) => dec(d * x(j).toDouble, 12) }
          .reduce(_.add(_)).doubleValue - mu(j) * b
      }
      var ss = 0.0
      (0 until dim).foreach(j => ss += s(j) * s(j))
      val norm = math.sqrt(ss)
      v = if (norm == 0) s else s.map(_ / norm)
    }
    (mu, v)
  }

  test("dominant direction is recovered on anisotropic data") {
    // variance 100x larger along dim 2 (0-based) than anywhere else;
    // deterministic pseudo-noise so the test has no RNG flake
    val vecs = (0 until 200).map { i =>
      val base = Array.tabulate(8)(j => ((i * 31 + j * 17) % 7 - 3) * 0.01f)
      base(2) = (if (i % 2 == 0) 1f else -1f) * (1f + (i % 5) * 0.1f)
      (i.toLong, base.toSeq, 0)
    }
    val out = Vectors.pcaTopComponent(spark, corpus(vecs)).collect()
    assert(out.length === 8)
    val loading = out.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(math.abs(loading(2)) > 0.99,
      s"dominant dim loading ${loading(2)} should be ~±1")
    assert(math.abs(1.0 - loading.map(x => x * x).sum) < 1e-4)
  }

  test("operator equals the pure-Scala replay of the same algorithm") {
    val vecs = (0 until 60).map { i =>
      (i.toLong,
        Array.tabulate(6)(j =>
          math.sin(i * 0.7 + j * 1.3).toFloat +
            (if (j == 4) math.cos(i * 0.3).toFloat * 3f else 0f)).toSeq,
        0)
    }
    val (mu, v) = localPca(vecs.map(_._2.map(x => x: Float).toArray), iters = 3)
    val out = Vectors.pcaTopComponent(spark, corpus(vecs))
      .collect().sortBy(_.getLong(0))
    out.zipWithIndex.foreach { case (r, j) =>
      assert(math.abs(r.getDouble(1) - mu(j)) < 5e-7,
        s"mu mismatch at dim ${j + 1}: ${r.getDouble(1)} vs ${mu(j)}")
      assert(math.abs(r.getDouble(2) - v(j)) < 5e-7,
        s"loading mismatch at dim ${j + 1}: ${r.getDouble(2)} vs ${v(j)}")
    }
  }

  test("degenerate corpora: empty -> zero rows; all-zero vectors -> zero loadings") {
    assert(Vectors.pcaTopComponent(spark, corpus(Seq.empty)).count() === 0)
    val zeros = (0 until 5).map(i => (i.toLong, Seq.fill(4)(0f), 0))
    val out = Vectors.pcaTopComponent(spark, corpus(zeros)).collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0))
  }

  test("abttDebias: Pythagoras — proj^2 + resid^2 == ||x - mu||^2 per vector") {
    val vecs = (0 until 80).map { i =>
      (i.toLong,
        Array.tabulate(6)(j =>
          math.sin(i * 0.9 + j).toFloat +
            (if (j == 1) math.cos(i * 0.4).toFloat * 2f else 0f)).toSeq,
        0)
    }
    val dir = corpus(vecs)
    val out = Vectors.abttDebias(spark, dir).collect()
    assert(out.length === 80)
    // recompute ||x - mu||^2 from the fit and check the decomposition
    val Some((mu, _)) = Vectors.cachedPcaFit(spark, dir, 3)
    val byId = vecs.map { case (id, x, _) => id -> x }.toMap
    out.foreach { r =>
      val x = byId(r.getLong(0))
      val cn2 = x.toSeq.zip(mu.toSeq)
        .map { case (xi, mi) => (xi - mi) * (xi - mi) }.sum
      val lhs = r.getDouble(1) * r.getDouble(1) +
        r.getDouble(2) * r.getDouble(2)
      assert(math.abs(lhs - cn2) < 1e-4,
        s"vec ${r.getLong(0)}: proj^2+resid^2 $lhs vs ||x-mu||^2 $cn2")
    }
  }

  test("pcaComponents: two dominant directions recovered, orthogonal, eigenvalues ordered") {
    // variance planted on dims 1 and 3 (0-based), with the dim-1
    // amplitude larger; deterministic phases so no RNG flake
    val vecs = (0 until 300).map { i =>
      val base = Array.tabulate(8)(j => ((i * 13 + j * 7) % 5 - 2) * 0.01f)
      base(1) = (math.sin(i * 1.1) * 4).toFloat
      base(3) = (math.cos(i * 2.3) * 2).toFloat
      (i.toLong, base.toSeq, 0)
    }
    val out = Vectors.pcaComponents(spark, corpus(vecs)).collect()
    assert(out.length === 16)
    val c1 = out.filter(_.getLong(0) === 1L).sortBy(_.getLong(1))
    val c2 = out.filter(_.getLong(0) === 2L).sortBy(_.getLong(1))
    val v1 = c1.map(_.getDouble(3))
    val v2 = c2.map(_.getDouble(3))
    assert(math.abs(v1(1)) > 0.99, s"component 1 should be ~e2: ${v1.toSeq}")
    assert(math.abs(v2(3)) > 0.99, s"component 2 should be ~e4: ${v2.toSeq}")
    val dot12 = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-3, s"components should be orthogonal, dot=$dot12")
    val l1 = c1.head.getDouble(2)
    val l2 = c2.head.getDouble(2)
    assert(l1 > l2 && l2 > 0, s"eigenvalues should be ordered: $l1, $l2")
    // consistency: component 1 == the single-component query's loading
    val single = Vectors.pcaTopComponent(spark, corpus(vecs))
      .collect().sortBy(_.getLong(0)).map(_.getDouble(2))
    v1.zip(single).foreach { case (a, b) => assert(a === b) }
  }

  test("abttDebias degenerate corpora: empty -> zero rows; zero vectors -> zero columns") {
    assert(Vectors.abttDebias(spark, corpus(Seq.empty)).count() === 0)
    val zeros = (0 until 4).map(i => (i.toLong, Seq.fill(3)(0f), 0))
    val out = Vectors.abttDebias(spark, corpus(zeros)).collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0))
  }
}
