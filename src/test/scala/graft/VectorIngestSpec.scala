package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Ivf
import graft.sources.ArtifactMaintenance
import graft.streaming.{BucketStore, EventStreams}

/** End-to-end embedding-store ingest → IVF incremental maintenance
  * (EventStreams.vectorIngest + Ivf.storeMaintainer): a pure-append
  * vector commit must leave MAINTAINED centroids (and exact updated
  * occupancy) installed under the post-commit stamp before any query,
  * bit-equal to the corpus-agnostic incremental core run over the same
  * inputs; non-pure commits (a re-sent vec_id) must keep the store
  * append-only (first write wins), skip maintenance, and fall back to
  * a correct rebuild on access — the staleness contract.
  */
case class VecFixture(vec_id: Long, embedding: Array[Float])

class VectorIngestSpec extends SparkTestBase {

  private type Vec = VecFixture
  private def Vec(id: Long, e: Array[Float]): Vec = VecFixture(id, e)

  /** Deterministic spread-out vectors: unit-ish rays at id-dependent
    * angles in an 8-dim space, so k-means has real geometry to find. */
  private def vec(id: Long): Vec = {
    val v = new Array[Float](8)
    (0 until 8).foreach { i =>
      v(i) = (math.sin(0.7 * id + 1.3 * i) + 0.1 * i).toFloat
    }
    Vec(id, v)
  }

  private def freshStore(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vec_ingest").toString
    s"$dir/store"
  }

  private def ingest(path: String, batches: Seq[Seq[Vec]])(
      between: Int => Unit): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = EventStreams.vectorIngest(input.toDF(), path,
      bucketer = BucketStore.HashBuckets("vec_id", 16))
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*)
        q.processAllAvailable()
        between(i)
      }
    } finally q.stop()
  }

  private def centroidRows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Int, Seq[Float])] =
    df.collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      .sortBy(_._1)

  test("pure-append commit maintains the store centroids: installed " +
      "before any query, bit-equal to the incremental core, exact " +
      "occupancy carried forward") {
    val path = freshStore()
    ArtifactMaintenance.register(path, "ivf")(
      Ivf.storeMaintainer(nCells = 4, iters = 2))
    try {
      val b1 = (0L to 29L).map(vec)
      val b2 = (100L to 109L).map(vec) // 10 <= 0.5 * 30: under the drift gate
      var oldServed: Seq[(Int, Seq[Float])] = Seq.empty
      var oldCounts: Map[Int, Long] = Map.empty
      var preStamp = 0L
      var servedAtCommit: Option[(Long, Seq[(Int, Seq[Float])])] = None
      ingest(path, Seq(b1, b2)) {
        case 0 =>
          // cold build + occupancy pass on first access, then capture
          // the pre-commit state the maintainer must extend
          oldServed = centroidRows(Ivf.storeCentroids(spark, path, 4, 2))
          oldCounts = Ivf.storeCellCounts(spark, path, 4, 2)
          preStamp = graft.sources.CorpusStamp.of(spark, path)
          assert(oldServed.size === 4)
          assert(oldCounts.values.sum === 30L)
        case 1 =>
          servedAtCommit = Ivf.servedStoreCentroids(path, 4, 2)
        case _ => ()
      }
      // the maintainer installed under the POST-commit stamp, at
      // commit time, before any query
      val post = graft.sources.CorpusStamp.of(spark, path)
      assert(post !== preStamp, "commit must flip the corpus stamp")
      assert(servedAtCommit.exists(_._1 === post),
        "maintainer must install under the post-commit stamp")
      // and the install IS the corpus-agnostic incremental core's
      // output over the same inputs, bit-for-bit
      import spark.implicits._
      val oldCorpus = EventStreams.admittedVectors(spark, path)
        .filter(col("vec_id") < 100L)
        .select("vec_id", "embedding")
      val delta = b2.toDF().select(col("vec_id"), col("embedding"))
      val (expect, expectCounts) = Ivf.incrementalOver(spark,
        oldServed, oldCounts, oldCorpus, delta, 4, 2, 0.5)
      assert(servedAtCommit.get._2.sortBy(_._1).map {
        case (c, v) => (c, v.toList) } ===
        centroidRows(expect).map { case (c, v) => (c, v.toList) },
        "maintained centroids diverged from the incremental core")
      // the first post-ingest query serves the install (same stamp,
      // same rows) and the occupancy carried forward exactly
      val served = centroidRows(Ivf.storeCentroids(spark, path, 4, 2))
      assert(served.map { case (c, v) => (c, v.toList) } ===
        servedAtCommit.get._2.sortBy(_._1).map {
          case (c, v) => (c, v.toList) })
      val counts = Ivf.storeCellCounts(spark, path, 4, 2)
      assert(counts === expectCounts.get)
      assert(counts.values.sum === 40L,
        "updated occupancy must cover the merged corpus")
    } finally ArtifactMaintenance.clear(path)
  }

  test("three embedding families on one store: a pure-append commit " +
      "maintains the PQ codebook and the warm-start PCA fit alongside " +
      "the IVF centroids, each bit-equal to its incremental core") {
    import graft.operators.{Pq, Vectors}
    val path = freshStore()
    // ALL THREE embedding families ride the same vector commit
    ArtifactMaintenance.register(path, "ivf")(
      Ivf.storeMaintainer(nCells = 4, iters = 2))
    ArtifactMaintenance.register(path, "pq")(
      Pq.storeMaintainer(m = 2, ks = 4, iters = 1, dim = 8))
    ArtifactMaintenance.register(path, "pca")(
      Vectors.storeMaintainer(iters = 3, k = 1, warmIters = 1))
    try {
      val b1 = (0L to 29L).map(vec)
      val b2 = (100L to 109L).map(vec)
      var oldBook: Seq[(Int, Int, Seq[Double])] = Seq.empty
      var oldCounts: Map[(Int, Int), Long] = Map.empty
      var oldFit: Seq[Array[Double]] = Seq.empty
      var bookAtCommit: Option[(Long, Seq[(Int, Int, Seq[Double])])] = None
      ingest(path, Seq(b1, b2)) {
        case 0 =>
          oldBook = Pq.storeCodebook(spark, path, 2, 4, 1, 8)
            .collect().map(r =>
              (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
            .sortBy(t => (t._1, t._2))
          oldCounts = Pq.storeCodeCounts(spark, path, 2, 4, 1, 8)
          Ivf.storeCentroids(spark, path, 4, 2).count()
          oldFit = Vectors.storePcaFitK(spark, path, 3, 1)
            .get._2.map(_._2)
          assert(oldCounts.collect { case ((0, _), n) => n }.sum === 30L)
        case 1 =>
          bookAtCommit = Pq.servedStoreCodebook(path, 2, 4, 1, 8)
        case _ => ()
      }
      val post = graft.sources.CorpusStamp.of(spark, path)
      assert(bookAtCommit.exists(_._1 === post),
        "PQ maintainer must install under the post-commit stamp")
      assert(Ivf.servedStoreCentroids(path, 4, 2).exists(_._1 === post),
        "IVF maintainer must also have installed on the same commit")
      // the PCA maintainer installed the WARM fit: one iteration from
      // the served component over the merged corpus, bit-for-bit
      val pcaServed = Vectors.servedStorePcaFit(path, 3, 1)
      assert(pcaServed.exists(_._1 === post),
        "PCA maintainer must install under the post-commit stamp")
      val expectPca = Vectors.warmOver(
        EventStreams.admittedVectors(spark, path), 1, 1, oldFit)
      assert(pcaServed.get._2.get._2.map(_._2.toList) ===
        expectPca.get._2.map(_._2.toList),
        "maintained PCA fit diverged from the warm-start core")
      assert(pcaServed.get._2.get._1.toList === expectPca.get._1.toList)
      // bit-parity with the corpus-agnostic core over the same inputs
      import spark.implicits._
      val oldCorpus = EventStreams.admittedVectors(spark, path)
        .filter(col("vec_id") < 100L)
        .select("vec_id", "embedding")
      val delta = b2.toDF().select(col("vec_id"), col("embedding"))
      val (expect, expectCounts) = Pq.incrementalOver(spark, oldBook,
        oldCounts, oldCorpus, delta, 2, 4, 1, 8, 0.5)
      assert(bookAtCommit.get._2.sortBy(t => (t._1, t._2)).map {
        case (s, c, w) => (s, c, w.toList) } ===
        expect.collect().map(r =>
          (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toList))
          .toSeq.sortBy(t => (t._1, t._2)),
        "maintained codebook diverged from the incremental core")
      // occupancy carried forward exactly for the next increment
      val counts = Pq.storeCodeCounts(spark, path, 2, 4, 1, 8)
      assert(counts === expectCounts.get)
      assert(counts.collect { case ((0, _), n) => n }.sum === 40L)
    } finally ArtifactMaintenance.clear(path)
  }

  test("non-pure commit (re-sent vec_id) keeps the store append-only, " +
      "skips maintenance, and rebuilds correctly on access") {
    val path = freshStore()
    ArtifactMaintenance.register(path, "ivf")(
      Ivf.storeMaintainer(nCells = 4, iters = 2))
    try {
      val b1 = (0L to 19L).map(vec)
      // id 5 re-sent with a DIFFERENT embedding + one genuinely new id
      val conflicting = Vec(5L, Array.fill(8)(9.9f))
      val b2 = Seq(conflicting, vec(200L))
      var preStamp = 0L
      var servedAfter: Option[(Long, Seq[(Int, Seq[Float])])] = None
      ingest(path, Seq(b1, b2)) {
        case 0 =>
          Ivf.storeCentroids(spark, path, 4, 2).count()
          preStamp = graft.sources.CorpusStamp.of(spark, path)
        case 1 =>
          servedAfter = Ivf.servedStoreCentroids(path, 4, 2)
        case _ => ()
      }
      val post = graft.sources.CorpusStamp.of(spark, path)
      assert(post !== preStamp, "the new id must still commit")
      assert(servedAfter.forall(_._1 !== post),
        "non-pure commit must not install maintained centroids")
      // first write won: id 5 kept its original embedding
      import spark.implicits._
      val kept = EventStreams.admittedVectors(spark, path)
        .filter(col("vec_id") === 5L)
        .select(col("embedding")).as[Array[Float]].collect()
      assert(kept.length === 1 && kept.head.toList === vec(5L).embedding.toList,
        "a re-sent vec_id must not overwrite the committed embedding")
      assert(EventStreams.admittedVectors(spark, path).count() === 21L)
      // rebuild-on-access is correct: bit-equal to a fresh build over
      // the post-ingest corpus, registered under the post stamp
      val served = centroidRows(Ivf.storeCentroids(spark, path, 4, 2))
      val fresh = centroidRows(Ivf.buildCentroids(
        EventStreams.admittedVectors(spark, path)
          .select("vec_id", "embedding"), 4, 2))
      assert(served.map { case (c, v) => (c, v.toList) } ===
        fresh.map { case (c, v) => (c, v.toList) })
      assert(Ivf.servedStoreCentroids(path, 4, 2).exists(_._1 === post))
    } finally ArtifactMaintenance.clear(path)
  }

  test("all-duplicate batch commits nothing: stamp unchanged, served " +
      "index stays valid") {
    val path = freshStore()
    try {
      val b1 = (0L to 9L).map(vec)
      var stampAfter1 = 0L
      ingest(path, Seq(b1, b1)) {
        case 0 => stampAfter1 = graft.sources.CorpusStamp.of(spark, path)
        case _ => ()
      }
      assert(graft.sources.CorpusStamp.of(spark, path) === stampAfter1,
        "an all-duplicate batch must not flip the stamp")
      assert(EventStreams.admittedVectors(spark, path).count() === 10L)
    } finally ArtifactMaintenance.clear(path)
  }
}
