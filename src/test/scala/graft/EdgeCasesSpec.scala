package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Ivf, Similarity}

/** Degenerate-input behavior of the round-5 operators: single-row and
  * empty tables, sub-k-word documents, zero-token documents. These pin
  * the contracts the scaladocs promise (NULL columns instead of
  * dropped rows, zero-fill instead of division errors, no crash on
  * empty input) against tiny purpose-built corpora — shapes the
  * sf-generated testdata never produces.
  */
class EdgeCasesSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val tempDirs = scala.collection.mutable.ArrayBuffer[String]()

  override def afterAll(): Unit = {
    tempDirs.foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    super.afterAll()
  }

  /** Write a tiny corpus into a temp dir shaped like a testdata sfDir. */
  private def corpus(docs: Seq[(Long, String, String)] = Seq.empty,
      vecs: Seq[(Long, Seq[Float], Int)] = Seq.empty): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge").toString
    tempDirs += dir
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("hard negatives: a query with no candidates keeps its row with NULL picks") {
    val dir = corpus(vecs = Seq((0L, Seq(1f, 0f), 7)))
    val out = Similarity.hardNegatives(spark, dir, nQueries = 10).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 0L && r.getLong(1) === 7L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("hard negatives: single-class corpus fills positives, leaves negatives NULL") {
    val dir = corpus(vecs = Seq(
      (0L, Seq(1f, 0f), 7), (1L, Seq(0.9f, 0.1f), 7)))
    val byId = Similarity.hardNegatives(spark, dir, nQueries = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(2) === 1L, "positive should be the other vector")
    assert(byId(0L).isNullAt(4), "no other label exists -> NULL negative")
  }

  test("ivf buildCentroids: empty and sub-k corpora build without crashing") {
    val empty = graft.sources.Tables.embeddings(spark, corpus())
    assert(Ivf.buildCentroids(empty, k = 4, iters = 2).count() === 0)
    val one = graft.sources.Tables.embeddings(spark,
      corpus(vecs = Seq((0L, Seq(1f, 2f, 3f), 0))))
    val built = Ivf.buildCentroids(one, k = 4, iters = 2).collect()
    assert(built.length === 1, "one vector -> one centroid")
    assert(built.head.getSeq[Float](1) === Seq(1f, 2f, 3f))
  }

  test("dup span coverage: sub-k-word docs zero-fill instead of dividing by zero") {
    val dir = corpus(docs = Seq(
      (1L, "only three words", "en"),
      (2L, "a b c d e f g h i j a b c d e f g h i j", "en")))
    val byId = Dedup.dupSpanCoverage(spark, dir, k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) === 0 && byId(1L).getDouble(3) === 0.0)
    // doc 2 repeats its 10-word block, so every 8-gram in the repeated
    // region occurs twice -> full coverage of the duplicated windows
    assert(byId(2L).getLong(1) === 13 && byId(2L).getLong(2) > 0)
  }

  test("weighted sample: zero-token docs are excluded, not divided by") {
    val dir = corpus(docs = Seq(
      (1L, "   ", "en"), (2L, "some actual words here", "en")))
    val out = Analytics.weightedSample(spark, dir, k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("top dup spans: corpus with no repeated spans returns empty, not error") {
    val dir = corpus(docs = Seq(
      (1L, "one two three four five six seven eight", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en")))
    assert(Dedup.topDupSpans(spark, dir, k = 8).count() === 0)
  }
}
