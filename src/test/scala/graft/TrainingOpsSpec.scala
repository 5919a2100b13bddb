package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pipeline, TextAnalysis, Vectors}
import graft.sources.Tables

/** Semantic properties of the round-5 training-pipeline additions:
  * BM25 ranking, PMI co-occurrence, int8 quantization, mixing weights.
  * (The oracle gate checks exact values; these pin the math's
  * invariants so a plausible-but-wrong reformulation fails fast.)
  */
class TrainingOpsSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("bm25: every ranked doc contains a query term, scores descend") {
    val terms = Seq("hash", "join", "scan", "filter")
    val out = TextAnalysis.bm25TopK(spark, dir, terms).collect()
    assert(out.nonEmpty && out.length <= 25)
    val scores = out.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "bm25 not descending")
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= terms.size))
    // every returned doc really contains >= n_terms_hit distinct terms
    val hits = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir), col("doc_id"))
      .filter(col("word").isin(terms.map(x => x: Any): _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("word")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r =>
      assert(hits.getOrElse(r.getLong(0), 0L) === r.getLong(2),
        s"doc ${r.getLong(0)}: n_terms_hit mismatch"))
  }

  test("pmi: pairs are ordered (a < b), pmi matches recomputation") {
    val out = TextAnalysis.pmiPairs(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0) < r.getString(1)))
    // recompute pmi for every returned pair from first principles
    val dw = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("word")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val n = Tables.documents(spark, dir).count().toDouble
    val byWord = dw.groupBy(_._2).view.mapValues(_.size).toMap
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val nab = dw.count { case (d, w) => w == a && dw.contains((d, b)) }
      assert(nab === r.getLong(2), s"($a,$b) n_ab")
      val pmi = math.log(nab * n / (byWord(a).toDouble * byWord(b)))
      assert(math.abs(pmi - r.getDouble(3)) < 1e-6, s"($a,$b) pmi")
    }
  }

  test("quantize: max_err bounded by scale/2 (round-to-nearest), codes in int8") {
    val out = Vectors.vecQuantize(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (scale, qSum, maxErr) =
        (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(scale >= 0)
      // round-to-nearest quantization error is at most half a step
      // (1e-9 slack: the reported scale is rounded to 9 dp)
      assert(maxErr <= scale / 2 + 1e-9, s"vec ${r.getLong(0)}: err > step/2")
      // codes live in [-127, 127] so any sum of 64 is bounded
      assert(math.abs(qSum) <= 127L * 64)
    }
  }

  test("data mix: weights normalize to 1; sqrt-mixing upweights small sources") {
    val out = Pipeline.dataMix(spark, dir).collect()
    assert(out.length > 1)
    val wSum = out.map(_.getDouble(3)).sum
    assert(math.abs(wSum - 1.0) < 1e-6, s"weights sum to $wSum")
    // alpha = 0.5 flattens the distribution: the smallest source must
    // be oversampled strictly more than the largest
    val byTokens = out.sortBy(_.getLong(2))
    assert(byTokens.head.getDouble(4) >= byTokens.last.getDouble(4),
      "smallest source not upweighted relative to largest")
  }
}
