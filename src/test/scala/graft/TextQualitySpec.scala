package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextQuality}

/** Unit edge cases the DuckDB oracle can't reach (the synthetic corpus
  * has no degenerate docs) plus the prefix-filter cap's lower-bound
  * contract.
  */
class TextQualitySpec extends SparkTestBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("tq").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition signals on degenerate docs") {
    val dir = docsDir(Seq(
      (1L, "a a a a"),            // one word repeated 4x
      (2L, "w x y z"),            // all distinct
      (3L, "."),                  // normalizes to empty
      (4L, "go go go go go")))    // repeated bigrams
    val got = TextQuality.docRepetition(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // (doc_id, n_words, distinct_ratio, top_share, dup_bigram_ratio)
    assert(got(1L) === ((1L, 4L, 0.25, 1.0, 0.666667)))
    assert(got(2L) === ((2L, 4L, 1.0, 0.25, 0.0)))
    assert(got(3L) === ((3L, 0L, 0.0, 0.0, 0.0)))
    assert(got(4L) === ((4L, 5L, 0.2, 1.0, 0.75)))
  }

  test("cross-entropy is zero for a single-word corpus, positive otherwise") {
    val uniform = docsDir(Seq((1L, "same same"), (2L, "same")))
    val e0 = TextQuality.docEntropy(spark, uniform)
      .select("cross_entropy").as[Double].collect()
    assert(e0.forall(_ == 0.0), s"p=1 words must cost 0 nats: ${e0.toSeq}")

    val mixed = docsDir(Seq((1L, "common common common rare")))
    val e1 = TextQuality.docEntropy(spark, mixed)
      .select("cross_entropy").as[Double].head()
    // 3 * -ln(3/4) + 1 * -ln(1/4), over 4 words
    val want = (3 * -math.log(3.0 / 4) + -math.log(1.0 / 4)) / 4
    assert(math.abs(e1 - want) < 1e-6)
  }

  test("ngram-jaccard maxDocFreq cap is a lower bound that drops hot grams") {
    // 12 docs share boilerplate; 2 are true near-dups of each other
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val rows = (1L to 10L).map(i => (i, s"$boiler unique$i word$i tail$i")) ++
      Seq((21L, "alpha beta gamma delta epsilon zeta eta theta"),
        (22L, "alpha beta gamma delta epsilon zeta eta iota"))
    val docs = rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val uncapped = Dedup.ngramJaccardPairs(docs, threshold = 0.1)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val capped = Dedup.ngramJaccardPairs(docs, threshold = 0.1,
      maxDocFreq = Some(5))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // capped scores never exceed uncapped (documented lower bound)
    capped.foreach { case (k, j) =>
      assert(j <= uncapped.getOrElse(k, 1.0) + 1e-9, s"$k capped above exact")
    }
    // the boilerplate-only pairs (df=10 > cap) lose their hot grams and
    // drop out; the true near-dup pair (private grams, df<=cap) survives
    assert(capped.contains((21L, 22L)), "true near-dup pair was lost")
    assert(uncapped.keySet.exists(p => p._1 <= 10 && p._2 <= 10),
      "expected boilerplate pairs in the uncapped join")
    assert(!capped.keySet.exists(p => p._1 <= 10 && p._2 <= 10),
      "hot boilerplate grams above the cap must not generate candidates")
  }

  test("gopher rule battery: each rule rejects exactly its violator") {
    val good = (("the and of that " * 15).trim)           // 60 words, stops, len 3
    val rows = Seq(
      (1L, good),                                          // passes all rules
      (2L, "the and of words too few"),                    // word count < 50
      (3L, ("hippopotamuses " * 60).trim + " the and"),    // mean len > 10
      (4L, (("# " * 20).trim + " " + good)),               // symbol ratio > 0.1
      (5L, (1 to 60).map(i => s"- b$i the and\n").mkString), // all lines bulleted
      (6L, (1 to 60).map(i => s"c$i the and...\n").mkString), // all lines ...-ended
      (7L, ("123 456 " * 30).trim + " the and"),           // alpha ratio < 0.8
      (8L, ("word " * 60).trim))                           // < 2 stop words
    val dir = docsDir(rows.map { case (i, t) => (i, t) })
    val got = TextQuality.gopherQualityFilter(spark, dir)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "the clean doc must pass")
    (2L to 8L).foreach(i => assert(!got(i), s"doc $i must fail its rule"))

    // spot-check the signal values on the clean doc
    val sig = TextQuality.gopherQualityFilter(spark, dir)
      .filter(col("doc_id") === 1L).collect().head
    assert(sig.getAs[Long]("n_words") === 60L)
    assert(sig.getAs[Double]("mean_word_len") === 3.0) // (3+3+2+4)/4
    assert(sig.getAs[Double]("alpha_word_ratio") === 1.0)
    assert(sig.getAs[Long]("n_stop_hits") === 4L)
  }

  test("gopher battery zero-fills empty and wordless docs without crashing") {
    val dir = docsDir(Seq((1L, ""), (2L, "   "), (3L, good50)))
    val got = TextQuality.gopherQualityFilter(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double, Double, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === 0L)
    assert(!got(1L)._9, "empty doc cannot pass the word-count rule")
    assert(got(2L)._2 === 0L)
    assert(got(3L)._9)
  }

  private val good50 = ("the and of with " * 15).trim
}
