package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixRanks

/** The incremental-maintenance property: merging a delta corpus into a
  * persisted rank table must reproduce the full rebuild bit-for-bit —
  * `incremental(suffixRanks(A), A, B) == suffixRanks(A ∪ B)` — on
  * corpora engineered so the merge has to do real work: delta-only
  * window classes that interleave BETWEEN old classes (shifting old
  * ranks), delta windows equal to old classes (merging, not
  * double-counting), deltas shorter than the horizon, empty deltas,
  * and chained merges (two ingests in a row).
  */
class SuffixRanksIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def table(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Int, Long)] =
    df.select(col("doc_id"), col("pos"), col("r"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def check(oldDocs: Seq[(Long, String)],
      delta: Seq[(Long, String)]): Unit = {
    val oldDf = oldDocs.toDF("doc_id", "text")
    val deltaDf = delta.toDF("doc_id", "text")
    val merged = SuffixRanks.incremental(
      SuffixRanks.suffixRanks(oldDf), oldDf, deltaDf)
    val full = SuffixRanks.suffixRanks(
      oldDf.unionByName(deltaDf))
    assert(table(merged) === table(full),
      s"incremental != full rebuild (old=${oldDocs.map(_._1)}, " +
        s"delta=${delta.map(_._1)})")
  }

  test("adversarial inline merges == full rebuild") {
    val oldDocs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "zzzz zzzz zzzz zzzz zzzz zzzz",
      3L -> "tiny doc",
      4L -> ("ab " * 30).trim)
    // delta classes that sort BELOW, BETWEEN, and ABOVE old classes;
    // exact duplicates of old windows; sub-horizon docs; an empty doc
    val deltas = Seq(
      Seq(10L -> "aardvark aaaa abable",             // below / between
        11L -> "the quick brown fox jumps over"),    // duplicate windows
      Seq(12L -> "zzzzz zzzzzz unseen suffix material here"),
      Seq(13L -> "x"),                               // single char
      Seq(14L -> "!!!"),                             // empty stream
      Seq.empty[(Long, String)])                     // empty delta
    deltas.foreach(d => check(oldDocs, d))
  }

  test("oversized delta falls back to a full rebuild, schemas aligned") {
    // maxDeltaClasses = 1 forces the fallback; oldDocs carries an
    // extra column the delta never has (the sf1 crash shape)
    val oldDf = Seq((1L, "en", "base corpus one"),
      (2L, "en", "base corpus two"))
      .toDF("doc_id", "lang", "text")
    val deltaDf = Seq((10L, "entirely new words everywhere"))
      .toDF("doc_id", "text")
    val merged = SuffixRanks.incremental(
      SuffixRanks.suffixRanks(oldDf), oldDf, deltaDf,
      maxDeltaClasses = 1)
    val full = SuffixRanks.suffixRanks(
      oldDf.select(col("doc_id"), col("text")).unionByName(deltaDf))
    assert(table(merged) === table(full))
  }

  test("empty old corpus: merge IS the delta build") {
    check(Seq.empty, Seq(1L -> "fresh corpus from nothing",
      2L -> "fresh corpus from nothing"))
  }

  test("chained merges == one full rebuild (two ingests)") {
    val a = Seq(1L -> "base corpus first wave of documents here",
      2L -> "another base document with shared shared words")
    val b = Seq(10L -> "second wave shares shared words and adds new")
    val c = Seq(20L -> "third wave aaaa zzzz between everything")
    val aDf = a.toDF("doc_id", "text")
    val bDf = b.toDF("doc_id", "text")
    val cDf = c.toDF("doc_id", "text")
    val step1 = SuffixRanks.incremental(
      SuffixRanks.suffixRanks(aDf), aDf, bDf)
    val step2 = SuffixRanks.incremental(
      step1, aDf.unionByName(bDf), cDf)
    val full = SuffixRanks.suffixRanks(
      aDf.unionByName(bDf).unionByName(cDf))
    assert(table(step2) === table(full))
  }

  test("sf0.001 split-merge == full rebuild") {
    // 150-doc subset: the full sf0.001 corpus triples this suite's
    // wall clock for no extra structural coverage (the full-corpus
    // doubling itself is SuffixRanksSpec's brute-force test, and the
    // registry's suffix_ranks_incremental oracle covers sf0.01/sf0.1)
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(150)
      .as[(Long, String)].collect()
    val (oldDocs, delta) = docs.toSeq.partition(_._1 % 5 != 0)
    check(oldDocs, delta)
  }
}
