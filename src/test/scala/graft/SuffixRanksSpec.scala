package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixRanks

/** [[graft.operators.SuffixRanks]] vs a brute-force reference: sort
  * every suffix's PrefixLen-char window lexicographically and dense-
  * rank it. The prefix-doubling rounds, the -1 shorter-sorts-first
  * convention, the early-exit, and the distributed rank machinery all
  * have to agree with plain string sorting, including cross-document
  * ties and documents shorter than the horizon.
  */
class SuffixRanksSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute force: (doc_id, pos [1-based]) -> dense rank of the 32-char
    * window among all windows, memcmp order. */
  private def ref(streams: Seq[(Long, String)])
      : Map[(Long, Int), Long] = {
    val windows = for {
      (id, s) <- streams if s.nonEmpty
      p <- 1 to s.length
    } yield ((id, p), s.substring(p - 1,
      math.min(s.length, p - 1 + SuffixRanks.PrefixLen)))
    val rankOf = windows.map(_._2).distinct.sorted.zipWithIndex.toMap
    windows.map { case (k, w) => k -> rankOf(w).toLong }.toMap
  }

  private def normalized(text: String): String =
    text.split("[ \t\n]+").map(_.toLowerCase.replaceAll("[^a-z]", ""))
      .filter(_.nonEmpty).mkString(" ")

  private def run(docs: Seq[(Long, String)]): Map[(Long, Int), Long] =
    SuffixRanks.suffixRanks(
      docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap

  test("ranks == brute force on an adversarial inline corpus") {
    val docs = Seq(
      // cross-doc exact duplicate spans (same 32-char windows)
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "THE QUICK BROWN FOX naps under the lazy dog again",
      // shorter than the horizon
      3L -> "tiny doc",
      4L -> "tiny doc", // full duplicate of 3
      // periodic text: maximal tie pressure deep into the doubling
      5L -> ("ab " * 30).trim,
      6L -> "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz",
      // empty after normalization
      7L -> "12345 !!!",
      8L -> "a")
    val got = run(docs)
    val want = ref(docs.map { case (id, t) => id -> normalized(t) })
    assert(got.size === want.size)
    val bad = want.collect {
      case (k, w) if got.get(k) != Some(w) => (k, w, got.get(k))
    }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(5)}")
  }

  test("ranks == brute force on the sf0.001 corpus") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val got = run(docs.toSeq)
    val want = ref(docs.toSeq.map { case (id, t) => id -> normalized(t) })
    assert(got.size === want.size)
    assert(want.forall { case (k, w) => got(k) == w },
      "dense suffix ranks must match brute-force string sorting")
  }

  test("repeatedSpans zero-fills and counts cross-doc duplicates") {
    val docs = Seq(
      1L -> "unique alpha beta gamma delta epsilon zeta eta theta iota",
      2L -> "unique alpha beta gamma delta epsilon zeta eta theta iota",
      3L -> "!!!") // empty stream -> zero-filled
    val out = SuffixRanks.repeatedSpans(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1 and 2 are identical: every window occurs >= 2x
    val (n1, rep1, max1) = out(1L)
    assert(n1 > 0 && rep1 === n1 && max1 >= 2L)
    assert(out(1L) === out(2L))
    assert(out(3L) === ((0L, 0L, 0L)))
  }
}
