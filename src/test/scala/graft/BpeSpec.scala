package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.Bpe

/** [[graft.operators.Bpe]] against a pure-Scala reference BPE trainer
  * (greedy left-to-right merge over scalar symbol lists — the textbook
  * Sennrich formulation, no string-replace tricks), so the wrapped-
  * string representation is checked against the semantics it claims,
  * not against itself.
  */
class BpeSpec extends SparkTestBase with TableDrivenPropertyChecks {
  import spark.implicits._

  // --- scalar reference implementation -------------------------------

  /** Greedy left-to-right single-pass merge of (a,b) in a symbol list. */
  private def refMergePass(syms: Vector[String], a: String, b: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Full reference trainer over a weighted word list. */
  private def refTrain(words: Seq[String], k: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var segs: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var t = 0
    while (t < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + freq(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        merges += ((a, b, n))
        segs = segs.map { case (w, syms) => w -> refMergePass(syms, a, b) }
        t += 1
      }
    }
    (merges.result(), segs)
  }

  // --- specs ---------------------------------------------------------

  test("learnMerges matches the scalar reference on a crafted corpus") {
    // crafted to exercise: overlapping repeats (aaa), repeated pairs in
    // one word (abab), frequency-weighted selection, count ties broken
    // lexicographically, and multi-char merged symbols re-merging
    val words = Seq(
      "aaa", "abab", "abab", "banana", "banana", "banana",
      "cabbage", "baggage", "na", "na", "ab")
    val got = Bpe.learnMerges(words.toDF("word"), 8)
    val (want, _) = refTrain(words, 8)
    assert(got.map(m => (m.lhs, m.rhs, m.n)) === want)
  }

  test("learnMerges exhausts gracefully when pairs run out") {
    // two 2-char words -> after 2 merges every word is one symbol
    val words = Seq("ab", "ab", "cd")
    val got = Bpe.learnMerges(words.toDF("word"), 10)
    val (want, _) = refTrain(words, 10)
    assert(got.map(m => (m.lhs, m.rhs, m.n)) === want)
    assert(got.size === 2)
  }

  test("learnMerges matches the reference on pseudo-random corpora") {
    // fixed-seed corpora over a 3-letter alphabet: small alphabet
    // forces deep merge interaction (merged symbols joining again)
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val words = Seq.fill(60 + trial * 20)(
        (0 until (1 + rnd.nextInt(7)))
          .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .filter(_.nonEmpty)
      val got = Bpe.learnMerges(words.toDF("word"), 12)
      val (want, _) = refTrain(words, 12)
      assert(got.map(m => (m.lhs, m.rhs, m.n)) === want,
        s"trial $trial corpus=${words.take(10)}...")
    }
  }

  test("incremental merge table is bit-equal to a full retrain over " +
      "the merged corpus (census merge + full loop re-run)") {
    val sfDir = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val delta = graft.operators.SuffixRanks.syntheticDocDelta(docs)
    // maintained arm: persisted census + delta census, loop re-run
    val got = Bpe.incrementalMerges(spark, sfDir, delta, 20)
    // retrain arm: one pass over the merged corpus text
    val want = Bpe.learnMerges(
      graft.functions.TextOps.explodedWords(
        docs.select(col("doc_id"), col("text"))
          .unionByName(delta.select(col("doc_id"), col("text")))), 20)
    assert(got === want,
      "census-merged training diverged from the full retrain")
    assert(got.size === 20)
    // the delta genuinely moves the table (reversed docs add reversed
    // pair mass): training on the base corpus alone must differ
    val base = Bpe.learnMerges(graft.functions.TextOps.explodedWords(docs), 20)
    assert(base !== got, "fixture delta should change at least one merge")
  }

  test("tokenizeDocs token counts equal the reference segmentation size") {
    val sfDir = sf("sf0.001")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // reference: train on the same corpus word stream, segment, count
    val words = graft.functions.TextOps
      .explodedWords(docs, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (_, segs) = refTrain(words.map(_._2), 20)
    val wantTok = words.groupBy(_._1).map { case (id, ws) =>
      id -> ws.map { case (_, w) =>
        if (w.length < 2) 1L else segs(w).size.toLong }.sum
    }
    val got = Bpe.tokenizeDocs(spark, sfDir, 20)
      .select(col("doc_id"), col("n_tokens"), col("n_words")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size === docs.count())
    got.foreach { case (id, tok, nw) =>
      assert(tok === wantTok.getOrElse(id, 0L), s"doc $id")
      if (nw == 0) assert(tok === 0L)
    }
  }

  test("merged pair never straddles a separator boundary (collision guard)") {
    // the representation's invariant: the separator byte cannot occur
    // inside a symbol, so replace() patterns are self-delimiting
    val m = Bpe.learnMerges(Seq("abc", "abc", "bcd").toDF("word"), 5)
    m.foreach { mg =>
      assert(!mg.lhs.contains(Bpe.Sep) && !mg.rhs.contains(Bpe.Sep))
    }
  }
}
