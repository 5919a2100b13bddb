package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** [[graft.operators.Unigram]] against an exhaustive-enumeration
  * reference: the Viterbi DP's one property the DuckDB oracle cannot
  * check is *optimality* under the declared total order (score DESC,
  * tokens ASC, joined segmentation ASC), so this spec enumerates ALL
  * valid segmentations of adversarial small words and requires the DP
  * to pick the bit-identical winner — including zero-probability
  * pieces (pruned-to-zero chars), exact float ties from repeated
  * pieces, and unreachable prefixes.
  */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  // --- exhaustive reference ------------------------------------------

  /** All segmentations of `word` into vocab pieces (len <= MaxPieceLen),
    * each scored with the same left-to-right product the DP claims. */
  private def enumerate(word: String, prob: Map[String, Double])
      : Seq[(String, Int, Double)] = {
    if (word.isEmpty) return Seq(("", 0, 1.0))
    (1 to math.min(Unigram.MaxPieceLen, word.length)).flatMap { l =>
      val piece = word.substring(0, l)
      prob.get(piece).toSeq.flatMap { _ =>
        enumerate(word.substring(l), prob).map { case (seg, t, _) => // score rebuilt below
          val full = if (seg.isEmpty) piece else piece + Unigram.Sep + seg
          (full, t + 1, 0.0)
        }
      }
    }.map { case (seg, t, _) =>
      // left-to-right product over the chosen pieces, exactly as the DP
      val s = seg.split(Unigram.Sep).foldLeft(1.0)((acc, p) => acc * prob(p))
      (seg, t, s)
    }
  }

  private def refBest(word: String, prob: Map[String, Double])
      : Option[(String, Int)] = {
    val all = enumerate(word, prob).filter(_._1.nonEmpty)
    if (all.isEmpty) None
    else {
      val best = all.minBy { case (seg, t, s) => (s, t, seg) }(
        Ordering.Tuple3(Ordering.Double.TotalOrdering.reverse,
          Ordering.Int, Ordering.String))
      Some((best._1, best._2))
    }
  }

  test("viterbi == exhaustive enumeration on adversarial words") {
    // vocab with exact ties (p(ab)*p(c) vs p(a)*p(bc) identical when
    // counts match), zero-count pieces, and a char-free piece layout
    val vocabs = Seq(
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "ab" -> 4L, "bc" -> 4L,
        "abc" -> 1L),
      Map("a" -> 1L, "b" -> 0L, "c" -> 3L, "ab" -> 2L, "bc" -> 2L,
        "abca" -> 5L),
      Map("a" -> 3L, "b" -> 3L, "aa" -> 3L, "aaa" -> 3L, "aaaa" -> 3L),
      Map("x" -> 1L, "y" -> 1L, "z" -> 1L, "xy" -> 1L, "yz" -> 1L,
        "xyz" -> 1L, "zz" -> 0L))
    val words = Seq("a", "ab", "abc", "abca", "aaaa", "aaaaaaa",
      "xyz", "xyzz", "zzzz", "abcabc", "cab", "bb")
    for (vc <- vocabs) {
      val total = vc.values.sum
      val prob = vc.map { case (p, c) =>
        p -> (if (total == 0) 0.0 else c.toDouble / total.toDouble) }
      for (w <- words if w.forall(ch => prob.contains(ch.toString))) {
        val got = Unigram.viterbi(w, prob)
        assert(Some(got) === refBest(w, prob),
          s"word=$w vocab=${vc.keys.toSeq.sorted}")
      }
    }
  }

  test("viterbi: zero-prob piece after the DP's per-position choice") {
    // The shape that breaks a single-track score DP: p(a)^2 > p(aa), so
    // at position 2 the score track keeps a·a (0.64, 2 tokens) over aa
    // (0.2, 1 token) — then piece b has probability 0.0 (a
    // pruned-to-zero char kept for coverage) and zeroes BOTH full
    // paths. The declared order (score DESC, tokens ASC, lex ASC) picks
    // aa·b (2 tokens); a score-only DP emits a·a·b (3 tokens). The
    // score-blind second track must take over whenever the best final
    // score is 0.0.
    val prob = Map("a" -> 0.8, "aa" -> 0.2, "b" -> 0.0)
    assert(Unigram.viterbi("aab", prob) === ("aa" + Unigram.Sep + "b", 2))
    assert(Some(Unigram.viterbi("aab", prob)) === refBest("aab", prob))
    // same family, deeper: the zero piece lands mid-word and the tail
    // continues with positive pieces (still all-zero products)
    for (w <- Seq("aab", "aaba", "baa", "aabaa", "ab", "b", "bb",
        "aabb", "aaab"))
      assert(Some(Unigram.viterbi(w, prob)) === refBest(w, prob), s"word=$w")
    // and with a zero-prob MULTI-char piece competing against zero
    // char paths: tokens-then-lex must decide among all-zero paths
    val prob2 = Map("a" -> 0.0, "b" -> 0.0, "ab" -> 0.0, "ba" -> 0.0)
    for (w <- Seq("ab", "ba", "abab", "aabb", "abba", "baba"))
      assert(Some(Unigram.viterbi(w, prob2)) === refBest(w, prob2),
        s"word=$w (all-zero vocab)")
  }

  test("viterbi handles unreachable interiors via longer pieces") {
    // 'b' is NOT in vocab alone; only "ab" covers it — positions after
    // 'a' are unreachable as char paths and the DP must route through
    // the 2-gram
    val prob = Map("a" -> 0.5, "ab" -> 0.25, "c" -> 0.25)
    assert(Unigram.viterbi("abc", prob) ===
      ("ab" + Unigram.Sep + "c", 2))
    assert(Some(Unigram.viterbi("abc", prob)) === refBest("abc", prob))
  }

  // --- end-to-end structure on real data ------------------------------

  test("train: vocabulary structure and determinism") {
    val v1 = Unigram.train(spark, sf("sf0.001")).collect()
    val v2 = Unigram.train(spark, sf("sf0.001")).collect()
    assert(v1.toSeq === v2.toSeq, "training must be bit-deterministic")
    val pieces = v1.map(_.getString(1))
    assert(pieces.distinct.length === pieces.length)
    val chars = pieces.filter(_.length == 1)
    val multis = pieces.filter(_.length > 1)
    // every char of every word survives pruning
    val corpusChars = graft.functions.TextOps
      .explodedWords(graft.sources.Tables.documents(spark, sf("sf0.001")))
      .select(explode(split(col("word"), "")).as("c"))
      .filter(length(col("c")) > 0)
      .distinct().as[String].collect().toSet
    assert(corpusChars.subsetOf(chars.toSet))
    assert(multis.length <= Unigram.VocabSize - chars.length)
    // ranks are 1..n in (cnt desc, piece asc) order
    val ranked = v1.map(r => (r.getInt(0), r.getLong(3), r.getString(1)))
    assert(ranked.map(_._1).toSeq === (1 to v1.length))
    assert(ranked.sortBy { case (_, c, p) => (-c, p) }.map(_._1).toSeq
      === (1 to v1.length))
  }

  test("tokenizeDocs: accounting invariants vs the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    val out = Unigram.tokenizeDocs(spark, sf("sf0.001"))
    val rows = out.collect()
    assert(rows.length === docs.count())
    // chars and words must agree with a direct count; tokens bounded
    // by [words, chars] (every word is 1..len pieces)
    val direct = graft.functions.TextOps
      .explodedWords(docs, col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("w"), sum(length(col("word"))).as("ch"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { r =>
      val (w, t, ch) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (dw, dch) = direct.getOrElse(r.getLong(0), (0L, 0L))
      assert(w === dw); assert(ch === dch)
      assert(t >= w && t <= ch, s"doc=${r.getLong(0)}: t=$t w=$w ch=$ch")
    }
  }

  test("incremental maintenance == full retrain, bit-equal; install " +
      "serves the maintained vocabularies") {
    import graft.operators.SuffixRanks
    import graft.sources.Tables
    // fresh mutable corpus dir (the StalenessSpec fixture pattern), so
    // the persisted-word-table artifact and install paths are exercised
    // without touching the shared testdata caches
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_unigram_incr").toString
    val base = Tables.documents(spark, sf("sf0.001"))
      .orderBy(col("doc_id")).limit(40)
    base.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = Tables.documents(spark, tmp)
    val delta = SuffixRanks.syntheticDocDelta(docs)
    // maintained fit: persisted word table + delta census, NO corpus
    // re-scan — must equal the full retrain over the merged corpus
    // bit-for-bit (integer counts, associative addition: no drift gate
    // exists because there is nothing to drift)
    val maintained = Unigram.incrementalVocabs(spark, tmp, delta)
    val merged = docs.select(col("doc_id"), col("text"))
      .unionByName(delta.select(col("doc_id"), col("text")))
    val retrained = Unigram.retrainOver(merged)
    assert(maintained === retrained,
      "incremental vocabularies diverged from the full retrain")
    // the persisted word-table artifact exists under the corpus stamp
    val stamp = graft.sources.CorpusStamp.of(
      spark, s"$tmp/documents.parquet")
    val safe = tmp.replaceAll("[^A-Za-z0-9._-]", "_")
    val wordDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_unigram_words", safe,
      f"s$stamp%016x")
    assert(java.nio.file.Files.exists(wordDir.resolve("_SUCCESS")),
      "word table must be persisted under its stamp-named directory")
    // the ingest: mutate the corpus to the merged content, install the
    // maintained fit — the post-ingest cachedVocabs must serve it.
    // Because maintenance == retrain bit-for-bit, serve-vs-retrain is
    // unobservable on the REAL value; prove install-serving with a
    // sentinel-modified copy (tmp-dir-only probe: if cachedVocabs
    // returns the sentinel it served the install; a retrain would
    // return the true fit), then re-install the correct one.
    // cut the lineage before the self-overwrite: merged READS the same
    // parquet dir the mutation rewrites
    val mergedCp = merged.localCheckpoint()
    val mergedWords = graft.functions.TextOps.explodedWords(mergedCp)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    mergedCp.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val stamp2 = graft.sources.CorpusStamp.of(
      spark, s"$tmp/documents.parquet")
    assert(stamp2 !== stamp, "mutation must flip the stamp")
    val sentinel = maintained.init :+ maintained.last.map(p =>
      p.copy(cnt = p.cnt + 1000000))
    Unigram.installVocabs(spark, tmp, sentinel, mergedWords)
    val wordDir2 = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_unigram_words", safe,
      f"s$stamp2%016x")
    assert(java.nio.file.Files.exists(wordDir2.resolve("_SUCCESS")),
      "install must persist the merged word table under the new stamp")
    assert(Unigram.cachedVocabs(spark, tmp) === sentinel,
      "post-ingest access must serve the installed fit, not retrain")
    Unigram.installVocabs(spark, tmp, maintained, mergedWords)
    assert(Unigram.cachedVocabs(spark, tmp) === maintained)
  }

  test("segTable: rounds cover the word table; segs concat to words") {
    val segs = Unigram.segTable(spark, sf("sf0.001"))
    val bad = segs
      .filter(regexp_replace(col("seg"), Unigram.Sep, "") =!= col("word"))
      .count()
    assert(bad === 0L)
    val perRound = segs.groupBy(col("round")).count()
      .as[(Int, Long)].collect().toMap
    assert(perRound.keySet === (1 to Unigram.Rounds + 1).toSet)
    assert(perRound.values.toSet.size === 1,
      "every round segments the same distinct-word table")
  }
}
