package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("dup span coverage: 64-bit and 128-bit gram keys agree") {
    // on a corpus where 64-bit xxhash collisions are impossible in
    // practice, the wide (at-scale) key mode must be a pure
    // implementation detail — bit-identical output
    val narrow = Dedup.dupSpanCoverage(spark, sf("sf0.001")).collect()
    val wide = Dedup.dupSpanCoverage(spark, sf("sf0.001"), wideHash = true)
      .collect()
    assert(narrow.nonEmpty)
    assert(wide.sameElements(narrow))
  }

  test("exact clusters collapse identical texts to one keeper") {
    val docs = Seq(
      (1L, "hello world"), (2L, "hello world"),
      (3L, "something else"), (4L, "hello world"))
      .toDF("doc_id", "text")
    val r = Dedup.exactClusters(docs, md5(col("text")))
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getBoolean(3)))
      .sortBy(_._1)
    assert(r === Array((1L, 3L, true), (2L, 3L, false),
      (3L, 1L, true), (4L, 3L, false)))
  }

  test("fingerprint dedup collapses layout/punct/case variants") {
    val docs = Seq(
      (1L, "Hello, world!"), (2L, "hello   WORLD"), (3L, "goodbye world"))
      .toDF("doc_id", "text")
    val r = Dedup.exactClusters(docs,
      md5(array_join(graft.functions.TextOps.words(col("text")), " ")))
      .collect().map(x => (x.getLong(0), x.getBoolean(3))).sortBy(_._1)
    assert(r === Array((1L, true), (2L, false), (3L, true)))
  }

  test("ngram jaccard finds near-identical docs, not unrelated ones") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("sigma", "sygma")
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs === Array((1L, 2L)))
  }

  test("asymmetric jaccard with probe == base degenerates to the self-join pair set") {
    // the incremental (delta-ingest) formulation must be the SAME
    // operator when the delta is the whole corpus: every pair, same
    // scores, nothing double-counted from the probe sitting on both
    // join sides
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val self = Dedup.ngramJaccardPairs(docs).collect()
    val asym = Dedup.ngramJaccardAgainst(docs, docs)
      .orderBy(col("doc_id_1"), col("doc_id_2")).collect()
    assert(self.nonEmpty)
    assert(asym.sameElements(self))
  }

  test("asymmetric jaccard with a strict probe subset reports exactly the pairs touching it") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") % 3 === 0)
    val probeIds = probe.select("doc_id").as[Long].collect().toSet
    val expected = Dedup.ngramJaccardPairs(docs).collect()
      .filter(r => probeIds(r.getLong(0)) || probeIds(r.getLong(1)))
    val got = Dedup.ngramJaccardAgainst(docs, probe)
      .orderBy(col("doc_id_1"), col("doc_id_2")).collect()
    assert(expected.nonEmpty)
    assert(got.sameElements(expected))
  }

  test("prefix-filtered jaccard equals the brute-force join across thresholds") {
    // the PPJoin-style candidate pruning must be LOSSLESS: same pair
    // set and bit-identical scores as the uncapped posting self-join,
    // at thresholds that exercise fractional prefix lengths
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    for (t <- Seq(0.3, 0.5, 0.7)) {
      val brute = Dedup.ngramJaccardPairs(docs, threshold = t).collect()
      val pref = Dedup.ngramJaccardPairsPrefix(docs, threshold = t).collect()
      assert(brute.nonEmpty, s"threshold $t produced no pairs")
      assert(pref.sameElements(brute), s"threshold $t mismatch")
    }
  }

  test("prefix-filtered jaccard stays exact on a boilerplate-heavy corpus") {
    // adversarial shape for the naive self-join: every doc shares a
    // large boilerplate block (corpus-wide df grams — the quadratic
    // head), only some are true near-dups through their tails. The
    // prefix join must (a) keep boilerplate grams out of candidate
    // generation and (b) still find exactly the true pairs
    val boiler = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = (1L to 40L).map { i =>
      val k = if (i % 2 == 0) i - 1 else i
      val tail = (1 to 40).map(j => s"tail${k}w$j").mkString(" ")
      (i, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val brute = Dedup.ngramJaccardPairs(docs, threshold = 0.5).collect()
    val pref = Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.5).collect()
    assert(brute.nonEmpty)
    assert(pref.sameElements(brute))
  }

  test("minhash LSH output equals the exact jaccard join on sf0.001") {
    val exact = Dedup.ngramJaccardDedup(spark, sf("sf0.001")).collect()
    val lsh = Dedup.minhashLshDedup(spark, sf("sf0.001")).collect()
    assert(exact.nonEmpty)
    assert(exact.sameElements(lsh))
  }

  test("simhash is identical for identical word streams, close for near-dups") {
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "Spark shuffles DATA across, the cluster!"),
      (3L, "completely different words entirely here now"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 5)
  }

  test("simhash pairs: the <=3 blocking guarantee is exact") {
    // ground truth from the raw signatures
    val sh = Dedup.simhashes(
      graft.sources.Tables.documents(spark, sf("sf0.001")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(spark, sf("sf0.001"), maxHamming = 3)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("span removal cuts exactly the cross-doc duplicated window") {
    val docs = Seq(
      (1L, "one two a b c d e f g h three four"),
      (2L, "x y a b c d e f g h z w"),
      (3L, "hello world"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSpanRemoval(docs).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r === Array(
      (1L, "one two three four", 12L, 8L),
      (2L, "x y z w", 12L, 8L),
      (3L, "hello world", 2L, 0L)))
  }

  test("span removal handles whole-doc dups and within-doc repeats") {
    val docs = Seq(
      // 4 and 5 are byte-identical 8-word docs: the single window is
      // duplicated, so both collapse to empty
      (4L, "p q r s t u v w"),
      (5L, "p q r s t u v w"),
      // 6 repeats its own 8-word prefix: windows at starts 0 and 8
      // share content, covering every position
      (6L, "m n o p q r s t m n o p q r s t"),
      // 7 is unique and stays intact
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSpanRemoval(docs).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r === Array(
      (4L, "", 8L, 8L),
      (5L, "", 8L, 8L),
      (6L, "", 16L, 16L),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota", 9L, 0L)))
  }

  test("span removal agrees with span coverage on what is touched") {
    // a doc loses words iff the coverage op sees duplicated grams in
    // it, and the interval arithmetic bounds hold: with d duplicated
    // k-gram starts forming m >= 1 maximal runs, removed positions =
    // d + m*(k-1), so d + (k-1) <= removed <= d*k
    val rem = Dedup.dupSpanRemoval(
      graft.sources.Tables.documents(spark, sf("sf0.001")))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val cov = Dedup.dupSpanCoverage(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rem.keySet === cov.keySet)
    assert(rem.values.exists(_._2 > 0), "corpus should contain dups")
    rem.foreach { case (id, (_, removed)) =>
      val dupGrams = cov(id)
      assert((removed > 0) === (dupGrams > 0), s"doc $id touch mismatch")
      if (dupGrams > 0) {
        assert(removed >= dupGrams + 7, s"doc $id removed < starts+k-1")
        assert(removed <= dupGrams * 8, s"doc $id removed > starts*k")
      }
    }
  }

  test("line dedup: threshold is corpus-wide, trim-keyed, all-occurrence") {
    // "footer." appears in 3 docs (>= maxOcc 3) -> removed everywhere,
    // including the doc where it appears with padding whitespace;
    // "twice here." appears in only 2 docs -> kept in both
    val docs = Seq(
      (1L, "alpha one.\nfooter.\ntwice here."),
      (2L, "beta two.\n  footer.  \ntwice here."),
      (3L, "gamma three.\nfooter."),
      (4L, ""),
      (5L, "\n\n")) // whitespace-only lines: zero countable lines
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) === ((1L, 3L, 1L, md5hex("alpha one.\ntwice here."))))
    assert(got(2L) === ((2L, 3L, 1L, md5hex("beta two.\ntwice here."))),
      "padded footer must dedup against the trimmed key")
    assert(got(3L) === ((3L, 2L, 1L, md5hex("gamma three."))))
    assert(got(4L) === ((4L, 0L, 0L, md5hex(""))))
    assert(got(5L) === ((5L, 0L, 0L, md5hex(""))))
  }

  test("line dedup: maxOcc boundary — exactly maxOcc occurrences remove") {
    val docs = Seq(
      (1L, "shared line text here."), (2L, "shared line text here."),
      (3L, "unique one."), (4L, "unique two."))
      .toDF("doc_id", "text")
    // maxOcc = 2: a line occurring twice is already boilerplate
    val got = Dedup.lineDedup(docs, maxOcc = 2)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(3L) === 0L && got(4L) === 0L)
  }
}
