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

  test("c4 battery: line rules drop exactly their violators") {
    // every doc is one page; lines separated by \n
    val keepL = "alpha beta gamma delta epsilon."     // survives all rules
    val rows = Seq(
      (1L, s"$keepL\n$keepL\n$keepL"),                 // 3 sentences -> keep
      (2L, s"$keepL\n$keepL\nno terminal punct here"), // line 3 dropped
      (3L, s"$keepL\n$keepL\nfour words only here."),  // < 5 words dropped
      (4L, s"$keepL\n$keepL\nthis line mentions JavaScript sadly."),
      (5L, s"$keepL\n$keepL"),                         // 2 sentences -> drop
      (6L, s"$keepL\n$keepL\n$keepL\nwe love lorem ipsum text."),
      (7L, s"$keepL\n$keepL\n$keepL\ncurly {brace} inside a line."),
      (8L, s"$keepL\n$keepL\n$keepL\nvisit our casino right now."))
    val dir = docsDir(rows)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = TextQuality.c4Filter(docs)
      .select("doc_id", "n_kept_lines", "n_sentences", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 3L, true)))
    assert(got(2L) === ((2L, 2L, 2L, false)), "unpunctuated line must drop")
    assert(got(3L) === ((3L, 2L, 2L, false)), "short line must drop")
    assert(got(4L)._2 === 2L, "javascript line must drop (case-insensitive)")
    assert(got(5L) === ((5L, 2L, 2L, false)), "< 3 sentences must drop page")
    assert(!got(6L)._4 && got(6L)._2 === 4L,
      "lorem ipsum drops the PAGE, not the line")
    assert(!got(7L)._4, "curly brace drops the page")
    assert(!got(8L)._4, "blocklisted word drops the page")

    // clean_md5 is the md5 of exactly the kept lines rejoined
    val md5s = TextQuality.c4Filter(docs)
      .select("doc_id", "clean_md5").as[(Long, String)].collect().toMap
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(Seq(keepL, keepL).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5s(2L) === want)
  }

  test("c4 battery: empty and single-line corners zero-fill") {
    val dir = docsDir(Seq((1L, ""), (2L, "word."), (3L, "a b c d e.")))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = TextQuality.c4Filter(docs)
      .select("doc_id", "n_lines", "n_kept_lines", "kept_ratio", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1L, 0L, 0.0, false))) // "" splits to one empty line
    assert(got(2L) === ((2L, 1L, 0L, 0.0, false))) // 1 word < 5
    assert(got(3L) === ((3L, 1L, 1L, 1.0, false))) // kept but 1 sentence < 3
  }

  test("relineated view: deterministic, punctuated, and marker-planted") {
    val dir = docsDir(Seq(
      (23L, ("w " * 20).trim),   // 20 words -> 3 lines; 23 -> lorem trailer
      (3L, ("x " * 4).trim),     // 1 short line; (3+0)%3==0 -> no period
      (7L, ("y " * 8).trim)))    // (7+0)%7==0 -> javascript marker
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val v = TextQuality.relineated(docs)
      .as[(Long, String)].collect().toMap
    assert(v(23L).endsWith("\nlorem ipsum here it comes."))
    assert(v(23L).split("\n").length === 4)
    assert(v(3L) === "x x x x")  // no punct: (3+0)%3==0, no trailers
    assert(v(7L) === "y y y y y y y y. javascript.")
    // deterministic: two derivations byte-identical
    val v2 = TextQuality.relineated(docs).as[(Long, String)].collect().toMap
    assert(v === v2)
  }

  test("ccnet buckets: per-lang tertiles, exact edges, zero-filled docs") {
    // lang A: 6 docs with strictly increasing rarity -> distinct ce;
    // lang B: a single doc (percent_rank 0 -> head); doc 30 wordless
    val common = "base base base base base base"
    val rows = (1L to 6L).map(i =>
      (i, s"$common rare$i " + ("rare" + i + " ") * i.toInt)) ++
      Seq((20L, "solo doc words here")) ++ Seq((30L, "..."))
    val dir = java.nio.file.Files.createTempDirectory("tq").toString
    rows.map { case (id, t) =>
      (id, t,
        if (id == 20L) "xx" else if (id == 30L) "yy" else "en",
        "src0", t.length.toLong) }
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQuality.ccnetBuckets(spark, dir)
      .select("doc_id", "lang", "bucket", "pct_rank")
      .as[(Long, String, String, Double)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    // every doc bucketed exactly once
    assert(got.length === 8)
    // 6-doc lang: percent_rank = (rank-1)/5 -> 0,.2 head | .4 middle | .6,.8,1 tail...
    val en = got.filter(_._2 == "en").sortBy(_._4)
    assert(en.map(_._3).toSeq ===
      Seq("head", "head", "middle", "middle", "tail", "tail"))
    assert(byId(20L)._3 === "head", "singleton lang ranks 0.0 -> head")
    assert(byId(30L)._3 === "head", "wordless doc gets ce 0.0 -> ranks first")
  }

  test("gopher repetition: line/para/n-gram signals are exact") {
    val rows = Seq(
      // one line repeated of three -> dup_line_frac 1/3; all three in
      // one 4-line paragraph block -> no para dup
      (1L, "aaa bbb ccc.\naaa bbb ccc.\nxxx yyy zzz."),
      // degenerate loop: "x x x x" -> top 2-gram covers (3 occ x 2
      // chars) / 4 word chars, capped at 1.0
      (2L, "x x x x"),
      // a repeated 5-word run -> dup 5-gram chars (2-1)*5 over 10
      (3L, "a b c d e a b c d e"),
      // paragraph blocks 0 and 1 byte-identical -> half the paras dup
      (4L, (1 to 8).map(i => s"p q r s${(i - 1) / 4}").mkString("\n")
        .replace("0", "").replace("1", "")),
      (5L, ""))
    val got = TextQuality
      .gopherRepetition(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = got(1L)
    assert(d1.getDouble(d1.fieldIndex("dup_line_frac")) === 0.333333)
    assert(d1.getDouble(d1.fieldIndex("dup_line_char_frac")) === 0.333333)
    assert(d1.getDouble(d1.fieldIndex("dup_para_frac")) === 0.0)

    val d2 = got(2L)
    assert(d2.getDouble(d2.fieldIndex("top_2gram_char_frac")) === 1.0,
      "coverage caps at 1.0")
    assert(!d2.getBoolean(d2.fieldIndex("keep")))

    val d3 = got(3L)
    assert(d3.getDouble(d3.fieldIndex("dup_5gram_char_frac")) === 0.5)
    assert(!d3.getBoolean(d3.fieldIndex("keep")))

    val d4 = got(4L)
    assert(d4.getDouble(d4.fieldIndex("dup_para_frac")) === 0.5)
    assert(d4.getDouble(d4.fieldIndex("dup_para_char_frac")) === 0.5)

    val d5 = got(5L)
    assert(d5.getDouble(d5.fieldIndex("dup_line_frac")) === 0.0)
    assert(d5.getBoolean(d5.fieldIndex("keep")),
      "empty doc trips no repetition rule")
  }

  test("gopher repetition: clean long text keeps; all docs present") {
    // 60 distinct words -> top 2-gram coverage ~2/60 of chars, every
    // dup signal 0 -> keep. Letter-distinct: normalize STRIPS digits,
    // so "w1x w2x ..." would collapse to sixty copies of "wx".
    val clean = (0 until 60)
      .map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}q")
      .mkString(" ")
    val rows = Seq((1L, clean + ".\n" + "tail line of words here."))
    val out = TextQuality.gopherRepetition(rows.toDF("doc_id", "text"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getBoolean(r.fieldIndex("keep")))
    assert(r.getDouble(r.fieldIndex("dup_5gram_char_frac")) === 0.0)
  }
}
