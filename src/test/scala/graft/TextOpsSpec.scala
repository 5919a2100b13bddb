package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Tokenize/normalize fidelity to the reference semantics
  * (tema1.cpp:88-99, :143-151): punctuation deleted in place (no split),
  * lowercase, non-ASCII stripped, split on space/tab/newline only.
  */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def wordsOf(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(TextOps.words(col("text")).as("w"))
      .as[Seq[String]].head()

  test("apostrophes and inner punctuation are deleted, not split") {
    assert(wordsOf("don't stop") === Seq("dont", "stop"))
    assert(wordsOf("end.Begin") === Seq("endbegin"))
  }

  test("non-ASCII bytes are stripped") {
    assert(wordsOf("café au lait") === Seq("caf", "au", "lait"))
  }

  test("split on space/tab/newline; all-punct tokens vanish") {
    assert(wordsOf("a\tb\nc !!! d-e") === Seq("a", "b", "c", "de"))
  }

  test("uppercase folds to lowercase") {
    assert(wordsOf("The THE the") === Seq("the", "the", "the"))
  }

  test("CRLF: \\r is stripped as non-alpha (joins across it)") {
    assert(wordsOf("foo\rbar baz\r\nqux") === Seq("foobar", "baz", "qux"))
  }

  test("token counts") {
    val r = Seq("Hello, world! 123 foo").toDF("text")
      .select(
        TextOps.tokenCount(col("text")).as("t"),
        TextOps.bpeishTokenCount(col("text")).as("b"))
      .as[(Int, Int)].head()
    assert(r._1 === 4)
    // hello , world ! 123 foo -> 6 bpe-ish tokens
    assert(r._2 === 6)
  }

  test("char shingles slide over the normalized word stream") {
    val sh = Seq("ab cd").toDF("text")
      .select(TextOps.charShingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh === Seq("ab ", "b c", " cd"))
  }

  test("word ngrams") {
    val ng = Seq("a b c d").toDF("text")
      .select(TextOps.wordNgrams(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(ng === Seq("a b c", "b c d"))
  }

  test("fingerprint ignores layout and punctuation") {
    val fps = Seq("Hello  world", "hello\nWORLD!!").toDF("text")
      .select(TextOps.fingerprint(col("text")).as("f"))
      .as[Long].collect()
    assert(fps(0) === fps(1))
  }

  test("quality scores are in [0,1] and penalize junk") {
    val r = Seq(
      "The quick brown fox jumps over the lazy dog and runs far away into the quiet forest tonight",
      "!!! ### $$$ %%% ^^^ &&&")
      .toDF("text")
      .select(TextOps.qualityScore(col("text")).as("q"))
      .as[Double].collect()
    assert(r.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(0) > r(1))
  }
}
