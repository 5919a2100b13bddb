package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.functions.TextOps

/** Property-style tests: generated inputs, invariants asserted in one
  * DataFrame pass (the analog of the reference checker's M x R matrix —
  * results must be invariant to layout and parallelism).
  */
class TextPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val gen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaStr, Gen.oneOf(" ", "\t", "\n", "\r"),
    Gen.oneOf("don't", "end.Begin", "café", "123", "!!!", "a-b")))
    .map(_.mkString(" "))

  private val samples: Seq[String] =
    Gen.listOfN(300, gen).apply(Gen.Parameters.default,
      rng.Seed(42L)).getOrElse(Nil)

  test("normalize is idempotent and words are always [a-z]+") {
    val df = samples.toDF("text")
      .select(
        TextOps.words(col("text")).as("w1"),
        transform(TextOps.words(col("text")), TextOps.normalize _).as("w2"))
    df.collect().foreach { r =>
      val w1 = r.getSeq[String](0)
      val w2 = r.getSeq[String](1)
      assert(w1 === w2, "normalize not idempotent")
      assert(w1.forall(_.matches("[a-z]+")), s"non-canonical word in $w1")
    }
  }

  test("codegen normalizedStream equals the array-HOF word join") {
    val df = samples.toDF("text")
      .select(
        TextOps.normalizedStream(col("text")).as("fast"),
        array_join(TextOps.words(col("text")), " ").as("ref"))
    df.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
    }
  }

  test("fingerprint is invariant under whitespace layout") {
    val df = samples.toDF("text")
      .select(
        TextOps.fingerprint(col("text")).as("f1"),
        TextOps.fingerprint(
          regexp_replace(col("text"), "[ \t\n]+", "   ")).as("f2"))
    df.collect().foreach(r => assert(r.get(0) === r.get(1)))
  }

  test("inverted index is invariant under partitioning and shuffle-partition count") {
    val docs = samples.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val base = graft.operators.InvertedIndex(docs.coalesce(1))
      .orderBy("word").collect()
    Seq(3, 17).foreach { p =>
      val other = graft.operators.InvertedIndex(docs.repartition(p))
        .orderBy("word").collect()
      assert(base.sameElements(other), s"differs at repartition($p)")
    }
  }
}
