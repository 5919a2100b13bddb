package graft

import graft.functions.{ScoredEntry, TopKAggregator}
import graft.operators.TextAnalysis

class TopKAggregatorSpec extends SparkTestBase {

  test("merge keeps the k best with deterministic tie-break") {
    val agg = new TopKAggregator(3)
    val a = Seq(ScoredEntry("x", 10), ScoredEntry("y", 5))
    val b = Seq(ScoredEntry("z", 10), ScoredEntry("w", 7), ScoredEntry("v", 1))
    val m = agg.merge(a, b)
    assert(m === Seq(ScoredEntry("x", 10), ScoredEntry("z", 10),
      ScoredEntry("w", 7)))
  }

  test("buffer never exceeds k") {
    val agg = new TopKAggregator(2)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, ScoredEntry(s"p$i", i.toLong)))
    assert(buf.length === 2)
    assert(buf.head.score === 100L)
  }

  test("typed top-k per language matches the window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps

    val got = TextAnalysis.topWordsPerLang(spark, sf("sf0.001")).collect()

    val counts = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("lang"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("word"))
    val want = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("lang"), col("word"), col("n"), col("rank"))
      .orderBy(col("lang"), col("rank")).collect()

    assert(got.sameElements(want))
  }
}
