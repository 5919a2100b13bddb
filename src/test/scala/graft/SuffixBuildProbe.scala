package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (not a spec): phase-times the suffix-rank BUILD at a given
  * SF so a build-shape change can be attributed round by round instead
  * of guessed at from the whole-entry number. Mirrors the structure of
  * [[graft.operators.SuffixRanks.suffixRanks]] (4-char packed base +
  * doubling rounds); keep the two in sync when the build changes.
  *
  * The r21 story this probe decided: a full direct-pack formulation
  * (32 chars -> three longs, two rankByKey passes, no doubling) was
  * measured here at sf0.1 — packing 1.9-7.6 s, first rank pass
  * 7.5-11 s (97% of the distinct table in rank ties), second pass
  * ~28 s, final 3-key join ~27 s — and rejected; the doubling's
  * geometric rounds beat it because the rank-tie machinery dominates
  * when the pair table's v column has few distinct values.
  *
  *   sbt "Test/runMain graft.SuffixBuildProbe [sfDir]"
  */
object SuffixBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      // inline replica of suffixRanks, phase-timed
      val chars = docs
        .select(col("doc_id"),
          array_join(graft.functions.TextOps.words(col("text")), " ")
            .as("s"))
        .filter(length(col("s")) > 0)
        .select(col("doc_id"), posexplode(split(col("s"), "")))
        .filter(length(col("col")) > 0)
        .select(col("doc_id"), (col("pos") + 1).as("pos"),
          ascii(col("col")).cast("long").as("c"))
        .select(col("doc_id"), col("pos"),
          when(col("c") === 32, 1L)
            .when(col("c") >= 97, col("c") - 95)
            .otherwise(0L).as("e"))
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      def leadE(k: Int) =
        if (k == 0) col("e")
        else coalesce(lead(col("e"), k).over(byDoc), lit(0L))
      var t0 = t("base 4-char pack+ckpt")(chars
        .select(col("doc_id"), col("pos"),
          (0 until 4)
            .map(k => leadE(k) * lit(math.pow(32, 3 - k).toLong))
            .reduce(_ + _).as("r"))
        .localCheckpoint())
      val n = t0.count()
      println(s"  n=$n")
      var h = 4
      var done = n == 0L
      while (h < graft.operators.SuffixRanks.PrefixLen && !done) {
        val paired = t(s"h=$h paired+ckpt")(t0
          .withColumn("r2",
            coalesce(lead(col("r"), h).over(byDoc), lit(-1L)))
          .localCheckpoint())
        val dk = paired.select(col("r"), col("r2")).distinct().persist()
        val nd = t(s"h=$h dk distinct+count")(dk.count())
        println(s"  nd=$nd")
        val ranked = graft.operators.Ranks.rankByKey(
          dk, lit(1), col("r"), col("r2"), "nr")
        t0 = t(s"h=$h rank+join+ckpt")(paired
          .join(ranked, Seq("r", "r2"))
          .select(col("doc_id"), col("pos"), col("nr").as("r"))
          .localCheckpoint())
        if (nd == n) done = true
        h *= 2
      }
      graft.Cleanup.fullRelease(spark)
    }
    spark.stop()
  }
}
