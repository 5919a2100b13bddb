package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: writes `plans/r21/build_suffix_index_{before,after}.txt`
  * — the formatted physical plan of ONE prefix-doubling round of the
  * suffix-rank BUILD, in the r20 shape (1-char ascii base, h = 1,
  * per-round stats aggregate; replicated inline here because the code
  * no longer exists) and the r21 shape (4-char packed base, h = 4, no
  * stats aggregate; the live [[graft.operators.SuffixRanks]] round
  * structure). The build is not itself a registry query (its
  * registry consumers serve the PERSISTED index, so their explains
  * don't show the build), and the real build localCheckpoints between
  * rounds (which truncates lineage in any explain) — so the honest
  * reviewable artifact is one round's un-checkpointed lineage plus
  * the round-count annotation, which is what this emits.
  *
  *   sbt "Test/runMain graft.SuffixPlanDump [sfDir]"
  */
object SuffixPlanDump {
  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val streams = docs.select(col("doc_id"),
        array_join(graft.functions.TextOps.words(col("text")), " ").as("s"))
      .filter(length(col("s")) > 0)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))

    // ---- BEFORE (r20): 1-char ascii base, round h = 1 + stats ----
    val tOld = streams
      .select(col("doc_id"), posexplode(split(col("s"), "")))
      .filter(length(col("col")) > 0)
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        ascii(col("col")).cast("long").as("r"))
    val pairedOld = tOld.withColumn("r2",
      coalesce(lead(col("r"), 1).over(byDoc), lit(-1L)))
    val statsOld = pairedOld.agg(
      count(lit(1)).as("n"),
      count_distinct(struct(col("r"), col("r2"))).as("nd"),
      count_distinct(col("r")).as("ndPrev"))
    val dkOld = pairedOld.select(col("r"), col("r2")).distinct()
    val roundOld = pairedOld
      .join(graft.operators.Ranks.rankByKey(
        dkOld, lit(1), col("r"), col("r2"), "nr"), Seq("r", "r2"))
      .select(col("doc_id"), col("pos"), col("nr").as("r"))
    val before = new StringBuilder
    before.append("# build_suffix_index — BEFORE (r20 shape), one doubling round\n")
    before.append("# 5 rounds total (h = 1, 2, 4, 8, 16), EACH: the round plan below\n")
    before.append("# PLUS the per-round stats aggregate (second plan — note the\n")
    before.append("# Expand from the two count_distincts: 3x corpus rows per round).\n")
    before.append("# Base = raw ascii codes (no packing). Inline replica of the\n")
    before.append("# pre-r21 code (see git history of SuffixRanks.scala).\n\n")
    before.append("## round plan (paired -> distinct -> rankByKey -> join)\n\n")
    before.append(fmt(roundOld))
    before.append("\n\n## per-round stats aggregate (REMOVED in r21)\n\n")
    before.append(fmt(statsOld))

    // ---- AFTER (r21): 4-char packed base, round h = 4, no stats ----
    val chars = streams
      .select(col("doc_id"), posexplode(split(col("s"), "")))
      .filter(length(col("col")) > 0)
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        ascii(col("col")).cast("long").as("c"))
      .select(col("doc_id"), col("pos"),
        when(col("c") === 32, 1L)
          .when(col("c") >= 97, col("c") - 95)
          .otherwise(0L).as("e"))
    def leadE(k: Int): Column =
      if (k == 0) col("e")
      else coalesce(lead(col("e"), k).over(byDoc), lit(0L))
    val tNew = chars.select(col("doc_id"), col("pos"),
      (0 until 4).map(k => leadE(k) * lit(math.pow(32, 3 - k).toLong))
        .reduce(_ + _).as("r"))
    val pairedNew = tNew.withColumn("r2",
      coalesce(lead(col("r"), 4).over(byDoc), lit(-1L)))
    val dkNew = pairedNew.select(col("r"), col("r2")).distinct()
    val roundNew = pairedNew
      .join(graft.operators.Ranks.rankByKey(
        dkNew, lit(1), col("r"), col("r2"), "nr"), Seq("r", "r2"))
      .select(col("doc_id"), col("pos"), col("nr").as("r"))
    val after = new StringBuilder
    after.append("# build_suffix_index — AFTER (r21 shape), one doubling round\n")
    after.append("# 3 rounds total (h = 4, 8, 16): two corpus-sized\n")
    after.append("# window+distinct+rank+join chains REMOVED vs r20. Base = 4-char\n")
    after.append("# base-32 packs built inside the same first window pass (the 3\n")
    after.append("# extra lead() frames are visible in the Window node below). The\n")
    after.append("# per-round stats aggregate (count + 2x count_distinct -> Expand,\n")
    after.append("# 3x corpus rows) is GONE: n counts once on the checkpointed base,\n")
    after.append("# nd is a plain count() of the persisted distinct-pair table.\n")
    after.append("# Matches src/main/scala/graft/operators/SuffixRanks.scala.\n\n")
    after.append("## base pack + round plan (paired -> distinct -> rankByKey -> join)\n\n")
    after.append(fmt(roundNew))
    Files.createDirectories(Paths.get("plans/r21"))
    Files.writeString(Paths.get("plans/r21/build_suffix_index_before.txt"),
      before.toString)
    Files.writeString(Paths.get("plans/r21/build_suffix_index_after.txt"),
      after.toString)
    println("wrote plans/r21/build_suffix_index_{before,after}.txt")
    spark.stop()
  }
}
