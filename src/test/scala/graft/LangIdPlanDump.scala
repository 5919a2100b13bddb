package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: writes `plans/r21/lang_id_learned_{before,after}.txt` —
  * the formatted plan of the one subtree the r21 change moved:
  * `langScores`' zero-init probs table. The query's FINAL plan is
  * unchanged (the probs table feeds the weight-checkpoint lineage, so
  * it never appears in the top-level explain), which is why the
  * artifact is the subtree itself. BEFORE: distinct over the K-fold
  * feature table (K x rows into the exchange). AFTER: distinct over
  * the base table (1/K the rows) + a broadcast K-row label attach —
  * the same output rows, bit-identical training.
  *
  *   sbt "Test/runMain graft.LangIdPlanDump [sfDir]"
  */
object LangIdPlanDump {
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
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val base = graft.operators.QualityClassifier
      .probeBaseFeatures(docs, 1024)
    val langs = docs.select(col("lang")).distinct().orderBy(col("lang"))
      .collect().map(_.getString(0)).toSeq
    val feat = base
      .crossJoin(broadcast(langs.toDF("tgt")))
      .withColumn("y",
        when(col("lang") === col("tgt"), 1.0).otherwise(0.0))
      .drop("lang")
    // BEFORE (r20 shape): distinct over the K-fold-replicated table
    val probsBefore = feat.select(col("tgt"), col("doc_id"), col("y"))
      .distinct().withColumn("p", lit(0.5))
    // AFTER (r21 shape): distinct over base (1/K rows) + label attach
    val probsAfter = base.select(col("doc_id"), col("lang")).distinct()
      .crossJoin(broadcast(langs.toDF("tgt")))
      .select(col("tgt"), col("doc_id"),
        when(col("lang") === col("tgt"), 1.0).otherwise(0.0).as("y"))
      .withColumn("p", lit(0.5))
    val hdr = "# lang_id_learned — epoch-0 probs subtree (the r21 change;\n" +
      "# the query's final plan is unchanged because this feeds the\n" +
      "# weight-checkpoint lineage). Same (tgt, doc_id, y, p) rows both\n" +
      "# ways — the diff is WHICH table the distinct shuffles: the\n" +
      "# K-fold-replicated feature table (before) vs the base table at\n" +
      "# 1/K the rows (after), guide §2.3 shuffle-fewer-bytes.\n\n"
    Files.createDirectories(Paths.get("plans/r21"))
    Files.writeString(Paths.get("plans/r21/lang_id_learned_before.txt"),
      hdr + "## BEFORE: distinct over the K-fold table\n\n" +
        fmt(probsBefore))
    Files.writeString(Paths.get("plans/r21/lang_id_learned_after.txt"),
      hdr + "## AFTER: distinct over base + broadcast label attach\n\n" +
        fmt(probsAfter))
    println("wrote plans/r21/lang_id_learned_{before,after}.txt")
    spark.stop()
  }
}
