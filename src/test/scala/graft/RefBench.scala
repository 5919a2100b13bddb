package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Head-to-head against the reference engine on its OWN corpus (355
  * files, 6.4 MB): full pipeline = manifest read -> inverted index ->
  * 26-letter-file sink. Prints cold (includes first-plan codegen) and
  * warm timings.
  *
  *   sbt "Test/runMain graft.RefBench"
  */
object RefBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val manifest = "/root/reference/checker/test.txt"
    (1 to 3).foreach { i =>
      val out = Files.createTempDirectory(s"refbench$i").toString
      val t0 = System.nanoTime()
      val docs = graft.sources.TextCorpus.fromManifest(spark, manifest)
      graft.sources.LetterSink.write(
        graft.operators.InvertedIndex(docs), out)
      println(f"run$i (manifest->index->26 files): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
