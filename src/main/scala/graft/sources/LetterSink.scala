package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's partitioned formatted sink: 26 files `a.txt`..`z.txt`,
  * one line `word:[id id ...]` per word, ordered (doc-count desc, word asc)
  * within each file; all 26 files exist even when empty
  * (`/root/reference/src/tema1.cpp:215-248`, :294-309).
  *
  * Plan shape: hash-repartition by letter (<=26 concurrent writers, the
  * reference's per-letter reducer ranges), sort within partitions by
  * (letter, n_docs desc, word asc) so each partition is a sequence of
  * contiguous per-letter runs, then stream each run to its file from the
  * executor. The driver touches missing letters afterwards — Spark
  * (correctly) never emits empty partitions, but the reference's output
  * contract requires the empty files (tema1.cpp:294-309).
  *
  * On a cluster `outDir` must be a shared filesystem; single-file-per-
  * letter is inherently a 26-way bounded sink, so this is not a wide-
  * output path — it exists for reference-output fidelity, not for scale.
  * The scalable sink is `writePartitioned` (standard partitioned text).
  */
object LetterSink {

  /** index: (word, ids array<long>, n_docs). Writes `<outDir>/<letter>.txt`.
    *
    * Crash-safe: executors stage into a temp subdirectory; the 26 final
    * files are only (re)placed after the job succeeds, so a failed run
    * never clobbers a previous run's valid output.
    */
  def write(index: DataFrame, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val stageDir = Files.createTempDirectory(Paths.get(outDir), ".stage-")
      .toString
    val lines = index
      .withColumn("letter", substring(col("word"), 1, 1))
      .select(
        col("letter"),
        col("n_docs"),
        col("word"),
        format_string("%s:[%s]", col("word"),
          array_join(transform(col("ids"), _.cast("string")), " ")).as("line"))
      .repartition(26, col("letter"))
      .sortWithinPartitions(col("letter"), col("n_docs").desc, col("word").asc)

    try {
      lines.select("letter", "line").foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          var cur: String = null
          var out: BufferedWriter = null
          try {
            rows.foreach { r =>
              val letter = r.getString(0)
              if (letter != cur) {
                if (out != null) out.close()
                cur = letter
                out = new BufferedWriter(
                  new FileWriter(new File(stageDir, s"$letter.txt")))
              }
              out.write(r.getString(1)); out.write("\n")
            }
          } finally if (out != null) out.close()
      }
      // job succeeded: move every produced letter into place, truncate
      // letters absent from this run (all 26 must exist, even empty —
      // the reference's eager-creation contract, tema1.cpp:294-309)
      ('a' to 'z').foreach { c =>
        val staged = Paths.get(stageDir, s"$c.txt")
        val target = Paths.get(outDir, s"$c.txt")
        if (Files.exists(staged))
          Files.move(staged, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else Files.write(target, Array.empty[Byte])
      }
    } finally {
      val d = new File(stageDir)
      Option(d.listFiles()).foreach(_.foreach(_.delete()))
      d.delete()
    }
  }

  /** Scalable variant: standard Spark partitioned text sink
    * (`letter=<x>/part-*.txt` layout) — what you'd actually run at 100 TB.
    */
  def writePartitioned(index: DataFrame, outDir: String): Unit =
    index
      .withColumn("letter", substring(col("word"), 1, 1))
      .withColumn("line", format_string("%s:[%s]", col("word"),
        array_join(transform(col("ids"), _.cast("string")), " ")))
      .repartition(col("letter"))
      .sortWithinPartitions(col("n_docs").desc, col("word").asc)
      .select("letter", "line")
      .write.partitionBy("letter").mode("overwrite").text(outDir)
}
