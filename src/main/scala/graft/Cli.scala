package graft

import org.apache.spark.sql.SparkSession

/** Drop-in replacement for the reference engine's CLI
  * (`./tema1 <mappers> <reducers> <input_manifest>`,
  * /root/reference/src/tema1.cpp:257): same arguments, same output
  * contract — 26 files `a.txt`..`z.txt` in the working directory (or
  * GRAFT_OUT_DIR), each line `word:[id id ...]`, ordered by
  * (doc-count desc, word asc), empty letters still present.
  *
  * mappers/reducers map onto Spark's equivalents: local parallelism =
  * mappers + reducers (the reference's total thread count) and shuffle
  * partitions = reducers. The output is identical for ANY (M, R) —
  * the reference checker's core determinism requirement.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val parsed = if (args.length == 3)
      (args(0).toIntOption, args(1).toIntOption) else (None, None)
    val (mappers, reducers) = parsed match {
      case (Some(m), Some(r)) if m > 0 && r > 0 => (m, r)
      case _ =>
        System.err.println("usage: graft.Cli <mappers> <reducers> <manifest>")
        sys.exit(1)
    }
    val outDir = sys.env.getOrElse("GRAFT_OUT_DIR",
      System.getProperty("user.dir"))
    val spark = SparkSession.builder()
      .master(s"local[${math.max(1, mappers + reducers)}]")
      .config("spark.sql.shuffle.partitions", math.max(1, reducers))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = sources.TextCorpus.fromManifest(spark, args(2))
      sources.LetterSink.write(operators.InvertedIndex(docs), outDir)
    } finally spark.stop()
  }
}
