package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: times each named query three times (cold +
  * two warm runs) against a scale-factor dir, separating plan/codegen
  * overhead from steady-state execution. Usage:
  *
  *   sbt "runMain graft.Prof [sfDir] [query...]"
  *
  * Defaults to all registered queries at sf0.1.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.ingest.autosplit", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Cleanup.dropPersisted(spark)
        dt
      }
      println(f"PROF $q%-22s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
