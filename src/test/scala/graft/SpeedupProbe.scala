package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Subprocess worker for SpeedupGateSpec: runs the named queries on a
  * local[N] session and prints one parseable timing line. A separate
  * main because a JVM holds ONE SparkContext — comparing local[1] vs
  * local[8] wall-clock requires two processes.
  *
  * sf0.1 alone is too small to measure parallelism (every query is
  * fixed-overhead-dominated: measured local[1] ~= local[8]), so the
  * probe first materializes a deterministic `mult`x replication of the
  * sf0.1 documents/embeddings (shifted ids — the ScaleSmoke corpus) and
  * times the queries against THAT. The build is untimed and reused by
  * the second probe via a completion marker.
  *
  *   args: <threads> <dir> <mult> <query>...
  */
object SpeedupProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0)
    val dir = args(1)
    val mult = args(2).toInt
    val queries = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.ingest.autosplit", "true")
      .config("spark.sql.adaptive.enabled",
        sys.props.getOrElse("graft.probe.aqe", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val marker = new java.io.File(dir, "_BUILT")
    if (!marker.exists()) {
      def replicate(table: String, idCol: String): Unit = {
        val base = spark.read.parquet(s"/root/testdata/sf0.1/$table.parquet")
        (0 until mult).map { i =>
          base.withColumn(idCol, col(idCol) + lit(i.toLong * 10000000L))
        }.reduce(_ unionByName _)
          // spread over 16 files so the SCAN parallelism of the timed
          // runs is a property of the corpus, not of which probe
          // (local[1] vs local[8]) happened to build it
          .repartition(16, col(idCol))
          .write.mode("overwrite").parquet(s"$dir/$table.parquet")
      }
      replicate("documents", "doc_id")
      replicate("embeddings", "vec_id")
      replicate("lineitem", "l_orderkey")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    // untimed warmup at the smallest SF: codegen + JIT are serial
    // driver work that would dilute the measured parallel speedup
    queries.foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      Cleanup.dropPersisted(spark)
    }
    val t0 = System.nanoTime()
    queries.foreach { q =>
      val q0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"SPEEDUP_PROBE_Q $q ${(System.nanoTime() - q0) / 1e9}%.3f")
      Cleanup.dropPersisted(spark)
    }
    println(f"SPEEDUP_PROBE_SECONDS ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
