package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketStore, EventStreams}

/** Dev-only: per-Spark-job timing of the curated-ingest batch loop at
  * a given SF dir, to attribute where batch wall-time goes.
  *   sbt "Test/runMain graft.IngestPerfProbe /root/repo/data/sf1 4"
  */
object IngestPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Verify.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val agg = scala.collection.mutable.Map[String, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .map(_.getProperty("spark.job.description",
            js.properties.getProperty("callSite.short", "?"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1000000
          agg.synchronized {
            val (tot, n) = agg.getOrElse(site, (0L, 0))
            agg(site) = (tot + ms, n + 1)
          }
        }
      }
    })
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[EventStreams.CDoc].collect()
    val batches: Seq[Seq[EventStreams.CDoc]] =
      if (sys.env.get("PROBE_SPLIT").contains("mod"))
        (0 until nBatches).map(i =>
          docs.filter(_.doc_id % nBatches == i).sortBy(-_.doc_id).toSeq)
      else docs.sortBy(_.doc_id)
        .grouped((docs.length + nBatches - 1) / nBatches).map(_.toSeq).toSeq
    val width = math.max(1L, (docs.map(_.doc_id).max + 1) / 64)
    val snap = java.nio.file.Files.createTempDirectory("ingest_perf")
      .resolve("snapshot").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.CDoc]
    val q =
      if (sys.env.get("PROBE_SINK").contains("old"))
        OldIngestRef.curatedIngest(input.toDF(), snap)
      else EventStreams.curatedIngest(input.toDF(), snap,
        bucketer = BucketStore.RangeBuckets("doc_id", width))
    val t0 = System.nanoTime()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        val tb = System.nanoTime()
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
        println(f"batch $i: ${(System.nanoTime() - tb) / 1e9}%.1f s")
      }
    } finally q.stop()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    agg.toSeq.sortBy(-_._2._1).take(25).foreach { case (site, (ms, n)) =>
      println(f"$ms%8d ms  x$n%-4d $site")
    }
    spark.stop()
  }
}
