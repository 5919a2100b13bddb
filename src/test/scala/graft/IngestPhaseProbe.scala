package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.streaming.{BucketStore, EventStreams}

/** Dev-only: per-phase wall-time breakdown of the write_curated_ingest
  * bench workload (contiguous-id batches, range buckets), to attribute
  * regressions to a phase instead of guessing. Run via
  *   sbt "Test/runMain graft.IngestPhaseProbe sf0.1 4"
  */
object IngestPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Verify.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val jobStart = scala.collection.mutable.Map[Int, (String, Long)]()
    val byPhase = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(0.0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("unlabeled")
        jobStart(j.jobId) = (d, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (d, t0) =>
          byPhase(d) = byPhase(d) + (System.nanoTime() - t0) / 1e9
        }
    })

    val sfDir = s"/root/testdata/$sfName"
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[EventStreams.CDoc].collect()
    val batches = docs.sortBy(_.doc_id)
      .grouped((docs.length + nBatches - 1) / nBatches).toSeq
    val width = math.max(1L, (docs.map(_.doc_id).max + 1) / 64)
    for (iter <- 1 to 2) {
      byPhase.clear()
      val snap = java.nio.file.Files
        .createTempDirectory("graft_ingest_phase").resolve("snapshot").toString
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreams.CDoc]
      val q = EventStreams.curatedIngest(input.toDF(), snap,
        bucketer = BucketStore.RangeBuckets("doc_id", width))
      val t0 = System.nanoTime()
      try {
        batches.foreach { b =>
          input.addData(b.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"TOTAL[$iter] $total%.2f s over $nBatches batches (${docs.length} docs)")
      byPhase.toSeq.sortBy(-_._2).filter(_._2 > 0.05).foreach { case (d, s) =>
        println(f"  $s%7.2f s  $d")
      }
    }
    spark.stop()
  }
}
