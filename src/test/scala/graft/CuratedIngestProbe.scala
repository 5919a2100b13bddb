package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Dev-only: streaming curation ingest vs batch pipeline at a LARGER
  * scale than the spec's sf0.001 (and a different split count) — a
  * manual check that batch-split independence is not an artifact of
  * the small corpus. Run via
  *   sbt "Test/runMain graft.CuratedIngestProbe sf0.01 5"
  */
object CuratedIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Verify.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curated_probe")
      .resolve("snapshot").toString
    val sfDir = s"/root/testdata/$sfName"
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[EventStreams.CDoc].collect()
    // interleaved split (doc_id mod nBatches, descending within) so
    // twins/near-dups land across batches in mixed order
    val batches = (0 until nBatches).map(i =>
      docs.filter(_.doc_id % nBatches == i).sortBy(-_.doc_id))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.CDoc]
    val q = EventStreams.curatedIngest(input.toDF(), dir)
    val t0 = System.nanoTime()
    try {
      batches.foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val got = EventStreams.curatedSnapshot(spark, dir).collect()
    val want = graft.operators.Pipeline.curatedCorpus(spark, sfDir).collect()
    val ok = got.sameElements(want)
    println(f"PROBE $sfName x$nBatches batches: stream ${got.length} rows " +
      f"in $streamSec%.1f s, batch ${want.length} rows, equal=$ok")
    if (!ok) sys.exit(1)
    spark.stop()
  }
}
