package graft
import org.apache.spark.sql.SparkSession
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      // match Bench's ingest config so probe timings are comparable
      // (flip with -Dgraft.probe.autosplit=false to isolate its cost)
      .config("spark.graft.ingest.autosplit",
        sys.props.getOrElse("graft.probe.autosplit", "true"))
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
      fn(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
