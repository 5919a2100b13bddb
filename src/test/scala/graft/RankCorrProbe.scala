package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for rank_corr's first-run-at-scale cost.
  * Times each stage of the avgRank2Kinds chain separately, twice, so
  * the one-time cost can be attributed to a stage. Not a test; run via
  *   sbt "Test/runMain graft.RankCorrProbe"
  */
object RankCorrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.ingest.autosplit", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def time[A](label: String)(f: => A): A = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $label%-28s $dt%.2f s  gc=${(gcMillis() - g0) / 1000.0}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = graft.sources.Tables.lineitem(spark, dir)
    (1 to 4).foreach { round =>
      println(s"--- round $round")
      val vals = li.select(explode(array(
          struct(lit(0).as("kind"), col("l_quantity").as("v")),
          struct(lit(1).as("kind"), col("l_extendedprice").as("v"))))
        .as("kv"))
        .select(col("kv.kind").as("kind"), col("kv.v").as("v"))
      val dist = vals.groupBy(col("kind"), col("v"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      time("dist materialize")(dist.count())
      val nB = 32
      val probs = (1 until nB).map(i => i.toDouble / nB).mkString(",")
      val splits = dist.groupBy(col("kind"))
        .agg(expr(s"percentile_approx(v, array($probs), 1000)").as("splits"))
      time("splits (percentile_approx)")(noop(splits))
      val bucketed = dist.join(broadcast(splits), Seq("kind"))
        .withColumn("bucket", expr("size(filter(splits, s -> s < v))"))
        .drop("splits")
      time("bucketed (HOF filter)")(noop(bucketed))
      time("full rank_corr")(noop(
        graft.operators.Analytics.rankCorr(spark, dir)))
      Cleanup.dropPersisted(spark)
      time("full rank_corr again")(noop(
        graft.operators.Analytics.rankCorr(spark, dir)))
      Cleanup.dropPersisted(spark)
    }
    spark.stop()
  }
}
