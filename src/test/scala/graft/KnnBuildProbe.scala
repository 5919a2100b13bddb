package graft

import org.apache.spark.sql.SparkSession

/** Manual probe: where does the sqrt(N)-cell centroid build spend its
  * time at a given SF? Not a test — run with
  * `Test/runMain graft.KnnBuildProbe <sfDir>`.
  */
object KnnBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val k = t("autoCells") {
      graft.operators.Similarity.autoCells(spark, sfDir)
    }
    println(s"PROBE k = $k")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val init = t("scalableInitCentroids") {
      graft.operators.Ivf.scalableInitCentroids(emb, k)
    }
    println(s"PROBE init size = ${init.size}")
    t("cachedCentroids(k,0)") {
      graft.operators.Ivf.cachedCentroids(spark, sfDir, k, 0).count()
    }
    spark.stop()
  }
}
