package graft

/** Dev-only: is approxStats byte-stable across re-runs in one session?
  * The estimate-crosses-as-data oracle pattern re-executes the query
  * for the aux export, so the exported values must match the main
  * dump's run for run. HLL legs are per-register maxes (merge-order
  * independent by construction); percentile_approx merges
  * QuantileSummaries in partial-arrival order, so this probes whether
  * that wobbles in practice. Run via
  *   sbt "Test/runMain graft.ApproxStabilityProbe"
  */
object ApproxStabilityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Verify.session()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = (1 to 15).map { _ =>
      graft.operators.Relational.approxStats(spark, dir)
        .collect().map(_.toString).mkString("|")
    }
    println(s"STABLE=${runs.distinct.size == 1} distinct=${runs.distinct.size}")
    runs.distinct.foreach(println)
    spark.stop()
  }
}
