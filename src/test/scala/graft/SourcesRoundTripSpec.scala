package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink round-trips: every format the engine claims must write
  * and re-read losslessly (schema pinned on read — inference is for
  * exploration, not pipelines).
  */
class SourcesRoundTripSpec extends SparkTestBase {

  private def nationDf = graft.sources.Tables.nation(spark, sf("sf0.001"))
    .orderBy("n_nationkey")

  test("parquet round-trip") {
    val dir = Files.createTempDirectory("rt-parquet").toString
    nationDf.write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).orderBy("n_nationkey").collect()
      .sameElements(nationDf.collect()))
  }

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("rt-csv").toString
    nationDf.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(nationDf.schema)
      .option("header", "true").csv(dir)
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(nationDf.collect()))
  }

  test("json round-trip with explicit schema") {
    val dir = Files.createTempDirectory("rt-json").toString
    nationDf.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nationDf.schema).json(dir)
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(nationDf.collect()))
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("rt-orc").toString
    nationDf.write.mode("overwrite").orc(dir)
    assert(spark.read.orc(dir).orderBy("n_nationkey").collect()
      .sameElements(nationDf.collect()))
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = Files.createTempDirectory("rt-part").toString
    graft.sources.Tables.orders(spark, sf("sf0.001"))
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("status") === "F")
    // partition pruning: the scan must touch only the status=F directory
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(one.count() > 0)
    assert(!scanned.contains("status=O"), "read did not prune partitions")
  }

  test("binaryFile source ingests raw media files with metadata columns") {
    // the ingestion path for real multimodal payloads: files on
    // storage -> (path, modificationTime, length, content) rows, with
    // a pathGlobFilter predicate so only the wanted kind is read
    val dir = Files.createTempDirectory("rt-bin")
    val payloads = Seq("a" -> Array[Byte](1, 2, 3, 4),
      "b" -> Array[Byte](5, 6), "c" -> Array[Byte](7))
    payloads.foreach { case (name, bytes) =>
      Files.write(dir.resolve(s"$name.img"), bytes)
    }
    Files.write(dir.resolve("skip.txt"), Array[Byte](9))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .load(dir.toString)
    assert(df.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val got = df.select(
      element_at(split(col("path"), "/"), -1).as("f"),
      col("length"), col("content"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Array[Byte]](2).toSeq))
      .toMap
    assert(got === payloads.map { case (n, b) =>
      s"$n.img" -> ((b.length.toLong, b.toSeq)) }.toMap,
      "binary content or glob filtering diverged")
  }

  test("ingest autosplit repartitions fact tables only when enabled") {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collectFirst {
        case r: RepartitionByExpression => r }.nonEmpty
    val conf = "spark.graft.ingest.autosplit"
    try {
      // default off: the plan is a bare scan (plan-shape specs rely on it)
      assert(!hasRepartition(
        graft.sources.Tables.documents(spark, sf("sf0.001"))))
      spark.conf.set(conf, "true")
      // single-row-group testdata + local[4]: scanParts(1)*2 <= 4, and
      // embeddings carries a zero row floor — must be repartitioned
      assert(hasRepartition(
        graft.sources.Tables.embeddings(spark, sf("sf0.001"))),
        "fact table with a degenerate layout must be repartitioned")
      // below the per-table row floor the split is SKIPPED even with a
      // degenerate layout: 50 docs of serial map work finish before an
      // exchange could pay for itself (sf0.001 documents << 10k floor)
      assert(!hasRepartition(
        graft.sources.Tables.documents(spark, sf("sf0.001"))),
        "sub-floor table must not pay the split exchange")
      // dimension tables never split (they broadcast)
      assert(!hasRepartition(
        graft.sources.Tables.nation(spark, sf("sf0.001"))))
      // results are identical either way
      val on = graft.sources.Tables.documents(spark, sf("sf0.001"))
        .select("doc_id").collect().map(_.getLong(0)).sorted
      spark.conf.set(conf, "false")
      val off = graft.sources.Tables.documents(spark, sf("sf0.001"))
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(on.sameElements(off))
    } finally spark.conf.unset(conf)
  }

  test("letter-partitioned text sink (scalable layout)") {
    val dir = Files.createTempDirectory("rt-letter").toString
    graft.sources.LetterSink.writePartitioned(
      graft.operators.InvertedIndex(
        graft.sources.Tables.documents(spark, sf("sf0.001"))), dir)
    val back = spark.read.text(s"$dir/letter=s")
    assert(back.count() > 0)
  }
}
