package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-style corpus ingestion (`/root/reference/src/tema1.cpp`
  * :324-364): a manifest file holds a count `n` then `n` file paths
  * (relative to the manifest's directory); each file becomes one document
  * with a STABLE 1-based doc_id = its manifest position (assigned before
  * any size-based scheduling, tema1.cpp:353).
  *
  * Only the manifest (metadata, tiny) is read on the driver; file CONTENT
  * is read by executors via Spark's wholetext reader, so the corpus never
  * materializes in driver memory (unlike the reference, which slurps
  * everything into one process). IDs come from a broadcast path->id join,
  * not from collect.
  */
object TextCorpus {

  def fromManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    val mdir = Paths.get(manifestPath).toAbsolutePath.getParent
    val lines = Files.readAllLines(Paths.get(manifestPath)).asScala.toSeq
    val n = lines.head.trim.toInt
    val paths = lines.slice(1, n + 1).map(p => mdir.resolve(p.trim).normalize)

    import spark.implicits._
    val ids = paths.zipWithIndex
      .map { case (p, i) => (p.toUri.toString, (i + 1).toLong) }
      .toDF("uri", "doc_id")

    spark.read.option("wholetext", "true")
      .text(paths.map(_.toString): _*)
      .withColumn("uri", input_file_name())
      .join(broadcast(ids), Seq("uri"))
      .select(col("doc_id"), col("value").as("text"))
  }
}
