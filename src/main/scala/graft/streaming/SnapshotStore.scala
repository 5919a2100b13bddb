package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic snapshot commits for foreachBatch sinks over plain parquet.
  *
  * `mode("overwrite")` deletes the committed data BEFORE the new write
  * starts, so a crash mid-rewrite loses the snapshot entirely — for an
  * upsert sink that is one batch's worth of keys, for the curation
  * ingest it is the whole accumulated corpus (earlier batches are
  * already acknowledged in the stream checkpoint and never replay).
  *
  * This store writes each version into its own generation directory
  * (`<root>/gen=<k>/`) and defines the current snapshot as the HIGHEST
  * generation carrying the parquet job-commit marker (`_SUCCESS`).
  * Older generations are pruned only after the new one is fully
  * durable, so every crash window leaves a committed snapshot
  * readable:
  *
  *  - crash mid-write: `gen=k+1` has no `_SUCCESS`; `gen=k` stays
  *    current and the partial is swept at the next commit;
  *  - crash after the write, before the prune: two committed
  *    generations exist and the max wins; the stale one is pruned at
  *    the next commit.
  *
  * A committed generation is never deleted before its successor is
  * durable — the property `mode("overwrite")` cannot provide. No
  * atomic-rename assumption is made of the filesystem (object stores
  * lack one); only create-then-list visibility, which parquet's job
  * commit already relies on.
  *
  * Compatibility: a root holding parquet files directly WITH a root
  * `_SUCCESS` marker (a snapshot imported from a plain batch writer)
  * is readable; commits always produce the generation layout. A root
  * without any committed generation or marker reads as absent (warned
  * — it is a crashed first write, recoverable only from the source).
  */
object SnapshotStore {

  private val Gen = "gen=(\\d+)".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedGens(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    genDirs(fs, root).filter { case (_, p) =>
      fs.exists(new Path(p, "_SUCCESS"))
    }

  // numeric-only match with an overflow guard: a foreign dir that
  // happens to start with gen= must be ignored, not crash the sink
  private def genDirs(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else
      fs.listStatus(root).toSeq
        .filter(_.isDirectory)
        .flatMap { s =>
          s.getPath.getName match {
            case Gen(k) =>
              scala.util.Try(k.toLong).toOption.map(_ -> s.getPath)
            case _ => None
          }
        }

  /** The current committed snapshot, or None if none was ever
    * committed (first batch, or a crashed-partial first write).
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    if (!fs.exists(rootPath)) None
    else {
      val gens = committedGens(fs, rootPath)
      if (gens.nonEmpty)
        Some(spark.read.parquet(gens.maxBy(_._1)._2.toString))
      else if (fs.exists(new Path(rootPath, "_SUCCESS")))
        Some(spark.read.parquet(root)) // imported flat-layout snapshot
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"SnapshotStore: $root exists but holds no committed " +
            "generation and no _SUCCESS marker (crashed first write); " +
            "treating as absent")
        None
      }
    }
  }

  /** Remove this store's committed monolithic generations — called by
    * [[BucketStore]] once a bucketed successor is durable, so a
    * migrated sink doesn't carry its pre-migration corpus forever.
    * Flat-layout imports (parquet files + `_SUCCESS` directly at the
    * root) are left in place: they are foreign data this store never
    * wrote, and a committed bucketed manifest shadows them on read.
    */
  private[streaming] def pruneLegacy(fs: FileSystem, root: Path): Unit =
    committedGens(fs, root).foreach { case (_, p) => fs.delete(p, true) }

  /** Commit `df` as the next generation, then prune. Ordering is the
    * whole point: sweep partials, WRITE the new generation to
    * durability, only then delete predecessors.
    */
  def commit(df: DataFrame, root: String): Unit = {
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val all = genDirs(fs, rootPath)
    val committed = all.filter { case (_, p) =>
      fs.exists(new Path(p, "_SUCCESS"))
    }.toMap
    // crashed partials: sweep so their indices are free again
    all.collect { case (k, p) if !committed.contains(k) => p }
      .foreach(p => fs.delete(p, true))
    val next = (committed.keys.toSeq :+ -1L).max + 1
    df.write.mode("overwrite")
      .parquet(new Path(rootPath, s"gen=$next").toString)
    committed.foreach { case (k, p) => if (k < next) fs.delete(p, true) }
  }
}
