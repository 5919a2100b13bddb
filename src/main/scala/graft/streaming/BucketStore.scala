package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned snapshot store: the incremental successor to
  * [[SnapshotStore]] for foreachBatch sinks whose per-batch UPDATE is
  * small relative to the accumulated snapshot.
  *
  * [[SnapshotStore]] commits are atomic but monolithic — every commit
  * rewrites the whole snapshot, so a long-lived stream pays
  * O(corpus) of write per micro-batch no matter how small the batch
  * (the round-12 scale audit measured this as the single largest term
  * in the engine: 33.7 s/batch at sf1, growing linearly in snapshot
  * size and unboundedly in batch count). This store shards the
  * snapshot into key-buckets and lets a commit rewrite ONLY the
  * buckets a batch touched, while a tiny manifest generation keeps
  * the multi-bucket update atomic:
  *
  * {{{
  *   <root>/data/g<k>/__gbucket=<b>/part-*.parquet   bucket data (immutable)
  *   <root>/gen=<k>/manifest                         bucket -> data dir map
  *   <root>/gen=<k>/_COMMIT                          commit marker (written last)
  * }}}
  *
  * The current snapshot is the HIGHEST generation carrying `_COMMIT`;
  * its manifest maps every non-empty bucket to the data directory
  * holding that bucket's rows — touched buckets point into the
  * generation's own `data/g<k>`, untouched buckets keep pointing at
  * the older data directory that last wrote them. Commit ordering
  * mirrors SnapshotStore: sweep crashed partials, write the new
  * bucket data to durability (parquet job `_SUCCESS`), write the
  * manifest, create `_COMMIT`, and only then prune predecessors — so
  * every crash window leaves a committed snapshot readable and no
  * committed generation is ever deleted before its successor is
  * durable. No atomic rename is assumed (object stores lack one);
  * only create-then-list visibility, as with parquet's own job
  * commit. Single writer assumed, as for SnapshotStore (foreachBatch
  * runs batches serially).
  *
  * Bucketing is a pure function of a key column, chosen per sink via
  * [[Bucketer]] and recorded in every manifest — a restart with a
  * different bucketing fails loudly instead of silently splitting
  * keys across incompatible layouts:
  *
  *  - [[HashBuckets]]: uniform, fixed bucket count. Right when batch
  *    keys cluster poorly anyway or the key space is unbounded and
  *    unordered. A batch whose keys are uniform over the key space
  *    touches min(|batch|, n) buckets — incrementality then comes
  *    only from batches smaller than the bucket count.
  *  - [[RangeBuckets]]: `key div width`, for monotone keys (doc ids,
  *    event ids assigned at arrival). An append-mostly stream lands
  *    new rows in the tail bucket(s) and only sparse updates
  *    (tombstones, replacements) touch old buckets, so the write per
  *    batch is O(batch), not O(corpus) — the shape a 100 TB ingest
  *    needs. Width is a deployment knob: pick it so one bucket's rows
  *    are a sane parquet file (hundreds of MB), from the known id
  *    density. Keys must be non-negative (`div` truncates toward
  *    zero).
  *
  * Scale note: the manifest is one small line-per-bucket text file
  * and the per-commit metadata work is O(buckets touched) plus one
  * directory listing — nothing here scales with corpus size except
  * the immutable bucket data itself.
  */
object BucketStore {

  /** Pure key -> bucket function, serialized into the manifest. */
  sealed trait Bucketer {
    def keyCol: String
    /** Bucket id column, evaluated against a frame carrying keyCol. */
    def col: Column
    def spec: String
  }

  final case class HashBuckets(keyCol: String, n: Int) extends Bucketer {
    require(n > 0, s"bucket count must be positive: $n")
    def col: Column =
      pmod(xxhash64(org.apache.spark.sql.functions.col(keyCol)), lit(n.toLong))
    def spec: String = s"hash:$n:$keyCol"
  }

  /** Range buckets for non-negative monotone keys. */
  final case class RangeBuckets(keyCol: String, width: Long) extends Bucketer {
    require(width > 0, s"bucket width must be positive: $width")
    // integer div (not double /): exact for the full long range
    def col: Column = expr(s"CAST(`$keyCol` DIV ${width}L AS BIGINT)")
    def spec: String = s"range:$width:$keyCol"
  }

  private val GenRe = "gen=(\\d+)".r
  private val DataRe = "g(\\d+)".r
  private val Header = "graft-bucket-manifest-v1"

  final case class Manifest(gen: Long, spec: String,
      buckets: Map[Long, String])

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def genDirs(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else
      fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { s =>
        s.getPath.getName match {
          case GenRe(k) =>
            scala.util.Try(k.toLong).toOption.map(_ -> s.getPath)
          case _ => None
        }
      }

  // a generation is committed iff its _COMMIT marker exists; legacy
  // SnapshotStore generations carry _SUCCESS instead, so the two
  // layouts can never be confused even under the same root
  private def committedGens(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    genDirs(fs, root).filter { case (_, p) =>
      fs.exists(new Path(p, "_COMMIT"))
    }

  private def readManifestFile(fs: FileSystem, gen: Long, dir: Path)
      : Manifest = {
    val in = fs.open(new Path(dir, "manifest"))
    val text =
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    require(lines.headOption.contains(Header),
      s"unrecognized manifest header in $dir")
    val spec = lines(1).stripPrefix("spec\t")
    val buckets = lines.drop(2).map { l =>
      val Array(b, rel) = l.split("\t", 2)
      b.toLong -> rel
    }.toMap
    Manifest(gen, spec, buckets)
  }

  /** Manifest of the current committed generation, if any. */
  def currentManifest(spark: SparkSession, root: String): Option[Manifest] = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val gens = committedGens(fs, rootPath)
    if (gens.isEmpty) None
    else {
      val (k, p) = gens.maxBy(_._1)
      Some(readManifestFile(fs, k, p))
    }
  }

  /** True iff `root` holds a committed bucketed snapshot. */
  def isBucketed(spark: SparkSession, root: String): Boolean =
    currentManifest(spark, root).isDefined

  /** The current snapshot: bucketed layout if committed here, else
    * the legacy [[SnapshotStore]] layouts (monolithic generations or
    * an imported flat `_SUCCESS` snapshot) — so a sink upgraded
    * mid-stream still reads its pre-upgrade corpus.
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentManifest(spark, root) match {
      case Some(m) =>
        val paths = m.buckets.values.toSeq.sorted
          .map(rel => new Path(root, rel).toString)
        Some(spark.read.parquet(paths: _*))
      case None => SnapshotStore.read(spark, root)
    }

  /** Pruned read of just `buckets` — the partition-pruning that makes
    * per-batch merges O(touched), not O(corpus). None when none of
    * the requested buckets holds rows. Requires a bucketed snapshot
    * (callers handle legacy/absent roots explicitly, because a
    * filtered legacy read could silently drop the rest of the corpus
    * at the next commit).
    */
  def readBuckets(spark: SparkSession, root: String, bucketer: Bucketer,
      buckets: Seq[Long]): Option[DataFrame] = {
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(
        s"readBuckets on a non-bucketed root: $root"))
    require(m.spec == bucketer.spec,
      s"bucketing mismatch at $root: committed '${m.spec}' vs " +
        s"requested '${bucketer.spec}'")
    val paths = buckets.distinct.sorted.flatMap(m.buckets.get)
      .map(rel => new Path(root, rel).toString)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Commit `rows` as the full new content of exactly the `touched`
    * buckets; every other bucket carries over from the current
    * manifest untouched (and unread, and unwritten). A touched bucket
    * with no row in `rows` becomes empty. Caller contract: `rows`
    * holds ALL surviving rows of every touched bucket and nothing
    * else — [[commitAll]] is the variant for full rewrites.
    */
  def commit(rows: DataFrame, bucketer: Bucketer, touched: Seq[Long],
      root: String): Unit =
    doCommit(rows, bucketer, Some(touched.distinct), root)

  /** Commit `rows` as the ENTIRE snapshot (first write, or a one-time
    * migration of a legacy monolithic snapshot into buckets).
    */
  def commitAll(rows: DataFrame, bucketer: Bucketer, root: String): Unit =
    doCommit(rows, bucketer, None, root)

  private def doCommit(rows: DataFrame, bucketer: Bucketer,
      touched: Option[Seq[Long]], root: String): Unit = {
    val spark = rows.sparkSession
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val prev = currentManifest(spark, root)
    prev.foreach { m =>
      require(m.spec == bucketer.spec,
        s"bucketing mismatch at $root: committed '${m.spec}' vs " +
          s"new '${bucketer.spec}' — a changed bucketing would split " +
          "keys across incompatible layouts")
    }
    // sweep crashed partials: generation dirs without _COMMIT, data
    // dirs referenced by NO committed manifest. Committed state is
    // never touched here.
    val committed = committedGens(fs, rootPath)
    val referenced: Set[String] = committed.flatMap { case (k, p) =>
      readManifestFile(fs, k, p).buckets.values.map(rel =>
        rel.split("/")(1)) // data/g<k>/__gbucket=b -> g<k>
    }.toSet
    genDirs(fs, rootPath)
      .filterNot { case (_, p) => fs.exists(new Path(p, "_COMMIT")) }
      // legacy SnapshotStore generations (committed via _SUCCESS) are
      // left alone: the migration caller reads them through read()
      // and the new bucketed generation supersedes them logically;
      // they are pruned below only after the bucketed commit is durable
      .filterNot { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
      .foreach { case (_, p) => fs.delete(p, true) }
    val dataRoot = new Path(rootPath, "data")
    val dataDirs: Seq[(Long, Path)] =
      if (!fs.exists(dataRoot)) Seq.empty
      else fs.listStatus(dataRoot).toSeq.filter(_.isDirectory).flatMap { s =>
        s.getPath.getName match {
          case DataRe(k) =>
            scala.util.Try(k.toLong).toOption.map(_ -> s.getPath)
          case _ => None
        }
      }
    dataDirs
      .filterNot { case (_, p) => referenced.contains(p.getName) }
      .foreach { case (_, p) => fs.delete(p, true) }
    // next index: above every generation (committed or legacy) and
    // every surviving data dir, so names never collide
    val next = ((genDirs(fs, rootPath).map(_._1) ++
      dataDirs.filter { case (_, p) => referenced.contains(p.getName) }
        .map(_._1)) :+ -1L).max + 1
    // bucket data write: repartition by bucket so each bucket lands in
    // one file (plus the cluster's empty tasks), sized by the batch —
    // this shuffle moves only the touched rows, never the corpus
    val staged = new Path(dataRoot, s"g$next")
    rows.withColumn("__gbucket", bucketer.col)
      .repartition(org.apache.spark.sql.functions.col("__gbucket"))
      .write.partitionBy("__gbucket").mode("overwrite")
      .parquet(staged.toString)
    val written: Map[Long, String] =
      fs.listStatus(staged).toSeq.filter(_.isDirectory).flatMap { s =>
        val name = s.getPath.getName // __gbucket=<b>
        scala.util.Try(name.stripPrefix("__gbucket=").toLong).toOption
          .map(_ -> s"data/g$next/$name")
      }.toMap
    val entries: Map[Long, String] = touched match {
      case None => written
      case Some(t) =>
        val stray = written.keySet -- t.toSet
        require(stray.isEmpty,
          s"commit wrote buckets outside the touched set: $stray — the " +
            "caller's touched list must cover every row it passes")
        prev.map(_.buckets).getOrElse(Map.empty) -- t ++ written
    }
    require(entries.nonEmpty,
      "refusing to commit an empty snapshot: these sinks only ever " +
        "grow or update rows (tombstones are retained), so an empty " +
        "result means a caller bug, and an empty manifest would make " +
        "the snapshot schema unreadable")
    // manifest, then the commit marker — create-then-list visibility
    // is the only filesystem property relied on
    val genDir = new Path(rootPath, s"gen=$next")
    fs.mkdirs(genDir)
    val manifestText = (Seq(Header, s"spec\t${bucketer.spec}") ++
      entries.toSeq.sortBy(_._1).map { case (b, rel) => s"$b\t$rel" })
      .mkString("", "\n", "\n")
    val out = fs.create(new Path(genDir, "manifest"), true)
    try out.write(manifestText.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.create(new Path(genDir, "_COMMIT"), true).close()
    // prune only now: predecessors (bucketed AND legacy monolithic)
    // and data dirs the new manifest no longer references
    committed.foreach { case (k, p) => if (k < next) fs.delete(p, true) }
    SnapshotStore.pruneLegacy(fs, rootPath)
    val live: Set[String] = entries.values.map(_.split("/")(1)).toSet
    (dataDirs.map(_._2) :+ staged).distinct
      .filterNot(p => live.contains(p.getName))
      .foreach(p => fs.delete(p, true))
  }
}
