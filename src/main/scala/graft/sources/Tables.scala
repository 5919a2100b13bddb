package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All operators take a scale-factor directory (e.g. `/root/testdata/sf0.01`)
  * and read parquet through the DataSource V2 path so Catalyst can push
  * filters and prune columns into the scan. At cluster scale the same calls
  * work against any HDFS/S3 URI — nothing here assumes a local filesystem.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Ingest auto-split (opt-in via `spark.graft.ingest.autosplit`):
    * when a fact table's scan yields far fewer partitions than the
    * session's parallelism — the "one big unsplittable file" ingest
    * case (single-row-group parquet, gzip csv, one giant json) — all
    * per-row map work (regex, hashing, decimal aggregation partials)
    * runs on one core until the first shuffle. The fix is one early
    * repartition by the table's natural key, which costs a shuffle of
    * the COMPACT raw rows and in return parallelizes every downstream
    * map stage; keying (rather than round-robin) keeps results
    * deterministic and lets same-key consumers (windows by doc_id,
    * orderkey joins) absorb the exchange as their own.
    *
    * Off by default: on a production many-file corpus the scan is
    * already parallel and the extra exchange is pure waste. Dimension
    * tables are never split (they broadcast). Bench/Verify/Prof enable
    * it because the driver's testdata is single-row-group parquet.
    *
    * Each table also carries a MINIMUM ROW COUNT below which the split
    * is skipped: the exchange pays for itself only when the serial
    * scan+map time it removes exceeds the shuffle's own cost plus a
    * stage of scheduling overhead, and that break-even point is a row
    * count scaled by the table's per-row work — relational decimal
    * rows cost ~1 us, tokenized text ~50 us/doc, 64-dim vector math
    * ~10 us/row. Below the floor, one core finishes the map work
    * faster than the cluster can shuffle it (measured at sf0.1:
    * splitting 150k orders rows cost the window/upsert queries
    * +0.3-0.5 s each for nothing; splitting 600k lineitem rows saves
    * stats_lineitem ~0.8 s). The ratio is scale-free, so the floors
    * are not sf-tuned — they mark where fixed stage overhead stops
    * dominating.
    */
  private val splitKeys = Map(
    "lineitem" -> ("l_orderkey", 250000L),
    "orders" -> ("o_orderkey", 250000L),
    "events" -> ("user_id", 250000L),
    "documents" -> ("doc_id", 10000L),
    // the O(n^2) similarity self-joins stream this side; keep it split
    // at any size the quadratic term can make expensive
    "embeddings" -> ("vec_id", 0L))

  /** Row groups per parquet path, cached: byte-range split count alone
    * overstates real scan parallelism — a 700 MB single-row-group file
    * splits into ~6 byte ranges at the default maxPartitionBytes, but
    * every row lives in the one split containing the row group, so the
    * other five tasks read nothing. Effective parallelism is bounded by
    * row groups, and that is what the autosplit guard must compare.
    */
  private val footerCache = new StampedCache[String, (Int, Long)]()
  /** (row groups, total rows) from the parquet footers, cached. */
  private def footerStats(spark: SparkSession, path: String): (Int, Long) =
    footerCache.get(path, CorpusStamp.of(spark, path)) {
      val p = path
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = hp.getFileSystem(conf)
        val files =
          if (fs.getFileStatus(hp).isDirectory)
            fs.listStatus(hp).filter(_.getPath.getName.endsWith(".parquet"))
          else Array(fs.getFileStatus(hp))
        var groups = 0
        var rows = 0L
        files.foreach { st =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
          try {
            val blocks = rd.getFooter.getBlocks
            groups += blocks.size
            blocks.forEach(b => rows += b.getRowCount)
          } finally rd.close()
        }
        // zero groups means we found no parquet files at the top level
        // (e.g. a Hive-partitioned dir of subdirectories) — that is
        // "layout unknown", not "zero parallelism"; returning 0 would
        // force a repartition unconditionally
        if (groups == 0) (Int.MaxValue, Long.MaxValue) else (groups, rows)
      } catch { case _: Exception =>
        (Int.MaxValue, Long.MaxValue) // unknown: assume fine
      }
    }
  // The cache is stamp-validated (CorpusStamp): rewriting a file at a
  // cached path invalidates the entry instead of reusing a stale count.

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val auto = spark.conf
      .getOption("spark.graft.ingest.autosplit").contains("true")
    splitKeys.get(name) match {
      case Some((key, minRows)) if auto =>
        val target = spark.sparkContext.defaultParallelism
        val (groups, rows) = footerStats(spark, path)
        // plan-only (no job): the scan's byte-range split count, capped
        // by the number of row groups actually available to read
        val scanParts = math.min(df.rdd.getNumPartitions, groups)
        if (scanParts * 2 <= target && rows >= minRows)
          df.repartition(target, col(key))
        else df
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: nanosecond-precision parquet that Spark's reader only
    * surfaces as a raw Long (spark.sql.legacy.parquet.nanosAsLong — set
    * in every graft session), and naive microsecond timestamps that read
    * as TIMESTAMP_NTZ. Normalize both to microsecond TimestampType so
    * every consumer sees one type: Long converts with integer `div` (a
    * double division would lose precision above 2^53 ns); NTZ casts to
    * the instant type, which is value-preserving because every graft
    * session pins spark.sql.session.timeZone=UTC. Sub-microsecond
    * truncation is harmless downstream: every oracle-checked query
    * compares at second-or-coarser granularity.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** See [[events]]: ns-Long or TIMESTAMP_NTZ `ts` → microsecond
    * TimestampType; already-instant timestamps pass through.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
