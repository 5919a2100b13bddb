package graft

import java.nio.file.{Files, Path => JPath, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BucketStore, EventStreams, SnapshotStore}
import graft.streaming.EventStreams.Ev

/** The scale property the bucketed snapshot store exists for: a
  * commit's I/O is bounded by the buckets it touches, never by the
  * corpus — verified on the actual on-disk files, not on timings.
  */
class BucketStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def newRoot(tag: String): String =
    Files.createTempDirectory(tag).resolve("snapshot").toString

  // every parquet data file under root -> last-modified, as the
  // ground truth for "this commit did not rewrite that bucket"
  private def dataFiles(root: String): Map[String, Long] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.contains("/data/") &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap

  private val hash4 = BucketStore.HashBuckets("k", 4)

  test("incremental commit rewrites only the touched buckets' files") {
    val root = newRoot("bucketstore_incr")
    val full = (0L until 64L).map(k => (k, s"v$k")).toDF("k", "v")
    BucketStore.commitAll(full, hash4, root)
    val before = dataFiles(root)
    assert(before.nonEmpty)

    // update ONE key -> exactly one touched bucket
    val oneKey = Seq((7L, "updated")).toDF("k", "v")
    val b7 = oneKey.select(hash4.col.as("b")).as[Long].head()
    val bucketRows = BucketStore
      .readBuckets(spark, root, hash4, Seq(b7)).get
      .filter(col("k") =!= 7L)
      .unionByName(oneKey)
    BucketStore.commit(bucketRows, hash4, Seq(b7), root)

    val after = dataFiles(root)
    // untouched buckets: same files, same mtimes (never rewritten)
    val untouchedBefore = before.filterNot(_._1.contains(s"__gbucket=$b7"))
    val untouchedAfter = after.filterNot(_._1.contains(s"__gbucket=$b7"))
    assert(untouchedBefore === untouchedAfter,
      "an untouched bucket's data file was rewritten or dropped")
    // the touched bucket moved to a new data generation
    assert(after.keys.exists(p =>
        p.contains(s"__gbucket=$b7") && !before.contains(p)),
      "touched bucket was not rewritten")
    // content is the merge result
    val got = BucketStore.read(spark, root).get
      .as[(Long, String)].collect().toMap
    assert(got.size === 64 && got(7L) === "updated" && got(8L) === "v8")
  }

  test("a touched bucket can shrink to empty and drops out of the manifest") {
    val root = newRoot("bucketstore_empty")
    val full = (0L until 16L).map(k => (k, s"v$k")).toDF("k", "v")
    BucketStore.commitAll(full, hash4, root)
    // rewrite bucket of key 3 with NO surviving rows
    val b = Seq(3L).toDF("k").select(hash4.col.as("b")).as[Long].head()
    val keep = BucketStore.readBuckets(spark, root, hash4, Seq(b)).get
      .filter(lit(false))
    BucketStore.commit(keep, hash4, Seq(b), root)
    val got = BucketStore.read(spark, root).get.as[(Long, String)].collect()
    val expected = (0L until 16L).filter(k =>
      BucketStore.HashBuckets("k", 4) match {
        case h => Seq(k).toDF("k").select(h.col.as("b")).as[Long].head() != b
      })
    assert(got.map(_._1).sorted === expected.sorted.toArray)
  }

  test("commit refuses rows outside the declared touched set") {
    val root = newRoot("bucketstore_stray")
    BucketStore.commitAll(Seq((1L, "a")).toDF("k", "v"), hash4, root)
    val strayRows = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    val oneBucket = Seq(1L).toDF("k").select(hash4.col.as("b"))
      .as[Long].head()
    intercept[IllegalArgumentException] {
      BucketStore.commit(strayRows, hash4, Seq(oneBucket), root)
    }
  }

  test("a changed bucketing spec fails loudly instead of splitting keys") {
    val root = newRoot("bucketstore_spec")
    BucketStore.commitAll(Seq((1L, "a")).toDF("k", "v"), hash4, root)
    intercept[IllegalArgumentException] {
      BucketStore.commitAll(Seq((2L, "b")).toDF("k", "v"),
        BucketStore.HashBuckets("k", 8), root)
    }
    intercept[IllegalArgumentException] {
      BucketStore.readBuckets(spark, root,
        BucketStore.RangeBuckets("k", 10L), Seq(0L))
    }
  }

  test("crashed generation and orphaned data dirs are swept, committed state wins") {
    val root = newRoot("bucketstore_crash")
    BucketStore.commitAll(Seq((1L, "a"), (9L, "b")).toDF("k", "v"),
      hash4, root)
    // crash mid-commit: a data dir with no manifest, and a gen dir
    // with a manifest but no _COMMIT
    val rootP = Paths.get(root)
    val orphanData = rootP.resolve("data/g7/__gbucket=0")
    Files.createDirectories(orphanData)
    Files.write(orphanData.resolve("part-0.parquet"), "junk".getBytes)
    val partialGen = rootP.resolve("gen=7")
    Files.createDirectories(partialGen)
    Files.write(partialGen.resolve("manifest"), "junk".getBytes)

    val cur = BucketStore.read(spark, root).get.as[(Long, String)]
      .collect().toMap
    assert(cur === Map(1L -> "a", 9L -> "b"),
      "crash litter changed the committed snapshot")
    BucketStore.commitAll(Seq((1L, "a2"), (9L, "b")).toDF("k", "v"),
      hash4, root)
    val names = Files.list(rootP).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(!Files.exists(partialGen), "crashed gen dir survived the sweep")
    assert(!Files.exists(rootP.resolve("data/g7")),
      "orphaned data dir survived the sweep")
    assert(names.count(_.startsWith("gen=")) === 1,
      s"predecessor generations not pruned: $names")
    val after = BucketStore.read(spark, root).get.as[(Long, String)]
      .collect().toMap
    assert(after === Map(1L -> "a2", 9L -> "b"))
  }

  test("range buckets keep an append-mostly stream's commits append-local") {
    // monotone keys arriving in order: batch 2's keys land in NEW
    // buckets, so batch 1's files must survive untouched — the 100 TB
    // ingest shape (hash bucketing cannot give this: uniform keys
    // touch every bucket every batch)
    val root = newRoot("bucketstore_range")
    val range = BucketStore.RangeBuckets("k", 8L)
    BucketStore.commitAll((0L until 16L).map(k => (k, "old")).toDF("k", "v"),
      range, root)
    val before = dataFiles(root)
    val newRows = (16L until 24L).map(k => (k, "new")).toDF("k", "v")
    BucketStore.commit(newRows, range, Seq(2L), root)
    val after = dataFiles(root)
    assert(before.forall { case (p, t) => after.get(p).contains(t) },
      "appending new key ranges rewrote old buckets")
    assert(BucketStore.read(spark, root).get.count() === 24L)
  }

  test("upsert sink migrates a legacy monolithic snapshot into buckets once") {
    implicit val sqlCtx = spark.sqlContext
    val root = newRoot("bucketstore_migrate")
    // a pre-upgrade snapshot in SnapshotStore's monolithic layout
    SnapshotStore.commit(
      Seq((10L, 1L, 100L), (20L, 2L, 200L))
        .toDF("event_id", "user_id", "sec"), root)
    val input = MemoryStream[Ev]
    val q = EventStreams.upsertSink(
      input.toDS().select(col("event_id"), col("user_id"), col("sec")),
      root)
    try {
      input.addData(Ev(3L, 30L, 300L), Ev(1L, 10L, 150L))
      q.processAllAvailable()
    } finally q.stop()
    val snap = EventStreams.readSnapshot(spark, root)
      .select("event_id", "sec").as[(Long, Long)].collect().toMap
    assert(snap === Map(10L -> 150L, 20L -> 200L, 30L -> 300L),
      s"migration lost or mangled keys: $snap")
    assert(BucketStore.isBucketed(spark, root),
      "post-migration snapshot is not bucketed")
    // the monolithic generation is gone; later batches are incremental
    val names = Files.list(Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(names.count(_.startsWith("gen=")) === 1, s"layout litter: $names")
  }

  test("curated ingest on the bucketed layout leaves untouched buckets' files alone") {
    implicit val sqlCtx = spark.sqlContext
    val root = newRoot("bucketstore_ingest_incr")
    // width 100: each doc batch below lands in its own bucket range
    val range = BucketStore.RangeBuckets("doc_id", 100L)
    def doc(id: Long, text: String) = EventStreams.CDoc(id, "en", text)
    val input = MemoryStream[EventStreams.CDoc]
    val q = EventStreams.curatedIngest(input.toDF(), root, bucketer = range)
    try {
      input.addData(
        doc(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        doc(2L, "one two three four five six seven eight nine ten"))
      q.processAllAvailable()
      val before = dataFiles(root)
      assert(before.nonEmpty)
      // a second batch in a DISJOINT id range with no near-dups: the
      // first batch's bucket files must not be rewritten
      input.addData(
        doc(201L, "red orange yellow green blue indigo violet pink black white"))
      q.processAllAvailable()
      val after = dataFiles(root)
      assert(before.forall { case (p, t) => after.get(p).contains(t) },
        "an append-only ingest batch rewrote prior buckets")
      // a near-dup with a HIGHER id is tombstoned in its own bucket
      input.addData(
        doc(301L, "alpha beta gamma delta epsilon zeta eta theta iota pi"))
      q.processAllAvailable()
      // and a near-dup with a LOWER id knocks out an already-admitted
      // doc in a bucket this batch's own rows never touch — the
      // victim-bucket (extraBuckets) path
      input.addData(
        doc(5L, "red orange yellow green blue indigo violet pink black grey"))
      q.processAllAvailable()
      val out = EventStreams.readSnapshot(spark, root)
        .select("doc_id", "out").as[(Long, Boolean)].collect().toMap
      assert(out === Map(1L -> false, 2L -> false, 5L -> false,
        201L -> true, 301L -> true),
        s"cross-bucket knockout failed: $out")
    } finally q.stop()
  }
}
