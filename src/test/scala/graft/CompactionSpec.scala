package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.CDoc

/** Posting-table compaction for the streaming curation ingest: the
  * fold must be invisible to every future query (compacted ==
  * uncompacted, for the same batches), keep tombstoned docs'
  * load-bearing grams, drop evicted docs' stale grams, and bound the
  * partition count that the per-batch history scan pays for.
  */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def committedPartitions(path: String): Seq[String] = {
    val root = Paths.get(path + "_postings")
    if (!Files.exists(root)) Seq.empty
    else Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("batch=") &&
        Files.exists(p.resolve("_SUCCESS")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  private def runBatches(dir: String,
      batches: Seq[Seq[CDoc]],
      compactAfterEach: Boolean,
      compactEvery: Int = 16): Unit = {
    implicit val sqlCtx = spark.sqlContext
    batches.foreach { b =>
      val input = MemoryStream[CDoc]
      val q = EventStreams.curatedIngest(input.toDF(), dir,
        compactEvery = compactEvery)
      try {
        input.addData(b: _*)
        q.processAllAvailable()
      } finally q.stop()
      if (compactAfterEach) EventStreams.compactPostings(spark, dir)
    }
  }

  // near-dup chain: jac(k,t) = jac(t,m) = 0.6 >= 0.5, but
  // jac(k,m) = 0.33 < 0.5 — m is knocked out ONLY by the tombstoned
  // t's grams, never by t's own knocker k
  private val k = CDoc(1L, "en", "apple brick cloud delta ember frost grove haven ivory jade")
  private val t = CDoc(5L, "en", "apple brick cloud delta ember frost grove haven xray yonder")
  private val m = CDoc(9L, "en", "prism quartz cloud delta ember frost grove haven xray yonder")

  test("compacted and uncompacted ingests produce identical snapshots") {
    val batches = Seq(
      Seq(t, CDoc(8L, "en", "one two three four five six seven eight nine ten")),
      // lower-id exact twin of 8 -> eviction; k tombstones t
      Seq(k, CDoc(3L, "en", "one two three four five six seven eight nine ten")),
      // m rides on the tombstoned t's grams; a fresh doc appends
      Seq(m, CDoc(12L, "en", "red orange yellow green blue indigo violet pink black white")))
    val dirA = Files.createTempDirectory("compact_a").resolve("s").toString
    val dirB = Files.createTempDirectory("compact_b").resolve("s").toString
    runBatches(dirA, batches, compactAfterEach = false)
    runBatches(dirB, batches, compactAfterEach = true)
    val a = EventStreams.readSnapshot(spark, dirA)
      .select("doc_id", "fp", "lang", "text", "out").collect().toSet
    val b = EventStreams.readSnapshot(spark, dirB)
      .select("doc_id", "fp", "lang", "text", "out").collect().toSet
    assert(a === b, "compaction changed the ingest result")
    // the chain actually exercised tombstone-gram knockouts
    val out = a.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> false, 3L -> false, 5L -> true,
      9L -> true, 12L -> false), s"unexpected dedup outcome: $out")
    // bounded history: A accumulated one partition per non-empty
    // batch; B, compacted after every batch, holds exactly one fold
    assert(committedPartitions(dirA).size === 3)
    assert(committedPartitions(dirB).size === 1,
      s"fold did not bound partitions: ${committedPartitions(dirB)}")
  }

  test("compaction drops evicted docs' stale postings, keeps tombstoned docs'") {
    val dir = Files.createTempDirectory("compact_drop").resolve("s").toString
    runBatches(dir, Seq(
      Seq(t, CDoc(8L, "en", "one two three four five six seven eight nine ten")),
      Seq(k, CDoc(3L, "en", "one two three four five six seven eight nine ten"))),
      compactAfterEach = false)
    assert(EventStreams.compactPostings(spark, dir) === 2)
    val ids = spark.read.parquet(dir + "_postings")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!ids.contains(8L),
      "evicted doc's stale postings survived compaction")
    assert(ids.contains(5L),
      "tombstoned doc's load-bearing postings were dropped")
    assert(ids === Set(1L, 3L, 5L), s"unexpected posting ids: $ids")
    // and the tombstone's grams still knock out later arrivals
    runBatches(dir, Seq(Seq(m)), compactAfterEach = false)
    val out = EventStreams.readSnapshot(spark, dir)
      .select("doc_id", "out").as[(Long, Boolean)].collect().toMap
    assert(out(9L), "post-compaction knockout via a tombstoned doc failed")
  }

  test("compaction policy: compactEvery bounds history, preserves results") {
    // 8 non-empty batches; the near-dup chain (t tombstoned in batch
    // 2, m knocked out by t's grams in batch 3) spans policy-triggered
    // folds, so a fold that dropped load-bearing tombstone grams or
    // stale-subsumed evidence would change the outcome vs the
    // unbounded run
    // fillers must stay distinct AFTER normalization (digits strip) and
    // dissimilar enough to dodge the near-dup knockout — each gets its
    // own word list
    val fillerWords = Seq(
      "kappa lambda sigma omega tau rho phi chi",
      "anchor bridge castle desert ember forest glacier harbor",
      "island jungle kettle lantern meadow nectar orchard prairie",
      "quarry river summit tunnel valley willow yonder zephyr",
      "amber birch cedar dahlia elm fern ginkgo hazel")
    val batches = Seq(
      Seq(t, CDoc(8L, "en", "one two three four five six seven eight nine ten")),
      Seq(k, CDoc(3L, "en", "one two three four five six seven eight nine ten")),
      Seq(m, CDoc(12L, "en", "red orange yellow green blue indigo violet pink black white"))) ++
      fillerWords.zipWithIndex.map { case (w, i) =>
        Seq(CDoc(101L + i, "en", w)) }
    val dirP = Files.createTempDirectory("compact_pol").resolve("s").toString
    val dirN = Files.createTempDirectory("compact_nop").resolve("s").toString
    runBatches(dirP, batches, compactAfterEach = false, compactEvery = 3)
    runBatches(dirN, batches, compactAfterEach = false, compactEvery = 0)
    val a = EventStreams.readSnapshot(spark, dirP)
      .select("doc_id", "fp", "lang", "text", "out").collect().toSet
    val b = EventStreams.readSnapshot(spark, dirN)
      .select("doc_id", "fp", "lang", "text", "out").collect().toSet
    assert(a === b, "policy-triggered compaction changed the ingest result")
    val out = a.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(5L) && out(9L) && !out(1L) && !out(3L) && !out(12L),
      s"dedup chain broken under the policy: $out")
    // bounded read amplification: the history scan never pays for more
    // than compactEvery partitions (a fold fires the batch the count
    // reaches the threshold and leaves one partition behind)
    assert(committedPartitions(dirP).size <= 3,
      s"policy did not bound partitions: ${committedPartitions(dirP)}")
    // the unbounded control accumulated one per non-empty batch
    assert(committedPartitions(dirN).size === batches.size)
  }

  test("compaction is a no-op on fresh, single-partition, or absent posting tables") {
    val dir = Files.createTempDirectory("compact_noop").resolve("s").toString
    assert(EventStreams.compactPostings(spark, dir) === 0,
      "absent posting table must be a no-op")
    runBatches(dir, Seq(Seq(k)), compactAfterEach = false)
    assert(EventStreams.compactPostings(spark, dir) === 0,
      "a single committed partition needs no fold")
    assert(committedPartitions(dir) === Seq("batch=0"))
  }
}
