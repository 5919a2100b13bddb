package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SuffixRanks
import graft.sources.ArtifactMaintenance
import graft.streaming.{BucketStore, EventStreams}
import graft.streaming.EventStreams.CDoc

/** End-to-end ingest → incremental-artifact-maintenance wiring
  * (ArtifactMaintenance): a curatedIngest commit with a registered
  * maintainer must leave the maintained index INSTALLED before any
  * query arrives, so the first post-ingest query serves it with zero
  * rebuild — and must equal a fresh build over the post-ingest corpus
  * bit-for-bit. The fallback arms (non-pure commits: an old doc
  * evicted or tombstoned) must skip maintenance and still be correct
  * via the staleness contract's rebuild-on-access.
  *
  * The "no rebuild" probe is path-local and race-free under parallel
  * suites: a maintained install pre-creates the post-commit
  * stamp-named index dir at COMMIT time, so the spec asserts the dir
  * (and its `_SUCCESS` mtime) exists unchanged across the post-ingest
  * query — a query that rebuilt would have had to create it.
  */
class IngestMaintenanceSpec extends SparkTestBase {

  /** Word-soup docs with stride-5 overlap: consecutive docs share 5 of
    * 10 words (so the suffix merge interleaves real windows) but their
    * trigram Jaccard is ~0.23 < 0.5 (no near-dup knockouts unless a
    * test wants one). Words are ALPHA-encoded — normalization strips
    * digits, so numeric suffixes would collapse every word to "w" and
    * every doc to one exact-dup fingerprint. */
  private def alpha(n: Long): String =
    n.toString.map(c => ('a' + (c - '0')).toChar).mkString
  private def doc(id: Long): CDoc =
    CDoc(id, "en",
      (0 until 10).map(k => "w" + alpha(id * 5 + k)).mkString(" "))

  private def freshStore(): String = {
    val dir = Files.createTempDirectory("graft_ingest_maint").toString
    s"$dir/store"
  }

  /** Run batches through one curatedIngest stream (processAllAvailable
    * per batch so each is its own commit), with `between` invoked
    * after each batch index — the spec's mid-stream probes. */
  private def ingest(path: String, batches: Seq[Seq[CDoc]])(
      between: Int => Unit): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CDoc]
    val q = EventStreams.curatedIngest(input.toDF(), path,
      bucketer = BucketStore.RangeBuckets("doc_id", 64))
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*)
        q.processAllAvailable()
        between(i)
      }
    } finally q.stop()
  }

  private def sortedRanks(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Int, Long)] = {
    import spark.implicits._
    df.select(col("doc_id"), col("pos").cast("int"), col("r"))
      .as[(Long, Int, Long)].collect().toSeq.sorted
  }

  test("pure-append commit installs the maintained suffix index; " +
      "first post-ingest query serves it with zero rebuild, " +
      "bit-equal to a fresh build") {
    val path = freshStore()
    ArtifactMaintenance.register(path, "suffix")(SuffixRanks.storeMaintainer)
    try {
      val b1 = (100L to 129L).map(doc)
      val b2 = (200L to 219L).map(doc)
      var installedDir: Option[(Long, String)] = None
      var mtimeAtCommit = 0L
      ingest(path, Seq(b1, b2)) {
        case 0 =>
          // deployment posture: the index exists BEFORE the next ingest
          // batch (cold build on first access — batch 1 has nothing to
          // maintain, its commit finds no served index and skips)
          SuffixRanks.storeRankTable(spark, path).count()
          assert(SuffixRanks.servedStoreIndex(path).isDefined,
            "cold build must register the served index")
        case 1 =>
          // the maintainer ran INSIDE the commit: the post-commit stamp
          // dir must already be installed, before any query
          installedDir = SuffixRanks.servedStoreIndex(path)
          assert(installedDir.isDefined, "maintainer did not install")
          val (stamp, dir) = installedDir.get
          assert(stamp === graft.sources.CorpusStamp.of(spark, path),
            "installed index must carry the POST-commit stamp")
          assert(Files.exists(Paths.get(dir, "_SUCCESS")),
            "installed index must be durably promoted")
          mtimeAtCommit =
            Files.getLastModifiedTime(Paths.get(dir, "_SUCCESS")).toMillis
        case _ => ()
      }
      // first post-ingest query: must serve the installed dir untouched
      val served = sortedRanks(SuffixRanks.storeRankTable(spark, path))
      assert(SuffixRanks.servedStoreIndex(path) === installedDir,
        "post-ingest query must serve the maintained install")
      val (_, dir) = installedDir.get
      assert(Files.getLastModifiedTime(Paths.get(dir, "_SUCCESS")).toMillis
        === mtimeAtCommit,
        "post-ingest query re-promoted the index — a rebuild happened")
      // and the maintained table IS the fresh-build table, bit-for-bit
      val fresh = sortedRanks(SuffixRanks.suffixRanks(
        EventStreams.admittedDocs(spark, path)))
      assert(served === fresh,
        "maintained index diverged from a fresh build over the corpus")
      assert(served.nonEmpty && served.map(_._1).distinct.size === 50)
    } finally ArtifactMaintenance.clear(path)
  }

  test("three families on one store: a pure-append commit maintains " +
      "the unigram vocabularies AND the BPE merge table alongside the " +
      "suffix index, each bit-equal to a retrain, with zero " +
      "post-ingest corpus scan") {
    import graft.operators.{Bpe, Unigram}
    val path = freshStore()
    // ALL families ride the same commit — the registry is a contract,
    // not a single-purpose hook; unigram and bpe additionally SHARE
    // the persisted (word, n) census artifact
    ArtifactMaintenance.register(path, "suffix")(SuffixRanks.storeMaintainer)
    ArtifactMaintenance.register(path, "unigram")(Unigram.storeMaintainer)
    ArtifactMaintenance.register(path, "bpe")(Bpe.storeMaintainer())
    try {
      val b1 = (500L to 529L).map(doc)
      val b2 = (600L to 619L).map(doc)
      var wordsAtCommit: Option[(Long, String)] = None
      var mergesAtCommit: Option[(Long, Seq[Bpe.Merge])] = None
      var mtimeAtCommit = 0L
      ingest(path, Seq(b1, b2)) {
        case 0 =>
          // cold build on first access registers the served word table
          Unigram.storeVocabs(spark, path)
          assert(Unigram.servedStoreWords(path).isDefined,
            "cold fit must register the served word table")
          Bpe.storeMerges(spark, path)
          assert(Bpe.servedStoreMerges(path).isDefined,
            "cold merge-loop fit must register the served merge table")
          SuffixRanks.storeRankTable(spark, path).count()
        case 1 =>
          // the maintainer ran INSIDE the commit for ALL families
          wordsAtCommit = Unigram.servedStoreWords(path)
          assert(wordsAtCommit.isDefined, "unigram maintainer did not install")
          val (stamp, dir) = wordsAtCommit.get
          assert(stamp === graft.sources.CorpusStamp.of(spark, path),
            "installed word table must carry the POST-commit stamp")
          assert(Files.exists(Paths.get(dir, "_SUCCESS")))
          mtimeAtCommit =
            Files.getLastModifiedTime(Paths.get(dir, "_SUCCESS")).toMillis
          assert(SuffixRanks.servedStoreIndex(path).exists(
            _._1 === stamp), "suffix maintainer must also have installed")
          mergesAtCommit = Bpe.servedStoreMerges(path)
          assert(mergesAtCommit.exists(_._1 === stamp),
            "bpe maintainer must install under the POST-commit stamp")
        case _ => ()
      }
      // first post-ingest access serves the maintained vocabularies
      // without touching the word table on disk (no rebuild, no merge)
      val served = Unigram.storeVocabs(spark, path)
      assert(Unigram.servedStoreWords(path) === wordsAtCommit)
      val (_, dir) = wordsAtCommit.get
      assert(Files.getLastModifiedTime(Paths.get(dir, "_SUCCESS")).toMillis
        === mtimeAtCommit,
        "post-ingest access re-promoted the word table — a rebuild happened")
      // the maintained vocabularies ARE the retrain's, bit-for-bit
      // (integer word counts merge associatively — no drift gate)
      val retrained = Unigram.retrainOver(
        EventStreams.admittedDocs(spark, path))
      assert(served === retrained,
        "maintained vocabularies diverged from a full retrain")
      assert(served.last.nonEmpty)
      // the maintained BPE merge table IS the retrain's, bit-for-bit
      // (the loop re-ran in full over the merged census — the
      // documented order-sensitivity posture: no old-merge reuse)
      val servedMerges = Bpe.storeMerges(spark, path)
      assert(Bpe.servedStoreMerges(path) === mergesAtCommit,
        "post-ingest access must serve the maintained merge table")
      val retrainedMerges = Bpe.learnMerges(
        graft.functions.TextOps.explodedWords(
          EventStreams.admittedDocs(spark, path)), 20)
      assert(servedMerges === retrainedMerges,
        "maintained merge table diverged from a full retrain")
      assert(servedMerges.nonEmpty)
    } finally ArtifactMaintenance.clear(path)
  }

  test("non-pure commit (old doc tombstoned) skips maintenance and " +
      "falls back to a correct rebuild on access") {
    val path = freshStore()
    ArtifactMaintenance.register(path, "suffix")(SuffixRanks.storeMaintainer)
    try {
      val b1 = (100L to 119L).map(doc)
      // doc 50 is a LOWER-id near-dup of doc 110 (its text plus one
      // appended word => trigram jaccard 8/9 >= 0.5): its arrival
      // tombstones the previously ADMITTED doc 110 — a deletion the
      // additive merge cannot express, so the maintainer must skip
      val nearDup = CDoc(50L, "en", doc(110L).text + " wzzzz")
      var afterCommit: Option[(Long, String)] = None
      ingest(path, Seq(b1, Seq(nearDup))) {
        case 0 =>
          SuffixRanks.storeRankTable(spark, path).count()
        case 1 =>
          afterCommit = SuffixRanks.servedStoreIndex(path)
        case _ => ()
      }
      // the maintainer skipped: whatever is held was built under the
      // PRE-commit stamp, not installed for the new one
      val post = graft.sources.CorpusStamp.of(spark, path)
      assert(afterCommit.forall(_._1 !== post),
        "non-pure commit must not install a maintained index")
      // fixture sanity: doc 110 really was tombstoned by the commit
      val admitted = EventStreams.admittedDocs(spark, path)
      import spark.implicits._
      val ids = admitted.select(col("doc_id")).as[Long].collect().toSet
      assert(!ids.contains(110L) && ids.contains(50L),
        s"fixture must tombstone doc 110 and admit doc 50; got $ids")
      // rebuild-on-access is correct over the post-ingest corpus
      val served = sortedRanks(SuffixRanks.storeRankTable(spark, path))
      val fresh = sortedRanks(SuffixRanks.suffixRanks(admitted))
      assert(served === fresh)
      assert(SuffixRanks.servedStoreIndex(path).exists(_._1 === post),
        "rebuild must register under the post-commit stamp")
    } finally ArtifactMaintenance.clear(path)
  }

  test("maintainer failure is isolated: the ingest commit survives and " +
      "the next access rebuilds correctly") {
    val path = freshStore()
    ArtifactMaintenance.register(path, "boom")((_, _) =>
      throw new RuntimeException("synthetic maintainer failure"))
    try {
      ingest(path, Seq((300L to 309L).map(doc), (400L to 409L).map(doc)))(
        _ => ())
      val served = sortedRanks(SuffixRanks.storeRankTable(spark, path))
      val fresh = sortedRanks(SuffixRanks.suffixRanks(
        EventStreams.admittedDocs(spark, path)))
      assert(served === fresh)
      assert(served.map(_._1).distinct.size === 20,
        "both batches must have committed despite the failing maintainer")
    } finally ArtifactMaintenance.clear(path)
  }
}
