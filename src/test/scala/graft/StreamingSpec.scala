package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming hourly rollup over the parquet source matches the batch result") {
    val stream = EventStreams.hourlyRollup(
      EventStreams.readEvents(spark, sf("sf0.001")))
    val q = stream.writeStream
      .format("memory").queryName("hourly_stream")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_stream")
      .orderBy("hour_start", "event_type")
      .collect()
    val want = EventOps.hourlyRollup(spark, sf("sf0.001"))
      .select("hour_start", "event_type", "n_events", "total_value")
      .collect()
    assert(got.sameElements(want))
  }

  test("streaming hourly CMS sketch matches the batch sketch and never undercounts") {
    val stream = EventStreams.hourlyTypeSketch(
      EventStreams.readEvents(spark, sf("sf0.001")))
    val q = stream.writeStream
      .format("memory").queryName("cms_stream")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("cms_stream")
      .orderBy("hour_start").collect()
    assert(got.nonEmpty)
    // the estimate never undercounts, per window
    got.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"purchase undercount at ${r.getLong(0)}")
      assert(r.getLong(3) >= r.getLong(4), s"error undercount at ${r.getLong(0)}")
    }
    // batch-boundary independence: the same aggregate over the batch
    // reader produces identical rows (merge is elementwise sum)
    val batchEvents = graft.sources.Tables.events(spark, sf("sf0.001"))
    val want = EventStreams.hourlyTypeSketch(batchEvents)
      .orderBy("hour_start").collect()
    assert(got.sameElements(want),
      "streaming sketch differs from the batch sketch")
  }

  test("AvailableNow trigger drains the source, terminates, and resumes from checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    def start(name: String) =
      EventStreams.hourlyRollup(EventStreams.readEvents(spark, sf("sf0.001")))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()

    val q1 = start("avail_now_1")
    q1.awaitTermination(120000)
    val n1 = spark.table("avail_now_1").count()
    assert(n1 > 0)

    // same checkpoint, no new files: the restarted query terminates
    // without reprocessing (complete-mode memory sink stays empty)
    val q2 = start("avail_now_2")
    q2.awaitTermination(120000)
    assert(spark.table("avail_now_2").count() === 0,
      "checkpointed source re-read already-processed files")
  }

  test("stateful sessionization closes sessions on gap, keeps open ones in state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = EventStreams.sessionize(input.toDS(), gapSec = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_stream")
      .outputMode("append")
      .start()
    try {
      // user 1: two events 10s apart, then a 1h gap, then one more
      input.addData(Ev(1L, 1L, 1000L), Ev(1L, 2L, 1010L))
      q.processAllAvailable()
      input.addData(Ev(1L, 3L, 1010L + 3600L))
      q.processAllAvailable()
    } finally q.stop()

    val closed = spark.table("sessions_stream").as[EventStreams.Session]
      .collect()
    // exactly one closed session: events 1+2; the post-gap session stays open
    assert(closed.length === 1)
    assert(closed.head === EventStreams.Session(1L, 1000L, 1010L, 2L))
  }

  test("streaming session counts agree with the batch window sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val batchEvents = graft.sources.Tables.events(spark, sf("sf0.001"))
    val input = MemoryStream[Ev]
    val sessions = EventStreams.sessionize(input.toDS(), gapSec = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_vs_batch")
      .outputMode("append")
      .start()
    try {
      input.addData(
        batchEvents.select(
          col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
          .as[Ev].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    // closed streaming sessions + one open session per user == batch total
    val closedPerUser = spark.table("sessions_vs_batch")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val batch = EventOps.sessionize(spark, sf("sf0.001"))
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(batch.nonEmpty)
    batch.foreach { case (user, nSessions) =>
      assert(closedPerUser.getOrElse(user, 0L) + 1 === nSessions,
        s"user $user: closed=${closedPerUser.getOrElse(user, 0L)} batch=$nSessions")
    }
  }

  test("streaming dedup suppresses within-watermark duplicates, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDS().select(
      col("user_id"), col("event_id"),
      timestamp_seconds(col("sec")).as("ts"))
    val q = EventStreams.dedupEvents(events).writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      // same event twice in one batch + once again in a later batch,
      // all inside the watermark horizon
      input.addData(Ev(1L, 100L, 1000L), Ev(1L, 100L, 1000L), Ev(2L, 101L, 1005L))
      q.processAllAvailable()
      input.addData(Ev(1L, 100L, 1010L), Ev(3L, 102L, 1020L))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream")
      .select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(100L, 101L, 102L),
      s"each event_id must survive exactly once: ${ids.toSeq}")
  }

  test("late data beyond the watermark is dropped from the windowed aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDS().select(
      timestamp_seconds(col("sec")).as("ts"),
      lit("click").as("event_type"),
      col("event_id").cast("double").as("value"))
    val q = EventStreams.hourlyRollup(events).writeStream
      .format("memory").queryName("late_data")
      .outputMode("append") // append emits a window only once it is final
      .start()
    try {
      // hour-0 events, then an hour-4 event that advances the
      // watermark (2h delay) past hour 0's close -> hour 0 emits
      input.addData(Ev(1L, 1L, 600L), Ev(1L, 2L, 700L))
      q.processAllAvailable()
      input.addData(Ev(1L, 3L, 4L * 3600L))
      q.processAllAvailable()
      // a straggler back in hour 0: older than the watermark, must be
      // DROPPED, not re-open the emitted window
      input.addData(Ev(1L, 4L, 650L))
      q.processAllAvailable()
    } finally q.stop()
    val hour0 = spark.table("late_data")
      .filter(col("hour_start") === 0L)
      .select("n_events").as[Long].collect()
    assert(hour0.toSeq === Seq(2L),
      s"hour-0 window must emit once with the 2 on-time events: ${hour0.toSeq}")
  }

  test("foreachBatch upsert sink: later batches overwrite by key") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert_sink")
      .resolve("snapshot").toString
    val input = MemoryStream[Ev]
    val events = input.toDS()
      .select(col("event_id"), col("user_id"), col("sec"))
    val q = EventStreams.upsertSink(events, dir)
    try {
      // batch 1 carries a WITHIN-batch duplicate key: the greater sec
      // must win before the merge ever sees the batch
      input.addData(Ev(1L, 10L, 100L), Ev(1L, 10L, 120L), Ev(2L, 20L, 200L))
      q.processAllAvailable()
      input.addData(Ev(1L, 10L, 150L), Ev(3L, 30L, 300L))
      q.processAllAvailable()
      // a STALE replay (sec older than the snapshot row) must NOT
      // regress the snapshot — greatest orderCol wins across batches
      input.addData(Ev(1L, 10L, 90L))
      q.processAllAvailable()
    } finally q.stop()
    val snap = EventStreams.readSnapshot(spark, dir)
      .select("event_id", "sec").as[(Long, Long)].collect().toMap
    assert(snap === Map(10L -> 150L, 20L -> 200L, 30L -> 300L),
      s"snapshot after two merges: $snap")
  }

  test("upsert sink recovers from a partial (uncommitted) snapshot write") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert_partial")
      .resolve("snapshot")
    // simulate a crash mid-overwrite: a snapshot directory containing a
    // stray data file but NO _SUCCESS job-commit marker (and invalid
    // footers, so a naive read would throw)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("part-00000.parquet"),
      "not a parquet file".getBytes)
    val input = MemoryStream[Ev]
    val events = input.toDS()
      .select(col("event_id"), col("user_id"), col("sec"))
    val q = EventStreams.upsertSink(events, dir.toString)
    try {
      input.addData(Ev(1L, 10L, 100L), Ev(2L, 20L, 200L))
      q.processAllAvailable()
    } finally q.stop()
    val snap = EventStreams.readSnapshot(spark, dir.toString)
      .select("event_id", "sec").as[(Long, Long)].collect().toMap
    assert(snap === Map(10L -> 100L, 20L -> 200L),
      s"snapshot rebuilt from the batch after a partial write: $snap")
  }

  test("stream-stream interval join matches the equivalent batch join") {
    val joined = EventStreams.purchaseErrorJoin(
      EventStreams.readEvents(spark, sf("sf0.001")))
    val q = joined.writeStream
      .format("memory").queryName("pe_join_stream")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("pe_join_stream")
      .orderBy("purchase_id", "error_id").collect()

    // same join, same micro-second timestamps, batch semantics
    val ev = graft.sources.Tables.events(spark, sf("sf0.001"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
    val want = p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 60 MINUTES"))
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        expr("(unix_micros(e_ts) - unix_micros(p_ts)) div 1000000")
          .as("gap_sec"))
      .orderBy("purchase_id", "error_id").collect()

    assert(want.nonEmpty, "batch reference join produced no rows")
    assert(got.sameElements(want))
  }

  test("streaming curation ingest: an empty micro-batch leaves the snapshot unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curated_empty")
      .resolve("snapshot").toString
    val input = MemoryStream[EventStreams.CDoc]
    val q = EventStreams.curatedIngest(input.toDF(), dir)
    try {
      input.addData(
        EventStreams.CDoc(1L, "en",
          "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
      q.processAllAvailable()
      val before = EventStreams.readSnapshot(spark, dir).collect().toSet
      // an idle trigger with no new data must not corrupt or shrink
      // the committed snapshot (production streams idle constantly)
      q.processAllAvailable()
      val after = EventStreams.readSnapshot(spark, dir).collect().toSet
      assert(after === before)
    } finally q.stop()
  }

  test("streaming curation ingest: redelivering a tombstoned doc cannot resurrect it") {
    // at-least-once delivery: a doc near-dup-knocked-out in an earlier
    // batch arrives AGAIN (source replay). The exact-dedup merge sees
    // two copies of the same doc_id — snapshot's (out=true) and the
    // batch's (out=false) — and must keep the tombstone; it is not a
    // new doc, so no pair recompute will re-knock it.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curated_replay")
      .resolve("snapshot").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = EventStreams.CDoc(9L, "en", base.replace("sigma", "sygma"))
    val input = MemoryStream[EventStreams.CDoc]
    val q = EventStreams.curatedIngest(input.toDF(), dir)
    try {
      input.addData(nearDup)
      q.processAllAvailable()
      // the lower-id original arrives: 9 gets tombstoned
      input.addData(EventStreams.CDoc(1L, "en", base))
      q.processAllAvailable()
      val out9 = EventStreams.readSnapshot(spark, dir)
        .filter(col("doc_id") === 9L).select("out").collect()
      assert(out9.map(_.getBoolean(0)).toSeq === Seq(true),
        "doc 9 must be tombstoned after its lower-id near-dup arrived")
      // doc 9 is redelivered — the tombstone must survive the merge
      input.addData(nearDup)
      q.processAllAvailable()
      val after = EventStreams.readSnapshot(spark, dir)
        .filter(col("doc_id") === 9L).select("out").collect()
      assert(after.map(_.getBoolean(0)).toSeq === Seq(true),
        "redelivery resurrected a tombstoned doc")
    } finally q.stop()
  }

  test("streaming curation ingest: posting history survives a stream restart") {
    // a NEW query on the same snapshot path (fresh batchIds, fresh
    // stream state) must still knock out near-dups against docs
    // ingested by the PREVIOUS query — the pair evidence lives in the
    // on-disk posting partitions, not in any in-memory stream state
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curated_restart")
      .resolve("snapshot").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val input1 = MemoryStream[EventStreams.CDoc]
    val q1 = EventStreams.curatedIngest(input1.toDF(), dir)
    try {
      input1.addData(EventStreams.CDoc(9L, "en",
        base.replace("sigma", "sygma")))
      q1.processAllAvailable()
    } finally q1.stop()
    val input2 = MemoryStream[EventStreams.CDoc]
    val q2 = EventStreams.curatedIngest(input2.toDF(), dir)
    try {
      input2.addData(EventStreams.CDoc(1L, "en", base))
      q2.processAllAvailable()
    } finally q2.stop()
    val out = EventStreams.readSnapshot(spark, dir)
      .select("doc_id", "out").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> false, 9L -> true),
      s"restart lost the posting history: $out")
  }

  test("streaming curation ingest converges to the batch pipeline under an adversarial batch split") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curated_ingest")
      .resolve("snapshot").toString
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("lang"), col("text"))
      .as[EventStreams.CDoc].collect()
    // three batches arriving HIGHEST doc_ids first: exact twins and
    // near-dup pairs split across batches with the keeper arriving
    // LAST, so first-writer-wins-by-id replacement and tombstone
    // knockouts are actually exercised, not just the append path
    val batches = docs.sortBy(-_.doc_id)
      .grouped((docs.length + 2) / 3).toSeq
    assert(batches.size === 3)
    val input = MemoryStream[EventStreams.CDoc]
    val q = EventStreams.curatedIngest(input.toDF(), dir)
    try {
      batches.foreach { b =>
        input.addData(b.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = EventStreams.curatedSnapshot(spark, dir).collect()
    val want = graft.operators.Pipeline.curatedCorpus(spark, sf("sf0.001"))
      .collect()
    assert(want.nonEmpty, "batch pipeline produced no rows")
    assert(got.sameElements(want),
      s"stream ${got.length} rows vs batch ${want.length} rows")
  }

  test("SnapshotStore: max committed generation wins and commit prunes predecessors") {
    // simulate the crash-after-write-before-prune window: two
    // committed generations on disk — the reader must pick the newer,
    // and the next commit must leave exactly one generation behind
    val root = java.nio.file.Files.createTempDirectory("snapstore")
      .resolve("snapshot").toString
    Seq((1L, "old")).toDF("k", "v").write.parquet(s"$root/gen=0")
    Seq((1L, "new")).toDF("k", "v").write.parquet(s"$root/gen=3")
    val cur = graft.streaming.SnapshotStore.read(spark, root).get
    assert(cur.select("v").as[String].collect().toSeq === Seq("new"))
    graft.streaming.SnapshotStore.commit(
      Seq((1L, "newer")).toDF("k", "v"), root)
    val dirs = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(dirs.toSeq === Seq("gen=4"), s"prune left: ${dirs.toSeq}")
    val after = graft.streaming.SnapshotStore.read(spark, root).get
    assert(after.select("v").as[String].collect().toSeq === Seq("newer"))
  }

  test("upsert sink survives a crashed generation rewrite without losing merged keys") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert_crashgen")
      .resolve("snapshot")
    val input1 = MemoryStream[Ev]
    val q1 = EventStreams.upsertSink(
      input1.toDS().select(col("event_id"), col("user_id"), col("sec")),
      dir.toString)
    try {
      input1.addData(Ev(1L, 10L, 100L))
      q1.processAllAvailable()
    } finally q1.stop()
    // simulate a crash MID-rewrite of the next generation: a partial
    // gen dir with a garbage task file and no _SUCCESS. The old
    // in-place overwrite had already deleted the committed snapshot at
    // this point; the generation layout must still have gen=0 intact.
    val partial = dir.resolve("gen=1")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.write(partial.resolve("part-00000.parquet"),
      "not a parquet file".getBytes)
    val input2 = MemoryStream[Ev]
    val q2 = EventStreams.upsertSink(
      input2.toDS().select(col("event_id"), col("user_id"), col("sec")),
      dir.toString)
    try {
      input2.addData(Ev(2L, 20L, 200L))
      q2.processAllAvailable()
    } finally q2.stop()
    val snap = EventStreams.readSnapshot(spark, dir.toString)
      .select("event_id", "sec").as[(Long, Long)].collect().toMap
    assert(snap === Map(10L -> 100L, 20L -> 200L),
      s"crashed rewrite lost committed keys: $snap")
  }

  test("curated ingest refuses to rebuild the corpus when postings outlive the snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("curated_lost")
    val dir = base.resolve("snapshot").toString
    val input1 = MemoryStream[EventStreams.CDoc]
    val q1 = EventStreams.curatedIngest(input1.toDF(), dir)
    try {
      input1.addData(EventStreams.CDoc(9L, "en",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
      q1.processAllAvailable()
    } finally q1.stop()
    // externally destroy the snapshot but keep the posting history —
    // the sink must FAIL the next batch, not silently truncate the
    // corpus to that batch
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(dir))
    val input2 = MemoryStream[EventStreams.CDoc]
    val q2 = EventStreams.curatedIngest(input2.toDF(), dir)
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        input2.addData(EventStreams.CDoc(1L, "en",
          "totally different words one two three four five six seven eight"))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(thrown).exists(_.isInstanceOf[IllegalStateException]),
      s"expected IllegalStateException in: ${causes(thrown).map(_.getClass)}")
  }

  test("posting root tolerates foreign batch= directories on replay collisions") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("curated_foreign")
      .resolve("snapshot").toString
    val baseTxt = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val input1 = MemoryStream[EventStreams.CDoc]
    val q1 = EventStreams.curatedIngest(input1.toDF(), dir)
    try {
      input1.addData(EventStreams.CDoc(9L, "en",
        baseTxt.replace("sigma", "sygma")))
      q1.processAllAvailable()
    } finally q1.stop()
    // a hand-placed committed dir whose batch= suffix overflows Long —
    // a bare .toLong here used to throw and fail every future batch
    val foreign = java.nio.file.Paths.get(
      dir + "_postings", "batch=99999999999999999999999")
    java.nio.file.Files.createDirectories(foreign)
    java.nio.file.Files.write(foreign.resolve("_SUCCESS"), Array.empty[Byte])
    // fresh query: its batchId=0 collides with committed batch=0, so
    // the next-free-index scan runs across the foreign name
    val input2 = MemoryStream[EventStreams.CDoc]
    val q2 = EventStreams.curatedIngest(input2.toDF(), dir)
    try {
      input2.addData(EventStreams.CDoc(1L, "en", baseTxt))
      q2.processAllAvailable()
    } finally q2.stop()
    val out = EventStreams.readSnapshot(spark, dir)
      .select("doc_id", "out").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> false, 9L -> true),
      s"foreign postings dir broke the ingest: $out")
  }
}
