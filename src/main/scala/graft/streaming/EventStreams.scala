package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events stream: watermarked
  * tumbling-window aggregation and stateful sessionization via
  * flatMapGroupsWithState. The batch `events` parquet drives these in
  * tests (file source + processAllAvailable), exactly how a Kafka-backed
  * deployment would swap sources without touching the transforms.
  *
  * Scale notes: state is bounded — the window agg keeps only windows
  * newer than the watermark, and each user's session state is O(1)
  * (last-seen + counters, not the event list). Both are the shapes that
  * survive unbounded streams.
  */
object EventStreams {

  /** Streaming DataFrame over the events parquet dir (ns -> micros, same
    * normalization as the batch loader).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // glob form: the file streaming source requires a directory path,
    // and a glob makes it treat the parent as the base dir
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(s"$dir/events.parque*")
    graft.sources.Tables.normalizeEventTs(raw)
  }

  /** Watermarked tumbling 1-hour rollup per event type. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's errors in the following 60 minutes. Both sides carry
    * watermarks and the join condition bounds event-time distance from
    * both directions, so Spark can expire buffered rows — state stays
    * bounded by (watermark delay + interval), the only join shape that
    * survives an unbounded stream. Works as a self-join of one source
    * stream (mirrors the batch `Temporal.purchaseThenError`).
    */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val errors = events
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    purchases
      .join(errors,
        col("user_id") === col("e_user") &&
          col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 60 MINUTES"))
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        expr("(unix_micros(e_ts) - unix_micros(p_ts)) div 1000000")
          .as("gap_sec"))
  }

  /** Watermarked hourly count-min sketch over the event-type stream:
    * each 1-hour window aggregates ONE mergeable d x w counter grid
    * (see functions.CountMinAggregator) alongside exact counts for two
    * probe types, and emits the sketch estimates next to the truth.
    * The streaming state per window is the fixed-size grid — the
    * sketch answers point frequency queries over key spaces whose
    * exact per-key state would not fit (per-URL, per-user agents, ...),
    * while composing with watermark-based window expiry exactly like
    * any other mergeable aggregate (partial grids merge across
    * micro-batches by elementwise sum, so the result is independent of
    * batch boundaries — asserted against the batch run in the spec).
    */
  def hourlyTypeSketch(events: DataFrame, d: Int = 4, w: Int = 1024)
      : DataFrame = {
    val cms = udaf(new graft.functions.CountMinAggregator(d, w))
    def est(sk: Column, x: Column): Column =
      graft.functions.CountMinAggregator.estimateExpr(sk, x, d, w)
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(cms(col("event_type")).as("sk"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "error", 1)).as("n_error"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        est(col("sk"), lit("purchase")).as("n_purchase_est"),
        col("n_purchase"),
        est(col("sk"), lit("error")).as("n_error_est"),
        col("n_error"))
  }

  /** Streaming exact dedup with BOUNDED state:
    * dropDuplicatesWithinWatermark keeps a key in state only until the
    * watermark passes its event time, so state is O(keys per watermark
    * horizon) — the only dedup shape that survives an unbounded
    * stream. (Plain dropDuplicates on a stream accumulates every key
    * forever.) Duplicates arriving within the horizon are suppressed;
    * a reappearance after the horizon is treated as new, which is the
    * documented contract, not a bug — exact global dedup of an
    * unbounded stream requires unbounded state.
    */
  def dedupEvents(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Micro-batch upsert sink via foreachBatch: each batch merges into
    * a parquet snapshot keyed by event_id, committed atomically
    * through [[SnapshotStore]] generation dirs (a crash mid-rewrite
    * can never lose previously merged keys). foreachBatch is the
    * engine's escape hatch to ANY batch sink with exactly-once-per-
    * batch semantics (batchId is provided for idempotence
    * bookkeeping); against a transactional table format the same
    * callback issues a real MERGE instead of the rewrite.
    *
    * Merge rule: per event_id, the row with the GREATEST `orderCol`
    * wins — globally, not per batch. So duplicate keys within a batch
    * collapse, and a late replay carrying an OLDER orderCol than the
    * snapshot row loses (an anti-join merge would wrongly let it
    * overwrite). Exact ties break on a content hash, so the pick is a
    * pure function of the data — reproducible at any parallelism.
    *
    * Plan shape per batch: ONLY the small batch and the snapshot rows
    * whose keys conflict with it go through the argmax (max_by hash
    * aggregates — no sort); the rest of the snapshot rides through an
    * untouched broadcast anti-join. The snapshot — which grows
    * unboundedly over a stream's lifetime — is never shuffled or
    * sorted, which a single window over snapshot-union-batch would do
    * on every batch.
    *
    * The localCheckpoint materializes the merge before the commit;
    * with generation dirs the new write no longer deletes the data the
    * plan reads (that hazard was the old in-place overwrite), but the
    * checkpoint still bounds the per-batch plan and lets the
    * generation prune proceed without a live reader. The checkpoint's
    * own RDD (and only it — a shared SparkContext can hold OTHER jobs'
    * persisted blocks, which must not be touched) is dropped after the
    * write: a stream runs unboundedly many batches, and per-batch
    * blocks left to the ContextCleaner accumulate in the meantime.
    */
  def upsertSink(events: DataFrame, path: String, orderCol: String = "sec")
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns
        // deterministic argmax of a whole row by (orderCol, content)
        def best(df: DataFrame): DataFrame = df
          .groupBy(col("event_id"))
          .agg(max_by(struct(cols.map(col): _*),
            struct(col(orderCol), xxhash64(struct(cols.map(col): _*))))
            .as("r"))
          .select(col("r.*"))
        val keyed = best(batch) // within-batch dedup, batch-sized
        // the snapshot lives in SnapshotStore's generation layout: the
        // current version is the highest gen=<k> dir with a _SUCCESS
        // job-commit marker, and a new version is written BESIDE it —
        // never over it — so no crash window can destroy previously
        // merged keys (mode("overwrite") deletes the committed data
        // before the rewrite starts). All path handling goes through
        // the Hadoop FileSystem for the path's own scheme; read errors
        // on a committed generation (transient S3/HDFS failures, not
        // crash damage) FAIL the batch so the stream retries.
        val snapshotOpt: Option[DataFrame] = SnapshotStore.read(spark, path)
        val merged =
          (if (snapshotOpt.isDefined) {
            val snapshot = snapshotOpt.get
            val keys = keyed.select("event_id")
            val untouched = snapshot
              .join(broadcast(keys), Seq("event_id"), "left_anti")
            val conflicts = snapshot
              .join(broadcast(keys), Seq("event_id"), "left_semi")
              .unionByName(keyed)
            untouched.unionByName(best(conflicts))
          } else keyed)
            .localCheckpoint()
        SnapshotStore.commit(merged, path)
        val checkpointed = merged.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }
        if (checkpointed.isEmpty)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "upsertSink: checkpointed RDD not found in the analyzed plan; " +
              "per-batch checkpoint blocks will accumulate until GC")
        checkpointed.foreach(_.unpersist(blocking = false))
        ()
      }
      .outputMode("update")
      .start()

  // ---- stateful sessionization ----

  case class Ev(user_id: Long, event_id: Long, sec: Long)
  case class CDoc(doc_id: Long, lang: String, text: String)
  case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long)

  /** Event-time sessionization with a 30-minute gap, as an explicit
    * state machine: state per user is constant-size. Emits a session
    * whenever a gap closes it; the final open session flushes on state
    * timeout (or at stream end in tests).
    */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // file-source micro-batches can deliver a user's events across
          // batches; within a batch, order by event time (+id tiebreak)
          val sorted = evs.toSeq.sortBy(e => (e.sec, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption.orNull
          sorted.foreach { e =>
            if (st == null) {
              st = SessionState(e.sec, e.sec, 1)
            } else if (e.sec - st.lastSeen > gapSec) {
              closed += Session(user, st.sessionStart, st.lastSeen, st.nEvents)
              st = SessionState(e.sec, e.sec, 1)
            } else {
              // cross-batch late events merge into the open session but
              // never regress its bounds (no watermark here; a late
              // event older than lastSeen still counts, and the session
              // window only grows)
              st = SessionState(
                math.min(st.sessionStart, e.sec),
                math.max(st.lastSeen, e.sec),
                st.nEvents + 1)
            }
          }
          if (st != null) state.update(st)
          closed.iterator
      }
  }

  /** Closed sessions per user from the streaming state machine, with
    * the still-open session excluded (it has not ended).
    */
  def sessionizeEvents(events: DataFrame, gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    sessionize(
      events.select(
        col("user_id"),
        col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
        .as[Ev],
      gapSec)
  }

  // ---- streaming curation ingest ----

  /** Streaming ingest variant of the curation pipeline
    * (Pipeline.curatedCorpus): documents arrive as micro-batches and
    * are folded into a curated snapshot whose FINAL contents are
    * independent of how — and in what order — the corpus was split
    * into batches. curatedSnapshot(path) over the result equals the
    * batch pipeline's output over the same rows, for ANY batch split;
    * the StreamingSpec drives an out-of-id-order split to prove it.
    *
    * Batch-split independence needs two things the obvious
    * filter-as-you-go design lacks:
    *
    *  - Exact dedup is first-writer-wins BY doc_id, not by arrival:
    *    when a batch brings a lower-id twin of an admitted doc (same
    *    content fingerprint), the twin REPLACES it — the batch
    *    pipeline's min-doc_id-per-fingerprint rule replayed
    *    incrementally. The replacement re-enters near-dup scoring as a
    *    new doc; its grams equal its predecessor's (same fingerprint
    *    => same normalized word stream), so pair directions involving
    *    it can only tighten toward the batch outcome.
    *  - Near-dup losers stay in the snapshot as TOMBSTONES (`out` =
    *    true), not deletions: the batch rule drops every doc that
    *    pairs with ANY lower-id keeper, including keepers that are
    *    themselves losers — so a loser's grams must keep knocking out
    *    later arrivals. `out` is monotone (the keeper set only grows),
    *    so tombstones never resurrect.
    *
    * Per batch the new docs probe the accumulated corpus through an
    * APPEND-ONLY posting-list table (`<path>_postings`, one
    * `batch=<id>` partition per micro-batch holding the batch's new
    * docs' (doc_id, ng, n_ng) grams): the batch side is tokenized
    * once and broadcasts, history is a posting SCAN — never
    * re-tokenized, never self-joined. Postings are never compacted or
    * deleted inline: an exact-dup eviction leaves its postings
    * behind, which is SAFE — the evicted doc's replacement has
    * identical grams and a strictly lower id, so every knockout a
    * stale posting row produces is also produced by the
    * replacement's own postings, and a stale id on the losing side
    * just fails the snapshot join (offline compaction is hygiene,
    * not correctness). Tombstoned docs' postings are load-bearing and
    * must never be compacted away.
    *
    * Quality gates (token floor, language) are applied at READ time
    * (curatedSnapshot), as in the batch pipeline: a low-quality doc
    * still participates in near-dup knockouts, so filtering it at
    * admission would change the result.
    *
    * Per-batch COMPUTE is batch-sized, not corpus-sized: the exact
    * merge routes only conflicting fingerprints through the argmin
    * (the rest of the snapshot rides an untouched broadcast
    * anti-join, as in upsertSink), and near-dup evidence comes from
    * the posting scan. The snapshot WRITE is still a full rewrite —
    * plain parquet has no merge; against a transactional table format
    * the same callback issues a real MERGE instead.
    *
    * Crash/replay discipline: uncommitted (crashed-partial) posting
    * partitions are swept before each batch reads history; committed
    * partitions are never deleted — a batchId collision (replay, or a
    * restart without a checkpointed id sequence) writes to the next
    * free index instead, with duplicate posting rows collapsed by the
    * pair-level distinct. Postings commit before the snapshot, so a
    * crash in between replays the batch against intact evidence.
    * Snapshot commits go through [[SnapshotStore]] (generation dirs):
    * a committed snapshot is never deleted before its successor is
    * durable, so no crash window can truncate the accumulated corpus;
    * the only state in which no snapshot exists but postings do is a
    * replay of the FIRST batch, which the sink verifies (any posting
    * doc outside the batch fails the batch rather than silently
    * rebuilding the corpus from the batch alone).
    */
  def curatedIngest(docs: DataFrame, path: String, n: Int = 3,
      threshold: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // within-batch exact dedup: lowest doc_id per fingerprint
        val batchKeepers = batch
          .select(col("doc_id"), col("lang"), col("text"),
            md5(graft.functions.TextOps.normalizedStream(col("text")))
              .as("fp"))
          .groupBy(col("fp"))
          .agg(min_by(
            struct(col("doc_id"), col("lang"), col("text")),
            col("doc_id")).as("r"))
          .select(col("r.doc_id"), col("r.lang"), col("r.text"), col("fp"),
            lit(false).as("out"))
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // generation-layout snapshot (SnapshotStore): a committed
        // version is never deleted before its successor is durable, so
        // "absent" here can only mean no snapshot was EVER committed —
        // either the true first batch, or a replay of it after a crash
        // between the posting commit and the first snapshot commit
        // (the guard below distinguishes that from external data loss).
        val snapshotOpt: Option[DataFrame] = SnapshotStore.read(spark, path)
        // cross-batch exact dedup: keeper per fingerprint is the
        // LOWEST doc_id seen so far. Plan shape per batch follows
        // upsertSink: only the snapshot rows whose fingerprints
        // CONFLICT with the batch enter the argmin (batch-sized
        // work); the rest of the snapshot — which grows unboundedly
        // — rides through an untouched broadcast anti-join, never
        // shuffled or aggregated. A replaced keeper forfeits its
        // flags (min_by takes the whole winner row): the
        // replacement's `out` is recomputed fresh below, since as a
        // new doc all its pairs are scored this batch. The
        // tiebreaker's second key handles at-least-once delivery: a
        // REDELIVERED doc (same doc_id already in the snapshot,
        // possibly tombstoned) arrives with out=false, and an
        // arbitrary pick between the two copies could resurrect the
        // tombstone — `!out` orders the out=true copy first, so the
        // snapshot's knowledge wins on equal ids (false < true).
        val (merged, seenIds) = snapshotOpt match {
          case None => (batchKeepers, None)
          case Some(snapshot) =>
            val batchFps = batchKeepers.select(col("fp"))
            val untouched = snapshot
              .join(broadcast(batchFps), Seq("fp"), "left_anti")
            val conflicts = snapshot
              .join(broadcast(batchFps), Seq("fp"), "left_semi")
            (untouched.unionByName(
              conflicts.unionByName(batchKeepers)
                .groupBy(col("fp"))
                .agg(min_by(
                  struct(col("doc_id"), col("lang"), col("text"), col("out")),
                  struct(col("doc_id"), !col("out"))).as("r"))
                .select(col("fp"), col("r.doc_id"), col("r.lang"),
                  col("r.text"), col("r.out"))),
              Some(conflicts.select(col("doc_id"))))
        }
        // newDocs stays BATCH-sized end to end: only a batch doc can be
        // new, and the only snapshot ids a batch doc can collide with
        // are those sharing a batch fingerprint — exactly `conflicts`,
        // already computed and batch-sized. The corpus-sized `merged`
        // is streamed through two broadcast joins (narrow, no corpus
        // shuffle) rather than anti-joined against the full snapshot id
        // set, which would shuffle the corpus once the id set outgrew
        // the broadcast threshold. Corner: a doc_id redelivered with
        // DIFFERENT text (different fp) is classified new and
        // re-probed; ids are stable per document in this model, and a
        // re-probe is idempotent anyway (knockouts are distinct-ed and
        // `out` is monotone).
        val newDocs = seenIds.fold(merged)(ids =>
          merged
            .join(broadcast(batchKeepers.select(col("doc_id"))),
              Seq("doc_id"), "left_semi")
            .join(broadcast(ids), Seq("doc_id"), "left_anti"))
        // Posting rows come from the batch's docs AS THEY SURVIVE in
        // merged — not from newDocs. The distinction is replay: after
        // a crash between the snapshot commit and the stream's own
        // checkpoint, the batch is reprocessed with its docs already
        // in the snapshot, so newDocs is empty — deriving postings
        // from it would rewrite this batch's partition as empty and
        // silently lose the docs' grams (missed knockouts forever).
        // Keying on merged ∩ batch ids regenerates the same rows on
        // replay; a REDELIVERED doc re-appends grams duplicating its
        // original partition's, which the pair-level distinct
        // collapses (same doc_id, same n_ng — a pure no-op).
        // Tokenized ONCE, checkpointed: the gram table feeds the
        // posting write and (filtered to newDocs) the probe join.
        val postingGrams = graft.operators.Dedup
          .ngramsWithSize(
            merged.join(batch.select(col("doc_id")), Seq("doc_id"),
              "left_semi").select(col("doc_id"), col("text")), n)
          .localCheckpoint()
        val newGrams = postingGrams
          .join(newDocs.select(col("doc_id")), Seq("doc_id"), "left_semi")
        val postingsRoot = new org.apache.hadoop.fs.Path(path + "_postings")
        // crash hygiene BEFORE reading history: partitions without a
        // _SUCCESS marker are crashed partial writes — unreadable by
        // definition and never part of any committed knockout (the
        // snapshot commits strictly after its batch's postings), so
        // their batch either replays (checkpointed stream) or never
        // durably existed. Committed partitions are NEVER deleted.
        if (fs.exists(postingsRoot))
          fs.listStatus(postingsRoot)
            .filter(s => s.isDirectory &&
              !fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
            .foreach(s => fs.delete(s.getPath, true))
        // partition pick: batch=<batchId> normally; if that dir exists
        // it is COMMITTED (partials were just swept) — either a true
        // replay of this batch (checkpointed stream, identical rows)
        // or an id collision from a restart WITHOUT a checkpointed id
        // sequence, whose dir holds a DIFFERENT batch's evidence. Both
        // resolve the same way: keep the committed dir, write to the
        // next free index — the worst case is duplicated posting rows
        // for replayed docs, which the pair-level distinct collapses.
        val primary = new org.apache.hadoop.fs.Path(postingsRoot,
          s"batch=$batchId")
        val batchDir =
          if (!fs.exists(primary)) primary
          else {
            // numeric-only parse with an overflow guard: a foreign dir
            // under the postings root that merely starts with batch=
            // must be skipped, not throw and fail every future batch.
            // In-place rewrite of batch=<batchId> is deliberately NOT
            // done: the committed dir may hold a DIFFERENT batch's
            // evidence (restart without a checkpointed id sequence),
            // and overwriting would destroy it — next-free-index is
            // safe for both that case and a true replay (duplicate
            // posting rows collapse in the pair-level distinct).
            val maxIdx = (fs.listStatus(postingsRoot)
              .map(_.getPath.getName)
              .collect { case s if s.startsWith("batch=") =>
                scala.util.Try(s.substring("batch=".length).toLong).toOption }
              .flatten :+ batchId)
              .max
            new org.apache.hadoop.fs.Path(postingsRoot,
              s"batch=${maxIdx + 1}")
          }
        val history: Option[DataFrame] =
          if (fs.exists(postingsRoot) &&
              fs.listStatus(postingsRoot).nonEmpty)
            Some(spark.read.parquet(postingsRoot.toString))
          else None
        // no committed snapshot + posting history: legitimate ONLY as a
        // replay of the very first batch (postings commit before the
        // snapshot), in which case every posting doc is a doc of THIS
        // batch. A posting doc outside the batch proves a committed
        // corpus existed and was lost externally — rebuilding from the
        // batch would silently truncate it, so fail the batch instead.
        if (snapshotOpt.isEmpty) history.foreach { h =>
          val foreign = h
            .select(col("doc_id"))
            .join(broadcast(batch.select(col("doc_id")).distinct()),
              Seq("doc_id"), "left_anti")
          if (!foreign.isEmpty)
            throw new IllegalStateException(
              s"curatedIngest: posting history at $postingsRoot holds " +
                "docs from batches whose snapshot is gone — refusing to " +
                "rebuild the corpus from the current batch alone")
        }
        val baseGrams = history.fold(postingGrams)(h =>
          h.select(col("doc_id"), col("ng"), col("n_ng"))
            .unionByName(postingGrams.select(
              col("doc_id"), col("ng"), col("n_ng"))))
        // blanket knockout: any doc on the HIGHER side of a new pair
        // goes out — including previously admitted snapshot docs (a
        // lower-id near-dup just arrived) and docs already out (no-op).
        // Stale postings of evicted exact-dup keepers may sit in
        // history; their knockouts are subsumed by their lower-id
        // replacements' postings and their own ids fail the join below
        // (see the operator doc).
        val newlyOut = graft.operators.Dedup
          .ngramJaccardAgainstGrams(baseGrams, newGrams, threshold)
          .select(col("doc_id_2").as("doc_id")).distinct()
          .withColumn("hit", lit(true))
        // postings commit BEFORE the snapshot: a crash in between
        // replays the batch against intact history (idempotent batch
        // partition rewrite), whereas the reverse order could commit
        // knockouts whose evidence was never persisted. Empty batches
        // write nothing — every existing partition holds real files,
        // so the root read above never sees a file-less dataset.
        if (!postingGrams.isEmpty)
          postingGrams.select(col("doc_id"), col("ng"), col("n_ng"))
            .write.mode("overwrite").parquet(batchDir.toString)
        val updated = merged
          .join(newlyOut, Seq("doc_id"), "left_outer")
          .withColumn("out", col("out") || coalesce(col("hit"), lit(false)))
          .drop("hit")
          .localCheckpoint()
        SnapshotStore.commit(updated, path)
        // drop BOTH per-batch checkpoints (merge result + gram table):
        // a stream runs unboundedly many batches, and blocks left to
        // the ContextCleaner accumulate in the meantime
        Seq(updated, postingGrams).foreach { df =>
          df.queryExecution.analyzed.collectFirst {
            case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
          }.foreach(_.unpersist(blocking = false))
        }
        ()
      }
      .outputMode("update")
      .start()

  /** The current committed snapshot of a SnapshotStore-backed sink
    * (upsertSink / curatedIngest), raw — including tombstones. Throws
    * if no generation was ever committed.
    */
  def readSnapshot(spark: SparkSession, path: String): DataFrame =
    SnapshotStore.read(spark, path).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot at $path"))

  /** The curated corpus as of the last committed batch: tombstones
    * dropped, then the batch pipeline's quality gates — same output
    * schema and ordering as Pipeline.curatedCorpus.
    */
  def curatedSnapshot(spark: SparkSession, path: String,
      minTokens: Int = 10): DataFrame =
    readSnapshot(spark, path)
      .filter(!col("out"))
      .withColumn("n_tokens",
        graft.functions.TextOps.tokenCount(col("text")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .filter(col("lang").isin("en", "de", "fr", "es"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy(col("doc_id"))
}
