package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, SnapshotStore}

/** Dev-only: the pre-bucketing (round-12, full-rewrite) curated
  * ingest resurrected verbatim for A/B timing against the bucketed
  * sink. Not part of the product surface.
  */
object OldIngestRef {
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
}
