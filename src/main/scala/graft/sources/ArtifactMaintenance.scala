package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest-commit → incremental-artifact-maintenance wiring.
  *
  * Every offline artifact family (IVF centroids, PQ codebooks, the
  * suffix-rank index, PCA fits, tokenizer vocabularies) is stamped to
  * its corpus ([[CorpusStamp]]): an ingest commit flips the stamp and
  * INVALIDATES the artifact, so the staleness contract already
  * guarantees no query ever serves a stale index — by paying a full
  * rebuild on the first post-ingest access. The delta maintainers
  * (`Ivf.incrementalCentroids`, `Pq.incrementalCodebook`,
  * `SuffixRanks.incremental`, …) can fold an ingest batch in at a
  * fraction of that cost, but until this hook existed they had to be
  * invoked by hand — the pipeline behavior a user actually wants is:
  * a commit fires delta maintenance for every REGISTERED family, and
  * the first post-ingest query serves the maintained artifact with
  * zero rebuild.
  *
  * Contract per fired commit:
  *
  *  - `preStamp` is the corpus stamp captured immediately BEFORE the
  *    commit. A maintainer merges only when the artifact it holds was
  *    built under exactly that stamp ([[StampedCache.peek]]); anything
  *    else (process restart, a skipped commit in between) falls back
  *    to doing nothing — the flipped stamp already forces a correct
  *    rebuild on next access, so maintenance is purely an optimization
  *    and can NEVER be a correctness hazard.
  *  - `delta` is the batch's newly ADMITTED, non-tombstoned rows,
  *    materialized (localCheckpoint) before the commit — a
  *    post-commit lineage over the superseded generation would fail
  *    once the store prunes it.
  *  - `pureAppend` is true iff no previously committed row was
  *    evicted, re-keyed, or tombstoned by this commit — the precise
  *    condition under which "old corpus = current corpus minus delta
  *    ids" holds and an additive merge is sound. Maintainers that
  *    cannot express deletions (all of them — the incremental paths
  *    are additive by design) skip non-pure commits; this is the same
  *    knows-when-it-stops-being-incremental posture as the drift
  *    gates.
  *
  * Failure policy: a maintainer that throws is LOGGED and skipped,
  * never propagated into the ingest — correctness is owned by the
  * staleness contract, so the worst outcome of a failed maintainer is
  * one full rebuild on the next query, while an exception escaping
  * into foreachBatch would kill the stream.
  *
  * Registration is per store path and per family name (re-registering
  * a family replaces it); `clear` detaches everything at a path —
  * specs and benches use it the way a deployment would stop a
  * maintenance sidecar.
  */
/** First-promotion-wins commit of a fully-written attempt dir to a
  * stamp-named artifact path — shared by every persisted-artifact
  * family (suffix index, unigram word table). Two layers close the
  * promote-by-rename TOCTOU (an fs.exists pre-check leaves a window in
  * which Hadoop's local-FS rename nests the attempt INSIDE a
  * concurrently committed destination):
  *
  *  1. the rename goes through `FileContext` with `Options.Rename.NONE`
  *     (fails when the destination exists instead of nesting);
  *  2. belt-and-braces for any FS whose no-overwrite rename still races
  *     internally: afterwards each process checks for ITS OWN attempt
  *     name nested under the committed dir and deletes it — every
  *     possible stray is policed by exactly the process that could have
  *     created it.
  *
  * Losers (dst already committed) discard their attempt and serve the
  * winner; builds are bit-deterministic throughout the repo, so the
  * outcome is unobservable.
  */
object AtomicPromote {
  def apply(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      attempt: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(attempt, dst, org.apache.hadoop.fs.Options.Rename.NONE)
    catch { case _: java.io.IOException =>
      fs.delete(attempt, true); ()
    }
    val nested = new org.apache.hadoop.fs.Path(dst, attempt.getName)
    if (fs.exists(nested)) { fs.delete(nested, true); () }
  }
}

object ArtifactMaintenance {

  /** Everything one ingest commit hands its maintainers. */
  final case class Commit(
      path: String,
      preStamp: Long,
      delta: DataFrame,
      pureAppend: Boolean)

  type Maintainer = (SparkSession, Commit) => Unit

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String,
      scala.collection.immutable.ListMap[String, Maintainer]]()

  /** Register `family`'s maintainer for ingest commits at `path`. */
  def register(path: String, family: String)(m: Maintainer): Unit = {
    reg.compute(path, (_, cur) => {
      val base = Option(cur)
        .getOrElse(scala.collection.immutable.ListMap.empty[String, Maintainer])
      base.updated(family, m)
    })
    ()
  }

  /** Detach every maintainer registered at `path`. */
  def clear(path: String): Unit = { reg.remove(path); () }

  /** Fast no-maintainers check — the ingest hot path must not pay for
    * delta materialization or the pure-append probe when nothing is
    * listening. */
  private[graft] def registered(path: String): Boolean =
    reg.containsKey(path)

  /** Fire every maintainer registered at `commit.path`, in
    * registration order, isolating failures per family. */
  private[graft] def fire(spark: SparkSession, commit: Commit): Unit = {
    val ms = Option(reg.get(commit.path)).getOrElse(
      scala.collection.immutable.ListMap.empty[String, Maintainer])
    ms.foreach { case (family, m) =>
      try m(spark, commit)
      catch { case e: Throwable =>
        // scalastyle:off println
        System.err.println(s"[graft-maintenance] $family failed at " +
          s"${commit.path}: ${e.getMessage} — artifact will rebuild " +
          "on next access (staleness contract)")
        // scalastyle:on println
      }
    }
  }
}
