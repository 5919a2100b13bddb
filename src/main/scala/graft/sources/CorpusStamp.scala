package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Corpus change token for the offline-index staleness contract.
  *
  * The engine leans on persisted/cached offline artifacts — IVF
  * centroids, PQ codebooks, PCA fits, unigram vocabularies, the
  * parquet suffix-rank index, parquet footer stats. Each is built over
  * a corpus PATH, and every consumer used to assume "immutable corpus
  * at a given path": a user who ingests a batch (or rewrites a table)
  * and re-queries would silently hit a stale index. Every cache now
  * keys its value to this stamp and transparently rebuilds on
  * mismatch, so ingest-then-query is always post-ingest-correct.
  *
  * The stamp is a METADATA token, not a data hash — it must be exact
  * about change without scanning data:
  *
  *  - A [[graft.streaming.BucketStore]] root short-circuits to its
  *    current committed generation number: commits are atomic and
  *    generations strictly monotone, so the generation IS the change
  *    token, at the cost of one directory listing. This is the
  *    `curatedIngest` wiring — every ingest batch commits a new
  *    generation, which flips the stamp of any index built over the
  *    store. (At 100 TB this matters: a recursive listing of a
  *    million-file store per index access would be an object-store
  *    LIST storm; the generation read is O(#generations), and the
  *    store prunes those.)
  *  - Any other path hashes its recursive file listing — (relative
  *    path, length, mtime) per file, order-insensitively combined.
  *    Parquet writers never mutate files in place (part files carry
  *    fresh names; overwrite replaces the directory), so any commit
  *    under the path changes the listing. mtime is belt-and-braces on
  *    top of the name set.
  *
  * Order-insensitive combine: listing order is filesystem-dependent,
  * so per-file FNV-1a hashes are folded with (sum, xor) — the same
  * two-moment digest `tools/check_oracle.py` uses — packed into one
  * long. A missing path stamps to a distinguished constant (an index
  * built before its corpus existed can never validate).
  */
object CorpusStamp {

  val Missing: Long = 0x6d697373696e6721L // "missing!"

  private def fnv1a(s: String, seed: Long): Long = {
    var h = if (seed == 0L) 0xcbf29ce484222325L else seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Change token for the bytes under `path` (file or directory). */
  def of(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Missing
    graft.streaming.BucketStore.currentManifest(spark, path) match {
      case Some(m) => fnv1a(s"gen:${m.gen}:${m.spec}", 0L)
      case None =>
        val base = p.toUri.getPath
        var sum = 0L
        var xor = 0L
        var n = 0L
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          val rel = st.getPath.toUri.getPath.stripPrefix(base)
          val h = fnv1a(
            s"$rel|${st.getLen}|${st.getModificationTime}", 0L)
          sum += h; xor ^= h; n += 1
        }
        // fold both moments + count so set-level collisions need a
        // simultaneous sum AND xor match
        fnv1a(s"$n", sum + 31 * xor)
    }
  }
}

/** Stamp-validating process-level memo — the shared shape behind every
  * offline-artifact cache ([[graft.operators.Ivf]] centroids,
  * [[graft.operators.Pq]] codebooks, unigram vocabularies, …): a value
  * is served only while the corpus stamp it was built under still
  * matches; otherwise it is transparently rebuilt. Builds are
  * bit-deterministic throughout the repo, so two racing builders (this
  * is get/put, not a lock) can only write identical values — the same
  * posture the un-stamped caches had.
  */
final class StampedCache[K, V] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[K, (Long, V)]()

  def get(key: K, stamp: Long)(build: => V): V = {
    val cur = m.get(key)
    if (cur != null && cur._1 == stamp) cur._2
    else {
      val v = build
      m.put(key, (stamp, v))
      v
    }
  }

  /** The entry currently held under `key` — stamp INCLUDED, no
    * validation — for the ingest-maintenance hooks: a maintainer fired
    * AFTER a commit must reach the artifact served under the
    * PRE-commit stamp (a stamped get() would see the flipped stamp and
    * rebuild over the already-mutated corpus, folding the delta in
    * twice). The caller checks the returned stamp against the captured
    * pre-commit stamp; a mismatch means the held artifact does not
    * describe the corpus the delta extends, and the maintainer must
    * fall back (skip — the flipped stamp already invalidates).
    */
  def peek(key: K): Option[(Long, V)] = Option(m.get(key))

  /** Current entries whose stamp matches, for prefix-serving lookups
    * (the PCA cache serves smaller k from a larger fit). */
  def snapshot(stamp: Long): Map[K, V] = {
    import scala.jdk.CollectionConverters._
    m.asScala.collect { case (k, (s, v)) if s == stamp => (k, v) }.toMap
  }

  /** Drop one entry — the bench's forced-rebuild hook: a flagged
    * index-build rerun must measure the BUILD, not a cache hit that
    * would launder a real build regression into "noise". */
  def invalidate(key: K): Unit = { m.remove(key); () }

  /** Install a value under (key, stamp) unconditionally — the
    * incremental-maintenance hook: a maintained artifact (e.g. a
    * delta-updated centroid table) is placed under the MUTATED
    * corpus's stamp so subsequent reads serve it instead of paying a
    * full rebuild. Unlike get(), an existing same-stamp entry is
    * replaced, not served. */
  def put(key: K, stamp: Long, v: V): Unit = { m.put(key, (stamp, v)); () }

  /** Drop every entry matching `p` — for caches that serve one request
    * from another entry (the PCA prefix path serves k from any kk >= k
    * fit), where a single-key invalidate leaves a servable alias and
    * the forced rebuild would silently time a cache hit. */
  def invalidateWhere(p: K => Boolean): Unit = {
    import scala.jdk.CollectionConverters._
    m.keySet.asScala.filter(p).foreach(m.remove)
  }
}
