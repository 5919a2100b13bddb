package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus-wide suffix ranking by prefix doubling (Manber & Myers 1993),
  * the character-level machinery behind exact-substring dedup (Lee et
  * al. 2022 build suffix arrays for "Deduplicating Training Data Makes
  * Language Models Better"; the existing [[Dedup]] span family works on
  * word-aligned 64-bit gram HASHES — this is the hash-free, alignment-
  * free exact variant, bounded to [[PrefixLen]]-character resolution).
  *
  * Extension operator (no reference analog — the reference's dataflow
  * is word-level, `src/tema1.cpp:88-99`).
  *
  * == What it computes ==
  *
  * For every position of every document's normalized character stream
  * (words joined by single spaces — the [[TextOps.charShingles]]
  * stream), the 0-based DENSE rank of its suffix among ALL suffixes of
  * the corpus, where suffixes compare by their first [[PrefixLen]]
  * characters (memcmp order; ties beyond that horizon collapse to one
  * rank — the k-bounded suffix array used in practice, since dedup
  * windows are fixed-length anyway). Equal ranks == equal 32-char
  * windows, so downstream counting of repeated spans needs no string
  * comparison at all.
  *
  * == Scale shape ==
  *
  * Textbook prefix doubling, shuffles bounded by log2(PrefixLen)
  * rounds: round h turns h-prefix ranks into 2h-prefix ranks via the
  * rank pair (r[pos], r[pos+h]).
  *
  *  - r[pos+h] is a `lead` window per (doc_id, pos) — suffixes never
  *    cross documents, so the partition is doc-sized, never skewed
  *    past the longest document.
  *  - the pair -> new-rank assignment is [[Ranks.rankByKey]] over the
  *    DISTINCT pair table: the same skew-proof distributed prefix-sum
  *    machinery as ccnet's percent rank (equi-depth buckets via
  *    percentile splits + the codegen ArrayCountLess assignment) — no
  *    global sort, no single-reducer window anywhere. Early rounds
  *    have tiny distinct tables (<= alphabet^2h); by the time the
  *    table approaches corpus size the ties are nearly gone, which is
  *    exactly the regime the bucketed rank balances.
  *  - rounds stop early once every suffix's rank is unique: if all
  *    2h-prefixes are distinct, extending the horizon can neither
  *    reorder (prefix rule) nor split ties (none left), so the ranks
  *    are already the PrefixLen ones.
  *
  * Determinism: ranks are exact integers from exact prefix sums;
  * initial ranks are raw char codes (order- and equality-preserving
  * for 1-prefixes); no sampled range exchange is involved (the bucket
  * splits are percentile_approx values used only through the pure
  * ArrayCountLess assignment, so any splits give the same ranks).
  */
object SuffixRanks {

  /** Rank horizon: suffixes compare by their first 32 characters. */
  val PrefixLen = 32

  /** Per-doc normalized char stream (non-empty only). */
  private def streams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        array_join(TextOps.words(col("text")), " ").as("s"))
      .filter(length(col("s")) > 0)

  /** (doc_id, pos [1-based], r): the PrefixLen-bounded corpus-wide
    * dense suffix rank of every position. */
  def suffixRanks(docs: DataFrame): DataFrame = {
    // initial 1-prefix ranks: the char code itself (stream is [a-z ],
    // so ascii == memcmp byte order; density is irrelevant, only order
    // and equality feed the doubling)
    // split(s, "") stays inside whole-stage codegen (the array HOF
    // alternative is interpreted) — this explode is the one
    // corpus-chars-sized projection, the op's hot path.
    //
    // Each round's output is localCheckpoint()ed, not persist()ed:
    // persist keeps the LOGICAL plan, and five chained rankByKey
    // rounds nest it past what AQE can even render (the repo's
    // iterative ops — pagerank, k-means — all truncate per round the
    // same way). Checkpoint blocks are released by the caller-side
    // Cleanup between queries, never mid-query (a truncated lineage
    // cannot recompute). A multi-hour production run would swap these
    // for reliable checkpoints; the shape is identical.
    var t = streams(docs)
      .select(col("doc_id"), posexplode(split(col("s"), "")))
      .filter(length(col("col")) > 0) // defensive vs trailing empties
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        ascii(col("col")).cast("long").as("r"))
      .localCheckpoint()
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    var h = 1
    var done = false
    while (h < PrefixLen && !done) {
      // a missing next-rank (suffix ends inside the horizon) sorts
      // BELOW every real rank — the prefix rule "shorter sorts first"
      val paired = t
        .withColumn("r2", coalesce(lead(col("r"), h).over(byDoc), lit(-1L)))
        .localCheckpoint()
      val stats = paired.agg(
        count(lit(1)).as("n"),
        count_distinct(struct(col("r"), col("r2"))).as("nd"),
        count_distinct(col("r")).as("ndPrev")).head()
      val (n, nd, ndPrev) =
        (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      if (ndPrev == n) {
        // every rank already unique BEFORE this round: nothing to
        // split or reorder, current t is final
        done = true
      } else {
        val dk = paired.select(col("r"), col("r2")).distinct()
        val ranked =
          Ranks.rankByKey(dk, lit(1), col("r"), col("r2"), "nr")
        t = paired
          .join(ranked, Seq("r", "r2"))
          .select(col("doc_id"), col("pos"), col("nr").as("r"))
          .localCheckpoint()
        if (nd == n) done = true // this round made every rank unique
        h *= 2
      }
    }
    t
  }

  /** Process-level ON-DISK index cache — the deployment posture: a
    * suffix-rank table is built ONCE offline and persisted (Lee et
    * al. write the suffix array to disk and serve dedup queries from
    * it); query jobs read it back. Same pattern as
    * [[Ivf.cachedCentroids]], but parquet-backed instead of
    * driver-held because the table is corpus-sized: the round-trip
    * also makes the cache immune to the harnesses' between-query
    * block cleanup, which would unpersist an in-memory checkpoint out
    * from under the next consumer. Determinism makes cache-vs-rebuild
    * unobservable.
    *
    * Staleness contract ([[graft.sources.CorpusStamp]]): the index
    * directory is NAMED by the corpus stamp it was built under, so a
    * corpus mutation (ingest, rewrite) changes the stamp, misses the
    * directory, and transparently rebuilds — while an unchanged corpus
    * re-serves the persisted index even across PROCESSES (`_SUCCESS`
    * gates against a crashed half-write; determinism makes the reuse
    * unobservable). Superseded stamp directories are left in place:
    * an in-flight query in this or another process may still be
    * streaming the old files, and the parent is tmp-rooted anyway —
    * a production deployment would prune by retention the way
    * [[graft.streaming.BucketStore]] prunes generations.
    */
  private val rankDirCache =
    new graft.sources.StampedCache[String, String]()

  private def indexPath(dir: String, stamp: Long): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_suffix_idx", safe,
      f"s$stamp%016x").toString
  }

  def cachedRanks(spark: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    val stamp = graft.sources.CorpusStamp.of(
      spark, s"$dir/documents.parquet")
    val path = rankDirCache.get(dir, stamp) {
      val out = indexPath(dir, stamp)
      val success = new org.apache.hadoop.fs.Path(out, "_SUCCESS")
      val fs = success.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success))
        suffixRanks(graft.sources.Tables.documents(spark, dir))
          .write.mode("overwrite").parquet(out)
      out
    }
    spark.read.parquet(path)
  }

  /** Bench hook: drop the in-process entry AND the persisted index so
    * the next cachedRanks call measures a genuine rebuild (a rerun
    * served from `_SUCCESS` would launder a build regression into
    * "noise"). */
  private[graft] def invalidateIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    rankDirCache.invalidate(dir)
    val stamp = graft.sources.CorpusStamp.of(
      spark, s"$dir/documents.parquet")
    val p = new org.apache.hadoop.fs.Path(indexPath(dir, stamp))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Registry shape: ordered (doc_id, pos, r), served from the cached
    * on-disk index. */
  def suffixRankTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    cachedRanks(spark, dir).orderBy(col("doc_id"), col("pos"))

  // ------------------------------------------------------------------
  // Incremental maintenance: merge a delta corpus into a persisted
  // rank table without re-running the doubling over old positions.
  // ------------------------------------------------------------------

  /** Base-32 packing of a window's chars [start, start+len): ' ' -> 1,
    * 'a'..'z' -> 2..27, absent (past end) -> 0. Left-to-right place
    * value makes long comparison == lexicographic comparison with
    * absent-below-everything — exactly the doubling's "shorter sorts
    * first" prefix rule — and >=1 codes for real chars make the
    * packing injective. 12 chars x 5 bits < 2^63, so PrefixLen = 32
    * chars span THREE longs (12 + 12 + 8).
    */
  private def packSeg(w: Column, start: Int, len: Int): Column =
    aggregate(
      sequence(lit(start), lit(start + len - 1)),
      lit(0L),
      (acc, i) => {
        val c = ascii(w.substr(i, lit(1)))
        acc * 32L +
          when(c === 32, 1L).when(c >= 97, (c - 95).cast("long"))
            .otherwise(0L)
      })

  private def packedCols(w: Column): Seq[(String, Column)] = Seq(
    "l1" -> packSeg(w, 1, 12), "l2" -> packSeg(w, 13, 12),
    "l3" -> packSeg(w, 25, 8))

  /** (doc_id, pos, l1, l2, l3): every position's PrefixLen-char
    * window, packed into three longs (12 + 12 + 8 chars). */
  private def packedWindows(docs: DataFrame): DataFrame = {
    val w = col("s").substr(col("pos"), lit(PrefixLen))
    streams(docs)
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(1), length(col("s")))).as("pos"))
      .select(Seq(col("doc_id"), col("pos")) ++
        packedCols(w).map { case (n, c) => c.as(n) }: _*)
  }

  /** 0-based dense rank `nr` of DISTINCT (l1, l2, l3) rows — three
    * chained [[Ranks.rankByKey]] rounds (rank (l1, l2) pairs, then
    * fold l3 in — the same pair-rank machinery as the doubling itself,
    * so no string percentile or sampled range exchange anywhere).
    * Each rank round runs on a distinct pair table to honor
    * rankByKey's id-uniqueness contract.
    */
  private def rankPacked(classes: DataFrame): DataFrame = {
    val dk1 = classes.select(col("l1"), col("l2")).distinct()
    val r1 = Ranks.rankByKey(dk1, lit(1), col("l1"), col("l2"), "k1")
      .select(col("l1"), col("l2"), col("k1"))
    val withK1 = classes.join(r1, Seq("l1", "l2"))
    val dk2 = withK1.select(col("k1"), col("l3")).distinct()
    val r2 = Ranks.rankByKey(dk2, lit(1), col("k1"), col("l3"), "nr")
      .select(col("k1"), col("l3"), col("nr"))
    withK1.join(r2, Seq("k1", "l3"))
      .select(col("l1"), col("l2"), col("l3"), col("nr"))
  }

  /** Merge `deltaDocs` into a persisted rank table (`oldIndex` built
    * over `oldDocs`, the [[suffixRanks]] output schema) WITHOUT
    * re-running the doubling over old positions — the
    * [[graft.operators.InvertedIndex.incremental]] posture for the
    * suffix index, so an ingest pays delta-plus-merge instead of a
    * full rebuild. Returns the exact full-rebuild table:
    * `incremental(idx(A), A, B) == suffixRanks(A ∪ B)` bit-for-bit
    * ([[graft.SuffixRanksIncrementalSpec]], and the
    * `suffix_ranks_incremental` oracle replays the merged corpus's
    * dense rank wholesale in DuckDB).
    *
    * Why this is cheap: the doubling's cost is log2(PrefixLen) rank
    * rounds over ALL positions. The merge instead
    *
    *  1. regenerates ONE representative window per old rank class —
    *     a positions aggregate (min (doc_id, pos) per r) plus one
    *     join against the old document streams; no iteration;
    *  2. materializes delta windows directly (delta-sized);
    *  3. re-ranks the merged DISTINCT-class table — class-sized, one
    *     packed-pair rank instead of five full-corpus rounds (a
    *     32-char window packs into two longs, so two chained
    *     [[Ranks.rankByKey]] rounds order it exactly);
    *  4. rewrites position ranks through class-level joins (old
    *     positions join on their old rank; delta positions join on
    *     their packed window).
    *
    * Old positions are touched by exactly one aggregate and one join —
    * no per-round shuffles — so at 100 TB the merge is ~3 corpus-sized
    * exchanges versus the rebuild's ~15, plus doubling-free delta
    * work. Correctness of the rank arithmetic: the merged class set is
    * the DISTINCT union of old-class windows and delta-class windows,
    * and dense-ranking it reproduces the old ranks' relative order
    * (old classes re-rank by the same lexicographic key that produced
    * them) while interleaving delta-only classes — so old positions'
    * ranks shift exactly as a full rebuild would shift them.
    * Contract: `oldIndex` IS `suffixRanks(oldDocs)` (or a previous
    * incremental output over them) and delta doc_ids are disjoint
    * from old doc_ids — both already the ingest invariants.
    */
  def incremental(oldIndex: DataFrame, oldDocs: DataFrame,
      deltaDocs: DataFrame): DataFrame = {
    // 1. representative (smallest (doc_id, pos)) per old class, then
    // its window regenerated from the old streams and packed
    val reps = oldIndex
      .groupBy(col("r"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("rep"))
      .select(col("r"), col("rep.doc_id").as("doc_id"),
        col("rep.pos").as("pos"))
    val aW = col("s").substr(col("pos"), lit(PrefixLen))
    val aClasses = reps.join(streams(oldDocs), Seq("doc_id"))
      .select(Seq(col("r")) ++
        packedCols(aW).map { case (n, c) => c.as(n) }: _*)
      .localCheckpoint()
    // 2-3. delta windows + merged distinct classes, re-ranked
    val bPos = packedWindows(deltaDocs).localCheckpoint()
    val merged = aClasses.select(col("l1"), col("l2"), col("l3"))
      .unionByName(bPos.select(col("l1"), col("l2"), col("l3")))
      .distinct()
    val ranked = rankPacked(merged).localCheckpoint()
    // 4. class-level rewrites: old positions ride their old rank, delta
    // positions ride their packed window
    val aMap = aClasses.join(ranked, Seq("l1", "l2", "l3"))
      .select(col("r"), col("nr"))
    val aNew = oldIndex.join(aMap, Seq("r"))
      .select(col("doc_id"), col("pos"), col("nr").as("r"))
    val bNew = bPos.join(ranked, Seq("l1", "l2", "l3"))
      .select(col("doc_id"), col("pos"), col("nr").as("r"))
    aNew.unionByName(bNew)
  }

  /** Registry form: re-ingest a deterministic slice of the corpus
    * (every 7th document, re-keyed past the current max id, text
    * REVERSED so the delta contributes genuinely new windows that
    * interleave everywhere, not just duplicates) and merge it into the
    * persisted index. The oracle replays the merged corpus's dense
    * rank from scratch in DuckDB — only a correct merge (shifted old
    * ranks AND interleaved delta ranks) reproduces it.
    */
  def incrementalQuery(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val delta = docs
      .crossJoin(broadcast(docs.agg(max(col("doc_id")).as("mx"))))
      .filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + col("mx") + 1).as("doc_id"),
        reverse(col("text")).as("text"))
    incremental(cachedRanks(spark, dir), docs, delta)
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Per-doc repeated-span profile from the suffix ranks: how many of
    * the doc's PrefixLen-char windows occur elsewhere in the corpus
    * (exact, alignment-free), and the hottest window's occurrence
    * count. Occurrences are counted on RANKS — a 64-bit key — never on
    * strings; the DuckDB oracle recounts them on the strings
    * themselves, so a rank collision or split would mismatch here.
    * Every document appears (zero-filled), the repo's per-doc
    * convention.
    */
  def repeatedSpans(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    repeatedSpansOf(graft.sources.Tables.documents(spark, dir),
      cachedRanks(spark, dir))

  /** Spec/raw form: profile `docs` against a freshly built rank table. */
  def repeatedSpans(docs: DataFrame): DataFrame =
    repeatedSpansOf(docs, suffixRanks(docs))

  private def repeatedSpansOf(docs: DataFrame, ranks: DataFrame)
      : DataFrame = {
    val t = ranks
    val occ = t.groupBy(col("r")).agg(count(lit(1)).as("occ"))
    val per = t.join(occ, Seq("r"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_pos"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_repeated"),
        max(col("occ")).as("max_occ"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        coalesce(col("max_occ"), lit(0L)).as("max_occ"))
      .orderBy(col("doc_id"))
  }
}
