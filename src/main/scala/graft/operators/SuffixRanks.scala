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
    */
  private val rankDirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def cachedRanks(spark: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    val path = rankDirCache.computeIfAbsent(dir, { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft_suffix_idx").toString
      suffixRanks(graft.sources.Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(out)
      out
    })
    spark.read.parquet(path)
  }

  /** Registry shape: ordered (doc_id, pos, r), served from the cached
    * on-disk index. */
  def suffixRankTable(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    cachedRanks(spark, dir).orderBy(col("doc_id"), col("pos"))

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
