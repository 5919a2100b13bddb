package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Deduplication operators for LLM training-data pipelines: exact
  * (content hash), layout-blind exact (normalized fingerprint), exact
  * n-gram Jaccard similarity join, MinHash+LSH near-dup (the scale
  * path), and SimHash.
  *
  * Scale notes:
  *  - Exact dedup is one hash + one shuffle on the hash — the only
  *    correct O(n) dedup at 100 TB. md5 is used (not xxhash) so the
  *    DuckDB oracle can recompute keys.
  *  - The exact Jaccard join NEVER cross-joins: candidates are pairs
  *    sharing at least one n-gram (inverted-index join), which is the
  *    PHiDJ-style pruning — pairs sharing nothing have similarity 0 and
  *    are provably below any positive threshold. Hot n-grams are capped
  *    (`maxDocFreq`) to stop the quadratic blowup a stop-n-gram would
  *    cause; a dropped n-gram can only lower recall for pairs whose
  *    OTHER shared n-grams are also hot, which near-dup pairs never are.
  *  - MinHash+LSH replaces the candidate join's n-gram fanout with
  *    b=32 constant-size band keys per doc: shuffle volume per doc is
  *    O(b), independent of doc length — the 100 TB path. Band
  *    parameters (n=64, r=2, b=32) put the s-curve knee near 0.35, so
  *    pairs at the 0.5 output threshold are caught with
  *    P(miss) = (1-s^2)^32 < 1e-14.
  */
object Dedup {

  // ---------- exact ----------

  /** Per-doc content-hash clustering: every doc gets its cluster key and
    * keeper flag (keeper = min doc_id in the cluster). Output covers all
    * docs so downstream can either drop non-keepers or audit clusters.
    */
  def exactClusters(docs: DataFrame, key: Column): DataFrame = {
    val w = Window.partitionBy(col("content_key"))
    docs
      .withColumn("content_key", key)
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_keeper", col("doc_id") === min(col("doc_id")).over(w))
      .select(col("doc_id"), col("content_key"), col("cluster_size"),
        col("is_keeper"))
  }

  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    exactClusters(Tables.documents(spark, dir), md5(col("text")))
      .orderBy(col("doc_id"))

  /** Layout-blind exact dedup: hash of the normalized word stream, so
    * whitespace/punctuation/case variants collapse.
    */
  def fingerprintDedup(spark: SparkSession, dir: String): DataFrame =
    exactClusters(Tables.documents(spark, dir),
      md5(array_join(TextOps.words(col("text")), " ")))
      .orderBy(col("doc_id"))

  // ---------- exact n-gram Jaccard similarity join ----------

  /** (doc_id, ngram) distinct pairs; the unit of Jaccard similarity. */
  private def docNgrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"),
        explode(TextOps.wordNgrams(col("text"), n)).as("ngram"))
      .distinct()

  /** Exact Jaccard similarity join on word n-grams: all pairs with
    * jaccard >= threshold. Candidate generation only considers n-grams
    * with doc frequency <= maxDocFreq (skew guard; see scale notes) —
    * but verification recounts the intersection over the FULL n-gram
    * sets, so surviving pairs carry the true Jaccard value.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = 1000): DataFrame = {
    // no .cache(): the distinct's Exchange subtree is identical across
    // all uses, so ReuseExchange materializes it once per execution
    // without pinning executor storage memory for the session
    val ng = docNgrams(docs, n)
    val sizes = ng.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
    val rare = ng
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("ngram"))))
      .filter(col("df") <= maxDocFreq)
      .select(col("doc_id"), col("ngram"))
    val cands = rare.as("a")
      .join(rare.as("b"),
        col("a.ngram") === col("b.ngram") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .distinct()
    verifiedJaccard(cands, ng, sizes, threshold)
  }

  def ngramJaccardDedup(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir))
      .orderBy(col("doc_id_1"), col("doc_id_2"))

  // ---------- MinHash + LSH ----------

  val NumHashes = 64
  val BandRows = 2
  val NumBands: Int = NumHashes / BandRows // 32

  /** MinHash signature per doc: NumHashes independent permutations
    * simulated by seeded xxhash64; each is a plain `min` aggregate, so
    * the whole signature is ONE map-side-combined hash aggregate — no
    * per-doc array materialization of shingles.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3): DataFrame = {
    val hashes = (0 until NumHashes).map(i =>
      min(xxhash64(lit(i), col("ngram"))).as(s"h$i"))
    docNgrams(docs, n)
      .groupBy(col("doc_id"))
      .agg(hashes.head, hashes.tail: _*)
  }

  /** Candidate pairs via banding: docs agreeing on all BandRows hashes
    * of any band. Emits b rows per doc (constant fanout), self-joins on
    * the (band, band_hash) key.
    */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until NumBands).map { b =>
      val parts = (0 until BandRows).map(r => col(s"h${b * BandRows + r}"))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("bh"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates, then EXACT
    * Jaccard verification of candidates only (so output = the exact
    * similarity join, at LSH cost). At 100 TB the verification join
    * touches only the candidate pairs' n-gram sets.
    */
  def minhashLshDedup(spark: SparkSession, dir: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ng = docNgrams(docs, n)
    val sizes = ng.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
    val cands = lshCandidates(minhashSignatures(docs, n))
    verifiedJaccard(cands, ng, sizes, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs over full n-gram
    * sets (shared by the exact and LSH paths).
    */
  private def verifiedJaccard(cands: DataFrame, ng: DataFrame,
      sizes: DataFrame, threshold: Double): DataFrame = {
    val inter = cands
      .join(ng.select(col("doc_id").as("doc_id_1"), col("ngram")), "doc_id_1")
      .join(ng.select(col("doc_id").as("doc_id_2"), col("ngram")),
        Seq("doc_id_2", "ngram"))
      .groupBy(col("doc_id_1"), col("doc_id_2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc_id_1"), col("n_ng").as("n1")),
        "doc_id_1")
      .join(sizes.select(col("doc_id").as("doc_id_2"), col("n_ng").as("n2")),
        "doc_id_2")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id_1"), col("doc_id_2"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the word stream with term-frequency weights:
    * bit i of the hash votes +tf/-tf; the sign of each bit's total
    * becomes the fingerprint bit. Implemented as 64 plain sum
    * aggregates (one shuffle, map-side combined) + a driver-free pack.
    */
  def simhashes(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("wh", xxhash64(col("word")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("wh"), i).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"b$i")
    }
    val packed = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    tf.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", packed)
      .select(col("doc_id"), col("simhash"))
  }

  def simhashDedup(spark: SparkSession, dir: String): DataFrame =
    simhashes(Tables.documents(spark, dir))
      .select(col("doc_id"), conv(col("simhash"), 10, 16).as("simhash_hex"))
      .orderBy(col("doc_id"))

  /** Near-dup pairs by SimHash: block on 16-bit chunks, verify with
    * bit_count(xor). By pigeonhole, a pair within hamming distance 3
    * must agree on at least one of the 4 chunks, so the default
    * maxHamming=3 has NO false negatives; values above 3 are
    * best-effort (the blocking can miss pairs whose differing bits
    * spread across all chunks).
    */
  def simhashPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(Tables.documents(spark, dir))
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL).as("ck")))
    val keyed = sh
      .select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("k"))
      .select(col("doc_id"), col("simhash"),
        col("k.chunk").as("chunk"), col("k.ck").as("ck"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"),
        col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_id_1"), col("doc_id_2"))
  }
}
