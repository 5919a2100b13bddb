package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.sources.Tables

/** Unigram-language-model tokenizer training (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece unigram model),
  * the sibling of [[Bpe]]: seed-substring census, then hard-EM
  * (Viterbi) rounds that re-estimate piece frequencies from each
  * word's maximum-likelihood segmentation and prune the vocabulary
  * back to a target size.
  *
  * Extension operator (no reference analog — the reference's word
  * pipeline stops at whole-word counting, `src/tema1.cpp:118-177`);
  * modern pipelines train BOTH tokenizer families over a candidate
  * corpus and compare compression, so this completes the pair.
  *
  * == Determinism contract (what makes the oracle exact) ==
  *
  * Every quantity that crosses a round boundary is an exact integer:
  * seed counts and per-round re-estimated counts are `sum(freq ×
  * occurrences)` longs, and pruning ranks by `(cnt DESC, piece ASC)`
  * — a total order. The only floating point anywhere is the Viterbi
  * path score, a left-to-right product of `cnt.toDouble / total
  * .toDouble` probabilities: IEEE division and multiplication are
  * correctly rounded, so the DP is bit-deterministic across runs,
  * partitionings, and task orders (no transcendental functions — the
  * classical log-space formulation is deliberately avoided; at piece
  * probabilities >= 1/total and words <= tens of symbols the product
  * stays far above double underflow). Ties (including all-zero
  * products through a pruned-to-zero character) break on fewer
  * tokens, then the lexicographically smallest segmentation — also
  * total, so the learned vocabulary is bit-identical everywhere.
  *
  * == Oracle decomposition ==
  *
  * The seed census is pure relational algebra — DuckDB replays it
  * from `documents` directly (`unigram_seed`). The EM rounds hinge on
  * a per-word DP that SQL cannot express without exponential path
  * enumeration, so the per-round segmentations are EXPORTED as an
  * oracle-aux table ([[segTable]]) and the oracle replays every
  * round's bookkeeping from them: re-count → prune → re-rank, with
  * two validity guards folded into the joins — every claimed piece
  * must exist in the PREVIOUS round's (independently re-derived)
  * vocabulary, and the segmentation must concatenate back to its
  * word. A Viterbi that emitted an out-of-vocab piece, dropped a
  * character, or mis-counted would break the chain and hash-mismatch.
  * DP *optimality* (the one property SQL can't check) is covered by
  * [[graft.UnigramSpec]]'s exhaustive-enumeration bit-equality spec.
  *
  * == Scale shape ==
  *
  * The corpus is touched ONCE — the (word, freq) table is Heaps'-law
  * bounded (~sqrt of corpus) and every EM round is a narrow map over
  * it: the current vocabulary (a few thousand (piece, prob) pairs) is
  * broadcast inside the segmenter closure, the E-step is one
  * whole-partition pass, and the M-step is an explode + hash
  * aggregate whose result is vocab-sized — collected to the driver
  * under the same bounded-reduction contract as the [[Ivf]] centroid
  * fit. Nothing corpus-scale ever sits on the driver.
  */
object Unigram {
  /** Longest candidate piece enumerated by the seed census. */
  val MaxPieceLen = 4
  /** Multi-char pieces kept by the seed census. */
  val SeedMulti = 64
  /** Total vocabulary size after each EM prune (chars always kept —
    * they are the segmentation-coverage guarantee). */
  val VocabSize = 48
  /** Hard-EM rounds. Round r segments under vocab r-1 (round 1 under
    * the seed); the final vocabulary is the prune of round `Rounds`'
    * re-counts, and one extra "application" pass (round Rounds+1)
    * segments under that final vocabulary for token accounting. */
  val Rounds = 3

  /** Unit separator between pieces of an exported segmentation —
    * words are [a-z]+ post-normalize, so it can never collide. */
  val Sep = "\u001f"

  final case class PieceCnt(piece: String, cnt: Long)

  /** (word, n) distinct-word frequency table — the one corpus scan. */
  private def wordFreqs(spark: SparkSession, dir: String): DataFrame =
    wordFreqsOf(Tables.documents(spark, dir))

  /** The same census over an explicit doc set — the delta side of the
    * incremental maintenance and the spec's retrain arm. Shared with
    * [[Bpe]]: the (word, n) census is ONE corpus artifact with two
    * tokenizer-family consumers, so its persistence and maintenance
    * live here and both families read it. */
  private[graft] def wordFreqsOf(docs: DataFrame): DataFrame =
    TextOps.explodedWords(docs)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Persisted (word, n) table — the artifact the incremental
    * maintenance merges into. Stamp-named parquet like the suffix
    * index ([[SuffixRanks]]): built once per corpus state (the one
    * corpus scan of the whole tokenizer fit), re-served across
    * processes, transparently rebuilt after a corpus mutation, and
    * committed by attempt + atomic promotion
    * ([[graft.sources.AtomicPromote]]). The EM fit reads the table
    * back from parquet, so the cold build's corpus scan and the
    * maintenance's delta-only scan feed the identical downstream
    * machinery.
    */
  private val wordDirCache =
    new graft.sources.StampedCache[String, String]()

  private def wordsPath(dir: String, stamp: Long): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_unigram_words", safe,
      f"s$stamp%016x").toString
  }

  private[graft] def cachedWordFreqs(spark: SparkSession, dir: String)
      : DataFrame = {
    val stamp =
      graft.sources.CorpusStamp.of(spark, s"$dir/documents.parquet")
    val path = wordDirCache.get(dir, stamp) {
      writeWordTable(spark, dir, stamp, wordFreqs(spark, dir))
    }
    spark.read.parquet(path)
  }

  private def writeWordTable(spark: SparkSession, dir: String,
      stamp: Long, words: DataFrame): String = {
    val out = wordsPath(dir, stamp)
    val outP = new org.apache.hadoop.fs.Path(out)
    val success = new org.apache.hadoop.fs.Path(out, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      val attempt = new org.apache.hadoop.fs.Path(
        out + f".attempt-${java.util.UUID.randomUUID()}")
      words.write.parquet(attempt.toString)
      graft.sources.AtomicPromote(spark, fs, attempt, outP)
      if (!fs.exists(success)) throw new IllegalStateException(
        s"word-table promotion left no committed dir at $out")
    }
    out
  }

  /** Bench hook: drop the in-process entry AND retire the persisted
    * word table, so a forced vocab rebuild measures the corpus scan
    * too (a disk-served word table would launder a scan regression
    * into "noise"). Rename-aside retirement, as for the suffix index. */
  private[graft] def invalidateWordFreqs(spark: SparkSession,
      dir: String): Unit = {
    wordDirCache.invalidate(dir)
    val stamp =
      graft.sources.CorpusStamp.of(spark, s"$dir/documents.parquet")
    val p = new org.apache.hadoop.fs.Path(wordsPath(dir, stamp))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val retired = new org.apache.hadoop.fs.Path(
        p.toString + f".retired-${java.util.UUID.randomUUID()}")
      if (!fs.rename(p, retired)) throw new IllegalStateException(
        s"could not retire word table at $p")
    }
  }

  /** Weighted substring census of a (word, n) table: every (start,
    * len<=MaxPieceLen) occurrence counts with multiplicity, weighted
    * by word frequency. Stays inside the array higher-order functions
    * (vocab-sized input — codegen pressure is irrelevant here).
    */
  private[graft] def census(words: DataFrame): DataFrame =
    words
      .select(col("n"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1), least(lit(MaxPieceLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))

  /** Multi-char pieces kept after EM round r (1-based): linear shrink
    * from [[SeedMulti]] down to the final `VocabSize - nChars` budget
    * — SentencePiece's gradual-prune idea, in PURE INTEGER arithmetic
    * (target + ((SeedMulti - target) * (Rounds - r)) / Rounds, floor
    * division) so the DuckDB oracle reproduces the schedule exactly;
    * a float `pow` schedule would park the replay on a
    * cross-platform floor(pow(..)) boundary.
    */
  private[graft] def multiCap(nChars: Int, r: Int): Int = {
    val target = math.max(1, VocabSize - nChars)
    target + ((SeedMulti - target) * (Rounds - math.min(r, Rounds))) / Rounds
  }

  /** Driver-side prune: ALL single chars (coverage) + the top `cap`
    * multi-char pieces by (cnt DESC, piece ASC). Chars absent from
    * `counts` (re-estimated to zero) survive with cnt 0 — their
    * probability is 0.0 and the deterministic tie-break keeps the DP
    * total. `chars` is the fixed character alphabet from the seed
    * census, so the vocabulary's coverage guarantee cannot erode
    * across rounds.
    */
  private def prune(chars: Seq[String], counts: Seq[PieceCnt], cap: Int)
      : Seq[PieceCnt] = {
    val byPiece = counts.map(p => p.piece -> p.cnt).toMap
    val keptChars = chars.sorted.map(c => PieceCnt(c, byPiece.getOrElse(c, 0L)))
    val multis = counts.filter(_.piece.length > 1)
      .sortBy(p => (-p.cnt, p.piece))
      .take(math.max(0, cap))
    keptChars ++ multis
  }

  /** Maximum-likelihood segmentation of one word under (piece ->
    * prob): returns (pieces joined by [[Sep]], token count). Score is
    * the left-to-right product of probabilities (see the determinism
    * contract above); ties break on fewer tokens, then the
    * lexicographically smallest joined segmentation. Every char of
    * every corpus word is in the vocabulary, so a best path always
    * exists. [[graft.UnigramSpec]] proves this DP bit-equal to
    * exhaustive path enumeration under the same order.
    *
    * Two DP tracks make that order exact. For a POSITIVE best final
    * score the score track alone is exact: strict score dominance at a
    * cut position propagates through positive multipliers (a
    * lower-score prefix can never reach the max final score), and
    * among EQUAL-score prefixes the per-position (tokens, lex) choice
    * is preserved by common-suffix extension (equal appended piece
    * keeps the score tie, the +1 token ordering, and — because the two
    * prefixes cover the identical characters and differ only in [[Sep]]
    * placement, so neither is a proper prefix of the other — the lex
    * ordering). That argument collapses when a zero-probability piece
    * (a pruned-to-zero char kept for coverage) enters a path: 0.64×0
    * ties 0.2×0, so a strictly-lower-score prefix with a better
    * (tokens, lex) key can tie at 0.0 and the score track would keep
    * the wrong one. But a best final score of 0.0 means EVERY path
    * scores 0.0 (the track maximizes over all paths), so the order
    * degenerates to plain (tokens ASC, lex ASC) over all paths — which
    * the second, score-blind track computes exactly by the same
    * common-suffix-extension argument.
    */
  private[graft] def viterbi(word: String, prob: Map[String, Double])
      : (String, Int) = {
    val n = word.length
    val score = new Array[Double](n + 1)
    val toks = new Array[Int](n + 1)
    val seg = new Array[String](n + 1)
    // score-blind track: min (tokens, lex) over ALL vocab paths
    val toks2 = new Array[Int](n + 1)
    val seg2 = new Array[String](n + 1)
    score(0) = 1.0
    seg(0) = ""
    seg2(0) = ""
    var pos = 1
    while (pos <= n) {
      var bs = 0.0
      var bt = 0
      var bg: String = null
      var bt2 = 0
      var bg2: String = null
      var l = 1
      while (l <= math.min(MaxPieceLen, pos)) {
        if (seg(pos - l) != null) {
          val piece = word.substring(pos - l, pos)
          prob.get(piece).foreach { p =>
            val s = score(pos - l) * p
            val t = toks(pos - l) + 1
            val g = if (pos == l) piece else seg(pos - l) + Sep + piece
            val c = java.lang.Double.compare(s, bs)
            if (bg == null || c > 0 ||
                (c == 0 && (t < bt || (t == bt && g < bg)))) {
              bs = s; bt = t; bg = g
            }
            val t2 = toks2(pos - l) + 1
            val g2 = if (pos == l) piece else seg2(pos - l) + Sep + piece
            if (bg2 == null || t2 < bt2 || (t2 == bt2 && g2 < bg2)) {
              bt2 = t2; bg2 = g2
            }
          }
        }
        l += 1
      }
      score(pos) = bs; toks(pos) = bt; seg(pos) = bg
      toks2(pos) = bt2; seg2(pos) = bg2
      pos += 1
    }
    if (score(n) == 0.0) (seg2(n), toks2(n)) else (seg(n), toks(n))
  }

  /** One E-step: segment every word of `words` under `vocab`. The
    * vocabulary rides the closure (broadcast-by-serialization — it is
    * VocabSize pairs); the probabilities are derived HERE, once, so
    * every executor sees the identical IEEE quotients.
    */
  private def eStep(words: DataFrame, vocab: Seq[PieceCnt]): DataFrame = {
    val total = vocab.map(_.cnt).sum
    val prob = vocab.map(p =>
      p.piece -> (if (total == 0L) 0.0 else p.cnt.toDouble / total.toDouble))
      .toMap
    val segUdf = udf((w: String) => viterbi(w, prob)._1)
    words.select(col("word"), col("n"), segUdf(col("word")).as("seg"))
  }

  /** M-step counts from an E-step output: vocab-sized, collected
    * under the bounded-reduction contract. */
  private def mStep(segs: DataFrame): Seq[PieceCnt] = {
    import segs.sparkSession.implicits._
    segs.select(col("n"), explode(split(col("seg"), Sep)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .as[(String, Long)].collect().toSeq
      .map { case (p, c) => PieceCnt(p, c) }
  }

  /** The EM fit: per-round vocabularies, index 0 = seed, index r =
    * after round r's prune. Only the vocabularies cross rounds — each
    * round's E-step output is re-derivable from vocab r-1 by a pure
    * deterministic map (see the determinism contract), so this is the
    * ONLY state worth caching; `words` is cut for the fit and released
    * before returning.
    */
  private def fitVocabs(spark: SparkSession, dir: String)
      : Seq[Seq[PieceCnt]] =
    fitVocabsFromWords(cachedWordFreqs(spark, dir))

  /** The EM fit from an explicit (word, n) table — shared by the cold
    * build (parquet-backed word table) and the incremental maintenance
    * (persisted table merged with a delta census). The fit is a pure
    * function of the word table, so however the table was produced —
    * one corpus scan or table + delta merge — the vocabularies are
    * bit-identical (the incremental==retrain guarantee).
    */
  private[graft] def fitVocabsFromWords(words0: DataFrame)
      : Seq[Seq[PieceCnt]] = {
    import words0.sparkSession.implicits._
    // feeds the census + every E-step round of the fit: cut once
    val words = words0.persist()
    try {
      val c0 = census(words).as[(String, Long)].collect()
        .map { case (p, c) => PieceCnt(p, c) }.toSeq
      val chars = c0.filter(_.piece.length == 1).map(_.piece)
      val vocabs = scala.collection.mutable.ArrayBuffer(
        prune(chars, c0, SeedMulti))
      for (r <- 1 to Rounds)
        vocabs += prune(chars, mStep(eStep(words, vocabs.last)),
          multiCap(chars.size, r))
      vocabs.toSeq
    } finally { words.unpersist(); () }
  }

  /** Process-level fit cache, same posture as [[Ivf.cachedCentroids]]:
    * the vocabularies are VocabSize×(Rounds+1) driver-side pairs — a
    * trained tokenizer is fit once and every consumer (train export,
    * seg table, per-doc accounting) serves from it. Determinism makes
    * cache-vs-refit unobservable; this only saves the repeated EM.
    * Stamp-validated ([[graft.sources.CorpusStamp]]): a corpus rewrite
    * transparently retrains.
    */
  private val vocabCache =
    new graft.sources.StampedCache[String, Seq[Seq[PieceCnt]]]()

  private[graft] def cachedVocabs(spark: SparkSession, dir: String)
      : Seq[Seq[PieceCnt]] = {
    val stamp =
      graft.sources.CorpusStamp.of(spark, s"$dir/documents.parquet")
    vocabCache.get(dir, stamp) { fitVocabs(spark, dir) }
  }

  /** Bench hook: force the next cachedVocabs call to refit. */
  private[graft] def invalidateVocabs(dir: String): Unit =
    vocabCache.invalidate(dir)

  // ------------------------------------------------------------------
  // Incremental vocabulary maintenance: merge a delta corpus's word
  // census into the PERSISTED word table and re-run only the
  // census+EM tail — the corpus text is never re-scanned. Because
  // word counts are exact integers and addition is associative, the
  // merged table IS the merged corpus's word table, so the maintained
  // vocabularies are BIT-EQUAL to a full retrain (UnigramSpec) — no
  // drift gate is needed: there is no approximation to drift. What the
  // maintenance saves is exactly the corpus scan (the dominant term at
  // scale — the census+EM tail is Heaps'-law bounded, ~sqrt of corpus);
  // the delta pays one delta-sized scan.
  // ------------------------------------------------------------------

  /** The merged (word, n) table: persisted old table + delta census,
    * summed per word. One word-table-sized shuffle; zero old-corpus
    * text reads. */
  private[graft] def mergedWords(spark: SparkSession, dir: String,
      delta: DataFrame): DataFrame =
    cachedWordFreqs(spark, dir)
      .unionByName(wordFreqsOf(delta))
      .groupBy(col("word")).agg(sum(col("n")).as("n"))

  /** Maintain the vocabularies against a delta doc set (doc_ids
    * disjoint from the old corpus — the ingest invariant). Returns the
    * per-round vocabularies, bit-equal to [[fitVocabs]] over the
    * merged corpus. */
  def incrementalVocabs(spark: SparkSession, dir: String,
      delta: DataFrame): Seq[Seq[PieceCnt]] =
    fitVocabsFromWords(mergedWords(spark, dir, delta))

  /** Spec hook: the full retrain over an explicit doc set — the
    * bit-equality arm for the incremental==retrain spec. */
  private[graft] def retrainOver(docs: DataFrame): Seq[Seq[PieceCnt]] =
    fitVocabsFromWords(wordFreqsOf(docs))

  /** Install maintained vocabularies (and the merged word table that
    * produced them, so the NEXT increment also skips the corpus scan)
    * under `dir`'s CURRENT corpus stamp — the ingest-side wiring, as
    * for [[Ivf.installCentroids]]. */
  def installVocabs(spark: SparkSession, dir: String,
      vocabs: Seq[Seq[PieceCnt]], words: DataFrame): Unit = {
    val stamp =
      graft.sources.CorpusStamp.of(spark, s"$dir/documents.parquet")
    wordDirCache.put(dir, stamp,
      writeWordTable(spark, dir, stamp, words))
    vocabCache.put(dir, stamp, vocabs)
  }

  // ------------------------------------------------------------------
  // Store-keyed vocabulary family + the ingest-commit maintainer: the
  // unigram analog of SuffixRanks' store family. The persisted word
  // table and the fit cache key to a curatedIngest store's admitted
  // docs; registered via graft.sources.ArtifactMaintenance, every
  // pure-append commit merges the delta census into the persisted
  // table and installs retrained-tail vocabularies under the
  // post-commit stamp — the first post-ingest tokenizer access serves
  // them with zero corpus scan. This is the second family through the
  // same hook (after the suffix index), proving the registration is a
  // contract, not a one-off.
  // ------------------------------------------------------------------

  /** Cache key prefix for store-rooted corpora — disjoint from
    * testdata dir keys (absolute paths cannot start with it). */
  private def storeKey(path: String): String = s"store:$path"

  /** Probe hook: (stamp, committed word-table dir) currently served
    * for the store — the E2E spec's no-rebuild evidence. */
  private[graft] def servedStoreWords(path: String): Option[(Long, String)] =
    wordDirCache.peek(storeKey(path))

  /** The persisted (word, n) census over the store's admitted docs
    * ([[graft.streaming.EventStreams.admittedDocs]]), stamped to the
    * store's committed generation. */
  private[graft] def storeWordFreqs(spark: SparkSession, path: String)
      : DataFrame = {
    val stamp = graft.sources.CorpusStamp.of(spark, path)
    val p = wordDirCache.get(storeKey(path), stamp) {
      writeWordTable(spark, storeKey(path), stamp, wordFreqsOf(
        graft.streaming.EventStreams.admittedDocs(spark, path)))
    }
    spark.read.parquet(p)
  }

  /** The store's trained per-round vocabularies: cold = one corpus
    * scan into the persisted word table + the EM tail; maintained =
    * served straight from the commit-time install. */
  def storeVocabs(spark: SparkSession, path: String): Seq[Seq[PieceCnt]] = {
    val stamp = graft.sources.CorpusStamp.of(spark, path)
    vocabCache.get(storeKey(path), stamp) {
      fitVocabsFromWords(storeWordFreqs(spark, path))
    }
  }

  /** Final trained vocabulary table for a store — [[train]]'s shape. */
  def storeTrain(spark: SparkSession, path: String): DataFrame =
    vocabDf(spark, storeVocabs(spark, path).last)

  /** Install maintained vocabularies and the merged word table that
    * produced them under the store's CURRENT (post-commit) stamp —
    * the next increment then also skips the corpus scan. Durability
    * and races follow [[writeWordTable]]'s attempt + atomic-promotion
    * discipline; a racing cold builder's table is bit-identical, so
    * first-promotion-wins is unobservable. */
  def installStoreVocabs(spark: SparkSession, path: String,
      vocabs: Seq[Seq[PieceCnt]], words: DataFrame): Unit = {
    installStoreWords(spark, path, words)
    vocabCache.put(storeKey(path), graft.sources.CorpusStamp.of(spark, path),
      vocabs)
  }

  /** Words-only install, for the OTHER census consumer ([[Bpe]]'s
    * store maintainer): persist the merged table under the store's
    * current stamp without touching the unigram vocab cache. If both
    * family maintainers fire on the same commit, the second install
    * sees the first's committed `_SUCCESS` and is a no-op — the
    * tables are bit-identical (exact integer census), so
    * first-promotion-wins is unobservable. */
  private[graft] def installStoreWords(spark: SparkSession, path: String,
      words: DataFrame): Unit = {
    val stamp = graft.sources.CorpusStamp.of(spark, path)
    wordDirCache.put(storeKey(path), stamp,
      writeWordTable(spark, storeKey(path), stamp, words))
  }

  /** The unigram family's [[graft.sources.ArtifactMaintenance]]
    * maintainer. On a PURE-APPEND commit whose served word table was
    * built under exactly the pre-commit stamp, it merges the delta's
    * word census into the persisted table (word counts are exact
    * integers and addition is associative, so the merged table IS the
    * merged corpus's table — the maintained vocabularies are bit-equal
    * to a retrain, no drift gate needed) and installs the re-run
    * census+EM tail under the post-commit stamp. Everything else
    * skips: a non-pure commit deletes words the additive merge cannot
    * subtract, and a cold/mismatched table has nothing sound to
    * extend. Skipping is always safe — the flipped stamp forces a
    * correct rebuild on next access. */
  def storeMaintainer: graft.sources.ArtifactMaintenance.Maintainer =
    (spark, c) => {
      if (c.pureAppend) {
        val post = graft.sources.CorpusStamp.of(spark, c.path)
        wordDirCache.peek(storeKey(c.path)) match {
          case Some((s, mergedDir)) if s == post =>
            // a sibling census consumer ([[Bpe.storeMaintainer]], fired
            // earlier on THIS commit) already merged and installed the
            // post-commit table — fit the EM tail from it directly
            vocabCache.put(storeKey(c.path), post,
              fitVocabsFromWords(spark.read.parquet(mergedDir)))
          case Some((s, oldDir)) if s == c.preStamp =>
            val merged = spark.read.parquet(oldDir)
              .unionByName(wordFreqsOf(c.delta))
              .groupBy(col("word")).agg(sum(col("n")).as("n"))
            installStoreVocabs(spark, c.path,
              fitVocabsFromWords(merged), merged)
          case _ => () // cold/mismatched: correct rebuild on next access
        }
      }
    }

  /** Process memo of the incremental DEMO's maintained vocabularies
    * (the [[SuffixRanks.syntheticDocDelta]] fixture): the registry
    * query, the `unigram_incr_segs` oracle export, and the bench entry
    * share one maintenance run — the [[cachedVocabs]] posture. */
  private val incrVocabCache =
    new graft.sources.StampedCache[String, Seq[Seq[PieceCnt]]]()

  private[graft] def cachedIncrVocabs(spark: SparkSession, dir: String)
      : Seq[Seq[PieceCnt]] = {
    val stamp =
      graft.sources.CorpusStamp.of(spark, s"$dir/documents.parquet")
    incrVocabCache.get(dir, stamp) {
      incrementalVocabs(spark, dir, SuffixRanks.syntheticDocDelta(
        Tables.documents(spark, dir)))
    }
  }

  /** Bench hook: force the next demo maintenance to re-run (the
    * persisted word table deliberately stays — serving from it IS the
    * maintenance being measured). */
  private[graft] def invalidateIncrVocabs(dir: String): Unit =
    incrVocabCache.invalidate(dir)

  /** Registry entry: the final maintained vocabulary over the merged
    * corpus (original documents + the re-keyed reversed every-29th
    * delta) — [[train]]'s shape. The oracle rebuilds the merged corpus
    * in SQL and replays the whole census→EM chain from the
    * `unigram_incr_segs` export, exactly as `unigram_train` does over
    * the base corpus: a stale word count, a missed delta word, or a
    * wrong prune all break the chain. Bit-equality with a full retrain
    * is additionally spec-gated (UnigramSpec).
    */
  def incrementalTrain(spark: SparkSession, dir: String): DataFrame =
    vocabDf(spark, cachedIncrVocabs(spark, dir).last)

  /** Oracle-aux: the incremental demo's per-round segmentations over
    * the MERGED word table under the maintained vocabularies — the
    * `unigram_segs` contract for the incremental entry. */
  def incrSegTable(spark: SparkSession, dir: String): DataFrame = {
    val vocabs = cachedIncrVocabs(spark, dir)
    val words = mergedWords(spark, dir, SuffixRanks.syntheticDocDelta(
      Tables.documents(spark, dir)))
    (1 to Rounds + 1).map { r =>
      eStep(words, vocabs(r - 1))
        .select(lit(r).as("round"), col("word"), col("n"), col("seg"))
    }.reduce(_.unionByName(_))
  }

  private def vocabDf(spark: SparkSession, vocab: Seq[PieceCnt])
      : DataFrame = {
    import spark.implicits._
    vocab.sortBy(p => (-p.cnt, p.piece)).zipWithIndex
      .map { case (p, i) => (i + 1, p.piece, p.piece.length, p.cnt) }
      .toDF("rank", "piece", "len", "cnt")
      .orderBy(col("rank"))
  }

  /** Registry entry: the seed vocabulary (census + prune, no EM) —
    * fully DuckDB-replayable from `documents`. */
  def seed(spark: SparkSession, dir: String): DataFrame =
    vocabDf(spark, cachedVocabs(spark, dir).head)

  /** Registry entry: the final vocabulary after [[Rounds]] EM rounds,
    * (rank, piece, len, cnt) ordered by rank. */
  def train(spark: SparkSession, dir: String): DataFrame =
    vocabDf(spark, cachedVocabs(spark, dir).last)

  /** Oracle-aux: every round's E-step output, (round, word, n, seg).
    * Round r segments under vocab r-1; round Rounds+1 is the
    * application pass under the final vocabulary. The oracle rebuilds
    * each vocabulary from the previous round's rows and inner-joins
    * the pieces against it, so the whole EM bookkeeping chain is
    * independently verified (see the class Scaladoc). Re-deriving the
    * E-steps from the cached vocabularies is exact — the segmenter is
    * a pure deterministic map of (word, vocab).
    */
  def segTable(spark: SparkSession, dir: String): DataFrame = {
    val vocabs = cachedVocabs(spark, dir)
    // no persist: this is a pure transformation handed to the caller
    // (nothing local could unpersist after consumption), and the union
    // merely re-reads the word table once per round — a narrow
    // Heaps-bounded scan, not the EM fit.
    val words = wordFreqs(spark, dir)
    (1 to Rounds + 1).map { r =>
      eStep(words, vocabs(r - 1))
        .select(lit(r).as("round"), col("word"), col("n"), col("seg"))
    }.reduce(_.unionByName(_))
  }

  /** Registry entry: per-document token accounting under the trained
    * unigram tokenizer — same shape and conventions as
    * [[Bpe.tokenizeDocs]] (every document present, empty docs
    * zero-fill). The application-pass segmentation covers the
    * DISTINCT word table; the corpus-sized side joins on word.
    */
  def tokenizeDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perWord = eStep(wordFreqs(spark, dir), cachedVocabs(spark, dir).last)
      .select(col("word"), size(split(col("seg"), Sep)).cast("long").as("tok"))
    val perDocWord = TextOps.explodedWords(docs, col("doc_id"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val perDoc = perDocWord
      .join(perWord, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("w"),
        sum(col("c") * col("tok")).as("t"),
        sum(col("c") * length(col("word"))).as("ch"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("w"), lit(0L)).as("n_words"),
        coalesce(col("t"), lit(0L)).as("n_tokens"),
        coalesce(col("ch"), lit(0L)).as("n_chars"),
        round(when(coalesce(col("t"), lit(0L)) === 0, 0.0)
          .otherwise(coalesce(col("ch"), lit(0L)).cast("double") /
            col("t")), 6).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** Registry entry: side-by-side tokenizer economics — the comparison
    * a pipeline actually trains both families FOR (compression in
    * chars/token and the unigram/BPE token-count ratio, per document).
    * Pure composition of the two verified accountings: each side's
    * per-word token counts come from its own trained tokenizer, and
    * both ride the same doc-keyed join skeleton, so the plan stays
    * two word-table maps + one corpus-word aggregate.
    */
  def compareWithBpe(spark: SparkSession, dir: String, bpeK: Int)
      : DataFrame = {
    val b = Bpe.tokenizeDocs(spark, dir, bpeK)
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_tokens").as("bpe_tokens"))
    val u = tokenizeDocs(spark, dir)
      .select(col("doc_id"), col("n_tokens").as("uni_tokens"))
    b.join(u, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("bpe_tokens"), col("uni_tokens"),
        round(when(col("bpe_tokens") === 0, 0.0)
          .otherwise(col("n_chars").cast("double") / col("bpe_tokens")), 6)
          .as("bpe_chars_per_token"),
        round(when(col("uni_tokens") === 0, 0.0)
          .otherwise(col("n_chars").cast("double") / col("uni_tokens")), 6)
          .as("uni_chars_per_token"),
        round(when(col("bpe_tokens") === 0, 0.0)
          .otherwise(col("uni_tokens").cast("double") / col("bpe_tokens")), 6)
          .as("token_ratio"))
      .orderBy(col("doc_id"))
  }
}
