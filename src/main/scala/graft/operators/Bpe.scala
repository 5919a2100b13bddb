package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.sources.Tables

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the full iterative merge-learning loop, not just the
  * first-iteration pair census ([[TextAnalysis.bpePairs]] keeps that
  * as the cheap one-shot diagnostic).
  *
  * Extension operator (no reference analog — the reference's word
  * pipeline stops at whole-word counting, `src/tema1.cpp:118-177`);
  * this is the "token counting under a trained subword vocabulary"
  * capability an LLM data pipeline needs for per-document token
  * budgeting and corpus mixing by token share.
  *
  * == The segmentation representation ==
  *
  * A word's current segmentation is ONE string: every symbol wrapped
  * in a `U+001F` unit separator (rendered `␟` below) and concatenated —
  * `"abc"` → `␟a␟␟b␟␟c␟`. Words are `[a-z]+` after
  * [[TextOps.normalize]], so the separator can never collide with
  * symbol bytes. Applying merge (a,b) is then a single codegen'd
  * string `replace` of `␟a␟␟b␟` with `␟ab␟`, and that replace is
  * PROVABLY the greedy left-to-right BPE merge pass: `replace` scans
  * left to right taking non-overlapping occurrences, the wrapping
  * makes occurrences self-delimiting (the matched text ends at a
  * symbol boundary, so consuming it never eats the start of the next
  * match — `[a,b,a,b]` merges both), and overlapping repeats resolve
  * leftmost-first exactly like the scalar scan (`[a,a,a]` with merge
  * (a,a) → `[aa,a]`). DuckDB's `replace` has the same contract, which
  * is what makes the oracle an independent exact replay rather than a
  * rows-only check.
  *
  * == Scale shape ==
  *
  * Training never re-touches the corpus: one corpus scan builds the
  * (word, freq) vocabulary — Heaps' law keeps it ~sqrt-of-corpus —
  * and every one of the k iterations is a narrow job over that cached
  * vocab: a pair explode (weighted by freq), one hash aggregate, and
  * a 1-row argmax collected to the driver (bounded reduction, the
  * [[Ivf]] fit contract). Merge application is a map (the nested
  * `replace` chain stays whole-stage-codegen); lineage is truncated
  * every few iterations so the plan never deepens past a handful of
  * replaces. Tokenization joins the per-(doc, word) count table to
  * the per-word token count — vocab-sized build side, AQE broadcasts
  * it while it fits.
  *
  * Determinism: counts are exact integers and the argmax orders by
  * (count DESC, left, right) — a total order — so the learned merge
  * table is bit-identical under any partitioning or task order.
  */
object Bpe {
  /** Unit separator: words are [a-z]+ post-normalize, never collides. */
  val Sep = "\u001f"
  private val SepSep = Sep + Sep

  /** `word -> ␟c1␟␟c2␟…␟cn␟` (single chars wrapped). */
  private def wrapped(word: Column): Column =
    concat(lit(Sep), regexp_replace(word, "(?<=.)(?=.)", SepSep), lit(Sep))

  /** Wrapped string -> array of current symbols. */
  private def symsOf(s: Column): Column =
    split(regexp_replace(s, s"^$Sep|$Sep$$", ""), SepSep)

  /** Symbol count straight off the wrapped string: #(␟␟) + 1 — the
    * separator pairs sit exactly between adjacent symbols. */
  private def symCount(s: Column): Column =
    ((length(s) - length(replace(s, lit(SepSep), lit("")))) / 2 + 1)
      .cast("long")

  final case class Merge(rank: Int, lhs: String, rhs: String, n: Long) {
    def merged: String = lhs + rhs
  }

  /** Train on a corpus dir's word stream. Deliberately NOT cached
    * across queries (unlike [[Ivf.cachedCentroids]], whose k-means fit
    * is shared by a whole index family): `bpe_train` and
    * `bpe_tokenize` each pay their own training so their bench
    * timings are self-contained — a session cache would make one
    * query's measured time depend on which query ran first, exactly
    * the suite-context coupling the bench methodology isolates
    * against. A production pipeline persists the merge table instead
    * (write `train`'s output, fold it back via the replace chain). */
  def corpusMerges(spark: SparkSession, dir: String, k: Int): Seq[Merge] =
    learnMerges(TextOps.explodedWords(Tables.documents(spark, dir)), k)

  /** The training loop over a (…, word) row stream. Exposed for specs;
    * production entry points go through [[corpusMerges]]. */
  def learnMerges(words: DataFrame, k: Int): Seq[Merge] = {
    // 1-char words can never host a pair and never change: keep the
    // iteration table to merge-able words only
    var vocab = words
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
      .select(col("n"), wrapped(col("word")).as("s"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < k && !exhausted) {
      val best = vocab
        .select(col("n"), symsOf(col("s")).as("y"))
        .filter(size(col("y")) >= 2)
        .select(col("n"),
          explode(transform(sequence(lit(1), size(col("y")) - 1),
            i => struct(element_at(col("y"), i).as("a"),
              element_at(col("y"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(merges.size + 1, a, b, best(0).getLong(2))
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(Sep + a + SepSep + b + Sep),
            lit(Sep + a + b + Sep)))
        // bound the replace-chain depth; blocks are reclaimed by the
        // harness's Cleanup.dropPersisted after the query
        if (merges.size % 8 == 0)
          vocab = vocab.localCheckpoint(eager = false)
      }
    }
    merges.toSeq
  }

  /** Registry entry: the learned merge table,
    * (rank, lhs, rhs, merged, n) ordered by rank. */
  def train(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    corpusMerges(spark, dir, k)
      .map(m => (m.rank, m.lhs, m.rhs, m.merged, m.n))
      .toDF("rank", "lhs", "rhs", "merged", "n")
      .orderBy(col("rank"))
  }

  /** Apply a merge list to a word column: the nested codegen'd
    * replace chain over the wrapped representation. */
  private def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(wrapped(word)) { (s, m) =>
      replace(s, lit(Sep + m.lhs + SepSep + m.rhs + Sep),
        lit(Sep + m.merged + Sep))
    }

  /** Registry entry: per-document token accounting under the trained
    * tokenizer — (doc_id, n_words, n_tokens, n_chars,
    * chars_per_token), every document present (empty docs zero-fill).
    *
    * The merge chain runs over the DISTINCT word table only; the
    * corpus-sized side carries (doc_id, word, count) and joins the
    * vocab-sized token counts on word.
    */
  def tokenizeDocs(spark: SparkSession, dir: String, k: Int = 20)
      : DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = corpusMerges(spark, dir, k)
    val perDocWord = TextOps.explodedWords(docs, col("doc_id"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val perWord = perDocWord.select(col("word")).distinct()
      .select(col("word"),
        symCount(applyMerges(col("word"), merges)).as("tok"))
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
}
