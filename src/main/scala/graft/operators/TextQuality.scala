package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Corpus-quality operators a crawl-scale training-data pipeline runs
  * before anything else: repetition signals (the Gopher-style filters
  * that catch boilerplate and degenerate generations) and PII
  * scrubbing (pattern redaction with audit counts).
  */
object TextQuality {

  /** Per-document repetition signals:
    *  - distinct_word_ratio: |distinct words| / |words| (low = loops);
    *  - top_word_share: most frequent word's share of all words;
    *  - dup_bigram_ratio: 1 - |distinct bigrams| / |bigrams| (near 1 =
    *    repeated phrase stuffing).
    *
    * Both word and bigram passes are codegen explode pipelines (no
    * array HOFs); the bigram stitch is the same posexplode + lead
    * window as Dedup.docNgrams. Each pass is one map-side-combined
    * aggregation; the final assembly joins three tiny per-doc frames.
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), TextOps.TokenSplitRe))
          .as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), TextOps.normalize(col("tok")).as("w"))
      .filter(length(col("w")) > 0)

    val wordCounts = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    val wordAgg = wordCounts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_freq"))

    val bigrams = words
      .withColumn("w2", lead(col("w"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2")).as("g"))
    val bigramAgg = bigrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bg"), countDistinct(col("g")).as("n_bg_distinct"))

    docs.select(col("doc_id"))
      .join(wordAgg, Seq("doc_id"), "left")
      .join(bigramAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        round(when(col("n_words").isNull || col("n_words") === 0, 0.0)
          .otherwise(col("n_distinct").cast("double") /
            col("n_words").cast("double")), 6).as("distinct_word_ratio"),
        round(when(col("n_words").isNull || col("n_words") === 0, 0.0)
          .otherwise(col("top_freq").cast("double") /
            col("n_words").cast("double")), 6).as("top_word_share"),
        round(when(col("n_bg").isNull || col("n_bg") === 0, 0.0)
          .otherwise(lit(1.0) - col("n_bg_distinct").cast("double") /
            col("n_bg").cast("double")), 6).as("dup_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Unigram cross-entropy per document against the corpus word
    * distribution — the cheapest useful "language-model" quality
    * signal: H(doc) = -sum_w ln(p_corpus(w)) / n_words. Low = the doc
    * is made of corpus-typical words; high = rare-word soup.
    *
    * The corpus distribution is a word-count aggregate (broadcast —
    * Zipf makes the vocabulary tiny relative to the corpus); each
    * per-occurrence -ln(p) term is cast to DECIMAL before the per-doc
    * sum so the result is independent of row order, and p itself is a
    * single exact-integer division per word.
    */
  def docEntropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = TextOps.explodedWords(docs, col("doc_id"))
    val freq = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum(col("freq")).as("n_total"))
    val perDoc = words
      .join(broadcast(freq), Seq("word"))
      .join(broadcast(total))
      .select(col("doc_id"),
        (-log(col("freq").cast("double") / col("n_total")))
          .cast("decimal(28,12)").as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        round(sum(col("term")).cast("double") / count(lit(1)), 6)
          .as("cross_entropy"))
    // left-join back so docs that normalize to ZERO words still get a
    // row (n_words 0, entropy 0.0) — a quality filter must see the
    // degenerate docs, not silently lose them (same zero-fill contract
    // as docRepetition)
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("cross_entropy"), lit(0.0)).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  // Patterns are valid in BOTH Java regex (Spark) and RE2 (DuckDB) —
  // no lookarounds, no backreferences.
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val UrlRe = "https?://[^ \t\n]+"
  private[graft] val LongNumRe = "[0-9]{6,}"

  /** PII scrubbing with audit counts: redact emails, URLs, and long
    * digit runs, and report per-doc match counts plus the hash of the
    * scrubbed text (the pipeline's provenance record). Single
    * projection, fully codegen (regexp_count / regexp_replace).
    * Redaction order matters and is part of the contract: URLs first
    * (an email-shaped substring inside a URL belongs to the URL),
    * then emails, then standalone digit runs.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        LongNumRe, "<NUM>")
    // regexp_count(Column, Column): the patterns go in as literals,
    // never through the SQL string parser (which would eat the \. in
    // EmailRe as an unrecognized escape)
    // narrow-project, cut, sort (see TextAnalysis.docStats): the six
    // regex passes run once and only narrow audit rows reach the sort
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(UrlRe)).cast("long").as("n_urls"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(LongNumRe)).cast("long").as("n_long_nums"),
        md5(scrubbed).as("scrubbed_md5"))
      .localCheckpoint(eager = false)
      .orderBy(col("doc_id"))
  }
}
