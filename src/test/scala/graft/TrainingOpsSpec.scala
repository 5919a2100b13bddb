package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Pipeline, TextAnalysis, Vectors}
import graft.sources.Tables

/** Semantic properties of the round-5 training-pipeline additions:
  * BM25 ranking, PMI co-occurrence, int8 quantization, mixing weights.
  * (The oracle gate checks exact values; these pin the math's
  * invariants so a plausible-but-wrong reformulation fails fast.)
  */
class TrainingOpsSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("bm25: every ranked doc contains a query term, scores descend") {
    val terms = Seq("hash", "join", "scan", "filter")
    val out = TextAnalysis.bm25TopK(spark, dir, terms).collect()
    assert(out.nonEmpty && out.length <= 25)
    val scores = out.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "bm25 not descending")
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= terms.size))
    // every returned doc really contains >= n_terms_hit distinct terms
    val hits = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir), col("doc_id"))
      .filter(col("word").isin(terms.map(x => x: Any): _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("word")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r =>
      assert(hits.getOrElse(r.getLong(0), 0L) === r.getLong(2),
        s"doc ${r.getLong(0)}: n_terms_hit mismatch"))
  }

  test("pmi: pairs are ordered (a < b), pmi matches recomputation") {
    val out = TextAnalysis.pmiPairs(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0) < r.getString(1)))
    // recompute pmi for every returned pair from first principles
    val dw = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("word")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val n = Tables.documents(spark, dir).count().toDouble
    val byWord = dw.groupBy(_._2).view.mapValues(_.size).toMap
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val nab = dw.count { case (d, w) => w == a && dw.contains((d, b)) }
      assert(nab === r.getLong(2), s"($a,$b) n_ab")
      val pmi = math.log(nab * n / (byWord(a).toDouble * byWord(b)))
      assert(math.abs(pmi - r.getDouble(3)) < 1e-6, s"($a,$b) pmi")
    }
  }

  test("quantize: max_err bounded by scale/2 (round-to-nearest), codes in int8") {
    val out = Vectors.vecQuantize(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (scale, qSum, maxErr) =
        (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(scale >= 0)
      // round-to-nearest quantization error is at most half a step
      // (1e-9 slack: the reported scale is rounded to 9 dp)
      assert(maxErr <= scale / 2 + 1e-9, s"vec ${r.getLong(0)}: err > step/2")
      // codes live in [-127, 127] so any sum of 64 is bounded
      assert(math.abs(qSum) <= 127L * 64)
    }
  }

  test("bpe pairs: 2-char pairs, counts descend, top pair matches recount") {
    val out = TextAnalysis.bpePairs(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0).length === 2))
    val ns = out.map(_.getLong(1))
    assert(ns.sameElements(ns.sortBy(-_)), "pair counts not descending")
    // recount the winning pair from the raw word stream
    val (top, topN) = (out.head.getString(0), out.head.getLong(1))
    val words = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir))
      .collect().map(_.getString(0))
    val recount = words.iterator.filter(_.length >= 2)
      .map(w => (0 until w.length - 1).count(i => w.substring(i, i + 2) == top))
      .sum
    assert(recount.toLong === topN, s"top pair $top recount")
  }

  test("dup spans: coverage bounded, exact duplicate docs reach 1.0") {
    val out = operators.Dedup.dupSpanCoverage(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    assert(out.length === docs.count())
    out.foreach { r =>
      val (n, nd, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nd <= n, s"doc ${r.getLong(0)}: dup grams exceed grams")
      assert(f >= 0.0 && f <= 1.0)
      if (n == 0) assert(nd == 0 && f == 0.0)
    }
    // docs sharing an identical normalized word stream (and long enough
    // to produce grams) must be fully covered on both sides
    val fps = docs.select(col("doc_id"),
        md5(graft.functions.TextOps.normalizedStream(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val dupDocs = fps.groupBy(_._2).filter(_._2.length > 1)
      .values.flatMap(_.map(_._1).toSeq).toSet
    val byId = out.map(r => r.getLong(0) -> r).toMap
    dupDocs.foreach { d =>
      val r = byId(d)
      if (r.getLong(1) > 0)
        assert(r.getDouble(3) === 1.0, s"exact-dup doc $d not fully covered")
    }
  }

  test("perplexity: ce positive and bounded by ln((c_min+V)); zero-bigram docs are 0") {
    val out = TextAnalysis.docPerplexity(spark, dir).collect()
    assert(out.nonEmpty)
    val vocab = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir))
      .select(col("word")).distinct().count()
    // Laplace bigram probs lie in (0, 1], so 0 <= ce <= ln(c_max + V)
    // with c_max the largest unigram count; use total words as a loose cap
    val totalWords = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir)).count()
    val cap = math.log(totalWords.toDouble + vocab)
    out.foreach { r =>
      val (nBg, ce) = (r.getLong(1), r.getDouble(2))
      if (nBg == 0) assert(ce === 0.0)
      else assert(ce > 0.0 && ce <= cap, s"doc ${r.getLong(0)}: ce $ce")
    }
  }

  test("cms: never undercounts, linear under merge, op output consistent") {
    import graft.functions.CountMinAggregator
    val (d, w) = (4, 1024)
    val words = graft.functions.TextOps
      .explodedWords(Tables.documents(spark, dir))
      .collect().map(_.getString(0))
    val agg = new CountMinAggregator(d, w)
    val sketch = words.foldLeft(agg.zero)(agg.reduce)
    val exact = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // hard CMS guarantee: the estimate never undercounts
    exact.foreach { case (x, n) =>
      assert(CountMinAggregator.estimate(sketch.toSeq, x, d, w) >= n,
        s"undercount for $x")
    }
    // linearity: sketching two halves and merging == sketching the whole
    val (h1, h2) = words.splitAt(words.length / 2)
    val merged = agg.merge(h1.foldLeft(agg.zero)(agg.reduce),
      h2.foldLeft(agg.zero)(agg.reduce))
    assert(merged.sameElements(sketch), "merge is not linear")
    // the registered query agrees with the local recomputation
    val out = TextAnalysis.cmsHeavyHitters(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)), s"${r.getString(0)} exact")
      assert(r.getLong(2) ===
        CountMinAggregator.estimate(sketch.toSeq, r.getString(0), d, w))
      assert(r.getLong(3) >= 0, "negative overcount")
    }
  }

  test("cms: estimateExpr is bit-identical to the JVM estimate") {
    // the codegen'd expression path (element_at over xxhash64 cell
    // indices) and the JVM path (XxHash64Function via cell()) must
    // read the same cells — the seeding contract CountMinAggregator
    // documents. Probes include keys never inserted (pure-collision
    // reads) and non-ASCII.
    import graft.functions.CountMinAggregator
    import spark.implicits._
    val (d, w) = (4, 32) // tiny grid: every probe collides somewhere
    val inserted = Seq("alpha", "beta", "gamma", "Straße", "名前", "x")
    val agg = new CountMinAggregator(d, w)
    val sketch = inserted.foldLeft(agg.zero)(agg.reduce)
    val probes = inserted ++ Seq("never", "inserted", "ß", "")
    val got = probes.toDF("x")
      .withColumn("sk", typedLit(sketch.toSeq))
      .select(col("x"),
        CountMinAggregator.estimateExpr(col("sk"), col("x"), d, w).as("e"))
      .as[(String, Long)].collect().toMap
    probes.foreach { x =>
      assert(got(x) === CountMinAggregator.estimate(sketch.toSeq, x, d, w),
        s"expression/JVM estimate diverge for '$x'")
    }
  }

  test("weighted sample: keys recompute from content, membership is the k smallest") {
    val out = Analytics.weightedSample(spark, dir).collect()
    assert(out.length === 20)
    // recompute every doc's A-ES key from first principles
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
    val keys = docs.flatMap { r =>
      val toks = r.getString(1).split("[ \t\n]+").count(_.nonEmpty)
      if (toks == 0) None
      else {
        val u = (java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            r.getString(1)).substring(0, 8), 16) + 0.5) / 4294967296.0
        Some((r.getLong(0), toks.toLong, -math.log(u) / toks))
      }
    }
    val expect = keys.sortBy(t => (t._3, t._1)).take(20)
    assert(out.map(_.getLong(0)).toSet === expect.map(_._1).toSet,
      "sample membership differs from brute-force A-ES")
    out.foreach { r =>
      val k = expect.find(_._1 == r.getLong(0)).get
      assert(r.getLong(1) === k._2)
      assert(math.abs(r.getDouble(2) - k._3) < 1e-9)
    }
  }

  test("data mix: weights normalize to 1; sqrt-mixing upweights small sources") {
    val out = Pipeline.dataMix(spark, dir).collect()
    assert(out.length > 1)
    val wSum = out.map(_.getDouble(3)).sum
    assert(math.abs(wSum - 1.0) < 1e-6, s"weights sum to $wSum")
    // alpha = 0.5 flattens the distribution: the smallest source must
    // be oversampled strictly more than the largest
    val byTokens = out.sortBy(_.getLong(2))
    assert(byTokens.head.getDouble(4) >= byTokens.last.getDouble(4),
      "smallest source not upweighted relative to largest")
  }
}
