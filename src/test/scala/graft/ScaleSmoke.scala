package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale-smoke main (not a test): replicates the sf0.1 corpus
  * Nx with shifted doc_ids and times the heavy pipelines, to observe
  * how the operators scale with corpus size (near-linear = healthy;
  * super-linear = a join or window is blowing up).
  *
  *   sbt "Test/runMain graft.ScaleSmoke 20"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDir = s"/tmp/graft_scale_x$mult"
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val big = (0 until mult).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
    }.reduce(_ unionByName _)
    val dir = s"$sfDir/documents.parquet"
    big.write.mode("overwrite").parquet(dir)
    println(s"corpus: ${n * mult} docs (${mult}x sf0.1)")

    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val nEmb = embBase.count()
    (0 until mult).map { i =>
      embBase.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$sfDir/embeddings.parquet")
    println(s"vectors: ${nEmb * mult} (${mult}x sf0.1)")

    def time(label: String, cleanup: Boolean = true)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // cleanup=false keeps live index artifacts (checkpoint blocks)
      // for the next timed step — dropping them between a build and
      // its search would destroy the index being measured
      if (cleanup) Cleanup.dropPersisted(spark)
    }
    val docs = spark.read.parquet(dir)
    time("inverted_index")(
      graft.operators.InvertedIndex(docs)
        .write.format("noop").mode("overwrite").save())
    time("sharded_index")(
      graft.operators.InvertedIndex.sharded(docs)
        .write.format("noop").mode("overwrite").save())
    time("ngram_jaccard")(
      graft.operators.Dedup.ngramJaccardPairs(docs)
        .write.format("noop").mode("overwrite").save())
    time("minhash_lsh")(
      graft.operators.Dedup.minhashLshPairs(docs)
        .write.format("noop").mode("overwrite").save())
    time("simhash")(
      graft.operators.Dedup.simhashes(docs)
        .write.format("noop").mode("overwrite").save())
    time("exact_dedup")(
      graft.operators.Dedup.exactClusters(docs, md5(col("text")))
        .write.format("noop").mode("overwrite").save())
    time("dup_span_coverage")(
      graft.operators.Dedup.dupSpanCoverage(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    // under Nx replication every doc has N exact copies, so the
    // signature posting lists grow Nx and candidate pairs N^2x — the
    // exact-dedup-first pipeline ordering exists precisely because
    // APSS on an undeduplicated corpus is quadratic in the dup factor
    time("tfidf_cosine_pairs")(
      graft.operators.TextAnalysis.tfidfCosinePairs(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    // vector side: brute force pays O(|Q| x N) full dot products EVERY
    // query batch; PQ pays a one-time build, then each batch touches
    // N 8-byte codes + a constant-size exact rerank. Timed separately
    // because that is how they are paid (build once, search many — at
    // scale the codes are persisted next to the corpus too).
    time("cosine_topk_brute")(
      graft.operators.Similarity.cosineTopK(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    // semantic dedup is per-cell quadratic BY CONTRACT, so the index
    // must be sized to the corpus: cells scale with mult to hold the
    // expected cell population (and with it the pair count per cell)
    // constant — the "more data, more clusters" SemDeDup deployment
    // rule, exercised here rather than assumed
    time("semantic_dedup")(
      graft.operators.Similarity.semanticDedup(spark, sfDir,
          nCells = 16 * mult)
        .write.format("noop").mode("overwrite").save())
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    var codebook: org.apache.spark.sql.DataFrame = null
    time("pq_build_once", cleanup = false) {
      codebook = graft.operators.Pq.buildCodebook(
        graft.operators.Pq.subvectors(emb, 8, 64), ks = 16, iters = 1)
        .localCheckpoint()
      codebook.count()
    }
    time("pq_encode_and_search")(
      graft.operators.Pq.pqTopK(spark, sfDir, prebuilt = Some(codebook))
        .write.format("noop").mode("overwrite").save())
    // PCA fit + ABTT transform: per-iteration cost is one scan + one
    // dim+1-decimal allreduce, so the fit should scale linearly with
    // the corpus and the transform at scan speed — the two shapes this
    // smoke exists to confirm (super-linear here would mean the
    // battery aggregate stopped map-side combining)
    time("pca_fit_and_abtt")(
      graft.operators.Vectors.abttDebias(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // z-order WRITE path at sf0.1: the at-scale layout write the
    // zorder_key query only previews. repartitionByRange(z) +
    // sortWithinPartitions(z) into parquet, then measure what the
    // per-file min/max stats actually buy a two-column box predicate:
    // a file can be SKIPPED when its [min,max] on either column
    // misses the box. EdgeCasesSpec asserts the span-shrink property
    // at sf0.001; this exercises the real multi-file write at bench
    // scale and logs the end-to-end skip ratio.
    time("zorder_write_skip") {
      import graft.operators.Analytics
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_orderkey").cast("long").as("orderkey"),
          col("l_partkey").cast("long").as("partkey"))
      val outDir = s"$sfDir/zorder_layout.parquet"
      Analytics.zorderRanked(li, col("orderkey"), col("partkey"))
        .repartitionByRange(32, col("z"))
        .sortWithinPartitions(col("z"))
        .write.mode("overwrite").parquet(outDir)
      val stats = spark.read.parquet(outDir)
        .groupBy(input_file_name().as("f"))
        .agg(min("orderkey").as("o_min"), max("orderkey").as("o_max"),
          min("partkey").as("p_min"), max("partkey").as("p_max"))
        .collect()
      require(stats.length > 8, s"expected many files, got ${stats.length}")
      val (oLo, oHi) = (stats.map(_.getLong(1)).min, stats.map(_.getLong(2)).max)
      val (pLo, pHi) = (stats.map(_.getLong(3)).min, stats.map(_.getLong(4)).max)
      // 10% x 10% box predicate in the middle of both domains
      def box(lo: Long, hi: Long): (Long, Long) = {
        val w = hi - lo; (lo + (w * 45) / 100, lo + (w * 55) / 100)
      }
      val (oA, oB) = box(oLo, oHi)
      val (pA, pB) = box(pLo, pHi)
      val skipped = stats.count { r =>
        r.getLong(2) < oA || r.getLong(1) > oB || // orderkey range misses
          r.getLong(4) < pA || r.getLong(3) > pB  // partkey range misses
      }
      val ratio = skipped.toDouble / stats.length
      println(f"zorder skip ratio: $skipped/${stats.length} = $ratio%.2f " +
        "(10pct x 10pct box, either-column min/max skipping)")
      // an unclustered layout skips ~0 files on a centered 10% box of
      // BOTH columns; the z-layout must skip a solid majority
      require(ratio >= 0.5, f"z-order layout skipped only $ratio%.2f of files")
    }
    spark.stop()
  }
}
