package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Pq, SuffixRanks, Unigram, Vectors}
import graft.sources.CorpusStamp
import graft.streaming.BucketStore

/** The offline-index staleness contract (CorpusStamp): ingest or
  * rewrite the corpus at a cached path, and every persisted/cached
  * artifact — IVF centroids, PQ codebook, PCA fit, unigram
  * vocabularies, the on-disk suffix-rank index — must transparently
  * rebuild instead of serving stale results. Verified by the
  * mutate-vs-fresh-copy equivalence: after dirA's tables are replaced
  * with dirB's CONTENT (different files, names, mtimes), a stamped
  * cache over dirA must return bit-identical results to a never-cached
  * build over dirB (all builds are deterministic functions of
  * content).
  */
class StalenessSpec extends SparkTestBase {

  /** Copy table parquet from an sf dir into a fresh mutable corpus
    * dir, REWRITING through Spark so file names/sizes differ from the
    * source (a real ingest never byte-copies). `seed` varies content.
    */
  private def makeCorpus(tables: Map[String, org.apache.spark.sql.DataFrame])
      : String = {
    val out = Files.createTempDirectory("graft_staleness").toString
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    out
  }

  private def docs(n: Int) = graft.sources.Tables
    .documents(spark, sf("sf0.001")).orderBy(col("doc_id")).limit(n)
  private def embs(n: Int) = graft.sources.Tables
    .embeddings(spark, sf("sf0.001")).orderBy(col("vec_id")).limit(n)

  test("listing stamp: stable under re-read, flips on rewrite") {
    val dir = makeCorpus(Map("documents" -> docs(50)))
    val s1 = CorpusStamp.of(spark, s"$dir/documents.parquet")
    val s2 = CorpusStamp.of(spark, s"$dir/documents.parquet")
    assert(s1 === s2, "stamp must be a pure function of the listing")
    assert(s1 !== CorpusStamp.Missing)
    docs(60).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val s3 = CorpusStamp.of(spark, s"$dir/documents.parquet")
    assert(s3 !== s1, "rewrite must flip the stamp")
    assert(CorpusStamp.of(spark, s"$dir/nope.parquet")
      === CorpusStamp.Missing)
  }

  test("bucket-store stamp: committed generation is the change token") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_staleness_bs").toString
    val b = BucketStore.HashBuckets("doc_id", 4)
    val s0 = CorpusStamp.of(spark, root) // empty dir: listing stamp
    BucketStore.commitAll(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), b, root)
    val g1 = CorpusStamp.of(spark, root)
    assert(g1 !== s0, "first commit must flip the stamp")
    assert(g1 === CorpusStamp.of(spark, root), "stable between commits")
    BucketStore.commitAll(
      Seq((1L, "a"), (3L, "c")).toDF("doc_id", "text"), b, root)
    val g2 = CorpusStamp.of(spark, root)
    assert(g2 !== g1, "every ingest commit must flip the stamp")
  }

  test("ingest-then-query: every cached artifact rebuilds, not stales") {
    val before = Map("documents" -> docs(40), "embeddings" -> embs(60))
    val after = Map("documents" -> docs(80), "embeddings" -> embs(120))
    val dirA = makeCorpus(before) // mutated in place below
    val dirB = makeCorpus(after)  // fresh, never cached before the diff

    // ---- warm every cache over the BEFORE corpus ----
    val ranks0 = SuffixRanks.suffixRankTable(spark, dirA).collect()
    val cents0 = Ivf.cachedCentroids(spark, dirA, 4, 1).collect()
    val cb0 = Pq.cachedCodebook(spark, dirA, 8, 4, 1).collect()
    val vocab0 = Unigram.cachedVocabs(spark, dirA)
    val pca0 = Vectors.cachedPcaFitK(spark, dirA, 2, 1)

    // ---- the "ingest": replace dirA's content with dirB's ----
    after.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dirA/$name.parquet")
    }

    // ---- post-ingest queries must equal a fresh build over dirB ----
    val ranksA = SuffixRanks.suffixRankTable(spark, dirA).collect()
    val ranksB = SuffixRanks.suffixRankTable(spark, dirB).collect()
    assert(ranksA.toSeq === ranksB.toSeq,
      "suffix-rank index served stale rows after corpus mutation")
    assert(ranksA.length !== ranks0.length,
      "mutation fixture must actually change the answer")

    val centsA = Ivf.cachedCentroids(spark, dirA, 4, 1).collect()
    val centsB = Ivf.cachedCentroids(spark, dirB, 4, 1).collect()
    assert(centsA.map(_.toString).sorted.toSeq ===
      centsB.map(_.toString).sorted.toSeq, "stale IVF centroids")
    assert(centsA.map(_.toString).sorted.toSeq !==
      cents0.map(_.toString).sorted.toSeq,
      "mutation fixture must change the centroids")

    val cbA = Pq.cachedCodebook(spark, dirA, 8, 4, 1).collect()
    val cbB = Pq.cachedCodebook(spark, dirB, 8, 4, 1).collect()
    assert(cbA.map(_.toString).sorted.toSeq ===
      cbB.map(_.toString).sorted.toSeq, "stale PQ codebook")

    val vocabA = Unigram.cachedVocabs(spark, dirA)
    val vocabB = Unigram.cachedVocabs(spark, dirB)
    assert(vocabA === vocabB, "stale unigram vocabularies")
    assert(vocabA !== vocab0,
      "mutation fixture must change the vocabularies")

    val pcaA = Vectors.cachedPcaFitK(spark, dirA, 2, 1)
    val pcaB = Vectors.cachedPcaFitK(spark, dirB, 2, 1)
    (pcaA, pcaB) match {
      case (Some((muA, cA)), Some((muB, cB))) =>
        assert(muA.toSeq === muB.toSeq, "stale PCA mean")
        assert(cA.map { case (l, v) => (l, v.toSeq) } ===
          cB.map { case (l, v) => (l, v.toSeq) }, "stale PCA components")
        assert(pca0.isDefined && (muA.toSeq !== pca0.get._1.toSeq),
          "mutation fixture must change the PCA mean")
      case other => fail(s"PCA fit missing: $other")
    }
    assert(cb0 != null && pca0 != null) // fixture sanity, silence unused
  }

  test("suffix index persists across cache resets when corpus unchanged") {
    val dir = makeCorpus(Map("documents" -> docs(30)))
    SuffixRanks.cachedRanks(spark, dir).count()
    val stamp = CorpusStamp.of(spark, s"$dir/documents.parquet")
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val idx = Paths.get(sys.props("java.io.tmpdir"), "graft_suffix_idx",
      safe, f"s$stamp%016x")
    assert(Files.exists(idx.resolve("_SUCCESS")),
      "index must be persisted under its stamp-named directory")
    val mtime = Files.getLastModifiedTime(idx.resolve("_SUCCESS"))
    // second access: same stamp, must serve the persisted files
    SuffixRanks.cachedRanks(spark, dir).count()
    assert(Files.getLastModifiedTime(idx.resolve("_SUCCESS")) === mtime,
      "unchanged corpus must not trigger a rebuild")
  }
}
