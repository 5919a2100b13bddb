package graft

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import graft.operators.QualityClassifier

/** Bit-level check of the learned quality classifier against an
  * independent scalar reimplementation of the exact training recipe
  * (hashed bigrams, 2-epoch full-batch logistic GD, 12-dp decimal
  * gradient sums, 9-dp sigmoid outputs) on a corpus small enough to
  * enumerate — including forced bucket collisions (B = 8), docs with
  * fewer than two surviving words (absent by contract), and both
  * label classes.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    rows.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bucket(bg: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bg.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  // Spark Round semantics on double: shortest-decimal repr, HALF_UP
  private def round(d: Double, s: Int): Double =
    BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def dec12(d: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(round(d, 12)))
      .setScale(12, RoundingMode.HALF_UP)

  /** The scalar reference trainer: same tokenizer, same hash, same
    * rounding discipline, plain loops.
    */
  private def scalarScores(rows: Seq[(Long, String, String)], b: Int,
      lr: Double, epochs: Int): Seq[(Long, Long, Double, Boolean)] = {
    def words(t: String): Seq[String] = t.split("[ \t\n]+").toSeq
      .map(_.filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
        .toLowerCase)
      .filter(_.nonEmpty)
    // (doc_id, y, n_bg, Map(bucket -> x))
    val feats = rows.flatMap { case (id, t, lang) =>
      val ws = words(t)
      if (ws.length < 2) None
      else {
        val bgs = ws.sliding(2).map(p => bucket(p.mkString(" "), b)).toSeq
        val n = bgs.length.toDouble
        Some((id, if (lang == "en") 1.0 else 0.0, bgs.length.toLong,
          bgs.groupBy(identity).view.mapValues(_.length / n).toMap))
      }
    }.sortBy(_._1)
    var w = Map.empty[Long, Double].withDefaultValue(0.0)
    var bias = 0.0
    var probs: Map[Long, Double] = feats.map(f => f._1 -> 0.5).toMap
    def dsum(terms: Iterable[Double]): Double =
      terms.map(dec12).foldLeft(JBigDecimal.ZERO)(_.add(_)).doubleValue
    def sigmoid(z: Double): Double = round(1.0 / (1.0 + math.exp(-z)), 9)
    def margins(): Map[Long, Double] = feats.map { case (id, _, _, xs) =>
      id -> (bias + dsum(xs.map { case (bk, x) => x * w(bk) }))
    }.toMap
    var e = 0
    while (e < epochs) {
      val g = feats.flatMap { case (id, y, _, xs) =>
        xs.map { case (bk, x) => bk -> (y - probs(id)) * x }
      }.groupBy(_._1).view.mapValues(ts => dsum(ts.map(_._2))).toMap
      val g0 = dsum(feats.map { case (id, y, _, _) => y - probs(id) })
      w = (0L until b).map(bk =>
        bk -> round(w(bk) + lr * g.getOrElse(bk, 0.0), 12)).toMap
        .withDefaultValue(0.0)
      bias = round(bias + lr * g0, 12)
      e += 1
      if (e < epochs)
        probs = margins().view.mapValues(sigmoid).toMap
    }
    val z = margins()
    feats.map { case (id, _, n, _) =>
      (id, n, sigmoid(z(id)), z(id) >= 0.0)
    }
  }

  test("classifier scores match the scalar reference trainer exactly") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick brown fox the quick brown fox", "en"),
      (3L, "der schnelle braune fuchs springt", "de"),
      (4L, "le renard brun rapide saute par dessus", "fr"),
      (5L, "lazy dog sleeps all day long every day", "en"),
      (6L, "fuchs springt der hund schlaeft", "de"),
      (7L, "word", ""), // one word: no bigrams, absent by contract
      (8L, "", "en"), // empty: absent
      (9L, "a b a b a b c", "en"),
      (10L, "!!! ??? ...", "de")) // normalizes to nothing: absent
    val dir = docsDir(rows)
    val got = QualityClassifier
      .scores(spark, dir, targetLang = "en", buckets = 8,
        lr = 0.5, epochs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq
    val want = scalarScores(rows, b = 8, lr = 0.5, epochs = 2)
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L),
      "docs without two surviving words must be absent")
    assert(got === want)
    // the learned boundary is non-degenerate on this fixture: both
    // verdicts occur (w != 0 after epoch 1, so scores moved off 0.5)
    assert(got.map(_._4).distinct.size === 2,
      "fixture should produce both keep verdicts")
  }

  test("more epochs move scores toward the labels (training trains)") {
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon eta", "en"),
      (3L, "omega psi chi phi upsilon tau", "de"),
      (4L, "omega psi chi phi upsilon sigma", "de"))
    val dir = docsDir(rows)
    def avgGap(epochs: Int): Double = {
      val s = QualityClassifier
        .scores(spark, dir, targetLang = "en", buckets = 64,
          lr = 0.5, epochs = epochs)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      s.map { case (id, p) =>
        val y = if (id <= 2) 1.0 else 0.0
        math.abs(y - p)
      }.sum / s.length
    }
    assert(avgGap(3) < avgGap(1),
      "separable fixture: epoch-3 scores should sit closer to labels")
  }
}
