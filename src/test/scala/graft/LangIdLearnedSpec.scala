package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.operators.{QualityClassifier, TextAnalysis}

/** Learned lang-id: bit-level check of the one-vs-rest family against
  * an independent scalar reimplementation (per-language binary GD +
  * raw-margin argmax with language-code tie-break), and the agreement
  * check vs the marker-word heuristic on a separable fixture where the
  * heuristic is unambiguous.
  */
class LangIdLearnedSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def bucket(bg: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bg.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  private def round(d: Double, s: Int): Double =
    BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def dec12(d: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(round(d, 12)))
      .setScale(12, RoundingMode.HALF_UP)

  /** Scalar one-vs-rest reference: the QualityClassifierSpec trainer,
    * run per language, then argmax on raw z (ties: language asc).
    */
  private def scalarLangId(rows: Seq[(Long, String, String)], b: Int,
      lr: Double, epochs: Int)
      : Seq[(Long, Long, String, Double, Boolean)] = {
    def words(t: String): Seq[String] = t.split("[ \t\n]+").toSeq
      .map(_.filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
        .toLowerCase)
      .filter(_.nonEmpty)
    val feats = rows.flatMap { case (id, t, lang) =>
      val ws = words(t)
      if (ws.length < 2) None
      else {
        val bgs = ws.sliding(2).map(p => bucket(p.mkString(" "), b)).toSeq
        val n = bgs.length.toDouble
        Some((id, lang, bgs.length.toLong,
          bgs.groupBy(identity).view.mapValues(_.length / n).toMap))
      }
    }.sortBy(_._1)
    def dsum(terms: Iterable[Double]): Double =
      terms.map(dec12).foldLeft(JBigDecimal.ZERO)(_.add(_)).doubleValue
    def sigmoid(z: Double): Double = round(1.0 / (1.0 + math.exp(-z)), 9)
    val langs = rows.map(_._3).distinct.sorted
    val zByLang = langs.map { tgt =>
      var w = Map.empty[Long, Double].withDefaultValue(0.0)
      var bias = 0.0
      var probs: Map[Long, Double] = feats.map(f => f._1 -> 0.5).toMap
      def margins(): Map[Long, Double] = feats.map { case (id, _, _, xs) =>
        id -> (bias + dsum(xs.map { case (bk, x) => x * w(bk) }))
      }.toMap
      var e = 0
      while (e < epochs) {
        val g = feats.flatMap { case (id, lang, _, xs) =>
          val y = if (lang == tgt) 1.0 else 0.0
          xs.map { case (bk, x) => bk -> (y - probs(id)) * x }
        }.groupBy(_._1).view.mapValues(ts => dsum(ts.map(_._2))).toMap
        val g0 = dsum(feats.map { case (id, lang, _, _) =>
          (if (lang == tgt) 1.0 else 0.0) - probs(id)
        })
        w = (0L until b).map(bk =>
          bk -> round(w(bk) + lr * g.getOrElse(bk, 0.0), 12)).toMap
          .withDefaultValue(0.0)
        bias = round(bias + lr * g0, 12)
        e += 1
        if (e < epochs) probs = margins().view.mapValues(sigmoid).toMap
      }
      tgt -> margins()
    }.toMap
    feats.map { case (id, lang, n, _) =>
      val (tgt, z) = langs.map(t => t -> zByLang(t)(id))
        .minBy { case (t, z) => (-z, t) }
      (id, n, tgt, sigmoid(z), tgt == lang)
    }
  }

  test("lang_id_learned matches the scalar one-vs-rest reference " +
      "exactly (B = 8 forced collisions, 3 languages)") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick brown fox the quick brown fox", "en"),
      (3L, "der schnelle braune fuchs springt hoch", "de"),
      (4L, "le renard brun rapide saute par dessus", "fr"),
      (5L, "lazy dog sleeps all day long every day", "en"),
      (6L, "fuchs springt der hund schlaeft tief", "de"),
      (7L, "word", "en"), // one word: absent by contract
      (8L, "le chien dort toute la journee ici", "fr"))
    val got = QualityClassifier
      .langScores(spark, docsDf(rows), buckets = 8, lr = 0.5, epochs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getBoolean(4)))
      .toSeq
    val want = scalarLangId(rows, b = 8, lr = 0.5, epochs = 2)
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L))
    assert(got === want)
  }

  test("separable fixture: trained argmax agrees with the marker-word " +
      "heuristic where the heuristic is unambiguous") {
    // each doc is its language's own marker words — the heuristic
    // scores 8 for the true language and <= 4 for any other, and the
    // languages share almost no bigrams, so 2 epochs separate them
    val marker = Map(
      "en" -> "the and of to in is that with",
      "de" -> "der die das und ist nicht mit ein",
      "es" -> "el la de que y en un es",
      "fr" -> "le la de et un est que dans",
      "zh" -> "de shi le zai he you wo ta")
    val rows = marker.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((lang, text), i) =>
        // 4 docs per language: the marker line, repeated and reversed
        // variants (bigram diversity without cross-language overlap)
        val ws = text.split(" ")
        Seq(
          (i * 4 + 0L, text, lang),
          (i * 4 + 1L, text + " " + text, lang),
          (i * 4 + 2L, ws.reverse.mkString(" "), lang),
          (i * 4 + 3L, (ws ++ ws.reverse).mkString(" "), lang))
    }
    val docs = docsDf(rows)
    val learned = QualityClassifier
      .langScores(spark, docs, buckets = 1024, lr = 0.5, epochs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val heur = TextAnalysis.langId(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, lang) =>
      assert(heur(id) === lang, s"fixture not unambiguous for doc $id")
      assert(learned(id) === lang,
        s"doc $id: learned ${learned(id)} != true $lang")
    }
    // every doc featured, every prediction matched the label
    assert(learned.size === rows.size)
  }
}
