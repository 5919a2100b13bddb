package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

/** Boilerplate removal: violator matrix (every drop rule triggered and
  * only by its own condition), entity round-trip through the page, and
  * the extracted-content digest.
  */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def verdicts(docs: Seq[(Long, String)]) =
    Boilerplate.blockVerdicts(
      Boilerplate.htmlView(docs.toDF("doc_id", "text")))
      .orderBy(col("doc_id"), col("block_idx"))
      .collect()

  test("chrome blocks are always boilerplate; content p-blocks keep") {
    // doc 1: one 8-word line, no anchor ((1+0)%5=1), terminal '.'
    val rows = verdicts(Seq(1L -> "one two three four five six seven eight"))
    assert(rows.length === 3) // nav, one p, footer
    val nav = rows(0); val p = rows(1); val ft = rows(2)
    assert(nav.getAs[String]("tag") === "nav" && !nav.getAs[Boolean]("keep"))
    assert(nav.getAs[Long]("link_len") === 12L) // "home"+"about us"
    assert(nav.getAs[Long]("text_len") === 13L) // "home about us"
    assert(ft.getAs[String]("tag") === "footer" && !ft.getAs[Boolean]("keep"))
    assert(ft.getAs[Long]("text_len") === 30L) // entity-decoded '&'
    assert(p.getAs[String]("tag") === "p" && p.getAs[Boolean]("keep"))
    assert(p.getAs[Long]("n_words") === 8L && p.getAs[Long]("link_len") === 0L)
  }

  test("word-count rule: a short line drops even with zero links") {
    // doc 1, 2 words: line = "a b." -> n_words 2 < 5, link_len 0
    val p = verdicts(Seq(1L -> "a b")).apply(1)
    assert(p.getAs[Long]("n_words") === 2L)
    assert(p.getAs[Long]("link_len") === 0L)
    assert(!p.getAs[Boolean]("keep"), "n_words >= 5 is its own gate")
  }

  test("link-density rule: integer boundary, independent of n_words") {
    // doc 2 line 0 gets the anchor ((2+0)%5=2): visible =
    // "alpha beta gamma. read more" -> n_words 5 (passes), text_len
    // 27, link_len 9: 900 > 891 = 27*33 -> density kills it alone
    val p = verdicts(Seq(2L -> "alpha beta gamma")).apply(1)
    assert(p.getAs[Long]("n_words") === 5L)
    assert(p.getAs[Long]("text_len") === 27L)
    assert(p.getAs[Long]("link_len") === 9L)
    assert(!p.getAs[Boolean]("keep"), "density gate: 9*100 > 27*33")
    // one more visible char flips it: 4 words -> text_len 34,
    // 900 <= 1122, n_words 6 -> kept
    val q = verdicts(Seq(2L -> "alpha beta gamma delta")).apply(1)
    assert(q.getAs[Long]("link_len") === 9L)
    assert(q.getAs[Boolean]("keep"))
  }

  test("entity round-trip: markup-significant chars in content survive") {
    // tokens with & < > must be escaped into the page and decoded
    // back out; a tag-strip without entity decode would eat "<tag>"
    val docs = Seq(1L -> "one <tag> two thr&ee four five six seven")
    val html = Boilerplate.htmlView(docs.toDF("doc_id", "text"))
      .select("html").as[String].head()
    assert(html.contains("&lt;tag&gt;") && html.contains("thr&amp;ee"),
      "page must entity-escape content")
    val p = Boilerplate.blockVerdicts(
      Boilerplate.htmlView(docs.toDF("doc_id", "text")))
      .filter(col("tag") === "p").select("text").as[String].head()
    assert(p === "one <tag> two thr&ee four five six seven.",
      "extraction must decode entities back to the original line")
  }

  test("violator matrix at sf0.001: every rule fires, verdicts are " +
      "exactly the three gates") {
    val rows = Boilerplate
      .boilerplateBlocks(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getAs[String]("tag") == "p" &&
        r.getAs[Long]("n_words") >= 5L &&
        r.getAs[Long]("link_len") * 100 <= r.getAs[Long]("text_len") * 33
      assert(r.getAs[Boolean]("keep") === expect,
        s"verdict must be exactly the three gates: $r")
    }
    def dropped(f: org.apache.spark.sql.Row => Boolean) =
      rows.exists(r => !r.getAs[Boolean]("keep") && f(r))
    assert(rows.filter(_.getAs[String]("tag") != "p")
      .forall(!_.getAs[Boolean]("keep")), "chrome never keeps")
    assert(dropped(r => r.getAs[String]("tag") == "p" &&
      r.getAs[Long]("n_words") < 5L), "word-count violator exists")
    assert(dropped(r => r.getAs[String]("tag") == "p" &&
      r.getAs[Long]("n_words") >= 5L &&
      r.getAs[Long]("link_len") * 100 > r.getAs[Long]("text_len") * 33),
      "density violator exists")
    assert(rows.exists(_.getAs[Boolean]("keep")), "content survives")
  }

  test("filter digest: clean_md5 is the kept blocks' text in order") {
    val docs = Seq(7L -> ("w1 w2 w3 w4 w5 w6 w7 w8 " * 4).trim)
    val v = Boilerplate.blockVerdicts(
      Boilerplate.htmlView(docs.toDF("doc_id", "text")))
      .orderBy(col("block_idx")).collect()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(v.filter(_.getAs[Boolean]("keep"))
        .map(_.getAs[String]("text")).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = Boilerplate.boilerplateFilter(spark, sf("sf0.001"))
    // digest computed on the handcrafted doc via the same operator path
    val handDigest = Boilerplate.blockVerdicts(
      Boilerplate.htmlView(docs.toDF("doc_id", "text")))
      .groupBy(col("doc_id"))
      .agg(md5(array_join(filter(transform(
        array_sort(collect_list(struct(col("block_idx"), col("keep"),
          col("text")))),
        s => when(s.getField("keep"), s.getField("text"))),
        x => x.isNotNull), "\n")).as("m"))
      .select("m").as[String].head()
    assert(handDigest === expect)
    // and the registry query carries well-formed per-doc rollups
    val one = got.filter(col("doc_id") === 0L).collect().head
    assert(one.getAs[Long]("n_blocks") ===
      one.getAs[Long]("n_kept") +
        rowsDropped(spark, one.getAs[Long]("doc_id")))
  }

  private def rowsDropped(s: org.apache.spark.sql.SparkSession,
      id: Long): Long =
    Boilerplate.boilerplateBlocks(s, sf("sf0.001"))
      .filter(col("doc_id") === id && !col("keep")).count()
}
