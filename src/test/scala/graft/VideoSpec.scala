package graft

import graft.operators.{Multimodal, Video}
import graft.operators.Video.AnimGifCodec

/** The animated-GIF clip family: multi-frame decode through the shared
  * LZW core, per-frame closed form, majority voting, the malformed
  * battery, and the scalar recomputation of the pair join.
  */
class VideoSpec extends SparkTestBase {

  private def closedForm(s: String): (Int, Int, Int, Array[Byte]) = {
    val w = (s.length % 6) + 2
    val h = (s.length + w - 1) / w
    val f = (s.length % 3) + 2
    (w, h, f, s.padTo(w * h, ' ').getBytes("US-ASCII"))
  }

  test("decodeFrames round-trips the closed form: F-1 brightened " +
      "content frames + one reversed outlier, for F = 2, 3, 4") {
    // lengths chosen to hit every frame count: len%3 = 0 -> F=2,
    // 1 -> F=3, 2 -> F=4
    for (s <- Seq("abcdef~xyz AB", "Hello, world!!", "The quick brown fox",
        "a~z", "xy")) {
      val (w, h, f, base) = closedForm(s)
      val (gw, gh, frames) = AnimGifCodec.decodeFrames(Video.animGifEncode(s))
      assert((gw, gh) === (w, h), s"geometry len=${s.length}")
      assert(frames.length === f, s"frame count len=${s.length}")
      for (i <- 0 until f - 1)
        assert(frames(i) === base.map(b => (b + i).toByte),
          s"content frame $i len=${s.length}")
      assert(frames(f - 1) === base.reverse, s"outlier frame len=${s.length}")
    }
  }

  test("content frames dHash identically (uniform shift is a gradient " +
      "no-op) and the outlier differs on real text") {
    val s = "The quick brown fox jumps over the lazy dog"
    val (w, h, _, base) = closedForm(s)
    val (_, _, frames) = AnimGifCodec.decodeFrames(Video.animGifEncode(s))
    val hashes = frames.map(Multimodal.dHashChunks(w, h, _).get)
    assert(hashes.dropRight(1).distinct.size === 1,
      "all content frames must share one hash")
    assert(hashes.dropRight(1).head === Multimodal.dHashChunks(w, h, base).get)
    assert(hashes.last !== hashes.head, "the reversed outlier must differ")
  }

  test("majorityChunks: strict majority per bit, ties break 0") {
    val a = (0xffff, 0, 0, 0)
    val b = (0x00ff, 0, 0, 0)
    // 2-of-3 majority keeps a's consensus with itself
    assert(Video.majorityChunks(Seq(a, a, b)) === Some(a))
    // 1-of-2 is a tie -> AND
    assert(Video.majorityChunks(Seq(a, b)) === Some((0x00ff, 0, 0, 0)))
    assert(Video.majorityChunks(Nil) === None)
  }

  test("malformed corners decode to NO frames, never throw") {
    val s = "The quick brown fox jumps over the lazy dog"
    val ok = Video.animGifEncode(s)
    assert(AnimGifCodec.decodeFrames(ok)._3.nonEmpty, "sanity")
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = ok.clone(); f(c); c
    }
    // first image descriptor: after header(13) + palette(768) + GCE(8)
    val desc = 13 + 768 + 8
    assert((ok(desc) & 0xff) === 0x2c, "fixture: descriptor offset")
    val cases: Seq[(String, Array[Byte])] = Seq(
      "corrupted signature" -> Video.animGifEncode(s, malformed = true),
      "empty buffer" -> Array.emptyByteArray,
      "missing trailer" -> ok.dropRight(1),
      "truncated mid-frame" -> ok.take(ok.length / 2),
      "sub-frame geometry" -> patched(_(desc + 5) = 1.toByte),
      "nonzero frame origin" -> patched(_(desc + 1) = 1.toByte),
      "garbled LZW stream" -> patched { c =>
        // flip bits well inside the first frame's first sub-block
        val sb = desc + 10 + 1 + 1
        c(sb) = (c(sb) ^ 0x55).toByte
      },
      "no frames at all" -> (ok.take(13 + 768) :+ 0x3b.toByte))
    for ((name, payload) <- cases)
      assert(AnimGifCodec.decodeFrames(payload)._3.isEmpty, name)
  }

  test("video_near_dup: pairs match a scalar recomputation at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hs = docs.flatMap { case (id, text) =>
      if (id % 29 == 11) None
      else {
        val s = text.replaceAll("[^ -~]", "")
        if (s.isEmpty) None
        else {
          val (w, h, f, base) = closedForm(s)
          val content = Multimodal.dHashChunks(w, h, base).get
          val outlier = Multimodal.dHashChunks(w, h, base.reverse).get
          Video.majorityChunks(
            Seq.fill(f - 1)(content) :+ outlier).map(id -> _)
        }
      }
    }
    val want = (for {
      (a, ca) <- hs; (b, cb) <- hs if a < b
      d = Integer.bitCount(ca._1 ^ cb._1) + Integer.bitCount(ca._2 ^ cb._2) +
        Integer.bitCount(ca._3 ^ cb._3) + Integer.bitCount(ca._4 ^ cb._4)
      if d <= 3
    } yield (a, b, d)).sortBy(p => (p._1, p._2)).toSeq
    val got = Video.videoNearDup(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture corpus should contain near-dup clips")
    val ids = got.flatMap(p => Seq(p._1, p._2)).toSet
    assert(ids.forall(_ % 29 != 11), "corrupted clips must not appear")
  }
}
