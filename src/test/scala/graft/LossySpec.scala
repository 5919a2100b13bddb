package graft

import graft.operators.{Lossy, Multimodal}
import graft.operators.Lossy.JpegishCodec

/** The lossy (JPEG-shaped) codec family: closed-form dequantization,
  * genuine information loss, the malformed battery, and the survival
  * of the perceptual hash across the re-encode boundary.
  */
class LossySpec extends SparkTestBase {

  private def padded(s: String): (Int, Int, Array[Byte]) = {
    val w = (s.length % 5) + 2
    val h = (s.length + w - 1) / w
    (w, h, s.padTo(w * h, ' ').getBytes("US-ASCII"))
  }

  test("JpegishCodec round-trips the dequantization closed form " +
      "for every quantizer and length") {
    val samples = Seq("a", "Hello, world!", "x" * 37,
      (' ' to '~').mkString, "mixed 123 UPPER lower ~!@#")
    for (s <- samples; q <- Seq(1, 4, 16, 64)) {
      val (w, h, src) = padded(s)
      val (gw, gh, got) = JpegishCodec.decodeRaster(Lossy.jpegishEncode(s, q))
      assert((gw, gh) === (w, h), s"geometry q=$q len=${s.length}")
      val want = src.map(b => Lossy.dq(b & 0xff, q).toByte)
      assert(got === want, s"dequantized bytes q=$q len=${s.length}")
    }
  }

  test("the codec is genuinely lossy: decode != payload for q > 1, " +
      "and same-bucket sources decode identically") {
    val p = Lossy.jpegishEncode("Hello, world!", 16)
    val dec = JpegishCodec.decode(p)
    assert(dec.nonEmpty)
    // the scan bytes are coefficients p/q — no decoded byte region of
    // the payload equals the decode
    assert(!p.containsSlice(dec), "decode must not appear in the payload")
    // information destruction: 'a' (97) and 'b' (98) share the q=4
    // bucket -> identical decodes; distinct at q=1
    assert(JpegishCodec.decode(Lossy.jpegishEncode("a", 4)) ===
      JpegishCodec.decode(Lossy.jpegishEncode("b", 4)))
    assert(JpegishCodec.decode(Lossy.jpegishEncode("a", 1)) !==
      JpegishCodec.decode(Lossy.jpegishEncode("b", 1)))
  }

  test("malformed corners decode empty, never throw") {
    val s = "The quick brown fox jumps over the lazy dog"
    val ok = Lossy.jpegishEncode(s, 4)
    assert(JpegishCodec.decode(ok).nonEmpty, "sanity: clean payload decodes")
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = ok.clone(); f(c); c
    }
    // marker offsets: scan for the segment introducers
    def markerAt(m: Int): Int =
      ok.indices.dropRight(1).find(i =>
        (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == m).get
    val dqt = markerAt(0xdb)
    val sof = markerAt(0xc0)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "corrupted SOI" -> Lossy.jpegishEncode(s, 4, malformed = true),
      "empty buffer" -> Array.emptyByteArray,
      "truncated EOI" -> ok.dropRight(1),
      "trailing garbage" -> (ok :+ 0x00.toByte),
      "missing scan byte" -> (ok.dropRight(3) ++ ok.takeRight(2)),
      "quantizer 0" -> patched(_(dqt + 4) = 0),
      "quantizer 65" -> patched(_(dqt + 4) = 65),
      "zero height" -> patched { c => c(sof + 4) = 0; c(sof + 5) = 0 },
      // u16 x u16 geometry overflow: allocation must be guarded in
      // Long math (the PNG lesson) — and the scan-length check alone
      // must not be what saves us, so the guard sits in the SOF case
      "geometry overflow" -> patched { c =>
        c(sof + 4) = 0xff.toByte; c(sof + 5) = 0xff.toByte
        c(sof + 6) = 0xff.toByte; c(sof + 7) = 0xff.toByte
      },
      "unknown marker" -> patched(_(dqt + 1) = 0xc4.toByte),
      "DQT length lie" -> patched(_(dqt + 3) = 9),
      "segment past buffer" -> ok.take(6))
    for ((name, payload) <- cases)
      assert(JpegishCodec.decode(payload).isEmpty, name)
  }

  test("dHash survives quantization on strong gradients, collapses " +
      "weak ones — and quantization never REVERSES a gradient") {
    // strong gradient: a/z alternation, 25 chars apart — every sampled
    // gradient survives q=16 (buckets 104 vs 120)
    val strong = "az" * 10 // len 20 -> w = 2
    val (w, h, src) = padded(strong)
    val orig = Multimodal.dHashChunks(w, h, src).get
    val q16 = Multimodal.dHashChunks(w, h,
      src.map(b => Lossy.dq(b & 0xff, 16).toByte)).get
    assert(orig === q16, "strong gradients survive q=16 bit-exactly")
    // weak gradient: a/b alternation collapses in the q=4 bucket
    val weak = "ab" * 10
    val (w2, h2, src2) = padded(weak)
    val worig = Multimodal.dHashChunks(w2, h2, src2).get
    val wq4 = Multimodal.dHashChunks(w2, h2,
      src2.map(b => Lossy.dq(b & 0xff, 4).toByte)).get
    assert(worig !== wq4, "a sub-quantizer gradient must collapse")
    // monotonicity: collapsed bits only ever flip 1 -> 0 (a '>' can
    // become '=' but never '<'), so the quantized hash is a bit-subset
    def bits(c: (Int, Int, Int, Int)): Long =
      (c._1.toLong & 0xffff) | (c._2.toLong & 0xffff) << 16 |
        (c._3.toLong & 0xffff) << 32 | (c._4.toLong & 0xffff) << 48
    assert((bits(wq4) & ~bits(worig)) === 0L,
      "quantization must never set a bit the original lacks")
  }

  test("media_lossy_near_dup: pairs match a scalar recomputation " +
      "at sf0.001, and the identity arm always survives") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hs = docs.flatMap { case (id, text) =>
      if (id % 23 == 5) Nil // corrupted: both encodes decode empty
      else {
        val s = text.replaceAll("[^ -~]", "")
        if (s.isEmpty) Nil
        else {
          val (w, h, src) = padded(s)
          val q = Lossy.qFor(id)
          val orig = Multimodal.dHashChunks(w, h, src).map(id -> _)
          val re = Multimodal.dHashChunks(w, h,
            src.map(b => Lossy.dq(b & 0xff, q).toByte))
            .map((id + Lossy.ReencodedIdOffset) -> _)
          orig.toSeq ++ re.toSeq
        }
      }
    }
    val want = (for {
      (a, ca) <- hs; (b, cb) <- hs if a < b
      d = Integer.bitCount(ca._1 ^ cb._1) + Integer.bitCount(ca._2 ^ cb._2) +
        Integer.bitCount(ca._3 ^ cb._3) + Integer.bitCount(ca._4 ^ cb._4)
      if d <= 3
    } yield (a, b, d)).sortBy(p => (p._1, p._2)).toSeq
    val got = Lossy.mediaLossyNearDup(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
    // the q=1 third re-encodes losslessly: every such doc must pair
    // with its own re-encode at hamming 0
    val gotSet = got.map(p => (p._1, p._2)).toSet
    val identityArm = hs.collect {
      case (id, _) if id < Lossy.ReencodedIdOffset && id % 3 == 0 => id
    }
    assert(identityArm.nonEmpty)
    identityArm.foreach { id =>
      assert(gotSet.contains((id, id + Lossy.ReencodedIdOffset)),
        s"lossless re-encode of doc $id must pair with itself")
    }
    // and some genuinely LOSSY doc must also survive its re-encode —
    // the family's reason to exist
    assert(docs.exists { case (id, _) =>
      id % 3 != 0 && gotSet.contains((id, id + Lossy.ReencodedIdOffset))
    }, "no lossy re-encode survived its quantization")
  }
}
