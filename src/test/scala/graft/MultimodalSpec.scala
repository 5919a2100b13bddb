package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, StubCodec}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media table carries typed metadata and binary payloads") {
    val m = Multimodal.mediaTable(spark, sf("sf0.001"))
    assert(m.schema("payload").dataType.typeName === "binary")
    val kinds = m.select("kind").distinct().as[String].collect().sorted
    assert(kinds === Array("audio", "image", "video"))
  }

  test("entropy: constant bytes -> 0, spread bytes -> high") {
    val recs = Seq(
      MediaRecord(1L, "image", Array.fill[Byte](256)(65)),
      MediaRecord(2L, "image", (0 until 256).map(_.toByte).toArray))
      .toDS()
    val f = Multimodal.extractFeatures(recs, StubCodec).collect()
      .map(x => x.doc_id -> x).toMap
    assert(f(1L).entropy === 0.0)
    assert(math.abs(f(2L).entropy - 4.0) < 1e-9) // 16 uniform bins = 4 bits
    assert(f(2L).histogram.length === 16)
    assert(f(2L).histogram.forall(h => math.abs(h - 1.0 / 16) < 1e-12))
  }

  test("frame sampling counts every Nth byte") {
    val recs = Seq(MediaRecord(1L, "video", new Array[Byte](130))).toDS()
    val f = Multimodal.extractFeatures(recs, StubCodec, frameStep = 64)
      .collect().head
    assert(f.frames_sampled === 3) // bytes 0, 64, 128
  }

  test("a custom codec slots in without changing the plumbing") {
    val upper = new Multimodal.Codec {
      override def decode(p: Array[Byte]): Array[Byte] = p.map(b => (b & 0x7f).toByte)
    }
    val recs = Seq(MediaRecord(1L, "audio", Array[Byte](-1, -1, 0))).toDS()
    val f = Multimodal.extractFeatures(recs, upper).collect().head
    assert(f.n_bytes === 3)
  }

  test("resize produces a fixed shape for any input length") {
    assert(Multimodal.resizeTo(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 4)
      === Array[Byte](1, 3, 5, 7))
    assert(Multimodal.resizeTo(Array[Byte](9), 4) === Array[Byte](9, 9, 9, 9))
    assert(Multimodal.resizeTo(Array.empty[Byte], 4)
      === Array[Byte](0, 0, 0, 0))
  }

  test("RleCodec genuinely transforms: expansion, truncation, empty") {
    // (3,'a') (1,'b') (2,'c') -> "aaabcc"
    val payload = Array[Byte](3, 'a', 1, 'b', 2, 'c')
    assert(Multimodal.RleCodec.decode(payload)
      === "aaabcc".getBytes("US-ASCII"))
    // trailing odd byte = truncated packet, ignored
    assert(Multimodal.RleCodec.decode(Array[Byte](2, 'x', 9))
      === "xx".getBytes("US-ASCII"))
    assert(Multimodal.RleCodec.decode(Array.empty[Byte]) === Array.empty[Byte])
    // run length is unsigned: -1 = 255 repeats
    assert(Multimodal.RleCodec.decode(Array[Byte](-1, 'z')).length === 255)
  }

  test("rleEncode/RleCodec round-trip matches the closed form") {
    val s = "hello world"
    val decoded = Multimodal.RleCodec.decode(Multimodal.rleEncode(s))
    val expect = s.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(((i + 1) % 5) + 1)(c) }.mkString
    assert(new String(decoded, "US-ASCII") === expect)
  }

  test("features are computed on DECODED bytes, not the payload") {
    // payload (4,'a') decodes to "aaaa": n_bytes must be 4 (not 2) and
    // the histogram must be pure 'a' (high nibble 6) with entropy 0 —
    // an identity codec would see byte 0x04 too and entropy > 0
    val recs = Seq(MediaRecord(1L, "image", Array[Byte](4, 'a'))).toDS()
    val f = Multimodal.extractFeatures(recs, Multimodal.RleCodec).collect().head
    assert(f.n_bytes === 4L)
    assert(f.entropy === 0.0)
    assert(f.histogram(6) === 1.0)
    assert(f.preview === Array.fill[Byte](16)('a'))
  }

  test("one codec construction per partition (batched init)") {
    val built = spark.sparkContext.longAccumulator("codec_inits")
    val recs = (1L to 100L).map(i =>
      MediaRecord(i, "image", Array[Byte](2, (i % 64 + 32).toByte)))
      .toDS().repartition(7)
    val out = Multimodal.extractFeatures(recs, () => {
      built.add(1)
      Multimodal.RleCodec
    }, 64).collect()
    assert(out.length === 100)
    assert(built.value === 7L,
      "codec factory must run once per partition, not per record")
  }

  test("media stats are real byte stats") {
    val r = Multimodal.mediaStats(spark, sf("sf0.001"))
      .filter(col("doc_id") === 0).collect().head
    assert(r.getString(3).matches("[0-9a-f]{64}"))
    assert(r.getLong(2) > 0)
  }

  test("WavCodec round-trips wavEncode for every length and junk parity") {
    for (n <- Seq(0, 1, 2, 5, 6, 7, 13, 64, 200)) {
      val text = ("the quick brown fox " * 12).take(n)
      val wav = Multimodal.wavEncode(text)
      assert(Multimodal.WavCodec.decode(wav).toSeq ===
        text.getBytes("US-ASCII").toSeq,
        s"round-trip failed at n=$n (junkLen=${(n % 7) + 1})")
    }
  }

  test("BmpCodec round-trips bmpEncode: every width/stride/row-order/gap") {
    // n mod 5 covers every width 1..5 (stride pad 3,2,1,0,3), n mod 2
    // covers both row orders, n mod 7 covers every palette->pixel gap
    for (n <- 0 to 120) {
      val text = ("sphinx of black quartz judge my vow " * 4).take(n)
      val w = (n % 5) + 1
      val raster = if (n == 0) 0 else w * ((n + w - 1) / w)
      val expected = text.padTo(raster, ' ').getBytes("US-ASCII").toSeq
      val got = Multimodal.BmpCodec.decode(Multimodal.bmpEncode(text)).toSeq
      assert(got === expected,
        s"round-trip failed at n=$n (w=$w, topDown=${n % 2 == 0}, gap=${n % 7})")
    }
  }

  test("BmpCodec malformed corners decode empty, never throw") {
    val text = "bottom up raster rows" // n=21: w=2, bottom-up, gap=0
    val good = Multimodal.bmpEncode(text)
    def bytes(xs: Array[Byte]) = Multimodal.BmpCodec.decode(xs).toSeq
    assert(bytes(good).nonEmpty)
    // corrupted magic (the bmpMediaTable malformed subset)
    assert(bytes(Multimodal.bmpEncode(text, malformed = true)) === Seq.empty)
    // not a BMP at all / too short for the headers
    assert(bytes("plainly not a bitmap".getBytes("US-ASCII")) === Seq.empty)
    assert(bytes(Array[Byte]('B', 'M', 3)) === Seq.empty)
    assert(bytes(Array.emptyByteArray) === Seq.empty)
    def mut(i: Int, v: Byte): Array[Byte] = {
      val c = good.clone; c(i) = v; c
    }
    def mutI32(i: Int, v: Int): Array[Byte] = {
      val c = good.clone
      c(i) = v.toByte; c(i + 1) = (v >> 8).toByte
      c(i + 2) = (v >> 16).toByte; c(i + 3) = (v >> 24).toByte
      c
    }
    // zero / negative width, zero height
    assert(bytes(mutI32(18, 0)) === Seq.empty)
    assert(bytes(mutI32(18, -3)) === Seq.empty)
    assert(bytes(mutI32(22, 0)) === Seq.empty)
    // planes != 1, bpp != 8, compressed (BI_RLE8)
    assert(bytes(mut(26, 2)) === Seq.empty)
    assert(bytes(mut(28, 24)) === Seq.empty)
    assert(bytes(mut(30, 1)) === Seq.empty)
    // bfOffBits pointing before the DIB header end, or past the extent
    assert(bytes(mutI32(10, 14)) === Seq.empty)
    assert(bytes(mutI32(10, good.length)) === Seq.empty)
    // declared bfSize shrunk so the raster runs past the extent: empty
    // (the container lies about itself — the WAV declared-extent rule)
    assert(bytes(mutI32(2, good.length - 4)) === Seq.empty)
    // physically truncated raster: empty, no salvage — bottom-up order
    // puts the logically-first samples physically last
    assert(bytes(java.util.Arrays.copyOf(good, good.length - 2)) === Seq.empty)
    // inflated height claiming rows past both extents: empty
    assert(bytes(mutI32(22, 1000000)) === Seq.empty)
    // the gap indirection is honored: the decoder reads pixels at
    // bfOffBits, so the variable gap bytes never leak into the output
    val gapText = text + " x" // n=23: gap = 23 % 7 = 2
    val decoded = Multimodal.BmpCodec.decode(Multimodal.bmpEncode(gapText))
    assert(!decoded.contains(0x5a.toByte) ||
      gapText.contains('Z'), "gap filler leaked into decoded pixels")
  }

  test("WavCodec malformed corners decode empty, truncation salvages") {
    val good = Multimodal.wavEncode("hello wav world")
    def bytes(xs: Array[Byte]) = Multimodal.WavCodec.decode(xs).toSeq
    // corrupted magic (the wavMediaTable malformed subset)
    assert(bytes(Multimodal.wavEncode("hello wav world",
      malformed = true)) === Seq.empty)
    // not RIFF at all / too short for any header
    assert(bytes("plainly not a wav container".getBytes("US-ASCII"))
      === Seq.empty)
    assert(bytes(Array[Byte](82, 73, 70)) === Seq.empty)
    assert(bytes(Array.emptyByteArray) === Seq.empty)
    // RIFF but wrong form tag
    val notWave = good.clone
    notWave(8) = 'A'.toByte
    assert(bytes(notWave) === Seq.empty)
    // truncated mid-data: salvage the available samples
    val cut = java.util.Arrays.copyOf(good, good.length - 6)
    val salvaged = bytes(cut)
    assert(salvaged.nonEmpty && salvaged.size < "hello wav world".length)
    assert(salvaged === "hello wav world".getBytes("US-ASCII")
      .toSeq.take(salvaged.size), "salvage must keep leading samples")
    // truncated before data ever appears: empty
    assert(bytes(java.util.Arrays.copyOf(good, 20)) === Seq.empty)
    // declared RIFF extent hides the data chunk: empty (strict walk)
    val shrunk = good.clone
    // riff size field at offset 4 (LE): declare only up to fmt
    val tiny = 4 + 8 + 16
    shrunk(4) = tiny.toByte; shrunk(5) = 0; shrunk(6) = 0; shrunk(7) = 0
    assert(bytes(shrunk) === Seq.empty)
    // data SIZE runs past the declared RIFF extent while the physical
    // bytes exist (appended junk outside the container): the container
    // lies about itself — must decode empty, never salvage bytes from
    // beyond the declared extent
    val dataAt = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "data").get
    val inflated = java.util.Arrays.copyOf(good, good.length + 64)
    inflated(dataAt + 4) = ((good.length - dataAt - 8) + 64).toByte
    assert(bytes(inflated) === Seq.empty,
      "oversized data chunk must not salvage out-of-container bytes")
    // data before a valid PCM fmt: empty (header-less samples are
    // uninterpretable)
    val fmtAt = 12
    val corruptFmt = good.clone
    corruptFmt(fmtAt + 8) = 9 // audioFormat = 9 (not PCM)
    assert(bytes(corruptFmt) === Seq.empty)
  }

  test("PngCodec round-trips pngEncode: every width/filter/split/tEXt") {
    // n mod 6 covers every width 1..6, n >= 5 rows exercises all five
    // cycling filters, n mod 11 covers every IDAT split boundary, and
    // n mod 7 covers every ancillary tEXt length
    for (n <- 0 to 120) {
      val text = ("pack my box with five dozen liquor jugs " * 3).take(n)
      val w = (n % 6) + 1
      val raster = if (n == 0) 0 else w * ((n + w - 1) / w)
      val expected = text.padTo(raster, ' ').getBytes("US-ASCII").toSeq
      val got = Multimodal.PngCodec.decode(Multimodal.pngEncode(text)).toSeq
      assert(got === expected,
        s"round-trip failed at n=$n (w=$w, split=${(n % 11) + 1})")
    }
  }

  test("PngCodec malformed corners decode empty, never throw") {
    val text = "entropy coded raster payload rows!!" // 35 chars: w=6, 6 rows
    val good = Multimodal.pngEncode(text)
    def bytes(xs: Array[Byte]) = Multimodal.PngCodec.decode(xs).toSeq
    assert(bytes(good).nonEmpty)
    // local chunk splice kit: parse sig + (type, data) list, rebuild
    // with fresh CRCs — lets the semantic rejections be tested apart
    // from the CRC rejection
    def chunks(p: Array[Byte]): Seq[(String, Array[Byte])] = {
      var off = 8
      val out = Seq.newBuilder[(String, Array[Byte])]
      while (off < p.length) {
        val len = java.nio.ByteBuffer.wrap(p, off, 4).getInt
        out += ((new String(p, off + 4, 4, "US-ASCII"),
          java.util.Arrays.copyOfRange(p, off + 8, off + 8 + len)))
        off += 12 + len
      }
      out.result()
    }
    def build(cs: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte), 0, 8)
      cs.foreach { case (id, data) =>
        val b = java.nio.ByteBuffer.allocate(12 + data.length)
        b.putInt(data.length).put(id.getBytes("US-ASCII")).put(data)
        val crc = new java.util.zip.CRC32
        crc.update(b.array(), 4, 4 + data.length)
        b.putInt(crc.getValue.toInt)
        out.write(b.array(), 0, b.capacity())
      }
      out.toByteArray
    }
    val cs = chunks(good)
    assert(cs.count(_._1 == "IDAT") === 2, "fixture should split IDAT")
    assert(bytes(build(cs)) === bytes(good), "splice kit is faithful")
    // corrupted signature (the pngMediaTable malformed subset)
    assert(bytes(Multimodal.pngEncode(text, malformed = true)) === Seq.empty)
    // not a PNG at all / too short / empty
    assert(bytes("plainly not a png container".getBytes("US-ASCII"))
      === Seq.empty)
    assert(bytes(Array[Byte](0x89.toByte, 'P', 'N')) === Seq.empty)
    assert(bytes(Array.emptyByteArray) === Seq.empty)
    // a single flipped bit in IDAT data: CRC must catch it (WAV/BMP
    // have no integrity field — this is the new contract under test)
    val idatAt = good.indexOfSlice("IDAT".getBytes("US-ASCII"))
    val flip = good.clone; flip(idatAt + 6) = (flip(idatAt + 6) ^ 1).toByte
    assert(bytes(flip) === Seq.empty, "corrupt IDAT must fail CRC")
    // CRC is validated on ancillary chunks too
    val textAt = good.indexOfSlice("tEXt".getBytes("US-ASCII"))
    val flip2 = good.clone
    flip2(textAt + 4) = (flip2(textAt + 4) ^ 1).toByte
    assert(bytes(flip2) === Seq.empty, "corrupt tEXt must fail CRC")
    // unsupported geometry/format, each with a VALID re-computed CRC
    def mutIhdr(f: Array[Byte] => Unit): Array[Byte] =
      build(cs.map { case ("IHDR", d) =>
        val c = d.clone; f(c); ("IHDR", c)
      case other => other })
    assert(bytes(mutIhdr(d => d(8) = 16)) === Seq.empty) // bit depth
    assert(bytes(mutIhdr(d => d(9) = 2)) === Seq.empty) // RGB color type
    assert(bytes(mutIhdr(d => d(12) = 1)) === Seq.empty) // Adam7
    assert(bytes(mutIhdr(d => { d(0) = 0; d(1) = 0; d(2) = 0; d(3) = 0 }))
      === Seq.empty) // width 0
    // CRC-valid w=1, h=2^30: w*h passes the pixel bound but the raw
    // stream is h*(1+w) = 2^31 — Int overflow at the allocation if the
    // header walk does not guard the RAW product (contract: empty,
    // never a throw, and no multi-GB allocation attempt)
    assert(bytes(mutIhdr(d => { d(0) = 0; d(1) = 0; d(2) = 0; d(3) = 1
      d(4) = 0x40; d(5) = 0; d(6) = 0; d(7) = 0 })) === Seq.empty)
    // declared height +1: the zlib stream inflates SHORT of h*(1+w) —
    // only the inflate seam can catch this, no header arithmetic does
    assert(bytes(mutIhdr(d => d(7) = (d(7) + 1).toByte)) === Seq.empty)
    // truncation: no salvage anywhere (a cut DEFLATE stream has no
    // trustworthy prefix)
    assert(bytes(java.util.Arrays.copyOf(good, good.length - 13))
      === Seq.empty)
    // missing IEND (truncate exactly the final chunk): empty
    assert(bytes(java.util.Arrays.copyOf(good, good.length - 12))
      === Seq.empty)
    // IHDR not first / duplicate / interleaved IDAT: all structural
    assert(bytes(build(cs.filter(_._1 != "IHDR"))) === Seq.empty)
    val Seq(ihdr, tx, id1, id2, iend) = cs
    assert(bytes(build(Seq(tx, ihdr, id1, id2, iend))) === Seq.empty,
      "IHDR must be the first chunk")
    assert(bytes(build(Seq(ihdr, id1, tx, id2, iend))) === Seq.empty,
      "IDAT chunks must be consecutive")
    assert(bytes(build(Seq(ihdr, tx, iend))) === Seq.empty,
      "no IDAT at all")
    // unknown filter type: craft a 2x1 image whose scanline is
    // filter 5 — structurally perfect, semantically invalid
    val badRaw = Array[Byte](5, 'a', 'b')
    val df = new java.util.zip.Deflater()
    df.setInput(badRaw); df.finish()
    val zb = new Array[Byte](64)
    val zn = df.deflate(zb); df.end()
    val ihdr21 = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(1).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    assert(bytes(build(Seq(("IHDR", ihdr21),
      ("IDAT", java.util.Arrays.copyOf(zb, zn)),
      ("IEND", Array.emptyByteArray)))) === Seq.empty)
  }

  test("dHash: gradient bits, geometry gate, corrupted exclusion") {
    // hand-computable 2x2 raster: row samples map 9 grid cols onto
    // x in {0,1}; bit set iff right sample brighter than left
    val r = Array[Byte](10, 20, 30, 5) // rows: [10 20], [30 5]
    val Some((c0, c1, c2, c3)) = Multimodal.dHashChunks(2, 2, r)
    // w=2: x0 = i*2/9, x1 = (i+1)*2/9 -> (x0,x1) differs only at i=3,8
    // (0,0),(0,0),(0,0),(0,1)... i=3: x0=0,x1=0? 4*2/9=0 -> recompute:
    // i*2/9 for i=0..8 = 0,0,0,0,0,1,1,1,1 -> adjacent pairs differ at
    // i=4 (x0=0,x1=1). Rows 0-3 sample y=0 ([10,20]: 20>10 -> bit),
    // rows 4-7 sample y=1 ([30,5]: 5>30 -> no bit).
    val expectRowBits = Integer.parseInt("00010000", 2) // bit i=4 of 8
    def rowBits(chunk: Int, hi: Boolean): Int =
      (chunk >> (if (hi) 8 else 0)) & 0xff
    // bit index j*8+i, chunk = idx/16: rows 0..1 -> c0, rows 2..3 -> c1
    assert(rowBits(c0, hi = false) === expectRowBits, "row 0")
    assert(rowBits(c0, hi = true) === expectRowBits, "row 1")
    assert(rowBits(c1, hi = false) === expectRowBits, "row 2")
    assert(rowBits(c1, hi = true) === expectRowBits, "row 3")
    assert(c2 === 0 && c3 === 0, "rows 4..7 sample the darker row")
    // identical rasters -> identical hash; a brightness SHIFT too
    // (the perceptual property: gradients, not absolute values)
    val shifted = r.map(b => (b + 40).toByte)
    assert(Multimodal.dHashChunks(2, 2, shifted) === Some((c0, c1, c2, c3)))
    // degenerate geometry and length mismatch are rejected
    assert(Multimodal.dHashChunks(1, 4, r) === None, "w < 2")
    assert(Multimodal.dHashChunks(2, 2, r.take(3)) === None, "bad length")
    assert(Multimodal.dHashChunks(0, 0, Array.emptyByteArray) === None)
  }

  test("media_near_dup: pairs match a scalar recomputation at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hs = docs.flatMap { case (id, text) =>
      if (id % 17 == 3) None // corrupted payload: empty decode
      else {
        val s = text.replaceAll("[^ -~]", "")
        if (s.isEmpty) None
        else {
          val w = (s.length % 6) + 1
          val h = (s.length + w - 1) / w
          val r = s.padTo(w * h, ' ').getBytes("US-ASCII")
          Multimodal.dHashChunks(w, h, r).map(c => id -> c)
        }
      }
    }
    val want = (for {
      (a, ca) <- hs; (b, cb) <- hs if a < b
      d = Integer.bitCount(ca._1 ^ cb._1) + Integer.bitCount(ca._2 ^ cb._2) +
        Integer.bitCount(ca._3 ^ cb._3) + Integer.bitCount(ca._4 ^ cb._4)
      if d <= 3
    } yield (a, b, d)).sortBy(p => (p._1, p._2)).toSeq
    val got = Multimodal.mediaNearDup(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture corpus should contain near-dup rasters")
    // the excluded classes really are absent
    val ids = got.flatMap(p => Seq(p._1, p._2)).toSet
    assert(ids.forall(_ % 17 != 3), "corrupted docs must not appear")
  }

  test("audioHashChunks: envelope delta bits, gain invariance, " +
      "length gate") {
    // 130 samples -> 65 spans of exactly 2; span k energy =
    // s(2k)+s(2k+1). Build a stream whose span energies strictly
    // alternate up/down: bits = 1,0,1,0,...
    val alt = Array.tabulate[Byte](130)(i =>
      if ((i / 2) % 2 == 0) 10 else 90)
    val Some((c0, c1, c2, c3)) = Multimodal.audioHashChunks(alt)
    // bit k set iff e(k+1) > e(k): spans alternate 20,180,20,... so
    // bits at even k are set, odd k clear -> each 16-bit chunk 0x5555
    assert(Seq(c0, c1, c2, c3) === Seq(0x5555, 0x5555, 0x5555, 0x5555))
    // uniform GAIN shift preserves the fingerprint (the perceptual
    // property: energy gradients, not absolute loudness)
    val louder = alt.map(b => (b + 30).toByte)
    assert(Multimodal.audioHashChunks(louder) === Some((c0, c1, c2, c3)))
    // a genuinely different envelope hashes differently
    val ramp = Array.tabulate[Byte](130)(i => (i / 2).toByte)
    assert(Multimodal.audioHashChunks(ramp) !== Some((c0, c1, c2, c3)))
    // sub-65-sample clips are rejected: fewer samples than spans
    assert(Multimodal.audioHashChunks(new Array[Byte](64)) === None)
    assert(Multimodal.audioHashChunks(Array.emptyByteArray) === None)
    // 65 samples is the boundary: exactly one sample per span
    assert(Multimodal.audioHashChunks(new Array[Byte](65)).isDefined)
  }

  test("audio_near_dup: pairs match a scalar recomputation at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hs = docs.flatMap { case (id, text) =>
      if (id % 11 == 7) None // corrupted payload: empty decode
      else Multimodal.audioHashChunks(
        text.replaceAll("[^ -~]", "").getBytes("US-ASCII")).map(id -> _)
    }
    val want = (for {
      (a, ca) <- hs; (b, cb) <- hs if a < b
      d = Integer.bitCount(ca._1 ^ cb._1) + Integer.bitCount(ca._2 ^ cb._2) +
        Integer.bitCount(ca._3 ^ cb._3) + Integer.bitCount(ca._4 ^ cb._4)
      if d <= 3
    } yield (a, b, d)).sortBy(p => (p._1, p._2)).toSeq
    val got = Multimodal.audioNearDup(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture corpus should contain near-dup clips")
    val ids = got.flatMap(p => Seq(p._1, p._2)).toSet
    assert(ids.forall(_ % 11 != 7), "corrupted docs must not appear")
  }

  test("media_png query: decoded columns match the padded closed form") {
    val out = Multimodal.mediaPng(spark, sf("sf0.001")).collect()
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), regexp_replace(col("text"), "[^ -~]", "")
        .as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val s = if (id % 17 == 3) "" else docs(id)
      val w = (s.length % 6) + 1
      val raster = if (s.isEmpty) 0 else w * ((s.length + w - 1) / w)
      assert(r.getLong(2) === raster.toLong,
        s"doc $id: n_bytes != space-padded raster size")
      if (raster == 0) {
        assert(r.getDouble(3) === 0.0)
        assert(r.getInt(4) === 0)
        assert(r.getString(5) === "00" * 16)
      }
    }
    // the corrupted subset actually exists at this SF
    assert(out.exists(r => r.getLong(0) % 17 == 3 && r.getLong(2) == 0L))
  }

  test("GifCodec round-trips gifEncode: every width/interlace/split/" +
      "comment-length, through the LZW width-widening point") {
    // n mod 7 covers every width 1..7, n mod 2 covers interlaced and
    // sequential row order, n mod 11 covers every first-sub-block
    // boundary, n mod 5 covers every comment length — and n up to 320
    // drives the LZW dictionary past 256 entries, so the 8->9-bit
    // code-width widening is exercised on the long tail
    for (n <- (0 to 120) ++ Seq(200, 256, 300, 320)) {
      val text = ("how vexingly quick daft zebras jump " * 9).take(n)
      val w = (n % 7) + 1
      val raster = if (n == 0) 0 else w * ((n + w - 1) / w)
      val expected = text.padTo(raster, ' ').getBytes("US-ASCII").toSeq
      val got = Multimodal.GifCodec.decode(Multimodal.gifEncode(text)).toSeq
      assert(got === expected,
        s"round-trip failed at n=$n (w=$w, interlaced=${n % 2 == 0})")
    }
  }

  test("GifCodec malformed corners decode empty, never throw") {
    val text = "lempel ziv welch codes grow wider" // n=33: w=6, interlaced=false
    val good = Multimodal.gifEncode(text)
    def bytes(xs: Array[Byte]) = Multimodal.GifCodec.decode(xs).toSeq
    assert(bytes(good).nonEmpty)
    // corrupted signature (the gifMediaTable malformed subset)
    assert(bytes(Multimodal.gifEncode(text, malformed = true)) === Seq.empty)
    // not a GIF at all / too short / empty
    assert(bytes("plainly not an image".getBytes("US-ASCII")) === Seq.empty)
    assert(bytes(Array[Byte]('G', 'I', 'F')) === Seq.empty)
    assert(bytes(Array.emptyByteArray) === Seq.empty)
    // truncations at every grain: no salvage anywhere (a cut LZW
    // stream loses dictionary context)
    assert(bytes(java.util.Arrays.copyOf(good, good.length - 1))
      === Seq.empty, "missing trailer must decode empty")
    assert(bytes(java.util.Arrays.copyOf(good, good.length - 2))
      === Seq.empty, "missing block terminator must decode empty")
    assert(bytes(java.util.Arrays.copyOf(good, good.length - 8))
      === Seq.empty, "cut sub-block chain must decode empty")
    assert(bytes(java.util.Arrays.copyOf(good, 20)) === Seq.empty)
    // geometry mismatch: image descriptor vs logical screen. Its
    // offset is structural (searching for 0x2c would hit the
    // grayscale palette's (44,44,44) entry): header+LSD 13 + global
    // table 768 + comment block 2+1+len+1 with len = (n % 5) + 1
    val imgAt = 13 + 768 + 2 + 1 + ((text.length % 5) + 1) + 1
    assert((good(imgAt) & 0xff) === 0x2c, "fixture: descriptor offset")
    val mutW = good.clone
    mutW(imgAt + 5) = (mutW(imgAt + 5) + 1).toByte
    assert(bytes(mutW) === Seq.empty,
      "descriptor/screen size mismatch must decode empty")
    // zero-size logical screen
    val mutZ = good.clone; mutZ(6) = 0; mutZ(7) = 0
    assert(bytes(mutZ) === Seq.empty)
    // declared geometry far SMALLER than the stream's expansion (the
    // LZW-bomb shape): the decode must bail empty as soon as output
    // passes w*h, not buffer the whole stream first — here the LZW
    // stream expands to 36 bytes against a declared 1x1 screen
    val mutB = good.clone
    mutB(6) = 1; mutB(7) = 0; mutB(8) = 1; mutB(9) = 0 // screen 1x1
    mutB(imgAt + 5) = 1; mutB(imgAt + 6) = 0 // descriptor w = 1
    mutB(imgAt + 7) = 1; mutB(imgAt + 8) = 0 // descriptor h = 1
    assert(bytes(mutB) === Seq.empty,
      "over-expanding LZW stream must decode empty")
    // LZW min code size out of the 2..8 palette range
    val mcsAt = imgAt + 10
    val mutM = good.clone; mutM(mcsAt) = 12
    assert(bytes(mutM) === Seq.empty)
    // a bit-flip INSIDE the LZW stream either desynchronizes into an
    // out-of-range code (empty) or decodes to a different raster —
    // it must never throw, and never return the original bytes
    val zAt = mcsAt + 2 // first sub-block's first data byte
    val flip = good.clone; flip(zAt) = (flip(zAt) ^ 0x10).toByte
    val flipped = bytes(flip)
    assert(flipped.isEmpty || flipped != bytes(good),
      "corrupt LZW data must not decode to the original raster")
    // the comment extension is genuinely skipped: its bytes never
    // appear in the decoded raster (raster is printable + spaces; the
    // comment is 'c's inside an 0x21-framed block the walk jumps)
    assert(bytes(good) === text.padTo(36, ' ').getBytes("US-ASCII").toSeq)
  }

  test("media_gif query: decoded columns match the padded closed form") {
    val out = Multimodal.mediaGif(spark, sf("sf0.001")).collect()
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), regexp_replace(col("text"), "[^ -~]", "")
        .as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val s = if (id % 19 == 7) "" else docs(id)
      val w = (s.length % 7) + 1
      val raster = if (s.isEmpty) 0 else w * ((s.length + w - 1) / w)
      assert(r.getLong(2) === raster.toLong,
        s"doc $id: n_bytes != space-padded raster size")
      if (raster == 0) {
        assert(r.getDouble(3) === 0.0)
        assert(r.getInt(4) === 0)
        assert(r.getString(5) === "00" * 16)
      }
    }
    assert(out.exists(r => r.getLong(0) % 19 == 7 && r.getLong(2) == 0L))
  }

  test("media_wav query: decoded columns match the text-derived closed form") {
    val out = Multimodal.mediaWav(spark, sf("sf0.001")).collect()
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), regexp_replace(col("text"), "[^ -~]", "")
        .as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val expect =
        if (id % 11 == 7) "" else docs(id)
      assert(r.getLong(2) === expect.length.toLong,
        s"doc $id: n_bytes != printable length")
      if (expect.isEmpty) {
        assert(r.getDouble(3) === 0.0)
        assert(r.getInt(4) === 0)
        assert(r.getString(5) === "00" * 16)
      }
    }
    // the malformed subset actually exists at this SF
    assert(out.exists(r => r.getLong(0) % 11 == 7 && r.getLong(2) == 0L))
  }

  test("media_bmp query: decoded columns match the padded closed form") {
    val out = Multimodal.mediaBmp(spark, sf("sf0.001")).collect()
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), regexp_replace(col("text"), "[^ -~]", "")
        .as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val s = if (id % 13 == 5) "" else docs(id)
      val w = (s.length % 5) + 1
      val raster = if (s.isEmpty) 0 else w * ((s.length + w - 1) / w)
      assert(r.getLong(2) === raster.toLong,
        s"doc $id: n_bytes != space-padded raster size")
      if (raster == 0) {
        assert(r.getDouble(3) === 0.0)
        assert(r.getInt(4) === 0)
        assert(r.getString(5) === "00" * 16)
      }
    }
    // the corrupted subset actually exists at this SF
    assert(out.exists(r => r.getLong(0) % 13 == 5 && r.getLong(2) == 0L))
  }
}
