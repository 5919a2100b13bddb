package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages shaped the way a real image/audio pipeline runs on Spark.
  *
  * The actual codec is STUBBED (this environment has no image/audio
  * libraries): `Codec.decode` produces a deterministic fake raster from
  * the bytes. Everything around it is real and tested — the schema, the
  * per-partition batch iteration (one codec instance per partition, not
  * per row — the Scala analog of a batched Pandas UDF), the binary
  * statistics (size/hash/entropy are true byte computations), and the
  * frame sampling.
  *
  * Scale notes: binary payloads ride the normal columnar path (parquet
  * binary columns, no driver materialization). Feature extraction is a
  * narrow mapPartitions — no shuffle — and the expensive decode sits
  * AFTER any metadata filter so pushdown prunes undecoded rows.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      entropy: Double, histogram: Array[Double], frames_sampled: Int,
      preview: Array[Byte])

  /** STUB boundary: a real deployment swaps this for an actual codec
    * (libjpeg/ffmpeg/...). Deterministic fake: interprets bytes as a
    * square "raster". The pipeline treats the output as opaque decoded
    * media, so swapping implementations cannot change plan shape.
    */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): Array[Byte]
  }
  object StubCodec extends Codec {
    override def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** A NON-identity codec with a fully-specified format, so the batched
    * decode path is tested against a codec that actually transforms
    * bytes (the stub proves only plumbing): the payload is a sequence
    * of (runLength, value) byte pairs and decode expands each run —
    * the run-length-encoded "raster" is the simplest decode whose
    * output length, byte distribution, and sampled bytes all differ
    * from the payload's, which is exactly what the oracle needs to
    * re-derive independently (see SparkEntry's media_decode SQL: it
    * rebuilds the decoded stream from `documents.text` arithmetic, so
    * a codec that mis-expanded a run mismatches on every column).
    * A trailing odd byte is ill-formed and ignored, like a truncated
    * media file's last packet.
    */
  object RleCodec extends Codec {
    override def decode(payload: Array[Byte]): Array[Byte] = {
      val out = new scala.collection.mutable.ArrayBuilder.ofByte
      var i = 0
      while (i + 1 < payload.length) {
        val rl = payload(i) & 0xff
        val v = payload(i + 1)
        var j = 0
        while (j < rl) { out += v; j += 1 }
        i += 2
      }
      out.result()
    }
  }

  /** RLE-encode a printable-ASCII string: char at 0-based index i
    * becomes the pair (((i+1) % 5) + 1, byte) — run lengths cycle
    * through 1..5 by position, so the decoded stream is a genuine
    * position-dependent expansion (~3x on average, never uniformly
    * 1:1) yet every decoded quantity stays a closed-form function of
    * (position, char) that SQL replays.
    */
  def rleEncode(s: String): Array[Byte] = {
    val out = new Array[Byte](2 * s.length)
    var i = 0
    while (i < s.length) {
      out(2 * i) = ((((i + 1) % 5) + 1)).toByte
      out(2 * i + 1) = s.charAt(i).toByte
      i += 1
    }
    out
  }

  /** A REAL container format through the same codec seam: canonical
    * RIFF/WAVE PCM. [[RleCodec]] proved the decode stage transforms
    * bytes; this proves it against a genuine variable-length container
    * — magic validation, little-endian sizes, a chunk WALK (the
    * encoder plants a variable-length JUNK chunk before `data`, so a
    * fixed-44-byte-offset shortcut reads garbage), word alignment
    * (odd-sized chunks pad to even, pad excluded from the declared
    * size), and malformed-input handling. Contract on bad input: an
    * empty decode (zero-length media), never a throw — a pipeline
    * drops undecodable records, it does not die mid-job. Truncated
    * `data` is salvaged up to the available bytes (a cut-off download
    * still yields its leading samples — the RleCodec trailing-byte
    * precedent); every other malformation (bad magic, no WAVE tag,
    * `data` before a valid PCM `fmt `, chunk sizes past the declared
    * RIFF extent, missing `data`) decodes empty. [[graft
    * .MultimodalSpec]] pins each corner.
    */
  object WavCodec extends Codec {
    override def decode(p: Array[Byte]): Array[Byte] = {
      def u32(i: Long): Long =
        (p(i.toInt) & 0xffL) | (p(i.toInt + 1) & 0xffL) << 8 |
          (p(i.toInt + 2) & 0xffL) << 16 | (p(i.toInt + 3) & 0xffL) << 24
      def u16(i: Long): Int =
        (p(i.toInt) & 0xff) | (p(i.toInt + 1) & 0xff) << 8
      def tag(i: Long): String =
        new String(p, i.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return Array.emptyByteArray
      // the walk is bounded by BOTH the declared RIFF extent and the
      // physical buffer — whichever is shorter
      val end = math.min(p.length.toLong, 8L + u32(4))
      var off = 12L
      var pcm = false
      while (off + 8 <= end) {
        val id = tag(off)
        val sz = u32(off + 4)
        val body = off + 8
        if (id == "fmt " && sz >= 16 && body + 16 <= end)
          pcm = u16(body) == 1 // PCM; bit depth/channels ride the header
        else if (id == "data") {
          if (!pcm) return Array.emptyByteArray
          // a data size running past the DECLARED RIFF extent is the
          // container lying about itself — decode empty (salvage is
          // only for PHYSICAL truncation, where the declared layout is
          // consistent but the tail bytes are missing); bounding by
          // p.length alone would salvage bytes outside the container
          if (body + sz > 8L + u32(4)) return Array.emptyByteArray
          val n = math.max(0L, math.min(sz, p.length - body)).toInt
          return java.util.Arrays.copyOfRange(p, body.toInt, body.toInt + n)
        }
        off = body + sz + (sz % 2) // chunks are word-aligned
      }
      Array.emptyByteArray // no data chunk inside the declared extent
    }
  }

  /** Synthesize a canonical PCM WAV holding `s`'s bytes as 8-bit mono
    * samples, with a variable-length JUNK filler chunk ((len(s) % 7)
    * + 1 bytes — odd half the time, exercising the pad rule) between
    * `fmt ` and `data`. `malformed` corrupts the RIFF magic — the
    * "not actually a wav" record a crawl inevitably contains.
    */
  def wavEncode(s: String, malformed: Boolean = false): Array[Byte] = {
    val samples = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val junkLen = (s.length % 7) + 1
    val junkPad = junkLen % 2
    val dataPad = samples.length % 2
    val total = 12 + (8 + 16) + (8 + junkLen + junkPad) +
      (8 + samples.length + dataPad)
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put((if (malformed) "RIFX" else "RIFF").getBytes("US-ASCII"))
    b.putInt(total - 8).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1) // PCM, mono
    b.putInt(8000).putInt(8000) // sample rate, byte rate (8-bit mono)
    b.putShort(1).putShort(8) // block align, bits/sample
    b.put("JUNK".getBytes("US-ASCII")).putInt(junkLen)
    (0 until junkLen + junkPad).foreach(_ => b.put(0x55.toByte))
    b.put("data".getBytes("US-ASCII")).putInt(samples.length).put(samples)
    if (dataPad == 1) b.put(0.toByte)
    b.array()
  }

  /** Synthetic WAV media table: each document's printable-ASCII
    * projection as PCM samples inside a real RIFF container; every
    * 11th-ish doc (doc_id % 11 == 7) is corrupted — the oracle
    * predicts those rows decode empty.
    */
  def wavMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val enc = udf((s: String, bad: Boolean) => wavEncode(s, bad))
    Tables.documents(spark, dir)
      .select(col("doc_id"), lit("audio").as("kind"),
        enc(regexp_replace(col("text"), "[^ -~]", ""),
          col("doc_id") % 11 === 7).as("payload"))
  }

  /** Registry entry: the feature battery over [[WavCodec]] — the
    * oracle rebuilds every column from `documents.text` (the samples
    * ARE the printable projection; the container is opaque to SQL), so
    * only a correct chunk walk past the variable JUNK chunk — and a
    * correct empty decode on the corrupted subset — matches.
    */
  def mediaWav(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = wavMediaTable(spark, dir).as[MediaRecord]
    extractFeatures(ds, WavCodec)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        col("entropy"), col("frames_sampled"),
        hex(col("preview")).as("preview_hex"))
      .orderBy(col("doc_id"))
  }

  /** A SECOND real container family through the same codec seam: BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, 8-bit palette, BI_RGB).
    * WAV proved a chunk WALK; BMP proves the other header-walk
    * pathologies a raster container has — offset INDIRECTION (pixel
    * data lives wherever the declared `bfOffBits` says, past a palette
    * and a variable-length gap, so a fixed-offset shortcut reads the
    * palette), 4-byte row-stride padding, and row ORDER (positive
    * height = bottom-up, the BMP default, vs negative = top-down) —
    * the decoder reassembles LOGICAL row order either way.
    *
    * Contract on bad input: empty decode, never a throw (the WavCodec
    * contract). Unlike WAV there is NO truncation salvage: bottom-up
    * row order puts the logically-first samples physically LAST, so a
    * cut-off download has no meaningful leading prefix — a raster that
    * does not fit inside both the declared `bfSize` extent and the
    * physical buffer decodes empty. [[graft.MultimodalSpec]] pins each
    * corner.
    */
  object BmpCodec extends Codec {
    override def decode(p: Array[Byte]): Array[Byte] = {
      def u32(i: Long): Long =
        (p(i.toInt) & 0xffL) | (p(i.toInt + 1) & 0xffL) << 8 |
          (p(i.toInt + 2) & 0xffL) << 16 | (p(i.toInt + 3) & 0xffL) << 24
      def u16(i: Long): Int =
        (p(i.toInt) & 0xff) | (p(i.toInt + 1) & 0xff) << 8
      if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte)
        return Array.emptyByteArray
      // reads are bounded by BOTH the declared file extent and the
      // physical buffer — whichever is shorter (the WAV lesson: a
      // container lying about itself must not expose bytes outside it)
      val declared = math.min(p.length.toLong, u32(2))
      if (declared < 54) return Array.emptyByteArray
      val off = u32(10)
      val biSize = u32(14)
      if (biSize < 40 || 14 + biSize > declared) return Array.emptyByteArray
      val w = u32(18).toInt // i32: width must be positive
      val hRaw = u32(22).toInt // i32: sign selects row order
      val planes = u16(26)
      val bpp = u16(28)
      val comp = u32(30)
      if (w <= 0 || hRaw == 0 || planes != 1 || bpp != 8 || comp != 0)
        return Array.emptyByteArray
      val h = math.abs(hRaw.toLong)
      val stride = (w + 3L) / 4L * 4L
      if (off < 14 + biSize || off + h * stride > declared)
        return Array.emptyByteArray
      val raster = w * h
      if (raster > Int.MaxValue) return Array.emptyByteArray
      val out = new Array[Byte](raster.toInt)
      var r = 0L
      while (r < h) {
        val phys = if (hRaw > 0) h - 1 - r else r // bottom-up vs top-down
        System.arraycopy(p, (off + phys * stride).toInt,
          out, (r * w).toInt, w)
        r += 1
      }
      out
    }
  }

  /** Synthesize a canonical 8-bit-palette BMP holding `s`'s bytes as
    * pixels. Width cycles 1..5 by length (so the 4-byte stride pad is
    * exercised at every remainder), the final row's tail pads with
    * spaces (the decoded stream is `rpad(s, w*ceil(len/w), ' ')` — a
    * closed form the oracle replays), row order alternates bottom-up /
    * top-down by length parity, and a variable-length gap sits between
    * the palette and the pixel data so only a decoder honoring
    * `bfOffBits` finds the raster. `malformed` corrupts the magic.
    */
  def bmpEncode(s: String, malformed: Boolean = false): Array[Byte] = {
    val px = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val w = (px.length % 5) + 1
    val h = (px.length + w - 1) / w
    val stride = (w + 3) / 4 * 4
    val topDown = px.length % 2 == 0
    val gap = px.length % 7
    val off = 14 + 40 + 256 * 4 + gap
    val total = off + h * stride
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put((if (malformed) "BX" else "BM").getBytes("US-ASCII"))
    b.putInt(total) // bfSize
    b.putInt(0) // reserved
    b.putInt(off) // bfOffBits — the indirection under test
    b.putInt(40) // biSize (BITMAPINFOHEADER)
    b.putInt(w)
    b.putInt(if (topDown) -h else h)
    b.putShort(1) // planes
    b.putShort(8) // bits per pixel
    b.putInt(0) // BI_RGB
    b.putInt(h * stride) // biSizeImage
    b.putInt(2835).putInt(2835) // 72 dpi
    b.putInt(256).putInt(0) // clrUsed, clrImportant
    (0 until 256).foreach { i => // grayscale BGRA palette
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
    }
    (0 until gap).foreach(_ => b.put(0x5a.toByte))
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    rows.foreach { r =>
      val row = new Array[Byte](stride)
      var i = 0
      while (i < w) {
        val idx = r * w + i
        row(i) = if (idx < px.length) px(idx) else ' '.toByte
        i += 1
      }
      b.put(row)
    }
    b.array()
  }

  /** Synthetic BMP media table: each document's printable-ASCII
    * projection as 8-bit pixels inside a real BMP container; every
    * 13th-ish doc (doc_id % 13 == 5) is corrupted — the oracle
    * predicts those rows decode empty.
    */
  def bmpMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val enc = udf((s: String, bad: Boolean) => bmpEncode(s, bad))
    Tables.documents(spark, dir)
      .select(col("doc_id"), lit("image").as("kind"),
        enc(regexp_replace(col("text"), "[^ -~]", ""),
          col("doc_id") % 13 === 5).as("payload"))
  }

  /** Registry entry: the feature battery over [[BmpCodec]] — the
    * oracle rebuilds every column from `documents.text` (the decoded
    * raster is the space-padded printable projection, a closed form),
    * so only a decoder that honors bfOffBits, reassembles bottom-up
    * AND top-down rows, and strips the stride padding matches — and
    * the corrupted subset must decode empty.
    */
  def mediaBmp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = bmpMediaTable(spark, dir).as[MediaRecord]
    extractFeatures(ds, BmpCodec)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        col("entropy"), col("frames_sampled"),
        hex(col("preview")).as("preview_hex"))
      .orderBy(col("doc_id"))
  }

  /** Synthetic media table: deterministic binary payloads derived from
    * document text (stand-in for real image/audio bytes), with typed
    * metadata columns a real pipeline would carry.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Binary statistics — exact byte computations, no stub involved. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha_hex"))
      .orderBy(col("doc_id"))

  /** Deterministic "resize": stride-sample the decoded payload down to
    * exactly `n` bytes (zero-padded for short inputs) — the fixed-shape
    * output contract a raster resize has, computed on real bytes.
    */
  def resizeTo(decoded: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    if (decoded.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = decoded((i.toLong * decoded.length / n).toInt)
        i += 1
      }
    }
    out
  }

  /** Decode + featurize, batched per partition: one codec per partition
    * (expensive init amortized, the reason real pipelines batch), then a
    * 16-bin byte histogram + Shannon entropy per record, and every
    * `frameStep`-th byte "frame-sampled".
    */
  def extractFeatures(media: Dataset[MediaRecord], codec: Codec,
      frameStep: Int = 64): Dataset[MediaFeatures] =
    extractFeatures(media, () => codec, frameStep)

  /** Factory form — the real-deployment shape: a codec context
    * (libjpeg/ffmpeg handle) is CONSTRUCTED once per partition on the
    * executor, not serialized from the driver; MultimodalSpec counts
    * constructions to prove the batching claim.
    */
  def extractFeatures(media: Dataset[MediaRecord],
      codecFactory: () => Codec, frameStep: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      val c = codecFactory() // per-partition init boundary
      records.map { r =>
        val decoded = c.decode(r.payload)
        val counts = new Array[Long](16)
        decoded.foreach(b => counts((b & 0xff) >> 4) += 1)
        val n = decoded.length.toDouble
        val hist = counts.map(x => if (n > 0) x / n else 0.0)
        val entropy = -hist.filter(_ > 0).map(p => p * math.log(p)).sum /
          math.log(2)
        val frames = decoded.indices.count(_ % frameStep == 0)
        MediaFeatures(r.doc_id, r.kind, decoded.length.toLong,
          BigDecimal(entropy).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          hist, frames, resizeTo(decoded, 16))
      }
    }
  }

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaTable(spark, dir).as[MediaRecord]
    extractFeatures(ds, StubCodec)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        col("entropy"), col("frames_sampled"),
        hex(col("preview")).as("preview_hex"))
      .orderBy(col("doc_id"))
  }

  /** Synthetic RLE media table: the printable-ASCII projection of each
    * document, [[rleEncode]]d — so the payload is NOT the decoded
    * stream and only a correct run expansion reproduces the oracle's
    * independently-derived decoded statistics.
    */
  def rleMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val enc = udf((s: String) => rleEncode(s))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        enc(regexp_replace(col("text"), "[^ -~]", "")).as("payload"))
  }

  /** Registry entry: the full feature battery over a codec that
    * genuinely transforms bytes ([[RleCodec]]) — n_bytes, histogram
    * entropy, frame count, and stride preview are all properties of
    * the DECODED stream, ~3x the payload, which the oracle rebuilds
    * from `documents.text` without ever seeing the payload.
    */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = rleMediaTable(spark, dir).as[MediaRecord]
    extractFeatures(ds, RleCodec)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        col("entropy"), col("frames_sampled"),
        hex(col("preview")).as("preview_hex"))
      .orderBy(col("doc_id"))
  }
}
