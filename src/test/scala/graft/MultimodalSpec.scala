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
}
