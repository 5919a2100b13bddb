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

  test("media stats are real byte stats") {
    val r = Multimodal.mediaStats(spark, sf("sf0.001"))
      .filter(col("doc_id") === 0).collect().head
    assert(r.getString(3).matches("[0-9a-f]{64}"))
    assert(r.getLong(2) > 0)
  }
}
