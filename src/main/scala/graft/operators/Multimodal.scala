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
      frameStep: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      val c = codec // per-partition init boundary
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
}
