package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with a batch-shaped decode stage.
  *
  * The real-world shape this models: a 100 TB corpus where each row
  * carries an image/audio/video blob and a metadata struct, and decode /
  * feature-extraction runs as a partition-local batch loop (the Scala
  * analogue of `mapInPandas`: iterate the partition in fixed-size
  * batches so a vectorized decoder amortizes per-batch setup). The
  * actual media decoding is STUBBED — `decodeStub` below is a
  * deterministic fake (this container has no image/audio libs); the
  * schema, Dataset encoders, batch shape, and partition-parallelism are
  * real and tested. Swap `decodeStub` for a JNI/FFI decoder without
  * touching anything else.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, bytes: Array[Byte],
      format: String, width: Int, height: Int)

  /** Output of the (stubbed) decode/feature stage. */
  final case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Long,
      checksum16: Long, thumb_w: Int, thumb_h: Int)

  /** How many records one decode batch holds — the knob a vectorized
    * decoder would care about (batch too small: per-call overhead;
    * too large: decoder memory).
    */
  val DecodeBatchSize = 64

  private val Formats = Seq("png", "jpeg", "webp", "mp4")

  /** Derive a deterministic media table from the documents corpus: the
    * text bytes stand in for the blob; format/width/height are arithmetic
    * on n_chars so the DuckDB oracle can reproduce them exactly.
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        element_at(typedlit(Formats), (pmod(col("n_chars"), lit(4)) + 1).cast("int"))
          .as("format"),
        (lit(64) + pmod(col("n_chars"), lit(512))).cast("int").as("width"),
        (lit(64) + pmod(col("n_chars") * 7, lit(512))).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake standing in for a real media
    * decode: "checksum" = sum of the first 16 payload bytes, "thumbnail"
    * = metadata dims / 8. Replace with the real library call; the batch
    * loop and signature stay.
    */
  private def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { m =>
      val checksum = m.bytes.iterator.take(16).map(b => (b & 0xff).toLong).sum
      MediaFeatures(m.media_id, m.format, m.bytes.length.toLong,
        checksum, m.width / 8, m.height / 8)
    }

  /** Partition-local batched decode: the Scala `mapInPandas`. Each task
    * walks its partition in DecodeBatchSize chunks; no shuffle, no
    * driver involvement, scales linearly with partitions.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeStub(batch))
    }
  }

  /** One sampled "frame" of a media payload. */
  final case class MediaFrame(
      media_id: Long, frame_id: Int, n_bytes: Long, checksum: Long)

  /** STUB frame sampler — the video-path analogue of decodeStub: split
    * the payload into nFrames equal byte windows ("frames") and emit a
    * per-frame stat. A real implementation would seek keyframes and
    * decode; the windowing, fan-out shape (rows × frames), and batch
    * loop are what's real here.
    */
  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.flatMap { m =>
        val len = m.bytes.length
        (0 until nFrames).map { f =>
          // long arithmetic: f * len overflows Int for GB-scale payloads
          val lo = (f.toLong * len / nFrames).toInt
          val hi = ((f + 1).toLong * len / nFrames).toInt
          val window = m.bytes.slice(lo, hi)
          MediaFrame(m.media_id, f, window.length.toLong,
            window.iterator.map(b => (b & 0xff).toLong).sum)
        }
      })
    }
  }
}
