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
  * batches so a vectorized decoder amortizes per-batch setup).
  *
  * The image AND audio paths are REAL: `png` rows carry genuine PNG
  * payloads decoded by the JDK's `javax.imageio`
  * ([[PngCodec]]), `jpeg` rows carry genuine quality-1.0 JPEGs
  * ([[JpegCodec]] — lossy, so its specs pin a measured per-pixel
  * tolerance instead of equality), and `wav` rows carry genuine PCM16
  * RIFF/WAVE payloads decoded by `javax.sound.sampled` ([[WavCodec]])
  * — each synthesized deterministically per doc so the specs verify
  * the round-trip against codec-independent pattern arithmetic, `gif`
  * rows carry genuine ANIMATED GIFs ([[GifCodec]]) whose temporal axis
  * the frame sampler really decodes, and `avi` rows carry genuine
  * MJPEG-in-AVI clips ([[AviCodec]] — the public RIFF container with a
  * quality-1.0 JPEG per frame, the one VIDEO container the JDK can
  * both write and read). Every fixture format now decodes for real;
  * the byte-path FALLBACK in `decodeBatch` remains the degrade-
  * gracefully branch for corrupt or unknown media (spec-pinned with a
  * corrupt blob; mp4 itself stays out of scope by decision — its
  * H.26x/AV1 bitstreams need native decoders the JDK will never ship,
  * and MJPEG/AVI already exercises the real temporal-container path).
  * Swap the codec calls for JNI/FFI decoders to widen the real set
  * without touching the schema, batching, or parallelism.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, bytes: Array[Byte],
      format: String, width: Int, height: Int)

  /** Output of the decode/feature stage. For decoded images the
    * checksum is the full pixel sum and the thumb dims derive from the
    * DECODED geometry; for fallback rows the checksum is the
    * first-16-bytes sum and the dims come from metadata.
    */
  final case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Long,
      checksum: Long, thumb_w: Int, thumb_h: Int, decoded: Boolean)

  /** How many records one decode batch holds — the knob a vectorized
    * decoder would care about (batch too small: per-call overhead;
    * too large: decoder memory).
    */
  val DecodeBatchSize = 64

  private val Formats = Seq("png", "jpeg", "wav", "gif", "avi")

  /** Sample rate of synthesized wav rows (8 kHz — telephony PCM). */
  val WavRate = 8000

  /** Derive a deterministic media table from the documents corpus.
    * Formats rotate on n_chars; `png` rows carry a REAL PNG payload
    * (deterministic pixel pattern keyed by media_id, dims 16–47 px
    * from n_chars arithmetic — thumbnail-scale so synthesis is a map
    * pass, encoded executor-side in the same batch loop the decoder
    * uses), `jpeg` rows a REAL quality-1.0 JPEG of the same pattern
    * (thumbnail-plus scale, dims 32–127 px — the decode path is what the fixture proves, not megapixel throughput), and `wav`
    * rows carry a REAL PCM16 WAV payload (deterministic sample
    * pattern, 256–767 samples at [[WavRate]]), and `avi` rows a REAL
    * MJPEG-in-AVI clip (2–5 quality-1.0 JPEG frames of the GifCodec
    * pattern, dims 24–63 px — video pays per FRAME, so the slot is
    * sized like the gif slot, not the single-image jpeg slot).
    * Metadata semantics per modality: images state (width, height);
    * audio overloads the same typed slots as (n_samples, sample_rate)
    * — the schema stays one struct, the format column disambiguates.
    */
  def mediaTable(docs: DataFrame,
      formats: Seq[String] = Formats): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m5 = pmod(col("n_chars"), lit(5))
    // scan-parallelism floor (graft.util.Fanout doc): synthesis is the
    // expensive half of the fixture and decodeFeatures' mapPartitions
    // inherits THIS partitioning — a single-row-group input otherwise
    // serializes every codec on one core; no-op at scale
    graft.util.Fanout.ensure(docs).select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        element_at(typedlit(Formats), (m5 + 1).cast("int")).as("format"),
        when(m5 === 0, lit(16) + pmod(col("n_chars"), lit(32)))
          .when(m5 === 1, lit(32) + pmod(col("n_chars"), lit(96)))
          .when(m5 === 2, lit(256) + pmod(col("n_chars") * 3, lit(512)))
          .when(m5 === 3, lit(16) + pmod(col("n_chars"), lit(24)))
          .otherwise(lit(24) + pmod(col("n_chars"), lit(40)))
          .cast("int").as("width"),
        when(m5 === 0, lit(16) + pmod(col("n_chars") * 7, lit(32)))
          .when(m5 === 1, lit(32) + pmod(col("n_chars") * 7, lit(96)))
          .when(m5 === 2, lit(WavRate))
          .when(m5 === 3, lit(12) + pmod(col("n_chars") * 7, lit(24)))
          .otherwise(lit(24) + pmod(col("n_chars") * 7, lit(40)))
          .cast("int").as("height"))
      // the format prune happens BEFORE the synthesis map: now that
      // png/jpeg/wav/gif payloads are all real, synthesis is the
      // expensive half of this fixture, and a consumer that only reads
      // one modality (mm_audio/mm_vad/mm_frames) must not pay for
      // encoding the others — the fixture analogue of partition
      // pruning reaching the scan
      .filter(col("format").isInCollection(formats))
      .as[MediaRecord]
      // plain per-record map: synthesis has no batch-level work to
      // amortize, so no .grouped buffering (that shape belongs to
      // decodeFeatures, where a vectorized decoder earns the batch)
      .mapPartitions(_.map { m =>
        m.format match {
          case "png" =>
            m.copy(bytes = PngCodec.synthesize(m.media_id, m.width, m.height))
          case "jpeg" =>
            m.copy(bytes = JpegCodec.synthesize(m.media_id, m.width, m.height))
          case "wav" =>
            m.copy(bytes = WavCodec.synthesize(m.media_id, m.width, m.height))
          case "gif" =>
            m.copy(bytes = GifCodec.synthesize(m.media_id, m.width, m.height,
              GifCodec.frameCount(m.media_id)))
          case "avi" =>
            m.copy(bytes = AviCodec.synthesize(m.media_id, m.width, m.height,
              AviCodec.frameCount(m.media_id)))
          case _ => m
        }
      })
  }

  /** One decode batch: REAL ImageIO decode for png rows (checksum =
    * decoded pixel sum, thumb = decoded dims ∕ 8), REAL javax.sound
    * decode for wav rows (checksum = Σ|sample|, thumb slots = (kHz,
    * clip ms) — the audio reading of the thumbnail fields), byte-path
    * fallback otherwise — checksum = sum of the first 16 payload
    * bytes, thumb = metadata dims ∕ 8 (the degrade-gracefully branch
    * for undecodable media; `decoded` records which branch ran).
    */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { m =>
      val real = m.format match {
        // ImageIO decodes BOTH: png losslessly, jpeg within the
        // quality-1.0 tolerance JpegCodec pins — either way the
        // checksum is the real decoded pixel sum, not a byte echo
        case "png" | "jpeg" =>
          PngCodec.decode(m.bytes).map { case (w, h, pixelSum) =>
            MediaFeatures(m.media_id, m.format, m.bytes.length.toLong,
              pixelSum, w / 8, h / 8, decoded = true)
          }
        case "wav" =>
          WavCodec.decode(m.bytes).map { case (n, rate, ampSum) =>
            MediaFeatures(m.media_id, m.format, m.bytes.length.toLong,
              ampSum, rate / 1000, (n.toLong * 1000 / rate).toInt,
              decoded = true)
          }
        case "gif" =>
          GifCodec.decodeFrames(m.bytes).map { frames =>
            MediaFeatures(m.media_id, m.format, m.bytes.length.toLong,
              frames.iterator.map(_._3).sum,
              frames.head._1 / 8, frames.head._2 / 8, decoded = true)
          }
        case "avi" =>
          AviCodec.decodeFrames(m.bytes).map { frames =>
            MediaFeatures(m.media_id, m.format, m.bytes.length.toLong,
              frames.iterator.map(_._3).sum,
              frames.head._1 / 8, frames.head._2 / 8, decoded = true)
          }
        case _ => None
      }
      real.getOrElse {
        val checksum = m.bytes.iterator.take(16).map(b => (b & 0xff).toLong).sum
        MediaFeatures(m.media_id, m.format, m.bytes.length.toLong,
          checksum, m.width / 8, m.height / 8, decoded = false)
      }
    }

  /** Partition-local batched decode: the Scala `mapInPandas`. Each task
    * walks its partition in DecodeBatchSize chunks; no shuffle, no
    * driver involvement, scales linearly with partitions.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeBatch(batch))
    }
  }

  /** Frame-level audio features of one clip — the speech-pipeline
    * preprocessing shape (VAD / segmentation gates on exactly these):
    * per 20 ms frame energy Σs² and clip-level zero crossings, all
    * INTEGER arithmetic so results are partition- and order-exact.
    * `rms_q` is the integer-quantized clip RMS ⌊√(Σs²∕n)⌋ (Σs² ≤
    * n·2³⁰ keeps every intermediate well inside Long, and Σs²∕n
    * < 2⁵³ makes the Long→Double conversion exact, so the one sqrt
    * is reproducible bit-for-bit).
    */
  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, n_samples: Int, n_frames: Int,
      zc_total: Long, energy_max: Long, energy_min: Long, rms_q: Long)

  /** Analysis frame: 160 samples = 20 ms at [[WavRate]] (the standard
    * telephony VAD hop).
    */
  val AudioFrameSamples = 160

  /** REAL per-frame audio analysis over the wav rows: decode the PCM
    * executor-side ([[WavCodec.decodeSamples]]) and reduce each clip to
    * frame energies + zero crossings in one pass. Map-only — no
    * shuffle, no driver involvement; scales linearly with partitions
    * exactly like [[decodeFeatures]]. Frames are the COMPLETE
    * 160-sample windows (a trailing partial frame contributes to
    * zc_total and rms_q, which are clip-level, but not to the
    * per-frame energy extrema). Undecodable wav payloads are dropped
    * here rather than given fallback features: frame energies of bytes
    * that never were samples are not degraded data, they are noise.
    */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("format") === "wav").mapPartitions(_.flatMap { m =>
      WavCodec.decodeSamples(m.bytes).map { case (rate, s) =>
        val n = s.length
        var zc = 0L
        var sumSq = 0L
        var i = 0
        while (i < n) {
          if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) zc += 1
          sumSq += s(i).toLong * s(i)
          i += 1
        }
        val nFrames = n / AudioFrameSamples
        var eMax = 0L
        var eMin = Long.MaxValue
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var j = f * AudioFrameSamples
          val end = j + AudioFrameSamples
          while (j < end) { e += s(j).toLong * s(j); j += 1 }
          if (e > eMax) eMax = e
          if (e < eMin) eMin = e
          f += 1
        }
        if (nFrames == 0) { eMax = 0L; eMin = 0L }
        val rmsQ = if (n == 0) 0L else math.sqrt((sumSq / n).toDouble).toLong
        AudioFeatures(m.media_id, rate, n, nFrames, zc, eMax, eMin, rmsQ)
      }
    })
  }

  /** Per-clip voice-activity segmentation summary (see
    * [[audioSegments]]); `first_active` is −1 when no frame clears the
    * activity threshold.
    */
  final case class AudioSegments(media_id: Long, n_frames: Int,
      n_active: Int, n_segments: Int, longest_run: Int, first_active: Int)

  /** Voice-activity segmentation over the same 20 ms frame grid as
    * [[audioFeatures]] — the pass that turns raw audio into the speech
    * RUNS a transcription/diarization pipeline actually consumes: a
    * frame is ACTIVE iff its energy exceeds the clip's mean frame
    * energy, decided in pure integer arithmetic
    * (e·nFrames > Σe — no float threshold to drift), and segments are
    * the maximal active runs. Per clip: frame/active counts, segment
    * count, longest run, first active frame.
    *
    * Scale: map-only per clip like [[audioFeatures]] — energies,
    * threshold and run-walk all live inside one executor-side pass
    * over the decoded samples; nothing per-frame ever leaves the task.
    * Overflow headroom: e ≤ 160·32768² ≈ 1.7e11, so e·nFrames stays
    * under 2⁶³ to ~50 million frames per clip (~12 days of 16 kHz
    * audio) — a single clip past that should be chunked upstream
    * anyway.
    */
  def audioSegments(media: Dataset[MediaRecord]): Dataset[AudioSegments] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("format") === "wav").mapPartitions(_.flatMap { m =>
      WavCodec.decodeSamples(m.bytes).map { case (_, s) =>
        val nFrames = s.length / AudioFrameSamples
        val e = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0L
          var j = f * AudioFrameSamples
          val end = j + AudioFrameSamples
          while (j < end) { acc += s(j).toLong * s(j); j += 1 }
          e(f) = acc
          f += 1
        }
        val total = e.sum
        var nActive = 0; var nSeg = 0; var longest = 0; var run = 0
        var first = -1
        var i = 0
        while (i < nFrames) {
          if (e(i) * nFrames > total) {
            if (first < 0) first = i
            nActive += 1
            run += 1
            if (run == 1) nSeg += 1
            if (run > longest) longest = run
          } else run = 0
          i += 1
        }
        AudioSegments(m.media_id, nFrames, nActive, nSeg, longest, first)
      }
    })
  }

  /** One sampled frame of a media payload. For REAL decoded frames
    * (`decoded = true`) `n_units` is the frame's pixel count and
    * `checksum` its pixel sum; for byte-window fallback frames
    * `n_units` is the window's byte length and `checksum` the byte
    * sum.
    */
  final case class MediaFrame(
      media_id: Long, frame_id: Int, n_units: Long, checksum: Long,
      decoded: Boolean)

  /** Frame sampler. The TEMPORAL axis is REAL for `gif` AND `avi`
    * rows: the payload is a genuine multi-frame container and each
    * emitted row is one DECODED frame ([[GifCodec.decodeFrames]]
    * through the JDK's multi-frame ImageReader; [[AviCodec
    * .decodeFrames]] walking the RIFF 'movi' chunks and decoding each
    * MJPEG frame) — frame count comes from the container, per-frame
    * stats from decoded pixels. Undecodable blobs keep the byte-window
    * fallback: nFrames equal byte slices standing in for keyframe
    * seeks, preserving the fan-out shape (rows × frames) and the batch
    * loop. `decoded` records which branch each row took.
    */
  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.flatMap { m =>
        val real = m.format match {
          case "gif" =>
            GifCodec.decodeFrames(m.bytes).map(_.zipWithIndex.map {
              case ((w, h, pixelSum), f) =>
                MediaFrame(m.media_id, f, w.toLong * h, pixelSum,
                  decoded = true)
            })
          case "avi" =>
            AviCodec.decodeFrames(m.bytes).map(_.zipWithIndex.map {
              case ((w, h, pixelSum), f) =>
                MediaFrame(m.media_id, f, w.toLong * h, pixelSum,
                  decoded = true)
            })
          case _ => None
        }
        real.getOrElse {
          val len = m.bytes.length
          (0 until nFrames).map { f =>
            // long arithmetic: f * len overflows Int for GB-scale payloads
            val lo = (f.toLong * len / nFrames).toInt
            val hi = ((f + 1).toLong * len / nFrames).toInt
            val window = m.bytes.slice(lo, hi)
            MediaFrame(m.media_id, f, window.length.toLong,
              window.iterator.map(b => (b & 0xff).toLong).sum,
              decoded = false)
          }
        }
      })
    }
  }

  /** One thumbnail row: decoded source dims, the fixed-size thumb's
    * luma content, and the re-encoded payload size.
    */
  final case class Thumb(
      media_id: Long, src_w: Int, src_h: Int, thumb_w: Int, thumb_h: Int,
      luma_sum: Long, thumb_bytes: Long, decoded: Boolean)

  /** Vision-encoder preprocessing: REAL decode + resize of the image
    * rows to a fixed `target`×`target` input. The resize is integer
    * BOX AVERAGING, not Graphics2D filtering: thumb pixel (tx, ty) =
    * ⌊mean⌋ over its exact source box [tx·w∕tw, (tx+1)·w∕tw) ×
    * [ty·h∕th, (ty+1)·h∕th) — every intermediate is integer, so the
    * result is bit-reproducible across partitionings AND independently
    * replayable by the spec from the synthesis arithmetic (the same
    * spec-exactness contract mm_audio holds; a library scaler would
    * reduce the oracle to "some bytes came out"). The thumb re-encodes
    * as a real PNG (the bytes a downstream encoder would ingest);
    * non-image rows take the metadata fallback with `decoded = false`.
    * Map-only at any scale, same batch loop as decodeFeatures.
    */
  def thumbnails(media: Dataset[MediaRecord], target: Int = 8): Dataset[Thumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map { m =>
        val real =
          if (m.format == "png" || m.format == "gif" || m.format == "jpeg")
            PngCodec.decodeGray(m.bytes).map { case (w, h, px) =>
              val tw = math.min(target, w)
              val th = math.min(target, h)
              val thumb = new Array[Int](tw * th)
              var ty = 0
              while (ty < th) {
                var tx = 0
                while (tx < tw) {
                  val x0 = tx * w / tw; val x1 = (tx + 1) * w / tw
                  val y0 = ty * h / th; val y1 = (ty + 1) * h / th
                  var acc = 0L
                  var y = y0
                  while (y < h.min(y1.max(y0 + 1))) {
                    var x = x0
                    while (x < w.min(x1.max(x0 + 1))) {
                      acc += px(y * w + x); x += 1
                    }
                    y += 1
                  }
                  val cnt = (x1.max(x0 + 1) - x0).toLong *
                    (y1.max(y0 + 1) - y0)
                  thumb(ty * tw + tx) = (acc / cnt).toInt
                  tx += 1
                }
                ty += 1
              }
              val png = PngCodec.encodeGray(tw, th, thumb)
              Thumb(m.media_id, w, h, tw, th,
                thumb.iterator.map(_.toLong).sum, png.length.toLong,
                decoded = true)
            }
          else None
        real.getOrElse(Thumb(m.media_id, m.width, m.height, 0, 0, 0L, 0L,
          decoded = false))
      })
    }
  }
}
