package graft.multimodal

import java.io.ByteArrayOutputStream

/** REAL video container on JDK-only codecs: MJPEG-in-AVI — the one
  * VIDEO container this toolchain can both write and read without
  * native decoders, closing the last multimodal byte fallback (mp4
  * needs an H.26x/AV1 bitstream decoder the JDK will never ship; an
  * MJPEG stream is just a JPEG per frame, and `javax.imageio` decodes
  * JPEG natively). The container layout follows the public AVI RIFF
  * specification (Microsoft "AVI RIFF File Reference": RIFF('AVI '
  * LIST('hdrl' 'avih' LIST('strl' 'strh' 'strf')) LIST('movi'
  * '00dc'...)), all sizes little-endian, chunks padded to even) — the
  * same container every MJPEG webcam/capture pipeline emits, so the
  * parser is exercising a real wire format, not a private invention.
  *
  * Oracle design matches [[GifCodec]]: each frame's pixel pattern is
  * [[GifCodec.pixel]] — pure arithmetic on (id, frame, x, y),
  * verifiable without any codec — and each frame is a quality-1.0
  * JPEG ([[JpegCodec.synthesizeGray]]), so per-frame sums hold within
  * JPEG's measured tolerance band ([[JpegCodec.MeanAbsPixelTolerance]])
  * instead of GIF's palette-exact equality.
  *
  * Reference anchor: the reference treats media as opaque streamed
  * bytes (hadoop-multiple-streaming MultiPipeMapper.java:118-137 moves
  * lines, never decodes payloads); the real-container path is the
  * Spark-native widening a multimodal training pipeline needs.
  */
object AviCodec {

  /** Deterministic frame count for a media id — shared with the GIF
    * fixture (2–5 frames).
    */
  def frameCount(id: Long): Int = GifCodec.frameCount(id)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def chunk(fcc: String, body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc(fcc)); bos.write(le32(body.length)); bos.write(body)
    if ((body.length & 1) == 1) bos.write(0) // RIFF chunks pad to even
    bos.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc("LIST")); bos.write(le32(body.length + 4))
    bos.write(fourcc(listType)); bos.write(body)
    bos.toByteArray
  }

  /** A real MJPEG AVI: `frames` quality-1.0 JPEG frames of the
    * deterministic [[GifCodec.pixel]] pattern inside a spec-shaped
    * RIFF container (avih + vids/MJPG strh/strf headers, '00dc' frame
    * chunks under 'movi').
    */
  def synthesize(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(frames > 0, s"an MJPEG AVI needs >= 1 frame, got $frames")
    val jpegs = (0 until frames).map { f =>
      JpegCodec.synthesizeGray(w, h, (x, y) => GifCodec.pixel(id, f, x, y))
    }
    val maxBuf = jpegs.iterator.map(_.length).max
    val avih = new ByteArrayOutputStream()
    avih.write(le32(100000)) // dwMicroSecPerFrame: 10 fps
    avih.write(le32(0)); avih.write(le32(0)) // maxBytesPerSec, padding
    avih.write(le32(0)) // dwFlags (no idx1 written)
    avih.write(le32(frames)); avih.write(le32(0)) // totalFrames, initial
    avih.write(le32(1)) // dwStreams
    avih.write(le32(maxBuf)) // suggestedBufferSize
    avih.write(le32(w)); avih.write(le32(h))
    (0 until 4).foreach(_ => avih.write(le32(0))) // dwReserved
    val strh = new ByteArrayOutputStream()
    strh.write(fourcc("vids")); strh.write(fourcc("MJPG"))
    strh.write(le32(0)) // dwFlags
    strh.write(le16(0)); strh.write(le16(0)) // priority, language
    strh.write(le32(0)) // initialFrames
    strh.write(le32(1)); strh.write(le32(10)) // scale/rate = 10 fps
    strh.write(le32(0)); strh.write(le32(frames)) // start, length
    strh.write(le32(maxBuf)); strh.write(le32(-1)) // bufSize, quality
    strh.write(le32(0)) // sampleSize
    strh.write(le16(0)); strh.write(le16(0)) // rcFrame left, top
    strh.write(le16(w)); strh.write(le16(h)) // rcFrame right, bottom
    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    strf.write(le32(40)); strf.write(le32(w)); strf.write(le32(h))
    strf.write(le16(1)); strf.write(le16(24)) // planes, bitCount
    strf.write(fourcc("MJPG")) // biCompression
    strf.write(le32(w * h * 3)) // biSizeImage
    (0 until 4).foreach(_ => strf.write(le32(0))) // ppm + clr fields
    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val movi = list("movi",
      jpegs.iterator.map(j => chunk("00dc", j))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  private def readLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def isFcc(b: Array[Byte], p: Int, s: String): Boolean =
    p + 4 <= b.length && (0 until 4).forall(i => b(p + i) == s.charAt(i).toByte)

  /** Decode every '00dc' MJPEG frame: Some(per-frame (width, height,
    * pixelSum)) if the payload is a well-formed MJPEG AVI whose every
    * frame ImageIO decodes, None otherwise (the caller's degrade-
    * gracefully fallback — same contract as [[GifCodec.decodeFrames]]).
    * The walk is the standard RIFF scan: top-level chunks until the
    * 'movi' LIST, then its sub-chunks; sizes little-endian, odd sizes
    * padded.
    */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[(Int, Int, Long)]] =
    try {
      if (bytes.length < 12 || !isFcc(bytes, 0, "RIFF") ||
        !isFcc(bytes, 8, "AVI ")) return None
      val end = math.min(bytes.length.toLong, 8L + readLe32(bytes, 4)).toInt
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
      var p = 12
      while (p + 8 <= end) {
        val size = readLe32(bytes, p + 4)
        if (size < 0 || p + 8 + size > end) return None
        if (isFcc(bytes, p, "LIST") && size >= 4 &&
          isFcc(bytes, p + 8, "movi")) {
          var q = p + 12
          val listEnd = p + 8 + size
          while (q + 8 <= listEnd) {
            val fsize = readLe32(bytes, q + 4)
            if (fsize < 0 || q + 8 + fsize > listEnd) return None
            if (isFcc(bytes, q, "00dc")) {
              val jpeg = java.util.Arrays.copyOfRange(bytes, q + 8,
                q + 8 + fsize)
              PngCodec.decode(jpeg) match {
                case Some(f) => frames += f
                case None => return None // a torn frame poisons the clip
              }
            }
            q += 8 + fsize + (fsize & 1)
          }
        }
        p += 8 + size + (size & 1)
      }
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
}
