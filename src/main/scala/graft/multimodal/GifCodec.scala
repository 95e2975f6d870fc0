package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL multi-frame media on the JDK's own codec: animated GIF is the
  * one container `javax.imageio` both writes and reads with a genuine
  * TEMPORAL axis (`ImageReader.getNumImages` / `read(i)`), so the
  * frame-sampling path can decode actual frames instead of slicing
  * byte windows. Same oracle design as [[PngCodec]]/[[WavCodec]]: the
  * per-frame pixel pattern is pure arithmetic on (id, frame, x, y),
  * verifiable without the codec, and an exact 256-gray palette makes
  * the GIF round-trip lossless (palette index == gray value).
  */
object GifCodec {

  /** Gray value of pixel (x, y) in frame `f` of document `id` —
    * independent arithmetic, the spec's oracle.
    */
  def pixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((x * 31L + y * 17L + f * 11L + id * 13L) % 256L).toInt

  /** Expected pixel sum of one synthesized frame — computable without
    * touching the codec.
    */
  def framePatternSum(id: Long, f: Int, w: Int, h: Int): Long = {
    var acc = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { acc += pixel(id, f, x, y); x += 1 }
      y += 1
    }
    acc
  }

  /** Deterministic frame count for a media id (2–5). */
  def frameCount(id: Long): Int = (2 + (id % 4)).toInt

  private val grayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** A real animated GIF: `frames` full frames of the deterministic
    * gray pattern written through ImageIO's sequence writer. The
    * explicit 256-gray palette keeps the encode exact (GIF is
    * palette-lossless; it is the MULTI-FRAME analogue of PNG's
    * lossless single image).
    */
  def synthesize(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(w, h,
          BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, pixel(id, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode every frame: Some(per-frame (width, height, pixelSum)) if
    * the payload is a readable GIF, None otherwise (triggering the
    * caller's byte-path fallback). Pixel value read through getRGB's
    * red channel — with the gray-ramp palette red == gray == the
    * pattern value, independent of how the reader types the decoded
    * image.
    */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[(Int, Int, Long)]] = {
    val in = new MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(in)
    if (!readers.hasNext) { in.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(in, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) None
      else Some((0 until n).map { f =>
        val img = reader.read(f)
        var acc = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            acc += (img.getRGB(x, y) >> 16) & 0xff
            x += 1
          }
          y += 1
        }
        (img.getWidth, img.getHeight, acc)
      })
    } catch { case scala.util.control.NonFatal(_) => None }
    finally {
      reader.dispose()
      in.close()
    }
  }
}
