package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** REAL JPEG synthesis on the JDK's own codec — the r7 GIF move applied
  * to the jpeg branch, so jpeg rows exercise a genuine encode → decode
  * round-trip instead of the byte-path fallback. Decoding rides
  * [[PngCodec.decode]] (ImageIO reads JPEG natively); [[AviCodec]]
  * reuses the same encode per MJPEG frame, so since r12 no fixture
  * format falls back (the byte path serves corrupt media only).
  *
  * The independent oracle is a TOLERANCE pin, not equality: JPEG is
  * lossy even at quality 1.0 (DCT coefficient quantization), so the
  * spec pins decoded dims EXACTLY and the decoded pixels within a
  * small per-pixel band of [[PngCodec.pixel]]. The band is tight and
  * principled: the image is GRAY (R = G = B), so the chroma planes are
  * constant and 4:2:0 subsampling carries zero signal loss — all error
  * is luma quantization, and at quality 1.0 the quantization tables
  * are near-unity (measured on the fixture geometry: max |err| = 1
  * per pixel, mean ≈ 0.07, even across the pattern's mod-256 wrap
  * edges).
  */
object JpegCodec {

  /** Max tolerated mean absolute per-pixel error of the quality-1.0
    * round-trip on the synthesized pattern (specs pin against this;
    * measured worst-case mean ≈ 0.07, max single-pixel error 1).
    */
  val MeanAbsPixelTolerance: Double = 0.5

  /** Max tolerated single-pixel absolute error (measured: 1). */
  val MaxAbsPixelTolerance: Int = 2

  /** A real JPEG of the deterministic gray pattern, encoded at
    * explicit quality 1.0. Byte length depends on the JDK's encoder
    * tables — stable within a JVM, not promised across JDK majors
    * (why the consumers are rows-only rather than SQL-oracled, same
    * as PNG).
    */
  def synthesize(id: Long, w: Int, h: Int): Array[Byte] =
    synthesizeGray(w, h, (x, y) => PngCodec.pixel(id, x, y))

  /** Quality-1.0 JPEG of an arbitrary gray pattern — the shared encode
    * under [[synthesize]] (single image, PngCodec pattern) and
    * [[AviCodec.synthesize]] (per-frame GifCodec pattern), so every
    * JPEG in the fixture carries the same measured tolerance band.
    */
  def synthesizeGray(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = gray(x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
