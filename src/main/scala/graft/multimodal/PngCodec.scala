package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image synthesis + decode on the JDK's own codec
  * (`javax.imageio` — no external libs). The pixel pattern is pure
  * arithmetic on (doc id, x, y), so a verifier can compute the
  * expected pixel sum INDEPENDENTLY of the codec and assert the
  * decode round-trip recovered every pixel — the property that proves
  * real bytes flowed through a real decoder rather than an arithmetic
  * echo.
  *
  * This is the image half of the multimodal boundary: PNG is the one
  * format the JDK encodes AND decodes losslessly; JPEG goes through
  * the same [[decode]] with a measured lossy tolerance ([[JpegCodec]]
  * — its oracle is a per-pixel error band, not equality); since r12
  * MJPEG video frames ride it too ([[AviCodec]]). The byte-path
  * fallback in [[Multimodal.decodeFeatures]] remains for CORRUPT or
  * unknown media (exactly the fallback a production pipeline runs).
  * Swap [[decode]] for a JNI/FFI decoder to widen the real set.
  */
object PngCodec {

  /** Gray value of pixel (x, y) for document `id` — independent
    * arithmetic, the spec's oracle. All terms nonnegative.
    */
  def pixel(id: Long, x: Int, y: Int): Int =
    ((x * 31L + y * 17L + id * 13L) % 256L).toInt

  /** Expected pixel sum of a synthesized w×h image — computable
    * without touching the codec.
    */
  def patternSum(id: Long, w: Int, h: Int): Long = {
    var acc = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { acc += pixel(id, x, y); x += 1 }
      y += 1
    }
    acc
  }

  /** A real PNG: the deterministic gray pattern encoded through
    * ImageIO. Byte length depends on the JDK's zlib settings — stable
    * within a JVM, not promised across JDK majors (why the consumers
    * are rows-only rather than SQL-oracled).
    */
  def synthesize(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = pixel(id, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a row-major gray plane as a real PNG (the thumbnail
    * re-encode path).
    */
  def encodeGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = px(y * w + x) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Textured gray value for perceptual-hash tests: unlike [[pixel]]
    * (one global gradient phase-shifted by id — every doc LOOKS the
    * same to a frequency-domain hash), this pattern draws per-id
    * spatial frequencies, so different ids are structurally different
    * images. Range 0..199, leaving headroom for a uniform brightness
    * shift (the planted near-dup perturbation) with NO clamping — a
    * clamp would leak the shift into AC coefficients.
    */
  def texturePixel(id: Long, x: Int, y: Int): Int = {
    // ids 0..63 map BIJECTIVELY onto the (px, py) period grid, so no
    // two base ids share a texture; the (x+y) diagonal term adds
    // cross-frequency energy (a separable x-term + y-term pattern
    // leaves most 2-D DCT coefficients exactly zero, which would put
    // the pHash median inside float noise)
    // periods 8..29 px: the top-left 8×8 DCT block of a 32×32 resample
    // sees periods ≥ 8 px — shorter periods alias away and the hash
    // could not tell two textures apart
    val px = 8 + (id % 8L).toInt * 3
    val py = 8 + ((id / 8L) % 8L).toInt * 3
    val pz = 9 + ((id * 5L) % 6L).toInt * 2
    ((x % px) * 6 + (y % py) * 6 + ((x + y) % pz) * 5) % 200
  }

  /** A real PNG of the textured pattern, uniformly brightened by
    * `bright` (≤ 55 keeps every pixel < 256 — shift stays in the DC
    * coefficient only).
    */
  def synthesizeTextured(id: Long, w: Int, h: Int, bright: Int): Array[Byte] = {
    require(bright >= 0 && bright <= 55, s"bright $bright would clamp")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = texturePixel(id, x, y) + bright
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Full gray-plane decode: (width, height, row-major blue-channel
    * values). None if the bytes are not a decodable image.
    */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      (w, h, px)
    }

  /** Decode any ImageIO-readable payload: (width, height, pixel sum of
    * the blue channel — the gray value for synthesized frames). None
    * if the bytes are not a decodable image.
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var acc = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { acc += img.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      (w, h, acc)
    }
}
