package graft.multimodal

/** Perceptual image hash (pHash): 64-bit DCT signature of an image's
  * low-frequency structure — the image-dedup primitive (Zauner,
  * "Implementation and Benchmarking of Perceptual Image Hash
  * Functions", 2010; same construction as the public imagehash
  * library's `phash`). Two images that LOOK the same — re-encoded,
  * resized, uniformly brightened — hash within a few bits; structurally
  * different images land ~32 bits apart (random-hash regime).
  *
  * Pipeline: box-resample the gray plane to 32×32 → unnormalized
  * separable 2-D DCT-II → keep the top-left 8×8 coefficient block (the
  * lowest spatial frequencies) → threshold each against the MEDIAN of
  * the 64 → pack 64 bits. Median thresholding is what buys the
  * robustness: a uniform brightness change moves only the DC term, so
  * at most the DC bit and the median boundary flip.
  *
  * Scale: a pure per-row function (no shuffle, no state) producing an
  * 8-byte signature per image; pair mining over the signatures is the
  * SimHash block-LSH equi-join — the whole image-dedup path for 10⁹
  * images is one map pass plus one (block_id, block_val) join.
  */
object PHash {

  private val N = 32
  private val B = 8

  /** cos((2x+1)·u·π/(2N)) lookup, x major. */
  private val Cos: Array[Array[Double]] = Array.tabulate(N, N) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
  }

  /** 64-bit pHash of a row-major gray image. */
  def hash(gray: Array[Int], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && gray.length >= w * h, s"bad geometry ${w}x$h")
    // box-resample to N×N: average the source rectangle of each target
    // cell (floor bounds, at least one pixel — upsampling repeats)
    val small = new Array[Double](N * N)
    var ty = 0
    while (ty < N) {
      val y0 = ty * h / N
      val y1 = math.max((ty + 1) * h / N, y0 + 1)
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N
        val x1 = math.max((tx + 1) * w / N, x0 + 1)
        var acc = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { acc += gray(y * w + x); x += 1 }
          y += 1
        }
        small(ty * N + tx) = acc.toDouble / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    // separable DCT-II, unnormalized (uniform scale per coefficient,
    // so the median threshold is well-defined): rows then columns,
    // only the first B output frequencies of each pass are needed
    val rows = new Array[Double](N * B) // [y][u]
    var y = 0
    while (y < N) {
      var u = 0
      while (u < B) {
        var acc = 0.0
        var x = 0
        while (x < N) { acc += small(y * N + x) * Cos(x)(u); x += 1 }
        rows(y * B + u) = acc
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](B * B) // [v][u]
    var v = 0
    while (v < B) {
      var u = 0
      while (u < B) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += rows(yy * B + u) * Cos(yy)(v); yy += 1 }
        block(v * B + u) = acc
        u += 1
      }
      v += 1
    }
    // quantize to integers before ranking: coefficients that are
    // mathematically zero (flat or separable image content) come out
    // of the float DCT as ±1e-12 noise, and a median computed among
    // them makes the low bits flip under any perturbation — rint puts
    // every such value at exactly 0 and ties resolve identically
    // everywhere (the CharEntropy quantize-before-compare move)
    val q = new Array[Double](64)
    var i = 0
    while (i < 64) { q(i) = math.rint(block(i)); i += 1 }
    val sorted = q.clone().sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    i = 0
    while (i < 64) {
      if (q(i) > median) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** pHash of an encoded image payload; None if undecodable. */
  def ofBytes(bytes: Array[Byte]): Option[Long] =
    PngCodec.decodeGray(bytes).map { case (w, h, px) => hash(px, w, h) }
}
