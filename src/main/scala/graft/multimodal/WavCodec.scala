package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** REAL audio synthesis + decode on the JDK's own codec
  * (`javax.sound.sampled` parses RIFF/WAVE natively — no external
  * libs). The sample pattern is pure arithmetic on (doc id, sample
  * index), so a verifier can compute the expected amplitude sum
  * INDEPENDENTLY of the codec and assert the decode round-trip
  * recovered every sample — the same proves-real-bytes property
  * [[PngCodec]] gives the image path. This closes the audio half of
  * the multimodal boundary; since r12 every fixture format decodes
  * for real ([[AviCodec]] closed the last byte fallback — the byte
  * path now serves corrupt/unknown media only).
  */
object WavCodec {

  /** Signed 16-bit sample i for document `id` — independent
    * arithmetic, the spec's oracle.
    */
  def sample(id: Long, i: Int): Int =
    (((id * 13L + i * 31L) % 65536L).toInt) - 32768

  /** Expected Σ|sample| of a synthesized n-sample clip — computable
    * without touching the codec.
    */
  def amplitudeSum(id: Long, n: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < n) { acc += math.abs(sample(id, i).toLong); i += 1 }
    acc
  }

  /** A real WAV: the deterministic sample pattern as canonical 44-byte
    * PCM16 mono little-endian RIFF/WAVE. Byte length is exactly
    * 44 + 2n (PCM is uncompressed — unlike PNG there is no
    * encoder-settings dependence).
    */
  def synthesize(id: Long, nSamples: Int, rate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { out.putShort(sample(id, i).toShort); i += 1 }
    out.array()
  }

  /** Decode any javax.sound-readable payload: (nSamples, sampleRate,
    * Σ|sample|). None if the bytes are not decodable PCM16 audio.
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    decodeSamples(bytes).map { case (rate, s) =>
      var acc = 0L
      var i = 0
      while (i < s.length) { acc += math.abs(s(i).toLong); i += 1 }
      (s.length, rate, acc)
    }

  /** Full PCM decode: (sampleRate, signed samples) for any
    * javax.sound-readable mono PCM16 payload — the raw material for
    * frame-level analysis ([[Multimodal.audioFeatures]]). None if the
    * bytes are not decodable PCM16 audio.
    */
  def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      // rate <= 0 guards a corrupt header that parses but would divide
      // downstream duration arithmetic by zero — corrupt media takes
      // the byte-path fallback, never a task crash
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getSampleRate <= 0) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        if (fmt.isBigEndian) {
          while (i < n) {
            out(i) = ((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)).toShort.toInt
            i += 1
          }
        } else {
          while (i < n) {
            out(i) = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case _: Exception => None }
}
