package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** REAL audio codec binding — JDK-bundled `javax.sound.sampled` (WAV/AIFF/AU
  * PCM containers), no external libraries. Like [[ImageCodec]], pure
  * byte-in/value-out helpers for the `mapPartitions` batch shape in
  * [[Media]]; compressed formats (mp3/ogg) have no JDK decoder and keep the
  * deterministic stub fallback. */
object AudioCodec {

  /** Decoded PCM: mono-mixed float samples in [-1, 1]. */
  case class Pcm(sampleRate: Int, channels: Int, samples: Array[Float]) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else samples.length * 1000L / sampleRate
  }

  /** Decode a WAV/AIFF/AU container to mono float PCM; None for bytes no
    * JDK reader accepts (callers fall back to the stub or drop the row).
    * Supports the 8/16-bit integer PCM encodings WAV files actually use. */
  def decode(bytes: Array[Byte]): Option[Pcm] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if (!ok || (bits != 8 && bits != 16)) None
        else {
          val raw = ais.readAllBytes()
          val ch = fmt.getChannels
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * ch
          val nFrames = raw.length / frameBytes
          val mono = new Array[Float](nFrames)
          val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
          val big = fmt.isBigEndian
          var f = 0
          while (f < nFrames) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val o = f * frameBytes + c * bytesPerSample
              val v =
                if (bits == 8) {
                  val b = raw(o)
                  if (signed) b.toFloat / 128f else ((b & 0xff) - 128).toFloat / 128f
                } else {
                  val (lo, hi) = if (big) (raw(o + 1), raw(o)) else (raw(o), raw(o + 1))
                  val s = ((hi << 8) | (lo & 0xff)).toShort
                  (if (signed) s.toFloat
                   else (((s & 0xffff) - 32768).toFloat)) / 32768f
                }
              acc += v
              c += 1
            }
            mono(f) = acc / ch
            f += 1
          }
          Some(Pcm(fmt.getSampleRate.toInt, ch, mono))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** 64-bit perceptual audio hash — the audio analog of
    * [[ImageCodec.aHash]]: bit b set iff band b's RMS embedding exceeds the
    * mean over all bands. Near-identical audio (same energy envelope)
    * lands within small hamming distance. */
  def aHash(pcm: Pcm, bands: Int = 64): Long = {
    val e = embedding(pcm, bands)
    var mean = 0.0
    var i = 0
    while (i < e.length) { mean += e(i); i += 1 }
    mean /= e.length
    var h = 0L
    i = 0
    while (i < e.length && i < 64) { if (e(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** `bands`-dim embedding: per-band RMS energy over equal time slices,
    * mapped to [-1, 1] (2·rms − 1; rms of full-scale PCM is ≤ 1). The audio
    * analog of [[ImageCodec.embedding]]'s grid luminance — deterministic,
    * so near-dup detection over it is reproducible. */
  def embedding(pcm: Pcm, bands: Int): Array[Float] = {
    val out = new Array[Float](bands)
    val n = pcm.samples.length
    var b = 0
    while (b < bands) {
      val s0 = (n.toLong * b / bands).toInt
      val s1 = math.max((n.toLong * (b + 1) / bands).toInt, s0 + 1).min(n)
      var sum = 0.0; var cnt = 0
      var i = s0
      while (i < s1 && i < n) { sum += pcm.samples(i) * pcm.samples(i); cnt += 1; i += 1 }
      out(b) = if (cnt == 0) -1.0f
        else (2.0 * math.sqrt(sum / cnt) - 1.0).toFloat
      b += 1
    }
    out
  }
}
