package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM WAV (RIFF/PCM-16) audio codec — the audio twin of
  * [[Ppm]]: a real binary container (RIFF header, fmt chunk, data
  * chunk, little-endian 16-bit samples), so the multimodal decode
  * stage exercises genuine audio-codec work: chunk walking, format
  * validation, amplitude statistics, frame (window) extraction.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  final case class Features(
      sampleRate: Int, nSamples: Int, durationMs: Long,
      meanAbs: Double, peak: Int, zeroCrossings: Long)

  /** Encode PCM-16 mono as a RIFF/WAVE byte stream. */
  def encode(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * 2) // byte rate
      .putShort(2)              // block align
      .putShort(16)             // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a RIFF/WAVE byte stream (PCM-16 mono); throws
    * IllegalArgumentException on malformed containers. */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", "not a RIFF container")
    buf.getInt // riff size
    require(ascii(4) == "WAVE", "not a WAVE file")
    // walk chunks: fmt must precede data
    var sampleRate = -1
    while (buf.remaining() >= 8) {
      val id = ascii(4)
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          val bits = buf.getShort
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV format: fmt=$fmt channels=$ch bits=$bits")
          buf.position(buf.position() + (len - 16))
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(buf.remaining() >= len, s"truncated data chunk: need $len")
          val samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          return Audio(sampleRate, samples)
        case _ => // skip unknown chunk
          buf.position(buf.position() + len)
      }
    }
    throw new IllegalArgumentException("no data chunk found")
  }

  /** Amplitude statistics — the audio feature-extract stage. */
  def features(bytes: Array[Byte]): Features = {
    val a = decode(bytes)
    var sumAbs = 0L; var peak = 0; var zc = 0L
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      val abs = math.abs(s.toInt)
      sumAbs += abs
      if (abs > peak) peak = abs
      if (i > 0 && ((s >= 0) != (a.samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    val n = a.samples.length
    Features(a.sampleRate, n, n * 1000L / a.sampleRate,
      if (n == 0) 0.0 else sumAbs.toDouble / n, peak, zc)
  }

  /** Deterministic synthetic clip from a text seed (same LCG family as
    * Ppm.synth): 240–480 samples of pseudo-random PCM at 8 kHz. */
  def synth(text: String): Audio = {
    val seed = scala.util.hashing.MurmurHash3.stringHash(text)
    val n = 240 + (seed & 0xFF)
    var s = seed.toLong & 0xFFFFFFFFL
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      samples(i) = (s >>> 40).toShort
      i += 1
    }
    Audio(8000, samples)
  }
}
