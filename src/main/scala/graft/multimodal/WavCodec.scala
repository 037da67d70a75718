package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/WAVE PCM codec — the real audio decode path for the
  * multimodal column operators (replaces the round-1 byte-stats stub;
  * no native dependency needed for PCM). Chunk-walking decoder: reads
  * `fmt ` and `data`, skips unknown chunks (LIST/INFO etc.), requires
  * 16-bit integer PCM (format 1) — the storage format training
  * pipelines normalize audio to before feature extraction. Compressed
  * containers (mp3/ogg/aac) remain at the pluggable seam a JavaCV/ffmpeg
  * binding fills in production.
  */
object WavCodec {

  /** interleaved 16-bit samples; `samples.length / channels` frames. */
  final case class Wav(
      sampleRate: Int,
      channels: Int,
      samples: Array[Short]) {
    def frames: Int = samples.length / channels
    def durationSec: Double = frames.toDouble / sampleRate
  }

  def encode(w: Wav): Array[Byte] = {
    val dataLen = w.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(w.channels.toShort)
    buf.putInt(w.sampleRate)
    buf.putInt(w.sampleRate * w.channels * 2) // byte rate
    buf.putShort((w.channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    w.samples.foreach(buf.putShort)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF stream")
    buf.getInt // riff size
    require(tag() == "WAVE", "not a WAVE stream")
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || sampleRate < 0)) {
      val id = tag()
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"unsupported WAV format $fmt (need PCM)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          require(bits == 16, s"unsupported bit depth $bits (need 16)")
          buf.position(buf.position() + (len - 16)) // fmt extensions
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ =>
          buf.position(buf.position() + len + (len & 1)) // chunks pad to even
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    Wav(sampleRate, channels, samples)
  }

  def rms(w: Wav): Double = {
    if (w.samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i).toDouble; acc += s * s; i += 1
    }
    math.sqrt(acc / w.samples.length)
  }

  def peak(w: Wav): Int = {
    var p = 0
    var i = 0
    while (i < w.samples.length) {
      val a = math.abs(w.samples(i).toInt); if (a > p) p = a; i += 1
    }
    p
  }

  /** Linear resampler with EXACT integer arithmetic (mono only): output
    * position j maps to source time j·src/dst as the rational
    * (idx = ⌊j·src/dst⌋, rem = j·src mod dst), and the interpolated
    * sample is s[idx] + rem·(s[idx+1]−s[idx]) / dst with TRUNCATING
    * division (JVM `/`, which DuckDB's integer `//` matches — both
    * round toward zero on negatives, verified live; `Math.floorDiv`
    * would be off by one ulp on every falling edge) — no floating point
    * anywhere, so any engine that can do integer math reproduces the
    * output bit-for-bit (mm06's DuckDB oracle replays synthetic square
    * waves through the same formula). Output length ⌊(n−1)·dst/src⌋+1
    * covers exactly the positions with a defined left neighbor.
    * Resampling is the normalization step an audio training pipeline
    * applies before feature extraction; the linear kernel is the
    * standard cheap path (windowed-sinc lives behind the same signature
    * when fidelity demands it). */
  def resampleLinear(w: Wav, dstRate: Int): Wav = {
    require(w.channels == 1, "resampleLinear: mono PCM only")
    require(dstRate > 0, s"bad dstRate $dstRate")
    val n = w.samples.length
    if (n == 0 || dstRate == w.sampleRate) return w.copy(sampleRate = dstRate)
    val src = w.sampleRate.toLong
    val dst = dstRate.toLong
    val outN = ((n - 1).toLong * dst / src).toInt + 1
    val out = new Array[Short](outN)
    var j = 0
    while (j < outN) {
      val pos = j * src
      val idx = (pos / dst).toInt
      val rem = pos % dst
      val s0 = w.samples(idx).toLong
      val v =
        if (rem == 0 || idx + 1 >= n) s0
        else s0 + rem * (w.samples(idx + 1).toLong - s0) / dst
      out(j) = v.toShort
      j += 1
    }
    Wav(dstRate, 1, out)
  }
}
