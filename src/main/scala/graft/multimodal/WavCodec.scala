package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/WAVE PCM codec — the real audio decode path for the
  * multimodal column operators (no native dependency for PCM).
  * Chunk-walking decoder: reads `fmt ` and `data`, skips unknown
  * chunks (LIST/INFO etc.), accepts 8/16/24/32-bit integer PCM and
  * 32-bit IEEE float incl. WAVE_FORMAT_EXTENSIBLE headers, normalized
  * to the library's 16-bit convention. The encoder emits canonical
  * 16-bit PCM — the format training pipelines normalize to. Compressed
  * audio: FLAC decodes natively ([[FlacCodec]]); mp3/ogg/aac stay at
  * the typed seam (Huffman value-table blocker).
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

  /** Decode PCM WAV at the bit depths real corpora carry — 8-bit
    * unsigned, 16/24/32-bit signed, and 32-bit IEEE float (format 3),
    * including WAVE_FORMAT_EXTENSIBLE headers — all normalized to the
    * library's 16-bit convention (8-bit << 8; 24/32-bit arithmetic
    * right shift; float rounded at ±32767 full scale and clamped).
    * Chunk-order independent: `data` bytes are held raw until the
    * `fmt ` chunk fixes the conversion. */
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
    var fmtCode = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (buf.remaining() >= 8 && (dataOff < 0 || sampleRate < 0)) {
      val id = tag()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"chunk $id overruns")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          fmtCode = buf.getShort & 0xffff
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          if (fmtCode == 0xfffe) {
            // WAVE_FORMAT_EXTENSIBLE: the real format is the first two
            // bytes of the SubFormat GUID (after cbSize + validBits +
            // channel mask)
            require(len >= 40, "extensible fmt chunk too short")
            buf.getShort // cbSize
            buf.getShort // valid bits
            buf.getInt // channel mask
            fmtCode = buf.getShort & 0xffff
            buf.position(buf.position() + (len - 26))
          } else buf.position(buf.position() + (len - 16))
        case "data" =>
          dataOff = buf.position()
          dataLen = len
          buf.position(buf.position() +
            math.min(buf.remaining(), len + (len & 1)))
        case _ =>
          // chunks pad to even, but a file may end without the pad byte
          buf.position(buf.position() +
            math.min(buf.remaining(), len + (len & 1)))
      }
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(fmtCode == 1 || fmtCode == 3,
      s"unsupported WAV format $fmtCode (need PCM or IEEE float)")
    if (fmtCode == 3) require(bits == 32, s"float WAV needs 32 bits, got $bits")
    else require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
      s"unsupported bit depth $bits")
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    val samples = new Array[Short](n)
    val d = ByteBuffer.wrap(bytes, dataOff, dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    if (fmtCode == 3) {
      while (i < n) {
        val f = d.getFloat
        val v = math.round(f * 32767f)
        samples(i) = math.max(-32768, math.min(32767, v)).toShort
        i += 1
      }
    } else bits match {
      case 8 =>
        while (i < n) {
          samples(i) = (((d.get() & 0xff) - 128) << 8).toShort; i += 1
        }
      case 16 =>
        while (i < n) { samples(i) = d.getShort; i += 1 }
      case 24 =>
        while (i < n) {
          val b0 = d.get() & 0xff
          val b1 = d.get() & 0xff
          val b2 = d.get() // sign byte
          samples(i) = (((b2 << 16) | (b1 << 8) | b0) >> 8).toShort
          i += 1
        }
      case _ => // 32
        while (i < n) { samples(i) = (d.getInt >> 16).toShort; i += 1 }
    }
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
