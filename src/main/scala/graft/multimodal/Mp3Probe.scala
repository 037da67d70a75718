package graft.multimodal

/** MPEG-1 Layer III (MP3) header audit — the most common compressed
  * audio on the web. DECODE stays at the typed seam (layer-III
  * Huffman VALUE tables are the CABAC-class offline blocker), but the
  * frame-header walk is structural: sync scan, ID3v2 tag skip
  * (syncsafe length), per-frame bitrate/samplerate/padding fields and
  * the layer-III frame-length arithmetic — which is exactly what a
  * corpus AUDIT needs (frame count, duration, bitrate histogram,
  * CBR/VBR detection) at KBs of header reads per file.
  *
  * The bitrate/samplerate index tables are the published MPEG-1
  * constants (the registry-values class, like CRC polynomials and
  * Matroska IDs — not derivation-blocked codebooks).
  */
object Mp3Probe {

  /** MPEG-1 Layer III bitrate table, kbit/s (index 0 = free, 15 = bad) */
  private val BitrateKbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by 2-bit index (3 = reserved) */
  private val SampleRates = Array(44100, 48000, 32000)

  final case class Mp3Meta(
      nFrames: Int,
      sampleRate: Int,
      totalBytes: Long, // audio frame bytes (tags excluded)
      minBitrateKbps: Int,
      maxBitrateKbps: Int,
      id3v2Bytes: Int) { // skipped leading tag size (0 = none)
    def cbr: Boolean = nFrames > 0 && minBitrateKbps == maxBitrateKbps
    /** 1152 samples per MPEG-1 layer-III frame */
    def durationSec: Double =
      if (sampleRate > 0) nFrames * 1152.0 / sampleRate else 0.0
  }

  def probe(bytes: Array[Byte]): Mp3Meta = {
    var pos = 0
    var id3 = 0
    // leading ID3v2 tag: "ID3", 2 version bytes, 1 flags, 4 syncsafe
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      id3 = 10 + size
      pos = math.min(bytes.length, id3.toLong).toInt
    }
    var n = 0
    var rate = 0
    var total = 0L
    var minBr = Int.MaxValue
    var maxBr = 0
    while (pos + 4 <= bytes.length) {
      val b0 = bytes(pos) & 0xff
      val b1 = bytes(pos + 1) & 0xff
      // MPEG-1 Layer III sync: 11 set bits, version 11, layer 01
      if (b0 == 0xff && (b1 & 0xfe) == 0xfa) {
        val b2 = bytes(pos + 2) & 0xff
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) {
          pos += 1 // free/bad header: resync
        } else {
          val br = BitrateKbps(brIdx)
          val sr = SampleRates(srIdx)
          val frameLen = 144 * br * 1000 / sr + padding
          if (pos + frameLen > bytes.length) {
            pos = bytes.length // truncated final frame: stop
          } else {
            n += 1
            rate = sr
            total += frameLen
            if (br < minBr) minBr = br
            if (br > maxBr) maxBr = br
            pos += frameLen
          }
        }
      } else pos += 1 // resync scan (corrupt shards)
    }
    Mp3Meta(n, rate, total, if (n == 0) 0 else minBr, maxBr, id3)
  }

  /** fixture writer: ID3v2 tag (optional) + `n` conformant MPEG-1
    * Layer III frame headers with zero-filled payloads — real header
    * arithmetic without a (blocked) layer-III payload encoder. */
  def encodeHeaders(n: Int, bitrateIdx: Int => Int, srIdx: Int = 0,
      id3Size: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size))
    }
    var i = 0
    while (i < n) {
      val brIdx = bitrateIdx(i)
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx")
      val padding = i % 2 // alternate padding for arithmetic coverage
      val frameLen =
        144 * BitrateKbps(brIdx) * 1000 / SampleRates(srIdx) + padding
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xff.toByte
      frame(1) = 0xfa.toByte // MPEG-1, layer III, no CRC
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
      frame(3) = 0xc0.toByte // mono, no extras
      out.write(frame)
      i += 1
    }
    out.toByteArray
  }
}
