package graft.multimodal

/** MPEG-1 Layer III (MP3) frame-walk audit — the most common
  * compressed audio on the web. DECODE stays at the typed seam
  * (layer-III Huffman VALUE tables + the IMDCT/synthesis filterbank
  * are the CABAC-class offline blocker — see SCALE.md "mp3: why full
  * decode stays out"), but everything an audit needs is structural and
  * implemented here:
  *
  *  - sync scan with resync over corrupt bytes, ID3v2 tag skip
  *    (syncsafe length);
  *  - per-frame bitrate/samplerate/padding fields and the layer-III
  *    frame-length arithmetic → frame count, duration, CBR/VBR,
  *    bitrate range;
  *  - CRC-16 verification for protected frames (protection_bit = 0:
  *    ISO 11172-3 crc_check over header bytes 2-3 + the side-info
  *    region, poly 0x8005 init 0xFFFF) → corrupt-frame counts without
  *    decoding audio;
  *  - Xing/Info VBR header parse (first frame's tag after the side
  *    info: declared frame/byte totals) → declared-vs-walked
  *    consistency, the truncation detector every crawl audit wants.
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

  /** MPEG-1 Layer III side-info size: 17 bytes mono, 32 otherwise */
  private def sideInfoBytes(channelMode: Int): Int =
    if (channelMode == 3) 17 else 32

  /** ISO 11172-3 crc_check: CRC-16, poly 0x8005, init 0xFFFF,
    * MSB-first, over header bytes 2-3 then the side-info region. */
  private[multimodal] def crc16(
      data: Array[Byte], spans: Seq[(Int, Int)]): Int = {
    var crc = 0xffff
    spans.foreach { case (from, until) =>
      var i = from
      while (i < until) {
        crc ^= (data(i) & 0xff) << 8
        var b = 0
        while (b < 8) {
          crc =
            if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
            else (crc << 1) & 0xffff
          b += 1
        }
        i += 1
      }
    }
    crc
  }

  final case class Mp3Meta(
      nFrames: Int,
      sampleRate: Int,
      totalBytes: Long, // audio frame bytes (tags excluded)
      minBitrateKbps: Int,
      maxBitrateKbps: Int,
      id3v2Bytes: Int, // skipped leading tag size (0 = none)
      /** frames carrying a CRC (protection_bit = 0) */
      crcFrames: Int = 0,
      /** protected frames whose stored CRC mismatches */
      crcBad: Int = 0,
      /** "Xing" (VBR) / "Info" (CBR) first-frame tag, "" = absent */
      xingTag: String = "",
      /** frame total declared by the Xing/Info header, -1 = absent */
      declaredFrames: Int = -1,
      /** byte total declared by the Xing/Info header, -1 = absent */
      declaredBytes: Long = -1L,
      /** length of the first (tag-bearing) frame, for the
        * tag-frame-excluded declared-total convention */
      firstFrameBytes: Long = 0L) {
    def cbr: Boolean = nFrames > 0 && minBitrateKbps == maxBitrateKbps
    /** 1152 samples per MPEG-1 layer-III frame */
    def durationSec: Double =
      if (sampleRate > 0) nFrames * 1152.0 / sampleRate else 0.0
    /** Xing-declared totals agree with the walk (absent = vacuous).
      * Real encoders differ on whether the tag frame itself counts:
      * LAME conventionally declares the AUDIO frames (excluding the
      * Xing frame the walk counts), others declare the file totals —
      * both spellings of an intact file pass; anything else (a
      * truncated tail, a lying header) is inconsistent. */
    def declaredConsistent: Boolean = {
      val framesOk = declaredFrames < 0 || declaredFrames == nFrames ||
        (xingTag.nonEmpty && declaredFrames == nFrames - 1)
      val bytesOk = declaredBytes < 0 || declaredBytes == totalBytes ||
        (xingTag.nonEmpty && declaredBytes == totalBytes - firstFrameBytes)
      framesOk && bytesOk
    }
  }

  def probe(bytes: Array[Byte]): Mp3Meta = {
    // leading ID3v2 tag ([[Id3.skipLength]] — footer-flag aware)
    val id3 = Id3.skipLength(bytes)
    var pos = id3
    var n = 0
    var rate = 0
    var total = 0L
    var minBr = Int.MaxValue
    var maxBr = 0
    var crcFrames = 0
    var crcBad = 0
    var xingTag = ""
    var declFrames = -1
    var declBytes = -1L
    var firstLen = 0L
    def be32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
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
            val hasCrc = (b1 & 0x1) == 0 // protection_bit = 0
            val mode = (bytes(pos + 3) >> 6) & 0x3
            val si = sideInfoBytes(mode)
            val siStart = pos + 4 + (if (hasCrc) 2 else 0)
            if (hasCrc && siStart + si <= pos + frameLen) {
              crcFrames += 1
              val stored = ((bytes(pos + 4) & 0xff) << 8) |
                (bytes(pos + 5) & 0xff)
              val calc = crc16(bytes,
                Seq((pos + 2, pos + 4), (siStart, siStart + si)))
              if (stored != calc) crcBad += 1
            }
            // Xing/Info header: first frame only, right after side info
            val tagOff = siStart + si
            if (n == 0 && tagOff + 8 <= pos + frameLen) {
              val tag = new String(bytes, tagOff, 4, "ISO-8859-1")
              if (tag == "Xing" || tag == "Info") {
                xingTag = tag
                val flags = be32(tagOff + 4)
                var off = tagOff + 8
                if ((flags & 1) != 0 && off + 4 <= pos + frameLen) {
                  // clamp, don't wrap: a lying value >= 2^31 must stay
                  // a huge positive count (inconsistent with any walk),
                  // not wrap negative into the 'absent' sentinel and
                  // vacuously pass declaredConsistent
                  declFrames = math.min(be32(off), Int.MaxValue).toInt
                  off += 4
                }
                if ((flags & 2) != 0 && off + 4 <= pos + frameLen)
                  declBytes = be32(off)
              }
            }
            if (n == 0) firstLen = frameLen.toLong
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
    Mp3Meta(n, rate, total, if (n == 0) 0 else minBr, maxBr, id3,
      crcFrames, crcBad, xingTag, declFrames, declBytes, firstLen)
  }

  /** fixture writer: ID3v2 tag (optional) + `n` conformant MPEG-1
    * Layer III frames with zero-filled payloads — real header, CRC and
    * Xing arithmetic without a (blocked) layer-III payload encoder.
    *
    * @param withCrc       protected frames: protection_bit 0 + a real
    *                      crc_check over header+side-info
    * @param corruptCrcAt  flip that frame's stored CRC (-1 = none)
    * @param xingTag       "" = no tag; "Xing"/"Info" writes the tag in
    *                      the first frame with frames+bytes flags
    * @param declaredFrames value for the tag's frame field (-1 = n)
    * @param declaredBytes  value for the tag's bytes field (-1 = the
    *                       actual stream total) */
  def encodeHeaders(n: Int, bitrateIdx: Int => Int, srIdx: Int = 0,
      id3Size: Int = 0, withCrc: Boolean = false, corruptCrcAt: Int = -1,
      xingTag: String = "", declaredFrames: Int = -1,
      declaredBytes: Long = -1L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size))
    }
    def frameLenOf(i: Int): Int = {
      val brIdx = bitrateIdx(i)
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx")
      144 * BitrateKbps(brIdx) * 1000 / SampleRates(srIdx) + (i % 2)
    }
    val totalBytes = (0 until n).map(i => frameLenOf(i).toLong).sum
    var i = 0
    while (i < n) {
      val brIdx = bitrateIdx(i)
      val padding = i % 2 // alternate padding for arithmetic coverage
      val frame = new Array[Byte](frameLenOf(i))
      frame(0) = 0xff.toByte
      // protection_bit = 0 means a crc_check FOLLOWS (ISO 11172-3);
      // 0xfb = MPEG-1 layer III without CRC
      frame(1) = (if (withCrc) 0xfa else 0xfb).toByte
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
      frame(3) = 0xc0.toByte // mono, no extras
      val si = sideInfoBytes(3)
      val siStart = 4 + (if (withCrc) 2 else 0)
      if (i == 0 && xingTag.nonEmpty) {
        require(xingTag == "Xing" || xingTag == "Info", xingTag)
        val tagOff = siStart + si
        xingTag.getBytes("ISO-8859-1").copyToArray(frame, tagOff): Unit
        val df = if (declaredFrames >= 0) declaredFrames else n
        val db = if (declaredBytes >= 0) declaredBytes else totalBytes
        def be32(off: Int, v: Long): Unit = {
          frame(off) = ((v >> 24) & 0xff).toByte
          frame(off + 1) = ((v >> 16) & 0xff).toByte
          frame(off + 2) = ((v >> 8) & 0xff).toByte
          frame(off + 3) = (v & 0xff).toByte
        }
        be32(tagOff + 4, 3L) // flags: frames + bytes
        be32(tagOff + 8, df.toLong)
        be32(tagOff + 12, db)
      }
      if (withCrc) {
        val crc = crc16(frame, Seq((2, 4), (siStart, siStart + si)))
        val stored = if (i == corruptCrcAt) crc ^ 0x5555 else crc
        frame(4) = ((stored >> 8) & 0xff).toByte
        frame(5) = (stored & 0xff).toByte
      }
      out.write(frame)
      i += 1
    }
    out.toByteArray
  }
}
