package graft.multimodal

/** AAC ADTS frame-walk audit — the other half (with [[Mp3Probe]]) of
  * the compressed-audio audit seam. The reference reaches aac through
  * ffmpeg (`autodecode.py:382-422`); full AAC DECODE stays at the typed
  * seam (scalefactor/spectrum Huffman codebooks + the IMDCT filterbank
  * are the CABAC-class offline value-table blocker — see SCALE.md), but
  * everything a 100 TB corpus audit needs from ADTS is structural and
  * implemented here:
  *
  *  - syncword walk (0xFFF + layer '00') with byte-wise resync over
  *    corrupt regions — junk bytes and resync events are COUNTED, never
  *    silently skipped;
  *  - per-frame header fields (ISO/IEC 13818-7 §6.2 adts_fixed_header /
  *    adts_variable_header): MPEG version, profile/object type,
  *    sampling_frequency_index, channel_configuration,
  *    aac_frame_length, number_of_raw_data_blocks_in_frame;
  *  - frame-length arithmetic → frame count, raw-data-block count, and
  *    duration (1024 PCM samples per raw data block);
  *  - truncation detection: a final header whose declared length
  *    overruns EOF is reported as truncated tail bytes, not a frame;
  *  - mid-stream parameter changes (profile/rate/channels) are counted
  *    — a spliced-shard detector.
  *
  * CRC posture, stated honestly: frames with protection_absent = 0
  * carry a 16-bit crc_check and are counted as protected, but the CRC
  * content is NOT validated — ISO 13818-7 §8.2.2 computes it over
  * "sensitive" bits OF THE RAW DATA BLOCK (bitstream-parse-dependent
  * spans), so verifying it requires exactly the payload decode that
  * stays at the typed seam. This differs from MP3, where the crc_check
  * spans are header+side-info (structural) and [[Mp3Probe]] verifies
  * them. Counting protection coverage without claiming validation is
  * the honest audit; practical decoders (e.g. FAAD2) skip ADTS CRC
  * verification for the same reason.
  *
  * Multi-raw-data-block PROTECTED frames (protection_absent = 0 AND
  * number_of_raw_data_blocks > 0) additionally carry 16-bit
  * raw_data_block_position markers between the header and the first
  * CRC (adts_header_error_check). The WALK stays correct regardless —
  * aac_frame_length spans the whole frame, so frame counting, duration
  * and truncation detection never depend on the inner layout — and
  * [[encodeAdts]] deliberately emits that combination never (CRC XOR
  * multi-block), matching the walk's 9-byte fixed-header model.
  *
  * The sampling-frequency table is the published ISO/IEC 14496-3
  * constant set (registry-values class — like CRC polynomials and
  * Matroska IDs, not derivation-blocked codebooks).
  */
object AacProbe {

  /** ISO/IEC 14496-3 sampling_frequency_index table (13 entries;
    * 13/14 reserved, 15 = explicit/forbidden in ADTS). */
  private val SampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  final case class AdtsStats(
      nFrames: Int,
      /** frames with protection_absent = 0 (a crc_check is present;
        * content not validated — see class doc) */
      protectedFrames: Int,
      /** 0 = MPEG-4, 1 = MPEG-2 (first valid frame) */
      mpegVersion: Int,
      /** 2-bit profile field = audio object type - 1 (first frame) */
      profile: Int,
      sampleRate: Int,
      channels: Int,
      /** Σ (number_of_raw_data_blocks_in_frame + 1) over walked frames;
        * each raw data block is 1024 PCM samples */
      rawBlocks: Long,
      /** bytes skipped by resync scans (corrupt regions) */
      junkBytes: Int,
      /** distinct resync events (consecutive junk = one run) */
      resyncs: Int,
      /** bytes of a final frame whose header declared a length past
        * EOF (0 = stream ends on a frame boundary) */
      truncatedBytes: Int,
      /** frames whose profile/rate/channels differ from the first
        * valid frame's (spliced-shard detector) */
      configChanges: Int) {
    def durationSec: Double =
      if (sampleRate > 0) rawBlocks * 1024.0 / sampleRate else 0.0
  }

  def probe(bytes: Array[Byte]): AdtsStats = {
    // leading ID3v2 tag (common on .aac files): skipped whole, footer
    // included, NOT counted as junk — a tag is metadata, not corruption
    var pos = Id3.skipLength(bytes)
    var n = 0
    var prot = 0
    var ver = 0
    var prof = -1
    var sr = 0
    var ch = 0
    var blocks = 0L
    var junk = 0
    var resyncs = 0
    var truncated = 0
    var cfgChanges = 0
    var inJunkRun = false
    while (pos + 7 <= bytes.length && truncated == 0) {
      val b0 = bytes(pos) & 0xff
      val b1 = bytes(pos + 1) & 0xff
      // ADTS sync: 12 set bits then layer '00' (b1 bit 2..1); the
      // version (bit 3) and protection_absent (bit 0) bits are free
      if (b0 == 0xff && (b1 & 0xf6) == 0xf0) {
        val b2 = bytes(pos + 2) & 0xff
        val b3 = bytes(pos + 3) & 0xff
        val b4 = bytes(pos + 4) & 0xff
        val b5 = bytes(pos + 5) & 0xff
        val b6 = bytes(pos + 6) & 0xff
        val protAbsent = b1 & 0x1
        val srIdx = (b2 >> 2) & 0xf
        val headerLen = if (protAbsent == 0) 9 else 7
        val frameLen = ((b3 & 0x3) << 11) | (b4 << 3) | (b5 >> 5)
        if (srIdx >= SampleRates.length || frameLen < headerLen) {
          // reserved rate / impossible length: not a real header
          junk += 1
          if (!inJunkRun) { resyncs += 1; inJunkRun = true }
          pos += 1
        } else if (pos + frameLen > bytes.length) {
          truncated = bytes.length - pos // declared length overruns EOF
        } else {
          inJunkRun = false
          val fVer = (b1 >> 3) & 0x1
          val fProf = (b2 >> 6) & 0x3
          val fCh = ((b2 & 0x1) << 2) | ((b3 >> 6) & 0x3)
          if (prof < 0) {
            ver = fVer; prof = fProf; sr = SampleRates(srIdx); ch = fCh
          } else if (fProf != prof || SampleRates(srIdx) != sr ||
            fCh != ch) cfgChanges += 1
          if (protAbsent == 0) prot += 1
          blocks += (b6 & 0x3) + 1
          n += 1
          pos += frameLen
        }
      } else {
        junk += 1
        if (!inJunkRun) { resyncs += 1; inJunkRun = true }
        pos += 1
      }
    }
    // a trailing fragment shorter than a header is junk, not a frame
    if (truncated == 0 && pos < bytes.length) {
      junk += bytes.length - pos
      if (!inJunkRun) resyncs += 1
    }
    AdtsStats(n, prot, ver, math.max(prof, 0), sr, ch, blocks, junk,
      resyncs, truncated, cfgChanges)
  }

  /** Fixture writer: `n` conformant ADTS frames with deterministic
    * filler payloads (bytes mod 255, so 0xFF — and hence a false
    * syncword — cannot occur inside a payload). Real header-field and
    * frame-length arithmetic without a (blocked) AAC payload encoder.
    *
    * @param payloadLen     per-frame raw payload bytes (excl. header)
    * @param srIdx          sampling_frequency_index (0..12)
    * @param channels       channel_configuration (1..6)
    * @param profile        2-bit profile field (0..3)
    * @param withCrc        protection_absent = 0: a 9-byte header whose
    *                       crc_check slot is zero-filled (see class doc)
    * @param rawBlocks      number_of_raw_data_blocks_in_frame (0..3);
    *                       the frame carries rawBlocks+1 blocks
    * @param breakSyncAt    zero that frame's first header byte — the
    *                       walker must resync past it (-1 = none)
    * @param truncateTail   chop that many bytes off the final frame */
  def encodeAdts(n: Int, payloadLen: Int => Int, srIdx: Int,
      channels: Int, profile: Int, withCrc: Boolean, rawBlocks: Int = 0,
      breakSyncAt: Int = -1, truncateTail: Int = 0): Array[Byte] = {
    require(srIdx >= 0 && srIdx < SampleRates.length, s"srIdx $srIdx")
    require(channels >= 1 && channels <= 7, s"channels $channels")
    require(profile >= 0 && profile <= 3 && rawBlocks >= 0 &&
      rawBlocks <= 3, s"profile $profile rawBlocks $rawBlocks")
    require(breakSyncAt == -1 || breakSyncAt < n - 1, // the walker needs
      s"breakSyncAt $breakSyncAt of $n") // a next frame to resync onto;
    // see the oracle (-1 = no break, legal even for an empty stream)
    val headerLen = if (withCrc) 9 else 7
    val out = new java.io.ByteArrayOutputStream()
    // adts_buffer_fullness: a fixed mid-range value chosen so no header
    // byte it touches can read 0xFF (keeps resync scans deterministic)
    val fullness = 0x5a5
    var i = 0
    while (i < n) {
      val pl = payloadLen(i)
      val frameLen = headerLen + pl
      require(frameLen < 1024, // keeps b4 < 0x80: no false sync bytes
        s"frame $i length $frameLen exceeds the fixture ceiling")
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xff.toByte
      // MPEG-4 (ID=0), layer 00, protection_absent per withCrc
      frame(1) = (0xf0 | (if (withCrc) 0 else 1)).toByte
      frame(2) = ((profile << 6) | (srIdx << 2) |
        ((channels >> 2) & 0x1)).toByte
      frame(3) = (((channels & 0x3) << 6) | ((frameLen >> 11) & 0x3)).toByte
      frame(4) = ((frameLen >> 3) & 0xff).toByte
      frame(5) = (((frameLen & 0x7) << 5) | (fullness >> 6)).toByte
      frame(6) = (((fullness & 0x3f) << 2) | rawBlocks).toByte
      // crc_check slot (withCrc): zero-filled — see class doc
      var j = headerLen
      while (j < frameLen) {
        frame(j) = ((i * 31 + j) % 255).toByte // never 0xFF
        j += 1
      }
      if (i == breakSyncAt) frame(0) = 0 // kill the syncword
      if (i == n - 1 && truncateTail > 0)
        out.write(frame, 0, frameLen - truncateTail)
      else out.write(frame)
      i += 1
    }
    out.toByteArray
  }
}
