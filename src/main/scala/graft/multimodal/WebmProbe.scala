package graft.multimodal

/** Pure-JVM WebM/Matroska (EBML) container probe — the audit-tier
  * sibling of [[Mp4Probe]] for the OTHER container real crawls carry.
  * Frame DECODE of VP8/VP9/AV1 stays a typed-unsupported codec (their
  * entropy-coder value tables are the CABAC-class blocker, SCALE.md),
  * but container metadata — doc type, duration, track codecs, video
  * dimensions — is structural EBML walking and powers the same
  * header-only corpus audit mm04/mm12 run on MP4.
  *
  * Element IDs used are the public Matroska registry constants (the
  * container's fourcc analog). Tolerates truncation and unknown
  * elements; unknown-size elements extend to the parent's end.
  */
object WebmProbe {

  final case class WebmMeta(
      docType: String,
      timestampScale: Long, // ns per timestamp unit (default 1e6 = 1ms)
      duration: Double, // in timestamp units
      width: Int,
      height: Int,
      codecs: Seq[String]) {
    def durationSec: Double = duration * timestampScale / 1e9
  }

  // EBML/Matroska element IDs (public registry)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL

  /** VINT read at `pos`: (value, bytesConsumed). `keepMarker` keeps
    * the length-marker bit (element IDs); sizes strip it. Returns
    * (-1, 0) on truncation. */
  private def vint(b: Array[Byte], pos: Int,
      keepMarker: Boolean): (Long, Int) = {
    if (pos >= b.length) return (-1L, 0)
    val first = b(pos) & 0xff
    if (first == 0) return (-1L, 0)
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len > 8 || pos + len > b.length) return (-1L, 0)
    var v =
      if (keepMarker) first.toLong
      else (first & ((1 << (8 - len)) - 1)).toLong
    var i = 1
    while (i < len) {
      v = (v << 8) | (b(pos + i) & 0xff)
      i += 1
    }
    (v, len)
  }

  /** all-ones size payload = "unknown size" (extends to parent end) */
  private def unknownSize(v: Long, len: Int): Boolean =
    v == (1L << (7 * len)) - 1

  private def uintAt(b: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until && i < b.length) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], from: Int, until: Int): Double = {
    val n = until - from
    if (from + n > b.length) 0.0
    else if (n == 4)
      java.lang.Float.intBitsToFloat(uintAt(b, from, until).toInt).toDouble
    else if (n == 8) java.lang.Double.longBitsToDouble(uintAt(b, from, until))
    else 0.0
  }

  def probe(bytes: Array[Byte]): WebmMeta = {
    var docType = ""
    var tsScale = 1000000L
    var duration = 0.0
    var width = 0
    var height = 0
    val codecs = Seq.newBuilder[String]

    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return
      var pos = start
      while (pos < end) {
        val (id, idLen) = vint(bytes, pos, keepMarker = true)
        if (idLen == 0) return
        val (size, szLen) = vint(bytes, pos + idLen, keepMarker = false)
        if (szLen == 0) return
        val bodyStart = pos + idLen + szLen
        val bodyEnd =
          if (unknownSize(size, szLen)) end
          else math.min(end.toLong, bodyStart.toLong + size).toInt
        if (bodyStart > end) return
        id match {
          case IdEbml | IdSegment | IdInfo | IdTracks | IdTrackEntry |
               IdVideo =>
            walk(bodyStart, bodyEnd, depth + 1)
          case IdDocType =>
            docType = new String(bytes, bodyStart,
              math.max(0, bodyEnd - bodyStart), "US-ASCII").trim
          case IdTimestampScale =>
            tsScale = uintAt(bytes, bodyStart, bodyEnd)
          case IdDuration =>
            duration = floatAt(bytes, bodyStart, bodyEnd)
          case IdCodecId =>
            codecs += new String(bytes, bodyStart,
              math.max(0, bodyEnd - bodyStart), "US-ASCII").trim
          case IdPixelWidth =>
            width = uintAt(bytes, bodyStart, bodyEnd).toInt
          case IdPixelHeight =>
            height = uintAt(bytes, bodyStart, bodyEnd).toInt
          case _ => () // unknown element: skip payload
        }
        pos = math.max(bodyEnd, bodyStart) // always advance
      }
    }

    walk(0, bytes.length, 0)
    WebmMeta(docType, math.max(1L, tsScale), duration, width, height,
      codecs.result())
  }

  /** fixture writer: a minimal conformant webm header — EBML(DocType)
    * + Segment(Info(TimestampScale, Duration), Tracks(video TrackEntry
    * with CodecID + dimensions [, audio TrackEntry])). No clusters:
    * the probe tier is header-only by design. */
  def encodeMinimal(docType: String, durationTs: Double, width: Int,
      height: Int, videoCodec: String,
      audioCodec: Option[String] = None): Array[Byte] = {
    def vintSize(v: Long): Array[Byte] = {
      // encode size in the fewest marker-capable bytes
      var len = 1
      while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
      val out = new Array[Byte](len)
      var i = len - 1
      var x = v
      while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
      out(0) = (out(0) | (0x80 >> (len - 1))).toByte
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      val out = new Array[Byte](n)
      var i = n - 1
      var x = id
      while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
      out
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ vintSize(payload.length.toLong) ++ payload
    def uintPayload(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      val out = new Array[Byte](n)
      var i = n - 1
      var x = v
      while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
      out
    }
    val info = el(IdInfo,
      el(IdTimestampScale, uintPayload(1000000L)) ++
        el(IdDuration, {
          val bits = java.lang.Double.doubleToLongBits(durationTs)
          (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
        }))
    val videoTrack = el(IdTrackEntry,
      el(IdCodecId, videoCodec.getBytes("US-ASCII")) ++
        el(IdVideo,
          el(IdPixelWidth, uintPayload(width.toLong)) ++
            el(IdPixelHeight, uintPayload(height.toLong))))
    val audioTrack = audioCodec.map(c =>
      el(IdTrackEntry, el(IdCodecId, c.getBytes("US-ASCII"))))
      .getOrElse(Array.emptyByteArray)
    val tracks = el(IdTracks, videoTrack ++ audioTrack)
    el(IdEbml, el(IdDocType, docType.getBytes("US-ASCII"))) ++
      el(IdSegment, info ++ tracks)
  }
}
