package graft.wds

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec fast path (RFC 2083 / ISO 15948 — public wire
  * format): 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced.
  *
  * Exists for throughput, not coverage: `ImageIO.read`/`write` cost
  * ~50–100 µs of stream/plugin overhead PER CALL, which dominates
  * frame-level pipelines (mm05 decodes ~6 tiny frames per document —
  * at 100 TB that per-call constant is the whole bill). This codec is
  * an allocation-lean single-pass encode and a Inflater+unfilter
  * decode over byte arrays. Anything outside the fast path (palette,
  * 16-bit, interlaced) falls back to ImageIO in [[Codecs]]; the
  * output bytes are standards-compliant PNGs readable by any decoder.
  *
  * Reference behavior mirrored: `autodecode.py` imagehandler u8 RGB
  * rasters (row-major interleaved), `tools.py` PIL frame writes.
  */
object Png {

  private val Magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(b, 8), Magic)

  private def colorType(ch: Int): Int = ch match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(s"channels $n")
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 4 => 2
    case 2 => 3
    case 6 => 4
    case t => throw new IllegalArgumentException(s"png color type $t")
  }

  /** Encode an 8-bit interleaved raster as a filter-0 PNG. One deflate
    * pass at BEST_SPEED — fixture-synth and shard-write throughput beat
    * the few % of extra bytes adaptive filtering would save. */
  def encode(img: Codecs.ImageData): Array[Byte] = {
    val ch = img.nChannels
    require(ch >= 1 && ch <= 4, s"channels $ch")
    val (w, h) = (img.width, img.height)
    require(img.data.length == w * h * ch,
      s"raster ${img.data.length} != ${w}x${h}x$ch")
    val stride = w * ch
    // filtered stream: one 0-filter byte per row
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      System.arraycopy(img.data, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val defl = new Deflater(Deflater.BEST_SPEED)
    defl.setInput(raw)
    defl.finish()
    var idat = new Array[Byte](raw.length / 2 + 64)
    var n = 0
    while (!defl.finished()) {
      if (n == idat.length)
        idat = java.util.Arrays.copyOf(idat, idat.length * 2)
      n += defl.deflate(idat, n, idat.length - n)
    }
    defl.end()

    val out = new java.io.ByteArrayOutputStream(n + 64)
    out.write(Magic, 0, 8)
    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, w); putInt(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType(ch).toByte
    // ihdr(10..12) = compression 0, filter 0, interlace 0
    writeChunk(out, "IHDR", ihdr, 13)
    writeChunk(out, "IDAT", idat, n)
    writeChunk(out, "IEND", Array.emptyByteArray, 0)
    out.toByteArray
  }

  /** Decode the fast path; None when the image needs the ImageIO
    * fallback (palette/16-bit/interlaced). Throws on corrupt data —
    * callers treat any throw as the undecodable-sample signal. */
  def decode(bytes: Array[Byte]): Option[Codecs.ImageData] = {
    if (!isPng(bytes)) return None
    var pos = 8
    var w = 0; var h = 0; var ch = 0
    var ok = false
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = getInt(bytes, pos)
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"png chunk overruns buffer (len=$len at $pos)")
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      // critical-chunk CRC over type+data (one cheap pass vs inflate):
      // a bit-flipped IHDR/IDAT must throw — the corrupt-sample
      // contract is "any throw = undecodable", and without this check a
      // flipped IDAT byte decodes to silently wrong pixels where every
      // standards decoder rejects the file. Skipped ancillary chunks
      // stay unverified: they contribute nothing to the output raster.
      if (ctype == "IHDR" || ctype == "IDAT" || ctype == "IEND") {
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, pos + 4, 4 + len)
        val want = getInt(bytes, pos + 8 + len) & 0xffffffffL
        require(crc.getValue == want,
          s"png $ctype chunk crc mismatch at $pos")
      }
      ctype match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          w = getInt(bytes, pos + 8)
          h = getInt(bytes, pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val color = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (bitDepth != 8 || interlace != 0 || color == 3) return None
          ch = channelsOf(color)
          require(w > 0 && h > 0 && w.toLong * h * ch < Int.MaxValue,
            s"bad png geometry ${w}x$h")
          ok = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        // tRNS expands RGB/gray to an alpha'd image in the ImageIO path
        // (the numComponents != numBands redraw in Codecs) — keep that
        // behavior by declining the fast path
        case "tRNS" => return None
        case _ => () // other ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(ok && idat.size > 0, "png missing IHDR/IDAT")

    val stride = w * ch
    // allocation bound against crafted headers: deflate can't expand
    // beyond ~1032:1, so a raster larger than that over the actual IDAT
    // payload is unsatisfiable — reject before allocating gigabytes
    val rawLen = (stride + 1).toLong * h
    require(rawLen < Int.MaxValue - 8 &&
      rawLen <= idat.size.toLong * 1032 + 4096,
      s"png raster $rawLen implausible for ${idat.size}B idat")
    val raw = new Array[Byte](rawLen.toInt)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var n = 0
    while (n < raw.length && !infl.finished()) {
      val k = infl.inflate(raw, n, raw.length - n)
      // 0 with !finished means no forward progress is possible —
      // truncated stream (needsInput) or a forbidden preset dictionary
      // (needsDictionary, FDICT is illegal in PNG); both must throw,
      // not spin
      if (k == 0)
        throw new IllegalArgumentException("png idat stalled " +
          s"(truncated=${infl.needsInput()}, dict=${infl.needsDictionary()})")
      n += k
    }
    infl.end()
    require(n == raw.length, s"png idat short: $n != ${raw.length}")

    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      val prev = dst - stride
      filter match {
        case 0 => System.arraycopy(raw, src, out, dst, stride)
        case 1 => // Sub
          var i = 0
          while (i < stride) {
            val left = if (i >= ch) out(dst + i - ch) & 0xff else 0
            out(dst + i) = ((raw(src + i) & 0xff) + left).toByte
            i += 1
          }
        case 2 => // Up
          var i = 0
          while (i < stride) {
            val up = if (y > 0) out(prev + i) & 0xff else 0
            out(dst + i) = ((raw(src + i) & 0xff) + up).toByte
            i += 1
          }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val left = if (i >= ch) out(dst + i - ch) & 0xff else 0
            val up = if (y > 0) out(prev + i) & 0xff else 0
            out(dst + i) = ((raw(src + i) & 0xff) + ((left + up) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= ch) out(dst + i - ch) & 0xff else 0
            val b = if (y > 0) out(prev + i) & 0xff else 0
            val c = if (i >= ch && y > 0) out(prev + i - ch) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(dst + i) = ((raw(src + i) & 0xff) + pred).toByte
            i += 1
          }
        case f => throw new IllegalArgumentException(s"png filter $f")
      }
      y += 1
    }
    val mode = ch match {
      case 1 => "L"
      case 2 => "C2" // matches decodeImage's n-component naming
      case 3 => "RGB"
      case 4 => "RGBA"
    }
    Some(Codecs.ImageData(h, w, ch, mode, out))
  }

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte], len: Int): Unit = {
    val lenB = new Array[Byte](4)
    putInt(lenB, 0, len)
    out.write(lenB, 0, 4)
    val typeB = ctype.getBytes("US-ASCII")
    out.write(typeB, 0, 4)
    out.write(data, 0, len)
    val crc = new CRC32()
    crc.update(typeB, 0, 4)
    crc.update(data, 0, len)
    val crcB = new Array[Byte](4)
    putInt(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }
}
