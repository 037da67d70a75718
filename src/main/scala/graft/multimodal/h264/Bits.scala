package graft.multimodal.h264

/** Bit-level I/O for H.264 RBSP payloads: MSB-first bit reading/writing,
  * Exp-Golomb codes (ue/se, spec 9.1), and the NAL
  * emulation-prevention-byte transform (spec 7.3.1 / 7.4.1.1) between
  * RBSP and the on-wire EBSP form. Shared by the baseline I-frame
  * decoder and the fixture-grade encoder; the reference pipeline gets
  * these for free from decord/ffmpeg (`pack/dataset.py:102-122`).
  */
final class BitReader(data: Array[Byte]) {
  private var bytePos = 0
  private var bitPos = 0 // 0..7, MSB first

  def position: Int = bytePos * 8 + bitPos

  def remaining: Int = data.length * 8 - position

  def u1(): Int = {
    require(bytePos < data.length, s"bit read past end at $position")
    val b = (data(bytePos) >> (7 - bitPos)) & 1
    bitPos += 1
    if (bitPos == 8) { bitPos = 0; bytePos += 1 }
    b
  }

  def u(n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | u1(); i += 1 }
    v
  }

  /** ue(v), spec 9.1: count leading zeros, then read that many bits. */
  def ue(): Int = {
    var zeros = 0
    while (u1() == 0) {
      zeros += 1
      require(zeros <= 31, "ue(v) prefix too long (corrupt stream)")
    }
    (1 << zeros) - 1 + u(zeros)
  }

  /** se(v), spec 9.1.1: codeNum k maps to (-1)^(k+1) * ceil(k/2). */
  def se(): Int = {
    val k = ue()
    if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
  }

  def byteAligned: Boolean = bitPos == 0

  def alignToByte(): Unit = while (bitPos != 0) { u1(); () }

  /** whole aligned bytes (I_PCM sample payloads) */
  def bytes(n: Int): Array[Byte] = {
    require(byteAligned, "byte read while not aligned")
    require(bytePos + n <= data.length, "byte read past end")
    val out = java.util.Arrays.copyOfRange(data, bytePos, bytePos + n)
    bytePos += n
    out
  }

  /** more_rbsp_data(): true iff bits remain before the rbsp_stop_one_bit
    * (the last 1 bit in the payload, spec 7.4.1). */
  def moreRbspData(): Boolean = {
    if (remaining <= 0) return false
    // find last set bit in the stream
    var lastByte = data.length - 1
    while (lastByte >= 0 && data(lastByte) == 0) lastByte -= 1
    if (lastByte < 0) return false
    var lastBit = 7
    while (((data(lastByte) >> (7 - lastBit)) & 1) == 0) lastBit -= 1
    position < lastByte * 8 + lastBit
  }
}

final class BitWriter {
  private val buf = new java.io.ByteArrayOutputStream()
  private var cur = 0
  private var nBits = 0

  def u1(b: Int): Unit = {
    cur = (cur << 1) | (b & 1)
    nBits += 1
    if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
  }

  def u(n: Int, v: Int): Unit = {
    var i = n - 1
    while (i >= 0) { u1((v >> i) & 1); i -= 1 }
  }

  def ue(v: Int): Unit = {
    require(v >= 0)
    val codeNum = v + 1
    val len = 32 - Integer.numberOfLeadingZeros(codeNum)
    u(len - 1, 0)
    u(len, codeNum)
  }

  def se(v: Int): Unit =
    ue(if (v > 0) 2 * v - 1 else -2 * v)

  def byteAligned: Boolean = nBits == 0

  def alignZero(): Unit = while (nBits != 0) u1(0)

  def bytes(b: Array[Byte]): Unit = {
    require(byteAligned, "byte write while not aligned")
    buf.write(b)
  }

  /** close the RBSP: rbsp_stop_one_bit + zero padding to byte boundary */
  def rbspTrailing(): Unit = { u1(1); alignZero() }

  def toBytes: Array[Byte] = {
    require(byteAligned, "unflushed bits (missing rbspTrailing?)")
    buf.toByteArray
  }
}

object Nal {
  /** RBSP → EBSP: insert emulation_prevention_three_byte after any
    * 0x00 0x00 followed by 0x00/0x01/0x02/0x03 (spec 7.4.1.1). */
  def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** EBSP → RBSP: strip emulation-prevention bytes. */
  def unescape(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ebsp.length)
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val b = ebsp(i) & 0xff
      if (zeros >= 2 && b == 3 && i + 1 < ebsp.length &&
        (ebsp(i + 1) & 0xff) <= 3) {
        zeros = 0 // skip the emulation-prevention byte
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** one on-wire NAL unit: header byte (forbidden 0, ref idc, type) +
    * escaped payload */
  def unit(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] = {
    val header = ((refIdc & 3) << 5) | (nalType & 0x1f)
    Array(header.toByte) ++ escape(rbsp)
  }

  /** split an AVCC sample (length-prefixed NALs) into
    * (type, refIdc, rbsp) */
  def splitAvccSample(sample: Array[Byte], lengthSize: Int)
      : Seq[(Int, Int, Array[Byte])] = {
    require(lengthSize >= 1 && lengthSize <= 4, s"bad NAL length size $lengthSize")
    val out = Seq.newBuilder[(Int, Int, Array[Byte])]
    var i = 0
    while (i + lengthSize <= sample.length) {
      var len = 0L
      var j = 0
      while (j < lengthSize) { len = (len << 8) | (sample(i + j) & 0xff); j += 1 }
      i += lengthSize
      require(len >= 1 && i + len <= sample.length,
        s"NAL length $len beyond sample ${sample.length} at $i")
      val nal = java.util.Arrays.copyOfRange(sample, i, i + len.toInt)
      out += (((nal(0) & 0x1f), (nal(0) >> 5) & 3,
        unescape(java.util.Arrays.copyOfRange(nal, 1, nal.length))))
      i += len.toInt
    }
    out.result()
  }
}
