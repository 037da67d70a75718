package graft.wds

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM CBOR codec (RFC 8949) — the S13 source's wire format
  * (reference `webdataset-private/webdataset/cborsiterators.py:6-51`
  * just `cbor.load`s a stream until EOF; the format itself is the
  * public RFC). Decodes to plain JVM values:
  *
  *  - uint/negint → Long (BigInt when outside Long range)
  *  - byte string → Array[Byte], text string → String
  *  - array → Vector[Any], map → [[Cbor.CborMap]] (order-preserving
  *    pair vector; use [[Cbor.toMap]] for Map views)
  *  - false/true/null/undefined → Boolean / null
  *  - half/single/double floats → Double
  *  - tags are transparent (value decoded, tag number dropped) — the
  *    sample-stream use case has no tag semantics
  *
  * Indefinite-length strings/arrays/maps (streaming encoders emit
  * them) are supported. The encoder emits canonical definite lengths.
  */
object Cbor {

  /** Decoded map: order-preserving, duplicate-tolerant (a bare
    * Vector[(k,v)] would be ambiguous with an array of pairs when
    * re-encoding). */
  final case class CborMap(pairs: Vector[(Any, Any)])

  // ------------------------------------------------------------- decode

  /** Clean end-of-stream BEFORE any byte of an item — distinct from a
    * truncated-mid-item EOFException, which decodeAll must NOT swallow
    * (a corrupt shard is an error, not a short one). */
  final class EndOfStream extends EOFException("end of CBOR stream")

  /** Decode one item; throws [[EndOfStream]] at clean end-of-stream
    * BEFORE any byte of an item (the `cbor.load`-until-EOF contract). */
  def decode(in: InputStream): Any = {
    val b = in.read()
    if (b < 0) throw new EndOfStream
    decodeItem(in, b)
  }

  /** All consecutive top-level items until clean EOF. */
  def decodeAll(in: InputStream): Iterator[Any] = new Iterator[Any] {
    private var nextItem: Option[Any] = advance()
    private def advance(): Option[Any] =
      try Some(decode(in)) catch { case _: EndOfStream => None }
    def hasNext: Boolean = nextItem.isDefined
    def next(): Any = {
      val v = nextItem.getOrElse(throw new NoSuchElementException)
      nextItem = advance()
      v
    }
  }

  /** One item, whole buffer: trailing bytes after the item are
    * corruption (the msgpack ExtraData condition, same rationale as
    * [[Msgpack.decode]]) — fail typed for the handler policy instead
    * of silently decoding a partial value. Shard streams that
    * legitimately concatenate items use the stream form in a loop
    * ([[graft.wds.CborReader]]). */
  def decode(bytes: Array[Byte]): Any = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val v = decode(in)
    if (in.read() >= 0)
      throw new IllegalArgumentException(
        s"trailing bytes after CBOR item (${in.available() + 1} left)")
    v
  }

  /** Map view of a decoded map value (last duplicate key wins). */
  def toMap(v: Any): Map[Any, Any] = v match {
    case CborMap(pairs) => pairs.toMap[Any, Any]
    case other =>
      throw new IllegalArgumentException(s"not a CBOR map: $other")
  }

  private val Break = new Object

  /** Reads n bytes in bounded chunks: a corrupt header claiming a
    * multi-GB string must raise a handleable EOFException when the
    * stream runs short, not pre-allocate the full claimed size and OOM
    * the executor. */
  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val ChunkCap = 1 << 20
    val out = new ByteArrayOutputStream(math.min(n, ChunkCap))
    val buf = new Array[Byte](math.min(n, ChunkCap))
    var off = 0
    while (off < n) {
      val r = in.read(buf, 0, math.min(buf.length, n - off))
      if (r < 0) throw new EOFException(s"truncated CBOR item ($off/$n)")
      out.write(buf, 0, r)
      off += r
    }
    out.toByteArray
  }

  private def req(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("truncated CBOR item")
    b
  }

  /** additional-info argument; -1 encodes the indefinite marker */
  private def arg(in: InputStream, ai: Int): Long = ai match {
    case a if a < 24 => a.toLong
    case 24 => req(in).toLong
    case 25 => ((req(in) << 8) | req(in)).toLong
    case 26 =>
      ((req(in).toLong << 24) | (req(in) << 16) | (req(in) << 8) |
        req(in)) & 0xffffffffL
    case 27 =>
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | req(in); i += 1 }
      v
    case 31 => -1L
    case other =>
      throw new IllegalArgumentException(s"reserved additional info $other")
  }

  private def lenArg(in: InputStream, ai: Int, what: String): Int = {
    val n = arg(in, ai)
    require(n >= 0 && n <= Int.MaxValue - 8, s"$what length $n")
    n.toInt
  }

  private def decodeItem(in: InputStream, head: Int): Any = {
    val major = head >> 5
    val ai = head & 0x1f
    major match {
      case 0 =>
        val v = arg(in, ai)
        if (v >= 0) v else BigInt(java.lang.Long.toUnsignedString(v))
      case 1 =>
        val v = arg(in, ai)
        if (v >= 0) -1L - v
        else BigInt(-1) - BigInt(java.lang.Long.toUnsignedString(v))
      case 2 => // byte string
        if (ai == 31) { // indefinite: concat definite chunks
          val out = new ByteArrayOutputStream()
          var h = req(in)
          while (h != 0xff) {
            require(h >> 5 == 2, "indefinite bstr chunk must be bstr")
            out.write(readFully(in, lenArg(in, h & 0x1f, "bstr")))
            h = req(in)
          }
          out.toByteArray
        } else readFully(in, lenArg(in, ai, "bstr"))
      case 3 => // text string
        if (ai == 31) {
          val sb = new java.lang.StringBuilder
          var h = req(in)
          while (h != 0xff) {
            require(h >> 5 == 3, "indefinite tstr chunk must be tstr")
            sb.append(new String(
              readFully(in, lenArg(in, h & 0x1f, "tstr")), UTF_8))
            h = req(in)
          }
          sb.toString
        } else new String(readFully(in, lenArg(in, ai, "tstr")), UTF_8)
      case 4 => // array
        if (ai == 31) {
          val out = Vector.newBuilder[Any]
          var v = decodeOrBreak(in)
          while (v.asInstanceOf[AnyRef] ne Break) {
            out += v; v = decodeOrBreak(in)
          }
          out.result()
        } else Vector.fill(lenArg(in, ai, "array"))(decodeNested(in))
      case 5 => // map → order-preserving pair vector
        if (ai == 31) {
          val out = Vector.newBuilder[(Any, Any)]
          var k = decodeOrBreak(in)
          while (k.asInstanceOf[AnyRef] ne Break) {
            out += (k -> decodeNested(in)); k = decodeOrBreak(in)
          }
          CborMap(out.result())
        } else CborMap(Vector.fill(lenArg(in, ai, "map"))(
          (decodeNested(in), decodeNested(in))))
      case 6 => // tag: transparent
        arg(in, ai)
        decodeNested(in)
      case 7 =>
        ai match {
          case 20 => false
          case 21 => true
          case 22 | 23 => null
          case 24 => req(in); null // reserved simple value: opaque
          case 25 => halfToDouble(((req(in) << 8) | req(in)).toChar)
          case 26 =>
            java.lang.Float.intBitsToFloat(
              ((req(in) << 24) | (req(in) << 16) | (req(in) << 8) |
                req(in))).toDouble
          case 27 =>
            var v = 0L
            var i = 0
            while (i < 8) { v = (v << 8) | req(in); i += 1 }
            java.lang.Double.longBitsToDouble(v)
          case a if a < 20 => a.toLong // unassigned simple values
          case 31 =>
            throw new IllegalArgumentException("unexpected break (0xff)")
          case other =>
            throw new IllegalArgumentException(s"simple/float ai $other")
        }
    }
  }

  /** Nested decode: EOF at a nested item's head byte is a TRUNCATED
    * container (plain EOFException), never the clean [[EndOfStream]] —
    * otherwise decodeAll would read a cut-off shard as a shorter but
    * clean one. */
  private def decodeNested(in: InputStream): Any = decodeItem(in, req(in))

  private def decodeOrBreak(in: InputStream): Any = {
    val b = req(in)
    if (b == 0xff) Break else decodeItem(in, b)
  }

  private def halfToDouble(h: Char): Double = {
    val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    if (exp == 0) sign * frac * math.pow(2, -24)
    else if (exp == 31) {
      if (frac == 0) sign * Double.PositiveInfinity else Double.NaN
    } else sign * (1024 + frac) * math.pow(2, exp - 25)
  }

  // ------------------------------------------------------------- encode

  /** Canonical-ish encoder (definite lengths, shortest int widths) for
    * fixtures, tests, and sample export. */
  def encode(v: Any, out: OutputStream): Unit = v match {
    case null => out.write(0xf6)
    case b: Boolean => out.write(if (b) 0xf5 else 0xf4)
    case i: Int => encode(i.toLong, out)
    case l: Long =>
      if (l >= 0) head(out, 0, l)
      else head(out, 1, -1L - l)
    case bi: BigInt =>
      // full CBOR 64-bit integer range: decode can yield BigInts in
      // (2^63, 2^64) (major 0) and [-2^64, -2^63) (major 1); re-encode
      // them with the raw unsigned argument so toSample round-trips
      // every spec-valid shard value
      val u64Max = (BigInt(1) << 64) - 1
      if (bi >= 0 && bi <= Long.MaxValue) encode(bi.toLong, out)
      else if (bi < 0 && bi >= Long.MinValue) encode(bi.toLong, out)
      else if (bi > Long.MaxValue && bi <= u64Max)
        head(out, 0, bi.longValue) // raw low 64 bits, written unsigned
      else if (bi < Long.MinValue && bi >= -(BigInt(1) << 64))
        head(out, 1, (-bi - 1).longValue)
      else throw new IllegalArgumentException(s"bigint $bi out of range")
    case d: Double =>
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 56
      while (i >= 0) { out.write(((bits >> i) & 0xff).toInt); i -= 8 }
    case f: Float => encode(f.toDouble, out)
    case s: String =>
      val b = s.getBytes(UTF_8)
      head(out, 3, b.length.toLong); out.write(b)
    case b: Array[Byte] =>
      head(out, 2, b.length.toLong); out.write(b)
    case CborMap(pairs) =>
      head(out, 5, pairs.length.toLong)
      pairs.foreach { case (k, x) => encode(k, out); encode(x, out) }
    case m: Map[_, _] =>
      head(out, 5, m.size.toLong)
      m.foreach { case (k, x) => encode(k, out); encode(x, out) }
    case seq: Seq[_] =>
      head(out, 4, seq.length.toLong)
      seq.foreach(encode(_, out))
    case other =>
      throw new IllegalArgumentException(
        s"cannot encode ${other.getClass.getName}")
  }

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    encode(v, out)
    out.toByteArray
  }

  /** `value` is the UNSIGNED 64-bit argument (negative longs = raw
    * bits above 2^63, always written in the 8-byte form). */
  private def head(out: OutputStream, major: Int, value: Long): Unit = {
    val m = major << 5
    if (value >= 0 && value < 24) out.write(m | value.toInt)
    else if (value >= 0 && value < 256) {
      out.write(m | 24); out.write(value.toInt)
    } else if (value >= 0 && value < 65536) {
      out.write(m | 25)
      out.write((value >> 8).toInt); out.write((value & 0xff).toInt)
    } else if (value >= 0 && value <= 0xffffffffL) {
      out.write(m | 26)
      var i = 24
      while (i >= 0) { out.write(((value >> i) & 0xff).toInt); i -= 8 }
    } else {
      out.write(m | 27)
      var i = 56
      while (i >= 0) { out.write(((value >> i) & 0xff).toInt); i -= 8 }
    }
  }
}
