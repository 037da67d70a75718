package graft.wds

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM MessagePack codec — the reference's `mp`/`msg` decode rows
  * (`webdataset-private/webdataset/autodecode.py:158-159`:
  * `msgpack.unpackb`) and encode row (`writer.py:129-132`:
  * `msgpack.packb`). The wire format is the public msgpack spec; the
  * value model matches [[Cbor]]'s JVM mapping so samples move between
  * the two serializations losslessly:
  *
  *  - int family → Long (uint64 above Long range → BigInt)
  *  - str → String, bin → Array[Byte]
  *  - array → Vector[Any], map → [[Msgpack.MsgMap]] (order-preserving;
  *    [[Msgpack.toMap]] for Map views)
  *  - nil → null, bool → Boolean, float32/64 → Double
  *  - ext → [[Msgpack.Ext]] (type byte + payload, opaque)
  *
  * The encoder is canonical: shortest width for every int/str/bin/
  * container header, floats as float64 (msgpack-python's default).
  */
object Msgpack {

  /** Decoded map: order-preserving, duplicate-tolerant. */
  final case class MsgMap(pairs: Vector[(Any, Any)])

  /** Extension value: application type byte + opaque payload. */
  final case class Ext(extType: Byte, data: Array[Byte])

  /** Map view of a decoded map value (last duplicate key wins). */
  def toMap(v: Any): Map[Any, Any] = v match {
    case MsgMap(pairs) => pairs.toMap[Any, Any]
    case other =>
      throw new IllegalArgumentException(s"not a msgpack map: $other")
  }

  // ------------------------------------------------------------- decode

  /** Clean end-of-stream BEFORE any byte of an item. */
  final class EndOfStream extends EOFException("end of msgpack stream")

  def decode(in: InputStream): Any = {
    val b = in.read()
    if (b < 0) throw new EndOfStream
    decodeItem(in, b)
  }

  /** All consecutive top-level items until clean EOF (msgpack streams
    * concatenate items back-to-back, like CBOR sequences). */
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

  /** One item, whole buffer: trailing bytes after the item are the
    * reference `msgpack.unpackb` ExtraData condition — corruption (a
    * mis-concatenated or half-overwritten entry) that must surface as
    * a typed failure for the handler policy, not decode silently to a
    * partial value. Multi-item streams use [[decodeAll]]. */
  def decode(bytes: Array[Byte]): Any = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val v = decode(in)
    if (in.read() >= 0)
      throw new IllegalArgumentException(
        s"trailing bytes after msgpack item (${in.available() + 1} left)")
    v
  }

  private def req(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("truncated msgpack item")
    b
  }

  private def readN(in: InputStream, n: Int, what: String): Array[Byte] = {
    // bounded chunks: a corrupt header claiming GBs must fail on the
    // short stream, not pre-allocate and OOM (Cbor.readFully's law)
    require(n >= 0, s"$what length $n")
    val ChunkCap = 1 << 20
    val out = new ByteArrayOutputStream(math.min(n, ChunkCap))
    val buf = new Array[Byte](math.min(math.max(n, 1), ChunkCap))
    var off = 0
    while (off < n) {
      val r = in.read(buf, 0, math.min(buf.length, n - off))
      if (r < 0) throw new EOFException(s"truncated $what ($off/$n)")
      out.write(buf, 0, r)
      off += r
    }
    out.toByteArray
  }

  private def u16(in: InputStream): Int = (req(in) << 8) | req(in)
  private def u32(in: InputStream): Long =
    ((req(in).toLong << 24) | (req(in) << 16) | (req(in) << 8) |
      req(in)) & 0xffffffffL
  private def i64(in: InputStream): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | req(in); i += 1 }
    v
  }

  private def len32(in: InputStream, what: String): Int = {
    val n = u32(in)
    require(n <= Int.MaxValue - 8, s"$what length $n")
    n.toInt
  }

  /** Nested decode: EOF at a nested item's head byte is a TRUNCATED
    * container (plain EOFException), never the clean [[EndOfStream]] —
    * otherwise decodeAll would read a cut-off shard as a shorter but
    * clean one. */
  private def decodeNested(in: InputStream): Any = decodeItem(in, req(in))

  private def arrayOf(in: InputStream, n: Int): Vector[Any] =
    Vector.fill(n)(decodeNested(in))
  private def mapOf(in: InputStream, n: Int): MsgMap =
    MsgMap(Vector.fill(n)((decodeNested(in), decodeNested(in))))
  private def str(in: InputStream, n: Int): String =
    new String(readN(in, n, "str"), UTF_8)
  private def ext(in: InputStream, n: Int): Ext = {
    val t = req(in).toByte
    Ext(t, readN(in, n, "ext"))
  }

  private def decodeItem(in: InputStream, head: Int): Any = head match {
    case b if b <= 0x7f => b.toLong // positive fixint
    case b if b >= 0xe0 => (b - 256).toLong // negative fixint
    case b if (b & 0xf0) == 0x80 => mapOf(in, b & 0x0f) // fixmap
    case b if (b & 0xf0) == 0x90 => arrayOf(in, b & 0x0f) // fixarray
    case b if (b & 0xe0) == 0xa0 => str(in, b & 0x1f) // fixstr
    case 0xc0 => null
    case 0xc1 =>
      throw new IllegalArgumentException("reserved msgpack byte 0xc1")
    case 0xc2 => false
    case 0xc3 => true
    case 0xc4 => readN(in, req(in), "bin") // bin8
    case 0xc5 => readN(in, u16(in), "bin") // bin16
    case 0xc6 => readN(in, len32(in, "bin"), "bin") // bin32
    case 0xc7 => ext(in, req(in)) // ext8
    case 0xc8 => ext(in, u16(in)) // ext16
    case 0xc9 => ext(in, len32(in, "ext")) // ext32
    case 0xca => // float32
      java.lang.Float.intBitsToFloat(u32(in).toInt).toDouble
    case 0xcb => java.lang.Double.longBitsToDouble(i64(in)) // float64
    case 0xcc => req(in).toLong // uint8
    case 0xcd => u16(in).toLong // uint16
    case 0xce => u32(in) // uint32
    case 0xcf => // uint64: above Long range → BigInt, like Cbor major 0
      val v = i64(in)
      if (v >= 0) v else BigInt(java.lang.Long.toUnsignedString(v))
    case 0xd0 => req(in).toByte.toLong // int8
    case 0xd1 => u16(in).toShort.toLong // int16
    case 0xd2 => u32(in).toInt.toLong // int32
    case 0xd3 => i64(in) // int64
    case 0xd4 => ext(in, 1) // fixext1
    case 0xd5 => ext(in, 2)
    case 0xd6 => ext(in, 4)
    case 0xd7 => ext(in, 8)
    case 0xd8 => ext(in, 16)
    case 0xd9 => str(in, req(in)) // str8
    case 0xda => str(in, u16(in)) // str16
    case 0xdb => str(in, len32(in, "str")) // str32
    case 0xdc => arrayOf(in, u16(in)) // array16
    case 0xdd => arrayOf(in, len32(in, "array")) // array32
    case 0xde => mapOf(in, u16(in)) // map16
    case 0xdf => mapOf(in, len32(in, "map")) // map32
    case other =>
      throw new IllegalArgumentException(f"msgpack head byte $other%02x")
  }

  // ------------------------------------------------------------- encode

  def encode(v: Any, out: OutputStream): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case i: Int => encodeLong(i.toLong, out)
    case s: Short => encodeLong(s.toLong, out)
    case b: Byte => encodeLong(b.toLong, out)
    case l: Long => encodeLong(l, out)
    case bi: BigInt =>
      val u64Max = (BigInt(1) << 64) - 1
      if (bi >= Long.MinValue && bi <= Long.MaxValue)
        encodeLong(bi.toLong, out)
      else if (bi > Long.MaxValue && bi <= u64Max) {
        out.write(0xcf); w64(out, bi.longValue)
      } else throw new IllegalArgumentException(s"bigint $bi out of range")
    case f: Float =>
      out.write(0xca)
      w32(out, java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
    case d: Double =>
      out.write(0xcb); w64(out, java.lang.Double.doubleToLongBits(d))
    case s: String =>
      val b = s.getBytes(UTF_8)
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xda); w16(out, b.length) }
      else { out.write(0xdb); w32(out, b.length.toLong) }
      out.write(b)
    case b: Array[Byte] =>
      if (b.length < 256) { out.write(0xc4); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xc5); w16(out, b.length) }
      else { out.write(0xc6); w32(out, b.length.toLong) }
      out.write(b)
    case Ext(t, data) =>
      data.length match {
        case 1 => out.write(0xd4)
        case 2 => out.write(0xd5)
        case 4 => out.write(0xd6)
        case 8 => out.write(0xd7)
        case 16 => out.write(0xd8)
        case n if n < 256 => out.write(0xc7); out.write(n)
        case n if n < 65536 => out.write(0xc8); w16(out, n)
        case n => out.write(0xc9); w32(out, n.toLong)
      }
      out.write(t.toInt)
      out.write(data)
    case MsgMap(pairs) =>
      if (pairs.length < 16) out.write(0x80 | pairs.length)
      else if (pairs.length < 65536) { out.write(0xde); w16(out, pairs.length) }
      else { out.write(0xdf); w32(out, pairs.length.toLong) }
      pairs.foreach { case (k, x) => encode(k, out); encode(x, out) }
    case m: Map[_, _] => encode(MsgMap(
      m.iterator.map { case (k, x) => (k: Any, x: Any) }.toVector), out)
    case seq: Seq[_] =>
      if (seq.length < 16) out.write(0x90 | seq.length)
      else if (seq.length < 65536) { out.write(0xdc); w16(out, seq.length) }
      else { out.write(0xdd); w32(out, seq.length.toLong) }
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

  private def encodeLong(l: Long, out: OutputStream): Unit = {
    if (l >= 0) {
      if (l < 128) out.write(l.toInt)
      else if (l < 256) { out.write(0xcc); out.write(l.toInt) }
      else if (l < 65536) { out.write(0xcd); w16(out, l.toInt) }
      else if (l <= 0xffffffffL) { out.write(0xce); w32(out, l) }
      else { out.write(0xcf); w64(out, l) }
    } else {
      if (l >= -32) out.write((l & 0xff).toInt)
      else if (l >= -128) { out.write(0xd0); out.write((l & 0xff).toInt) }
      else if (l >= -32768) { out.write(0xd1); w16(out, (l & 0xffff).toInt) }
      else if (l >= Int.MinValue.toLong) {
        out.write(0xd2); w32(out, l & 0xffffffffL)
      } else { out.write(0xd3); w64(out, l) }
    }
  }

  private def w16(out: OutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def w32(out: OutputStream, v: Long): Unit = {
    var i = 24
    while (i >= 0) { out.write(((v >> i) & 0xff).toInt); i -= 8 }
  }
  private def w64(out: OutputStream, v: Long): Unit = {
    var i = 56
    while (i >= 0) { out.write(((v >> i) & 0xff).toInt); i -= 8 }
  }
}
