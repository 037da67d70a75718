package graft.wds

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM codec for PLAIN-DATA Python pickles — the reference's
  * `pyd`/`pickle` decode rows (`autodecode.py:156-157`:
  * `pickle.loads`) and encode row (`writer.py:148`: `pickle.dumps`),
  * plus the index stage's artifact (`index/check_pair.py:66`:
  * `pickle.dump(list[dict(url, nsamples)])`). The wire format is the
  * public pickle protocol (PEP 307 / PEP 3154 / pickletools); the
  * SCOPE is deliberately the plain-data subset:
  *
  *  - None/bool/int/float/str/bytes/list/tuple/dict/set, protocols
  *    0–5: the 0x80-framed binary forms (FRAME opcodes skipped, memo
  *    honored — shared references decode to shared JVM objects) AND
  *    the protocol-0/1 ASCII opcodes (I/L/F/S/V/p/g — legacy indexes
  *    predating protocol 2 decode too; py2 STRING payloads land as
  *    raw bytes, same as SHORT_BINSTRING);
  *  - OBJECT pickles (GLOBAL/STACK_GLOBAL/REDUCE/NEWOBJ/BUILD/INST/
  *    persistent ids/out-of-band buffers) raise a typed
  *    IllegalArgumentException: reconstructing arbitrary Python
  *    classes has no JVM semantic — the same adjudication as `pth`
  *    (SURVEY §1.3), surfaced loudly instead of mis-decoded.
  *
  * JVM value model matches [[Cbor]]/[[Msgpack]] so samples move
  * across serializations: int → Long (wider LONG1 → BigInt), str →
  * String, bytes → Array[Byte], list → Vector[Any], dict →
  * [[Pickle.Dict]] (order-preserving), plus tuple → [[Pickle.Tup]]
  * and set → [[Pickle.PySet]] (pickle distinguishes them; a
  * round-trip must too).
  *
  * The encoder is canonical and memo-free (plain data needs no
  * shared-reference bookkeeping): PROTO 4, shortest int/str/bytes
  * widths, batched APPENDS/SETITEMS — byte-for-byte deterministic,
  * loadable by any CPython ≥ 3.4.
  */
object Pickle {

  /** Decoded dict: order-preserving, duplicate-tolerant. */
  final case class Dict(pairs: Vector[(Any, Any)])
  /** Python tuple (distinct from list for round-trip fidelity). */
  final case class Tup(items: Vector[Any])
  /** Python set/frozenset (insertion order of the stream). */
  final case class PySet(items: Vector[Any])

  /** Map view of a decoded dict (last duplicate key wins). */
  def toMap(v: Any): Map[Any, Any] = v match {
    case Dict(pairs) => pairs.toMap[Any, Any]
    case other =>
      throw new IllegalArgumentException(s"not a pickle dict: $other")
  }

  // ------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Any =
    decode(new java.io.ByteArrayInputStream(bytes))

  /** Opcodes with a class/object semantic we cannot honor on the JVM. */
  private val ObjectOpcodes: Map[Int, String] = Map(
    'c'.toInt -> "GLOBAL", 0x93 -> "STACK_GLOBAL", 'R'.toInt -> "REDUCE",
    0x81 -> "NEWOBJ", 0x92 -> "NEWOBJ_EX", 'b'.toInt -> "BUILD",
    'i'.toInt -> "INST", 'o'.toInt -> "OBJ", 'P'.toInt -> "PERSID",
    'Q'.toInt -> "BINPERSID", 0x82 -> "EXT1", 0x83 -> "EXT2",
    0x84 -> "EXT4", 0x97 -> "NEXT_BUFFER", 0x98 -> "READONLY_BUFFER")

  // mutable builders during decode (APPENDS/SETITEMS mutate objects
  // the memo may already alias); frozen into immutable values at STOP
  private final class MList {
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
  }
  private final class MDict {
    val buf = new scala.collection.mutable.ArrayBuffer[(Any, Any)]()
  }
  private final class MSet {
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
  }
  private object Mark

  def decode(in: InputStream): Any = {
    def u8(): Int = {
      val b = in.read()
      if (b < 0) throw new EOFException("truncated pickle")
      b
    }
    def bytesN(n: Int): Array[Byte] = {
      if (n < 0) throw new IllegalArgumentException(s"pickle length $n")
      val a = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(a, off, n - off)
        if (r < 0) throw new EOFException("truncated pickle")
        off += r
      }
      a
    }
    def u16le(): Int = u8() | (u8() << 8)
    def i32le(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def u64le(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= u8().toLong << (8 * i); i += 1 }
      v
    }
    def lenN(n: Long): Int = {
      if (n < 0 || n > Int.MaxValue - 8)
        throw new IllegalArgumentException(s"pickle length $n")
      n.toInt
    }
    // ASCII line (protocol-0 opcodes): bytes to '\n', latin-1 chars
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\n') {
        if (c < 0) throw new EOFException("truncated pickle")
        sb.append(c.toChar)
        c = in.read()
      }
      // NO \r strip here: CPython strips only the \n — a V (UNICODE)
      // payload legitimately ending in \r must keep it as data. The
      // NUMERIC consumers trim instead (CPython's int()/float() accept
      // surrounding whitespace, so I123\r\n still parses there).
      sb.toString
    }
    def asciiInt(s0: String): Int = {
      val s = s0.trim // int() whitespace tolerance, see line()
      val v = java.lang.Long.parseLong(s)
      if (v < 0 || v > Int.MaxValue)
        throw new IllegalArgumentException(s"pickle memo index $v")
      v.toInt
    }
    // narrow a decimal literal to Long when it fits (the binary
    // opcodes' value model), BigInt beyond. CPython parses these with
    // int(data, 0) — base-0 accepts 0x/0o/0b prefixes with the matching
    // radix, an all-zero string ('00' is a valid literal), and REJECTS
    // other leading zeros ('010', and '01\r' from a text-mode-mangled
    // bool spelling), so a lenient decimal parse here would silently
    // produce a value where CPython raises. Deliberate remaining
    // narrowing: int(data, 0) also allows '_' digit separators, which
    // no pickler emits — those stay a typed error.
    def decimal(s0: String): Any = {
      val s = s0.trim // int() whitespace tolerance, see line()
      val neg = s.startsWith("-")
      val digits = s.stripPrefix("-").stripPrefix("+")
      val b =
        if (digits.length > 2 && digits.head == '0' &&
            "xXoObB".indexOf(digits.charAt(1).toInt) >= 0) {
          val radix = digits.charAt(1).toLower match {
            case 'x' => 16
            case 'o' => 8
            case _ => 2
          }
          val mag = BigInt(digits.drop(2), radix)
          if (neg) -mag else mag
        } else if (digits.length > 1 && digits.head == '0') {
          if (digits.forall(_ == '0')) BigInt(0)
          else throw new IllegalArgumentException(
            s"pickle INT/LONG: base-0 literal with leading zero: '$s'")
        } else BigInt(s)
      if (b.isValidLong) b.toLong else b
    }
    // codecs.escape_decode: the py2 STRING opcode's payload → bytes
    def escapeDecode(s: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '\\' => out.write('\\'); i += 2
            case '\'' => out.write('\''); i += 2
            case '"' => out.write('"'); i += 2
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'a' => out.write(7); i += 2
            case 'b' => out.write(8); i += 2
            case 'f' => out.write(12); i += 2
            case 'v' => out.write(11); i += 2
            case 'x' =>
              // codecs.escape_decode raises on a truncated \x escape;
              // decoding it as literal bytes would be silent corruption
              if (i + 3 >= s.length ||
                Character.digit(s.charAt(i + 2), 16) < 0 ||
                Character.digit(s.charAt(i + 3), 16) < 0)
                throw new IllegalArgumentException(
                  s"pickle STRING: invalid \\x escape at $i")
              out.write(Integer.parseInt(s.substring(i + 2, i + 4), 16))
              i += 4
            case d if d >= '0' && d <= '7' =>
              var j = i + 1
              while (j < s.length && j < i + 4 &&
                s.charAt(j) >= '0' && s.charAt(j) <= '7') j += 1
              out.write(Integer.parseInt(s.substring(i + 1, j), 8) & 0xff)
              i = j
            case _ => out.write('\\'); i += 1 // unknown escape: literal
          }
        } else { out.write(c.toInt & 0xff); i += 1 }
      }
      out.toByteArray
    }
    // raw-unicode-escape: only \uXXXX / \UXXXXXXXX are special
    def rawUnicodeEscape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 5 < s.length && s.charAt(i + 1) == 'u') {
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 6
        } else if (c == '\\' && i + 9 < s.length && s.charAt(i + 1) == 'U') {
          sb.append(Character.toChars(
            Integer.parseInt(s.substring(i + 2, i + 10), 16)))
          i += 10
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    // little-endian two's-complement signed integer of n bytes
    def long1(n: Int): Any = {
      if (n == 0) return 0L
      val b = bytesN(n)
      if (n <= 8) {
        var v = 0L
        var i = 0
        while (i < n) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
        // sign-extend from the top byte
        val shift = 64 - 8 * n
        if (n < 8) (v << shift) >> shift else v
      } else BigInt(b.reverse) // BigInt wants big-endian
    }

    val stack = new scala.collection.mutable.ArrayBuffer[Any]()
    val memo = new scala.collection.mutable.HashMap[Int, Any]()
    def pop(): Any = {
      if (stack.isEmpty) throw new IllegalArgumentException(
        "pickle stack underflow")
      stack.remove(stack.length - 1)
    }
    def top: Any = {
      if (stack.isEmpty) throw new IllegalArgumentException(
        "pickle stack underflow")
      stack(stack.length - 1)
    }
    /** pop items back to (and including) the last MARK, in order. */
    def popToMark(): Vector[Any] = {
      val m = stack.lastIndexOf(Mark)
      if (m < 0) throw new IllegalArgumentException("pickle MARK missing")
      val items = stack.slice(m + 1, stack.length).toVector
      stack.remove(m, stack.length - m)
      items
    }

    var done = false
    while (!done) {
      val op = u8()
      op match {
        case 0x80 => u8(): Unit // PROTO <version>
        case 0x95 => u64le(): Unit // FRAME <length> — framing is advisory
        case '.' => done = true // STOP
        case '(' => stack += Mark
        case 'N' => stack += null
        case 0x88 => stack += true // NEWTRUE
        case 0x89 => stack += false // NEWFALSE
        // ---- protocol-0 ASCII opcodes (legacy indexes predate proto 2)
        case 'I' => // INT: decimal line; I01/I00 are py2 bool spellings
          line() match {
            case "01" => stack += true
            case "00" => stack += false
            case s => stack += decimal(s)
          }
        case 'L' => // LONG: decimal line with optional trailing 'L'
          val s = line().trim
          stack += decimal(if (s.endsWith("L")) s.dropRight(1) else s)
        case 'F' => // FLOAT: repr line; CPython spells non-finites
          // 'inf'/'-inf'/'nan', which Java's parser rejects
          stack += (line().trim match {
            case "inf" => Double.PositiveInfinity
            case "-inf" => Double.NegativeInfinity
            case "nan" | "-nan" => Double.NaN
            case s => java.lang.Double.parseDouble(s)
          })
        case 'S' => // STRING: repr-quoted py2 byte string → raw bytes
          val s = line()
          if (s.length < 2 || s.head != s.last ||
              (s.head != '\'' && s.head != '"'))
            throw new IllegalArgumentException(
              "pickle STRING opcode: payload not quoted")
          stack += escapeDecode(s.substring(1, s.length - 1))
        case 'V' => stack += rawUnicodeEscape(line()) // UNICODE
        case 'p' => memo(asciiInt(line())) = top // PUT
        case 'g' => // GET
          stack += memo.getOrElse(asciiInt(line()),
            throw new IllegalArgumentException("pickle memo miss"))
        case 'K' => stack += u8().toLong // BININT1
        case 'M' => stack += u16le().toLong // BININT2
        case 'J' => stack += i32le().toLong // BININT
        case 0x8a => stack += long1(u8()) // LONG1
        case 0x8b => stack += long1(lenN(i32le().toLong)) // LONG4
        case 'G' => // BINFLOAT, big-endian f64
          var v = 0L
          var i = 0
          while (i < 8) { v = (v << 8) | u8().toLong; i += 1 }
          stack += java.lang.Double.longBitsToDouble(v)
        case 'X' => stack += new String(bytesN(lenN(i32le().toLong)), UTF_8)
        case 0x8c => stack += new String(bytesN(u8()), UTF_8)
        case 0x8d => stack += new String(bytesN(lenN(u64le())), UTF_8)
        case 'C' => stack += bytesN(u8()) // SHORT_BINBYTES
        case 'B' => stack += bytesN(lenN(i32le().toLong)) // BINBYTES
        case 0x8e => stack += bytesN(lenN(u64le())) // BINBYTES8
        case 0x96 => stack += bytesN(lenN(u64le())) // BYTEARRAY8
        // py2-era byte strings: no reliable text semantic — raw bytes
        case 'U' => stack += bytesN(u8()) // SHORT_BINSTRING
        case 'T' => stack += bytesN(lenN(i32le().toLong)) // BINSTRING
        case ']' => stack += new MList
        case 'l' => // LIST (from mark)
          val items = popToMark()
          val m = new MList; m.buf ++= items; stack += m
        case 'a' => // APPEND
          val v = pop()
          top match {
            case m: MList => m.buf += v: Unit
            case other => throw new IllegalArgumentException(
              s"APPEND onto ${other.getClass.getSimpleName}")
          }
        case 'e' => // APPENDS
          val items = popToMark()
          top match {
            case m: MList => m.buf ++= items: Unit
            case other => throw new IllegalArgumentException(
              s"APPENDS onto ${other.getClass.getSimpleName}")
          }
        case ')' => stack += Tup(Vector.empty)
        case 0x85 => val a = pop(); stack += Tup(Vector(a))
        case 0x86 =>
          val b = pop(); val a = pop(); stack += Tup(Vector(a, b))
        case 0x87 =>
          val c = pop(); val b = pop(); val a = pop()
          stack += Tup(Vector(a, b, c))
        case 't' => stack += Tup(popToMark()) // TUPLE (from mark)
        case '}' => stack += new MDict
        case 'd' => // DICT (from mark)
          val items = popToMark()
          if (items.length % 2 != 0)
            throw new IllegalArgumentException("DICT needs key/value pairs")
          val m = new MDict
          m.buf ++= items.grouped(2).map(p => p(0) -> p(1))
          stack += m
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          top match {
            case m: MDict => m.buf += (k -> v): Unit
            case other => throw new IllegalArgumentException(
              s"SETITEM onto ${other.getClass.getSimpleName}")
          }
        case 'u' => // SETITEMS
          val items = popToMark()
          if (items.length % 2 != 0)
            throw new IllegalArgumentException(
              "SETITEMS needs key/value pairs")
          top match {
            case m: MDict =>
              m.buf ++= items.grouped(2).map(p => p(0) -> p(1)): Unit
            case other => throw new IllegalArgumentException(
              s"SETITEMS onto ${other.getClass.getSimpleName}")
          }
        case 0x8f => stack += new MSet // EMPTY_SET
        case 0x90 => // ADDITEMS
          val items = popToMark()
          top match {
            case m: MSet => m.buf ++= items: Unit
            case other => throw new IllegalArgumentException(
              s"ADDITEMS onto ${other.getClass.getSimpleName}")
          }
        case 0x91 => // FROZENSET (from mark)
          val m = new MSet; m.buf ++= popToMark(); stack += m
        case 'q' => memo(u8()) = top // BINPUT
        case 'r' => memo(lenN(i32le().toLong)) = top // LONG_BINPUT
        case 0x94 => memo(memo.size) = top // MEMOIZE
        case 'h' => // BINGET
          stack += memo.getOrElse(u8(), throw new IllegalArgumentException(
            "pickle memo miss"))
        case 'j' => // LONG_BINGET
          stack += memo.getOrElse(lenN(i32le().toLong),
            throw new IllegalArgumentException("pickle memo miss"))
        case '0' => pop(): Unit // POP
        case '1' => popToMark(): Unit // POP_MARK
        case '2' => stack += top // DUP
        case other if ObjectOpcodes.contains(other) =>
          throw new IllegalArgumentException(
            s"pickle opcode ${ObjectOpcodes(other)}: object/class " +
              "pickles have no JVM semantic (the pth adjudication) — " +
              "only plain-data pickles decode")
        case other =>
          throw new IllegalArgumentException(
            f"unsupported pickle opcode 0x$other%02x")
      }
    }
    if (stack.length != 1)
      throw new IllegalArgumentException(
        s"pickle ended with ${stack.length} stack items")
    freeze(pop())
  }

  /** Builders → immutable values; identity-tracked so SHARED
    * references freeze once (to the same JVM object) and
    * self-reference fails loudly (an immutable value cannot contain
    * itself). */
  private def freeze(v: Any): Any = {
    val doneMap = new java.util.IdentityHashMap[AnyRef, Any]()
    val inProgress = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def enter(m: AnyRef): Unit =
      if (!inProgress.add(m))
        throw new IllegalArgumentException(
          "self-referential pickle container")
    def cachedOr(m: AnyRef)(build: => Any): Any = {
      val cached = doneMap.get(m)
      if (cached != null) cached
      else {
        enter(m)
        val out = build
        inProgress.remove(m): Unit
        doneMap.put(m, out): Unit
        out
      }
    }
    def go(x: Any): Any = x match {
      case m: MList => cachedOr(m)(m.buf.map(go).toVector)
      case m: MDict => cachedOr(m)(
        Dict(m.buf.map { case (k, vv) => (go(k), go(vv)) }.toVector))
      case m: MSet => cachedOr(m)(PySet(m.buf.map(go).toVector))
      case Tup(items) => Tup(items.map(go))
      case other => other
    }
    go(v)
  }

  // ------------------------------------------------------------- encode

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x80); out.write(4) // PROTO 4 (no frames — advisory)
    writeValue(out, v)
    out.write('.')
    out.toByteArray
  }

  private def writeValue(out: ByteArrayOutputStream, v: Any): Unit =
    v match {
      case null => out.write('N')
      case b: Boolean => out.write(if (b) 0x88 else 0x89)
      case i: Int => writeLong(out, i.toLong)
      case l: Long => writeLong(out, l)
      case b: Byte => writeLong(out, b.toLong)
      case s: Short => writeLong(out, s.toLong)
      case b: BigInt => writeBig(out, b)
      case f: Float => writeValue(out, f.toDouble)
      case d: Double =>
        out.write('G')
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      case s: String =>
        val b = s.getBytes(UTF_8)
        if (b.length < 256) { out.write(0x8c); out.write(b.length) }
        else { out.write('X'); writeI32(out, b.length) }
        out.write(b)
      case b: Array[Byte] =>
        if (b.length < 256) { out.write('C'); out.write(b.length) }
        else { out.write('B'); writeI32(out, b.length) }
        out.write(b)
      case Tup(items) =>
        items.length match {
          case 0 => out.write(')')
          case n if n <= 3 =>
            items.foreach(writeValue(out, _))
            out.write(0x84 + n)
          case _ =>
            out.write('(')
            items.foreach(writeValue(out, _))
            out.write('t')
        }
      case Dict(pairs) =>
        out.write('}')
        if (pairs.nonEmpty) {
          out.write('(')
          pairs.foreach { case (k, vv) =>
            writeValue(out, k); writeValue(out, vv)
          }
          out.write('u')
        }
      case m: Map[_, _] =>
        writeValue(out, Dict(m.toVector.asInstanceOf[Vector[(Any, Any)]]))
      case PySet(items) =>
        out.write(0x8f)
        if (items.nonEmpty) {
          out.write('(')
          items.foreach(writeValue(out, _))
          out.write(0x90)
        }
      case xs: Seq[_] =>
        out.write(']')
        if (xs.nonEmpty) {
          out.write('(')
          xs.foreach(writeValue(out, _))
          out.write('e')
        }
      case other =>
        throw new IllegalArgumentException(
          s"pickle encode: unsupported ${other.getClass.getName} " +
            "(plain data only)")
    }

  private def writeI32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeLong(out: ByteArrayOutputStream, l: Long): Unit =
    if (l >= 0 && l < 256) { out.write('K'); out.write(l.toInt) }
    else if (l >= 0 && l < 65536) {
      out.write('M'); out.write((l & 0xff).toInt); out.write((l >> 8).toInt)
    } else if (l >= Int.MinValue && l <= Int.MaxValue) {
      out.write('J'); writeI32(out, l.toInt)
    } else writeBig(out, BigInt(l))

  private def writeBig(out: ByteArrayOutputStream, b: BigInt): Unit = {
    // LONG1 (1-byte length) up to 255 bytes, LONG4 (i32 length) beyond —
    // CPython's own switchover (pickle.py save_long); a single
    // truncated length byte would emit a silently corrupt pickle
    val be = b.toByteArray // big-endian two's complement, minimal
    if (be.length <= 255) { out.write(0x8a); out.write(be.length) }
    else { out.write(0x8b); writeI32(out, be.length) }
    var i = be.length - 1
    while (i >= 0) { out.write(be(i)); i -= 1 }
  }
}
