package graft.wds

import org.scalatest.funsuite.AnyFunSuite

/** Plain-data pickle codec: CPython-conformance fixtures (bytes
  * produced by CPython `pickle.dumps` at protocols 2–5, embedded as
  * hex), encode∘decode laws, shared-reference memo behavior, and the
  * typed object-pickle rejection. CPython loading OUR encoder's bytes
  * was validated out-of-band (driver python, round 13); in-JVM the
  * encoder is pinned by decode∘encode = id plus the canonical-bytes
  * check against a CPython-loadable dump. */
class PickleSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** structural equality with Array[Byte] by value */
  private def norm(v: Any): Any = v match {
    case a: Array[Byte] => a.toVector
    case Pickle.Dict(ps) =>
      Pickle.Dict(ps.map { case (k, x) => (norm(k), norm(x)) })
    case Pickle.Tup(xs) => Pickle.Tup(xs.map(norm))
    case Pickle.PySet(xs) => Pickle.PySet(xs.map(norm))
    case xs: Vector[_] => xs.map(norm)
    case other => other
  }

  // CPython pickle.dumps fixtures (see scaladoc)
  private val IndexByProto = Map(
    2 -> "80025d7100287d710128580300000075726c7102581600000066696c653a2f646174612f73686172642d302e746172710358080000006e73616d706c657371044d9c01757d7105286802581600000066696c653a2f646174612f73686172642d312e746172710668044d8d0175652e",
    3 -> "80035d7100287d710128580300000075726c7102581600000066696c653a2f646174612f73686172642d302e746172710358080000006e73616d706c657371044d9c01757d7105286802581600000066696c653a2f646174612f73686172642d312e746172710668044d8d0175652e",
    4 -> "8004955a000000000000005d94287d94288c0375726c948c1666696c653a2f646174612f73686172642d302e746172948c086e73616d706c6573944d9c01757d942868028c1666696c653a2f646174612f73686172642d312e7461729468044d8d0175652e",
    5 -> "8005955a000000000000005d94287d94288c0375726c948c1666696c653a2f646174612f73686172642d302e746172948c086e73616d706c6573944d9c01757d942868028c1666696c653a2f646174612f73686172642d312e7461729468044d8d0175652e")

  private val NestedP4 =
    "8004955e000000000000007d94288c0161945d94284b014740040000000000008c037472659443020001944e8889658c0174944b018c0374776f9486948c03626967948a090000000000000000408c036e6567944af7ffffff8c0173948f94284b014b024b0390752e"

  private val SharedP2 =
    "80027d71002858010000007871015d7102284b014b026558010000007971036802752e"

  private val UnicodeP4 =
    "80049523000000000000007d94288c046bc3a979948c0b76c3a46c756520f09f9880948c016e944a90eefeff752e"

  test("the reference index shape decodes identically at protocols 2-5") {
    val want = Vector(
      Pickle.Dict(Vector("url" -> "file:/data/shard-0.tar",
        "nsamples" -> 412L)),
      Pickle.Dict(Vector("url" -> "file:/data/shard-1.tar",
        "nsamples" -> 397L)))
    IndexByProto.foreach { case (p, h) =>
      assert(norm(Pickle.decode(hex(h))) == norm(want), s"protocol $p")
    }
  }

  test("CPython nested fixture: ints/floats/str/bytes/None/bool/" +
      "tuple/bigint/negatives/set") {
    val got = Pickle.toMap(Pickle.decode(hex(NestedP4)))
      .map { case (k, v) => k -> norm(v) }
    assert(got("a") == Vector(1L, 2.5, "tre",
      Vector[Byte](0, 1), null, true, false))
    assert(got("t") == Pickle.Tup(Vector(1L, "two")))
    assert(got("big") == BigInt(2).pow(70))
    assert(got("neg") == -9L)
    assert(got("s").asInstanceOf[Pickle.PySet].items.toSet ==
      Set(1L, 2L, 3L))
  }

  test("memoized shared reference decodes to the SAME JVM object") {
    val m = Pickle.toMap(Pickle.decode(hex(SharedP2)))
    assert(m("x") == Vector(1L, 2L))
    assert(m("x").asInstanceOf[AnyRef] eq m("y").asInstanceOf[AnyRef])
  }

  test("unicode keys and values survive (utf-8, astral plane)") {
    val m = Pickle.toMap(Pickle.decode(hex(UnicodeP4)))
    assert(m("kéy") == "välue 😀")
    assert(m("n") == -70000L)
  }

  test("decode . encode = id over representative plain data") {
    val values: Seq[Any] = Seq(
      null, true, false, 0L, 255L, 65535L, -1L, Int.MaxValue.toLong + 7,
      BigInt(2).pow(100), -BigInt(2).pow(90), 3.14159, -0.0,
      "", "plain", "ünïcode 😀", Array[Byte](),
      Array.tabulate[Byte](300)(_.toByte),
      Vector.empty, Vector(1L, Vector(2L, "x"), null),
      Pickle.Tup(Vector.empty), Pickle.Tup(Vector(1L)),
      Pickle.Tup(Vector(1L, 2L, 3L, 4L, 5L)),
      Pickle.Dict(Vector.empty),
      Pickle.Dict(Vector("k" -> Vector(1L), 2L -> "v")),
      Pickle.PySet(Vector(1L, "a")),
      Pickle.Dict(Vector("deep" -> Pickle.Dict(Vector(
        "er" -> Pickle.Tup(Vector(Vector("x"), Array[Byte](9))))))))
    values.foreach { v =>
      assert(norm(Pickle.decode(Pickle.encode(v))) == norm(v),
        s"round-trip broke for $v")
    }
  }

  // CPython pickle.dumps fixtures at the ASCII protocols (legacy
  // indexes predating protocol 2)
  private val IndexP0 =
    "286c70300a286470310a5675726c0a70320a5673686172642d302d302d3530302d302e7461720a70330a73566e73616d706c65730a70340a493530300a7361286470350a67320a5673686172642d302d3530302d313030302d312e7461720a70360a7367340a493439390a73612e"
  private val IndexP1 =
    "5d7100287d710128580300000075726c7102581300000073686172642d302d302d3530302d302e746172710358080000006e73616d706c657371044df401757d7105286802581600000073686172642d302d3530302d313030302d312e746172710668044df30175652e"
  // (True, False, 5, -7, 2**100, 1.5, "héllo\nworld", ["a",("b",2)],
  //  {"k": None}) — covers I01/I00/I/L/F/V (raw latin-1 byte + \u
  // escape) plus proto-0 list/dict/tuple building and p/g memo
  private val ScalarsP0 =
    "284930310a4930300a49350a492d370a4c313236373635303630303232383232393430313439363730333230353337364c0a46312e350a5668e96c6c6f5c7530303061776f726c640a70300a286c70310a56610a70320a612856620a70330a49320a7470340a61286470350a566b0a70360a4e737470370a2e"
  private val ScalarsP1 =
    "284930310a4930300a4b054af9ffffff4c313236373635303630303232383232393430313439363730333230353337364c0a473ff8000000000000580c00000068c3a96c6c6f0a776f726c6471005d71012858010000006171022858010000006271034b02747104657d710558010000006b71064e737471072e"

  test("protocol-0/1 ASCII pickles decode (legacy index shape)") {
    val want = Vector(
      Pickle.Dict(Vector("url" -> "shard-0-0-500-0.tar",
        "nsamples" -> 500L)),
      Pickle.Dict(Vector("url" -> "shard-0-500-1000-1.tar",
        "nsamples" -> 499L)))
    assert(norm(Pickle.decode(hex(IndexP0))) == norm(want), "proto 0")
    assert(norm(Pickle.decode(hex(IndexP1))) == norm(want), "proto 1")
  }

  test("protocol-0/1 scalar coverage: bool spellings, INT/LONG/FLOAT/" +
      "UNICODE lines, ASCII memo") {
    val want = Pickle.Tup(Vector(true, false, 5L, -7L, BigInt(2).pow(100),
      1.5, "héllo\nworld", Vector("a", Pickle.Tup(Vector("b", 2L))),
      Pickle.Dict(Vector("k" -> null))))
    assert(norm(Pickle.decode(hex(ScalarsP0))) == norm(want), "proto 0")
    assert(norm(Pickle.decode(hex(ScalarsP1))) == norm(want), "proto 1")
  }

  test("protocol-0 base-prefixed INT lines parse with int(data, 0) " +
      "semantics: 0x/0o/0b radixes, all-zero ok, other leading zeros " +
      "raise") {
    def p0(line: String): Any =
      Pickle.decode(s"I$line\n.".getBytes("ISO-8859-1"))
    assert(p0("0x1f") == 31L)
    assert(p0("0X1F") == 31L)
    assert(p0("-0b101") == -5L)
    assert(p0("+0o17") == 15L)
    assert(p0("00") == false) // the I00/I01 bool spellings win first
    assert(p0("01") == true)
    assert(p0("000") == 0L) // '000' is a valid base-0 literal (= 0)
    assert(p0("0") == 0L)
    // int('010', 0) and a bare prefix raise in CPython — typed here
    intercept[IllegalArgumentException](p0("010"))
    intercept[RuntimeException](p0("0x"))
    intercept[RuntimeException](p0("0xg1"))
  }

  test("protocol-0 non-finite floats: CPython's inf/-inf/nan spellings") {
    // pickle.dumps((float('inf'), float('-inf'), float('nan')), 0)
    val h = "2846696e660a462d696e660a466e616e0a7470300a2e"
    val t = Pickle.decode(hex(h)).asInstanceOf[Pickle.Tup].items
    assert(t(0) == Double.PositiveInfinity)
    assert(t(1) == Double.NegativeInfinity)
    assert(t(2).asInstanceOf[Double].isNaN)
  }

  test("py2 STRING opcode (S) lands as raw bytes after escape_decode") {
    // hand-built per pickletools: S'ab\n\x01\\'  + PUT + STOP
    val bytes = "S'ab\\n\\x01\\\\'\np0\n.".getBytes("ISO-8859-1")
    assert(norm(Pickle.decode(bytes)) ==
      Vector[Byte]('a', 'b', '\n', 1, '\\'))
  }

  test("LONG1->LONG4 switchover: >255-byte bigints round-trip") {
    // CPython emits LONG4 (0x8b) past 255 bytes; a truncated LONG1
    // length byte would corrupt silently
    val big = BigInt(2).pow(2300) + 12345 // 288-byte two's complement
    val enc = Pickle.encode(big)
    assert(enc(2) == 0x8b.toByte, f"opcode 0x${enc(2)}%02x")
    assert(Pickle.decode(enc) == big)
    assert(Pickle.decode(Pickle.encode(-big)) == -big)
    // boundary: 255-byte encoding stays LONG1
    val edge = (BigInt(1) << (255 * 8 - 1)) - 1
    assert(edge.toByteArray.length == 255)
    val encEdge = Pickle.encode(edge)
    assert(encEdge(2) == 0x8a.toByte)
    assert(Pickle.decode(encEdge) == edge)
  }

  test("object/class pickles raise a typed error, never mis-decode") {
    // CPython: pickle.dumps(collections.OrderedDict()) opens with
    // GLOBAL/STACK_GLOBAL; a set at protocol 3 goes through
    // GLOBAL builtins.set + REDUCE
    val setP3 = "8003636275696c74696e730a7365740a710b5d710c284b014b024b036585710d52710e2e"
    val e = intercept[IllegalArgumentException](
      Pickle.decode(hex(setP3)))
    assert(e.getMessage.contains("GLOBAL"))
    // truncated stream is an EOF, not a crash
    intercept[java.io.EOFException](
      Pickle.decode(hex(IndexByProto(4)).dropRight(10)))
    // fuzz: single-byte corruption never escapes the typed contract
    val base = hex(NestedP4)
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Pickle.decode(b); () } catch {
        case _: IllegalArgumentException | _: java.io.EOFException |
          _: NoSuchElementException => ()
      }
    }
  }

  test("self-referential container fails loudly") {
    // CPython: l = []; l.append(l); pickle.dumps(l, 2)
    val selfRef = "80025d71006800612e" // ] BINPUT0 BINGET0 APPEND .
    intercept[IllegalArgumentException](Pickle.decode(hex(selfRef)))
  }
}
