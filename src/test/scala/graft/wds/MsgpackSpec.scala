package graft.wds

import org.scalatest.funsuite.AnyFunSuite

/** MessagePack codec laws: wire bytes pinned to the public msgpack
  * spec (format table), canonical shortest-width encoding (the
  * msgpack-python `packb` behavior the reference's mp rows call), and
  * round-trip identity across the full value model. */
class MsgpackSpec extends AnyFunSuite {

  private def hexOf(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString

  private def rt(v: Any): Any = Msgpack.decode(Msgpack.encode(v))

  test("int widths: spec-exact wire bytes at every boundary") {
    val cases = Seq[(Long, String)](
      0L -> "00", 127L -> "7f", // positive fixint
      128L -> "cc80", 255L -> "ccff", // uint8
      256L -> "cd0100", 65535L -> "cdffff", // uint16
      65536L -> "ce00010000", 4294967295L -> "ceffffffff", // uint32
      4294967296L -> "cf0000000100000000", // uint64
      Long.MaxValue -> "cf7fffffffffffffff",
      -1L -> "ff", -32L -> "e0", // negative fixint
      -33L -> "d0df", -128L -> "d080", // int8
      -129L -> "d1ff7f", -32768L -> "d18000", // int16
      -32769L -> "d2ffff7fff", Int.MinValue.toLong -> "d280000000",
      Int.MinValue - 1L -> "d3ffffffff7fffffff",
      Long.MinValue -> "d38000000000000000")
    for ((v, wire) <- cases) {
      assert(hexOf(Msgpack.encode(v)) == wire, s"encode $v")
      assert(Msgpack.decode(hex(wire)) == v, s"decode $wire")
    }
    // uint64 above Long range surfaces as BigInt and re-encodes raw
    val big = BigInt("18446744073709551615") // 2^64 - 1
    assert(hexOf(Msgpack.encode(big)) == "cfffffffffffffffff")
    assert(Msgpack.decode(hex("cfffffffffffffffff")) == big)
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("str/bin/array/map headers at fix/8/16 boundaries") {
    assert(hexOf(Msgpack.encode("")) == "a0")
    assert(hexOf(Msgpack.encode("abc")) == "a3616263")
    assert(hexOf(Msgpack.encode("a" * 31)).startsWith("bf"))
    assert(hexOf(Msgpack.encode("a" * 32)).startsWith("d920"))
    assert(hexOf(Msgpack.encode("a" * 256)).startsWith("da0100"))
    assert(hexOf(Msgpack.encode(Array[Byte](0, 1, 2))) == "c403000102")
    assert(hexOf(Msgpack.encode(Vector.empty[Any])) == "90")
    assert(hexOf(Msgpack.encode(Vector.fill[Any](16)(0L)))
      .startsWith("dc0010"))
    assert(hexOf(Msgpack.encode(Msgpack.MsgMap(Vector("a" -> 1L)))) ==
      "81a16101")
    assert(hexOf(Msgpack.encode(
      Msgpack.MsgMap(Vector.tabulate(16)(i => (i.toLong: Any, 0L: Any)))))
      .startsWith("de0010"))
  }

  test("nil/bool/float wire bytes") {
    assert(hexOf(Msgpack.encode(null)) == "c0")
    assert(hexOf(Msgpack.encode(false)) == "c2")
    assert(hexOf(Msgpack.encode(true)) == "c3")
    assert(hexOf(Msgpack.encode(1.5)) == "cb3ff8000000000000")
    assert(hexOf(Msgpack.encode(0.5f)) == "ca3f000000")
    assert(Msgpack.decode(hex("ca3fc00000")) == 1.5) // float32 widens
    assert(Msgpack.decode(hex("cb4009000000000000")) == 3.125)
  }

  test("nested sample round-trips; map order preserved") {
    val v = Msgpack.MsgMap(Vector(
      "__key__" -> "000000001",
      "ids" -> Vector(1L, 2L, 3L),
      "img" -> Array[Byte](9, 8, 7),
      "meta" -> Msgpack.MsgMap(Vector("z" -> null, "a" -> true)),
      "score" -> 0.75))
    val back = rt(v).asInstanceOf[Msgpack.MsgMap]
    assert(back.pairs.map(_._1) == v.pairs.map(_._1))
    assert(back.pairs(1)._2 == Vector(1L, 2L, 3L))
    assert(back.pairs(2)._2.asInstanceOf[Array[Byte]].toSeq == Seq(9, 8, 7))
    assert(back.pairs(3)._2 == Msgpack.MsgMap(Vector("z" -> null,
      "a" -> true)))
    assert(back.pairs(4)._2 == 0.75)
    assert(Msgpack.toMap(back)("score") == 0.75)
  }

  test("ext types: fixext and sized ext round-trip") {
    for (n <- Seq(1, 2, 4, 8, 16, 3, 17, 300)) {
      val e = Msgpack.Ext(5, Array.tabulate(n)(_.toByte))
      val back = rt(e).asInstanceOf[Msgpack.Ext]
      assert(back.extType == 5 && back.data.toSeq == e.data.toSeq, s"n=$n")
    }
    assert(hexOf(Msgpack.encode(Msgpack.Ext(1, Array[Byte](9)))) ==
      "d40109")
  }

  test("decodeAll: back-to-back items until clean EOF; truncation raises") {
    val stream = Msgpack.encode(1L) ++ Msgpack.encode("x") ++
      Msgpack.encode(Vector(true))
    val items = Msgpack.decodeAll(
      new java.io.ByteArrayInputStream(stream)).toVector
    assert(items == Vector(1L, "x", Vector(true)))
    val truncated = stream.dropRight(1)
    assertThrows[java.io.EOFException] {
      Msgpack.decodeAll(
        new java.io.ByteArrayInputStream(truncated)).toVector
    }
    // corrupt length header must fail on the short stream, not OOM
    assertThrows[java.io.EOFException](
      Msgpack.decode(hex("db00ffffff00"))) // str32 claiming 16 MB
    assertThrows[IllegalArgumentException](
      Msgpack.decode(hex("db7fffffff00"))) // over the length cap
    assertThrows[IllegalArgumentException](Msgpack.decode(hex("c1")))
  }

  test("byte-array decode rejects trailing bytes (the unpackb " +
    "ExtraData condition) — corruption must not pass as a value") {
    val one = Msgpack.encode(Map("k" -> 1L))
    assert(Msgpack.toMap(Msgpack.decode(one)) == Map("k" -> 1L))
    val ex = intercept[IllegalArgumentException](
      Msgpack.decode(one ++ Array[Byte](0x01)))
    assert(ex.getMessage.contains("trailing"))
    val ex2 = intercept[IllegalArgumentException](
      graft.wds.Cbor.decode(
        graft.wds.Cbor.encode(Seq(1L, 2L)) ++ Array[Byte](0x00)))
    assert(ex2.getMessage.contains("trailing"))
  }

  test("registry dispatch: mp/msg/msgpack/cbor decode + encode rows") {
    import Codecs.Decoded
    val sample = Msgpack.MsgMap(Vector("n" -> 42L))
    for (ext <- Seq("mp", "msg", "msgpack"))
      Codecs.decode(ext, Msgpack.encode(sample)) match {
        case Decoded.Packed(m: Msgpack.MsgMap) =>
          assert(Msgpack.toMap(m)("n") == 42L)
        case other => fail(s"expected Packed msgpack at $ext, got $other")
      }
    assert(Codecs.encode("mp", sample).toSeq ==
      Msgpack.encode(sample).toSeq)
    Codecs.decode("cbor",
      Cbor.encode(Cbor.CborMap(Vector("n" -> 42L)))) match {
      case Decoded.Packed(m: Cbor.CborMap) =>
        assert(Cbor.toMap(m)("n") == 42L)
      case other => fail(s"expected Packed cbor, got $other")
    }
  }

  test("msgpack <-> cbor value-model interop (shared sample shape)") {
    val v = Msgpack.decode(Msgpack.encode(Msgpack.MsgMap(Vector(
      "ids" -> Vector(-7L, 300L), "t" -> "x", "f" -> 2.5))))
    // re-express through CBOR: same leaves survive both codecs
    val asCbor = Cbor.decode(Cbor.encode(Cbor.CborMap(Vector(
      "ids" -> Vector(-7L, 300L), "t" -> "x", "f" -> 2.5))))
    val mp = Msgpack.toMap(v)
    val cm = Cbor.toMap(asCbor)
    assert(mp("ids") == cm("ids") && mp("t") == cm("t") &&
      mp("f") == cm("f"))
  }
}
