package graft.wds

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** safetensors codec laws: decode against a byte-literal fixture
  * assembled independently from the spec text (so encode and decode
  * cannot share a misreading), decode∘encode identity across every
  * dtype, strict tile validation (gaps/overlaps/overruns are typed
  * errors), f16/bf16 views, and 8-byte header alignment. */
class SafetensorsSpec extends AnyFunSuite {

  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def le32s(vs: Int*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * vs.size).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putInt)
    bb.array()
  }

  test("byte-literal fixture decodes per the published layout") {
    // assembled by hand from the spec: u64 header length, JSON, buffer
    val header =
      """{"t":{"dtype":"I32","shape":[2,2],"data_offsets":[0,16]},""" +
        """"__metadata__":{"who":"spec"}}"""
    val bytes = le64(header.length.toLong) ++ header.getBytes(UTF_8) ++
      le32s(1, -2, 300000, -40)
    val st = Safetensors.decode(bytes)
    assert(st.names == Vector("t"))
    assert(st.metadata == Map("who" -> "spec"))
    val info = st.info("t")
    assert(info.dtype == "I32" && info.shape == Vector(2, 2))
    assert(st.toLongs("t").toSeq == Seq(1L, -2L, 300000L, -40L))
    // trailing header padding (spaces) must be tolerated
    val padded = le64(header.length + 3L) ++
      (header + "   ").getBytes(UTF_8) ++ le32s(1, -2, 300000, -40)
    assert(Safetensors.decode(padded).toLongs("t").toSeq ==
      Seq(1L, -2L, 300000L, -40L))
  }

  test("tensors listed out of offset order in the JSON still decode " +
      "(buffer order wins, per the tile validation)") {
    val header =
      """{"b":{"dtype":"U8","shape":[2],"data_offsets":[4,6]},""" +
        """"a":{"dtype":"I32","shape":[1],"data_offsets":[0,4]}}"""
    val bytes = le64(header.length.toLong) ++ header.getBytes(UTF_8) ++
      le32s(77) ++ Array[Byte](5, 6)
    val st = Safetensors.decode(bytes)
    assert(st.names == Vector("a", "b"), "sorted by buffer position")
    assert(st.toLongs("a").toSeq == Seq(77L))
    assert(st.toLongs("b").toSeq == Seq(5L, 6L))
  }

  test("decode∘encode identity on every integer dtype + BOOL") {
    val cases = Seq(
      ("BOOL", Array[Byte](0, 1, 1, 0), Seq(0L, 1L, 1L, 0L)),
      ("U8", Array[Byte](0, 127, -1, 5), Seq(0L, 127L, 255L, 5L)),
      ("I8", Array[Byte](0, 127, -1, -128), Seq(0L, 127L, -1L, -128L)),
      ("I16", Array[Byte](1, 0, -1, -1, 0, -128, 57, 48),
        Seq(1L, -1L, -32768L, 12345L)),
      ("U16", Array[Byte](1, 0, -1, -1, 0, -128, 57, 48),
        Seq(1L, 65535L, 32768L, 12345L)),
      ("I32", le32s(7, -9, Int.MaxValue, Int.MinValue),
        Seq(7L, -9L, Int.MaxValue.toLong, Int.MinValue.toLong)),
      ("U32", le32s(7, -9, -1, 0),
        Seq(7L, 4294967287L, 4294967295L, 0L)),
      ("I64", le64(-12345678901L) ++ le64(7L) ++ le64(0L) ++ le64(1L),
        Seq(-12345678901L, 7L, 0L, 1L)),
    )
    cases.foreach { case (dtype, data, want) =>
      val enc = Safetensors.encode(Seq(
        "x" -> Safetensors.Tensor(dtype, Vector(4), data)))
      val st = Safetensors.decode(enc)
      assert(st.toLongs("x").toSeq == want, dtype)
      assert(st.info("x").dtype == dtype && st.info("x").shape == Vector(4))
      // header length (first u64) is 8-byte aligned
      val hlen = ByteBuffer.wrap(enc, 0, 8)
        .order(ByteOrder.LITTLE_ENDIAN).getLong()
      assert(hlen % 8 == 0, s"$dtype header not aligned: $hlen")
    }
  }

  test("float dtypes: f32/f64 exact, f16/bf16 per the bit formulas") {
    val f32 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putFloat(1.5f).putFloat(-0.25f).array()
    val f64 = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putDouble(math.Pi).putDouble(-1e300).array()
    // f16: 1.0 = 0x3c00, -2.0 = 0xc000, 65504 (max) = 0x7bff,
    // 0.5 subnormal-adjacent: 5.960464e-8 (min subnormal) = 0x0001
    val f16 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(0x3c00.toShort).putShort(0xc000.toShort)
      .putShort(0x7bff.toShort).putShort(0x0001.toShort).array()
    // bf16: top 16 bits of the f32 pattern; 1.5f = 0x3fc00000 → 0x3fc0
    val bf16 = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(0x3fc0.toShort).putShort(0xbf80.toShort).array()
    val enc = Safetensors.encode(
      Seq(
        "a" -> Safetensors.Tensor("F32", Vector(2), f32),
        "b" -> Safetensors.Tensor("F64", Vector(2), f64),
        "c" -> Safetensors.Tensor("F16", Vector(4), f16),
        "d" -> Safetensors.Tensor("BF16", Vector(2), bf16)),
      metadata = Map("format" -> "pt"))
    val st = Safetensors.decode(enc)
    assert(st.toDoubles("a").toSeq == Seq(1.5, -0.25))
    assert(st.toDoubles("b").toSeq == Seq(math.Pi, -1e300))
    val c = st.toDoubles("c")
    assert(c(0) == 1.0 && c(1) == -2.0 && c(2) == 65504.0)
    assert(math.abs(c(3) - 5.960464477539063e-8) < 1e-15)
    assert(st.toDoubles("d").toSeq == Seq(1.5, -1.0))
    assert(st.metadata == Map("format" -> "pt"))
    assert(st.names == Vector("a", "b", "c", "d"), "buffer order kept")
  }

  test("tile validation: gap, overlap, overrun, size mismatch, " +
      "unknown dtype are typed errors") {
    def hdr(json: String, buf: Int): Array[Byte] =
      le64(json.length.toLong) ++ json.getBytes(UTF_8) ++
        new Array[Byte](buf)
    def bad(json: String, buf: Int, what: String): Unit = {
      val e = intercept[IllegalArgumentException](
        Safetensors.decode(hdr(json, buf)))
      assert(e.getMessage.startsWith("safetensors:"), s"$what: $e")
    }
    // gap: buffer byte 0..4 unclaimed
    bad("""{"t":{"dtype":"U8","shape":[4],"data_offsets":[4,8]}}""",
      8, "gap")
    // overlap
    bad("""{"a":{"dtype":"U8","shape":[4],"data_offsets":[0,4]},""" +
      """"b":{"dtype":"U8","shape":[4],"data_offsets":[2,6]}}""",
      6, "overlap")
    // overrun
    bad("""{"t":{"dtype":"U8","shape":[9],"data_offsets":[0,9]}}""",
      8, "overrun")
    // dtype/shape byte-size mismatch
    bad("""{"t":{"dtype":"I32","shape":[3],"data_offsets":[0,8]}}""",
      8, "mismatch")
    // unknown dtype
    bad("""{"t":{"dtype":"Q4","shape":[8],"data_offsets":[0,8]}}""",
      8, "dtype")
    // uncovered tail
    bad("""{"t":{"dtype":"U8","shape":[4],"data_offsets":[0,4]}}""",
      8, "tail")
    // truncated file / lying header length
    val e = intercept[IllegalArgumentException](
      Safetensors.decode(le64(1000L) ++ "{}".getBytes(UTF_8)))
    assert(e.getMessage.contains("overruns"))
    intercept[IllegalArgumentException](Safetensors.decode(Array[Byte](1)))
    // header that is not a JSON object
    bad("[1,2]" + " ", 0, "not-object")
  }

  test("floatToHalf: exact values round-trip, RNE on the rest, " +
      "specials preserved") {
    // every f16-exact value must survive float→half→float
    val exact = Seq(0f, 1f, -2f, 0.5f, -0.25f, 65504f, 2048f, -1024f,
      5.960464477539063e-8f /* min subnormal */,
      6.103515625e-5f /* min normal */)
    exact.foreach { v =>
      assert(Safetensors.halfToFloat(
        Safetensors.floatToHalf(v) & 0xffff) == v, v)
    }
    // exhaustive: every finite half bit pattern round-trips
    (0 until 0x10000).foreach { h =>
      val f = Safetensors.halfToFloat(h)
      if (!f.isNaN && !f.isInfinite)
        assert((Safetensors.floatToHalf(f) & 0xffff) == h, f"0x$h%04x")
    }
    // round-to-nearest-even: 2049 is between 2048 and 2050 → 2048
    assert(Safetensors.halfToFloat(
      Safetensors.floatToHalf(2049f) & 0xffff) == 2048f)
    assert(Safetensors.halfToFloat(
      Safetensors.floatToHalf(2051f) & 0xffff) == 2052f)
    // overflow → inf; specials preserved
    assert(Safetensors.halfToFloat(
      Safetensors.floatToHalf(1e6f) & 0xffff).isPosInfinity)
    assert(Safetensors.halfToFloat(
      Safetensors.floatToHalf(Float.NegativeInfinity) & 0xffff)
      .isNegInfinity)
    assert(Safetensors.halfToFloat(
      Safetensors.floatToHalf(Float.NaN) & 0xffff).isNaN)
  }

  test("empty tensor list and zero-element shapes round-trip") {
    val none = Safetensors.decode(Safetensors.encode(Nil))
    assert(none.tensors.isEmpty && none.buffer.isEmpty)
    val zero = Safetensors.decode(Safetensors.encode(Seq(
      "z" -> Safetensors.Tensor("F32", Vector(0, 3), Array.emptyByteArray))))
    assert(zero.info("z").shape == Vector(0, 3) && zero.data("z").isEmpty)
  }

  test("seeded fuzz: bit flips and truncations raise typed errors, " +
      "never crash or mis-decode silently") {
    val base = Safetensors.encode(Seq(
      "a" -> Safetensors.Tensor("I32", Vector(4), le32s(1, 2, 3, 4)),
      "b" -> Safetensors.Tensor("U8", Vector(3), Array[Byte](9, 8, 7))),
      metadata = Map("k" -> "v"))
    val want = Safetensors.decode(base)
    val rnd = new scala.util.Random(17)
    var i = 0
    while (i < 500) {
      val m = base.clone()
      val pos = rnd.nextInt(m.length)
      m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val got = Safetensors.decode(m)
        if (pos >= base.length - want.buffer.length) {
          // flip landed in the data buffer: the STRUCTURE must be
          // byte-identical to the clean decode and the buffer must
          // differ in exactly the flipped byte — a structural change
          // here would be the silent mis-decode class
          assert(got.tensors == want.tensors &&
            got.metadata == want.metadata)
          assert(got.buffer.zip(want.buffer).count {
            case (a, b) => a != b } == 1)
        } else {
          // header flip that still decodes: tiling is enforced by
          // decode itself; pin that the buffer came through whole
          assert(got.buffer.length == want.buffer.length)
        }
      } catch {
        case _: IllegalArgumentException => () // the typed error
        case e: com.fasterxml.jackson.core.JacksonException =>
          fail(s"json error escaped untyped: $e")
      }
      i += 1
    }
    for (cut <- Seq(0, 1, 7, 8, 9, base.length / 2, base.length - 1)) {
      intercept[IllegalArgumentException](
        Safetensors.decode(java.util.Arrays.copyOfRange(base, 0, cut)))
    }
  }

  test("codec registry dispatch: .safetensors decodes and encodes") {
    val enc = Codecs.encode("safetensors", Seq(
      "emb" -> Safetensors.Tensor("I64",
        Vector(2), le64(3L) ++ le64(-4L))))
    Codecs.decode("emb.safetensors", enc) match {
      case Codecs.Decoded.SafeT(st) =>
        assert(st.toLongs("emb").toSeq == Seq(3L, -4L))
      case other => fail(s"unexpected: $other")
    }
    // gz chain: the reference's Continue-style gz pre-pass applies
    val gzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(enc); gz.close()
      bos.toByteArray
    }
    Codecs.decode("safetensors.gz", gzBytes) match {
      case Codecs.Decoded.SafeT(st) =>
        assert(st.toLongs("emb").toSeq == Seq(3L, -4L))
      case other => fail(s"unexpected: $other")
    }
  }

  test("encode rejects a shape whose byte-size product wraps Long " +
      "instead of emitting a lying header") {
    // 65536^4 * 1 byte = 2^64 ≡ 0 (mod 2^64): an unguarded product
    // would "match" a zero-length buffer and write a file whose shape
    // lies about its data. Must be the same typed error decode raises.
    val e = intercept[IllegalArgumentException] {
      Safetensors.encode(Seq("t" -> Safetensors.Tensor("U8",
        Vector(65536, 65536, 65536, 65536), Array.emptyByteArray)))
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
  }
}
