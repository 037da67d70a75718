package graft.wds

import org.scalatest.funsuite.AnyFunSuite

/** NPY/NPZ codec laws, pinned against BYTES WRITTEN BY NUMPY itself
  * (test-resource fixtures generated offline with
  * `numpy.lib.format.write_array(version=(1,0))` /
  * `np.savez_compressed`): decode must read real numpy output, and
  * encode must reproduce it bit-for-bit — the same cross-engine
  * parity standard the image/audio codecs carry. */
class NpySpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/npy/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes numpy-written arrays: dtypes, shapes, both orders") {
    val a = Npy.decode(fixture("i8_1d.npy"))
    assert(a.descr == "<i8" && !a.fortranOrder && a.shape == Vector(3))
    assert(a.toLongs.toSeq == Seq(1L, -2L, 300000000000L))

    val b = Npy.decode(fixture("i4_2d.npy"))
    assert(b.descr == "<i4" && b.shape == Vector(2, 3))
    assert(b.toLongs.toSeq == (0 to 5).map(_.toLong))

    val c = Npy.decode(fixture("f8_1d.npy"))
    assert(c.toDoubles.toSeq == Seq(1.5, -2.25, 3.125))

    val d = Npy.decode(fixture("f4_2d.npy"))
    assert(d.descr == "<f4" && d.shape == Vector(2, 2))
    assert(d.toDoubles.toSeq == Seq(0.5, 1.5, 2.5, -3.5))

    val e = Npy.decode(fixture("u1_1d.npy"))
    assert(e.descr == "|u1" && e.toLongs.toSeq == Seq(0L, 127L, 255L))

    val f = Npy.decode(fixture("b1_1d.npy"))
    assert(f.descr == "|b1" && f.toLongs.toSeq == Seq(1L, 0L, 1L))

    val g = Npy.decode(fixture("i2_0d.npy")) // zero-dim scalar
    assert(g.shape.isEmpty && g.elements == 1L && g.toLongs.toSeq == Seq(7L))

    val h = Npy.decode(fixture("i4_F.npy")) // fortran: column-major buffer
    assert(h.fortranOrder && h.shape == Vector(2, 3))
    assert(h.toLongs.toSeq == Seq(0L, 3L, 1L, 4L, 2L, 5L))
  }

  test("encode reproduces numpy's bytes bit-for-bit") {
    for (name <- Seq("i8_1d", "i4_2d", "f8_1d", "f4_2d", "u1_1d",
        "b1_1d", "i2_0d", "i4_F")) {
      val bytes = fixture(s"$name.npy")
      assert(Npy.encode(Npy.decode(bytes)).toSeq == bytes.toSeq, name)
    }
  }

  test("decodes numpy savez_compressed npz (deflate + data descriptors)") {
    val entries = Npy.decodeNpz(fixture("xy.npz"))
    assert(entries.map(_._1) == Vector("x", "y"))
    assert(entries(0)._2.toLongs.toSeq == Seq(1L, 2L, 3L))
    assert(entries(1)._2.toDoubles.toSeq == Seq(0.5))
  }

  test("npz round-trip through our own zip writer") {
    val entries = Vector(
      "emb" -> Npy.fromDoubles(Array(0.25, -1.5), Vector(2)),
      "ids" -> Npy.fromLongs(Array(7L, 8L, 9L), Vector(3), "<i4"),
      "mask" -> Npy.fromLongs(Array(1L, 0L), Vector(2, 1), "<i2"))
    val back = Npy.decodeNpz(Npy.encodeNpz(entries))
    assert(back.map(_._1) == entries.map(_._1))
    assert(back(0)._2.toDoubles.toSeq == Seq(0.25, -1.5))
    assert(back(1)._2.toLongs.toSeq == Seq(7L, 8L, 9L))
    assert(back(2)._2.shape == Vector(2, 1))
  }

  test("round-trip law across dtype grid") {
    val rnd = new scala.util.Random(7)
    for (descr <- Seq("<i1", "<i2", "<i4", "<i8", "<u2", "<u4")) {
      val bits = Npy.itemSize(descr) * 8
      val vals =
        if (bits == 64) Array.fill(17)(rnd.nextLong())
        else {
          val lo = if (descr(1) == 'u') 0L else -(1L << (bits - 1))
          val hi =
            if (descr(1) == 'u') (1L << bits) - 1
            else (1L << (bits - 1)) - 1
          Array.fill(17)(lo + (rnd.nextLong().abs % (hi - lo + 1)))
        }
      val rt = Npy.decode(Npy.encode(
        Npy.fromLongs(vals, Vector(17), descr)))
      assert(rt.toLongs.toSeq == vals.toSeq, descr)
    }
    val dv = Array.fill(9)(rnd.nextDouble() * 100 - 50)
    assert(Npy.decode(Npy.encode(
      Npy.fromDoubles(dv, Vector(3, 3)))).toDoubles.toSeq == dv.toSeq)
  }

  test("corrupt inputs fail loudly, never misparse") {
    assertThrows[IllegalArgumentException](Npy.decode("junk".getBytes))
    // truncated buffer: header claims 3 i8 elements, fewer bytes present
    val truncated = fixture("i8_1d.npy").dropRight(16)
    assertThrows[IllegalArgumentException](Npy.decode(truncated))
    // big-endian declared, still decodes with correct values
    val be = Npy.NpyArray(">i4", fortranOrder = false, Vector(2),
      Array[Byte](0, 0, 0, 1, 0, 0, 2, 0))
    assert(be.toLongs.toSeq == Seq(1L, 512L))
    // unsupported structured dtype rejected
    assertThrows[IllegalArgumentException](Npy.itemSize("|V16"))
    // crafted v2 headerLen near Int.MaxValue: Int arithmetic would
    // wrap the bounds check negative and escape as StringIndexOOB —
    // outside the typed failure class the handler policy routes
    val crafted = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y',
      2, 0, 0xf4.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte,
      'x', 'x', 'x', 'x')
    assertThrows[IllegalArgumentException](Npy.decode(crafted))
  }

  test("registry dispatch: npy/npz decode + encode rows") {
    import Codecs.Decoded
    Codecs.decode("npy", fixture("i8_1d.npy")) match {
      case Decoded.Tensor(a) => assert(a.toLongs.toSeq.head == 1L)
      case other => fail(s"expected Tensor, got $other")
    }
    Codecs.decode("npz", fixture("xy.npz")) match {
      case Decoded.TensorZip(es) => assert(es.map(_._1) == Vector("x", "y"))
      case other => fail(s"expected TensorZip, got $other")
    }
    // encode mirror + gz chain re-dispatch
    val arr = Npy.fromLongs(Array(5L), Vector(1))
    assert(Codecs.encode("npy", arr).toSeq == Npy.encode(arr).toSeq)
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(Npy.encode(arr)); g.close(); bos.toByteArray
    }
    Codecs.decode("npy.gz", gz) match {
      case Decoded.Tensor(a) => assert(a.toLongs.toSeq == Seq(5L))
      case other => fail(s"expected Tensor, got $other")
    }
  }
}
