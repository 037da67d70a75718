package graft.wds

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-shard robustness for the round-11 codecs, the H264FuzzSpec
  * / FlacCodec fuzz standard applied to npy and msgpack: decode of a
  * mutated or truncated stream either succeeds or raises a TYPED,
  * handleable error (IllegalArgumentException / EOFException /
  * NumberFormatException from header text, or the zip layer's
  * ZipException) — never an unchecked crash (index-out-of-bounds,
  * negative allocation, OOM from a lying length header) that would
  * kill an executor instead of routing through the wds handler
  * policy. */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def handleable(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException => true // incl. NumberFormat
    case _: java.io.EOFException => true
    case _: java.util.zip.ZipException => true
    case _: java.io.IOException => true
    case _ => false
  }

  private def sweep(name: String, bytes: Array[Byte],
      decode: Array[Byte] => Any): Unit = {
    // every truncated prefix
    for (n <- 0 until bytes.length) {
      val cut = bytes.take(n)
      try { decode(cut); () } catch {
        case t: Throwable =>
          assert(handleable(t), s"$name trunc@$n: ${t.getClass} $t")
      }
    }
    // seeded single-byte mutations
    for (_ <- 0 until 2000) {
      val mutated = bytes.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { decode(mutated); () } catch {
        case t: Throwable =>
          assert(handleable(t), s"$name mutate: ${t.getClass} $t")
      }
    }
    // random garbage of assorted sizes
    for (n <- Seq(0, 1, 7, 64, 1024)) {
      val junk = new Array[Byte](n)
      rnd.nextBytes(junk)
      try { decode(junk); () } catch {
        case t: Throwable =>
          assert(handleable(t), s"$name junk($n): ${t.getClass} $t")
      }
    }
  }

  test("npy decode survives truncation/mutation/garbage with typed errors") {
    val npy = Npy.encode(Npy.fromLongs(
      Array.tabulate(16)(_.toLong * 3 - 7), Vector(4, 4), "<i4"))
    sweep("npy", npy, Npy.decode)
  }

  test("npz decode survives truncation/mutation/garbage with typed errors") {
    val npz = Npy.encodeNpz(Vector(
      "a" -> Npy.fromLongs(Array(1L, 2L), Vector(2)),
      "b" -> Npy.fromDoubles(Array(0.5), Vector(1))))
    sweep("npz", npz, Npy.decodeNpz)
  }

  test("msgpack decode survives truncation/mutation/garbage with typed errors") {
    val mp = Msgpack.encode(Msgpack.MsgMap(Vector(
      "__key__" -> "000000009",
      "ids" -> Vector(1L, -200L, 70000L),
      "bin" -> Array.tabulate(40)(_.toByte),
      "meta" -> Msgpack.MsgMap(Vector("f" -> 2.5, "t" -> true,
        "z" -> null)))))
    sweep("msgpack", mp, Msgpack.decode)
  }

  test("msgpack round-trip law over random value trees") {
    def randValue(depth: Int): Any = {
      val pick =
        if (depth >= 3) rnd.nextInt(6) // leaves only
        else rnd.nextInt(9)
      pick match {
        case 0 => rnd.nextLong() >> rnd.nextInt(64)
        case 1 => rnd.nextString(rnd.nextInt(40))
        case 2 => val b = new Array[Byte](rnd.nextInt(300))
          rnd.nextBytes(b); b
        case 3 => rnd.nextBoolean()
        case 4 => null
        case 5 => rnd.nextDouble() * 1e6 - 5e5
        case 6 => Vector.fill(rnd.nextInt(5))(randValue(depth + 1))
        case 7 => Msgpack.MsgMap(Vector.fill(rnd.nextInt(4))(
          (rnd.nextString(3): Any, randValue(depth + 1))))
        case _ => Msgpack.Ext(rnd.nextInt(100).toByte,
          { val b = new Array[Byte](rnd.nextInt(20)); rnd.nextBytes(b); b })
      }
    }
    def eq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
      case (Msgpack.Ext(t1, d1), Msgpack.Ext(t2, d2)) =>
        t1 == t2 && d1.sameElements(d2)
      case (x: Vector[_], y: Vector[_]) =>
        x.length == y.length && x.lazyZip(y).forall(eq)
      case (Msgpack.MsgMap(p1), Msgpack.MsgMap(p2)) =>
        p1.length == p2.length &&
          p1.lazyZip(p2).forall { case ((k1, v1), (k2, v2)) =>
            k1 == k2 && eq(v1, v2) }
      case (x, y) => x == y
    }
    for (i <- 0 until 500) {
      val v = randValue(0)
      assert(eq(Msgpack.decode(Msgpack.encode(v)), v), s"case $i")
    }
  }
}
