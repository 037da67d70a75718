package graft.multimodal.h264

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The CABAC skeleton is value-free: these tests inject a SYNTHETIC
  * table and prove the arithmetic engine + binarizers round-trip under
  * it (encoder and decoder agree by construction). That is exactly why
  * guessed tables are not shipped for real streams: internal
  * consistency says nothing about matching the published constants. */
class CabacSpec extends AnyFunSuite {

  /** synthetic tables — structurally valid (LPS < 256, states 0..62
    * wander both directions), numerically arbitrary */
  private object SyntheticTables extends Cabac.CabacTables {
    def rangeTabLPS(s: Int, q: Int): Int = 16 + ((s * 7 + q * 13) % 160)
    def transIdxLPS(s: Int): Int = math.max(0, s - 3)
    def transIdxMPS(s: Int): Int = math.min(62, s + 1)
    def initPair(ctxIdx: Int, initIdc: Int): (Int, Int) =
      ((ctxIdx * 3) % 21 - 10, 30 + (ctxIdx + 11 * initIdc) % 40)
  }

  private def freshContexts(n: Int, qp: Int): Array[Cabac.Context] =
    Array.tabulate(n) { i =>
      val (m, nn) = SyntheticTables.initPair(i, 0)
      Cabac.initContext(m, nn, qp)
    }

  test("engine round-trip: random decision/bypass mix over 8 contexts") {
    val rnd = new Random(42)
    for (trial <- 0 until 50) {
      val qp = 16 + trial % 24
      // plan: (kind, ctx, bin) — kind 0 decision, 1 bypass
      val plan = Seq.fill(200 + rnd.nextInt(200))(
        (rnd.nextInt(2), rnd.nextInt(8), rnd.nextInt(2)))
      val enc = new Cabac.Encoder(SyntheticTables)
      val ectx = freshContexts(8, qp)
      plan.foreach {
        case (0, c, b) => enc.encodeDecision(ectx(c), b)
        case (_, _, b) => enc.encodeBypass(b)
      }
      enc.encodeTerminate(1)
      val bytes = enc.toBytes
      val dec = new Cabac.Decoder(bytes, SyntheticTables)
      val dctx = freshContexts(8, qp)
      plan.zipWithIndex.foreach {
        case ((0, c, b), i) =>
          assert(dec.decodeDecision(dctx(c)) == b, s"trial $trial bin $i")
        case ((_, _, b), i) =>
          assert(dec.decodeBypass() == b, s"trial $trial bypass $i")
      }
      assert(dec.decodeTerminate() == 1, s"trial $trial terminate")
      // context states must agree bit-for-bit after the stream
      (0 until 8).foreach { c =>
        assert(ectx(c).pStateIdx == dctx(c).pStateIdx &&
          ectx(c).valMPS == dctx(c).valMPS, s"trial $trial ctx $c")
      }
    }
  }

  test("terminate(0) continues the stream") {
    val enc = new Cabac.Encoder(SyntheticTables)
    val ctx = freshContexts(1, 26)
    enc.encodeDecision(ctx(0), 1)
    enc.encodeTerminate(0) // end_of_slice_flag == 0: keep going
    enc.encodeDecision(ctx(0), 0)
    enc.encodeTerminate(1)
    val dec = new Cabac.Decoder(enc.toBytes, SyntheticTables)
    val dctx = freshContexts(1, 26)
    assert(dec.decodeDecision(dctx(0)) == 1)
    assert(dec.decodeTerminate() == 0)
    assert(dec.decodeDecision(dctx(0)) == 0)
    assert(dec.decodeTerminate() == 1)
  }

  test("binarizers round-trip: unary, truncated unary, fixed-length, UEGk") {
    val rnd = new Random(7)
    for (_ <- 0 until 20) {
      val vals = Seq.fill(40)(rnd.nextInt(50))
      val enc = new Cabac.Encoder(SyntheticTables)
      val ectx = freshContexts(4, 30)
      vals.foreach { v =>
        Cabac.encodeUnary(enc, ectx(0), v % 20)
        Cabac.encodeTruncUnary(enc, ectx(1), v % 15, 14)
        Cabac.encodeFixedLen(enc, v % 32, 5)
        Cabac.encodeUegkSuffix(enc, v, v % 4)
      }
      enc.encodeTerminate(1)
      val dec = new Cabac.Decoder(enc.toBytes, SyntheticTables)
      val dctx = freshContexts(4, 30)
      vals.foreach { v =>
        assert(Cabac.decodeUnary(dec, dctx(0)) == v % 20)
        assert(Cabac.decodeTruncUnary(dec, dctx(1), 14) == v % 15)
        assert(Cabac.decodeFixedLen(dec, 5) == v % 32)
        assert(Cabac.decodeUegkSuffix(dec, v % 4) == v)
      }
      assert(dec.decodeTerminate() == 1)
    }
  }

  test("context init follows 9.3.1.1 (preCtxState split at 63/64)") {
    // m=0: preCtxState = clip3(1,126,n)
    val below = Cabac.initContext(0, 10, 26)
    assert(below.pStateIdx == 53 && below.valMPS == 0) // 63 - 10
    val above = Cabac.initContext(0, 100, 26)
    assert(above.pStateIdx == 36 && above.valMPS == 1) // 100 - 64
    // qp scaling: m=16 adds exactly qp at >>4
    val scaled = Cabac.initContext(16, 0, 40)
    assert(scaled.pStateIdx == 63 - 40 && scaled.valMPS == 0)
  }

  test("real tables stay absent and CABAC streams stay typed") {
    assert(Cabac.realTables.isEmpty)
    // PPS with entropy_coding_mode_flag = 1 still raises the signal
    val w = new BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.u1(1) // CABAC
    w.u1(0); w.ue(0); w.ue(0); w.ue(0)
    w.u1(0); w.u(2, 0)
    w.se(0); w.se(0); w.se(0)
    w.u1(0); w.u1(0); w.u1(0)
    w.rbspTrailing()
    intercept[UnsupportedFeature] { Pps.parse(w.toBytes) }
  }
}
