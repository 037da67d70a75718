package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the two invariance lemmas the perceptual
  * fingerprints rest on — randomized over the full legal input space,
  * not just the gate fixtures:
  *
  *  1. GAIN lemma (mm29): for any PCM sample with |x| ≥ 64 and any
  *     gain g ∈ [16, 256], the arithmetic-shift rescale (x·g)>>6
  *     preserves the sign of EVERY sample (so the sign-pattern
  *     fingerprint is exactly gain-invariant) and changes every value
  *     whenever g ≠ 64 (so the robustness is never vacuous).
  *  2. BRIGHTNESS lemma (mm28/mm31): adding a uniform per-pixel shift
  *     that stays inside [0, 255] adds the same amount to every cell
  *     mean and to the frame mean, so the strict brighter-than-mean
  *     bit pattern is unchanged — for ANY geometry where all grid
  *     cells hold the same pixel count (the exact-integer
  *     cross-multiplication compare needs no rounding argument then).
  */
class FingerprintLawsSpec extends AnyFunSuite {

  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("gain lemma: (x*g)>>6 preserves every sign, changes every value") {
    val sample = Gen.chooseNum(64, 8000)
      .flatMap(m => Gen.oneOf(m, -m))
    val gain = Gen.chooseNum(16, 256)
    check(Prop.forAll(sample, gain) { (x: Int, g: Int) =>
      val y = (x * g) >> 6
      val signKept = (y > 0) == (x > 0) && y != 0
      val valueMoved = g == 64 || y != x
      val inRange = y >= Short.MinValue && y <= Short.MaxValue
      signKept && valueMoved && inRange
    })
  }

  test("brightness lemma: uniform shift never flips an aHash bit") {
    // random 16x16 grayscale frames with headroom for the shift
    val frame = Gen.containerOfN[Array, Int](256, Gen.chooseNum(0, 200))
    val shift = Gen.chooseNum(1, 55)
    def bits(px: Array[Int]): String = {
      val img = graft.wds.Codecs.ImageData(16, 16, 1, "L",
        px.map(_.toByte))
      // aHash through the public fingerprint (PNG round-trip lossless)
      MediaDedup.perceptualImageFingerprint()(
        graft.wds.Codecs.encodeImage(img, "png")).head
    }
    check(Prop.forAll(frame, shift) { (px: Array[Int], d: Int) =>
      bits(px) == bits(px.map(_ + d))
    })
  }
}
