package graft.multimodal.h264

/** H.264 inter prediction building blocks (spec 8.4), shared by the
  * P-slice decoder and the fixture encoder: quarter-sample luma motion
  * compensation (8.4.2.2.1, 6-tap half-pel + averaged quarter-pel),
  * eighth-sample bilinear chroma MC (8.4.2.2.2), and the median motion
  * vector prediction process (8.4.1.3) including the P_Skip special
  * case (8.4.1.1). The reference pipeline obtains all of this from
  * decord/ffmpeg (`pack/dataset.py:102-108`); this is the pure-JVM
  * parity path for the uniform sampler over real H.264 video.
  */
object Interp {

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Predict a w×h luma block from `ref` (MB-aligned plane, `stride`
    * wide, `rows` tall) at quarter-pel MV (mvx, mvy) relative to
    * (xP, yP). Reference reads clamp to the plane edges (8.4.2.2.1's
    * Clip3 on sample coordinates). Output raster into out(outStride)
    * at (outX, outY). */
  def luma(ref: Array[Int], stride: Int, rows: Int, xP: Int, yP: Int,
      mvx: Int, mvy: Int, w: Int, h: Int,
      out: Array[Int], outStride: Int, outX: Int, outY: Int): Unit = {
    val x0 = xP + (mvx >> 2)
    val y0 = yP + (mvy >> 2)
    val fx = mvx & 3
    val fy = mvy & 3

    @inline def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= stride) stride - 1 else x
      val cy = if (y < 0) 0 else if (y >= rows) rows - 1 else y
      ref(cy * stride + cx)
    }
    // un-normalized 6-tap horizontal at integer row y (the "b1" values)
    @inline def b1(x: Int, y: Int): Int =
      at(x - 2, y) - 5 * at(x - 1, y) + 20 * at(x, y) +
        20 * at(x + 1, y) - 5 * at(x + 2, y) + at(x + 3, y)
    // un-normalized 6-tap vertical at integer column x (the "h1" values)
    @inline def h1(x: Int, y: Int): Int =
      at(x, y - 2) - 5 * at(x, y - 1) + 20 * at(x, y) +
        20 * at(x, y + 1) - 5 * at(x, y + 2) + at(x, y + 3)
    @inline def halfH(x: Int, y: Int): Int = clip255((b1(x, y) + 16) >> 5)
    @inline def halfV(x: Int, y: Int): Int = clip255((h1(x, y) + 16) >> 5)
    // center half-pel j: vertical 6-tap over b1 intermediates, >>10
    @inline def halfC(x: Int, y: Int): Int = clip255(
      (b1(x, y - 2) - 5 * b1(x, y - 1) + 20 * b1(x, y) +
        20 * b1(x, y + 1) - 5 * b1(x, y + 2) + b1(x, y + 3) + 512) >> 10)

    // hot path: per-pixel phase dispatch as a primitive tableswitch
    // (a (fx, fy) tuple match would box two Ints per predicted sample)
    val phase = (fy << 2) | fx
    var dy = 0
    while (dy < h) {
      val y = y0 + dy
      var dx = 0
      while (dx < w) {
        val x = x0 + dx
        // Table 8-12: G a b c / d e f g / h i j k m / n p q r
        val v = (phase: @scala.annotation.switch) match {
          case 0 => at(x, y)                                  // (0,0)
          case 1 => (at(x, y) + halfH(x, y) + 1) >> 1         // (1,0)
          case 2 => halfH(x, y)                               // (2,0)
          case 3 => (at(x + 1, y) + halfH(x, y) + 1) >> 1     // (3,0)
          case 4 => (at(x, y) + halfV(x, y) + 1) >> 1         // (0,1)
          case 5 => (halfH(x, y) + halfV(x, y) + 1) >> 1      // (1,1)
          case 6 => (halfH(x, y) + halfC(x, y) + 1) >> 1      // (2,1)
          case 7 => (halfH(x, y) + halfV(x + 1, y) + 1) >> 1  // (3,1)
          case 8 => halfV(x, y)                               // (0,2)
          case 9 => (halfV(x, y) + halfC(x, y) + 1) >> 1      // (1,2)
          case 10 => halfC(x, y)                              // (2,2)
          case 11 => (halfV(x + 1, y) + halfC(x, y) + 1) >> 1 // (3,2)
          case 12 => (at(x, y + 1) + halfV(x, y) + 1) >> 1    // (0,3)
          case 13 => (halfV(x, y) + halfH(x, y + 1) + 1) >> 1 // (1,3)
          case 14 => (halfH(x, y + 1) + halfC(x, y) + 1) >> 1 // (2,3)
          case _ => (halfV(x + 1, y) + halfH(x, y + 1) + 1) >> 1 // (3,3)
        }
        out((outY + dy) * outStride + outX + dx) = v
        dx += 1
      }
      dy += 1
    }
  }

  /** Predict a w×h chroma block (chroma-resolution coords) at the LUMA
    * quarter-pel MV — eighth-sample bilinear per 8.4.2.2.2: the chroma
    * MV equals the luma MV, one chroma sample spanning 8 MV units. */
  def chroma(ref: Array[Int], stride: Int, rows: Int, xC: Int, yC: Int,
      mvx: Int, mvy: Int, w: Int, h: Int,
      out: Array[Int], outStride: Int, outX: Int, outY: Int): Unit = {
    val x0 = xC + (mvx >> 3)
    val y0 = yC + (mvy >> 3)
    val fx = mvx & 7
    val fy = mvy & 7
    @inline def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= stride) stride - 1 else x
      val cy = if (y < 0) 0 else if (y >= rows) rows - 1 else y
      ref(cy * stride + cx)
    }
    var dy = 0
    while (dy < h) {
      val y = y0 + dy
      var dx = 0
      while (dx < w) {
        val x = x0 + dx
        out((outY + dy) * outStride + outX + dx) =
          ((8 - fx) * (8 - fy) * at(x, y) + fx * (8 - fy) * at(x + 1, y) +
            (8 - fx) * fy * at(x, y + 1) + fx * fy * at(x + 1, y + 1) +
            32) >> 6
        dx += 1
      }
      dy += 1
    }
  }
}

/** Median motion-vector prediction (spec 8.4.1.3) over a per-4x4-block
  * grid. Grid `ref` codes: [[MotionPred.Unavail]] = partition not
  * available (outside the picture or not yet decoded this frame),
  * [[MotionPred.Intra]] = intra-coded, >= 0 = inter reference index.
  * With multiple active references the "same reference" tests compare
  * each neighbor's refIdx against the CURRENT partition's (`curRef`). */
object MotionPred {
  val Unavail: Int = -2
  val Intra: Int = -1

  // partition-shape directional shortcuts (8.4.1.3 clauses 2-5)
  val PartNormal = 0
  val Part16x8Top = 1
  val Part16x8Bottom = 2
  val Part8x16Left = 3
  val Part8x16Right = 4

  @inline private def median3(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(c, math.max(a, b)))

  /** mvp for the partition whose top-left 4x4 block is (bx, by) in a
    * cols×rows block grid, spanning wB×hB blocks. `firstMb` is the
    * first macroblock address of the CURRENT slice: neighbors in
    * earlier slices are not available (6.4.9). */
  def predict(refG: Array[Int], mvxG: Array[Int], mvyG: Array[Int],
      cols: Int, rows: Int, bx: Int, by: Int, wB: Int, hB: Int,
      partKind: Int = PartNormal, firstMb: Int = 0,
      curRef: Int = 0): (Int, Int) = {

    @inline def refAt(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= cols || y >= rows) Unavail
      else if ((y / 4) * (cols / 4) + x / 4 < firstMb) Unavail
      else refG(y * cols + x)
    @inline def mvAt(x: Int, y: Int): (Int, Int) =
      if (x < 0 || y < 0 || x >= cols || y >= rows ||
        (y / 4) * (cols / 4) + x / 4 < firstMb ||
        refG(y * cols + x) < 0) (0, 0)
      else (mvxG(y * cols + x), mvyG(y * cols + x))

    val refA = refAt(bx - 1, by)
    val refB = refAt(bx, by - 1)
    var refC = refAt(bx + wB, by - 1)
    var cx = bx + wB
    if (refC == Unavail) { refC = refAt(bx - 1, by - 1); cx = bx - 1 }
    val (mvAx, mvAy) = mvAt(bx - 1, by)
    val (mvBx, mvBy) = mvAt(bx, by - 1)
    val (mvCx, mvCy) = mvAt(cx, by - 1)

    // directional rules for the two-partition MB shapes (8.4.1.3)
    partKind match {
      case Part16x8Top if refB == curRef => return (mvBx, mvBy)
      case Part16x8Bottom if refA == curRef => return (mvAx, mvAy)
      case Part8x16Left if refA == curRef => return (mvAx, mvAy)
      case Part8x16Right if refC == curRef => return (mvCx, mvCy)
      case _ =>
    }

    val matchCount = (if (refA == curRef) 1 else 0) +
      (if (refB == curRef) 1 else 0) + (if (refC == curRef) 1 else 0)
    if (matchCount == 1) {
      if (refA == curRef) (mvAx, mvAy)
      else if (refB == curRef) (mvBx, mvBy)
      else (mvCx, mvCy)
    } else if (matchCount == 0 && refB == Unavail && refC == Unavail &&
      refA != Unavail) {
      (mvAx, mvAy)
    } else {
      (median3(mvAx, mvBx, mvCx), median3(mvAy, mvBy, mvCy))
    }
  }

  /** P_Skip motion vector (8.4.1.1): the 16x16 median prediction,
    * zeroed when either top/left MB is unavailable (incl. in an
    * earlier slice) or carries a zero MV with refIdx 0. (bx, by) is
    * the MB's top-left block. */
  def skipMv(refG: Array[Int], mvxG: Array[Int], mvyG: Array[Int],
      cols: Int, rows: Int, bx: Int, by: Int,
      firstMb: Int = 0): (Int, Int) = {
    @inline def refAt(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= cols || y >= rows) Unavail
      else if ((y / 4) * (cols / 4) + x / 4 < firstMb) Unavail
      else refG(y * cols + x)
    val refA = refAt(bx - 1, by)
    val refB = refAt(bx, by - 1)
    val zeroA = refA == 0 && mvxG(by * cols + bx - 1) == 0 &&
      mvyG(by * cols + bx - 1) == 0
    val zeroB = refB == 0 && mvxG((by - 1) * cols + bx) == 0 &&
      mvyG((by - 1) * cols + bx) == 0
    if (refA == Unavail || refB == Unavail || zeroA || zeroB) (0, 0)
    else predict(refG, mvxG, mvyG, cols, rows, bx, by, 4, 4,
      PartNormal, firstMb)
  }
}
