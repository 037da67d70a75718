package graft.multimodal.h264

/** H.264 intra prediction (spec 8.3): the nine Intra_4x4 luma modes,
  * four Intra_16x16 luma modes, and four chroma 8x8 modes, operating on
  * reconstructed (pre-deblock, spec 8.3.1) sample planes. Neighbor
  * substitution for unavailable top-right samples follows 8.3.1.2.
  */
object Predict {

  // Intra_4x4 mode numbers (Table 8-2)
  val V = 0; val H = 1; val DC = 2; val DDL = 3; val DDR = 4
  val VR = 5; val HD = 6; val HU = 8; val VL = 7

  // Intra_16x16 mode numbers (Table 8-4): 0=V 1=H 2=DC 3=Plane
  // Chroma mode numbers (Table 8-5): 0=DC 1=H 2=V 3=Plane

  @inline private def clip(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Gather the 13 neighbor samples of a 4x4 block: top-left corner,
    * 8 top samples (with 8.3.1.2's top-right substitution), 4 left.
    * Unavailable samples are left as -1 (modes that would read them are
    * illegal for that availability and the bitstream may not select
    * them — decode guards with require). */
  final class Nbr4(plane: Array[Int], stride: Int, x0: Int, y0: Int,
      aL: Boolean, aT: Boolean, aTR: Boolean, aTL: Boolean) {
    val top = new Array[Int](8)
    val left = new Array[Int](4)
    var corner: Int = -1
    val availLeft: Boolean = aL
    val availTop: Boolean = aT
    val availTopLeft: Boolean = aTL
    if (aT) {
      var x = 0
      while (x < 4) { top(x) = plane((y0 - 1) * stride + x0 + x); x += 1 }
      if (aTR) {
        while (x < 8) { top(x) = plane((y0 - 1) * stride + x0 + x); x += 1 }
      } else {
        while (x < 8) { top(x) = top(3); x += 1 } // 8.3.1.2 substitution
      }
    }
    if (aL) {
      var y = 0
      while (y < 4) { left(y) = plane((y0 + y) * stride + x0 - 1); y += 1 }
    }
    if (aTL) corner = plane((y0 - 1) * stride + x0 - 1)
    /** p[x, y] in spec coordinates (x,y >= -1) */
    def p(x: Int, y: Int): Int =
      if (y == -1) { if (x == -1) corner else top(x) }
      else left(y)
  }

  /** one Intra_4x4 prediction (8.3.1.2.1-9) into out(16) raster */
  def intra4x4(mode: Int, n: Nbr4, out: Array[Int]): Unit = {
    mode match {
      case V =>
        require(n.availTop, "Intra_4x4 V needs top")
        var i = 0
        while (i < 16) { out(i) = n.top(i % 4); i += 1 }
      case H =>
        require(n.availLeft, "Intra_4x4 H needs left")
        var i = 0
        while (i < 16) { out(i) = n.left(i / 4); i += 1 }
      case DC =>
        val v =
          if (n.availLeft && n.availTop)
            (n.top(0) + n.top(1) + n.top(2) + n.top(3) +
              n.left(0) + n.left(1) + n.left(2) + n.left(3) + 4) >> 3
          else if (n.availLeft)
            (n.left(0) + n.left(1) + n.left(2) + n.left(3) + 2) >> 2
          else if (n.availTop)
            (n.top(0) + n.top(1) + n.top(2) + n.top(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(out, v)
      case DDL =>
        require(n.availTop, "DDL needs top")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (x == 3 && y == 3) (n.top(6) + 3 * n.top(7) + 2) >> 2
              else (n.top(x + y) + 2 * n.top(x + y + 1) + n.top(x + y + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case DDR =>
        require(n.availLeft && n.availTop && n.availTopLeft, "DDR needs L+T+TL")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (x > y)
                (n.p(x - y - 2, -1) + 2 * n.p(x - y - 1, -1) + n.p(x - y, -1) + 2) >> 2
              else if (x < y)
                (n.p(-1, y - x - 2) + 2 * n.p(-1, y - x - 1) + n.p(-1, y - x) + 2) >> 2
              else
                (n.top(0) + 2 * n.corner + n.left(0) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case VR =>
        require(n.availLeft && n.availTop && n.availTopLeft, "VR needs L+T+TL")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * x - y
            out(y * 4 + x) =
              if (z >= 0 && z % 2 == 0)
                (n.p(x - (y >> 1) - 1, -1) + n.p(x - (y >> 1), -1) + 1) >> 1
              else if (z >= 0)
                (n.p(x - (y >> 1) - 2, -1) + 2 * n.p(x - (y >> 1) - 1, -1) +
                  n.p(x - (y >> 1), -1) + 2) >> 2
              else if (z == -1)
                (n.left(0) + 2 * n.corner + n.top(0) + 2) >> 2
              else
                (n.p(-1, y - 1) + 2 * n.p(-1, y - 2) + n.p(-1, y - 3) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case HD =>
        require(n.availLeft && n.availTop && n.availTopLeft, "HD needs L+T+TL")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * y - x
            out(y * 4 + x) =
              if (z >= 0 && z % 2 == 0)
                (n.p(-1, y - (x >> 1) - 1) + n.p(-1, y - (x >> 1)) + 1) >> 1
              else if (z >= 0)
                (n.p(-1, y - (x >> 1) - 2) + 2 * n.p(-1, y - (x >> 1) - 1) +
                  n.p(-1, y - (x >> 1)) + 2) >> 2
              else if (z == -1)
                (n.left(0) + 2 * n.corner + n.top(0) + 2) >> 2
              else
                (n.p(x - 1, -1) + 2 * n.p(x - 2, -1) + n.p(x - 3, -1) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case VL =>
        require(n.availTop, "VL needs top")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (y % 2 == 0)
                (n.top(x + (y >> 1)) + n.top(x + (y >> 1) + 1) + 1) >> 1
              else
                (n.top(x + (y >> 1)) + 2 * n.top(x + (y >> 1) + 1) +
                  n.top(x + (y >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case HU =>
        require(n.availLeft, "HU needs left")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = x + 2 * y
            out(y * 4 + x) =
              if (z <= 4 && z % 2 == 0)
                (n.left(y + (x >> 1)) + n.left(y + (x >> 1) + 1) + 1) >> 1
              else if (z < 5)
                (n.left(y + (x >> 1)) + 2 * n.left(y + (x >> 1) + 1) +
                  n.left(y + (x >> 1) + 2) + 2) >> 2
              else if (z == 5)
                (n.left(2) + 3 * n.left(3) + 2) >> 2
              else n.left(3)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"intra4x4 mode $m")
    }
  }

  /** Intra_16x16 (8.3.3) into out(256) raster */
  def intra16x16(mode: Int, plane: Array[Int], stride: Int, x0: Int,
      y0: Int, aL: Boolean, aT: Boolean, out: Array[Int]): Unit =
    blockPred(mode, plane, stride, x0, y0, 16, aL, aT,
      planeB16 = true, out)

  /** chroma 8x8 DC/H/V/Plane (8.3.4) — note chroma mode 0 is DC. */
  def chroma8x8(mode: Int, plane: Array[Int], stride: Int, x0: Int,
      y0: Int, aL: Boolean, aT: Boolean, out: Array[Int]): Unit =
    mode match {
      case 0 => chromaDcPred(plane, stride, x0, y0, aL, aT, out)
      case 1 => blockPred(1, plane, stride, x0, y0, 8, aL, aT, false, out)
      case 2 => blockPred(0, plane, stride, x0, y0, 8, aL, aT, false, out)
      case 3 => blockPred(3, plane, stride, x0, y0, 8, aL, aT, false, out)
      case m => throw new IllegalArgumentException(s"chroma mode $m")
    }

  /** shared V/H/DC/Plane over an NxN block (modes in 16x16 numbering) */
  private def blockPred(mode: Int, plane: Array[Int], stride: Int,
      x0: Int, y0: Int, size: Int, aL: Boolean, aT: Boolean,
      planeB16: Boolean, out: Array[Int]): Unit = {
    @inline def top(x: Int) = plane((y0 - 1) * stride + x0 + x)
    @inline def left(y: Int) = plane((y0 + y) * stride + x0 - 1)
    mode match {
      case 0 =>
        require(aT, "V pred needs top")
        var i = 0
        while (i < size * size) { out(i) = top(i % size); i += 1 }
      case 1 =>
        require(aL, "H pred needs left")
        var i = 0
        while (i < size * size) { out(i) = left(i / size); i += 1 }
      case 2 =>
        var sum = 0
        var cnt = 0
        if (aT) { var x = 0; while (x < size) { sum += top(x); x += 1 }; cnt += size }
        if (aL) { var y = 0; while (y < size) { sum += left(y); y += 1 }; cnt += size }
        val v = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
        java.util.Arrays.fill(out, v)
      case 3 =>
        require(aL && aT, "Plane pred needs left+top")
        val half = size / 2
        @inline def corner = plane((y0 - 1) * stride + x0 - 1)
        var hSum = 0
        var vSum = 0
        var i = 1
        while (i <= half) {
          hSum += i * (top(half - 1 + i) - (if (half - 1 - i >= 0) top(half - 1 - i) else corner))
          vSum += i * (left(half - 1 + i) - (if (half - 1 - i >= 0) left(half - 1 - i) else corner))
          i += 1
        }
        val a = 16 * (left(size - 1) + top(size - 1))
        val (b, c) =
          if (planeB16) ((5 * hSum + 32) >> 6, (5 * vSum + 32) >> 6)
          else ((17 * hSum + 16) >> 5, (17 * vSum + 16) >> 5)
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            out(y * size + x) =
              clip((a + b * (x - half + 1) + c * (y - half + 1) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"blockPred mode $m")
    }
  }

  /** chroma DC (8.3.4.1): each 4x4 sub-block averages its own rule's
    * neighbor set. */
  private def chromaDcPred(plane: Array[Int], stride: Int, x0: Int,
      y0: Int, aL: Boolean, aT: Boolean, out: Array[Int]): Unit = {
    @inline def top(x: Int) = plane((y0 - 1) * stride + x0 + x)
    @inline def left(y: Int) = plane((y0 + y) * stride + x0 - 1)
    @inline def sumT(xs: Int) = top(xs) + top(xs + 1) + top(xs + 2) + top(xs + 3)
    @inline def sumL(ys: Int) = left(ys) + left(ys + 1) + left(ys + 2) + left(ys + 3)
    var by = 0
    while (by < 2) {
      var bx = 0
      while (bx < 2) {
        val v =
          if (bx == by) { // corner blocks: both sides when available
            if (aT && aL) (sumT(bx * 4) + sumL(by * 4) + 4) >> 3
            else if (aT) (sumT(bx * 4) + 2) >> 2
            else if (aL) (sumL(by * 4) + 2) >> 2
            else 128
          } else if (bx == 1) { // top-right block: prefer top
            if (aT) (sumT(4) + 2) >> 2
            else if (aL) (sumL(0) + 2) >> 2
            else 128
          } else { // bottom-left block: prefer left
            if (aL) (sumL(4) + 2) >> 2
            else if (aT) (sumT(0) + 2) >> 2
            else 128
          }
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out((by * 4 + y) * 8 + bx * 4 + x) = v
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
  }
}
