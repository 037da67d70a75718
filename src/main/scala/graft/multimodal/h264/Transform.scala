package graft.multimodal.h264

/** H.264 4x4 integer transforms and (de)quantization, spec 8.5.
  *
  * The INVERSE side (dequant levels → residual samples) is the
  * bit-exact path of the baseline decoder: 8.5.12.1 scaling,
  * 8.5.12.2 core transform with its (x>>1) butterflies and final
  * (r+32)>>6 rounding, 8.5.10 luma-DC 4x4 Hadamard for Intra_16x16,
  * 8.5.11 chroma-DC 2x2 Hadamard. The FORWARD side (samples → quantized
  * levels) is the fixture encoder's — any conformant bitstream is
  * acceptable there, so it uses the standard multiplier-factor
  * quantizer; decode correctness never depends on it.
  */
object Transform {

  /** LevelScale4x4 V(m, idx) with idx: 0 = positions {(0,0),(0,2),(2,0),
    * (2,2)}, 1 = {(1,1),(1,3),(3,1),(3,3)}, 2 = others (Table 8-15
    * collapsed; flat scaling lists — baseline has no
    * seq_scaling_matrix). */
  private val V = Array(
    Array(10, 16, 13),
    Array(11, 18, 14),
    Array(13, 20, 16),
    Array(14, 23, 18),
    Array(16, 25, 20),
    Array(18, 29, 23))

  /** forward multiplier factors M(m, idx), same idx classes (encoder). */
  private val M = Array(
    Array(13107, 5243, 8066),
    Array(11916, 4660, 7490),
    Array(10082, 4194, 6554),
    Array(9362, 3647, 5825),
    Array(8192, 3355, 5243),
    Array(7282, 2893, 4559))

  @inline private def posClass(i: Int, j: Int): Int =
    if ((i == 0 || i == 2) && (j == 0 || j == 2)) 0
    else if ((i == 1 || i == 3) && (j == 1 || j == 3)) 1
    else 2

  def levelScale(qpMod6: Int, i: Int, j: Int): Int = V(qpMod6)(posClass(i, j))
  def mf(qpMod6: Int, i: Int, j: Int): Int = M(qpMod6)(posClass(i, j))

  /** 4x4 zig-zag scan order (Table 8-13 frame scan): scan index →
    * raster index. */
  val ZigZag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** chroma QP mapping, Table 8-15's QPc from qPi (spec 8.5.8). */
  private val ChromaQp = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
    37, 37, 37, 38, 38, 38, 39, 39, 39, 39)

  def chromaQp(qpY: Int, chromaQpOffset: Int): Int = {
    val qpi = math.max(0, math.min(51, qpY + chromaQpOffset))
    if (qpi < 30) qpi else ChromaQp(qpi - 30)
  }

  /** 8.5.12.1: scale AC levels (raster order, block(0) skipped when
    * `skipDc`) in place into the dequantized coefficient block. For
    * qP < 24 the low-QP rounding form applies. */
  def dequant4x4(block: Array[Int], qp: Int, skipDc: Boolean): Unit = {
    val mod = qp % 6
    val shift = qp / 6
    var idx = if (skipDc) 1 else 0
    while (idx < 16) {
      val i = idx / 4
      val j = idx % 4
      val ls = levelScale(mod, i, j)
      // 8.5.12.1 note: for 4x4 residual blocks the scaling is uniformly
      // (c * LS) << (qP/6 - 4) folded with the transform's >>6; the
      // widely used bit-exact equivalent keeps (c * LS) << (qP/6) here
      // and a fixed (x + 32) >> 6 in the core transform.
      block(idx) = (block(idx) * ls) << shift
      idx += 1
    }
  }

  /** 8.5.12.2 core inverse transform: d (dequantized, raster) →
    * residual r, including the final (x + 32) >> 6. Bit-exact. */
  def inverse4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    // horizontal
    var i = 0
    while (i < 4) {
      val o = i * 4
      val a0 = d(o) + d(o + 2)
      val a1 = d(o) - d(o + 2)
      val a2 = (d(o + 1) >> 1) - d(o + 3)
      val a3 = d(o + 1) + (d(o + 3) >> 1)
      e(o) = a0 + a3
      e(o + 1) = a1 + a2
      e(o + 2) = a1 - a2
      e(o + 3) = a0 - a3
      i += 1
    }
    val r = new Array[Int](16)
    // vertical
    var j = 0
    while (j < 4) {
      val b0 = e(j) + e(8 + j)
      val b1 = e(j) - e(8 + j)
      val b2 = (e(4 + j) >> 1) - e(12 + j)
      val b3 = e(4 + j) + (e(12 + j) >> 1)
      r(j) = (b0 + b3 + 32) >> 6
      r(4 + j) = (b1 + b2 + 32) >> 6
      r(8 + j) = (b1 - b2 + 32) >> 6
      r(12 + j) = (b0 - b3 + 32) >> 6
      j += 1
    }
    r
  }

  /** 8.5.10: Intra_16x16 luma DC — 4x4 inverse Hadamard on the 16 DC
    * levels (raster order of the 4x4 DC grid) then qP-dependent
    * scaling. Returns the per-block DC values to seed each AC block's
    * position 0. */
  def lumaDc(levels: Array[Int], qp: Int): Array[Int] = {
    val f = hadamard4x4(levels)
    val ls = levelScale(qp % 6, 0, 0)
    val out = new Array[Int](16)
    var k = 0
    while (k < 16) {
      out(k) =
        if (qp >= 36) (f(k) * ls) << (qp / 6 - 6)
        else (f(k) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      k += 1
    }
    out
  }

  /** plain 4x4 Hadamard (self-inverse up to scale), used by 8.5.10 both
    * directions. */
  def hadamard4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val a0 = d(o) + d(o + 2)
      val a1 = d(o) - d(o + 2)
      val a2 = d(o + 1) - d(o + 3)
      val a3 = d(o + 1) + d(o + 3)
      e(o) = a0 + a3
      e(o + 1) = a1 + a2
      e(o + 2) = a1 - a2
      e(o + 3) = a0 - a3
      i += 1
    }
    val r = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val b0 = e(j) + e(8 + j)
      val b1 = e(j) - e(8 + j)
      val b2 = e(4 + j) - e(12 + j)
      val b3 = e(4 + j) + e(12 + j)
      r(j) = b0 + b3
      r(4 + j) = b1 + b2
      r(8 + j) = b1 - b2
      r(12 + j) = b0 - b3
      j += 1
    }
    r
  }

  /** 8.5.11: chroma DC — 2x2 Hadamard on the 4 DC levels (raster) then
    * scaling with the final >> 5. */
  def chromaDc(levels: Array[Int], qpc: Int): Array[Int] = {
    val a = levels(0) + levels(1)
    val b = levels(0) - levels(1)
    val c = levels(2) + levels(3)
    val d = levels(2) - levels(3)
    val f = Array(a + c, b + d, a - c, b - d)
    val ls = levelScale(qpc % 6, 0, 0)
    f.map(v => ((v * ls) << (qpc / 6)) >> 5)
  }

  // ---- forward side (fixture encoder only) ----

  /** forward 4x4 core transform (spec 8.5's inverse's transpose pair):
    * residual samples → transform coefficients. */
  def forward4x4(x: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val s0 = x(o) + x(o + 3)
      val s1 = x(o + 1) + x(o + 2)
      val s2 = x(o + 1) - x(o + 2)
      val s3 = x(o) - x(o + 3)
      e(o) = s0 + s1
      e(o + 1) = 2 * s3 + s2
      e(o + 2) = s0 - s1
      e(o + 3) = s3 - 2 * s2
      i += 1
    }
    val w = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val s0 = e(j) + e(12 + j)
      val s1 = e(4 + j) + e(8 + j)
      val s2 = e(4 + j) - e(8 + j)
      val s3 = e(j) - e(12 + j)
      w(j) = s0 + s1
      w(4 + j) = 2 * s3 + s2
      w(8 + j) = s0 - s1
      w(12 + j) = s3 - 2 * s2
      j += 1
    }
    w
  }

  /** quantize one AC coefficient (encoder): standard MF/qbits form with
    * intra rounding f = 2^qbits / 3. */
  def quantAc(w: Int, qp: Int, i: Int, j: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val m = mf(qp % 6, i, j)
    val level = (math.abs(w) * m + f) >> qbits
    if (w < 0) -level else level
  }

  /** Quantize a luma-DC coefficient (post-4x4-Hadamard, encoder). The
    * shift is qbits-2: the encode Hadamard carries gain 16 where the
    * decode side's (8.5.10) carries 1 on a single-level grid, and the
    * DC path skips the AC dequant's x4 — the net x8 is returned here
    * so encode∘decode has unit gain (verified by the I16 roundtrip
    * spec). */
  def quantLumaDc(w: Int, qp: Int): Int = {
    val qbits = 13 + qp / 6
    val f = (1 << qbits) / 3
    val m = mf(qp % 6, 0, 0)
    val level = (math.abs(w) * m + f) >> qbits
    if (w < 0) -level else level
  }

  /** quantize a chroma-DC coefficient (post-2x2-Hadamard, encoder);
    * the 2x2 Hadamard pair carries gain 4 and 8.5.11's >>5 replaces a
    * >>6, so the shift is qbits-3 */
  def quantChromaDc(w: Int, qp: Int): Int = {
    val qbits = 12 + qp / 6
    val f = (1 << qbits) / 3
    val m = mf(qp % 6, 0, 0)
    val level = (math.abs(w) * m + f) >> qbits
    if (w < 0) -level else level
  }
}
