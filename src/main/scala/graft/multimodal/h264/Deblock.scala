package graft.multimodal.h264

/** H.264 in-loop deblocking filter (spec 8.7). The I-slice path keeps
  * the fixed intra strengths (bS = 4 on MB edges, 3 on internal 4x4
  * edges); P slices pass a [[Deblock.FrameMeta]] so bS derives per
  * 4x4-block edge from the 8.7.2.1 rules (intra → 4/3, coded residual
  * → 2, MV delta ≥ one full sample → 1, else 0 = unfiltered). I_PCM
  * macroblocks carry QP 0 (alpha(0) = 0 disables their edges
  * naturally, 8.7.2). Filters in the spec's order — all vertical
  * edges of an MB, then its horizontal edges, MBs in raster order —
  * using already-filtered samples as later-edge inputs.
  */
object Deblock {

  /** per-4x4-block side inputs for inter bS derivation (8.7.2.1):
    * `intraMb` per MB; `nzY` total luma coefficients per block; then
    * per reference list the referenced-PICTURE identity (`pid*` — any
    * stable code where equal values mean the same picture; < 0 = list
    * unused) and the quarter-pel MVs. P-only frames leave list 1
    * unused everywhere. */
  final case class FrameMeta(intraMb: Array[Boolean], nzY: Array[Int],
      pid0: Array[Int], mvx0: Array[Int], mvy0: Array[Int],
      pid1: Array[Int], mvx1: Array[Int], mvy1: Array[Int])

  object FrameMeta {
    /** single-list (P) compatibility shape: refGrid doubles as the
      * picture-id grid (within one list, same index = same picture) */
    def apply(intraMb: Array[Boolean], nzY: Array[Int],
        refGrid: Array[Int], mvxGrid: Array[Int],
        mvyGrid: Array[Int]): FrameMeta =
      FrameMeta(intraMb, nzY, refGrid, mvxGrid, mvyGrid,
        Array.fill(refGrid.length)(-1),
        new Array[Int](refGrid.length), new Array[Int](refGrid.length))
  }

  private val Alpha: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
    127, 144, 162, 182, 203, 226, 255, 255)

  private val Beta: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14,
    15, 15, 16, 16, 17, 17, 18, 18)

  /** tc0 by [index][bS-1] (Table 8-17) */
  private val Tc0: Array[Array[Int]] = Array(
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 1), Array(0, 0, 1), Array(0, 0, 1),
    Array(0, 0, 1), Array(0, 1, 1), Array(0, 1, 1), Array(1, 1, 1),
    Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 2),
    Array(1, 1, 2), Array(1, 1, 2), Array(1, 1, 2), Array(1, 2, 3),
    Array(1, 2, 3), Array(2, 2, 3), Array(2, 2, 4), Array(2, 3, 4),
    Array(2, 3, 4), Array(3, 3, 5), Array(3, 4, 6), Array(3, 4, 6),
    Array(4, 5, 7), Array(4, 5, 8), Array(5, 6, 9), Array(6, 7, 10),
    Array(6, 8, 11), Array(7, 9, 13), Array(8, 10, 14), Array(9, 12, 16),
    Array(10, 13, 18), Array(11, 15, 20), Array(13, 17, 23),
    Array(14, 19, 25))

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  @inline private def clip255(v: Int): Int = clip3(0, 255, v)

  /** filter one line of samples across an edge; `get`/`set` address
    * sample i where -4..-1 = p3..p0 and 0..3 = q0..q3. */
  private def filterLine(get: Int => Int, set: (Int, Int) => Unit,
      bS: Int, alpha: Int, beta: Int, tc0In: Int, chroma: Boolean): Unit = {
    val p0 = get(-1); val p1 = get(-2); val p2 = get(-3)
    val q0 = get(0); val q1 = get(1); val q2 = get(2)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return
    if (bS < 4) {
      val ap = !chroma && math.abs(p2 - p0) < beta
      val aq = !chroma && math.abs(q2 - q0) < beta
      val tc = tc0In + (if (ap) 1 else 0) + (if (aq) 1 else 0) +
        (if (chroma) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      set(-1, clip255(p0 + delta))
      set(0, clip255(q0 - delta))
      if (ap) set(-2, p1 + clip3(-tc0In, tc0In,
        (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
      if (aq) set(1, q1 + clip3(-tc0In, tc0In,
        (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
    } else {
      if (chroma) {
        set(-1, (2 * p1 + p0 + q1 + 2) >> 2)
        set(0, (2 * q1 + q0 + p1 + 2) >> 2)
      } else {
        val p3 = get(-4); val q3 = get(3)
        val strong = math.abs(p0 - q0) < (alpha >> 2) + 2
        if (strong && math.abs(p2 - p0) < beta) {
          set(-1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
          set(-2, (p2 + p1 + p0 + q0 + 2) >> 2)
          set(-3, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
        } else set(-1, (2 * p1 + p0 + q1 + 2) >> 2)
        if (strong && math.abs(q2 - q0) < beta) {
          set(0, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
          set(1, (q2 + q1 + q0 + p0 + 2) >> 2)
          set(2, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
        } else set(0, (2 * q1 + q0 + p1 + 2) >> 2)
      }
    }
  }

  /** Deblock a full frame in place.
    * @param mbQp   per-MB luma QP (raster order; PCM MBs must carry 0)
    * @param offA   2 * slice_alpha_c0_offset_div2
    * @param offB   2 * slice_beta_offset_div2
    * @param chromaQpOffset PPS chroma_qp_index_offset
    * @param meta   null for all-intra frames (bS fixed 4/3); P-slice
    *               decode passes block-level inputs for 8.7.2.1 */
  def frame(y: Array[Int], cb: Array[Int], cr: Array[Int], mbW: Int,
      mbH: Int, mbQp: Array[Int], offA: Int, offB: Int,
      chromaQpOffset: Int, meta: FrameMeta = null): Unit = {
    val strideY = mbW * 16
    val strideC = mbW * 8
    val bCols = mbW * 4

    /** bS across the edge between luma 4x4 blocks p and q (8.7.2.1) */
    def bsBlocks(pbx: Int, pby: Int, qbx: Int, qby: Int,
        mbEdge: Boolean): Int = {
      if (meta == null) return if (mbEdge) 4 else 3
      val pIntra = meta.intraMb((pby / 4) * mbW + pbx / 4)
      val qIntra = meta.intraMb((qby / 4) * mbW + qbx / 4)
      if (pIntra || qIntra) return if (mbEdge) 4 else 3
      val pi = pby * bCols + pbx
      val qi = qby * bCols + qbx
      if (meta.nzY(pi) > 0 || meta.nzY(qi) > 0) return 2
      // 8.7.2.1 motion comparison: different reference pictures, a
      // different prediction-direction count, or an MV delta of a full
      // sample or more (paired by picture for bi-predicted blocks) -> 1
      @inline def far(ax: Int, ay: Int, bx2: Int, by2: Int): Boolean =
        math.abs(ax - bx2) >= 4 || math.abs(ay - by2) >= 4
      val p0 = meta.pid0(pi); val p1 = meta.pid1(pi)
      val q0 = meta.pid0(qi); val q1 = meta.pid1(qi)
      val nP = (if (p0 >= 0) 1 else 0) + (if (p1 >= 0) 1 else 0)
      val nQ = (if (q0 >= 0) 1 else 0) + (if (q1 >= 0) 1 else 0)
      if (nP != nQ) return 1
      if (nP <= 1) {
        // uni-predicted both sides: same picture + small delta -> 0
        val (pp, pmx, pmy) =
          if (p0 >= 0) (p0, meta.mvx0(pi), meta.mvy0(pi))
          else (p1, meta.mvx1(pi), meta.mvy1(pi))
        val (qp2, qmx, qmy) =
          if (q0 >= 0) (q0, meta.mvx0(qi), meta.mvy0(qi))
          else (q1, meta.mvx1(qi), meta.mvy1(qi))
        if (pp != qp2 || far(pmx, pmy, qmx, qmy)) 1 else 0
      } else {
        // bi-predicted both sides: reference SETS must match
        val sameStraight = p0 == q0 && p1 == q1
        val sameCross = p0 == q1 && p1 == q0
        if (!sameStraight && !sameCross) return 1
        def okStraight =
          !far(meta.mvx0(pi), meta.mvy0(pi), meta.mvx0(qi), meta.mvy0(qi)) &&
          !far(meta.mvx1(pi), meta.mvy1(pi), meta.mvx1(qi), meta.mvy1(qi))
        def okCross =
          !far(meta.mvx0(pi), meta.mvy0(pi), meta.mvx1(qi), meta.mvy1(qi)) &&
          !far(meta.mvx1(pi), meta.mvy1(pi), meta.mvx0(qi), meta.mvy0(qi))
        if (p0 == p1) {
          // both lists reference the same picture: either pairing may
          // satisfy the small-delta condition (8.7.2.1 note)
          if (okStraight || okCross) 0 else 1
        } else {
          // distinct pictures: pair MVs by picture
          val ok = if (sameStraight) okStraight else okCross
          if (ok) 0 else 1
        }
      }
    }

    /** filter nLines across an edge; bsOf maps the line index to its
      * 4x4-block-pair bS (constant within each 4-line luma / 2-line
      * chroma group). */
    def edge(plane: Array[Int], stride: Int, x0: Int, y0: Int,
        nLines: Int, vertical: Boolean, bsOf: Int => Int, qpAv: Int,
        chroma: Boolean): Unit = {
      val indexA = clip3(0, 51, qpAv + offA)
      val indexB = clip3(0, 51, qpAv + offB)
      val alpha = Alpha(indexA)
      val beta = Beta(indexB)
      if (alpha == 0 || beta == 0) return
      var k = 0
      while (k < nLines) {
        val bS = bsOf(k)
        if (bS > 0) {
          val tc0 = if (bS < 4) Tc0(indexA)(bS - 1) else 0
          if (vertical) {
            val base = (y0 + k) * stride + x0
            filterLine(i => plane(base + i), (i, v) => plane(base + i) = v,
              bS, alpha, beta, tc0, chroma)
          } else {
            val base = y0 * stride + x0 + k
            filterLine(i => plane(base + i * stride),
              (i, v) => plane(base + i * stride) = v,
              bS, alpha, beta, tc0, chroma)
          }
        }
        k += 1
      }
    }

    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val qp = mbQp(mbY * mbW + mbX)
        val qpc = Transform.chromaQp(qp, chromaQpOffset)
        val bx0 = mbX * 4
        val by0 = mbY * 4
        // vertical edges (filter across columns), left MB edge first
        if (mbX > 0) {
          val qpL = mbQp(mbY * mbW + mbX - 1)
          val qpAvY = (qp + qpL + 1) >> 1
          val qpAvC = (qpc + Transform.chromaQp(qpL, chromaQpOffset) + 1) >> 1
          def bsV(lumaRow: Int): Int =
            bsBlocks(bx0 - 1, by0 + lumaRow, bx0, by0 + lumaRow, true)
          edge(y, strideY, mbX * 16, mbY * 16, 16, true,
            k => bsV(k / 4), qpAvY, false)
          edge(cb, strideC, mbX * 8, mbY * 8, 8, true,
            k => bsV(k / 2), qpAvC, true)
          edge(cr, strideC, mbX * 8, mbY * 8, 8, true,
            k => bsV(k / 2), qpAvC, true)
        }
        var e = 1
        while (e < 4) {
          val ec = e
          edge(y, strideY, mbX * 16 + e * 4, mbY * 16, 16, true,
            k => bsBlocks(bx0 + ec - 1, by0 + k / 4, bx0 + ec, by0 + k / 4,
              false), qp, false)
          if (e == 2) {
            def bsC(k: Int): Int =
              bsBlocks(bx0 + 1, by0 + k / 2, bx0 + 2, by0 + k / 2, false)
            edge(cb, strideC, mbX * 8 + 4, mbY * 8, 8, true, bsC, qpc, true)
            edge(cr, strideC, mbX * 8 + 4, mbY * 8, 8, true, bsC, qpc, true)
          }
          e += 1
        }
        // horizontal edges, top MB edge first
        if (mbY > 0) {
          val qpT = mbQp((mbY - 1) * mbW + mbX)
          val qpAvY = (qp + qpT + 1) >> 1
          val qpAvC = (qpc + Transform.chromaQp(qpT, chromaQpOffset) + 1) >> 1
          def bsH(lumaCol: Int): Int =
            bsBlocks(bx0 + lumaCol, by0 - 1, bx0 + lumaCol, by0, true)
          edge(y, strideY, mbX * 16, mbY * 16, 16, false,
            k => bsH(k / 4), qpAvY, false)
          edge(cb, strideC, mbX * 8, mbY * 8, 8, false,
            k => bsH(k / 2), qpAvC, true)
          edge(cr, strideC, mbX * 8, mbY * 8, 8, false,
            k => bsH(k / 2), qpAvC, true)
        }
        e = 1
        while (e < 4) {
          val ec = e
          edge(y, strideY, mbX * 16, mbY * 16 + e * 4, 16, false,
            k => bsBlocks(bx0 + k / 4, by0 + ec - 1, bx0 + k / 4, by0 + ec,
              false), qp, false)
          if (e == 2) {
            def bsC(k: Int): Int =
              bsBlocks(bx0 + k / 2, by0 + 1, bx0 + k / 2, by0 + 2, false)
            edge(cb, strideC, mbX * 8, mbY * 8 + 4, 8, false, bsC, qpc, true)
            edge(cr, strideC, mbX * 8, mbY * 8 + 4, 8, false, bsC, qpc, true)
          }
          e += 1
        }
        mbX += 1
      }
      mbY += 1
    }
  }
}
