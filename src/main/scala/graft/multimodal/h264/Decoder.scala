package graft.multimodal.h264

/** Pure-JVM H.264 baseline I-frame decoder: AVCC samples (length-
  * prefixed NALs, avcC config from the mp4 stsd entry) → YUV 4:2:0
  * pixel planes. Covers what the reference's keyframe path needs
  * (`pack/samplers.py:121-157` extracts I-frames via decord/ffmpeg;
  * intra-only decode reproduces exactly those): CAVLC entropy coding,
  * Intra_4x4 / Intra_16x16 / I_PCM macroblocks, chroma intra modes,
  * dequant + inverse transforms, in-loop deblocking. Non-baseline or
  * inter features (CABAC, P/B slices, fields, 8x8 transform) raise
  * [[UnsupportedFeature]] so the FrameSource seam can triage
  * them as the typed unsupported-codec signal (mm13) instead of
  * emitting garbage pixels.
  */
object Decoder {

  final case class AvcConfig(sps: Sps, pps: Pps, nalLengthSize: Int)

  /** decoded frame; planes are MB-aligned, `width`/`height` are the
    * cropped picture dims */
  final case class Yuv(width: Int, height: Int, mbW: Int, mbH: Int,
      y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    def strideY: Int = mbW * 16
    def strideC: Int = mbW * 8
    def luma(x: Int, yy: Int): Int = y(yy * strideY + x)
    /** nearest-neighbor 4:2:0 chroma at luma coords */
    def chromaB(x: Int, yy: Int): Int = cb((yy / 2) * strideC + x / 2)
    def chromaR(x: Int, yy: Int): Int = cr((yy / 2) * strideC + x / 2)
  }

  /** parse the avcC box payload (ISO 14496-15 5.2.4.1.1) */
  def parseAvcc(b: Array[Byte]): AvcConfig = {
    require(b.length >= 7 && b(0) == 1, "bad avcC")
    val lengthSize = (b(4) & 3) + 1
    var pos = 5
    val nSps = b(pos) & 0x1f
    pos += 1
    require(nSps >= 1, "avcC without SPS")
    var sps: Sps = null
    var i = 0
    while (i < nSps) {
      val len = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)
      pos += 2
      if (i == 0) sps = Sps.parse(Nal.unescape(
        java.util.Arrays.copyOfRange(b, pos + 1, pos + len)))
      pos += len
      i += 1
    }
    val nPps = b(pos) & 0xff
    pos += 1
    require(nPps >= 1, "avcC without PPS")
    val len = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)
    pos += 2
    val pps = Pps.parse(Nal.unescape(
      java.util.Arrays.copyOfRange(b, pos + 1, pos + len)))
    AvcConfig(sps, pps, lengthSize)
  }

  @inline private def clip(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** z-scan order of the 16 luma 4x4 blocks as (bx, by) */
  private val ZOrder: Array[(Int, Int)] = Array(
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))

  private def zIndex(bx: Int, by: Int): Int =
    ((by >> 1) * 2 + (bx >> 1)) * 4 + (by & 1) * 2 + (bx & 1)

  /** Table 9-4 codeNum → coded_block_pattern, intra column */
  private val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  private[h264] def cbpFromCodeNum(codeNum: Int): Int = {
    require(codeNum < 48, s"coded_block_pattern codeNum $codeNum")
    CbpIntra(codeNum)
  }

  private[h264] def codeNumFromCbp(cbp: Int): Int = {
    val i = CbpIntra.indexOf(cbp)
    require(i >= 0, s"cbp $cbp")
    i
  }

  /** decode one AVCC sample into a YUV frame */
  def decode(sample: Array[Byte], cfg: AvcConfig): Yuv = {
    val nals = Nal.splitAvccSample(sample, cfg.nalLengthSize)
    val slice = nals.collectFirst {
      case (t, refIdc, rbsp) if t == 5 || t == 1 => (t, refIdc, rbsp)
    }.getOrElse(throw UnsupportedFeature("no slice NAL in sample"))
    decodeSlice(slice._3, slice._1 == 5, slice._2, cfg)
  }

  // scratch holder for a parsed macroblock's residual levels
  private final class MbResidual {
    var mbType = 0
    var intra4x4Modes: Array[Int] = null // decode order z-index
    var i16PredMode = 0
    var chromaPredMode = 0
    var cbp = 0
    var qpY = 0
    var lumaDcLevels: Array[Int] = null // raster over DC grid
    val lumaAc = new Array[Array[Int]](16) // z-index -> raster coeffs
    val chromaDc = new Array[Array[Int]](2)
    val chromaAc = Array.ofDim[Array[Int]](2, 4)
    var pcmY: Array[Int] = null
    var pcmCb: Array[Int] = null
    var pcmCr: Array[Int] = null
    def isPcm: Boolean = pcmY != null
    def isI16: Boolean = !isPcm && mbType >= 1
  }

  private def decodeSlice(rbsp: Array[Byte], idr: Boolean, refIdc: Int,
      cfg: AvcConfig): Yuv = {
    val sps = cfg.sps
    val pps = cfg.pps
    val r = new BitReader(rbsp)
    // --- slice_header (7.3.3) ---
    val firstMb = r.ue()
    if (firstMb != 0) throw UnsupportedFeature("multi-slice picture")
    val sliceType = r.ue()
    if (sliceType % 5 != 2) throw UnsupportedFeature(
      s"slice_type $sliceType (only I)")
    require(r.ue() == 0, "pps id")
    r.u(sps.log2MaxFrameNum) // frame_num
    if (idr) r.ue() // idr_pic_id
    if (sps.picOrderCntType == 0) r.u(sps.log2MaxPocLsb)
    if (idr) { r.u1(); r.u1() } // no_output_of_prior / long_term_ref
    else if (refIdc > 0) {
      // dec_ref_pic_marking for a non-IDR reference picture (7.3.3.3)
      if (r.u1() == 1) throw UnsupportedFeature("adaptive ref pic marking")
    }
    val sliceQp = pps.picInitQp + r.se()
    var disableDeblock = 0
    var offA = 0
    var offB = 0
    if (pps.deblockingFilterControlPresent) {
      disableDeblock = r.ue()
      if (disableDeblock != 1) { offA = 2 * r.se(); offB = 2 * r.se() }
    }

    val mbW = sps.mbWidth
    val mbH = sps.mbHeight
    val strideY = mbW * 16
    val strideC = mbW * 8
    val y = new Array[Int](strideY * mbH * 16)
    val cb = new Array[Int](strideC * mbH * 8)
    val cr = new Array[Int](strideC * mbH * 8)
    // per-4x4-block nonzero-coefficient counts for CAVLC nC contexts
    val nzY = new Array[Int](mbW * 4 * mbH * 4)
    val nzCb = new Array[Int](mbW * 2 * mbH * 2)
    val nzCr = new Array[Int](mbW * 2 * mbH * 2)
    // per-4x4-block Intra_4x4 modes (DC for non-I4x4 MBs, 8.3.1.1)
    val modeMap = Array.fill(mbW * 4 * mbH * 4)(2)
    val mbQp = new Array[Int](mbW * mbH)
    var prevQp = sliceQp

    def nzAt(map: Array[Int], cols: Int, bx: Int, by: Int): Int =
      map(by * cols + bx)

    def lumaNc(gbx: Int, gby: Int): Int = {
      val hasA = gbx > 0
      val hasB = gby > 0
      if (hasA && hasB)
        (nzAt(nzY, mbW * 4, gbx - 1, gby) + nzAt(nzY, mbW * 4, gbx, gby - 1) + 1) >> 1
      else if (hasA) nzAt(nzY, mbW * 4, gbx - 1, gby)
      else if (hasB) nzAt(nzY, mbW * 4, gbx, gby - 1)
      else 0
    }

    def chromaNc(map: Array[Int], gbx: Int, gby: Int): Int = {
      val hasA = gbx > 0
      val hasB = gby > 0
      if (hasA && hasB)
        (nzAt(map, mbW * 2, gbx - 1, gby) + nzAt(map, mbW * 2, gbx, gby - 1) + 1) >> 1
      else if (hasA) nzAt(map, mbW * 2, gbx - 1, gby)
      else if (hasB) nzAt(map, mbW * 2, gbx, gby - 1)
      else 0
    }

    /** zig-zag scan positions -> 4x4 raster */
    def unscan(coeffs: Array[Int], skipDc: Boolean): Array[Int] = {
      val out = new Array[Int](16)
      val off = if (skipDc) 1 else 0
      var k = 0
      while (k < coeffs.length) {
        out(Transform.ZigZag4x4(k + off)) = coeffs(k)
        k += 1
      }
      out
    }

    var mbIdx = 0
    while (mbIdx < mbW * mbH) {
      val mbX = mbIdx % mbW
      val mbY = mbIdx / mbW
      val mb = new MbResidual

      // --- macroblock_layer (7.3.5), I-slice ---
      mb.mbType = r.ue()
      if (mb.mbType > 25) throw UnsupportedFeature(s"mb_type ${mb.mbType}")

      if (mb.mbType == 25) { // I_PCM
        r.alignToByte()
        mb.pcmY = Array.fill(256)(r.u(8))
        mb.pcmCb = Array.fill(64)(r.u(8))
        mb.pcmCr = Array.fill(64)(r.u(8))
        mb.qpY = prevQp // unchanged for subsequent delta chains
        mbQp(mbIdx) = 0 // 8.7.2: PCM edges filter with QP 0
        var k = 0
        while (k < 16) {
          val (bx, by) = ZOrder(k)
          nzY((mbY * 4 + by) * mbW * 4 + mbX * 4 + bx) = 16
          k += 1
        }
        var c = 0
        while (c < 4) {
          nzCb((mbY * 2 + c / 2) * mbW * 2 + mbX * 2 + c % 2) = 16
          nzCr((mbY * 2 + c / 2) * mbW * 2 + mbX * 2 + c % 2) = 16
          c += 1
        }
      } else {
        if (mb.mbType == 0) { // I_NxN = Intra_4x4 (no 8x8 in baseline)
          mb.intra4x4Modes = new Array[Int](16)
          var k = 0
          while (k < 16) {
            val (bx, by) = ZOrder(k)
            val gbx = mbX * 4 + bx
            val gby = mbY * 4 + by
            val mA = if (gbx > 0) modeMap(gby * mbW * 4 + gbx - 1) else 2
            val mB = if (gby > 0) modeMap((gby - 1) * mbW * 4 + gbx) else 2
            val pred = math.min(mA, mB)
            mb.intra4x4Modes(k) =
              if (r.u1() == 1) pred
              else { val rem = r.u(3); if (rem < pred) rem else rem + 1 }
            modeMap(gby * mbW * 4 + gbx) = mb.intra4x4Modes(k)
            k += 1
          }
          mb.chromaPredMode = r.ue()
          val codeNum = r.ue()
          mb.cbp = cbpFromCodeNum(codeNum)
        } else { // I_16x16, mb_type 1..24
          val t = mb.mbType - 1
          mb.i16PredMode = t % 4
          mb.cbp = ((t / 4) % 3 << 4) | (if (t >= 12) 15 else 0)
          mb.chromaPredMode = r.ue()
        }
        require(mb.chromaPredMode <= 3, "chroma pred mode")

        if (mb.cbp != 0 || mb.isI16) {
          val delta = r.se()
          require(delta >= -26 && delta <= 25, s"mb_qp_delta $delta")
          prevQp = ((prevQp + delta + 52) % 52)
        }
        mb.qpY = prevQp
        mbQp(mbIdx) = prevQp

        // --- residual (7.3.5.3.2, CAVLC) ---
        if (mb.isI16) {
          val blk = Cavlc.readBlock(r, lumaNc(mbX * 4, mbY * 4), 16)
          mb.lumaDcLevels = unscan(blk.coeffs, skipDc = false)
        }
        var i8 = 0
        while (i8 < 4) {
          var i4 = 0
          while (i4 < 4) {
            val k = i8 * 4 + i4
            val (bx, by) = ZOrder(k)
            val gbx = mbX * 4 + bx
            val gby = mbY * 4 + by
            if ((mb.cbp & (1 << i8)) != 0) {
              val nc = lumaNc(gbx, gby)
              val blk =
                if (mb.isI16) Cavlc.readBlock(r, nc, 15)
                else Cavlc.readBlock(r, nc, 16)
              mb.lumaAc(k) = unscan(blk.coeffs, skipDc = mb.isI16)
              nzY(gby * mbW * 4 + gbx) = blk.totalCoeff
            } else nzY(gby * mbW * 4 + gbx) = 0
            i4 += 1
          }
          i8 += 1
        }
        val cbpChroma = mb.cbp >> 4
        if (cbpChroma != 0) {
          var c = 0
          while (c < 2) {
            mb.chromaDc(c) = Cavlc.readBlock(r, -1, 4).coeffs
            c += 1
          }
        }
        var c = 0
        while (c < 2) {
          val map = if (c == 0) nzCb else nzCr
          var b = 0
          while (b < 4) {
            val gbx = mbX * 2 + b % 2
            val gby = mbY * 2 + b / 2
            if (cbpChroma == 2) {
              val blk = Cavlc.readBlock(r, chromaNc(map, gbx, gby), 15)
              mb.chromaAc(c)(b) = unscan(blk.coeffs, skipDc = true)
              map(gby * mbW * 2 + gbx) = blk.totalCoeff
            } else map(gby * mbW * 2 + gbx) = 0
            b += 1
          }
          c += 1
        }
      }

      // --- reconstruction (8.3 prediction + 8.5 transforms) ---
      reconstruct(mb, mbX, mbY, mbW, mbH, y, cb, cr, strideY, strideC, pps)
      mbIdx += 1
    }

    if (disableDeblock != 1)
      Deblock.frame(y, cb, cr, mbW, mbH, mbQp, offA, offB,
        pps.chromaQpOffset)

    Yuv(sps.width, sps.height, mbW, mbH, y, cb, cr)
  }

  private def reconstruct(mb: MbResidual, mbX: Int, mbY: Int, mbW: Int,
      mbH: Int, y: Array[Int], cb: Array[Int], cr: Array[Int],
      strideY: Int, strideC: Int, pps: Pps): Unit = {
    val x0 = mbX * 16
    val y0 = mbY * 16

    if (mb.isPcm) {
      var i = 0
      while (i < 256) {
        y((y0 + i / 16) * strideY + x0 + i % 16) = mb.pcmY(i)
        i += 1
      }
      i = 0
      while (i < 64) {
        cb((mbY * 8 + i / 8) * strideC + mbX * 8 + i % 8) = mb.pcmCb(i)
        cr((mbY * 8 + i / 8) * strideC + mbX * 8 + i % 8) = mb.pcmCr(i)
        i += 1
      }
      return
    }

    val qp = mb.qpY
    if (mb.isI16) {
      val pred = new Array[Int](256)
      Predict.intra16x16(mb.i16PredMode, y, strideY, x0, y0,
        mbX > 0, mbY > 0, pred)
      val dc =
        if (mb.lumaDcLevels != null) Transform.lumaDc(mb.lumaDcLevels, qp)
        else new Array[Int](16)
      var k = 0
      while (k < 16) {
        val (bx, by) = ZOrder(k)
        val d =
          if (mb.lumaAc(k) != null) {
            val c = mb.lumaAc(k).clone()
            Transform.dequant4x4(c, qp, skipDc = true)
            c
          } else new Array[Int](16)
        d(0) = dc(by * 4 + bx)
        val res = Transform.inverse4x4(d)
        var i = 0
        while (i < 16) {
          val px = x0 + bx * 4 + i % 4
          val py = y0 + by * 4 + i / 4
          y(py * strideY + px) = clip(pred((py - y0) * 16 + (px - x0)) + res(i))
          i += 1
        }
        k += 1
      }
    } else {
      // Intra_4x4: reconstruct in z-order so neighbors are ready
      val predBuf = new Array[Int](16)
      var k = 0
      while (k < 16) {
        val (bx, by) = ZOrder(k)
        val bx0 = x0 + bx * 4
        val by0 = y0 + by * 4
        val aL = bx > 0 || mbX > 0
        val aT = by > 0 || mbY > 0
        val aTR =
          if (by == 0) mbY > 0 && (bx < 3 || mbX < mbW - 1)
          else bx < 3 && zIndex(bx + 1, by - 1) < k
        val aTL =
          if (bx > 0 && by > 0) true
          else if (bx == 0 && by == 0) mbX > 0 && mbY > 0
          else if (by == 0) mbY > 0
          else mbX > 0
        val nbr = new Predict.Nbr4(y, strideY, bx0, by0, aL, aT, aTR, aTL)
        Predict.intra4x4(mb.intra4x4Modes(k), nbr, predBuf)
        val res =
          if (mb.lumaAc(k) != null) {
            val c = mb.lumaAc(k).clone()
            Transform.dequant4x4(c, qp, skipDc = false)
            Transform.inverse4x4(c)
          } else null
        var i = 0
        while (i < 16) {
          val v = predBuf(i) + (if (res != null) res(i) else 0)
          y((by0 + i / 4) * strideY + bx0 + i % 4) = clip(v)
          i += 1
        }
        k += 1
      }
    }

    // chroma
    val qpc = Transform.chromaQp(qp, pps.chromaQpOffset)
    val cx0 = mbX * 8
    val cy0 = mbY * 8
    val predC = new Array[Int](64)
    var c = 0
    while (c < 2) {
      val plane = if (c == 0) cb else cr
      Predict.chroma8x8(mb.chromaPredMode, plane, strideC, cx0, cy0,
        mbX > 0, mbY > 0, predC)
      val dc =
        if (mb.chromaDc(c) != null) Transform.chromaDc(mb.chromaDc(c), qpc)
        else new Array[Int](4)
      var b = 0
      while (b < 4) {
        val d =
          if (mb.chromaAc(c)(b) != null) {
            val cc = mb.chromaAc(c)(b).clone()
            Transform.dequant4x4(cc, qpc, skipDc = true)
            cc
          } else new Array[Int](16)
        d(0) = dc(b)
        val res = Transform.inverse4x4(d)
        val bx0 = cx0 + (b % 2) * 4
        val by0 = cy0 + (b / 2) * 4
        var i = 0
        while (i < 16) {
          val px = bx0 + i % 4
          val py = by0 + i / 4
          plane(py * strideC + px) =
            clip(predC((py - cy0) * 8 + (px - cx0)) + res(i))
          i += 1
        }
        b += 1
      }
      c += 1
    }
  }

  /** BT.601 full-range YUV→RGB with nearest-neighbor 4:2:0 chroma
    * upsampling — the library's fixed integer convention (tested in
    * H264Spec; the reference delegates this to decord/ffmpeg). */
  def toRgb(f: Yuv): Array[Byte] = {
    val out = new Array[Byte](f.width * f.height * 3)
    var py = 0
    while (py < f.height) {
      var px = 0
      while (px < f.width) {
        val yv = f.luma(px, py)
        val u = f.chromaB(px, py) - 128
        val v = f.chromaR(px, py) - 128
        val o = (py * f.width + px) * 3
        out(o) = clip(yv + ((91881 * v + 32768) >> 16)).toByte
        out(o + 1) = clip(yv - ((22554 * u + 46802 * v + 32768) >> 16)).toByte
        out(o + 2) = clip(yv + ((116130 * u + 32768) >> 16)).toByte
        px += 1
      }
      py += 1
    }
    out
  }
}
