package graft.multimodal.h264

/** CABAC (H.264 9.3) — the VALUE-FREE skeleton.
  *
  * The arithmetic-coding engine (9.3.3.2 decode, 9.3.4 encode), the
  * context-state machine (9.3.1.1 (m,n) → (pStateIdx, valMPS)), and
  * the binarization schemes (9.3.2: unary, truncated unary, UEGk,
  * fixed-length) are pure STRUCTURE — procedures fully specified by
  * the standard's flowcharts — and are implemented here. What is NOT
  * here are the spec's *value tables*: rangeTabLPS (64×4), the
  * transIdxLPS/transIdxMPS state-transition rows, and the ~460
  * per-context (m,n) initialization pairs (Tables 9-12..9-33). Those
  * are data with no derivation; guessed values round-trip internally
  * (encoder and decoder agree by construction — CabacSpec proves it
  * with a synthetic table) while silently mis-decoding every real
  * stream. They stay behind [[CabacTables]]; [[Cabac.realTables]] is
  * None until the published tables are reachable, and
  * `entropy_coding_mode_flag == 1` keeps raising the typed
  * [[UnsupportedFeature]] signal at the PPS parse ([[Pps.parse]]).
  * The first session with table access only fills in constants —
  * every procedure below is already exercised.
  *
  * Reference user path: decord/ffmpeg decode of High-profile corpora
  * (`/root/reference/pack/dataset.py:102-108`).
  */
object Cabac {

  /** the spec's CABAC value tables, injected — see scaladoc above */
  trait CabacTables {
    /** Table 9-35: codIRangeLPS for (pStateIdx 0..63, qCodIRangeIdx
      * 0..3); every value must be < 256 so a decision never exceeds
      * the renormalized range */
    def rangeTabLPS(pStateIdx: Int, qIdx: Int): Int
    /** Table 9-36 columns */
    def transIdxLPS(pStateIdx: Int): Int
    def transIdxMPS(pStateIdx: Int): Int
    /** (m, n) for a context index under a cabac_init_idc — Tables
      * 9-12..9-33 */
    def initPair(ctxIdx: Int, initIdc: Int): (Int, Int)
  }

  /** real tables: absent in this environment (values, not structure) */
  val realTables: Option[CabacTables] = None

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** one adaptive context (9.3.1.1): probability state + MPS value */
  final class Context(var pStateIdx: Int, var valMPS: Int)

  /** 9.3.1.1 context initialization from an (m, n) pair at SliceQPY */
  def initContext(m: Int, n: Int, sliceQpY: Int): Context = {
    val pre = clip3(1, 126, ((m * clip3(0, 51, sliceQpY)) >> 4) + n)
    if (pre <= 63) new Context(63 - pre, 0)
    else new Context(pre - 64, 1)
  }

  /** 9.3.3.2 arithmetic DECODING engine over a byte array (the slice
    * data after the CABAC alignment). Reads 9 bits at init. */
  final class Decoder(data: Array[Byte], tables: CabacTables) {
    private val r = new BitReader(data)
    private var codIRange = 510
    private var codIOffset = r.u(9)

    @inline private def readBit(): Int =
      // past-the-end bits read as 0 (the spec guarantees a conformant
      // stream never needs them; this keeps fuzzed inputs total)
      if (r.remaining > 0) r.u1() else 0

    /** 9.3.3.2.1 DecodeDecision */
    def decodeDecision(ctx: Context): Int = {
      val q = (codIRange >> 6) & 3
      val rangeLPS = tables.rangeTabLPS(ctx.pStateIdx, q)
      codIRange -= rangeLPS
      val bin =
        if (codIOffset >= codIRange) {
          val b = 1 - ctx.valMPS
          codIOffset -= codIRange
          codIRange = rangeLPS
          if (ctx.pStateIdx == 0) ctx.valMPS = 1 - ctx.valMPS
          ctx.pStateIdx = tables.transIdxLPS(ctx.pStateIdx)
          b
        } else {
          val b = ctx.valMPS
          ctx.pStateIdx = tables.transIdxMPS(ctx.pStateIdx)
          b
        }
      // 9.3.3.2.2 RenormD
      while (codIRange < 256) {
        codIRange <<= 1
        codIOffset = (codIOffset << 1) | readBit()
      }
      bin
    }

    /** 9.3.3.2.3 DecodeBypass */
    def decodeBypass(): Int = {
      codIOffset = (codIOffset << 1) | readBit()
      if (codIOffset >= codIRange) { codIOffset -= codIRange; 1 }
      else 0
    }

    /** 9.3.3.2.4 DecodeTerminate */
    def decodeTerminate(): Int = {
      codIRange -= 2
      if (codIOffset >= codIRange) 1
      else {
        while (codIRange < 256) {
          codIRange <<= 1
          codIOffset = (codIOffset << 1) | readBit()
        }
        0
      }
    }
  }

  /** 9.3.4 arithmetic ENCODING engine — the decoder's test-oracle
    * counterpart (the reference pipeline never encodes CABAC; this
    * exists so CabacSpec can prove the engine round-trips under any
    * injected table). */
  final class Encoder(tables: CabacTables) {
    private val w = new BitWriter
    private var codILow = 0
    private var codIRange = 510
    private var firstBitFlag = true
    private var bitsOutstanding = 0

    private def putBit(b: Int): Unit = {
      if (firstBitFlag) firstBitFlag = false
      else w.u1(b)
      while (bitsOutstanding > 0) {
        w.u1(1 - b)
        bitsOutstanding -= 1
      }
    }

    private def renormE(): Unit = {
      while (codIRange < 256) {
        if (codILow < 256) putBit(0)
        else if (codILow >= 512) { codILow -= 512; putBit(1) }
        else { codILow -= 256; bitsOutstanding += 1 }
        codIRange <<= 1
        codILow <<= 1
      }
    }

    /** 9.3.4.2 EncodeDecision */
    def encodeDecision(ctx: Context, bin: Int): Unit = {
      val q = (codIRange >> 6) & 3
      val rangeLPS = tables.rangeTabLPS(ctx.pStateIdx, q)
      codIRange -= rangeLPS
      if (bin != ctx.valMPS) {
        codILow += codIRange
        codIRange = rangeLPS
        if (ctx.pStateIdx == 0) ctx.valMPS = 1 - ctx.valMPS
        ctx.pStateIdx = tables.transIdxLPS(ctx.pStateIdx)
      } else ctx.pStateIdx = tables.transIdxMPS(ctx.pStateIdx)
      renormE()
    }

    /** 9.3.4.4 EncodeBypass */
    def encodeBypass(bin: Int): Unit = {
      codILow <<= 1
      if (bin != 0) codILow += codIRange
      if (codILow >= 1024) { codILow -= 1024; putBit(1) }
      else if (codILow < 512) putBit(0)
      else { codILow -= 512; bitsOutstanding += 1 }
    }

    /** 9.3.4.5 EncodeTerminate (+ EncodeFlush when bin == 1) */
    def encodeTerminate(bin: Int): Unit = {
      codIRange -= 2
      if (bin != 0) {
        codILow += codIRange
        // EncodeFlush
        codIRange = 2
        renormE()
        putBit((codILow >> 9) & 1)
        w.u(2, ((codILow >> 7) & 3) | 1)
      } else renormE()
    }

    def toBytes: Array[Byte] = { w.alignZero(); w.toBytes }
  }

  // --- 9.3.2 binarization schemes (structure; the per-syntax-element
  // scheme SELECTION and ctxIdx offsets are value tables) ---

  /** unary: value v -> v ones then a zero */
  def encodeUnary(enc: Encoder, ctx: Context, v: Int): Unit = {
    var i = 0
    while (i < v) { enc.encodeDecision(ctx, 1); i += 1 }
    enc.encodeDecision(ctx, 0)
  }

  def decodeUnary(dec: Decoder, ctx: Context, cap: Int = 1 << 16): Int = {
    var v = 0
    while (dec.decodeDecision(ctx) == 1) {
      v += 1
      require(v <= cap, "runaway unary binarization")
    }
    v
  }

  /** truncated unary with cMax: like unary but the terminating zero
    * is omitted at v == cMax */
  def encodeTruncUnary(enc: Encoder, ctx: Context, v: Int, cMax: Int): Unit = {
    require(v <= cMax)
    var i = 0
    while (i < v) { enc.encodeDecision(ctx, 1); i += 1 }
    if (v < cMax) enc.encodeDecision(ctx, 0)
  }

  def decodeTruncUnary(dec: Decoder, ctx: Context, cMax: Int): Int = {
    var v = 0
    while (v < cMax && dec.decodeDecision(ctx) == 1) v += 1
    v
  }

  /** fixed-length over the BYPASS engine (suffixes are equiprobable) */
  def encodeFixedLen(enc: Encoder, v: Int, bits: Int): Unit = {
    var i = bits - 1
    while (i >= 0) { enc.encodeBypass((v >> i) & 1); i -= 1 }
  }

  def decodeFixedLen(dec: Decoder, bits: Int): Int = {
    var v = 0
    var i = 0
    while (i < bits) { v = (v << 1) | dec.decodeBypass(); i += 1 }
    v
  }

  /** UEGk suffix (9.3.2.3, e.g. k=0 for coeff levels, k=3 for mvd):
    * Exp-Golomb over the bypass engine, used after a truncated-unary
    * prefix saturates at uCoff */
  def encodeUegkSuffix(enc: Encoder, v: Int, k0: Int): Unit = {
    var sufS = v
    var k = k0
    var stop = false
    while (!stop) {
      if (sufS >= (1 << k)) {
        enc.encodeBypass(1)
        sufS -= 1 << k
        k += 1
      } else {
        enc.encodeBypass(0)
        while (k > 0) {
          k -= 1
          enc.encodeBypass((sufS >> k) & 1)
        }
        stop = true
      }
    }
  }

  def decodeUegkSuffix(dec: Decoder, k0: Int): Int = {
    var v = 0
    var k = k0
    var guard = 0
    while (dec.decodeBypass() == 1) {
      v += 1 << k
      k += 1
      guard += 1
      require(guard <= 32, "runaway UEGk prefix")
    }
    while (k > 0) {
      k -= 1
      v += dec.decodeBypass() << k
    }
    v
  }
}
