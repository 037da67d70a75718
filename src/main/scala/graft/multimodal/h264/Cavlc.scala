package graft.multimodal.h264

/** CAVLC entropy coding for 4x4 residual blocks (spec 9.2): coeff_token,
  * trailing-one signs, level prefix/suffix, total_zeros, run_before —
  * decode AND encode (the fixture encoder is the encode consumer).
  *
  * The VLC tables are transcribed from the public spec (Table 9-5,
  * 9-7/9-8, 9-9(a), 9-10) and validated structurally in `CavlcSpec`:
  * every table is prefix-free and its Kraft sum matches the known
  * completeness structure (chroma-DC and total_zeros(2) complete;
  * nC<2 leaves 2/65536 unused; 4<=nC<8 leaves exactly "0000000000").
  * Table 2<=nC<4 rows TotalCoeff 14..16 sit in the code space left by
  * rows 0..13 (9 free 13-bit slots = the spec's 18/16384 residual);
  * the split chosen here is consistent with the published length table
  * (13,14,14,13 / 14,14,14,13 / 14,14,14,14) but individual bit values
  * in those three rows are lower-confidence — [[Encoder]] therefore
  * clamps TotalCoeff <= 13 per block so no emitted stream depends on
  * them (see SCALE.md "H.264 conformance").
  */
object Cavlc {

  /** binary-string VLC spec, indexed [totalCoeff][trailingOnes] ("" = invalid) */
  private def tab(rows: (Int, Seq[String])*): Array[Array[String]] = {
    val out = Array.fill(17)(Array("", "", "", ""))
    rows.foreach { case (tc, codes) =>
      codes.zipWithIndex.foreach { case (c, t1) => out(tc)(t1) = c }
    }
    out
  }

  /** Table 9-5, 0 <= nC < 2 */
  val CoeffTokenA: Array[Array[String]] = tab(
    0 -> Seq("1"),
    1 -> Seq("000101", "01"),
    2 -> Seq("00000111", "000100", "001"),
    3 -> Seq("000000111", "00000110", "0000101", "00011"),
    4 -> Seq("0000000111", "000000110", "00000101", "000011"),
    5 -> Seq("00000000111", "0000000110", "000000101", "0000100"),
    6 -> Seq("0000000001111", "00000000110", "0000000101", "00000100"),
    7 -> Seq("0000000001011", "0000000001110", "00000000101", "000000100"),
    8 -> Seq("0000000001000", "0000000001010", "0000000001101", "0000000100"),
    9 -> Seq("00000000001111", "00000000001110", "0000000001001", "00000000100"),
    10 -> Seq("00000000001011", "00000000001010", "00000000001101", "0000000001100"),
    11 -> Seq("000000000001111", "000000000001110", "00000000001001", "00000000001100"),
    12 -> Seq("000000000001011", "000000000001010", "000000000001101", "00000000001000"),
    13 -> Seq("0000000000001111", "000000000000001", "000000000001001", "000000000001100"),
    14 -> Seq("0000000000001011", "0000000000001110", "0000000000001101", "000000000001000"),
    15 -> Seq("0000000000000111", "0000000000001010", "0000000000001001", "0000000000001100"),
    16 -> Seq("0000000000000100", "0000000000000110", "0000000000000101", "0000000000001000"))

  /** Table 9-5, 2 <= nC < 4 (rows 14..16: see scaladoc caveat) */
  val CoeffTokenB: Array[Array[String]] = tab(
    0 -> Seq("11"),
    1 -> Seq("001011", "10"),
    2 -> Seq("000111", "00111", "011"),
    3 -> Seq("0000111", "001010", "001001", "0101"),
    4 -> Seq("00000111", "000110", "000101", "0100"),
    5 -> Seq("00000100", "0000110", "0000101", "00110"),
    6 -> Seq("000000111", "00000110", "00000101", "001000"),
    7 -> Seq("00000001111", "000000110", "000000101", "000100"),
    8 -> Seq("00000001011", "00000001110", "00000001101", "0000100"),
    9 -> Seq("000000001111", "00000001010", "00000001001", "000000100"),
    10 -> Seq("000000001011", "000000001110", "000000001101", "00000001100"),
    11 -> Seq("000000001000", "000000001010", "000000001001", "00000001000"),
    12 -> Seq("0000000001111", "0000000001110", "0000000001101", "000000001100"),
    13 -> Seq("0000000001011", "0000000001010", "0000000001001", "0000000001100"),
    14 -> Seq("0000000000111", "00000000000001", "00000000001101", "0000000001000"),
    15 -> Seq("00000000001011", "00000000001010", "00000000001001", "0000000000001"),
    16 -> Seq("00000000000111", "00000000000101", "00000000000110", "00000000000100"))

  /** Table 9-5, 4 <= nC < 8 */
  val CoeffTokenC: Array[Array[String]] = tab(
    0 -> Seq("1111"),
    1 -> Seq("001111", "1110"),
    2 -> Seq("001011", "01111", "1101"),
    3 -> Seq("001000", "01100", "01110", "1100"),
    4 -> Seq("0001111", "01010", "01011", "1011"),
    5 -> Seq("0001011", "01000", "01001", "1010"),
    6 -> Seq("0001001", "001110", "001101", "1001"),
    7 -> Seq("0001000", "001010", "001001", "1000"),
    8 -> Seq("00001111", "0001110", "0001101", "01101"),
    9 -> Seq("00001011", "00001110", "0001010", "001100"),
    10 -> Seq("000001111", "00001010", "00001101", "0001100"),
    11 -> Seq("000001011", "000001110", "00001001", "00001100"),
    12 -> Seq("000001000", "000001010", "000001101", "00001000"),
    13 -> Seq("0000001101", "000000111", "000001001", "000001100"),
    14 -> Seq("0000001001", "0000001100", "0000001011", "0000001010"),
    15 -> Seq("0000000101", "0000001000", "0000000111", "0000000110"),
    16 -> Seq("0000000001", "0000000100", "0000000011", "0000000010"))

  /** Table 9-5, nC == -1 (chroma DC, 4:2:0) */
  val CoeffTokenChromaDc: Array[Array[String]] = tab(
    0 -> Seq("01"),
    1 -> Seq("000111", "1"),
    2 -> Seq("000100", "000110", "001"),
    3 -> Seq("000011", "0000011", "0000010", "000101"),
    4 -> Seq("000010", "00000011", "00000010", "0000000"))

  /** nC >= 8: 6-bit FLC, code = 4*(TC-1)+T1, TC=0 -> 3 */
  private def flcCode(tc: Int, t1: Int): (Int, Int) =
    if (tc == 0) (6, 3) else (6, 4 * (tc - 1) + t1)

  private def parseBits(s: String): (Int, Int) =
    (s.length, Integer.parseInt(s, 2))

  /** decode maps: (len, bits) -> (totalCoeff, trailingOnes) */
  private def decodeMap(t: Array[Array[String]]): Map[(Int, Int), (Int, Int)] =
    (for {
      tc <- 0 to 16
      t1 <- 0 to 3
      if t(tc)(t1).nonEmpty
    } yield parseBits(t(tc)(t1)) -> ((tc, t1))).toMap

  private val decA = decodeMap(CoeffTokenA)
  private val decB = decodeMap(CoeffTokenB)
  private val decC = decodeMap(CoeffTokenC)
  private val decDc = decodeMap(CoeffTokenChromaDc)

  def tableFor(nC: Int): Option[Map[(Int, Int), (Int, Int)]] =
    if (nC == -1) Some(decDc)
    else if (nC < 2) Some(decA)
    else if (nC < 4) Some(decB)
    else if (nC < 8) Some(decC)
    else None // FLC

  private def encTableFor(nC: Int): Array[Array[String]] =
    if (nC == -1) CoeffTokenChromaDc
    else if (nC < 2) CoeffTokenA
    else if (nC < 4) CoeffTokenB
    else CoeffTokenC

  /** read coeff_token: (TotalCoeff, TrailingOnes) */
  def readCoeffToken(r: BitReader, nC: Int): (Int, Int) =
    tableFor(nC) match {
      case None =>
        val v = r.u(6)
        if (v == 3) (0, 0) else (v / 4 + 1, v % 4)
      case Some(m) =>
        var len = 0
        var bits = 0
        var res: (Int, Int) = null
        while (res == null) {
          bits = (bits << 1) | r.u1()
          len += 1
          require(len <= 16, s"coeff_token overrun (nC=$nC)")
          res = m.getOrElse((len, bits), null)
        }
        res
    }

  def writeCoeffToken(w: BitWriter, nC: Int, tc: Int, t1: Int): Unit =
    if (nC >= 8) { val (l, b) = flcCode(tc, t1); w.u(l, b) }
    else {
      val s = encTableFor(nC)(tc)(t1)
      require(s.nonEmpty, s"invalid coeff_token tc=$tc t1=$t1 nC=$nC")
      val (l, b) = parseBits(s)
      w.u(l, b)
    }

  /** Tables 9-7/9-8 (4x4 total_zeros, TotalCoeff 1..15): [tc-1][zeros] */
  val TotalZeros: Array[Array[String]] = {
    val len = Array(
      Array(1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9),
      Array(3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6),
      Array(4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6),
      Array(5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5),
      Array(4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5),
      Array(6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6),
      Array(6, 5, 3, 3, 3, 2, 3, 4, 3, 6),
      Array(6, 4, 5, 3, 2, 2, 3, 3, 6),
      Array(6, 6, 4, 2, 2, 3, 2, 5),
      Array(5, 5, 3, 2, 2, 2, 4),
      Array(4, 4, 3, 3, 1, 3),
      Array(4, 4, 2, 1, 3),
      Array(3, 3, 1, 2),
      Array(2, 2, 1),
      Array(1, 1))
    val bits = Array(
      Array(1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1),
      Array(7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0),
      Array(5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0),
      Array(3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0),
      Array(5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0),
      Array(1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0),
      Array(1, 1, 5, 4, 3, 3, 2, 1, 1, 0),
      Array(1, 1, 1, 3, 3, 2, 2, 1, 0),
      Array(1, 0, 1, 3, 2, 1, 1, 1),
      Array(1, 0, 1, 3, 2, 1, 1),
      Array(0, 1, 1, 2, 1, 3),
      Array(0, 1, 1, 1, 1),
      Array(0, 1, 1, 1),
      Array(0, 1, 1),
      Array(0, 1))
    len.zip(bits).map { case (ls, bs) =>
      ls.zip(bs).map { case (l, b) =>
        val s = Integer.toBinaryString(b)
        "0" * (l - s.length) + s
      }
    }
  }

  /** Table 9-9(a): chroma-DC total_zeros (4:2:0), [tc-1][zeros] */
  val TotalZerosChromaDc: Array[Array[String]] = Array(
    Array("1", "01", "001", "000"),
    Array("1", "01", "00"),
    Array("1", "0"))

  /** Table 9-10 run_before: [min(zerosLeft,7)-1][run]; zerosLeft>6 runs
    * 7..14 extend with 0-prefixed unary. */
  val RunBefore: Array[Array[String]] = Array(
    Array("1", "0"),
    Array("1", "01", "00"),
    Array("11", "10", "01", "00"),
    Array("11", "10", "01", "001", "000"),
    Array("11", "10", "011", "010", "001", "000"),
    Array("11", "000", "001", "011", "010", "101", "100"),
    Array("111", "110", "101", "100", "011", "010", "001",
      "0001", "00001", "000001", "0000001", "00000001",
      "000000001", "0000000001", "00000000001"))

  private def readVlc(r: BitReader, codes: Array[String]): Int = {
    val m = codes.zipWithIndex.collect {
      case (c, i) if c.nonEmpty => parseBits(c) -> i
    }.toMap
    var len = 0
    var bits = 0
    while (true) {
      bits = (bits << 1) | r.u1()
      len += 1
      require(len <= 16, "VLC overrun")
      m.get((len, bits)) match {
        case Some(v) => return v
        case None =>
      }
    }
    -1
  }

  private def writeVlc(w: BitWriter, codes: Array[String], v: Int): Unit = {
    val (l, b) = parseBits(codes(v))
    w.u(l, b)
  }

  /** One decoded 4x4 (or chroma-DC 2x2) residual block. `coeffs` is in
    * DECODING order index space: coeffs(i) = level at scan position i
    * (zig-zag for 4x4), length `maxCoeffs`. */
  final case class Block(coeffs: Array[Int], totalCoeff: Int)

  /** 9.2 residual_block_cavlc decode. `maxCoeffs`: 16 (luma 4x4 /
    * chroma AC uses 15 with offset handled by caller passing 15), 4
    * (chroma DC). Returns levels at scan positions [0, maxCoeffs). */
  def readBlock(r: BitReader, nC: Int, maxCoeffs: Int): Block = {
    val (totalCoeff, trailingOnes) = readCoeffToken(r, nC)
    val out = new Array[Int](maxCoeffs)
    if (totalCoeff == 0) return Block(out, 0)
    require(totalCoeff <= maxCoeffs, s"totalCoeff $totalCoeff > $maxCoeffs")

    // levels, highest frequency first
    val levels = new Array[Int](totalCoeff)
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      if (i < trailingOnes) {
        levels(i) = if (r.u1() == 1) -1 else 1
      } else {
        // level_prefix: zeros before a 1
        var prefix = 0
        while (r.u1() == 0) {
          prefix += 1
          require(prefix <= 32, "level_prefix overrun")
        }
        val suffixSize =
          if (prefix == 14 && suffixLength == 0) 4
          else if (prefix >= 15) prefix - 3
          else suffixLength
        var levelCode = (math.min(15, prefix) << suffixLength)
        if (suffixSize > 0) levelCode += r.u(suffixSize)
        if (prefix >= 15 && suffixLength == 0) levelCode += 15
        if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
        if (i == trailingOnes && trailingOnes < 3) levelCode += 2
        levels(i) =
          if (levelCode % 2 == 0) (levelCode + 2) >> 1
          else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }

    // total_zeros
    var zerosLeft =
      if (totalCoeff == maxCoeffs) 0
      else if (nC == -1) readVlc(r, TotalZerosChromaDc(totalCoeff - 1))
      else readVlc(r, TotalZeros(totalCoeff - 1))
    // conformance bound (9.2.3): coefficients + zeros fit the block —
    // a corrupt stream otherwise walks out(pos) past the array
    require(totalCoeff + zerosLeft <= maxCoeffs,
      s"total_zeros $zerosLeft overruns $maxCoeffs-coeff block")

    // place coefficients: levels are highest-frequency-first; walk back
    var pos = totalCoeff + zerosLeft - 1 // scan index of the first (highest) coeff
    i = 0
    while (i < totalCoeff) {
      out(pos) = levels(i)
      val run =
        if (zerosLeft == 0 || i == totalCoeff - 1) 0
        else readVlc(r, RunBefore(math.min(zerosLeft, 7) - 1))
      // run_before never exceeds zerosLeft (9.2.3) — reject instead of
      // indexing below the block start
      require(run <= zerosLeft,
        s"run_before $run exceeds $zerosLeft remaining zeros")
      zerosLeft -= run
      pos -= run + 1
      i += 1
    }
    Block(out, totalCoeff)
  }

  /** 9.2 residual_block_cavlc encode (fixture side). `coeffs` at scan
    * positions; the caller has already clamped TotalCoeff <= 13. */
  def writeBlock(w: BitWriter, nC: Int, maxCoeffs: Int,
      coeffs: Array[Int]): Int = {
    require(coeffs.length == maxCoeffs)
    // gather nonzero positions high-frequency-first
    val nz = (maxCoeffs - 1 to 0 by -1).filter(coeffs(_) != 0)
    val totalCoeff = nz.length
    // trailing ones: up to 3 leading (high-freq) +/-1 levels
    var trailingOnes = 0
    while (trailingOnes < math.min(3, totalCoeff) &&
      math.abs(coeffs(nz(trailingOnes))) == 1) trailingOnes += 1
    writeCoeffToken(w, nC, totalCoeff, trailingOnes)
    if (totalCoeff == 0) return 0

    var i = 0
    while (i < trailingOnes) {
      w.u1(if (coeffs(nz(i)) < 0) 1 else 0)
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      val level = coeffs(nz(i))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == trailingOnes && trailingOnes < 3) levelCode -= 2
      // smallest prefix whose (prefix, suffix) range covers levelCode —
      // exact inverse of readBlock's levelCode formula
      var prefix = 0
      var done = false
      while (!done) {
        require(prefix <= 40, s"levelCode $levelCode unencodable")
        val suffixSize =
          if (prefix == 14 && suffixLength == 0) 4
          else if (prefix >= 15) prefix - 3
          else suffixLength
        var base = math.min(15, prefix) << suffixLength
        if (prefix >= 15 && suffixLength == 0) base += 15
        if (prefix >= 16) base += (1 << (prefix - 3)) - 4096
        if (levelCode >= base && levelCode < base + (1 << suffixSize) &&
          // a short prefix with large suffix range must not swallow codes
          // a LONGER prefix owns: prefixes < 14 cover exactly one
          // suffixLength-sized slot each, so the range check suffices
          (prefix >= 14 || (levelCode >> suffixLength) == prefix)) {
          w.u(prefix + 1, 1) // prefix zeros then the stop 1-bit
          if (suffixSize > 0) w.u(suffixSize, levelCode - base)
          done = true
        } else prefix += 1
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }

    val zerosTotal = nz.head - (totalCoeff - 1)
    if (totalCoeff < maxCoeffs) {
      if (nC == -1) writeVlc(w, TotalZerosChromaDc(totalCoeff - 1), zerosTotal)
      else writeVlc(w, TotalZeros(totalCoeff - 1), zerosTotal)
    }
    var zerosLeft = zerosTotal
    i = 0
    while (i < totalCoeff - 1 && zerosLeft > 0) {
      val run = nz(i) - nz(i + 1) - 1
      writeVlc(w, RunBefore(math.min(zerosLeft, 7) - 1), run)
      zerosLeft -= run
      i += 1
    }
    totalCoeff
  }

}
