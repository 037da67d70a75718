package graft.multimodal.h264

/** Typed signal for H.264 features beyond the baseline intra subset
  * (CABAC, P/B slices, interlace, 4:2:2/4:4:4, FMO…): callers triage
  * these as unsupported-codec — distinct from corruption, which stays
  * IllegalArgumentException. */
final case class UnsupportedFeature(feature: String)
  extends IllegalArgumentException(s"H.264 feature unsupported: $feature")

/** H.264 sequence / picture parameter sets (spec 7.3.2.1 / 7.3.2.2),
  * parse + fixture-encoder write. Baseline-profile subset: frame_mbs_only,
  * 4:2:0, no scaling matrices, CAVLC entropy coding. The reference
  * pipeline reads these via decord/ffmpeg (`pack/dataset.py:102-122`);
  * here they gate the pure-JVM I-frame decode path.
  */
final case class Sps(
    profileIdc: Int,
    levelIdc: Int,
    log2MaxFrameNum: Int,
    picOrderCntType: Int,
    log2MaxPocLsb: Int,
    mbWidth: Int,  // pic_width_in_mbs
    mbHeight: Int, // pic_height_in_map_units (frame_mbs_only)
    cropLeft: Int,
    cropRight: Int,
    cropTop: Int,
    cropBottom: Int,
    maxNumRefFrames: Int = 1) {
  def width: Int = mbWidth * 16 - 2 * (cropLeft + cropRight)
  def height: Int = mbHeight * 16 - 2 * (cropTop + cropBottom)
}

final case class Pps(
    entropyCodingMode: Int, // 0 = CAVLC (required here)
    picInitQp: Int,
    chromaQpOffset: Int,
    deblockingFilterControlPresent: Boolean,
    bottomFieldPocPresent: Boolean = false,
    numRefIdxL0Default: Int = 0, // num_ref_idx_l0_default_active_minus1
    weightedPred: Boolean = false,
    numRefIdxL1Default: Int = 0, // num_ref_idx_l1_default_active_minus1
    weightedBipredIdc: Int = 0)

object Sps {
  /** parse a seq_parameter_set_rbsp (unescaped) */
  def parse(rbsp: Array[Byte]): Sps = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    val id = r.ue()
    if (id != 0) throw UnsupportedFeature(s"multi-SPS stream (id $id)")
    if (profile == 100 || profile == 110 || profile == 122 ||
      profile == 244 || profile == 44 || profile == 83 || profile == 86 ||
      profile == 118 || profile == 128) {
      val chromaFormat = r.ue()
      if (chromaFormat != 1)
        throw UnsupportedFeature(s"chroma_format_idc $chromaFormat")
      if (r.ue() != 0 || r.ue() != 0)
        throw UnsupportedFeature("bit depth > 8")
      r.u1() // qpprime_y_zero_transform_bypass
      if (r.u1() != 0) throw UnsupportedFeature("seq_scaling_matrix")
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) {
      r.u1(); r.se(); r.se()
      val n = r.ue()
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    val maxRef = r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed
    val mbW = r.ue() + 1
    val mbH = r.ue() + 1
    val frameMbsOnly = r.u1()
    if (frameMbsOnly != 1) throw UnsupportedFeature("interlaced (fields)")
    r.u1() // direct_8x8_inference
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    Sps(profile, level, log2MaxFrameNum, pocType, log2MaxPocLsb,
      mbW, mbH, cl, cr, ct, cb, math.max(1, maxRef))
  }

  /** fixture-encoder write (constrained baseline, 4:2:0) */
  def write(sps: Sps): Array[Byte] = {
    val w = new BitWriter
    w.u(8, sps.profileIdc)
    w.u(8, 0x40) // constraint_set1 (constrained baseline)
    w.u(8, sps.levelIdc)
    w.ue(0) // sps id
    w.ue(sps.log2MaxFrameNum - 4)
    w.ue(sps.picOrderCntType)
    if (sps.picOrderCntType == 0) w.ue(sps.log2MaxPocLsb - 4)
    w.ue(sps.maxNumRefFrames) // max_num_ref_frames
    w.u1(0)
    w.ue(sps.mbWidth - 1)
    w.ue(sps.mbHeight - 1)
    w.u1(1) // frame_mbs_only
    w.u1(1) // direct_8x8_inference
    val crop = sps.cropLeft + sps.cropRight + sps.cropTop + sps.cropBottom > 0
    w.u1(if (crop) 1 else 0)
    if (crop) {
      w.ue(sps.cropLeft); w.ue(sps.cropRight)
      w.ue(sps.cropTop); w.ue(sps.cropBottom)
    }
    w.u1(0) // vui_parameters_present
    w.rbspTrailing()
    w.toBytes
  }
}

object Pps {
  def parse(rbsp: Array[Byte]): Pps = {
    val r = new BitReader(rbsp)
    if (r.ue() != 0) throw UnsupportedFeature("multi-PPS stream")
    if (r.ue() != 0) throw UnsupportedFeature("sps id != 0")
    val entropy = r.u1()
    if (entropy != 0) throw UnsupportedFeature("CABAC entropy coding")
    val bottomPoc = r.u1() == 1 // bottom_field_pic_order_in_frame_present
    if (r.ue() != 0) throw UnsupportedFeature("slice groups (FMO)")
    val numRefL0 = r.ue() // num_ref_idx_l0_default_active_minus1
    val numRefL1 = r.ue() // num_ref_idx_l1_default_active_minus1
    val weighted = r.u1() == 1 // weighted_pred_flag
    val bipredIdc = r.u(2) // weighted_bipred_idc
    val qp = r.se() + 26
    r.se() // pic_init_qs
    val chromaOff = r.se()
    val deblockPresent = r.u1() == 1
    r.u1() // constrained_intra_pred
    r.u1() // redundant_pic_cnt_present
    Pps(entropy, qp, chromaOff, deblockPresent, bottomPoc, numRefL0,
      weighted, numRefL1, bipredIdc)
  }

  def write(pps: Pps): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.u1(0) // CAVLC
    w.u1(0)
    w.ue(0) // one slice group
    w.ue(0); w.ue(0)
    w.u1(if (pps.weightedPred) 1 else 0) // weighted_pred_flag
    w.u(2, pps.weightedBipredIdc) // weighted_bipred_idc
    w.se(pps.picInitQp - 26)
    w.se(0)
    w.se(pps.chromaQpOffset)
    w.u1(if (pps.deblockingFilterControlPresent) 1 else 0)
    w.u1(0)
    w.u1(0)
    w.rbspTrailing()
    w.toBytes
  }
}
