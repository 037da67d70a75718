package graft.pack

/** Pure frame-index math from the pack stage — fully testable without any
  * video decoder (SURVEY.md §2.5 W1-W3, §2.3 J2, §2.7 F6). Video byte
  * decode itself is pluggable ([[FrameSource]]); these functions define
  * WHICH frames a sampler selects.
  */
object Frames {

  /** `uniform_sample(lst, n)` (`pack/tools.py:142-153`): ≈evenly spaced
    * subsample stepping by int((len-1)/(n-1)), truncating at n. */
  def uniformSample[T](lst: IndexedSeq[T], numSamples: Int): IndexedSeq[T] = {
    val length = lst.length
    if (length <= numSamples) lst
    else {
      val interval = (length - 1).toDouble / (numSamples - 1)
      val step = interval.toInt.max(1)
      val out = IndexedSeq.newBuilder[T]
      var i = 0
      var n = 0
      while (i < length && n < numSamples) {
        out += lst(i)
        n += 1
        i += step
      }
      out.result()
    }
  }

  /** `videoItem.get_index` (`pack/dataset.py:82-100`): center-of-segment
    * frame indices `int(start + seg/2 + round(seg*i))` over numSegments
    * segments, bounded by [round(start·fps) max firstIdx, round(end·fps)
    * min maxFrame]. round = half-even (numpy/py3 semantics). */
  def segmentCenters(
      numSegments: Int,
      fps: Double,
      maxFrame: Int,
      bound: Option[(Double, Double)] = None,
      firstIdx: Int = 0): IndexedSeq[Int] = {
    val (start, end) = bound.getOrElse((-100000.0, 100000.0))
    val startIdx = math.max(firstIdx.toDouble, math.rint(start * fps))
    val endIdx = math.min(math.rint(end * fps), maxFrame.toDouble)
    val segSize = (endIdx - startIdx) / numSegments
    (0 until numSegments).map { i =>
      (startIdx + segSize / 2 + math.rint(segSize * i)).toInt
    }
  }

  /** `extract_frames` stride selection (`pack/tools.py:45-91`): which
    * frame counters are sampled for a video of `totalFrames` at `fps`
    * with the fixed interval=13 policy — first frame, every `frameStep`,
    * and the last frame. */
  def strideIndices(totalFrames: Int, fps: Int, interval: Int = 13): IndexedSeq[Int] = {
    val frameStep =
      if (totalFrames < (interval - 1) * fps) fps.max(1)
      else ((totalFrames - 1) / (interval - 2)).max(1)
    (0 until totalFrames).filter { f =>
      (f % frameStep == 0 && f != totalFrames) || f == 0 || f == totalFrames - 1
    }.take(interval + 1).toIndexedSeq
  }

  /** `get_relative_timestamp` (`pack/dataset.py:114-116`): scale an
    * absolute timestamp into [0, timeScale], rounded to 0.1. */
  def relativeTimestamp(
      absTs: Double,
      duration: Double,
      timeScale: Int = 1000): Double = {
    val v = absTs / duration * timeScale
    math.rint(v * 10) / 10
  }

  /** Keyframe timestamp scaling (`pack/samplers.py:143`):
    * `int(i/(total-1) * timeScale)`. */
  def scaleIndex(idx: Int, totalFrames: Int, timeScale: Int = 1000): Int =
    (idx.toDouble / (totalFrames - 1) * timeScale).toInt

  /** `combineKeyFrames` (`pack/tools.py:155-197`): sort-merge two
    * index-ordered frame streams; ties prefer the P side (strict `<`
    * comparison in the reference). Returns (payloads, indices, types). */
  def combineKeyFrames[T](
      iFrames: Seq[T], iIndices: Seq[Int],
      pFrames: Seq[T], pIndices: Seq[Int]): (Seq[T], Seq[Int], Seq[String]) = {
    val frames = Seq.newBuilder[T]
    val indices = Seq.newBuilder[Int]
    val types = Seq.newBuilder[String]
    var i = 0
    var p = 0
    while (i < iIndices.length && p < pIndices.length) {
      if (iIndices(i) < pIndices(p)) {
        frames += iFrames(i); indices += iIndices(i); types += "I"; i += 1
      } else {
        frames += pFrames(p); indices += pIndices(p); types += "P"; p += 1
      }
    }
    while (i < iIndices.length) {
      frames += iFrames(i); indices += iIndices(i); types += "I"; i += 1
    }
    while (p < pIndices.length) {
      frames += pFrames(p); indices += pIndices(p); types += "P"; p += 1
    }
    (frames.result(), indices.result(), types.result())
  }
}

/** Pluggable video→frames decoder seam (the reference uses decord /
  * ffmpeg subprocesses, `pack/dataset.py:102-108`, `pack/tools.py:101-140`
  * — no JVM parity exists, so production wires JavaCV/ffprobe here and
  * tests use [[FrameSource.Synthetic]]). */
trait FrameSource extends Serializable {
  /** decode frame at `index` of the video payload as encoded image bytes. */
  def frame(video: Array[Byte], index: Int): Array[Byte]
  /** decode frame `index` straight to pixels — semantically identical
    * to `Codecs.decodeImage(frame(video, index))` (the default
    * implementation, and the law FrameImageSpec pins), but decoders
    * can skip the lossless encode→decode round-trip. The fast path
    * for pixel analytics (fingerprints, scene cuts, patch fan-out),
    * where the PNG container would be built only to be torn down.
    * Contract: every call returns a FRESH buffer the caller owns —
    * implementations must not hand out a cached/shared `data` array
    * (callers like sceneCuts hold the previous frame across calls). */
  def frameImage(video: Array[Byte],
      index: Int): graft.wds.Codecs.ImageData =
    graft.wds.Codecs.decodeImage(frame(video, index))
  def frameCount(video: Array[Byte]): Int
  def fps(video: Array[Byte]): Double
  /** per-frame picture types ('I'/'P'), the ffprobe `pict_type` stream
    * the kf sampler selects on (`pack/tools.py:101-140`). Synthetic
    * default: a keyframe every 10 frames — production wires the real
    * probe here. */
  def frameTypes(video: Array[Byte]): IndexedSeq[Char] =
    IndexedSeq.tabulate(frameCount(video))(i => if (i % 10 == 0) 'I' else 'P')
}

object FrameSource {
  /** Codecs whose mp4 samples are complete still images the pure-JVM
    * path decodes (stsd fourcc, trimmed). Everything else — avc1/hvc1/
    * vp09/av01… — is inter-frame and needs the native ffmpeg/JavaCV
    * seam; [[Mp4Frames.frame]] THROWS the typed signal for those
    * rather than handing raw NAL bytes (or synthetic pixels) to a
    * pipeline that asked for real frames. */
  val StillImageCodecs: Set[String] = Set("jpeg", "png")

  /** Typed unsupported-codec signal: callers auditing a corpus catch
    * this and report the codec (mm13); callers that wanted pixels fail
    * loudly instead of silently training on garbage. */
  final case class UnsupportedCodecException(codec: String)
    extends IllegalArgumentException(
      s"video codec '$codec' needs a native decoder (ffmpeg/JavaCV " +
        "seam) - pure-JVM frame decode covers still-image codecs only")

  /** Deterministic synthetic frames: 1×1 PNGs whose pixel encodes the
    * frame index — realistic plumbing (real PNG bytes through the whole
    * pack/tokenize path) with zero native deps. The pixel is a pure
    * function of (index, video length) low bytes, so encoded frames are
    * memoized per executor — ImageIO costs ~100 µs per encode, and a
    * pack run asks for tens of thousands of frames. */
  object Synthetic extends FrameSource {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
    def frame(video: Array[Byte], index: Int): Array[Byte] = {
      val key = (index & 0xffff) | ((video.length & 0xff) << 16)
      cache.computeIfAbsent(key, _ => {
        val img = graft.wds.Codecs.ImageData(1, 1, 3, "RGB",
          Array((index & 0xff).toByte, ((index >> 8) & 0xff).toByte,
            (video.length & 0xff).toByte))
        graft.wds.Codecs.encodeImage(img, "png")
      })
    }
    def frameCount(video: Array[Byte]): Int =
      100 + (math.abs(java.util.Arrays.hashCode(video)) % 100)
    def fps(video: Array[Byte]): Double = 25.0
  }

  /** Geometry from REAL MP4 container metadata: frame count derives
    * from the mvhd duration probed by
    * [[graft.multimodal.Mp4Probe]] × fps. Frame decode itself remains
    * at the synthetic seam until an ffmpeg/JavaCV binding is wired —
    * but sampler index math (segment centers, keyframe fills) runs
    * against true container durations. */
  final case class Mp4Meta(fpsValue: Double = 25.0) extends FrameSource {
    def frame(video: Array[Byte], index: Int): Array[Byte] =
      Synthetic.frame(video, index)
    def frameCount(video: Array[Byte]): Int =
      math.max(1, math.round(
        graft.multimodal.Mp4Probe.probe(video).durationSec * fpsValue).toInt)
    def fps(video: Array[Byte]): Double = fpsValue
  }

  /** REAL frame decode for still-image-codec MP4s (MJPEG `jpeg`,
    * PNG `png `): the sample table ([[graft.multimodal.Mp4Samples]])
    * resolves every frame to its byte range in `mdat`, and each sample
    * IS a complete ImageIO-decodable image — actual pixels from an
    * actual container, pure JVM. Frame types come from the real `stss`
    * sync-sample box (the ffprobe `pict_type` analog,
    * `pack/tools.py:101-140`); fps/duration from `mdhd`. Inter-frame
    * codecs (H.264…) still need a native decoder — that remains the
    * ffmpeg/JavaCV seam, with [[Synthetic]]/[[Mp4Meta]] as fallbacks. */
  object Mp4Frames extends FrameSource {
    import graft.multimodal.Mp4Samples
    // sample-table parse is header-only but per-frame calls repeat it;
    // memoize the last container per thread (pack loops over one video
    // at a time within a partition). SOFT reference: cleared only
    // under memory pressure — a weak ref would vanish at every minor
    // GC (nothing else strongly holds the tuple), re-paying the parse
    // mid-video; a strong ref would pin each thread's final video
    // bytes for the executor's lifetime
    private val last =
      new ThreadLocal[java.lang.ref.SoftReference[
        (Array[Byte], Mp4Samples.Track)]]
    private def track(video: Array[Byte]): Mp4Samples.Track = {
      val cached = Option(last.get()).flatMap(r => Option(r.get()))
      cached match {
        case Some((v, t)) if v eq video => t
        case _ =>
          val t = Mp4Samples.parse(video).getOrElse(throw
            new IllegalArgumentException(
              "no complete sample table (not an MJPEG/PNG mp4?)"))
          last.set(new java.lang.ref.SoftReference((video, t)))
          t
      }
    }
    // GOP decode state for the avc1 walk-back: (video identity, decode
    // index of the last decoded frame, the short-term DPB after
    // folding frames [gopStart..index] — most recently decoded
    // reference FIRST, i.e. P-slice reference list 0 order — the
    // long-term DPB (ascending LongTermFrameIdx, populated by MMCO
    // 3/6), and the POC msb/lsb state of the last reference picture).
    // Lets increasing-index access — the uniform/segment samplers'
    // pattern — cost one incremental decode per frame instead of
    // re-walking from the sync sample each call.
    private val avcState =
      new ThreadLocal[java.lang.ref.SoftReference[
        (Array[Byte], Int, Vector[graft.multimodal.h264.Decoder.Yuv],
          Vector[graft.multimodal.h264.Decoder.Yuv], Int, Int)]]

    /** decode DECODE-ORDER sample `index` of an avc1 track: seek to
      * the nearest preceding sync sample and motion-compensate forward
      * — the decord seek model the reference's samplers rely on
      * (`pack/dataset.py:102-108`). Non-reference frames that aren't
      * the target are skipped (they can't affect later frames). The
      * walk maintains the DPB (IDR clears; reference pictures prepend,
      * truncated to the SPS max_num_ref_frames sliding window,
      * 8.2.5.3) and per-picture POC (8.2.1.1 msb wrap) so B samples
      * get POC-ordered reference lists: list0 past-desc then
      * future-asc, list1 future-asc then past-desc (8.2.4.2.3). */
    private def decodeAvc(video: Array[Byte], t: Mp4Samples.Track,
        cfg: graft.multimodal.h264.Decoder.AvcConfig,
        index: Int): graft.multimodal.h264.Decoder.Yuv = {
      import graft.multimodal.h264.{Decoder, UnsupportedFeature}
      val maxRef = math.max(1, cfg.sps.maxNumRefFrames)
      val maxLsb = 1 << cfg.sps.log2MaxPocLsb
      val maxFrameNum = 1 << cfg.sps.log2MaxFrameNum
      var sync = index
      while (sync > 0 && !t.isSync(sync)) sync -= 1
      require(t.isSync(sync), s"no sync sample at or before frame $index")
      val cached = Option(avcState.get()).flatMap(r => Option(r.get()))
      val (start, refs0, long0, pm0, pl0) = cached match {
        case Some((v, i, dpb, lt, pm, pl))
            if (v eq video) && i < index && i >= sync =>
          (i + 1, dpb, lt, pm, pl)
        case _ =>
          (sync, Vector.empty[Decoder.Yuv], Vector.empty[Decoder.Yuv],
            0, 0)
      }
      var shortRefs = refs0
      var longRefs = long0 // ascending LongTermFrameIdx
      var prevPocMsb = pm0
      var prevPocLsb = pl0
      var out: Decoder.Yuv = null
      var j = start
      while (j <= index) {
        val sample = t.sample(video, j)
        val info = Decoder.sliceInfo(sample, cfg)
        val isRef = info.refIdc > 0
        // POC for this picture (8.2.1.1, type 0): msb derived against
        // the previous REFERENCE picture's lsb/msb
        val poc =
          if (info.idr) 0
          else {
            val lsb = info.pocLsb
            val msb =
              if (lsb < prevPocLsb && prevPocLsb - lsb >= maxLsb / 2)
                prevPocMsb + maxLsb
              else if (lsb > prevPocLsb && lsb - prevPocLsb > maxLsb / 2)
                prevPocMsb - maxLsb
              else prevPocMsb
            msb + lsb
          }
        var mmco5 = false // set when this picture's marking carries op 5
        if (j == index || isRef) {
          val (shorts, longs) =
            if (info.idr) (Vector.empty[Decoder.Yuv], Vector.empty[Decoder.Yuv])
            else (shortRefs, longRefs)
          // list initialization (8.2.4.2): P list0 = short-term
          // descending PicNum (the walk's most-recent-first order)
          // then long-term ascending LongTermPicNum; B lists order
          // short-term by POC distance and append long-term to both
          val d0 =
            if (info.isB) {
              val past = shorts.filter(_.poc < poc).sortBy(-_.poc)
              val future = shorts.filter(_.poc > poc).sortBy(_.poc)
              Decoder.decode(sample, cfg, past ++ future ++ longs,
                future ++ past ++ longs, poc)
            } else Decoder.decode(sample, cfg, shorts ++ longs)
          val d = d0.copy(poc = poc)
          if (j == index) out = d
          if (isRef) {
            if (info.idr) { shortRefs = Vector(d); longRefs = Vector.empty }
            else if (d.mmco.nonEmpty) {
              // adaptive marking (8.2.5.4): apply the picture's MMCO
              // ops to the DPB; sliding window is NOT invoked
              def fnWrap(p: Decoder.Yuv): Int =
                if (p.frameNum > info.frameNum) p.frameNum - maxFrameNum
                else p.frameNum
              var cur = d
              d.mmco.foreach {
                case (1, diff, _) => // unmark a short-term picture
                  val picNumX = info.frameNum - (diff + 1)
                  shortRefs = shortRefs.filterNot(p => fnWrap(p) == picNumX)
                case (2, lt, _) => // unmark a long-term picture
                  longRefs = longRefs.filterNot(_.longTermIdx == lt)
                case (3, diff, lt) => // short-term -> long-term
                  val picNumX = info.frameNum - (diff + 1)
                  val pic = shortRefs.find(p => fnWrap(p) == picNumX)
                  shortRefs = shortRefs.filterNot(p => fnWrap(p) == picNumX)
                  longRefs = (longRefs.filterNot(_.longTermIdx == lt) ++
                    pic.map(_.copy(longTermIdx = lt)))
                    .sortBy(_.longTermIdx)
                case (4, maxPlus1, _) => // max_long_term_frame_idx
                  longRefs = longRefs.filter(_.longTermIdx <= maxPlus1 - 1)
                case (5, _, _) => // reset (8.2.5.4.5): unmark ALL refs;
                  // the current picture re-bases to frame_num 0 / POC 0
                  // (tempPicOrderCnt subtraction) and the POC chain
                  // restarts from it for subsequent pictures
                  shortRefs = Vector.empty
                  longRefs = Vector.empty
                  cur = cur.copy(poc = 0, frameNum = 0)
                  mmco5 = true
                case (6, lt, _) => // current picture -> long-term
                  cur = cur.copy(longTermIdx = lt)
                  longRefs = (longRefs.filterNot(_.longTermIdx == lt)
                    :+ cur).sortBy(_.longTermIdx)
                case (op, _, _) => throw UnsupportedFeature(
                  s"memory_management_control_operation $op")
              }
              if (cur.longTermIdx < 0) shortRefs = cur +: shortRefs
              // the returned frame must carry the post-marking
              // metadata (op 5 re-bases poc/frameNum, op 6 stamps the
              // long-term idx) — identical to the copy the DPB keeps
              if (j == index) out = cur
            } else {
              // sliding window (8.2.5.3): evict the OLDEST short-term
              // picture; long-term pictures are exempt
              shortRefs = d +: shortRefs
              while (shortRefs.size + longRefs.size > maxRef &&
                  shortRefs.nonEmpty)
                shortRefs = shortRefs.init
            }
          }
        }
        if (isRef) {
          // MMCO 5 re-bases the POC chain: the current picture now
          // reads as POC 0, so the next derivation starts from (0, 0)
          if (mmco5) { prevPocMsb = 0; prevPocLsb = 0 }
          else {
            prevPocMsb = if (info.idr) 0 else poc - info.pocLsb
            prevPocLsb = info.pocLsb
          }
        }
        j += 1
      }
      require(out != null, s"frame $index not decoded (cache state bug)")
      avcState.set(new java.lang.ref.SoftReference(
        (video, index, shortRefs, longRefs, prevPocMsb, prevPocLsb)))
      out
    }

    /** the avc1 decode shared by [[frame]] and [[frameImage]] — ONE
      * path (sync-sample seek + MC walk-forward → YUV → RGB), so the
      * encoded-bytes and pixel contracts can never diverge. Pure-JVM
      * H.264 baseline (graft.multimodal.h264); non-baseline features
      * (CABAC, fields) surface as the typed signal. */
    private def avcImage(video: Array[Byte], t: Mp4Samples.Track,
        decIdx: Int): graft.wds.Codecs.ImageData = {
      import graft.multimodal.h264.Decoder
      val avcc = t.avcc.getOrElse(
        throw UnsupportedCodecException("avc1 (no avcC config)"))
      try {
        val cfg = Decoder.parseAvcc(avcc)
        val yuv = decodeAvc(video, t, cfg, decIdx)
        graft.wds.Codecs.ImageData(yuv.height, yuv.width, 3, "RGB",
          Decoder.toRgb(yuv))
      } catch {
        case graft.multimodal.h264.UnsupportedFeature(f) =>
          throw UnsupportedCodecException(s"avc1 ($f)")
      }
    }

    def frame(video: Array[Byte], index: Int): Array[Byte] = {
      val t = track(video)
      // the sampler's "frame index" is DISPLAY order; the sample table
      // is DECODE order — ctts maps between them (identity without
      // B-frame reordering)
      val decIdx = t.displayToDecode(index)
      // frameCount/fps/frameTypes stay codec-independent (container
      // metadata, the 100 TB audit path) — only DECODE is gated
      if (StillImageCodecs(t.codec)) t.sample(video, decIdx)
      else if (t.codec == "avc1")
        // frame()'s contract is ENCODED image bytes: the decoded
        // pixels re-encode as (lossless) PNG
        graft.wds.Codecs.encodeImage(avcImage(video, t, decIdx), "png")
      else throw UnsupportedCodecException(t.codec)
    }
    override def frameImage(video: Array[Byte],
        index: Int): graft.wds.Codecs.ImageData = {
      val t = track(video)
      val decIdx = t.displayToDecode(index)
      if (StillImageCodecs(t.codec))
        graft.wds.Codecs.decodeImage(t.sample(video, decIdx))
      else if (t.codec == "avc1") avcImage(video, t, decIdx)
      else throw UnsupportedCodecException(t.codec)
    }
    def frameCount(video: Array[Byte]): Int = track(video).frameCount
    def fps(video: Array[Byte]): Double = track(video).fps
    override def frameTypes(video: Array[Byte]): IndexedSeq[Char] = {
      val t = track(video)
      // display-order types: the kf sampler asks "is display frame i a
      // keyframe", which is the sync flag of its decode-order sample
      IndexedSeq.tabulate(t.frameCount)(i =>
        if (t.isSync(t.displayToDecode(i))) 'I' else 'P')
    }
  }

  /** Content-independent frame geometry: every video has exactly `count`
    * frames at `fpsValue`, keyframe every `iEvery`. Makes downstream
    * per-sample entry counts a pure function of configuration — the
    * oracle-checkable fixture for kf gate queries. */
  final case class Fixed(count: Int, fpsValue: Double = 25.0,
      iEvery: Int = 10) extends FrameSource {
    def frame(video: Array[Byte], index: Int): Array[Byte] =
      Synthetic.frame(video, index)
    def frameCount(video: Array[Byte]): Int = count
    def fps(video: Array[Byte]): Double = fpsValue
    override def frameTypes(video: Array[Byte]): IndexedSeq[Char] =
      IndexedSeq.tabulate(count)(i => if (i % iEvery == 0) 'I' else 'P')
  }
}
