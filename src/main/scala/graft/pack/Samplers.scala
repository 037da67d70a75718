package graft.pack

import graft.wds.Codecs

/** Sampler helpers beyond frame-index math (`pack/samplers.py:13-157`):
  * the documented plug-in contract is `(file_idx, media) → (name_list,
  * entry_list)`; in Spark a sampler is a flatMap producing frame entries
  * (see PackStage.buildSample / MediaColumns.sampleFrames). This object
  * holds the remaining pure pieces. */
object Samplers {

  /** F12 black-frame synthesis (`pack/samplers.py:53-58`): paths of the
    * form "Black background: w, h" produce a zeroed RGB frame instead of
    * a file read. */
  val BlackBackgroundPrefix = "Black background"

  def parseBlackBackground(path: String): Option[(Int, Int)] =
    if (!path.startsWith(BlackBackgroundPrefix)) None
    else {
      val dims = path.split(":").last.split(", ").map(_.replace(" ", ""))
      Some((dims(0).toInt, dims(1).toInt))
    }

  def blackFrame(width: Int, height: Int): Array[Byte] =
    Codecs.encodeImage(
      Codecs.ImageData(height, width, 3, "RGB",
        new Array[Byte](height * width * 3)), "png")

  /** merlin-s path normalization (`pack/samplers.py:60-63`): collapse the
    * accidental double slash. */
  def normalizeMediaPath(path: String): String =
    if (path.contains("data//")) path.replace("data//", "data/") else path

  /** Resolve a merlin-s image reference to bytes: black-background synth
    * or a real read through the provided loader. */
  def resolveImage(
      path: String,
      load: String => Array[Byte]): Array[Byte] =
    parseBlackBackground(path) match {
      case Some((w, h)) => blackFrame(w, h)
      case None => load(normalizeMediaPath(path))
    }

  /** `keyframes_sampler` (`pack/tools.py:101-140`): select frames of one
    * picture type. 'I' appends the final frame (the reference always
    * closes an I-run with the last frame); 'P' drops its last frame
    * (which that appended I-frame would duplicate). Both lists are then
    * uniform-subsampled to `maxSamples` (≤ 0 ⇒ empty, matching the
    * reference's negative-range behavior). Returns
    * (images, frame indices, total frames). */
  def keyframes(
      video: Array[Byte],
      frameType: Char,
      maxSamples: Int,
      fs: FrameSource): (IndexedSeq[Array[Byte]], IndexedSeq[Int], Int) = {
    val total = fs.frameCount(video)
    val types = fs.frameTypes(video)
    val idxs: IndexedSeq[Int] = frameType match {
      case 'I' =>
        // the last frame is appended UNCONDITIONALLY — even when it is
        // already an I-frame (duplicate index), faithfully mirroring
        // tools.py:129-132's images.append(get_last_frame(...))
        types.zipWithIndex.collect { case ('I', i) => i } :+ (total - 1)
      case 'P' =>
        types.zipWithIndex.collect { case (t, i) if t != 'I' => i }
          .dropRight(1)
      case other =>
        throw new IllegalArgumentException(s"frame type $other")
    }
    val pick = Frames.uniformSample(idxs, maxSamples)
    (pick.map(fs.frame(video, _)), pick, total)
  }
}
