package graft.multimodal

/** SubRip (.srt) subtitle parsing — the text sidecar format video-text
  * pipelines align with clips (the reference pairs caption json with
  * video shards, `pack/pack.py` video_text_pair; SRT is the on-disk
  * ancestor of those captions).
  *
  * Grammar accepted (the de-facto standard, no formal spec exists):
  * cues separated by blank lines; each cue is an optional numeric index
  * line, a `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line (dot millis and
  * extra position fields tolerated), then 1..n text lines joined with
  * '\n'. CRLF and a UTF-8 BOM are tolerated. Malformed cues are skipped
  * (the corrupt-sample policy of the wds layer, not a hard error).
  */
object Subtitles {

  final case class Cue(index: Int, startMs: Long, endMs: Long, text: String)

  private val Timing =
    """(\d{1,3}):(\d{2}):(\d{2})[,.](\d{1,3})\s*-->\s*(\d{1,3}):(\d{2}):(\d{2})[,.](\d{1,3}).*""".r

  /** ASCII-digit Int with overflow guard — `forall(_.isDigit)` accepts
    * Unicode digits and arbitrarily long runs that `toInt` then throws
    * on; a malformed index must skip the cue, never kill the parse. */
  private def asciiInt(t: String): Option[Int] =
    if (t.nonEmpty && t.length <= 9 && t.forall(c => c >= '0' && c <= '9'))
      Some(t.toInt)
    else None

  private def ms(h: String, m: String, s: String, f: String): Long =
    h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L +
      f.padTo(3, '0').toLong

  def parseSrt(srt: String): Seq[Cue] = {
    val body = if (srt.startsWith("\ufeff")) srt.substring(1) else srt
    val blocks = body.replace("\r\n", "\n").replace('\r', '\n')
      .split("\n\\s*\n")
    val out = Seq.newBuilder[Cue]
    var autoIdx = 0
    for (block <- blocks) {
      val lines = block.split('\n').toIndexedSeq.dropWhile(_.trim.isEmpty)
      if (lines.nonEmpty) {
        // optional index line before the timing line; digit runs that
        // overflow Int (or use non-ASCII digits) still consume the line
        // but take the sequential fallback index
        val head = lines.head.trim
        val looksIndex = head.nonEmpty && head.forall(_.isDigit) &&
          lines.length > 1
        val (idx, rest) =
          if (looksIndex)
            (asciiInt(head).getOrElse(autoIdx + 1), lines.tail)
          else (autoIdx + 1, lines)
        rest.headOption.map(_.trim) match {
          case Some(Timing(h1, m1, s1, f1, h2, m2, s2, f2)) =>
            autoIdx = idx
            out += Cue(idx, ms(h1, m1, s1, f1), ms(h2, m2, s2, f2),
              rest.tail.mkString("\n").trim)
          case _ => () // malformed cue — skip
        }
      }
    }
    out.result()
  }

  /** Render cues back to canonical SRT (comma millis, LF separators). */
  def formatSrt(cues: Seq[Cue]): String = {
    def ts(v: Long): String =
      f"${v / 3600000}%02d:${v / 60000 % 60}%02d:${v / 1000 % 60}%02d,${v % 1000}%03d"
    cues.map(c => s"${c.index}\n${ts(c.startMs)} --> ${ts(c.endMs)}\n${c.text}")
      .mkString("", "\n\n", "\n")
  }

  /** `MM:SS.mmm` or `HH:MM:SS.mmm` — WebVTT's hour field is optional */
  private val VttTiming =
    ("""(?:(\d{1,4}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*""" +
      """(?:(\d{1,4}):)?(\d{2}):(\d{2})\.(\d{3})(?:\s+.*)?""").r

  /** WebVTT (.vtt) parse — the web-native sibling of SRT (crawled
    * video corpora carry both). Grammar accepted (the W3C core):
    * `WEBVTT` signature line (+ header metadata until the first blank
    * line), cue blocks separated by blank lines — an optional cue
    * identifier line, an `[HH:]MM:SS.mmm --> [HH:]MM:SS.mmm` timing
    * line with trailing cue settings tolerated and ignored, then
    * payload lines; `NOTE`/`STYLE`/`REGION` blocks are skipped; basic
    * inline tags (<b>, <i>, <c.classname>, <00:00:01.000>) are
    * stripped from the payload. Malformed cues skip, the SRT policy.
    * Returns the same [[Cue]] model, so alignment and all downstream
    * operators are format-agnostic. */
  def parseVtt(vtt: String): Seq[Cue] = {
    val body = if (vtt.startsWith("﻿")) vtt.substring(1) else vtt
    val norm = body.replace("\r\n", "\n").replace('\r', '\n')
    if (!norm.startsWith("WEBVTT")) return Seq.empty
    val blocks = norm.split("\n\\s*\n")
    val out = Seq.newBuilder[Cue]
    var autoIdx = 0
    // the first block is the signature/header; cue blocks follow
    for (block <- blocks.drop(1)) {
      val lines = block.split('\n').toIndexedSeq.dropWhile(_.trim.isEmpty)
      val head = lines.headOption.map(_.trim).getOrElse("")
      val isMeta = head.startsWith("NOTE") || head.startsWith("STYLE") ||
        head.startsWith("REGION")
      if (lines.nonEmpty && !isMeta) {
        // optional identifier line (any text without "-->")
        val (idLine, rest) =
          if (!head.contains("-->") && lines.length > 1 &&
            lines(1).contains("-->")) (Some(head), lines.tail)
          else (None, lines)
        rest.headOption.map(_.trim) match {
          case Some(VttTiming(h1, m1, s1, f1, h2, m2, s2, f2)) =>
            val idx = idLine.flatMap(asciiInt).getOrElse(autoIdx + 1)
            autoIdx = idx
            val text = rest.tail.mkString("\n")
              .replaceAll("<[^>]*>", "").trim
            out += Cue(idx,
              ms(Option(h1).getOrElse("0"), m1, s1, f1),
              ms(Option(h2).getOrElse("0"), m2, s2, f2), text)
          case _ => () // malformed cue — skip
        }
      }
    }
    out.result()
  }

  /** Render cues as canonical WebVTT. */
  def formatVtt(cues: Seq[Cue]): String = {
    def ts(v: Long): String =
      f"${v / 3600000}%02d:${v / 60000 % 60}%02d:${v / 1000 % 60}%02d.${v % 1000}%03d"
    cues.map(c => s"${c.index}\n${ts(c.startMs)} --> ${ts(c.endMs)}\n${c.text}")
      .mkString("WEBVTT\n\n", "\n\n", "\n")
  }

  /** format sniff: VTT signature vs SRT fallback — callers feed either
    * sidecar format through one entry point */
  def parseAuto(text: String): Seq[Cue] = {
    val t = if (text.startsWith("﻿")) text.substring(1) else text
    if (t.startsWith("WEBVTT")) parseVtt(text) else parseSrt(text)
  }
}
