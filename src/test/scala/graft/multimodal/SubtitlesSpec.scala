package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class SubtitlesSpec extends AnyFunSuite {
  import Subtitles._

  test("parses a standard two-cue SRT") {
    val srt =
      """1
        |00:00:01,500 --> 00:00:04,000
        |Hello there.
        |
        |2
        |00:00:05,000 --> 00:01:02,250
        |Two lines
        |of text.
        |""".stripMargin
    val cues = parseSrt(srt)
    assert(cues == Seq(
      Cue(1, 1500, 4000, "Hello there."),
      Cue(2, 5000, 62250, "Two lines\nof text.")))
  }

  test("tolerates CRLF, BOM, dot millis, and position metadata") {
    val srt = "\ufeff1\r\n00:00:00.5 --> 00:00:02,000 X1:0 Y1:10\r\nhi\r\n\r\n"
    val cues = parseSrt(srt)
    assert(cues == Seq(Cue(1, 500, 2000, "hi")))
  }

  test("missing index lines get sequential fallback indices") {
    val srt =
      """00:00:01,000 --> 00:00:02,000
        |a
        |
        |00:00:03,000 --> 00:00:04,000
        |b
        |""".stripMargin
    val cues = parseSrt(srt)
    assert(cues.map(_.index) == Seq(1, 2))
    assert(cues.map(_.text) == Seq("a", "b"))
  }

  test("malformed cues are skipped, valid neighbors survive") {
    val srt =
      """1
        |not a timing line
        |x
        |
        |2
        |00:00:05,000 --> 00:00:06,000
        |ok
        |""".stripMargin
    assert(parseSrt(srt) == Seq(Cue(2, 5000, 6000, "ok")))
  }

  test("hour-scale timestamps and format round-trip") {
    val cues = Seq(
      Cue(1, 3661001L, 3672999L, "late cue"),
      Cue(2, 7200000L, 7205000L, "later"))
    assert(parseSrt(formatSrt(cues)) == cues)
  }

  test("numeric-only single-line block is not a cue") {
    assert(parseSrt("42\n\n00:00:01,000 --> 00:00:02,000\nz\n")
      == Seq(Cue(1, 1000, 2000, "z")))
  }

  test("overflowing or non-ASCII-digit index lines take the fallback index") {
    val srt =
      """99999999999
        |00:00:01,000 --> 00:00:02,000
        |a
        |
        |٢٣
        |00:00:03,000 --> 00:00:04,000
        |b
        |""".stripMargin
    val cues = parseSrt(srt)
    assert(cues.map(_.text) == Seq("a", "b"))
    assert(cues.map(_.index) == Seq(1, 2))
  }

  test("cues past 99 hours round-trip (3-digit hour field)") {
    val cues = Seq(Cue(1, 100L * 3600000L, 100L * 3600000L + 1500, "late"))
    val rendered = formatSrt(cues)
    assert(rendered.contains("100:00:00,000"))
    assert(parseSrt(rendered) == cues)
  }

  test("WebVTT: header, NOTE blocks, settings, ids, tags, no-hour times") {
    val vtt =
      """WEBVTT - demo
        |Kind: captions
        |
        |NOTE
        |a comment block
        |
        |intro
        |00:01.000 --> 00:02.500 align:start position:10%
        |Hello <b>world</b>
        |
        |7
        |00:00:03.000 --> 00:00:04.000
        |<c.yellow>second</c> line
        |
        |STYLE
        |::cue { color: red }
        |
        |00:05.000 --> 00:06.000
        |third""".stripMargin
    val cues = parseVtt(vtt)
    assert(cues.map(_.text) == Seq("Hello world", "second line", "third"))
    assert(cues.map(_.startMs) == Seq(1000L, 3000L, 5000L))
    assert(cues.map(_.endMs) == Seq(2500L, 4000L, 6000L))
    // "intro" is a non-numeric id -> sequential fallback; "7" is honored
    assert(cues.map(_.index) == Seq(1, 7, 8))
  }

  test("WebVTT round-trips through format+parse; parseAuto sniffs") {
    val cues = Seq(Cue(1, 0L, 1500L, "a"), Cue(2, 3600000L + 250, 3600000L + 999, "b"))
    val rendered = formatVtt(cues)
    assert(rendered.startsWith("WEBVTT"))
    assert(parseVtt(rendered) == cues)
    assert(parseAuto(rendered) == cues)
    assert(parseAuto(formatSrt(cues)) == cues)
    // a non-VTT, non-SRT blob parses to nothing, never throws
    assert(parseVtt("not a subtitle file").isEmpty)
    assert(parseAuto("WEBVTT\n\ngarbage line without timing").isEmpty)
  }
}
