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
