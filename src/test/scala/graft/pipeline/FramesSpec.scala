package graft.pipeline

import graft.pack.{Conversations, Frames}
import org.scalatest.funsuite.AnyFunSuite

class FramesSpec extends AnyFunSuite {

  test("uniformSample: short lists pass through, long lists step evenly") {
    assert(Frames.uniformSample(Vector(1, 2, 3), 5) == Vector(1, 2, 3))
    // length 10, n 4: interval = 3, step 3 → indices 0,3,6,9
    assert(Frames.uniformSample((0 until 10).toVector, 4) ==
      Vector(0, 3, 6, 9))
    // truncates at n even when stride would yield more
    assert(Frames.uniformSample((0 until 100).toVector, 3).size == 3)
  }

  test("segmentCenters: 16 evenly-centered indices within bounds") {
    val idxs = Frames.segmentCenters(16, fps = 25.0, maxFrame = 399,
      bound = Some((0.0, 16.0)))
    assert(idxs.length == 16)
    assert(idxs.head >= 0 && idxs.last <= 399)
    // centers are strictly increasing for a nontrivial video
    assert(idxs == idxs.sorted && idxs.distinct.size == 16)
    // first center ≈ seg/2
    assert(idxs.head == (399.0 / 16 / 2).toInt)
  }

  test("strideIndices includes first and last frame, caps at interval") {
    val idxs = Frames.strideIndices(totalFrames = 100, fps = 25)
    assert(idxs.head == 0)
    assert(idxs.contains(99))
    assert(idxs.size <= 14)
    val sparse = Frames.strideIndices(totalFrames = 10, fps = 25)
    assert(sparse.head == 0 && sparse.contains(9))
  }

  test("relativeTimestamp and scaleIndex match reference rounding") {
    assert(Frames.relativeTimestamp(5.0, 10.0) == 500.0)
    assert(Frames.relativeTimestamp(1.0, 3.0) == 333.3)
    assert(Frames.scaleIndex(50, 101) == 500)
    assert(Frames.scaleIndex(0, 101) == 0)
    assert(Frames.scaleIndex(100, 101) == 1000)
  }

  test("combineKeyFrames sort-merges ordered streams with P-tie priority") {
    val (frames, idx, types) = Frames.combineKeyFrames(
      Seq("i0", "i1", "i2"), Seq(0, 10, 20),
      Seq("p0", "p1"), Seq(5, 10))
    assert(idx == Seq(0, 5, 10, 10, 20))
    // tie at 10: reference's strict < sends the P frame first
    assert(types == Seq("I", "P", "P", "I", "I"))
    assert(frames == Seq("i0", "p0", "p1", "i1", "i2"))
  }

  test("conversation builders + image token expansion") {
    val convs = Conversations.conversate("<image><image>", "a cat", "un")
    assert(convs.head.from == "human")
    assert(Conversations.specialCount(convs.head.value) == 2)
    assert(convs(1) == Conversations.Turn("gpt", "a cat"))
    // kf expands both I and P tokens
    val kf = Conversations.addImageToken("<Iimage>#5<Pimage>#10", "kf")
    assert(Conversations.specialCount(kf) == 2)
    // merlin-s passes through untouched
    assert(Conversations.addImageToken("<image>", "merlin-s") == "<image>")
  }

  test("videochat2 conversation puts media token on first question only") {
    val qa = Seq(
      Seq("q" -> "What is this?", "a" -> "A dog."),
      Seq("q" -> "Color?", "a" -> "Brown."))
    val convs = Conversations.videochat2Conversation(qa)
    assert(convs.length == 4)
    assert(convs.head.value == "What is this?<image>")
    assert(convs(2).value == "Color?")
    assert(convs(3) == Conversations.Turn("gpt", "Brown."))
  }

  test("merlinUnSplit separates even-human / odd-gpt turns") {
    val convs = Seq(
      Conversations.Turn("human", "q1"), Conversations.Turn("gpt", "a1"),
      Conversations.Turn("human", "q2"), Conversations.Turn("gpt", "a2"))
    val (p, t) = Conversations.merlinUnSplit(convs)
    assert(p == Seq("q1", "q2") && t == Seq("a1", "a2"))
  }

  test("merlinSQaProcess splits interleaved transcript into QA + summary") {
    val input = "<image>#1.0#First answer here. <image>#2.5#Second answer. " +
      "Summary:It was a video."
    val (qs, as) = Conversations.merlinSQaProcess(input)
    assert(qs == Seq("<image>#1.0#", "<image>#2.5#", "Summary this video."))
    assert(as.length == 3)
    assert(as(0) == "First answer here. ")
    assert(as(1) == "Second answer. ")
    assert(as(2) == "It was a video.")
  }

  test("blacklist predicate") {
    assert(!Conversations.passesBlacklist("buy at shop.com now"))
    assert(Conversations.passesBlacklist("a dog runs"))
  }
}
