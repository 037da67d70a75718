package graft.tokenize

import graft.pack.Conversations
import graft.pack.Conversations.Turn

/** Tokenizer seam (F15/F16). The reference binds a multimodal LLaMA-2
  * SentencePiece model (`tokenize/tokenizer.py:651-686`); its
  * *algorithmic* content — the greedy special-token interleave scan and
  * the conversation framing — is engine logic and lives here, while the
  * subword model itself is pluggable (JVM SentencePiece in production, a
  * deterministic word-hash model in tests — `SURVEY.md` §7.4.6).
  */
trait SubwordModel extends Serializable {
  /** encode plain text (no special tokens) to ids. */
  def encode(text: String): IndexedSeq[Int]
}

/** Deterministic test-double subword model: whitespace words hashed into
  * [100, 31900). Stable across JVMs (uses our own FNV hash, not
  * String.hashCode which is stable anyway but explicit is better). */
final class WordHashModel extends SubwordModel {
  private def fnv(s: String): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x01000193; i += 1 }
    h
  }
  def encode(text: String): IndexedSeq[Int] =
    text.split("\\s+").filter(_.nonEmpty).toIndexedSeq
      .map(w => 100 + math.floorMod(fnv(w), 31800))
}

/** Greedy longest-match subword model over a fixed vocabulary — the
  * deterministic stand-in for a SentencePiece unigram model: each
  * whitespace word is segmented by repeatedly taking the longest vocab
  * piece that prefixes the remainder, with a per-character byte-fallback
  * (ids 4..259) for uncovered text, like SentencePiece's byte_fallback.
  * Production swaps in a JVM SentencePiece binding behind the same
  * trait; every algorithm downstream (special-token scan, conversation
  * framing, 8k packing, check invariants) is agnostic to the choice. */
final class GreedySubwordModel(vocab: Seq[String]) extends SubwordModel {
  require(vocab.nonEmpty)
  private val byLen = vocab.distinct.sortBy(-_.length)
  private val ids: Map[String, Int] =
    byLen.zipWithIndex.map { case (p, i) => p -> (300 + i) }.toMap

  def encode(text: String): IndexedSeq[Int] = {
    val out = IndexedSeq.newBuilder[Int]
    text.split("\\s+").filter(_.nonEmpty).foreach { word =>
      var rest = word
      while (rest.nonEmpty) {
        byLen.find(rest.startsWith) match {
          case Some(piece) =>
            out += ids(piece)
            rest = rest.substring(piece.length)
          case None =>
            out += 4 + (rest.charAt(0) & 0xff) // byte fallback
            rest = rest.substring(1)
        }
      }
    }
    out.result()
  }
}

/** Special-token-aware tokenizer: scans for the earliest special token,
  * encodes the plain segments with the subword model, and emits the
  * special token's fixed id — the reference's `tokenize` loop
  * (`tokenize/tokenizer.py:651-686`). */
final class SpecialTokenTokenizer(
    model: SubwordModel,
    val specialTokens: Map[String, Int]) extends Serializable {

  private val toks = specialTokens.toArray

  /** Single left-to-right scan: each special token's next occurrence is
    * tracked monotonically (indexOf resumes from the cursor), so a
    * sentinel-dense prompt costs O(tokens · |text|) total instead of
    * the naive rescan-the-tail-per-emission quadratic. Semantics
    * unchanged: earliest occurrence wins, ties prefer the longest
    * token. */
  def tokenize(text: String): IndexedSeq[Int] = {
    val out = IndexedSeq.newBuilder[Int]
    val nextPos = toks.map { case (t, _) => text.indexOf(t) }
    var cur = 0
    while (cur < text.length) {
      var best = -1
      var i = 0
      while (i < toks.length) {
        if (nextPos(i) >= 0 && nextPos(i) < cur)
          nextPos(i) = text.indexOf(toks(i)._1, cur)
        if (nextPos(i) >= 0 &&
          (best < 0 || nextPos(i) < nextPos(best) ||
            (nextPos(i) == nextPos(best) &&
              toks(i)._1.length > toks(best)._1.length)))
          best = i
        i += 1
      }
      if (best < 0) {
        out ++= model.encode(text.substring(cur))
        cur = text.length
      } else {
        val pos = nextPos(best)
        if (pos > cur) out ++= model.encode(text.substring(cur, pos))
        out += toks(best)._2
        cur = pos + toks(best)._1.length
      }
    }
    out.result()
  }
}

object Tokenizers {
  /** Multimodal special-token vocabulary with the ids the check stage
    * asserts on (`index/check_pair.py:37-40`). */
  val MultimodalSpecials: Map[String, Int] = Map(
    Conversations.ImPatchToken -> 32000,
    Conversations.ImStartToken -> 32001,
    Conversations.ImEndToken -> 32002,
    Conversations.EosToken -> 2,
    Conversations.BosToken -> 1)

  def testTokenizer(): SpecialTokenTokenizer =
    new SpecialTokenTokenizer(new WordHashModel, MultimodalSpecials)

  /** F16 `tokenize_conversation` (`tokenize/main.py:132-147`): BOS id
    * [1] + per-turn ids (gpt turns get EOS appended pre-tokenize);
    * loss_mask 0 for human/BOS, 1 for gpt; text joined with '\n'. */
  def tokenizeConversation(
      conversation: Seq[Turn],
      tokenizer: SpecialTokenTokenizer):
      (IndexedSeq[Int], IndexedSeq[Int], String) = {
    val ids = IndexedSeq.newBuilder[Int]
    val mask = IndexedSeq.newBuilder[Int]
    val text = new StringBuilder(Conversations.BosToken)
    ids += 1
    mask += 0
    conversation.zipWithIndex.foreach { case (turn, idx) =>
      val tmp = turn.value +
        (if (turn.from == "gpt") Conversations.EosToken else "")
      val tokIds = tokenizer.tokenize(tmp)
      val label = if (turn.from == "human") 0 else 1
      if (idx > 0) text.append('\n')
      text.append(tmp)
      ids ++= tokIds
      mask ++= IndexedSeq.fill(tokIds.length)(label)
    }
    (ids.result(), mask.result(), text.toString)
  }
}
