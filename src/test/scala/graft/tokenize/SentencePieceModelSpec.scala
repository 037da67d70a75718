package graft.tokenize

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + segmentation checks for the pure-JVM SentencePiece
  * runtime against the committed tiny.model fixture (written in the
  * public ModelProto wire format: 259 control/byte pieces + a small
  * unigram vocab + an unknown trailing field). */
class SentencePieceModelSpec extends AnyFunSuite {

  private lazy val model: SentencePieceModel = {
    val in = getClass.getResourceAsStream("/tiny.model")
    assert(in != null, "tiny.model fixture missing")
    SentencePieceModel.parse(in.readAllBytes())
  }

  test("parses the model file: ids, types, byte coverage, unknown fields skipped") {
    assert(model.pieces.length == 3 + 256 + 21)
    assert(model.pieces(0).piece == "<unk>")
    assert(model.pieces(1).piece == "<s>")
    assert(model.pieces(2).piece == "</s>")
    assert(model.pieces(3).piece == "<0x00>")
    assert(model.hasByteFallback)
    assert(model.pieces(259).piece == "▁the")
    assert(model.pieces(259).score == -1.0f)
  }

  test("Viterbi picks the max-score segmentation, not greedy longest-match") {
    val ids = model.encode("the quick fox")
    val pieces = ids.map(model.pieces(_).piece)
    assert(pieces == Seq("▁the", "▁quick", "▁fox"))
    // "lowerest": whole-word piece absent; best path mixes subwords
    val p2 = model.encode("lower newest").map(model.pieces(_).piece)
    assert(p2 == Seq("▁lower", "▁new", "est"))
  }

  test("byte fallback covers text outside the vocab; decode round-trips") {
    val text = "the zebra fox!"
    val ids = model.encode(text)
    // 'z', 'b', 'a', '!' etc. have no pieces — byte pieces appear
    assert(ids.exists(id => model.pieces(id).pieceType ==
      SentencePieceModel.TypeByte))
    assert(model.decode(ids) == text)
    // multi-byte utf-8 round-trips through byte pieces too
    val uni = "the ünïcödé fox"
    assert(model.decode(model.encode(uni)) == uni)
  }

  test("drives the SpecialTokenTokenizer + conversation framing") {
    val tok = new SpecialTokenTokenizer(model, Tokenizers.MultimodalSpecials)
    val (ids, mask, _) = Tokenizers.tokenizeConversation(
      graft.pack.Conversations.defaultConversation(
        "the quick fox", "the brown fox"),
      tok)
    assert(ids.head == 1) // BOS
    assert(ids.last == 2) // EOS appended to the gpt turn
    assert(mask.head == 0 && mask.last == 1)
    assert(ids.length == mask.length)
  }
}
