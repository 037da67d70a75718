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

  test("Viterbi equals brute-force max-score segmentation (exhaustive law)") {
    // enumerate EVERY segmentation of short escaped strings and verify
    // the DP picks the max total score (fallback edges included)
    val m = model
    def pieceScore(s: String): Option[Double] =
      m.pieces.zipWithIndex.collectFirst {
        case (p, _) if p.piece == s &&
          (p.pieceType == SentencePieceModel.TypeNormal) => p.score.toDouble
      }
    def bestScore(s: String): Double =
      if (s.isEmpty) 0.0
      else (1 to s.length).flatMap { len =>
        val head = s.take(len)
        val headScore =
          if (len == 1) // fallback always available per char
            Some(pieceScore(head).getOrElse(SentencePieceModel.FallbackScore)
              .max(pieceScore(head).getOrElse(Double.NegativeInfinity)))
          else pieceScore(head)
        headScore.map(_ + bestScore(s.drop(len)))
      }.max
    def encodedScore(text: String): Double =
      m.encode(text).foldLeft((0.0, 0)) { case ((acc, run), id) =>
        val p = m.pieces(id)
        if (p.pieceType == SentencePieceModel.TypeByte)
          // fallback ids: charge once per source char — ascii here, so
          // one byte == one char == one fallback edge
          (acc + SentencePieceModel.FallbackScore, run)
        else (acc + p.score, run)
      }._1
    Seq("the", "the fox", "newest", "lower fox", "zq", "the zq fox")
      .foreach { text =>
        val escaped = "▁" + text.replace(' ', '▁')
        assert(math.abs(encodedScore(text) - bestScore(escaped)) < 1e-9,
          s"text '$text'")
      }
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
