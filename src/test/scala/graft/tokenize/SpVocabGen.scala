package graft.tokenize

import SentencePieceModel._

/** Deterministic realistic-scale SentencePiece vocab builder: 3
  * specials + 256 byte pieces + syllable-combination subwords up to the
  * requested size, scores decreasing with rank (like a real unigram LM
  * vocab sorted by frequency). No RNG — pure enumeration — so every
  * run builds the identical model and throughput numbers are
  * comparable across rounds. */
object SpVocabGen {

  def pieces(vocab: Int): Vector[Piece] = {
    require(vocab > 300, s"vocab $vocab too small for specials+bytes")
    val specials = Vector(
      Piece("<unk>", 0f, TypeUnknown),
      Piece("<s>", 0f, TypeControl),
      Piece("</s>", 0f, TypeControl))
    val bytes = (0 until 256).map(b => Piece(f"<0x$b%02X>", 0f, TypeByte))
    val cons = "bcdfghjklmnprstvwz"
    val vowels = "aeiou"
    val sylls: Vector[String] =
      (for (c <- cons; v <- vowels) yield s"$c$v").toVector // 90
    // rank order: single sylls (word-start then bare), then pairs, then
    // triples — mirrors shorter-pieces-more-frequent
    val subwords = Iterator(
      sylls.iterator.map("▁" + _),
      sylls.iterator,
      (for (a <- sylls.iterator; b <- sylls) yield s"▁$a$b"),
      (for (a <- sylls.iterator; b <- sylls) yield s"$a$b"),
      (for (a <- sylls.iterator; b <- sylls; c <- sylls)
        yield s"▁$a$b$c")).flatten
    val n = vocab - specials.length - bytes.length
    val ranked = subwords.take(n).zipWithIndex.map { case (s, r) =>
      // longer pieces score better than the sum of their parts would
      // be penalized, but strictly decreasing in rank within a length
      Piece(s, (-1.0 - r * 0.001).toFloat, TypeNormal)
    }.toVector
    require(ranked.length == n, s"enumeration exhausted at ${ranked.length}")
    specials ++ bytes ++ ranked
  }

  def model(vocab: Int = 8192): SentencePieceModel =
    new SentencePieceModel(pieces(vocab))

  /** deterministic sentence of `words` syllable-words, seeded by `id` */
  def sentence(id: Long, words: Int = 12): String = {
    val cons = "bcdfghjklmnprstvwz"
    val vowels = "aeiou"
    val sylls = (for (c <- cons; v <- vowels) yield s"$c$v").toVector
    (0 until words).map { w =>
      var z = id * 131 + w * 17 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val nSyll = 1 + ((z >>> 33) % 3).toInt
      (0 until nSyll).map { s =>
        sylls((((z >>> (7 * s)) & 0xffff) % sylls.length).toInt)
      }.mkString
    }.mkString(" ")
  }
}
