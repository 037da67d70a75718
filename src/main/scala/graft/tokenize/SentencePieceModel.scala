package graft.tokenize

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM SentencePiece runtime (F15 production path).
  *
  * The reference tokenizer is a LLaMA-2 SentencePiece model
  * (`tokenize/tokenizer.py:651-686`). No SentencePiece JVM binding is
  * resolvable in this build environment, so this implements the two
  * public, documented pieces needed to run a real `tokenizer.model`
  * behind the [[SubwordModel]] trait:
  *
  *  1. a minimal protobuf wire-format reader for the ModelProto subset
  *     the runtime needs — field 1 (`repeated SentencePiece`) with
  *     `piece`(1, string), `score`(2, float), `type`(3, enum) — per the
  *     public sentencepiece_model.proto schema. Unknown fields are
  *     skipped by wire type, so real model files parse.
  *  2. unigram-LM segmentation: whitespace is escaped to ▁ (U+2581,
  *     with the add-dummy-prefix convention), then Viterbi picks the
  *     piece sequence maximizing the summed piece scores; characters no
  *     piece covers fall back to their UTF-8 `<0xXX>` BYTE pieces
  *     (byte_fallback), or the UNKNOWN piece when the model has none.
  *
  * Scores and ids come from the model file, so ids/segmentations match
  * the reference runtime for unigram models; the greedy/word-hash test
  * doubles remain the default everywhere else.
  */
final class SentencePieceModel(
    val pieces: Vector[SentencePieceModel.Piece]) extends SubwordModel {

  import SentencePieceModel._

  private val idOf: Map[String, Int] =
    pieces.zipWithIndex.map { case (p, i) => p.piece -> i }.toMap
  private val maxPieceLen =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_.piece.length).max
  private val unkId =
    pieces.indexWhere(_.pieceType == TypeUnknown) match {
      case -1 => 0
      case i => i
    }
  private val byteIds: Array[Int] = {
    val arr = Array.fill(256)(-1)
    pieces.zipWithIndex.foreach { case (p, i) =>
      if (p.pieceType == TypeByte) {
        // canonical byte piece spelling: <0xAB>
        val m = "^<0x([0-9A-Fa-f]{2})>$".r.findFirstMatchIn(p.piece)
        m.foreach(g => arr(Integer.parseInt(g.group(1), 16)) = i)
      }
    }
    arr
  }
  val hasByteFallback: Boolean = byteIds.forall(_ >= 0)
  /** id → byte value for canonical `<0xAB>` pieces; malformed TypeByte
    * spellings decode as a clear error, not a substring crash. */
  private val byteValueOf: Map[Int, Byte] =
    byteIds.zipWithIndex.collect {
      case (id, v) if id >= 0 => id -> v.toByte
    }.toMap

  /** escape to the sentencepiece surface form: ▁ for spaces, with a
    * leading dummy prefix. */
  private def escape(text: String): String =
    "▁" + text.replace(' ', '▁')

  /** ids for one char position when no piece covers it: its UTF-8 byte
    * pieces, or the UNK id. */
  private def fallbackIds(c: String): Seq[Int] =
    if (hasByteFallback) c.getBytes(UTF_8).toSeq.map(b => byteIds(b & 0xff))
    else Seq(unkId)

  def encode(text: String): IndexedSeq[Int] = {
    if (text.isEmpty) return IndexedSeq.empty
    val s = escape(text)
    val n = s.length
    // Viterbi over char positions: best score to reach i, with back ptr
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val backPiece = Array.fill(n + 1)(-1) // piece id of last edge
    val backFrom = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 0
    while (i < n) {
      if (best(i) != Double.NegativeInfinity) {
        // piece edges
        var len = 1
        val lim = math.min(maxPieceLen, n - i)
        while (len <= lim) {
          idOf.get(s.substring(i, i + len)) match {
            case Some(id) if pieces(id).pieceType == TypeNormal ||
                pieces(id).pieceType == TypeUserDefined =>
              val sc = best(i) + pieces(id).score
              if (sc > best(i + len)) {
                best(i + len) = sc
                backPiece(i + len) = id
                backFrom(i + len) = i
              }
            case _ => ()
          }
          len += 1
        }
        // fallback edge over exactly one char (surrogate-pair aware)
        val clen = if (Character.isHighSurrogate(s.charAt(i)) &&
          i + 1 < n) 2 else 1
        val sc = best(i) + FallbackScore
        if (sc > best(i + clen)) {
          best(i + clen) = sc
          backPiece(i + clen) = -2 // fallback marker
          backFrom(i + clen) = i
        }
      }
      i += 1
    }
    // walk back
    val out = List.newBuilder[Int]
    val rev = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    var pos = n
    while (pos > 0) {
      val from = backFrom(pos)
      if (backPiece(pos) == -2) rev += fallbackIds(s.substring(from, pos))
      else rev += Seq(backPiece(pos))
      pos = from
    }
    rev.reverseIterator.foreach(out ++= _)
    out.result().toIndexedSeq
  }

  /** inverse of encode for round-trip checks: pieces joined, ▁ → space,
    * byte pieces reassembled, dummy prefix stripped. */
  def decode(ids: Seq[Int]): String = {
    val sb = new java.lang.StringBuilder
    val byteBuf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def flushBytes(): Unit = if (byteBuf.nonEmpty) {
      sb.append(new String(byteBuf.toArray, UTF_8))
      byteBuf.clear()
    }
    ids.foreach { id =>
      val p = pieces(id)
      if (p.pieceType == TypeByte)
        byteBuf += byteValueOf.getOrElse(id,
          throw new IllegalArgumentException(
            s"byte piece $id has non-canonical spelling '${p.piece}'"))
      else {
        flushBytes()
        if (p.pieceType == TypeNormal || p.pieceType == TypeUserDefined)
          sb.append(p.piece)
      }
    }
    flushBytes()
    sb.toString.replace('▁', ' ').stripPrefix(" ")
  }
}

object SentencePieceModel {

  // SentencePiece.Type enum values (sentencepiece_model.proto)
  val TypeNormal = 1
  val TypeUnknown = 2
  val TypeControl = 3
  val TypeUserDefined = 4
  val TypeUnused = 5
  val TypeByte = 6

  /** score charged per byte-fallback char — below any real piece score
    * so covered text always prefers pieces (sentencepiece uses the unk
    * penalty similarly). */
  val FallbackScore: Double = -1e3

  final case class Piece(piece: String, score: Float, pieceType: Int)

  def fromFile(path: String): SentencePieceModel =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Inverse of [[parse]] — serialize pieces to the public ModelProto
    * wire format (field 1 = repeated SentencePiece{piece=1 string,
    * score=2 float, type=3 enum}). Lets fixtures and custom vocabs be
    * written as real `.model` files the reference runtime could load. */
  def serialize(pieces: Seq[Piece]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(pieces.length * 16)
    def varint(to: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      var cont = true
      while (cont) {
        val b = (v & 0x7f).toInt
        v >>>= 7
        if (v != 0) to.write(b | 0x80) else { to.write(b); cont = false }
      }
    }
    pieces.foreach { p =>
      val body = new java.io.ByteArrayOutputStream(p.piece.length + 12)
      val pb = p.piece.getBytes(UTF_8)
      body.write((1 << 3) | 2) // piece: field 1, length-delimited
      varint(body, pb.length.toLong)
      body.write(pb, 0, pb.length)
      body.write((2 << 3) | 5) // score: field 2, fixed32
      val bits = java.lang.Float.floatToIntBits(p.score)
      body.write(bits & 0xff); body.write((bits >> 8) & 0xff)
      body.write((bits >> 16) & 0xff); body.write((bits >> 24) & 0xff)
      body.write((3 << 3) | 0) // type: field 3, varint
      varint(body, p.pieceType.toLong)
      out.write((1 << 3) | 2) // ModelProto.pieces
      varint(out, body.size().toLong)
      body.writeTo(out)
    }
    out.toByteArray
  }

  /** Minimal protobuf reader for the ModelProto subset (field 1 =
    * repeated SentencePiece{piece=1, score=2, type=3}); every other
    * field is skipped by wire type. */
  def parse(bytes: Array[Byte]): SentencePieceModel = {
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => pos += varint().toInt
      case 5 => pos += 4
      case other =>
        throw new IllegalArgumentException(s"wire type $other")
    }
    def parsePiece(end: Int): Piece = {
      var piece = ""; var score = 0f; var tpe = TypeNormal
      while (pos < end) {
        val key = varint().toInt
        (key >> 3, key & 7) match {
          case (1, 2) =>
            val len = varint().toInt
            piece = new String(bytes, pos, len, UTF_8); pos += len
          case (2, 5) =>
            score = java.lang.Float.intBitsToFloat(
              (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
                ((bytes(pos + 2) & 0xff) << 16) |
                ((bytes(pos + 3) & 0xff) << 24))
            pos += 4
          case (3, 0) => tpe = varint().toInt
          case (_, w) => skip(w)
        }
      }
      Piece(piece, score, tpe)
    }
    val pieces = Vector.newBuilder[Piece]
    while (pos < bytes.length) {
      val key = varint().toInt
      (key >> 3, key & 7) match {
        case (1, 2) =>
          val len = varint().toInt
          pieces += parsePiece(pos + len)
        case (_, w) => skip(w)
      }
    }
    new SentencePieceModel(pieces.result())
  }
}
