package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** MinHash signature kernel.
  *
  * The declarative form (8 × `array_min(transform(shingles, md5(...)))`)
  * is correct but slow: Catalyst evaluates higher-order functions
  * interpreted — outside whole-stage codegen — and each signature column
  * re-derives the shingle array, so the 8-hash signature costs ~16
  * interpreted passes per row (measured 78 s at sf0.1). Per-row hashing
  * kernels like this are the documented exception to "functions, not
  * UDFs" (SURVEY.md §4.2.4): one typed mapPartitions pass computes every
  * signature in a single scan — same md5-over-`"seed|shingle"` values,
  * bit-identical to the DuckDB oracle, ~40× faster.
  *
  * Scale: narrow map, no shuffle, signature size O(numHashes) per doc —
  * the standard first stage of MinHash-LSH dedup at 100 TB.
  */
object MinHash {

  /** 3-word shingles of the lowercased text; short docs fall back to the
    * whole (lowercased) text — matching the guarded Column expression
    * and the oracle SQL. */
  def shingles(text: String): Array[String] = {
    // Locale.ROOT: a tr_TR default locale would map 'I' to dotless 'ı',
    // diverging from Spark/DuckDB lower() and breaking the hash oracle
    val ws = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (ws.length >= 3)
      Array.tabulate(ws.length - 2)(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
    else Array(ws.mkString(" "))
  }

  /** unsigned lexicographic digest compare — identical order to
    * comparing the lowercase hex strings (hex digits are monotonic in
    * the nibble value), so the min digest IS the min hex string. */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** (doc_id, text) → (doc_id, h0..h{n-1}) signature frame.
    * The min is selected over raw digests (hex conversion happens once,
    * on the winner) — the digest order equals hex-string order, and a
    * 100 TB signature pass shouldn't build 8 hex strings per shingle. */
  def signatures(df: DataFrame, numHashes: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(
      StructField("doc_id", LongType) +:
        (0 until numHashes).map(k => StructField(s"h$k", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.select("doc_id", "text")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val sh = shingles(text)
          val mins = new Array[String](numHashes)
          var k = 0
          while (k < numHashes) {
            var best: Array[Byte] = null
            var i = 0
            while (i < sh.length) {
              val h = md.digest(s"$k|${sh(i)}".getBytes(UTF_8))
              if (best == null || lessThan(h, best)) best = h
              i += 1
            }
            mins(k) = hexOf(best)
            k += 1
          }
          Row.fromSeq(id +: mins.toSeq)
        }
      }(enc)
  }

  private def hexOf(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
