package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Content-defined chunking kernel (qd17).
  *
  * The declarative form (filter(sequence(...)) boundary scan + a
  * transform slicer, one md5 Column expression per window) is correct
  * but pays the interpreted-HOF tax per window — O(len) lambda
  * invocations and substring allocations per document. Like
  * [[MinHash]], this is the documented per-row-hashing exception to
  * "functions, not UDFs": one typed mapPartitions pass reuses a single
  * MessageDigest and produces identical values (md5 of the 8-char
  * window decides boundaries, md5 of the chunk is its identity), so
  * the DuckDB oracle and the declarative Column form stay bit-equal
  * (asserted in CdcSpec).
  *
  * Scale: narrow map, no shuffle; output is (source, 32-hex chunk
  * hash, chunk length) — the same projection the declarative plan
  * ships.
  */
object Cdc {

  /** Window/divisor — the single source of truth; the declarative
    * form and the oracle SQL in DedupQueries interpolate THESE. */
  val Win = 8
  val Div = 16

  /** (chunk md5 hex, chunk CODE-POINT length) pairs for one document.
    * Boundary after code point i (1-based, i ≥ Win) when the first 2
    * digest bytes of the window ending at i are ≡ 0 (mod [[Div]]) —
    * exactly `conv(substring(md5(window), 1, 4), 16, 10) % Div` in the
    * Column form. All indexing is by Unicode CODE POINTS, matching
    * Spark's length()/substr() on UTF8String and DuckDB's substr —
    * UTF-16 unit indexing would offset every window after an astral
    * char and split surrogate pairs into '?' bytes. Empty text has no
    * chunks. */
  def chunks(text: String, md: MessageDigest): Array[(String, Int)] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty
    val bounds = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = Win
    while (i <= n) {
      val h = md.digest(new String(cps, i - Win, Win).getBytes(UTF_8))
      if ((((h(0) & 0xff) << 8) | (h(1) & 0xff)) % Div == 0)
        bounds += i
      i += 1
    }
    if (bounds.last != n) bounds += n
    val out = new Array[(String, Int)](bounds.length - 1)
    var j = 1
    while (j < bounds.length) {
      val a = bounds(j - 1); val b = bounds(j)
      val chunk = new String(cps, a, b - a)
      out(j - 1) = (hexOf(md.digest(chunk.getBytes(UTF_8))), b - a)
      j += 1
    }
    out
  }

  /** (source, text) → exploded (source, chunk_hash, chunk_len).
    * Null text is dropped scan-side — the same contract as the
    * declarative form's length(text) > 0 filter (null → dropped). */
  def chunkFrame(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("source", StringType),
      StructField("chunk_hash", StringType),
      StructField("chunk_len", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.select("source", "text")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (src, text) =>
          chunks(text, md).iterator.map { case (h, l) =>
            Row(src, h, l.toLong)
          }
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
