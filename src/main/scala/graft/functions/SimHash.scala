package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders}

/** SimHash kernel: 64-bit signature from per-word hashes (first 16 md5
  * hex digits = first 8 digest bytes, big-endian → Long; per-bit ±1
  * votes; sign → bit).
  *
  * Same rationale as [[MinHash]]: the declarative form needs 64
  * interpreted `aggregate` passes per row (HOFs run outside codegen); one
  * typed pass computes all bit votes in a single word scan with values
  * identical to the Column form and the DuckDB oracle (per-nibble
  * strpos-hex math == integer value of the md5 hex prefix).
  *
  * 64 bits (vs a 16-bit toy) is the production width: near-dup banding
  * splits the signature into four 16-bit blocks, so the bucket keyspace
  * is 2^16 per block — by pigeonhole, any pair within Hamming distance 3
  * shares at least one of the 4 blocks, making the banded join EXACT for
  * the hamming ≤ 3 predicate while shuffling only (doc_id, block) pairs.
  */
object SimHash {

  final case class DocSimHash(doc_id: Long, simhash: Long)

  def simhash64(md: MessageDigest, text: String): Long = {
    val votes = new Array[Int](64)
    text.toLowerCase.split(" ", -1).foreach { w =>
      val d = md.digest(w.getBytes(UTF_8))
      // first 16 hex digits = first 8 bytes, big-endian
      var hv = 0L
      var i = 0
      while (i < 8) { hv = (hv << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        if (((hv >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** (doc_id, text) → (doc_id, simhash). */
  def signatures(df: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[DocSimHash]
    df.select("doc_id", "text")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) => DocSimHash(id, simhash64(md, text)) }
      }.toDF()
  }
}
