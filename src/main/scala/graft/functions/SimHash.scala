package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders}

/** SimHash kernel: 16-bit signature from per-word hashes (first 4 md5
  * hex digits → int; per-bit ±1 votes; sign → bit).
  *
  * Same rationale as [[MinHash]]: the declarative form needs 16
  * interpreted `aggregate` passes per row (HOFs run outside codegen); one
  * typed pass computes all bit votes in a single word scan with values
  * identical to the Column form and the DuckDB oracle (strpos-hex math ==
  * integer value of the first 4 md5 hex chars).
  */
object SimHash {

  final case class DocSimHash(doc_id: Long, simhash: Int)

  def simhash16(md: MessageDigest, text: String): Int = {
    val votes = new Array[Int](16)
    text.toLowerCase.split(" ", -1).foreach { w =>
      val d = md.digest(w.getBytes(UTF_8))
      // first 4 hex digits = first 2 bytes, big-endian nibbles
      val hv = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var b = 0
      while (b < 16) {
        if (((hv >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) sig |= (1 << b)
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
        it.map { case (id, text) => DocSimHash(id, simhash16(md, text)) }
      }.toDF()
  }
}
