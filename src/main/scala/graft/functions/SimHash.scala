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
    text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).foreach { w =>
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

  /** Hamming-≤3 candidate generation, Manku/Jain/Sarma (WWW'07) table
    * layout: the 64-bit signature splits into 6 blocks
    * (11,11,11,11,10,10 bits); a pair within Hamming distance 3 differs
    * in at most 3 blocks, so it matches EXACTLY on some 3 of the other
    * blocks — C(6,3)=20 tables, each keyed on one 3-block combination
    * (~32-bit keyspace). Same pigeonhole exactness as the naive 4×16-bit
    * band, but accidental key collisions drop from n²/2^16 to n²/2^32 —
    * the difference between a quadratic blowup and a near-linear
    * candidate count on clustered corpora (measured: 100k clustered
    * docs → 70M candidates with 16-bit bands, ~true-pairs-only with
    * this layout). Shuffle payload: 20 × (doc_id, key, sig) ints/longs,
    * never text. */
  val Blocks: Seq[(Int, Int)] = // (offset, length)
    Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))
  val BlockCombos: Seq[Seq[Int]] =
    Blocks.indices.combinations(3).map(_.toSeq).toSeq

  /** (doc_id, simhash) → exploded (doc_id, simhash, ckey) where ckey
    * packs (combo id, the 3 block values) into one long. */
  def comboKeys(sig: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def block(i: Int) = {
      val (off, len) = Blocks(i)
      shiftright(col("simhash"), off).bitwiseAND(lit((1L << len) - 1))
    }
    val keys = BlockCombos.zipWithIndex.map { case (combo, ci) =>
      // each block value < 2^11: pack at 11-bit stride, tag with combo id
      combo.map(block).reduce((a, b) => shiftleft(a, 11) + b) +
        lit(ci.toLong << 33)
    }
    sig.select(col("doc_id"), col("simhash"),
      explode(array(keys: _*)).as("ckey"))
  }

  /** Distinct candidate pairs (a_id < b_id) sharing any combo key —
    * a strict superset of all Hamming-≤3 pairs. */
  def candidatePairs(sig: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val keyed = comboKeys(sig)
    val a = keyed.select(col("doc_id").as("a_id"),
      col("simhash").as("sa"), col("ckey"))
    val b = keyed.select(col("doc_id").as("b_id"),
      col("simhash").as("sb"), col("ckey"))
    a.join(b, Seq("ckey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sa"), col("sb"))
      .distinct()
  }
}
