package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel-vs-declarative cross-check for SimHash (same law as
  * MinHashSpec: the JVM pass must equal the Column/HOF form and thus the
  * DuckDB oracle's strpos-hex arithmetic). */
class SimHashSpec extends SparkSpec {

  test("JVM kernel equals 16-aggregate HOF form") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "sphinx of black quartz judge my vow"),
      (2L, "a"),
      (3L, "same same same same"))
      .toDF("doc_id", "text")

    val kernel = SimHash.signatures(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))

    val ws = split(lower($"text"), " ")
    val hv = transform(ws, w =>
      conv(substring(md5(to_binary(w, lit("utf-8"))), 1, 4), 16, 10)
        .cast("int"))
    val sim = (0 until 16).map { b =>
      val vote = aggregate(hv, lit(0), (acc, x) =>
        acc + when(shiftright(x, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    val hof = docs.select($"doc_id", sim.as("simhash")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))

    assert(kernel.toSeq == hof.toSeq)
  }

  test("near-identical docs land within small Hamming distance") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val a = SimHash.simhash16(md,
      "spark engine processes large video datasets with minhash dedup stages")
    val b = SimHash.simhash16(md,
      "spark engine processes large video datasets with simhash dedup stages")
    val c = SimHash.simhash16(md,
      "completely unrelated words about cooking pasta tonight")
    assert(Integer.bitCount(a ^ b) <= Integer.bitCount(a ^ c))
  }
}
