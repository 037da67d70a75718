package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel-vs-declarative cross-check for SimHash (same law as
  * MinHashSpec: the JVM pass must equal the Column/HOF form and thus the
  * DuckDB oracle's per-nibble strpos-hex arithmetic). */
class SimHashSpec extends SparkSpec {

  test("JVM kernel equals 64-aggregate HOF form") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "sphinx of black quartz judge my vow"),
      (2L, "a"),
      (3L, "same same same same"))
      .toDF("doc_id", "text")

    val kernel = SimHash.signatures(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // HOF mirror: 64-bit word hash as two 32-bit halves (conv of a full
    // 16-hex-digit value overflows signed long through the string path)
    val ws = split(lower($"text"), " ")
    val hex = transform(ws, w => md5(to_binary(w, lit("utf-8"))))
    val hi = transform(hex, h =>
      conv(substring(h, 1, 8), 16, 10).cast("long"))
    val lo = transform(hex, h =>
      conv(substring(h, 9, 8), 16, 10).cast("long"))
    val sim = (0 until 64).map { b =>
      val half = if (b < 32) lo else hi
      val sh = if (b < 32) b else b - 32
      val vote = aggregate(half, lit(0), (acc, x) =>
        acc + when(shiftright(x, sh).bitwiseAND(1) === 1, 1).otherwise(-1))
      if (b == 63) when(vote > 0, lit(Long.MinValue)).otherwise(lit(0L))
      else when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hof = docs.select($"doc_id", sim.as("simhash")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    assert(kernel.toSeq == hof.toSeq)
  }

  test("near-identical docs land within small Hamming distance") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val a = SimHash.simhash64(md,
      "spark engine processes large video datasets with minhash dedup stages")
    val b = SimHash.simhash64(md,
      "spark engine processes large video datasets with simhash dedup stages")
    val c = SimHash.simhash64(md,
      "completely unrelated words about cooking pasta tonight")
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("hamming-3 pairs always share a full 3-block combo (Manku pigeonhole)") {
    def blockVal(v: Long, i: Int): Long = {
      val (off, len) = SimHash.Blocks(i)
      (v >> off) & ((1L << len) - 1)
    }
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val x = rnd.nextLong()
      // flip up to 3 random bits
      val y = (0 until rnd.nextInt(4)).foldLeft(x)((v, _) =>
        v ^ (1L << rnd.nextInt(64)))
      val shares = SimHash.BlockCombos.exists(c =>
        c.forall(i => blockVal(x, i) == blockVal(y, i)))
      assert(shares, s"x=$x y=$y must share a combo")
    }
  }

  test("candidatePairs is a superset of all hamming<=3 pairs (Spark)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0 until 40).map(_ => rnd.nextLong())
    // planted neighbors: id 1000+i is id i with <=3 flipped bits
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      base.zipWithIndex.map { case (v, i) =>
        (1000L + i, (0 until rnd.nextInt(4)).foldLeft(v)((a, _) =>
          a ^ (1L << rnd.nextInt(64))))
      }
    val sig = rows.toDF("doc_id", "simhash")
    val cands = SimHash.candidatePairs(sig)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // every planted (i, 1000+i) pair must be present
    (0 until 40).foreach { i =>
      assert(cands.contains((i.toLong, 1000L + i)),
        s"planted pair $i missing")
    }
  }
}
