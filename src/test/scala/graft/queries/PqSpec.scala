package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** qs06 PQ-ADC laws beyond the gate's hash check: equivalence to an
  * independent brute-force reimplementation, and the quantization
  * sanity property that a codebook member reconstructs itself. */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def vecs(): Array[(Long, Array[Double])] =
    graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding")).orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))

  private def sumsqSub(
      a: Array[Double], b: Array[Double], m: Int, sub: Int): Double = {
    var d = 0.0
    var j = 0
    while (j < sub) {
      val diff = a(m * sub + j) - b(m * sub + j)
      d += diff * diff
      j += 1
    }
    d
  }

  test("ADC kernel equals independent brute recomputation") {
    val all = vecs()
    val codebook = all.take(16).map(_._2)
    val queries = all.filter(_._1 < 10)
    val got = graft.functions.ProductQuantizer.adcScores(
      graft.Tables(spark, sf).embeddings
        .select(col("vec_id"), col("embedding")),
      codebook, queries, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // independent recompute: assign codes, then sum direct subspace
    // distances (no tables — a different code path than the kernel)
    val want = (for {
      (cId, cv) <- all
      (qId, qv) <- queries
    } yield {
      val d = (0 until 8).map { m =>
        val code = (0 until 16).minBy(c => sumsqSub(cv, codebook(c), m, 8))
        sumsqSub(qv, codebook(code), m, 8)
      }.foldLeft(0.0)(_ + _)
      (qId, cId) -> d
    }).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(want(k)), s"mismatch at $k")
    }
  }

  test("codebook members quantize to themselves (self-distance 0)") {
    val all = vecs()
    val codebook = all.take(16).map(_._2)
    val member = all.take(16)
    val got = graft.functions.ProductQuantizer.adcScores(
      graft.Tables(spark, sf).embeddings
        .select(col("vec_id"), col("embedding")),
      codebook, member, m = 8, subDim = 8)
      .filter(col("q_id") === col("c_id"))
      .collect().map(r => r.getDouble(2))
    assert(got.length == 16)
    assert(got.forall(_ == 0.0), got.mkString(","))
  }

  test("gate query ranks by rounded approx distance with c_id ties") {
    val rows = graft.SparkEntry.queries("qs06_ann_pq_adc")(spark, sf)
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val pairs = sorted.map(r => (r.getDouble(2), r.getLong(1)))
      assert(pairs.toSeq == pairs.sortBy(identity).toSeq,
        s"not sorted by (approx, c_id): ${pairs.mkString(",")}")
    }
  }
}
