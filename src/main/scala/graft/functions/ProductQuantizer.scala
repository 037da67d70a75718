package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al. 2011) ADC scoring kernel for the
  * qs06 gate query: the memory-bound ANN scale path. Each vector is
  * encoded as M sub-space code indices against a shared codebook; query
  * scoring is Asymmetric Distance Computation — the query stays exact,
  * each candidate contributes M table lookups instead of a full
  * dim-length fold, and the corpus can be held compressed (M bytes per
  * vector instead of 4·dim).
  *
  * Determinism: the codebook is a SAMPLED one (the subvectors of the
  * `codes` lowest vec_ids, collected on the driver in vec_id order — a
  * production build k-means-refines it, the same deterministic-build
  * move as qs02's bounded-sample centroids); assignments take the
  * FIRST argmin scanning codes in ascending index; every distance is a
  * sequential double fold over dimensions in order — all replayed
  * bit-identically by the DuckDB oracle's list arithmetic.
  *
  * Scale: encode+score is one narrow mapPartitions pass (codebook and
  * query tables broadcast by closure); nothing shuffles until the
  * per-query top-k window on (q_id, approx) pairs.
  */
object ProductQuantizer {

  /** Squared L2 distance between 8-dim subvectors `a[aOff..]` and
    * `b[bOff..]`, sequential in-order fold. */
  private def sumsqSub(
      a: Array[Double], aOff: Int,
      b: Array[Double], bOff: Int, subDim: Int): Double = {
    var d = 0.0
    var j = 0
    while (j < subDim) {
      val diff = a(aOff + j) - b(bOff + j)
      d += diff * diff
      j += 1
    }
    d
  }

  /** Per-subspace code assignment for one vector: first argmin over the
    * codebook, scanning code indices ascending (strict `<` keeps the
    * lowest index on ties — DuckDB's list_position(list_min) mirror). */
  private def assign(
      v: Array[Double], codebook: Array[Array[Double]],
      m: Int, subDim: Int): Array[Int] = {
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codebook.length) {
        val d = sumsqSub(v, mi * subDim, codebook(c), mi * subDim, subDim)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    out
  }

  /** (vec_id, embedding float array) → (q_id, c_id, approx) ADC rows:
    * every corpus vector is encoded against `codebook` and scored for
    * every query via the precomputed distance tables
    * (table(q)(m)(c) = ||q_sub_m - code_c_sub_m||²). */
  def adcScores(
      e: DataFrame,
      codebook: Array[Array[Double]],
      queries: Array[(Long, Array[Double])],
      m: Int,
      subDim: Int): DataFrame = {
    val dim = m * subDim
    require(codebook.nonEmpty && codebook.forall(_.length == dim),
      s"codebook dims ${codebook.map(_.length).distinct.mkString(",")} " +
        s"!= $dim")
    require(queries.forall(_._2.length == dim),
      s"query dims ${queries.map(_._2.length).distinct.mkString(",")} " +
        s"!= $dim")
    // q → m → c distance tables, built once on the driver with the SAME
    // fold as the per-vector assignment distances
    val tables: Array[Array[Array[Double]]] = queries.map { case (_, qv) =>
      Array.tabulate(m) { mi =>
        Array.tabulate(codebook.length) { c =>
          sumsqSub(qv, mi * subDim, codebook(c), mi * subDim, subDim)
        }
      }
    }
    val qIds = queries.map(_._1)
    val schema = StructType(Seq(
      StructField("q_id", LongType),
      StructField("c_id", LongType),
      StructField("approx", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    e.selectExpr("vec_id AS id", "embedding AS vec")
      .as(Encoders.product[(Long, Array[Float])])
      .mapPartitions { it =>
        it.flatMap { case (id, emb) =>
          // corrupt/mismatched embedding: fail at the source rather than
          // silently truncate or overrun (the CosineSimilarity contract)
          if (emb.length != dim)
            throw new IllegalArgumentException(
              s"pq_adc dimension mismatch at vec $id: ${emb.length} != $dim")
          val v = new Array[Double](dim)
          var i = 0
          while (i < v.length) { v(i) = emb(i).toDouble; i += 1 }
          val code = assign(v, codebook, m, subDim)
          qIds.indices.iterator.map { qi =>
            var d = 0.0
            var mi = 0
            while (mi < m) { d += tables(qi)(mi)(code(mi)); mi += 1 }
            Row(qIds(qi), id, d)
          }
        }
      }(enc)
  }
}
