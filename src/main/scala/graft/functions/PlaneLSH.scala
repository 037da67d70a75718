package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH for cosine similarity (SimHash over dense
  * vectors, Charikar 2002): each of `tables × bits` planes is a ±1
  * weight vector; a vector's signature bit p (within table t) is the
  * sign of the plane projection. Vectors with small angle agree on most
  * planes, so equal signatures within a table concentrate near
  * neighbors into the same bucket.
  *
  * Determinism across engines: the weights are NOT random state — weight
  * (t, p, i) = +1 iff the first hex digit of md5("t|p|i") is even. They
  * are precomputed ONCE on the driver (this module), and the DuckDB
  * oracle inlines the identical ±1 literals — the round-1 lesson
  * (`MinHash` scaladoc) that per-row recomputation of constants via
  * interpreted HOFs is a 36× trap.
  *
  * Projections are sequential double folds over dim order — bit-identical
  * to DuckDB's `list_sum(list_transform(...))`.
  *
  * Scale: a narrow single-pass map (no shuffle); signature payload is
  * `tables` ints per vector. Downstream joins key on (table, signature)
  * — 2^bits buckets per table — so the shuffle moves (id, int) pairs,
  * never embeddings.
  */
object PlaneLSH {

  /** ±1 plane weights: weights(t*bits + p)(i), md5-parity derived. */
  def weights(tables: Int, bits: Int, dim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(tables * bits) { tp =>
      val t = tp / bits
      val p = tp % bits
      Array.tabulate(dim) { i =>
        val d = md.digest(s"$t|$p|$i".getBytes(UTF_8))
        // first hex digit = high nibble of byte 0
        if (((d(0) >> 4) & 0x1) == 0) 1.0 else -1.0
      }
    }
  }

  /** DuckDB list literals of the same planes (for inlining into oracle
    * SQL): one `[±1, …]` literal per (table, plane), indexed t*bits+p. */
  def weightSqlLiterals(
      tables: Int, bits: Int, dim: Int): IndexedSeq[String] =
    weights(tables, bits, dim).toIndexedSeq
      .map(_.map(w => if (w > 0) "1" else "-1").mkString("[", ",", "]"))

  /** (id, vec) → (id, sig0..sig{tables-1}); each sig is a `bits`-bit
    * int (bit p set iff the plane-p projection is > 0). */
  def signatures(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int,
      bits: Int,
      dim: Int): DataFrame = {
    val w = weights(tables, bits, dim)
    val schema = StructType(
      StructField("vec_id", LongType) +:
        (0 until tables).map(t => StructField(s"sig$t", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.selectExpr(s"$idCol AS id", s"$vecCol AS vec")
      .as(Encoders.product[(Long, Array[Float])])
      .mapPartitions { it =>
        it.map { case (id, vec) =>
          val sigs = new Array[Any](tables)
          var t = 0
          while (t < tables) {
            var sig = 0
            var p = 0
            while (p < bits) {
              val wv = w(t * bits + p)
              var s = 0.0
              var i = 0
              while (i < vec.length) { s += vec(i).toDouble * wv(i); i += 1 }
              if (s > 0) sig |= (1 << p)
              p += 1
            }
            sigs(t) = sig
            t += 1
          }
          Row.fromSeq(id +: sigs.toSeq)
        }
      }(enc)
  }
}
