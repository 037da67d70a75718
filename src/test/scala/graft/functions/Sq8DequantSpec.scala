package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r18 SQ8 quantize→dequantize expression vs the declarative
  * transform it replaced — the reconstruction must be BIT-identical
  * (doubles compared exactly), including the sc = 0 constant-dimension
  * branch and both clamp edges, on both the codegen and interpreted
  * paths; the qs11 DuckDB oracle pins the full operator. */
class Sq8DequantSpec extends SparkSpec {

  private val rows = Seq(
    (0L, Seq(-0.5, 0.25, 7.0, -1e-9)),
    (1L, Seq(0.5, -0.25, 7.0, 1e-9)),
    (2L, Seq(-0.58, 0.52, 7.0, 0.33)),
    (3L, Seq(1.5, 0.9, 7.0, -0.44))) // 1.5/0.9 exceed [mn,mx] -> clamp
  // dim 2 is constant (sc = 0); mins/scales deliberately NOT the true
  // min/max for dims 0/1 so the 0/255 clamps both fire
  private val mins = Array(-0.5, -0.25, 7.0, -0.44)
  private val scales = Array((0.5 - (-0.5)) / 255.0,
    (0.52 - (-0.25)) / 255.0, 0.0, (0.33 - (-0.44)) / 255.0)

  test("expression equals the declarative transform bit for bit, " +
      "including sc=0 dims and clamp edges") {
    import spark.implicits._
    val e = rows.toDF("vec_id", "emb")
    val minsL = array(mins.toSeq.map(lit): _*)
    val scalesL = array(scales.toSeq.map(lit): _*)
    val declarative = transform($"emb", (v, i) => {
      val mn = element_at(minsL, i + 1)
      val sc = element_at(scalesL, i + 1)
      when(sc === 0.0, mn).otherwise(mn +
        least(greatest(floor((v - mn) / sc + lit(0.5)).cast("double"),
          lit(0.0)), lit(255.0)) * sc)
    })
    val want = e.select($"vec_id", declarative.as("dqv"))
      .orderBy("vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val got = e.select($"vec_id",
        Sq8Dequant.dequant($"emb", mins, scales).as("dqv"))
      .orderBy("vec_id").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // exact equality — bitwise, not within-epsilon
    assert(got == want)
    // the constant dim reconstructs to exactly mn
    got.foreach { case (_, v) => assert(v(2) == 7.0) }
    // interpreted path (nullSafeEval via Literal.eval) agrees with
    // the codegen path the collect above exercised
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    rows.zipWithIndex.foreach { case ((_, v), i) =>
      val child = org.apache.spark.sql.catalyst.expressions.Literal
        .create(v, ArrayType(DoubleType))
      val out = Sq8Dequant(child, mins, scales).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      assert(out.toSeq == want(i)._2)
    }
  }

  test("a mismatched codebook or non-double-array input fails fast") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sq8Dequant(org.apache.spark.sql.GraftShim.expression(lit(1.0)),
        Array(0.0), Array(0.0, 1.0))
    }
    // wrong input type -> analysis-time failure
    val e = Seq((1L, "oops")).toDF("vec_id", "emb")
    intercept[org.apache.spark.sql.AnalysisException] {
      e.select(Sq8Dequant.dequant($"emb", Array(0.0), Array(1.0)))
        .collect()
    }
    // dimension mismatch at runtime fails loudly, never truncates
    val bad = Seq((1L, Seq(0.1, 0.2, 0.3))).toDF("vec_id", "emb")
    val ex = intercept[Exception] {
      bad.select(Sq8Dequant.dequant($"emb", Array(0.0), Array(1.0)))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
